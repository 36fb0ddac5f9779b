from pdfwf_spark.sources.markdown_dir import pair_with_sources, read_markdown_dir

__all__ = ["read_markdown_dir", "pair_with_sources"]
