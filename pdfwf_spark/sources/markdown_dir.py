"""S4 — markdown-directory source.

Reference: examples/convert_markdown_to_jsonl.py:31-79 walks a dir of
``*.md`` files, pairs each with its source ``{pdf_dir}/{stem}.pdf`` by
filename stem, and emits ``{'path': pdf_path, 'text': md_text}``
records.

Spark re-expression: ``spark.read.text(wholetext=True)`` gives one row
per file (the whole file as one string — the reference's
``path.read_text()``), ``input_file_name()`` carries provenance, and
the stem pairing is the J3 derived-key equi-join. Scales with file
count: the scan parallelizes over files; no driver-side glob loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STEM_PATTERN = r"([^/]+)\.[A-Za-z0-9]+$"


def read_markdown_dir(
    spark: SparkSession, md_dir: str, ext: str = "md", recursive: bool = True
) -> DataFrame:
    """One row per markdown file: (stem, md_path, text)."""
    reader = spark.read.option("pathGlobFilter", f"*.{ext}")
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    df = reader.text(md_dir, wholetext=True)
    # input_file_name() is a URL-encoded URI ('my paper.md' ->
    # .../my%20paper.md): decode BEFORE deriving the stem, or pairing
    # against raw source paths silently drops every file whose name
    # contains a space/special char. url_decode is form-decoding
    # ('+' -> ' '), but URIs keep literal '+', so escape it first.
    md_path = F.url_decode(
        F.regexp_replace(F.input_file_name(), r"\+", "%2B")
    )
    return df.select(
        F.regexp_extract(md_path, STEM_PATTERN, 1).alias("stem"),
        md_path.alias("md_path"),
        F.col("value").alias("text"),
    )


def pair_with_sources(
    md: DataFrame, sources: DataFrame, source_path_col: str = "path"
) -> DataFrame:
    """Pair markdown rows with source rows by stem (the reference's
    md <-> pdf pairing, convert_markdown_to_jsonl.py:61-66): an
    equi-join on the derived stem key; inner join drops orphans on
    either side, matching the reference's 'skip missing pdf' branch."""
    src = sources.select(
        F.regexp_extract(F.col(source_path_col), STEM_PATTERN, 1).alias("stem"),
        F.col(source_path_col).alias("path"),
    )
    return md.join(src, "stem").select("path", "text", "md_path", "stem")
