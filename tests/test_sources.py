"""S4 — markdown-dir source tests (convert_markdown_to_jsonl.py:31-79
semantics: wholetext read, stem pairing, orphan drop)."""

from __future__ import annotations

from pdfwf_spark.sources import pair_with_sources, read_markdown_dir


def test_read_markdown_dir_wholetext(spark, tmp_path):
    (tmp_path / "sub").mkdir()
    (tmp_path / "a.md").write_text("# Title A\n\nbody A line 1\nline 2\n")
    (tmp_path / "sub" / "b.md").write_text("body B")
    (tmp_path / "ignored.txt").write_text("nope")

    md = read_markdown_dir(spark, str(tmp_path))
    rows = {r["stem"]: r for r in md.collect()}
    assert set(rows) == {"a", "b"}  # recursive, .txt filtered out
    assert rows["a"]["text"] == "# Title A\n\nbody A line 1\nline 2\n"  # wholetext
    assert rows["b"]["md_path"].endswith("/sub/b.md")


def test_pair_with_sources_by_stem(spark, tmp_path):
    (tmp_path / "a.md").write_text("text a")
    (tmp_path / "orphan.md").write_text("no source pdf")
    md = read_markdown_dir(spark, str(tmp_path))
    sources = spark.createDataFrame(
        [("/data/pdfs/a.pdf",), ("/data/pdfs/unmatched.pdf",)], "path string"
    )
    paired = pair_with_sources(md, sources).collect()
    assert len(paired) == 1
    assert paired[0]["path"] == "/data/pdfs/a.pdf"
    assert paired[0]["text"] == "text a"


def test_markdown_dir_decodes_spaced_filenames(spark, tmp_path):
    (tmp_path / "my paper.md").write_text("spaced body")
    (tmp_path / "a+b.md").write_text("plus body")
    md = read_markdown_dir(spark, str(tmp_path))
    stems = {r["stem"]: r["text"] for r in md.collect()}
    assert stems == {"my paper": "spaced body", "a+b": "plus body"}


def test_jsonl_sink_roundtrip_and_line_cap(spark, tmp_path):
    import glob
    import json

    from pdfwf_spark.sinks.jsonl import read_jsonl, write_jsonl

    df = spark.createDataFrame(
        [(i, f"text {i}") for i in range(100)], "doc_id long, text string"
    ).repartition(2)
    out = str(tmp_path / "shards")
    write_jsonl(df, out, lines_per_file=10)

    files = glob.glob(f"{out}/part-*.json")
    assert files
    for f in files:  # write-time re-shard: every shard <= 10 lines
        with open(f) as fh:
            lines = [json.loads(line) for line in fh if line.strip()]
        assert 0 < len(lines) <= 10
        assert set(lines[0]) == {"doc_id", "text"}

    back = read_jsonl(spark, out, schema="doc_id long, text string")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_parquet_to_jsonl_utility(spark, tmp_path):
    from pdfwf_spark.sinks.jsonl import parquet_to_jsonl, read_jsonl

    src = str(tmp_path / "in.parquet")
    spark.createDataFrame(
        [(i, f"t{i}", i * 2) for i in range(20)], "doc_id long, text string, x long"
    ).write.parquet(src)
    out = str(tmp_path / "out")
    parquet_to_jsonl(spark, src, out, lines_per_file=7, text_field="text")
    back = read_jsonl(spark, out, schema="text string")
    assert back.columns == ["text"]
    assert back.count() == 20
