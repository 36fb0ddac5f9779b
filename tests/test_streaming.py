"""Streaming ingest smoke: a batch of parquet rows drives the
foreachBatch pipeline to completion; output matches the batch path."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdfwf_spark.fixtures.gen import gen_transcripts
from pdfwf_spark.schemas import TRANSCRIPT_SCHEMA
from pdfwf_spark.streaming.ingest import start_ingest


def test_stream_ingest_matches_batch(spark, tmp_path):
    rows = [
        {k: v for k, v in r.items() if not k.startswith("_")}
        for r in gen_transcripts(12, seed=7, mega_every=0)
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, TRANSCRIPT_SCHEMA).write.parquet(src)

    out = str(tmp_path / "out")
    q = start_ingest(
        spark, src, out, str(tmp_path / "ckpt"), n_buckets=8, n_partitions=4
    )
    q.processAllAvailable()
    q.stop()

    from pdfwf_spark.pipeline import extract_df, read_output

    got = read_output(spark, out)
    want = extract_df(
        spark.createDataFrame(rows, TRANSCRIPT_SCHEMA), n_buckets=8, n_partitions=4
    ).filter(F.col("parse_status") == "ok")
    assert got.count() == want.count() > 0
    # same per-turn text under the same ordering key
    g = {(r["conv_id"], r["turn_rank"]): r["clean_text"] for r in got.collect()}
    w = {(r["conv_id"], r["turn_rank"]): r["clean_text"] for r in want.collect()}
    assert g == w
