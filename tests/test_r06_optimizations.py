"""Focused pins for the round-6 optimization rewrites: every entry
asserts the FAST path equals the simple/previous path bit-for-bit on
live Spark data (the round's contract is identical results, only
cheaper plans)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

from pyspark.sql import functions as F


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(r[c] for c in cols) for r in df.collect()
    )


def test_dsir_fit_split_equals_two_pass_fit(spark):
    """dsir_fit_split(docs, pred) must equal dsir_fit(docs.filter(pred),
    docs) — the single-pass conditional aggregate is a pure plan
    optimization."""
    from pdfwf_spark.operators.selection import dsir_fit, dsir_fit_split

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pred = F.col("lang") == "en"
    split = dsir_fit_split(docs, pred, n_buckets=256)
    two_pass = dsir_fit(docs.filter(pred), docs, n_buckets=256)
    assert _rows(split) == _rows(two_pass)


def test_eval_once_is_value_identity(spark):
    """eval_once(c) returns c's value for every type it wraps (a
    1-element array has exactly one permutation) while blocking
    filter pushdown from duplicating the expression."""
    from pdfwf_spark.operators.functions import eval_once

    df = spark.range(0, 100).select(
        F.col("id"),
        (F.col("id") % 7).alias("v"),
        F.concat(F.lit("s"), F.col("id")).alias("s"),
        F.when(F.col("id") % 3 == 0, F.col("id")).alias("n"),  # nullable
    )
    out = df.select(
        "id",
        eval_once(F.col("v")).alias("v"),
        eval_once(F.col("s")).alias("s"),
        eval_once(F.col("n")).alias("n"),
    )
    assert _rows(out) == _rows(df)
    # and the filter on a barrier column still selects the same rows
    a = df.filter(F.col("v") >= 3).select("id")
    b = out.filter(F.col("v") >= 3).select("id")
    assert _rows(a) == _rows(b)


def test_pair_counts_equals_plain_groupby(spark):
    from pdfwf_spark.operators.dedup import _distinct_pairs, _pair_counts

    pairs = spark.range(0, 5000).select(
        (F.col("id") % 83).alias("id_a"), (F.col("id") % 97).alias("id_b")
    )
    fast = _pair_counts(pairs)
    plain = pairs.groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("inter"))
    assert _rows(fast) == _rows(plain)
    assert _rows(_distinct_pairs(pairs)) == _rows(pairs.distinct())


def test_extract_arrow_kernel_equals_pandas_kernel():
    """The mapInArrow extraction kernel and the pandas twin produce
    identical rows for every payload family, including failures."""
    import datetime

    from pdfwf_spark.operators import extract as ex

    texts = [
        '<html><head><title>t</title></head><body><p>hello &amp; world</p>'
        '<nav>skip me</nav></body></html>',
        "%PDFISH1\nPAGE 1 612 792\nBLOCK 72 72 540 100 title|doc\n"
        "BLOCK 72 120 540 700 text|body words here",
        "plain text\n\n\n\ntail paragraph.",
        "",           # empty payload
        None,         # null payload
    ]
    n = len(texts)
    base = {
        "conv_id": [f"c{i}" for i in range(n)],
        "turn_idx": list(range(n)),
        "role": ["user"] * n,
        "ts": [datetime.datetime(2025, 1, 1)] * n,
        "text": texts,
        "tool": [""] * n,
        "bucket": [0] * n,
        "tie_key": [f"k{i}" for i in range(n)],
    }
    pdf = pd.DataFrame(base)
    rb = pa.RecordBatch.from_pydict(
        {
            **{k: v for k, v in base.items()},
        }
    )
    out_pd = list(ex._extract_batches(iter([pdf])))[0]
    out_pa = list(ex._extract_batches_arrow(iter([rb])))[0]
    pa_dict = out_pa.to_pydict()
    for col in ["parser", "parse_status", "fail_reason", "source_col",
                "clean_text", "spans", "meta", "bytes_in", "bytes_out",
                "conv_id", "turn_idx", "tie_key"]:
        pd_vals = list(out_pd[col])
        pa_vals = pa_dict[col]
        if col == "meta":
            pd_vals = [dict(v) for v in pd_vals]
            pa_vals = [dict(v) for v in pa_vals]
        if col == "spans":
            pd_vals = [list(v) for v in pd_vals]
        assert pd_vals == pa_vals, col


def test_dup_clusters_pointer_jump_on_chain(spark):
    """A pure chain graph (worst case for plain propagation) still
    converges to component-min labels with the jump step."""
    from pdfwf_spark.operators.dedup import dup_clusters

    n = 40
    docs = spark.range(0, n).select(F.col("id").alias("doc_id"))
    pairs = spark.range(0, n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    out = dup_clusters(docs, pairs)
    rows = {r["doc_id"]: (r["cluster_id"], r["is_keeper"]) for r in out.collect()}
    assert all(rows[i] == (0, 1 if i == 0 else 0) for i in range(n))
