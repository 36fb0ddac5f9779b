"""Sequence packing: arrange documents into fixed-token-budget
training sequences — the last mile between a curated corpus and a
pretraining dataloader.

Two packing disciplines, matching the two ways trainers consume text:

- pack_concat: GPT-style concatenate-then-split. Documents are laid
  end to end in a deterministic order and the stream is cut every
  `budget` tokens; documents may straddle a cut (the trainer's
  attention reset / EOD token handles the seam). Fully declarative:
  one cumulative-sum window per pack bucket, no Python — and
  therefore oracle-able.
- pack_greedy: next-fit whole-document packing. A document never
  straddles sequences; a new sequence starts whenever the incoming
  document would overflow the budget. The boundary recursion
  (sequence start depends on every prior placement) has no
  fixed-depth window form, so each bucket is packed by a vectorized
  per-group kernel (applyInPandas) — the classic (b)-tier custom
  operator. Oversized documents get a singleton sequence with
  `truncated` set.

Both shard the corpus into `n_buckets` independent pack buckets by
document-key hash: packing is embarrassingly parallel across buckets,
sequence ids are (bucket, seq_in_bucket), and scale-out is "raise
n_buckets" — no global order, no single reducer. Within a bucket the
order is md5(key) — deterministic, partitioning-invariant, and
uncorrelated with document length or arrival order (a shuffled fill
is what trainers want anyway).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _bucket_and_order(df: DataFrame, key_col: str, n_buckets: int):
    key_str = F.col(key_col).cast("string")
    order_key = F.md5(key_str)
    # bucket from a DIFFERENT md5 slice than the order key so bucket
    # membership and in-bucket rank are independent
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit("b#"), key_str)), 1, 8), 16, 10)
        .cast("long")
        % n_buckets
    ).cast("int")
    return bucket, order_key


def pack_concat(
    df: DataFrame,
    budget: int,
    key_col: str = "doc_id",
    n_col: str = "n_tokens",
    n_buckets: int = 8,
) -> DataFrame:
    """Concatenate-and-split packing assignment.

    Output, one row per document: (key, bucket, seq_idx, seq_offset,
    n) where seq_idx is the sequence (within bucket) containing the
    document's FIRST token and seq_offset its offset inside that
    sequence. The whole plan is one hash-partitioned window cumsum —
    shuffle carries each row once, every bucket sorts independently,
    and a 100× corpus just means more buckets.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    bucket, order_key = _bucket_and_order(df, key_col, n_buckets)
    staged = df.select(
        F.col(key_col),
        F.col(n_col).cast("long").alias("n"),
        bucket.alias("bucket"),
        order_key.alias("ord"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("ord", key_col)  # key tiebreak: total order even on md5 ties
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    offset = F.sum("n").over(w) - F.col("n")
    return staged.select(
        key_col,
        "bucket",
        F.floor(offset / budget).cast("long").alias("seq_idx"),
        (offset % budget).cast("long").alias("seq_offset"),
        "n",
    )


_GREEDY_SCHEMA_FIELDS = [
    T.StructField("bucket", T.IntegerType(), False),
    T.StructField("seq_idx", T.LongType(), False),
    T.StructField("seq_offset", T.LongType(), False),
    T.StructField("n", T.LongType(), False),
    T.StructField("truncated", T.IntegerType(), False),
]


def _greedy_kernel(budget: int):
    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ord", "key"], kind="mergesort").reset_index(drop=True)
        ns = pdf["n"].to_numpy(dtype=np.int64)
        seq = np.empty(len(ns), dtype=np.int64)
        off = np.empty(len(ns), dtype=np.int64)
        trunc = np.zeros(len(ns), dtype=np.int32)
        cur_seq, cur_fill = 0, 0
        for i, n in enumerate(ns):
            if n > budget:
                # oversized doc: its own (truncated) sequence
                if cur_fill > 0:
                    cur_seq += 1
                seq[i], off[i], trunc[i] = cur_seq, 0, 1
                cur_seq += 1
                cur_fill = 0
                continue
            if cur_fill + n > budget:
                cur_seq += 1
                cur_fill = 0
            seq[i], off[i] = cur_seq, cur_fill
            cur_fill += n
        out = pdf[["key", "bucket"]].copy()
        out["seq_idx"] = seq
        out["seq_offset"] = off
        out["n"] = ns
        out["truncated"] = trunc
        return out

    return pack


#: auto-sizing target for pack_greedy buckets: each applyInPandas
#: group materializes (key, n) rows in one pandas frame — 1M rows is
#: tens of MB, comfortably executor-sized with headroom for the numpy
#: working set, while keeping groups big enough that the packing
#: efficiency loss at bucket boundaries (< 1 sequence per bucket) is
#: negligible.
DEFAULT_PACK_ROWS_PER_BUCKET = 1_000_000


def pack_greedy(
    df: DataFrame,
    budget: int,
    key_col: str = "doc_id",
    n_col: str = "n_tokens",
    n_buckets: int | None = 8,
    target_rows_per_bucket: int = DEFAULT_PACK_ROWS_PER_BUCKET,
) -> DataFrame:
    """Next-fit whole-document packing.

    One applyInPandas group per pack bucket; the kernel is a single
    numpy pass over the bucket's (hash-ordered) lengths. Buckets are
    sized by n_buckets, so the per-group memory is corpus/n_buckets —
    at 100 TB each bucket must stay executor-sized, and the pass stays
    O(bucket). Python is unavoidable here (next-fit is a recursion
    over all prior placements), so it runs once per DOCUMENT-LENGTH
    ROW, never per token, in Arrow batches.

    n_buckets=None AUTO-SIZES from the data: one count() pass, then
    ceil(count / target_rows_per_bucket) buckets — so callers at any
    scale get executor-sized groups without hand-tuning (the explicit
    default 8 is fixture-scale and kept for plan-stable tests/oracles).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_buckets is None:
        n_rows = df.count()
        n_buckets = max(1, -(-n_rows // target_rows_per_bucket))
    bucket, order_key = _bucket_and_order(df, key_col, n_buckets)
    key_field = df.schema[key_col]
    schema = T.StructType(
        [T.StructField("key", key_field.dataType, key_field.nullable)]
        + _GREEDY_SCHEMA_FIELDS
    )
    staged = df.select(
        F.col(key_col).alias("key"),
        F.col(n_col).cast("long").alias("n"),
        bucket.alias("bucket"),
        order_key.alias("ord"),
    )
    packed = staged.groupBy("bucket").applyInPandas(
        _greedy_kernel(budget), schema
    )
    return packed.withColumnRenamed("key", key_col)


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Packing-efficiency summary: sequences, fill ratio (per-mille),
    truncation count. Works on the output of either packer (concat
    packing reports straddling docs by their head sequence)."""
    has_trunc = "truncated" in packed.columns
    per_seq = packed.groupBy("bucket", "seq_idx").agg(
        F.sum("n").alias("fill"),
        (
            F.sum("truncated").alias("n_trunc")
            if has_trunc
            else F.lit(0).alias("n_trunc")
        ),
    )
    return per_seq.agg(
        F.count(F.lit(1)).alias("n_seqs"),
        F.round(
            1000 * F.sum(F.least(F.col("fill"), F.lit(budget)))
            / (F.count(F.lit(1)) * budget)
        )
        .cast("long")
        .alias("fill_per_mille"),
        F.sum("n_trunc").cast("long").alias("n_truncated"),
    )


def materialize_sequences(
    docs: DataFrame,
    packed: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    sep: str = " ",
) -> DataFrame:
    """Turn a packing ASSIGNMENT into actual training sequences: one
    row per (bucket, seq_idx) holding the member documents' text
    joined in pack order — the artifact a pretraining dataloader
    reads (in production the separator is the EOD token).

    Documents group by the sequence holding their FIRST token (for
    concat packing a straddling doc belongs to its head sequence —
    the cut itself happens at tokenization time downstream; for
    greedy packing membership is exact). One join on the doc key +
    one groupBy per sequence; the ordered concat uses the same
    sort_array(collect_list(struct)) shape as the A1 group-concat
    operator, with (seq_offset, key) making the order total.

    Output: (bucket, seq_idx, n_docs, n_tokens, seq_text).
    """
    j = packed.join(docs.select(key_col, text_col), key_col)
    entry = F.struct(
        F.col("seq_offset"), F.col(key_col), F.col(text_col).alias("t"),
        F.col("n"),
    )
    return (
        j.groupBy("bucket", "seq_idx")
        .agg(F.sort_array(F.collect_list(entry)).alias("es"))
        .select(
            "bucket",
            "seq_idx",
            F.size("es").cast("long").alias("n_docs"),
            F.aggregate(
                "es", F.lit(0).cast("long"), lambda acc, e: acc + e["n"]
            ).alias("n_tokens"),
            F.array_join(
                F.transform("es", lambda e: e["t"]), sep
            ).alias("seq_text"),
        )
    )
