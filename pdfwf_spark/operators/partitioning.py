"""Salted bucketing + skew handling (SURVEY §2.3 skew note).

The reference sidesteps skew by fixing chunk size (convert.py:273-275,
~10 PDFs per zip task). Our unit of work is a *turn*, so
mega-conversations would otherwise pin one conv to one task. Because
extraction is per-row (no cross-turn state inside the UDF), we can
salt freely: the physical partition key is
(bucket, salt) = (pmod(xxhash64(conv_id), B), pmod(xxhash64(conv_id,
turn_idx), S)) which splits a mega-conv across S tasks while `bucket`
remains the logical commit/resume unit. Per-conv grouping is restored
only in the (cheap) ordering window afterwards — mirroring how the
reference parallelizes at page granularity and regroups by file_id
(tensor_utils.py:2159-2291).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 64
DEFAULT_SALTS = 16


def repartition_for_scan(df: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    """Guarantee scan-side parallelism for compute-heavy narrow
    stages (shingling, hashing, UDFs).

    A single small parquet file scans as ONE partition, so everything
    upstream of the first exchange runs on one core (observed: a 2M-
    md5 partial aggregate pinned to a single thread). At cluster scale
    inputs already have many splits and this is a no-op; locally it
    fans the scan out to defaultParallelism.
    """
    spark = df.sparkSession
    target = min_parallelism or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def with_bucket(df: DataFrame, n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """Deterministic commit/resume bucket from conv_id."""
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col("conv_id")), F.lit(n_buckets)).cast("int")
    )


def salted_repartition(
    df: DataFrame,
    n_partitions: int,
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Spread work evenly even under mega-conversation skew.

    Salting on (conv_id, turn_idx) gives per-turn granularity; the
    extraction UDF is row-local so correctness is unaffected. AQE
    (spark.sql.adaptive.*) additionally coalesces/splits at runtime.
    """
    salt = F.pmod(F.xxhash64(F.col("conv_id"), F.col("turn_idx")), F.lit(n_salts))
    return df.repartition(n_partitions, F.col("bucket"), salt)


def _key_counts(df: DataFrame, key_cols: Sequence[str] | str) -> tuple[DataFrame, list[str]]:
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    absent = [k for k in keys if k not in df.columns]
    if absent:
        raise ValueError(f"key columns absent: {absent}")
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows")), keys


def profile_key_skew(df: DataFrame, key_cols: Sequence[str] | str) -> DataFrame:
    """One-row shuffle-key health report: would a groupBy/join on
    `key_cols` skew? Output: (n_rows, n_keys, max_key_rows,
    skew_milli) where skew_milli = 1000 * max/mean key size (1000 =
    perfectly uniform). Integer milli units, no floats — engine-
    portable. Cost: ONE map-side-combined count per key, then a
    driver-sized aggregate over the O(distinct) counts table; run it
    before committing to a partitioning, exactly the decision data
    salted_repartition needs."""
    counts, _ = _key_counts(df, key_cols)
    return counts.agg(
        F.sum("n_rows").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n_rows").alias("max_key_rows"),
        F.expr(
            "CAST((1000 * max(n_rows) * count(1)) DIV sum(n_rows) AS BIGINT)"
        ).alias("skew_milli"),
    )


def heavy_keys(
    df: DataFrame, key_cols: Sequence[str] | str, top_n: int = 10
) -> DataFrame:
    """The top_n heaviest shuffle keys (the ones to salt or broadcast
    around), deterministically tie-broken by the key itself. The sort
    + limit is a distributed TakeOrdered over the already-reduced
    counts table; the rank window runs on top_n rows only."""
    counts, keys = _key_counts(df, key_cols)
    order = [F.col("n_rows").desc()] + [F.col(k) for k in keys]
    top = counts.orderBy(*order).limit(top_n)
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w).cast("int"))
