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

from pyspark.sql import DataFrame
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
