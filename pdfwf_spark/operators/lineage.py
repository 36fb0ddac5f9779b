"""Per-partition lineage rows + anti-join resume (SURVEY §2.2 P1).

The reference recovers checkpoint state by grepping '[timer]' lines
out of Parsl stdout logs (convert.py:144-182, timer.py:132-163) and
re-globbing inputs against that set. Here lineage is first-class data:
one row per committed bucket with input/ok/failure counts and byte
totals; resume is a left ANTI-join of input buckets against it —
Catalyst broadcasts the (tiny) lineage side automatically, and at
10^12-turn scale the anti-join prunes whole buckets before any
payload bytes move.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdfwf_spark.schemas import LINEAGE_SCHEMA


def lineage_rows(extracted: DataFrame, run_id: str) -> DataFrame:
    """Aggregate per-bucket lineage from the full (all-status)
    extraction output. Map-side partial aggregation applies (one long
    column set, narrow groupBy on the already-colocated bucket key)."""
    return (
        extracted.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("input_count"),
            F.sum(F.when(F.col("parse_status") == "ok", 1).otherwise(0)).alias("ok_count"),
            F.sum(F.when(F.col("parse_status") != "ok", 1).otherwise(0)).alias(
                "parse_failures"
            ),
            F.sum("bytes_in").alias("bytes_in"),
            F.sum("bytes_out").alias("bytes_out"),
            # 'parser-parse' stage wall per bucket (timer.py:36-129
            # analog; the reference scrapes this from stdout logs)
            (F.sum("extract_us") / 1000).cast("long").alias("extract_ms"),
            # 'initialize-parser' wall (timer.py:36-129): each worker
            # reports its import+compile cost once, on its first row
            (F.sum("init_us") / 1000).cast("long").alias("init_ms"),
        )
        .select(
            F.lit(run_id).alias("run_id"),
            F.col("bucket"),
            "input_count",
            "ok_count",
            "parse_failures",
            "bytes_in",
            "bytes_out",
            "extract_ms",
            "init_ms",
            F.current_timestamp().alias("committed_at"),
        )
    )


def read_or_empty(spark: SparkSession, path: str, schema) -> DataFrame:
    """Parquet read where ONLY path-not-found means 'no data yet'. Any
    other failure (storage hiccup, permissions, corrupt footer)
    re-raises: treating it as empty would let resume reprocess
    already-committed buckets under a new run_id and permanently
    duplicate output rows."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.schema(schema).parquet(path)
    except AnalysisException as exc:
        getter = getattr(exc, "getCondition", None) or getattr(
            exc, "getErrorClass", None
        )
        cls = (getter() if getter else None) or ""
        if "PATH_NOT_FOUND" in cls or "PATH_NOT_FOUND" in str(exc):
            return spark.createDataFrame([], schema)
        raise


def read_lineage(spark: SparkSession, lineage_path: str) -> DataFrame:
    """Committed lineage, or an empty frame when none exists yet."""
    return read_or_empty(spark, lineage_path, LINEAGE_SCHEMA)


def filter_uncommitted(inputs_with_bucket: DataFrame, lineage: DataFrame) -> DataFrame:
    """Resume: drop rows whose bucket is already committed.

    The anti-join's right side is distinct bucket ids — at most
    n_buckets rows — so Catalyst picks BroadcastHashJoin (verified in
    tests via the query plan): no shuffle of the input scan, and with
    a bucket-partitioned input table this becomes partition pruning.
    """
    committed = lineage.select("bucket").distinct()
    return inputs_with_bucket.join(F.broadcast(committed), "bucket", "left_anti")
