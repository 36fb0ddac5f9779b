"""Bucketed table layout: pay the shuffle once at write time, never
again at read time.

A 100 TB curation pipeline joins and re-aggregates the same tables on
the same keys every run (docs x dedup keepers, turns x conv stats,
snapshot x snapshot diff). Hash-bucketing both sides by that key when
they are WRITTEN makes every later equi-join / groupBy on the key
exchange-free: Spark's bucketed scan exposes the hashpartitioning
guarantee to the planner, so SortMergeJoin runs directly over
co-located buckets (plan-asserted in tests/test_plans.py — zero
Exchange in the join). `sort_cols` additionally pre-sorts inside each
bucket file, letting single-file buckets skip the merge sort.

The reference's analog is directory sharding by zip id
(convert.py:273-275) — co-location by construction, never exploited
relationally; here it is the catalog's job.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str] | str,
    n_buckets: int,
    sort_cols: Sequence[str] | str | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a parquet table bucketed by `bucket_cols`
    (optionally bucket-sorted). `path` makes the table external —
    point it at durable storage; the catalog entry carries the
    bucketing metadata the planner needs."""
    buckets = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    absent = [c for c in buckets if c not in df.columns]
    if absent:
        raise ValueError(f"bucket columns absent: {absent}")
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *buckets)
    if sort_cols is not None:
        sorts = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(*sorts)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Catalog read — the bucketing guarantee only survives through
    spark.table(), not a raw path read."""
    return spark.table(table_name)
