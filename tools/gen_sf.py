#!/usr/bin/env python
"""Deterministically scale a testdata sf-directory by an integer
factor (default: sf0.1 -> a synthetic sf1) for bench scaling points.

Each fact table is replicated `factor` times with id-space offsets so
keys stay unique and join cardinalities scale linearly; document text
gets a per-copy token suffix and embeddings a per-copy deterministic
perturbation so the copies are NEAR each other but not exact
duplicates (a naive 10x exact replication would turn every dedup
query into a measurement of the artificial duplicates, not of the
operator). Dimension tables (region/nation/part/supplier) copy as-is.

No randomness: copy k of a row is a pure function of (row, k), so two
runs produce byte-identical corpora.

    python tools/gen_sf.py --src /root/testdata/sf0.1 \
        --dst /tmp/pdfwf_bench/sf1 --factor 10
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

DIMS = ("region", "nation", "part", "supplier")


def _replicate(df: DataFrame, factor: int) -> DataFrame:
    """Cross the table with k=0..factor-1 (exploded literal array —
    stays a narrow map-side operation, no shuffle)."""
    return df.withColumn(
        "k", F.explode(F.array(*[F.lit(i) for i in range(factor)]))
    )


def scale_dir(spark: SparkSession, src: str, dst: str, factor: int) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in DIMS:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )

    docs = spark.read.parquet(f"{src}/documents.parquet")
    n_docs = docs.count()
    (
        _replicate(docs, factor)
        .select(
            (F.col("doc_id") + F.col("k") * n_docs).alias("doc_id"),
            # copies 1..f-1 get a distinct suffix: near the original in
            # shingle space, never an exact duplicate
            F.when(F.col("k") == 0, F.col("text"))
            .otherwise(F.concat_ws(" ", F.col("text"), F.lit("variant"),
                                   F.col("k").cast("string"),
                                   F.col("doc_id").cast("string")))
            .alias("text"),
            "lang", "source", "n_chars",
        )
        .repartition(max(factor * 4, 8))
        .write.mode("overwrite").parquet(f"{dst}/documents.parquet")
    )

    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    n_emb = emb.count()
    (
        _replicate(emb, factor)
        .select(
            (F.col("vec_id") + F.col("k") * n_emb).alias("vec_id"),
            # per-copy deterministic nudge, dimension-dependent: copies
            # stay near-duplicates (high cosine) without being equal
            F.transform(
                "embedding",
                lambda x, j: (x + (F.col("k") % 5 - 2) * 0.001 * ((j % 7) + 1))
                .cast("float"),
            ).alias("embedding"),
            "label",
        )
        .repartition(max(factor * 2, 8))
        .write.mode("overwrite").parquet(f"{dst}/embeddings.parquet")
    )

    ev = spark.read.parquet(f"{src}/events.parquet")
    n_ev = ev.count()
    n_users = ev.agg(F.max("user_id")).collect()[0][0] + 1
    (
        _replicate(ev, factor)
        .select(
            (F.col("event_id") + F.col("k") * n_ev).alias("event_id"),
            (F.col("ts") + F.make_interval(secs=F.col("k"))).alias("ts"),
            (F.col("user_id") + F.col("k") * n_users).alias("user_id"),
            "event_type", "value", "props",
        )
        .repartition(max(factor * 4, 8))
        .write.mode("overwrite").parquet(f"{dst}/events.parquet")
    )

    cust = spark.read.parquet(f"{src}/customer.parquet")
    n_cust = cust.agg(F.max("c_custkey")).collect()[0][0] + 1
    (
        _replicate(cust, factor)
        .select((F.col("c_custkey") + F.col("k") * n_cust).alias("c_custkey"),
                "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
        .write.mode("overwrite").parquet(f"{dst}/customer.parquet")
    )

    orders = spark.read.parquet(f"{src}/orders.parquet")
    n_ord = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    (
        _replicate(orders, factor)
        .select((F.col("o_orderkey") + F.col("k") * n_ord).alias("o_orderkey"),
                (F.col("o_custkey") + F.col("k") * n_cust).alias("o_custkey"),
                "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
        .repartition(max(factor * 4, 8))
        .write.mode("overwrite").parquet(f"{dst}/orders.parquet")
    )

    li = spark.read.parquet(f"{src}/lineitem.parquet")
    (
        _replicate(li, factor)
        .select((F.col("l_orderkey") + F.col("k") * n_ord).alias("l_orderkey"),
                "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
                "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
                "l_linestatus", "l_shipdate")
        .repartition(max(factor * 8, 16))
        .write.mode("overwrite").parquet(f"{dst}/lineitem.parquet")
    )


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", required=True)
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()

    from pdfwf_spark.session import build_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(app_name="gen_sf", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("WARN")
    scale_dir(spark, args.src.rstrip("/"), args.dst.rstrip("/"), args.factor)
    print(f"scaled {args.src} x{args.factor} -> {args.dst}")
    spark.stop()


if __name__ == "__main__":
    main()
