"""S9 — rebalancer contract tests (reference balance.py:30-114: exact
rows per output file, remainder in the last file)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from pdfwf_spark.operators.rebalance import rebalance


def test_rebalance_exact_rows_per_file(spark, tmp_path):
    out = str(tmp_path / "out")
    df = spark.range(1003).withColumn(
        "payload", F.concat(F.lit("v"), F.col("id").cast("string"))
    )
    n_groups = rebalance(df, out, rows_per_file=100, order_by=["id"])
    assert n_groups == 11

    sizes: dict[int, int] = {}
    for path in glob.glob(f"{out}/file_grp=*/*.parquet"):
        grp = int(path.split("file_grp=")[1].split("/")[0])
        assert grp not in sizes, "exactly one file per group"
        sizes[grp] = pq.read_table(path).num_rows
    assert sorted(sizes) == list(range(11))
    assert all(sizes[g] == 100 for g in range(10))
    assert sizes[10] == 3  # remainder file

    # order_by contract: group g holds exactly ids [100g, 100(g+1))
    back = spark.read.parquet(out)
    assert back.count() == 1003
    assert back.filter(F.col("file_grp") != F.floor(F.col("id") / 100)).count() == 0


def test_rebalance_unordered_and_empty(spark, tmp_path):
    # without order_by: still exact counts, arbitrary membership
    out = str(tmp_path / "u")
    df = spark.range(250).repartition(7)
    assert rebalance(df, out, rows_per_file=100) == 3
    sizes = sorted(
        pq.read_table(p).num_rows for p in glob.glob(f"{out}/file_grp=*/*.parquet")
    )
    assert sizes == [50, 100, 100]

    # empty input: no groups, no crash
    empty = spark.range(0)
    assert rebalance(empty, str(tmp_path / "e"), rows_per_file=10) == 0
