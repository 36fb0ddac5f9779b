"""Local replica of the driver's correctness gate: run every
queries() entry in Spark and its oracle_sql() in DuckDB on the same
parquet, compare row count + column names + order-insensitive values.

Runs at sf0.001 for speed (the driver uses sf0.01 — same generator,
bigger N).
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # sort by repr: NULLs (None) mixed with values are not orderable
    # with plain tuple comparison (rollup subtotal rows)
    return sorted(
        (tuple(_norm_cell(r[i]) for i in order) for r in rows), key=repr
    )


@pytest.fixture(scope="module")
def duck():
    con = _duck()
    yield con
    con.close()


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


def test_every_oracle_has_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_parity(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_cols = sorted(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(ORACLES[name])
    duck_cols = sorted(d[0] for d in res.description)
    duck_rows = res.fetchall()

    assert spark_cols == duck_cols, f"{name}: columns {spark_cols} vs {duck_cols}"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: rowcount {len(spark_rows)} vs {len(duck_rows)}"
    )
    got = _canon(spark_rows, sdf.columns)
    want = _canon(duck_rows, [d[0] for d in res.description])
    mism = [i for i, (g, w) in enumerate(zip(got, want)) if g != w]
    assert not mism, f"{name}: first mismatch at {mism[0]}: {got[mism[0]]} vs {want[mism[0]]}"


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(ORACLES))
)
def test_rows_only_queries_run(spark, name):
    sdf = QUERIES[name](spark, SF_DIR)
    assert sdf.count() >= 0
