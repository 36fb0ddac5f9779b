"""as-of join + binned range join vs exact naive python twins."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from pdfwf_spark.operators.temporal import asof_join, range_join_binned

T0 = datetime(2024, 1, 1)


def _ts(s: float) -> datetime:
    return T0 + timedelta(seconds=s)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts(10.0)),
            (2, "u1", _ts(25.0)),
            (3, "u1", _ts(5.0)),    # before every right row -> null
            (4, "u2", _ts(40.0)),
            (5, "u2", _ts(41.0)),
            (6, "u3", _ts(99.0)),   # key with no right rows at all
        ],
        "lid long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts(10.0), 100, 1.5),   # equal ts -> must match lid 1
            ("u1", _ts(20.0), 101, 2.5),
            ("u2", _ts(39.0), 200, 3.5),
            ("u2", _ts(41.0), 201, 4.5),
        ],
        "k string, ts timestamp, rid long, val double",
    )
    return left, right


def test_asof_backward_matches_twin(spark, sides):
    left, right = sides
    out = {r["lid"]: (r["rid_r"], r["val_r"])
           for r in asof_join(left, right, ["k"]).collect()}
    assert out == {
        1: (100, 1.5),   # equal ts inclusive
        2: (101, 2.5),
        3: (None, None),
        4: (200, 3.5),
        5: (201, 4.5),   # equal ts inclusive
        6: (None, None),
    }


def test_asof_forward_and_tolerance(spark, sides):
    left, right = sides
    fwd = {r["lid"]: r["rid_r"]
           for r in asof_join(left, right, ["k"], direction="forward").collect()}
    assert fwd == {1: 100, 2: None, 3: 100, 4: 201, 5: 201, 6: None}
    tol = {r["lid"]: r["rid_r"]
           for r in asof_join(left, right, ["k"], tolerance_s=2.0).collect()}
    # lid 2 is 5s after rid 101 -> out of tolerance
    assert tol == {1: 100, 2: None, 3: None, 4: 200, 5: 201, 6: None}


def test_asof_single_shuffle_no_cartesian(spark, sides):
    left, right = sides
    plan = (
        asof_join(left, right, ["k"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # union + ONE window: exactly one hash-partitioning exchange on the key
    assert plan.count("Exchange hashpartitioning") == 1


def test_range_join_binned_matches_naive(spark):
    pts = spark.createDataFrame(
        [(i, "u" + str(i % 3), _ts(i * 7.0)) for i in range(60)],
        "pid long, k string, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [
            (10, "u0", _ts(0.0), _ts(50.0)),
            (11, "u1", _ts(100.0), _ts(160.0)),
            (12, "u2", _ts(300.0), _ts(301.0)),
            (13, "u0", _ts(400.0), _ts(400.0)),  # degenerate point interval
        ],
        "iid long, k string, start_ts timestamp, end_ts timestamp",
    )
    got = {
        (r["pid"], r["iid"])
        for r in range_join_binned(pts, ivs, ["k"], bin_width_s=30).collect()
    }
    want = {
        (p["pid"], i["iid"])
        for p in pts.collect()
        for i in ivs.collect()
        if p["k"] == i["k"] and i["start_ts"] <= p["ts"] <= i["end_ts"]
    }
    assert got == want and got  # non-trivial
    # boundary inclusivity: a point exactly at an interval edge matches
    assert any(p for p in pts.collect() if p["ts"] == _ts(0.0))

    plan = (
        range_join_binned(pts, ivs, ["k"], bin_width_s=30, validate=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_guard_refuses_degenerate_interval(spark):
    pts = spark.createDataFrame([(1, "u", _ts(0.0))], "pid long, k string, ts timestamp")
    ivs = spark.createDataFrame(
        [(1, "u", _ts(0.0), _ts(1e7))],  # ~116-day interval
        "iid long, k string, start_ts timestamp, end_ts timestamp",
    )
    with pytest.raises(ValueError, match="bins"):
        range_join_binned(pts, ivs, ["k"], bin_width_s=60)
    with pytest.raises(ValueError, match="bin_width"):
        range_join_binned(pts, ivs, ["k"], bin_width_s=0)
    with pytest.raises(ValueError, match="direction"):
        asof_join(pts, pts.withColumnRenamed("pid", "rid"), ["k"], direction="nearest")
