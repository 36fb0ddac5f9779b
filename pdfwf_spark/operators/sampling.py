"""Deterministic corpus sampling, splitting, and per-group caps.

Every operator here derives its randomness from md5 over a row key —
never rand()/sample(): the decisions are partitioning-invariant,
replayable across reruns and engines (the DuckDB oracles evaluate the
identical expressions), and stable under resume, which is what a
checkpointed 100 TB curation run actually needs. md5's first 8 hex
chars give a uniform 32-bit bucket; thresholds are expressed as exact
integer cuts of that space, so there is no float boundary drift.

- split_assign: train/val/test (or any weighted) split labels.
- stratified_sample: per-stratum keep fraction.
- cap_per_group: at most k rows per group in deterministic hash
  order (per-domain caps, per-license caps — one window, QUALIFY
  shape).
- group_mix_weights: per-group sampling weights targeting a cap —
  the "domain mixing" table a weighted dataloader consumes.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SPACE = 1 << 32  # md5 first-8-hex-chars bucket space


def _hash_bucket(key: Column, salt: str) -> Column:
    """Uniform long in [0, 2^32) from md5 over salt#key. The salt
    decorrelates different operators keyed on the same column (a doc
    sampled INTO the val split must not also be systematically the
    doc a stratified sample keeps)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + "#"), key.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")


DEFAULT_SPLIT_WEIGHTS = {"train": 0.98, "val": 0.01, "test": 0.01}


def split_cuts(weights: Mapping[str, float]) -> list[tuple[str, int]]:
    """(label, exclusive upper cut) pairs partitioning the 2^32 hash
    space in proportion to `weights`. Exposed so SQL oracles can inline
    the byte-identical integer thresholds split_assign evaluates."""
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError(f"weights must be non-negative, got {weights!r}")
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights sum to zero")
    cuts = []
    acc = 0.0
    for name, w in weights.items():
        acc += w / total
        cuts.append((name, min(int(acc * _SPACE), _SPACE)))
    return cuts


def split_assign(
    df: DataFrame,
    key_col: str,
    weights: Mapping[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Append a `split` label drawn deterministically per key.

    weights default to DEFAULT_SPLIT_WEIGHTS (98/1/1). Boundaries are
    integer cuts of the 2^32 hash space computed once on the driver;
    the per-row work is one md5 + a CASE — no shuffle at all, and the
    assignment survives any re-partition, resume, or engine swap.
    """
    cuts = split_cuts(weights or DEFAULT_SPLIT_WEIGHTS)
    b = _hash_bucket(F.col(key_col), salt)
    expr = None
    for name, cut in cuts:
        cond = b < cut
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    # float accumulation can leave the last cut a hair under 2^32 —
    # the final label is the explicit otherwise, so no row is unlabeled
    expr = expr.otherwise(cuts[-1][0])
    return df.withColumn("split", expr)


def split_manifest(
    df: DataFrame,
    key_col: str,
    group_cols: tuple[str, ...] = (),
    size_col: str | None = None,
    weights: Mapping[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Dataset card: one row per (split, *group_cols) with n_docs,
    total/avg size — the summary a training run records next to its
    manifest. Composition of split_assign (zero-shuffle labels) + one
    map-side-combined aggregate; avg is integer milli (no float
    drift). `size_col=None` counts rows only."""
    labeled = split_assign(df, key_col, weights, salt)
    keys = ["split", *group_cols]
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    if size_col is not None:
        aggs += [
            F.sum(size_col).cast("long").alias("total_size"),
            F.expr(f"CAST((1000 * sum({size_col})) DIV count(1) AS BIGINT)").alias(
                "avg_size_milli"
            ),
        ]
    return labeled.groupBy(*keys).agg(*aggs)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    fractions: Mapping[str, float],
    stratum_col: str,
    default_fraction: float = 0.0,
    salt: str = "strat",
) -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows.

    fractions maps stratum value -> keep fraction; strata absent from
    the map keep `default_fraction`. Implemented as one md5 bucket
    compare against a per-stratum integer threshold (broadcast via a
    CASE over the — small — fraction map). No shuffle, no rand()."""
    for k, v in fractions.items():
        if not (0.0 <= v <= 1.0):
            raise ValueError(f"fraction for {k!r} must be in [0,1], got {v}")
    if not (0.0 <= default_fraction <= 1.0):
        raise ValueError(f"default_fraction must be in [0,1]")
    b = _hash_bucket(F.col(key_col), salt)
    thr = None
    for k, v in fractions.items():
        cut = int(v * _SPACE)
        cond = F.col(stratum_col) == k
        thr = F.when(cond, cut) if thr is None else thr.when(cond, cut)
    thr = (
        thr.otherwise(int(default_fraction * _SPACE))
        if thr is not None
        else F.lit(int(default_fraction * _SPACE))
    )
    return df.filter(b < thr)


def cap_per_group(
    df: DataFrame,
    group_col: str,
    k: int,
    key_col: str,
    salt: str = "cap",
) -> DataFrame:
    """At most k rows per group, chosen in deterministic hash order.

    The canonical per-domain cap (C4/RefinedWeb-style): one window
    row_number per group ordered by (md5 bucket, key) — the key
    tiebreak makes the pick total even under md5-prefix collisions.
    The shuffle partitions by group; a skewed mega-group is bounded by
    AQE skew handling plus the fact that only rank <= k rows survive
    the stage."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    w = Window.partitionBy(group_col).orderBy(
        _hash_bucket(F.col(key_col), salt), F.col(key_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def group_mix_weights(
    df: DataFrame, group_col: str, cap: int
) -> DataFrame:
    """Per-group sampling weights targeting at most `cap` expected
    rows per group: weight_milli = min(1000, 1000*cap/n). One
    map-side-combined count per group; the output is the (tiny)
    mixing table a weighted dataloader or a follow-on
    stratified_sample consumes."""
    if cap <= 0:
        raise ValueError(f"cap must be positive, got {cap}")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_rows"))
    return counts.select(
        group_col,
        "n_rows",
        F.least(
            F.lit(1000).cast("long"),
            F.floor(F.lit(1000) * cap / F.col("n_rows")).cast("long"),
        ).alias("weight_milli"),
    )
