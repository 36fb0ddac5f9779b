"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k as the correctness baseline; an LSH-bucketed
(random-hyperplane / sign-bit) variant as the scale path: at 100 TB
the cross join is infeasible, but hyperplane buckets shrink each
probe to one bucket's worth of candidates, and the bucket join is a
plain equi-join Catalyst shuffles on the bucket key.

All scores are computed in float64 with a fixed left-to-right
accumulation (F.aggregate) and exported as `cos_milli`
(round(1000*cos) int) so a DuckDB oracle hash-matches without float
drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def with_unit_norm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Precompute the L2 norm once per row (scan-side, codegen'd)."""
    v = _as_double(F.col(vec_col))
    return emb.withColumn("_vec", v).withColumn("_norm", _norm(F.col("_vec")))


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: broadcast the (small) query side,
    score every corpus row, rank per query.

    Output: q_id, n_id, rank, cos_milli. Ties after rounding break on
    n_id ascending so the result is total-order deterministic.
    """
    from pdfwf_spark.operators.partitioning import repartition_for_scan

    corpus = with_unit_norm(repartition_for_scan(emb), vec_col).select(
        F.col(id_col).alias("n_id"), "_vec", F.col("_norm").alias("_n_norm")
    )
    qs = with_unit_norm(queries, vec_col).select(
        F.col(id_col).alias("q_id"), F.col("_vec").alias("_q_vec"),
        F.col("_norm").alias("_q_norm"),
    )
    scored = (
        corpus.join(F.broadcast(qs), F.col("n_id") != F.col("q_id"))
        .withColumn(
            "cos_milli",
            F.round(
                1000 * _dot(F.col("_vec"), F.col("_q_vec"))
                / (F.col("_n_norm") * F.col("_q_norm"))
            ).cast("int"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_milli"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", "cos_milli")
    )


MAX_EXACT_NEARDUP_ROWS = 2000


def exact_neardup_pairs(
    emb: DataFrame,
    threshold_milli: int = 950,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int = MAX_EXACT_NEARDUP_ROWS,
) -> DataFrame:
    """All-pairs cosine near-dup — the ORACLE BASELINE, O(n^2).

    Hard-guarded: refuses inputs above `max_rows` so the quadratic
    theta-join can never be pointed at a full corpus by accident. The
    production path is bucketed_neardup_pairs (LSH equi-join).
    """
    n = emb.count()
    if n > max_rows:
        raise ValueError(
            f"exact_neardup_pairs is an O(n^2) baseline guarded at "
            f"{max_rows} rows; got {n}. Use bucketed_neardup_pairs for "
            f"corpus-scale near-dup."
        )
    v = emb.select(
        F.col(id_col).alias("id"),
        _as_double(F.col(vec_col)).alias("vec"),
        _norm(_as_double(F.col(vec_col))).alias("nrm"),
    )
    l, r = v.alias("l"), v.alias("r")
    return (
        l.join(r, F.col("l.id") < F.col("r.id"))
        .withColumn(
            "cos_milli",
            F.round(
                1000 * _dot(F.col("l.vec"), F.col("r.vec"))
                / (F.col("l.nrm") * F.col("r.nrm"))
            ).cast("int"),
        )
        .filter(F.col("cos_milli") >= threshold_milli)
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"), "cos_milli")
    )


def hyperplane_buckets(
    emb: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Sign-bit LSH bucket per vector: bit i = sign(<v, h_i>) where
    h_i is a deterministic pseudo-random hyperplane derived from
    (seed, i, dim) via a hash — no driver-side randomness, so every
    executor derives identical planes.
    """
    dim = F.size(F.col(vec_col))
    v = _as_double(F.col(vec_col))
    bits = []
    for i in range(n_planes):
        # plane component c_j in {-1,+1} from xxhash64(seed, i, j)
        proj = F.aggregate(
            F.zip_with(
                v,
                F.sequence(F.lit(0), dim - 1),
                lambda x, j: x
                * (F.pmod(F.xxhash64(F.lit(seed), F.lit(i), j), F.lit(2)) * 2 - 1),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0)))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return emb.withColumn("bucket", bucket.cast("int"))


def bucketed_neardup_pairs(
    emb: DataFrame,
    threshold_milli: int = 950,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs (cosine >= threshold) among same-bucket
    vectors: the equi-join on bucket bounds the pair blowup; misses
    across bucket boundaries are the standard LSH recall trade-off
    (raise recall with multiple tables at scale).
    """
    from pdfwf_spark.operators.partitioning import repartition_for_scan

    b = hyperplane_buckets(repartition_for_scan(emb), n_planes, id_col, vec_col)
    nb = with_unit_norm(b, vec_col).select(
        F.col(id_col).alias("id"), "bucket", "_vec", "_norm"
    )
    l, r = nb.alias("l"), nb.alias("r")
    return (
        l.join(r, (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.id") < F.col("r.id")))
        .withColumn(
            "cos_milli",
            F.round(
                1000 * _dot(F.col("l._vec"), F.col("r._vec"))
                / (F.col("l._norm") * F.col("r._norm"))
            ).cast("int"),
        )
        .filter(F.col("cos_milli") >= threshold_milli)
        .select(
            F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"), "cos_milli"
        )
    )
