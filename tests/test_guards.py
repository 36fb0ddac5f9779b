"""Quadratic-blowup guards: hot-bucket caps on every banded candidate
self-join and the hot-shingle df cap on standalone exact Jaccard —
the difference between "bucketed" and "bucketed at 100 TB".

Skew fixture: a block of identical short docs (the degenerate bucket
every near-empty/boilerplate doc lands in) next to a few distinct
docs. Uncapped, the block alone contributes O(block^2) candidate
pairs; capped, its bucket is dropped and the distinct docs' results
are untouched.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pdfwf_spark.operators.dedup import (
    cap_hot_groups,
    hot_group_report,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_band_pairs,
)

N_HOT = 120          # identical docs -> one degenerate bucket
CAP = 50             # engages on the block, spares everything else


@pytest.fixture(scope="module")
def skewed_docs(spark):
    hot = [(i, "the same boilerplate text repeated everywhere always")
           for i in range(N_HOT)]
    distinct = [
        (1000 + i, f"unique document body number {i} with words {i * 7} "
                   f"and token{i} plus shared filler phrase")
        for i in range(8)
    ]
    return spark.createDataFrame(hot + distinct, "doc_id long, text string").cache()


def test_cap_hot_groups_drops_only_oversized(spark):
    df = spark.createDataFrame(
        [(i, "big") for i in range(60)] + [(i, "small") for i in range(5)],
        "id long, key string",
    )
    kept = cap_hot_groups(df, ["key"], 50)
    keys = [r["key"] for r in kept.select("key").distinct().collect()]
    assert keys == ["small"]
    assert cap_hot_groups(df, ["key"], None).count() == 65  # None disables


def test_hot_group_report_names_the_bucket(spark):
    df = spark.createDataFrame(
        [(i, "big") for i in range(60)] + [(0, "small")], "id long, key string"
    )
    rows = hot_group_report(df, ["key"], 50).collect()
    assert [(r["key"], r["group_size"]) for r in rows] == [("big", 60)]


def test_lsh_candidate_cap_engages(skewed_docs):
    sigs = minhash_signatures(skewed_docs, k=8).cache()
    uncapped = lsh_candidate_pairs(sigs, max_bucket_size=None)
    capped = lsh_candidate_pairs(sigs, max_bucket_size=CAP)
    # uncapped: the identical block alone is N_HOT*(N_HOT-1)/2 pairs
    assert uncapped.filter("id_a < 1000 AND id_b < 1000").count() == (
        N_HOT * (N_HOT - 1) // 2
    )
    # capped: the degenerate bucket is gone...
    assert capped.filter("id_a < 1000 AND id_b < 1000").count() == 0
    # ...and pairs among the distinct docs are identical to uncapped
    outside = lambda df: sorted(
        (r["id_a"], r["id_b"])
        for r in df.filter("id_a >= 1000").collect()
    )
    assert outside(capped) == outside(uncapped)
    sigs.unpersist()


def test_simhash_band_cap_engages(skewed_docs):
    capped = simhash_band_pairs(skewed_docs, max_bucket_size=CAP)
    assert capped.filter("id_a < 1000 AND id_b < 1000").count() == 0
    # bounded: every surviving bucket holds <= CAP rows, so candidates
    # are <= n_bands * CAP^2 / 2 no matter how skewed the corpus
    assert capped.count() <= 4 * CAP * CAP // 2


def test_ngram_jaccard_hot_shingle_guard(spark):
    """Docs whose ONLY overlap is a hot shingle must produce no pair
    under the df cap (and do produce pairs without it)."""
    hot_phrase = "click here to accept cookies"
    docs = spark.createDataFrame(
        [(i, f"{hot_phrase} article body {i} talks about topic{i} "
             f"entirely different content {i * 3}") for i in range(30)],
        "doc_id long, text string",
    )
    guarded = ngram_jaccard_pairs(docs, threshold=0.01, max_df=10)
    unguarded = ngram_jaccard_pairs(docs, threshold=0.01, max_df=None)
    assert guarded.count() == 0
    assert unguarded.count() == 30 * 29 // 2  # hot shingles pair everyone


def test_bucketed_neardup_cap_engages(spark):
    from pdfwf_spark.operators.similarity import bucketed_neardup_pairs

    hot = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(N_HOT)]
    distinct = [(1000, [9.0, -1.0, 0.5, 2.0]), (1001, [9.1, -1.0, 0.5, 2.0])]
    emb = spark.createDataFrame(hot + distinct,
                                "vec_id long, embedding array<float>")
    capped = bucketed_neardup_pairs(emb, threshold_milli=900, n_planes=2,
                                    max_bucket_size=CAP)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert all(a >= 1000 for a, _ in got)     # identical block dropped
    assert (1000, 1001) in got               # real near-dup pair survives
    uncapped = bucketed_neardup_pairs(emb, threshold_milli=900, n_planes=2,
                                      max_bucket_size=None)
    assert uncapped.filter("id_a < 1000").count() == N_HOT * (N_HOT - 1) // 2


def test_lsh_verified_respects_cap(skewed_docs):
    from pdfwf_spark.operators.dedup import lsh_verified_neardups

    out = lsh_verified_neardups(skewed_docs, threshold=0.01,
                                max_bucket_size=CAP)
    assert out.filter("id_a < 1000 AND id_b < 1000").count() == 0
