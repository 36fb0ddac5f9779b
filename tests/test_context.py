"""Conversation-context assembly vs exact python twins; chunked ==
unchunked exactness; pair segmentation; render ordering."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from pdfwf_spark.operators.context import (
    alternation_violations,
    assemble_context,
    collapse_repeated_turns,
    detect_tool_loops,
    prompt_response_pairs,
    render_conversations,
)

T0 = datetime(2024, 1, 1)


def _rows(conv, triples):
    """triples: (turn_idx, role, text)"""
    return [
        (conv, i, r, t, "", T0 + timedelta(seconds=7 * i))
        for (i, r, t) in triples
    ]


@pytest.fixture(scope="module")
def turns(spark):
    data = _rows(
        "c1",
        [
            (0, "user", "hello"),
            (1, "assistant", "hi there"),
            (2, "user", "do thing"),
            (3, "tool", "tool output"),
            (4, "assistant", "done"),
            (5, "user", "thanks"),
        ],
    ) + _rows(
        "c2",
        [
            (0, "user", "solo question"),
            (1, "assistant", "solo answer"),
        ],
    )
    return spark.createDataFrame(
        data, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )


def _ctx_twin(triples, k, sep="\n"):
    ents = [f"{r}: {t}" for (_, r, t) in triples]
    return {
        triples[i][0]: sep.join(ents[max(0, i - k) : i])
        for i in range(len(triples))
    }


def test_assemble_context_matches_twin(spark, turns):
    out = assemble_context(turns, k=2).filter(F.col("conv_id") == "c1")
    got = {r["turn_idx"]: r["context"] for r in out.collect()}
    want = _ctx_twin(
        [
            (0, "user", "hello"),
            (1, "assistant", "hi there"),
            (2, "user", "do thing"),
            (3, "tool", "tool output"),
            (4, "assistant", "done"),
            (5, "user", "thanks"),
        ],
        k=2,
    )
    assert got == want
    assert got[0] == ""  # opening turn: empty, not null


@pytest.mark.parametrize("chunk_size", [2, 3, 4, 100])
def test_chunked_equals_unchunked(spark, turns, chunk_size):
    plain = {
        (r["conv_id"], r["turn_idx"]): r["context"]
        for r in assemble_context(turns, k=2).collect()
    }
    chunked = {
        (r["conv_id"], r["turn_idx"]): r["context"]
        for r in assemble_context(turns, k=2, chunk_size=chunk_size).collect()
    }
    assert chunked == plain


@pytest.mark.parametrize("seed,k,chunk_size", [
    (1, 1, 1), (2, 2, 2), (3, 2, 5), (4, 3, 3), (5, 4, 7), (6, 5, 64),
])
def test_chunked_equals_unchunked_randomized(spark, seed, k, chunk_size):
    """Seeded random conversation shapes (varying lengths, many convs,
    dense turn_idx) — the chunk-overlap rewrite must be row-identical
    to the global window for any (k, chunk_size >= k)."""
    import random

    rng = random.Random(seed)
    rows = []
    for c in range(12):
        n = rng.randint(1, 40)
        for i in range(n):
            rows.append((
                f"c{c:03d}", i, rng.choice(["user", "assistant", "tool"]),
                f"m{rng.randint(0, 9)}", "", T0 + timedelta(seconds=i),
            ))
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    plain = {(r["conv_id"], r["turn_idx"]): r["context"]
             for r in assemble_context(df, k=k).collect()}
    chunked = {(r["conv_id"], r["turn_idx"]): r["context"]
               for r in assemble_context(df, k=k, chunk_size=chunk_size).collect()}
    assert chunked == plain


def test_chunked_schema_matches_plain(spark, turns):
    plain = assemble_context(turns, k=2)
    chunked = assemble_context(turns, k=2, chunk_size=4)
    assert chunked.columns == plain.columns  # helper cols dropped


def test_chunk_size_below_k_rejected(spark, turns):
    with pytest.raises(ValueError, match="chunk_size"):
        assemble_context(turns, k=3, chunk_size=2)


def test_validate_rejects_sparse_chunks(spark):
    # turn_idx jumps: chunk 0 holds a single row < k=2 while chunk 2
    # exists -> dup rows cannot cover chunk 1's frame.
    df = spark.createDataFrame(
        [("c", 0, "user", "a", "", T0), ("c", 9, "user", "b", "", T0)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    with pytest.raises(ValueError, match="sparse"):
        assemble_context(df, k=2, chunk_size=4, validate=True)


def test_truncation_applied_per_turn(spark, turns):
    out = assemble_context(turns, k=1, max_chars_per_turn=2).filter(
        (F.col("conv_id") == "c1") & (F.col("turn_idx") == 1)
    )
    assert out.collect()[0]["context"] == "user: he"


def test_prompt_response_pairs(spark, turns):
    out = prompt_response_pairs(turns).orderBy("conv_id", "pair_idx").collect()
    got = [
        (r["conv_id"], r["pair_idx"], r["response_turn_idx"], r["prompt"], r["response"])
        for r in out
    ]
    assert got == [
        ("c1", 0, 1, "user: hello", "hi there"),
        ("c1", 1, 4, "user: do thing\ntool: tool output", "done"),
        ("c2", 0, 1, "user: solo question", "solo answer"),
    ]
    # trailing 'thanks' (no response after it) produced no pair
    assert all(r["response"] is not None for r in out)


def test_render_conversations(spark, turns):
    out = {r["conv_id"]: r for r in render_conversations(turns).collect()}
    assert out["c2"]["rendered"] == "user: solo question\nassistant: solo answer"
    assert out["c2"]["n_turns"] == 2
    assert out["c2"]["n_chars"] == len(out["c2"]["rendered"])
    assert out["c1"]["rendered"].startswith("user: hello\nassistant: hi there")


@pytest.fixture(scope="module")
def loopy(spark):
    # c: run of 3 identical tool turns + a double-send; d: clean
    data = [
        ("c", 0, "user", "go", "", T0),
        ("c", 1, "tool", "timeout", "", T0),
        ("c", 2, "tool", "timeout", "", T0),
        ("c", 3, "tool", "timeout", "", T0),
        ("c", 4, "assistant", "giving up", "", T0),
        ("c", 5, "user", "retry", "", T0),
        ("c", 6, "user", "retry", "", T0),
        ("c", 7, "tool", "timeout", "", T0),  # same text, non-adjacent run
        ("d", 0, "user", "hi", "", T0),
        ("d", 1, "assistant", "hello", "", T0),
    ]
    return spark.createDataFrame(
        data, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )


def test_collapse_repeated_turns(spark, loopy):
    out = collapse_repeated_turns(loopy)
    assert out.columns == loopy.columns
    got = sorted((r["conv_id"], r["turn_idx"]) for r in out.collect())
    # keeps the FIRST of each run: drops c2, c3, c6
    assert got == [
        ("c", 0), ("c", 1), ("c", 4), ("c", 5), ("c", 7), ("d", 0), ("d", 1)
    ]


def test_detect_tool_loops(spark, loopy):
    got = {
        (r["conv_id"], r["role"], r["run_start_idx"], r["run_len"])
        for r in detect_tool_loops(loopy, min_run=3).collect()
    }
    assert got == {("c", "tool", 1, 3)}
    # min_run=2 also surfaces the user double-send
    got2 = {
        (r["conv_id"], r["role"], r["run_start_idx"], r["run_len"])
        for r in detect_tool_loops(loopy, min_run=2).collect()
    }
    assert got2 == {("c", "tool", 1, 3), ("c", "user", 5, 2)}


def test_detect_tool_loops_min_run_guard(spark, loopy):
    with pytest.raises(ValueError, match="min_run"):
        detect_tool_loops(loopy, min_run=1)


def test_dialogue_segment_pairs(spark):
    from pdfwf_spark.operators.context import dialogue_segment_pairs

    # a and b share the 3-turn run (x,y,z) twice-shifted? build:
    # a: x y z w ; b: q x y z ; c: unrelated
    def conv(cid, texts):
        return [(cid, i, "user", t, "", T0) for i, t in enumerate(texts)]

    df = spark.createDataFrame(
        conv("a", ["x", "y", "z", "w"])
        + conv("b", ["q", "x", "y", "z"])
        + conv("c", ["m", "n", "o", "p"]),
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    got = {(r["conv_a"], r["conv_b"]): r["n_shared"]
           for r in dialogue_segment_pairs(df, w=3).collect()}
    assert got == {("a", "b"): 1}  # only the (x,y,z) segment is shared

    # w=2: (x,y) and (y,z) shared -> n_shared 2
    got2 = {(r["conv_a"], r["conv_b"]): r["n_shared"]
            for r in dialogue_segment_pairs(df, w=2).collect()}
    assert got2 == {("a", "b"): 2}

    with pytest.raises(ValueError, match="w must"):
        dialogue_segment_pairs(df, w=1)


def test_dialogue_segment_pairs_dedups_repeats(spark):
    from pdfwf_spark.operators.context import dialogue_segment_pairs

    # the SAME segment appearing twice within one conv counts once
    rows = [("a", i, "user", t, "", T0)
            for i, t in enumerate(["x", "y", "x", "y", "x"])]
    rows += [("b", i, "user", t, "", T0) for i, t in enumerate(["x", "y"])]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    got = {(r["conv_a"], r["conv_b"]): r["n_shared"]
           for r in dialogue_segment_pairs(df, w=2).collect()}
    assert got == {("a", "b"): 1}


def test_conversation_stats(spark, loopy):
    from pdfwf_spark.curation import conversation_stats

    got = {r["conv_id"]: r for r in conversation_stats(loopy).collect()}
    c = got["c"]
    # c roles: user,tool,tool,tool,assistant,user,user,tool
    assert c["n_turns"] == 8
    assert c["n_violations"] == 3   # tool x2 extra + user double-send
    assert c["max_run_len"] == 3
    assert c["tool_milli"] == 500   # 4 of 8
    assert c["n_chars"] == sum(
        len(r["text"]) for r in loopy.collect() if r["conv_id"] == "c"
    )
    d = got["d"]
    assert (d["n_turns"], d["n_violations"], d["max_run_len"], d["tool_milli"]) == (2, 0, 1, 0)


def test_curate_conversations(spark, loopy):
    from pdfwf_spark.curation import curate_conversations

    # run floor kills c, keeps d
    out = curate_conversations(loopy, min_turns=2, max_run_len=2)
    assert {r["conv_id"] for r in out.collect()} == {"d"}
    assert out.columns == loopy.columns
    # violations floor
    out2 = curate_conversations(loopy, max_violations=3)
    assert {r["conv_id"] for r in out2.collect()} == {"c", "d"}
    # tool share floor
    out3 = curate_conversations(loopy, max_tool_milli=100)
    assert {r["conv_id"] for r in out3.collect()} == {"d"}


def test_alternation_violations(spark):
    df = spark.createDataFrame(
        [
            ("c", 0, "user", "a", "", T0),
            ("c", 1, "user", "b", "", T0),      # violation
            ("c", 2, "assistant", "c", "", T0),
            ("c", 3, "assistant", "d", "", T0), # violation
            ("d", 0, "user", "e", "", T0),      # first turn never flags
        ],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    got = {(r["conv_id"], r["turn_idx"]) for r in alternation_violations(df).collect()}
    assert got == {("c", 1), ("c", 3)}
