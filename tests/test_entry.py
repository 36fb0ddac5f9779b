"""Driver-contract smoke: entry() runs and yields a stable schema."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert [f.name for f in df.schema.fields] == [
        "conv_id", "turn_idx", "turn_rank", "parser", "clean_text", "meta", "spans",
    ]
    parsers = {r["parser"] for r in df.select("parser").distinct().collect()}
    assert {"html", "pdfish", "plain"} <= parsers
