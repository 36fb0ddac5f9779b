"""Streaming rolling-context assembly: the continuous sibling of
operators/context.assemble_context (its batch twin, oracled as the
driver query `ctx_assemble`).

Turns arrive as a stream; every turn is emitted exactly once, carrying
the rendered previous-k-turn context of its conversation. Per-conv
state is a RING of the last k (turn_idx, rendered-entry) pairs — O(k
* entry chars) per live conversation, independent of conversation
length — and the event-time watermark evicts conversations idle
longer than `ttl_s` (standard state-bounding; a turn arriving after
eviction restarts with an empty context, flagged by n_ctx).

Ordering semantics: within a micro-batch turns sort by (turn_idx,
ts); across batches, a turn older than the newest state entry is
flagged `late=true` and gets the best context available (the ring
keeps only turns BELOW the late turn's index in range). With in-order
delivery — the normal shape for an appended transcript log — output
context equals the batch operator's exactly (pytest-pinned).
"""

from __future__ import annotations

import bisect
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import functions as F  # noqa: F401  (parity with siblings)
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CTX_OUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("context", T.StringType(), False),
        T.StructField("n_ctx", T.IntegerType(), False),
        T.StructField("late", T.BooleanType(), False),
    ]
)

# ring of the last k turns + the newest event time (drives the ttl)
CTX_STATE_SCHEMA = T.StructType(
    [
        T.StructField("keys", T.ArrayType(T.IntegerType()), True),
        T.StructField("entries", T.ArrayType(T.StringType()), True),
        T.StructField("last_us", T.LongType(), True),
    ]
)


def make_context_fn(k: int, ttl_s: int, max_chars_per_turn: int | None, sep: str):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        conv_id = key[0]
        cols = [f.name for f in CTX_OUT_SCHEMA.fields]

        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame([], columns=cols)
            return

        if state.exists:
            keys, entries, last_us = state.get
            keys, entries = list(keys), list(entries)
        else:
            keys, entries, last_us = [], [], 0

        out: list[tuple] = []
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = pd.concat(chunks).sort_values(["turn_idx", "ts"])
            for row in pdf.itertuples(index=False):
                idx = int(row.turn_idx)
                late = bool(keys) and idx <= keys[-1]
                pos = bisect.bisect_left(keys, idx)
                ctx = entries[max(0, pos - k) : pos]
                out.append((conv_id, idx, sep.join(ctx), len(ctx), late))
                text = row.text if max_chars_per_turn is None else row.text[:max_chars_per_turn]
                keys.insert(pos, idx)
                entries.insert(pos, f"{row.role}: {text}")
                if len(keys) > k:
                    del keys[0], entries[0]
                last_us = max(last_us, int(pd.Timestamp(row.ts).value // 1000))

        if keys:
            state.update((keys, entries, last_us))
            state.setTimeoutTimestamp(last_us // 1000 + ttl_s * 1000)

        yield pd.DataFrame(out, columns=cols)

    return fn


def start_context_assembly(
    spark,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    k: int = 3,
    ttl_s: int = 86400,
    watermark: str = "1 minute",
    max_chars_per_turn: int | None = None,
    sep: str = "\n",
    max_files_per_trigger: int = 16,
):
    """readStream(transcripts dir) -> stateful rolling-context
    assembly -> append parquet sink of context-tagged turns."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pdfwf_spark.schemas import TRANSCRIPT_SCHEMA

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
        .withWatermark("ts", watermark)
    )
    tagged = stream.groupBy("conv_id").applyInPandasWithState(
        make_context_fn(k, ttl_s, max_chars_per_turn, sep),
        outputStructType=CTX_OUT_SCHEMA,
        stateStructType=CTX_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return (
        tagged.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
