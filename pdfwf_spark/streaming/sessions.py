"""Custom stateful streaming operator: gap-based conversation sessions
via applyInPandasWithState.

The reference is batch-only (SURVEY §2.9), so this has no reference
analog to match — it is the engine's demonstration of the Structured
Streaming stateful pattern a transcript pipeline needs in continuous
mode: group the turn stream by conv_id and maintain per-conv session
state (start/end/turn-count), closing a session when the gap between
consecutive turns exceeds `gap_s`.

Semantics (deterministic):
- per conv and micro-batch: merge buffered state with the batch's
  turns, order by (ts, turn_idx), split on gaps > gap_s;
- every segment except the last is CLOSED and emitted immediately;
- the trailing open segment is kept in state;
- when the event-time watermark passes last_ts + gap_s the state times
  out and the open segment is emitted (standard watermark-closure).

At scale this is the canonical shape: state is O(1) per conversation
(no turn buffering — only segment aggregates), keyed shuffle on
conv_id, watermark bounds state size.
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import datetime, timedelta
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("session_start", T.TimestampType(), False),
        T.StructField("session_end", T.TimestampType(), False),
        T.StructField("n_turns", T.LongType(), False),
        T.StructField("closed_by", T.StringType(), False),  # gap | timeout
    ]
)

# state: (session_start_epoch_us, last_ts_epoch_us, n_turns)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType(), True),
        T.StructField("last_us", T.LongType(), True),
        T.StructField("n_turns", T.LongType(), True),
    ]
)


def _us(ts: Any) -> int:
    return int(pd.Timestamp(ts).value // 1000)


def make_session_fn(gap_s: int):
    gap_us = gap_s * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        conv_id = key[0]
        closed: list[tuple] = []

        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n = state.get
                closed.append(
                    (conv_id, pd.Timestamp(start_us * 1000), pd.Timestamp(last_us * 1000),
                     n, "timeout")
                )
            state.remove()
            yield pd.DataFrame(closed, columns=[f.name for f in SESSION_SCHEMA.fields])
            return

        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = None, None, 0

        # applyInPandasWithState delivers a group's rows as MULTIPLE
        # Arrow chunks with no cross-chunk ordering guarantee — sorting
        # each chunk alone would corrupt the gap state machine when a
        # group exceeds arrow.maxRecordsPerBatch. Concatenate first
        # (bounded by the group's rows in THIS micro-batch), sort once.
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = pd.concat(chunks).sort_values(["ts", "turn_idx"])
            for ts in pdf["ts"]:
                t = _us(ts)
                if start_us is None:
                    start_us, last_us, n = t, t, 1
                elif t - last_us > gap_us:
                    closed.append(
                        (conv_id, pd.Timestamp(start_us * 1000),
                         pd.Timestamp(last_us * 1000), n, "gap")
                    )
                    start_us, last_us, n = t, t, 1
                else:
                    last_us, n = max(last_us, t), n + 1

        if start_us is not None:
            state.update((start_us, last_us, n))
            # close the open segment once the watermark passes last+gap
            state.setTimeoutTimestamp(last_us // 1000 + gap_s * 1000)

        yield pd.DataFrame(closed, columns=[f.name for f in SESSION_SCHEMA.fields])

    return fn


def start_session_agg(
    spark,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap_s: int = 1800,
    watermark: str = "1 minute",
    max_files_per_trigger: int = 16,
):
    """readStream(transcripts dir) -> stateful gap sessionization ->
    append parquet sink of CLOSED sessions."""
    from pdfwf_spark.schemas import TRANSCRIPT_SCHEMA

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
        .withWatermark("ts", watermark)
    )
    sessions = stream.groupBy("conv_id").applyInPandasWithState(
        make_session_fn(gap_s),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return (
        sessions.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def batch_sessions(transcripts: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Batch twin (the oracle-checkable equivalent): same gap-split
    semantics expressed with windows — used to cross-check the
    stateful streaming operator's output."""
    from pyspark.sql import Window

    ord_w = Window.partitionBy("conv_id").orderBy("ts", "turn_idx")
    # microsecond comparison, matching the stateful operator exactly —
    # second-truncated casts would disagree on fractional-second gaps
    gapped = transcripts.withColumn(
        "is_new",
        F.when(
            F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(ord_w)
            > gap_s * 1_000_000,
            1,
        ).otherwise(0),
    ).withColumn(
        "is_new",
        F.when(F.lag("ts").over(ord_w).isNull(), 1).otherwise(F.col("is_new")),
    )
    sess = gapped.withColumn(
        "session_no",
        F.sum("is_new").over(
            Window.partitionBy("conv_id").orderBy("ts", "turn_idx")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sess.groupBy("conv_id", "session_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_turns"),
    )
