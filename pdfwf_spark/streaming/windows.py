"""Event-time windowed aggregation with watermarked late-data policy.

The per-window throughput/volume report (the streaming twin of the
batch A4 throughput aggregate): tumbling or sliding event-time
windows over the transcript stream, with a watermark bounding both
state size and how late a turn may arrive and still count. Turns
later than the watermark are DROPPED from their (already finalized)
window — the standard completeness/latency trade; jobs that must
count stragglers exactly run the batch aggregate over the committed
table instead (same groupBy, no watermark).

In append output mode a window emits exactly once, when the
watermark passes its end — the right contract for appending per-window
rows to a metrics table.

Watermark timing nuance (pinned by the test): both late-row filtering
and window eviction use the watermark as of the START of a
micro-batch (i.e. computed from the PREVIOUS batch's max event time).
A straggler arriving in the same batch whose events push the
watermark past its window still lands in that window; it is dropped
only from the batch AFTER the watermark passed. Plan on one extra
micro-batch of lateness tolerance when sizing the delay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_turn_stats(
    stream: DataFrame,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "5 minutes",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Per-(window, role) turn counts and payload bytes.

    One watermarked groupBy: state is O(open windows x roles), bounded
    because the watermark finalizes (and frees) every window whose end
    precedes it. Works identically on a batch DataFrame (the watermark
    is then a no-op), which is how the test twins the semantics.
    """
    win = F.window(F.col(ts_col), window, slide or window)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(win.alias("win"), F.col("role"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.length(F.coalesce(F.col(text_col), F.lit("")))).alias(
                "bytes_in"
            ),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "role",
            "n_turns",
            "bytes_in",
        )
    )
