"""Continuous transcript ingest (Structured Streaming).

readStream(parquet dir) -> the same extract_df transform ->
foreachBatch: per micro-batch, append data + lineage with
run_id = f"{run_id_prefix}-{epoch}". Exactly-once at the sink comes
from the streaming checkpoint (epoch replays rewrite the same
run_id, and read_output filters to committed lineage) — the streaming
twin of the batch commit protocol in pipeline.run_extraction.

Watermark/event-time aggregation is intentionally absent: extraction
is per-row, so there is no cross-row streaming state (SURVEY §2.9 —
the reference has no streaming semantics to match). The ordering
window cannot run unbounded over an infinite stream; per micro-batch
ranking is correct here because a conversation's turns land within
one ingest partition in this mode (same assumption the batch job's
bucket commit makes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from pdfwf_spark.operators.partitioning import DEFAULT_BUCKETS
from pdfwf_spark.schemas import TRANSCRIPT_SCHEMA


def start_ingest(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    run_id_prefix: str = "stream",
    n_buckets: int = DEFAULT_BUCKETS,
    n_partitions: int | None = None,
    max_files_per_trigger: int = 16,
) -> StreamingQuery:
    from pyspark.sql import functions as F

    from pdfwf_spark.operators.extract import extract_turns, successes
    from pdfwf_spark.operators.lineage import lineage_rows
    from pdfwf_spark.operators.ordering import sort_for_extraction, with_turn_rank
    from pdfwf_spark.operators.partitioning import salted_repartition, with_bucket
    from pdfwf_spark.sinks.table import append_data, append_lineage

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    parts = n_partitions or spark.sparkContext.defaultParallelism

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        run_id = f"{run_id_prefix}-{epoch_id}"
        staged = sort_for_extraction(
            salted_repartition(with_bucket(batch_df, n_buckets), parts)
        )
        extracted = extract_turns(staged).persist()
        try:
            # rank ALL turns, then filter — matches the batch path
            ranked = successes(with_turn_rank(extracted)).withColumn(
                "run_id", F.lit(run_id)
            )
            append_data(ranked, f"{out_dir}/turns")
            append_lineage(lineage_rows(extracted, run_id), f"{out_dir}/lineage")
        finally:
            extracted.unpersist()

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
