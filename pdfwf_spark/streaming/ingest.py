"""Continuous transcript ingest (Structured Streaming).

readStream(parquet dir) -> the same extract transform ->
foreachBatch: per micro-batch, append data + lineage with
run_id = f"{run_id_prefix}-{epoch}".

Delivery semantics: foreachBatch is AT-LEAST-ONCE (a crash between the
data/lineage appends and the offset commit replays the epoch). The
batch body makes the replay a NO-OP: an epoch whose run_id already
appears in committed lineage is skipped, so the sink is effectively
once as long as the lineage append is the last write of the batch
(data-then-lineage, same ordering as the batch commit protocol in
pipeline.run_extraction; a crash between the two leaves orphan data
rows that read_output's committed-lineage semi-join hides).

Turn ranking across micro-batches: a conversation's turns may arrive
over many epochs (maxFilesPerTrigger bounds each batch), so per-batch
ranks are OFFSET by the max committed rank per conv_id — turn N+1 of
a conv that already committed N turns gets rank N+1, never a colliding
rank. Ordering is therefore arrival-epoch-major, (turn_idx, ts, role,
tie_key) within an epoch: correct whenever turns arrive in epoch order
(the append-only ingest contract); cross-epoch REORDERING would need
an event-time watermark, which the reference has no analog of
(SURVEY §2.9 — batch-only).

Watermark/event-time aggregation is intentionally absent: extraction
is per-row, so there is no cross-row streaming state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
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
    from pdfwf_spark.operators.extract import extract_turns, successes
    from pdfwf_spark.operators.lineage import lineage_rows, read_lineage
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
        lineage = read_lineage(spark, f"{out_dir}/lineage")
        if lineage.filter(F.col("run_id") == run_id).limit(1).count() > 0:
            return  # replayed epoch: already committed -> idempotent no-op
        has_committed = lineage.limit(1).count() > 0

        staged = sort_for_extraction(
            salted_repartition(with_bucket(batch_df, n_buckets), parts)
        )
        extracted = extract_turns(staged).persist()
        try:
            # rank ALL turns, then filter — matches the batch path
            ranked = successes(with_turn_rank(extracted))
            if has_committed:
                # continue each conv's rank sequence where the
                # committed output left off (no colliding keys when a
                # conv spans micro-batches)
                from pdfwf_spark.pipeline import read_output

                prior = (
                    read_output(spark, out_dir)
                    .groupBy("conv_id")
                    .agg(F.max("turn_rank").alias("_prior_max"))
                )
                ranked = (
                    ranked.join(prior, "conv_id", "left")
                    .withColumn(
                        "turn_rank",
                        F.col("turn_rank") + F.coalesce(F.col("_prior_max"), F.lit(0)),
                    )
                    .drop("_prior_max")
                )
            ranked = ranked.withColumn("run_id", F.lit(run_id))
            append_data(ranked, f"{out_dir}/turns")
            # lineage append LAST: its presence marks the epoch committed
            append_lineage(lineage_rows(extracted, run_id), f"{out_dir}/lineage")
        finally:
            extracted.unpersist()

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
