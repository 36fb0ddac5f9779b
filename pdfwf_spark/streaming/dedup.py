"""Streaming incremental exact-dedup: documents arrive continuously,
each micro-batch keeps only docs whose content was never seen before
— in THIS batch or in any committed batch of history.

The production shape for a continuously-crawled corpus: the "seen"
state is a compact digest table (16-byte md5 per unique doc ever
kept, NOT the docs themselves), so per-batch work is

    batch -> digest -> in-batch keeper (min id per digest)
          -> broadcast/shuffle anti-join vs seen-digests
          -> append keepers + append their digests

which is O(batch + |seen| scan); at cluster scale the seen table is
bucketed by digest so the anti-join is a bucket-local semi-diff, and
the per-epoch appends are partitioned by digest prefix to keep files
aligned with those buckets.

Delivery semantics mirror streaming/ingest.py: foreachBatch is
at-least-once, so the digest append carries the epoch id and the
anti-join reads digests of ALL epochs (a replayed epoch's docs are
already in seen -> the replay appends nothing — idempotent without a
commit protocol, because KEEPING a doc twice is the only hazard and
the digest row from the first attempt blocks it; a crash BETWEEN the
data append and the digest append can duplicate one epoch's data on
replay, so jobs needing exactly-once layer the run_id lineage
protocol of ingest.py on top — kept out of this operator to keep the
state-table pattern legible).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

SEEN_SCHEMA = T.StructType(
    [
        T.StructField("digest", T.StringType(), False),
        T.StructField("epoch", T.LongType(), False),
    ]
)


def _seen_digests(spark: SparkSession, seen_path: str) -> DataFrame:
    # read_or_empty, NOT os.path.isdir: an isdir gate is
    # local-posix-only (always False on s3a://hdfs:// paths — which
    # would silently disable cross-batch dedup) and would also turn
    # storage outages into "no data yet"
    from pdfwf_spark.operators.lineage import read_or_empty

    return read_or_empty(spark, seen_path, SEEN_SCHEMA).select("digest")


def start_incremental_dedup(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint: str | None = None,
    max_files_per_trigger: int = 4,
    input_schema: T.StructType | None = None,
    compact_every: int | None = None,
) -> StreamingQuery:
    """Start the incremental-dedup stream over a parquet directory.

    Writes {out_dir}/docs (kept docs + their digest) and
    {out_dir}/seen (the digest state table). Returns the running
    StreamingQuery; callers own awaitTermination/stop.

    compact_every=N triggers compact_seen_state automatically after
    every N-th committed epoch, INSIDE foreachBatch — foreachBatch
    callbacks are strictly serialized by the streaming engine, so no
    concurrent reader can observe the directory swap mid-flight, and
    a long-lived stream's seen table stays at one file per digest
    bucket instead of one file per epoch ever processed. The epoch id
    is the streaming engine's (monotone across restarts), so the
    cadence survives stream restarts without extra state. None (the
    default) keeps compaction a between-runs maintenance call.
    """
    schema = input_schema or T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField(text_col, T.StringType(), True),
        ]
    )
    docs_path = os.path.join(out_dir, "docs")
    seen_path = os.path.join(out_dir, "seen")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def process_batch(batch: DataFrame, epoch: int) -> None:
        b = batch.withColumn("digest", F.md5(F.coalesce(F.col(text_col), F.lit(""))))
        # in-batch dedup first: deterministic min-id keeper per digest.
        # The trailing dropDuplicates matters: a replayed RECORD (same
        # id AND text twice in one batch) matches the semi-join twice —
        # semi-joins preserve left multiplicity
        w_min = b.groupBy("digest").agg(F.min(id_col).alias(id_col))
        kept = (
            b.join(w_min, ["digest", id_col], "left_semi")
            .dropDuplicates(["digest"])
        )
        # then against all committed history
        seen = _seen_digests(batch.sparkSession, seen_path)
        fresh = kept.join(seen, "digest", "left_anti")
        fresh = fresh.persist()
        try:
            fresh.write.mode("append").parquet(docs_path)
            (
                fresh.select("digest", F.lit(epoch).cast("long").alias("epoch"))
                .write.mode("append").parquet(seen_path)
            )
        finally:
            fresh.unpersist()
        # cadence: compact AFTER this epoch's digest append is durable,
        # so a crash during compaction can never lose a digest (the
        # pre-compact backup holds the uncompacted state, see
        # compact_seen_state's swap protocol)
        if compact_every and epoch > 0 and epoch % compact_every == 0:
            compact_seen_state(batch.sparkSession, out_dir)

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint or os.path.join(out_dir, "_chk"))
        .trigger(availableNow=True)
        .start()
    )


def compact_seen_state(
    spark: SparkSession, out_dir: str, n_buckets: int = 16
) -> dict:
    """Compact the digest state table between stream runs.

    Every epoch appends one small parquet file to {out_dir}/seen, so
    after E epochs the per-batch anti-join scans E files and carries
    one digest row per (digest, epoch) pair — replayed epochs and
    long-lived streams inflate both. Compaction rewrites the table as
    one deduplicated row per digest (earliest epoch wins, preserving
    "first time this content was committed") hash-repartitioned on
    digest into n_buckets files, so the follow-on runs' anti-joins
    scan a bounded, digest-clustered file set.

    Maintenance op for a STOPPED stream (call between
    start_incremental_dedup runs): the final directory swap is not
    atomic on a plain filesystem. The previous state is kept at
    seen.pre-compact until the swap completes and is removed only on
    success — a crash mid-swap leaves either the old or the new
    directory recoverable by rename. On a production deployment the
    state table is an Iceberg table (sinks/table.py gate) where this
    is `rewrite_data_files` under snapshot isolation and the caveat
    disappears.

    Returns {"rows_before", "rows_after", "files_before",
    "files_after"}.
    """
    import glob
    import shutil

    seen_path = os.path.join(out_dir, "seen")
    tmp_path = os.path.join(out_dir, "seen.compacting")
    bak_path = os.path.join(out_dir, "seen.pre-compact")
    from pdfwf_spark.operators.lineage import read_or_empty

    seen = read_or_empty(spark, seen_path, SEEN_SCHEMA)
    files_before = len(glob.glob(os.path.join(seen_path, "*.parquet")))
    rows_before = seen.count()
    compacted = (
        seen.groupBy("digest")
        .agg(F.min("epoch").alias("epoch"))
        .repartition(n_buckets, "digest")
    )
    for stale in (tmp_path, bak_path):
        if os.path.isdir(stale):
            shutil.rmtree(stale)
    compacted.write.mode("overwrite").parquet(tmp_path)
    rows_after = spark.read.parquet(tmp_path).count()
    if os.path.isdir(seen_path):
        os.rename(seen_path, bak_path)
    os.rename(tmp_path, seen_path)
    if os.path.isdir(bak_path):
        shutil.rmtree(bak_path)
    files_after = len(glob.glob(os.path.join(seen_path, "*.parquet")))
    return {
        "rows_before": rows_before,
        "rows_after": rows_after,
        "files_before": files_before,
        "files_after": files_after,
    }
