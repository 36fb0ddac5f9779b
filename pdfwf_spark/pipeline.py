"""End-to-end extraction job (SURVEY §3.1 Spark lifecycle).

    scan -> anti-join lineage (resume) -> [salted repartition, only if
    the scan layout needs it] -> mapInPandas(sniff -> route -> parse)
    -> stable ordering window -> write data, then lineage

Plan properties (asserted in tests via .explain):
- the resume anti-join is a BroadcastHashJoin (lineage side is tiny);
- AT MOST one wide shuffle before the UDF (the salted repartition,
  skipped when scan splits already balance the work) and exactly one
  after (the per-conv ordering window, which moves the smaller
  post-extraction rows);
- no driver-side loops, no collect.

Commit protocol (reference analog: convert.py:144-182 timer-log
checkpointing): data for a run is written first; the per-bucket
lineage rows are written only after the data write completes.
A crash between the two leaves orphan data files for uncommitted
buckets; on resume those buckets are re-processed and the orphans are
superseded on read by filtering to committed run_ids (Iceberg's
snapshot commit subsumes this dance when its catalog is present).
"""

from __future__ import annotations

import re
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pdfwf_spark.operators.extract import extract_turns
from pdfwf_spark.operators.lineage import filter_uncommitted, lineage_rows, read_lineage
from pdfwf_spark.schemas import LINEAGE_SCHEMA
from pdfwf_spark.operators.ordering import sort_for_extraction, with_turn_rank
from pdfwf_spark.operators.partitioning import (
    DEFAULT_BUCKETS,
    DEFAULT_SALTS,
    salted_repartition,
    with_bucket,
)
from pdfwf_spark.sinks.table import append_data, append_lineage


@dataclass
class RunResult:
    run_id: str
    input_rows: int
    ok_rows: int
    failed_rows: int
    buckets_processed: int
    elapsed_s: float
    # driver-side stage walls (reference timer stage tags,
    # timer.py:36-129: 'write-jsonl' / 'finished-parsing'); per-bucket
    # 'parser-parse' wall lives in the lineage rows (extract_ms)
    write_s: float = 0.0
    lineage_s: float = 0.0


def _stage_inputs(
    transcripts: DataFrame,
    n_buckets: int,
    n_partitions: int,
    n_salts: int,
    prepartition: str,
    stable_sort: bool = False,
) -> DataFrame:
    """Bucket + (conditionally) salt-repartition + stable intra-
    partition sort.

    prepartition:
    - "auto" (default): shuffle only when the scan has fewer
      partitions than the target. Parquet/Iceberg splits already
      spread turns arbitrarily across tasks (row groups do not follow
      conv boundaries) and extraction is per-row, so a well-split scan
      needs NO payload shuffle before the UDF — at 10^12 turns that
      skips a full-corpus shuffle; the only wide exchange left is the
      ordering window over the (smaller) post-extraction rows.
    - "always": force the salted repartition — for inputs whose file
      layout is conv-clustered/skewed (e.g. one giant file per
      mega-conversation) where scan splits alone would be unbalanced.
    - "never": trust the scan layout unconditionally.
    """
    staged = with_bucket(transcripts, n_buckets)
    if prepartition == "always" or (
        prepartition == "auto" and staged.rdd.getNumPartitions() < n_partitions
    ):
        staged = salted_repartition(staged, n_partitions, n_salts)
    if stable_sort:
        staged = sort_for_extraction(staged)
    return staged


def extract_df(
    transcripts: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    n_partitions: int | None = None,
    n_salts: int = DEFAULT_SALTS,
    prepartition: str = "auto",
    stable_sort: bool = False,
    markdown_compat: bool = False,
) -> DataFrame:
    """Pure transform: transcripts -> ranked extraction output (all
    statuses). Composable; no I/O.

    markdown_compat: the reference's optional markdown repair pass
    (nougat_.py:245-246, config.markdown) — applied JVM-side on
    clean_text (codegen'd regexes, no extra Python)."""
    spark = transcripts.sparkSession
    n_partitions = n_partitions or spark.sparkContext.defaultParallelism
    staged = _stage_inputs(
        transcripts, n_buckets, n_partitions, n_salts, prepartition, stable_sort
    )
    out = with_turn_rank(extract_turns(staged))
    if markdown_compat:
        from pdfwf_spark.operators.functions import markdown_compatible_col

        out = out.withColumn("clean_text", markdown_compatible_col(F.col("clean_text")))
    return out


def run_extraction(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    run_id: str | None = None,
    n_buckets: int = DEFAULT_BUCKETS,
    n_partitions: int | None = None,
    n_salts: int = DEFAULT_SALTS,
    resume: bool = True,
    prepartition: str = "auto",
    markdown_compat: bool = False,
) -> RunResult:
    """Execute the job against `out_dir` (data at {out_dir}/turns,
    lineage at {out_dir}/lineage)."""
    t0 = time.monotonic()
    run_id = run_id or uuid.uuid4().hex[:12]
    # run_id becomes a literal partition-directory component that
    # lineage_from_written string-builds back ("{data_path}/run_id={run_id}");
    # any char Spark percent-escapes in partition dir names (space ':' '%'
    # '/') would make that pruned read miss the files just written and
    # silently orphan the run's data — reject up front instead
    if not re.fullmatch(r"[A-Za-z0-9._-]+", run_id):
        raise ValueError(
            f"run_id {run_id!r} must match [A-Za-z0-9._-]+ (it is used "
            "verbatim as a partition directory name)"
        )
    data_path = f"{out_dir}/turns"
    lineage_path = f"{out_dir}/lineage"

    inputs = with_bucket(transcripts, n_buckets)
    if resume:
        inputs = filter_uncommitted(inputs, read_lineage(spark, lineage_path))

    n_partitions = n_partitions or spark.sparkContext.defaultParallelism
    # reuse the same staging logic as extract_df (bucket col already
    # attached above, so _stage_inputs' with_bucket is a no-op rebuild)
    staged = _stage_inputs(
        inputs.drop("bucket"), n_buckets, n_partitions, n_salts, prepartition
    )
    # ONE materialization of the extraction output: the all-status
    # ranked rows go straight to the staging write (no persist — at
    # 100 TB a MEMORY_AND_DISK persist of the full post-extraction
    # corpus is a second full-corpus copy on executor disks). Lineage
    # and stats are then derived from a partition-pruned (run_id=...),
    # column-pruned read-back of exactly the files just written.
    # Failure rows are written too (rank over ALL turns keeps a turn's
    # rank stable regardless of neighboring failures — matching
    # extract_df and the golden generator); read_output filters them,
    # preserving the reference's failed-docs-have-no-output-row
    # semantics (README.md:115-116) while lineage still counts them.
    all_ranked = with_turn_rank(extract_turns(staged)).withColumn(
        "run_id", F.lit(run_id)
    )
    if markdown_compat:
        from pdfwf_spark.operators.functions import markdown_compatible_col

        all_ranked = all_ranked.withColumn(
            "clean_text", markdown_compatible_col(F.col("clean_text"))
        )
    t_write = time.monotonic()
    append_data(all_ranked, data_path)
    write_s = time.monotonic() - t_write

    t_lineage = time.monotonic()
    lin_rows = lineage_from_written(spark, data_path, run_id).collect()
    # <= n_buckets rows land on the driver; re-wrapping them keeps the
    # lineage append from re-scanning the read-back a second time
    append_lineage(
        spark.createDataFrame(lin_rows, LINEAGE_SCHEMA), lineage_path
    )
    lineage_s = time.monotonic() - t_lineage

    n = sum(r["input_count"] for r in lin_rows)
    ok = sum(r["ok_count"] for r in lin_rows)
    return RunResult(
        run_id=run_id,
        input_rows=n,
        ok_rows=ok,
        failed_rows=n - ok,
        buckets_processed=len({r["bucket"] for r in lin_rows}),
        elapsed_s=time.monotonic() - t0,
        write_s=write_s,
        lineage_s=lineage_s,
    )


# the only columns the commit path reads back after the staging write —
# the lineage aggregate's narrow inputs plus the bucket partition column
_READBACK_SCHEMA = T.StructType(
    [
        T.StructField("parse_status", T.StringType(), True),
        T.StructField("bytes_in", T.LongType(), True),
        T.StructField("bytes_out", T.LongType(), True),
        T.StructField("extract_us", T.LongType(), True),
        T.StructField("init_us", T.LongType(), True),
        T.StructField("bucket", T.IntegerType(), True),
    ]
)


def lineage_from_written(spark: SparkSession, data_path: str, run_id: str) -> DataFrame:
    """Per-bucket lineage for one run, derived from the files the run
    just wrote: a partition-pruned (run_id=...) scan reading only the
    narrow lineage-input columns — never a cached copy of the corpus."""
    from pdfwf_spark.operators.lineage import read_or_empty

    written = read_or_empty(
        spark, f"{data_path}/run_id={run_id}", _READBACK_SCHEMA
    )
    return lineage_rows(written, run_id)


def read_output(spark: SparkSession, out_dir: str) -> DataFrame:
    """Committed success rows: data filtered to run_ids present in
    lineage (orphans from partially-failed runs are invisible) and to
    parse_status='ok' (failed turns are lineage-counted, never rows —
    reference README.md:115-116)."""
    data = spark.read.parquet(f"{out_dir}/turns")
    lineage = read_lineage(spark, f"{out_dir}/lineage")
    committed = lineage.select("run_id", "bucket").distinct()
    return data.filter(F.col("parse_status") == "ok").join(
        F.broadcast(committed), ["run_id", "bucket"], "left_semi"
    )
