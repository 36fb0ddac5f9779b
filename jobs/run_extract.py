#!/usr/bin/env python
"""spark-submit entrypoint for the extraction job.

Cluster usage (the north-rule deployment shape):

    python -m zipfile -c /tmp/pdfwf_spark.zip pdfwf_spark
    spark-submit --py-files /tmp/pdfwf_spark.zip \
        jobs/run_extract.py \
        --input  <iceberg table or parquet path of transcripts> \
        --output <warehouse path>  \
        --buckets 4096 --salts 64 [--no-resume] [--run-id RID]

Local smoke:

    spark-submit --master 'local[8]' --py-files /tmp/pdfwf_spark.zip \
        jobs/run_extract.py --input /tmp/t.parquet --output /tmp/out

The config surface mirrors the reference's WorkflowConfig
(reference pdfwf/convert.py:185-210: pdf_dir/out_dir/num_conversions/
chunk_size) re-expressed for a table pipeline: input table, output
path, bucket/salt counts (the chunk-size analog), resume toggle.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="transcripts table/path")
    ap.add_argument("--output", required=True, help="output warehouse dir")
    ap.add_argument("--buckets", type=int, default=4096,
                    help="commit/resume buckets (conv-hash)")
    ap.add_argument("--salts", type=int, default=64,
                    help="per-turn salt fan-out inside a bucket")
    ap.add_argument("--partitions", type=int, default=None,
                    help="shuffle partitions for the extract stage")
    ap.add_argument("--limit", type=int, default=None,
                    help="input limit (reference num_conversions analog)")
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--markdown-compat", action="store_true",
                    help="F7 markdown repair pass on clean_text "
                         "(reference nougat --markdown flag analog)")
    ap.add_argument("--rebalance-rows", type=int, default=None,
                    help="post-run S9 rebalance: re-shard {output}/turns "
                         "to exactly N rows per file (balance.py analog)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from pdfwf_spark.pipeline import run_extraction

    spark = SparkSession.builder.appName("pdfwf_spark_extract").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.input.endswith((".parquet", "/")) or "/" in args.input:
        transcripts = spark.read.parquet(args.input)
    else:
        transcripts = spark.read.table(args.input)
    if args.limit:
        transcripts = transcripts.limit(args.limit)

    result = run_extraction(
        spark,
        transcripts,
        args.output,
        run_id=args.run_id,
        n_buckets=args.buckets,
        n_partitions=args.partitions,
        n_salts=args.salts,
        resume=not args.no_resume,
        markdown_compat=args.markdown_compat,
    )
    if args.rebalance_rows:
        # rebalance the COMMITTED view (read_output hides orphan rows
        # from attempts that crashed between data and lineage appends)
        from pdfwf_spark.operators.rebalance import rebalance
        from pdfwf_spark.pipeline import read_output

        n_files = rebalance(
            read_output(spark, args.output),
            f"{args.output}/turns_balanced",
            args.rebalance_rows,
            order_by=["conv_id", "turn_rank"],
        )
        result.__dict__["balanced_file_groups"] = n_files
    json.dump(result.__dict__, sys.stdout)
    print()
    spark.stop()


if __name__ == "__main__":
    main()
