"""JSONL shard sink/source — the reference's literal output surface.

The reference appends one JSONL shard per parser-instance UUID
(pdfwf/convert.py:65-71) and re-shards them to exactly-N-lines files
offline (pdfwf/balance.py:30-114). Spark-natively both collapse into
one distributed write: `df.write.json` emits one shard per task, and
`spark.sql.files.maxRecordsPerFile` bounds lines per file at write
time — no offline rebalance pass. The Iceberg/parquet table sink
(sinks/table.py) remains the engine's primary contract; this module
exists so reference users keep their downstream JSONL consumers.

Also carries the Spark rendering of the reference's offline
converter `examples/convert_parquet_to_jsonl.py:33-99` (S3): a
driver-side pandas row loop there, one declarative re-write here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_jsonl(
    df: DataFrame, out_dir: str, lines_per_file: int | None = None
) -> None:
    """Write `df` as JSONL shards (one file per task; each row one
    JSON object). `lines_per_file` caps lines per shard via
    maxRecordsPerFile — the write-time twin of the reference's
    balance.py re-sharder, with no second pass over the data."""
    writer = df.write.mode("overwrite")
    if lines_per_file is not None:
        if lines_per_file <= 0:
            raise ValueError(f"lines_per_file must be positive, got {lines_per_file}")
        writer = writer.option("maxRecordsPerFile", lines_per_file)
    writer.json(out_dir)


def read_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Read JSONL shards. Pass an explicit schema in production —
    schema inference is a full extra pass over 100 TB."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def parquet_to_jsonl(
    spark: SparkSession,
    parquet_path: str,
    out_dir: str,
    lines_per_file: int = 1000,
    text_field: str | None = None,
) -> None:
    """Reference S3 utility (convert_parquet_to_jsonl.py:33-99)
    re-expressed: parquet in, line-bounded JSONL shards out, keeping
    only `text_field` (+ everything else when None) — fully
    distributed, no driver row loop."""
    df = spark.read.parquet(parquet_path)
    if text_field is not None:
        df = df.select(text_field)
    write_jsonl(df, out_dir, lines_per_file)
