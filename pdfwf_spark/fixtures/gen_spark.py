"""Distributed transcripts generator (bench scale).

spark.range over conversation indices -> mapInPandas expands each conv
to its rows via the SAME pure generator (fixtures/gen.py), so a 10M-
turn bench table is produced in parallel on executors, deterministic
in (n_convs, seed), with no driver-side materialization. Shuffled
write order comes from repartitioning on a hash of the row key.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdfwf_spark.fixtures.gen import gen_conv_rows
from pdfwf_spark.schemas import TRANSCRIPT_SCHEMA


def spark_transcripts(
    spark: SparkSession,
    n_convs: int,
    seed: int = 42,
    mega_every: int = 200,
    mega_turns: int = 2000,
    n_partitions: int | None = None,
) -> DataFrame:
    n_partitions = n_partitions or spark.sparkContext.defaultParallelism

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for conv_idx in pdf["id"].tolist():
                rows = gen_conv_rows(int(conv_idx), seed, mega_every, mega_turns)
                out = pd.DataFrame(rows)
                yield out[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]

    base = spark.range(0, n_convs, 1, n_partitions)
    df = base.mapInPandas(expand, TRANSCRIPT_SCHEMA)
    # shuffled physical order (proves the ordering window is doing the
    # work, not incidental file order)
    return df.repartition(n_partitions, F.xxhash64("conv_id", "turn_idx", "role"))
