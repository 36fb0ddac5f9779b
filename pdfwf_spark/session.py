"""SparkSession factory with the engine's tuned defaults.

Local-mode testing (local[N]) with settings that translate directly to
a multi-executor cluster: AQE on (runtime coalesce + skew split),
shuffle partitions sized to cores (not the 200 default), Arrow
enabled with a bounded batch size (the analog of the reference's task
chunk_size, convert.py:273-275), UTC session timezone (oracle
comparison), and generous max-fields truncation off the hot path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "pdfwf_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch_rows: int = 8192,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or "local[{}]".format(
        os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    n_cores = 32
    if master.startswith("local["):
        inner = master[len("local["):-1]
        n_cores = os.cpu_count() if inner == "*" else int(inner)
    shuffle_partitions = shuffle_partitions or max(2 * n_cores, 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "20g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # r6: long multi-query sessions accumulate localCheckpoint /
        # shuffle blocks whose cleanup waits on a driver JVM GC; the
        # periodic ContextCleaner GC (default 30min) frees them on a
        # cadence that matches a query-suite run instead. Env override
        # for deployments with different session lifetimes.
        .config(
            "spark.cleaner.periodicGC.interval",
            os.environ.get("SPARK_GRAFT_PERIODIC_GC", "2min"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
