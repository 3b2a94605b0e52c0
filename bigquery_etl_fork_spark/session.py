"""SparkSession factory with the engine's default configuration.

Tuned for correctness-at-scale defaults: AQE on (runtime re-plan + skew join),
Arrow-vectorized Python interop, UTC session time zone. ``shuffle_partitions``
should match executor cores locally; at cluster scale the engine relies on AQE
coalescing so a large static number is safe.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "bigquery_etl_fork_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    master defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) when no
    cluster master is configured — on a real cluster, pass ``None`` and let
    spark-submit decide.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        if master.startswith("local-cluster["):
            # local-cluster[nWorkers,coresPerWorker,memMB] — multi-JVM
            # executors; total cores = workers × cores
            n_exec, cores = master[len("local-cluster[") : -1].split(",")[:2]
            shuffle_partitions = max(int(n_exec) * int(cores), 4)
        else:
            n = master.split("[")[-1].rstrip("]") if "[" in master else "32"
            shuffle_partitions = 32 if n == "*" else max(int(n), 4)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # off-heap execution memory keeps Tungsten buffers out of the GC'd
        # heap — measurably less allocation stall at high thread counts
        .config("spark.memory.offHeap.enabled", "true")
        .config("spark.memory.offHeap.size", os.environ.get("SPARK_GRAFT_OFFHEAP", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
