"""SparkSession builder with the engine's standard configuration.

Scale notes (100 TB / 1000-executor design intent):
- AQE on: runtime skew-join splitting + partition coalescing backstop the
  explicit skew handling in :mod:`linkgraph.tables` / :mod:`linkgraph.algs`.
- Arrow on: every Python-side transform is a vectorized pandas UDF
  (BASELINE.json:15 bans per-row Python).
- shuffle.partitions is sized to cores locally; on a real cluster set it
  ~2-3x total executor cores (or rely on AQE coalescing from a high value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    app_name: str = "linkgraph",
    checkpoint_dir: str | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for the engine.

    ``cores=None`` uses ``$SPARK_GRAFT_CPUS`` (default 32) — the sandbox
    stand-in for a multi-executor cluster; partition-parallelism, not
    threads, is the unit of scale so the same code runs unchanged under
    ``spark-submit --py-files`` on a real cluster.
    """
    cores = cores or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cores
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    if checkpoint_dir:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)
    return spark
