"""SparkSession factory.

The reference used the global ``pyspark.shell`` session implicitly
(e.g. /root/reference/spark_loaders.py imports `spark` from the driver
script); the engine instead builds a deterministic, explicitly
configured session:

- UTC session timezone (oracle comparison against DuckDB's UTC-naive
  timestamps is otherwise wrong).
- AQE on: runtime shuffle-partition coalescing + skew-join splitting —
  the knobs that keep one static `spark.sql.shuffle.partitions` setting
  valid from sf0.001 local runs up to multi-TB cluster runs.
- Arrow on: every Pandas-UDF operator ships columns as Arrow batches.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_master() -> str:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    return f"local[{cpus}]"


def build_session(
    app_name: str = "hive_exporter_spark",
    master: str | None = None,
    shuffle_partitions: int = 32,
    enable_hive: bool = False,
    extra_conf: dict[str, str] | None = None,
    log_level: str | None = "WARN",
) -> SparkSession:
    """Build (or get) the engine's SparkSession.

    ``shuffle_partitions`` is a *starting point*: with AQE enabled Spark
    coalesces post-shuffle partitions to `advisoryPartitionSizeInBytes`,
    so the same code holds at 1000× the data — on a real cluster this
    should be set to ~2-3× total executor cores and AQE does the rest.
    """
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or _default_master())
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.crossJoin.enabled", "true")
        # The fixtures' events.parquet stores TIMESTAMP(NANOS), which the
        # Spark parquet reader rejects; read as long and convert (files.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if enable_hive:
        builder = builder.enableHiveSupport()
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    if log_level:
        # O6: log-level management (reference spark_loaders.py:75-78)
        spark.sparkContext.setLogLevel(log_level)
    return spark
