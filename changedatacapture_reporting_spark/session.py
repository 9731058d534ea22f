"""SparkSession factory tuned for this engine.

Local test mode runs ``local[N]``; the configs below are chosen so the same
logical plans scale to a real multi-executor cluster (AQE on, skew-join on,
shuffle partitions sized explicitly instead of the 200 default).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "changedatacapture_reporting_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the SparkSession.

    Session timezone is pinned to UTC so timestamp semantics match the
    DuckDB oracle and are cluster-location-independent.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # columnar parquet scans honour these at 100 TB: bigger splits, pruning
        .config("spark.sql.files.maxPartitionBytes", "268435456")
        .config("spark.sql.parquet.filterPushdown", "true")
        # fixture `events.ts` is parquet TIMESTAMP(NANOS), which Spark
        # rejects by default; read as long, converted in sources.tables
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # INT96 (Spark's legacy default) is deprecated AND carries no
        # parquet column statistics — timestamp columns written as
        # INT96 can never be footer-stat'd or row-group pruned by
        # other engines. TIMESTAMP_MICROS is the modern interop form
        # and what makes the delta writer's footer-stats fast path
        # (sources.delta_table._file_stats) apply to timestamp columns
        .config(
            "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
