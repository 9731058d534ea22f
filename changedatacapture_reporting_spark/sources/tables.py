"""Parquet table sources for the fixture star schema (TESTDATA.md).

The reference discovers source schemas from ``sys.columns`` at runtime
(usp_cdc_populate_changelog.sql:295); Spark's parquet footer read is the
exact analog — ``spark.read.parquet(path).schema`` — no cursor needed
(SURVEY.md §2.1 S2/S3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to session-zone TIMESTAMP regardless of how
    the fixture parquet encoded it.

    Fixtures have shipped with two encodings:
      * TIMESTAMP(NANOS), surfaced as BIGINT nanoseconds when
        ``spark.sql.legacy.parquet.nanosAsLong`` is on — truncate ns→µs
        exactly as DuckDB's ``CAST(ts AS TIMESTAMP)`` does;
      * native TIMESTAMP(MICROS) (TimestampType or TimestampNTZType) —
        just cast, no arithmetic.
    Branching on the actual dtype keeps every events consumer working
    across fixture regenerations.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    if isinstance(df.schema["ts"].dataType, LongType):
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_events_ts(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL API."""
    for n, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(n)
