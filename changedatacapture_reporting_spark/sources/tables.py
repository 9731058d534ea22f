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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # ts is parquet TIMESTAMP(NANOS) (read as long via
        # spark.sql.legacy.parquet.nanosAsLong) — truncate ns→µs exactly as
        # DuckDB's CAST(ts AS TIMESTAMP) does, so oracles agree
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL API."""
    for n, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(n)
