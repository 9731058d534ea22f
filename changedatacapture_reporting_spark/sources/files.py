"""File-format readers for CDC event streams: CSV and JSON-lines.

The reference only ever reads SQL Server's CDC function; a Spark-native
engine should ingest the same event model from whatever lands in the lake.
Schemas are always EXPLICIT (inference is a full extra pass at 100 TB and
non-deterministic under schema drift); both readers work identically under
``spark.read`` and ``spark.readStream``.

CSV carries before/after images as JSON strings inside the columns (CSV
has no nested types); JSON-lines carries them natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from changedatacapture_reporting_spark.schema import cdc_event_schema

CSV_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("commit_ts", T.TimestampType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("table_name", T.StringType(), False),
        T.StructField("before_json", T.StringType(), True),
        T.StructField("after_json", T.StringType(), True),
    ]
)


def read_cdc_json(
    spark: SparkSession,
    path: str,
    source_struct: T.StructType,
    streaming: bool = False,
) -> DataFrame:
    """JSON-lines event files → event DataFrame (explicit schema, no
    inference pass)."""
    schema = cdc_event_schema(source_struct)
    reader = spark.readStream if streaming else spark.read
    return reader.schema(schema).json(path)


def read_cdc_csv(
    spark: SparkSession,
    path: str,
    source_struct: T.StructType,
    streaming: bool = False,
    header: bool = True,
) -> DataFrame:
    """CSV event files (images as embedded JSON columns) → event DataFrame."""
    reader = spark.readStream if streaming else spark.read
    raw = reader.schema(CSV_WIRE_SCHEMA).option("header", header).csv(path)
    return raw.select(
        "lsn",
        "seq",
        "commit_ts",
        "op",
        "table_name",
        F.from_json("before_json", source_struct).alias("before"),
        F.from_json("after_json", source_struct).alias("after"),
    )


def read_cdc_orc(
    spark: SparkSession,
    path: str,
    source_struct: T.StructType,
    streaming: bool = False,
) -> DataFrame:
    """ORC event files → event DataFrame. ORC carries the before/after
    structs natively (columnar, predicate-pushdown-capable like parquet —
    the other first-class lake format Spark ships built-in), so no JSON
    embedding is needed."""
    schema = cdc_event_schema(source_struct)
    reader = spark.readStream if streaming else spark.read
    return reader.schema(schema).orc(path)


def write_cdc_orc(events: DataFrame, path: str) -> None:
    """Inverse of :func:`read_cdc_orc` (round-trip tested)."""
    events.write.mode("overwrite").orc(path)


def write_cdc_csv(events: DataFrame, path: str) -> None:
    """Inverse of :func:`read_cdc_csv` (round-trip tested)."""
    events.select(
        "lsn",
        "seq",
        "commit_ts",
        "op",
        "table_name",
        F.to_json("before").alias("before_json"),
        F.to_json("after").alias("after_json"),
    ).write.option("header", True).mode("overwrite").csv(path)
