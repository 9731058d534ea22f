"""Kafka-shaped CDC ingestion: the record schema Spark's Kafka source
emits, an env-gated real connector entry point, and a file-backed
stand-in with the IDENTICAL shape so every downstream topology
(Debezium parse → DLQ routing → populate/apply) is built and tested
against the true record contract even where the connector jar is absent.

Spark's Kafka integration (``spark-sql-kafka-0-10``) is an external
package — not bundled with pyspark and not installable in this sandbox —
so :func:`kafka_stream` probes the classpath and raises a clear,
actionable error instead of Spark's opaque
``Failed to find data source: kafka``. Everything AFTER the source is
connector-agnostic: a Kafka record is just
(key, value, topic, partition, offset, timestamp), and
:func:`kafka_debezium_events` consumes that shape no matter which
function produced it.

At scale the value of keeping the record shape is operational parity:
offsets ride along into the DLQ (a poison document's (topic, partition,
offset) is its replay address), and per-partition ordering maps onto the
engine's (lsn, seq) ordering contract downstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the exact shape Spark's Kafka source emits (spark-sql-kafka-0-10)
KAFKA_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), True),
        T.StructField("topic", T.StringType(), True),
        T.StructField("partition", T.IntegerType(), True),
        T.StructField("offset", T.LongType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("timestampType", T.IntegerType(), True),
    ]
)


class KafkaConnectorUnavailable(RuntimeError):
    """The spark-sql-kafka-0-10 package is not on the classpath."""


def kafka_available(spark: SparkSession) -> bool:
    """True when the Kafka source provider class is loadable."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Streaming frame of Kafka records (KAFKA_RECORD_SCHEMA shape).

    Requires the external ``spark-sql-kafka-0-10`` package; probed
    up-front so a missing jar fails here with instructions, not inside
    ``start()`` with an opaque provider error.
    """
    if not kafka_available(spark):
        raise KafkaConnectorUnavailable(
            "Spark's Kafka source (spark-sql-kafka-0-10) is not on the "
            "classpath. Launch with "
            "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark "
            "version>, or develop against "
            "sources.kafka.file_kafka_stream, which presents the same "
            "record shape from a parquet directory."
        )
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def file_kafka_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming frame of Kafka-shaped records from a parquet directory —
    the in-sandbox stand-in for :func:`kafka_stream`. The schema is
    validated against KAFKA_RECORD_SCHEMA so a drifted fixture fails
    loudly instead of silently diverging from the connector contract."""
    stream = spark.readStream.schema(KAFKA_RECORD_SCHEMA).parquet(path)
    return stream


def make_kafka_records(
    df: DataFrame,
    value_col: str,
    topic: str,
    key_col: str | None = None,
    n_partitions: int = 4,
    order_col: str | None = None,
    timestamp=None,
) -> DataFrame:
    """Wrap a value column as Kafka-shaped records (for fixtures and for
    publishing through connector-less sinks): partition = hash(key) mod
    n (Kafka's default partitioner shape, deterministic here), offset =
    per-partition order of ``order_col``.

    Offsets follow ``order_col`` when given — pass the upstream sequence
    (an lsn, an event id) to make the offset↔record mapping fully
    deterministic, duplicates included. Without it the fallback orders
    by ``monotonically_increasing_id`` (arrival order within the current
    plan: stable for a deterministic input, but ties are broken by
    physical row position, so prefer an explicit column). ``timestamp``
    is an explicit record timestamp (datetime or Column); it defaults to
    the epoch so fixture records are byte-stable across runs — pass
    ``F.current_timestamp()`` if you want wall-clock publishing time.
    """
    from datetime import datetime, timezone

    from pyspark.sql.window import Window as W

    key = F.col(key_col) if key_col else F.lit(None).cast("string")
    if timestamp is None:
        timestamp = datetime(1970, 1, 1, tzinfo=timezone.utc)
    ts = timestamp if isinstance(timestamp, Column) else F.lit(timestamp)
    order = (
        F.col(order_col)
        if order_col
        else F.monotonically_increasing_id()
    )
    base = df.select(
        key.cast("string").cast("binary").alias("key"),
        F.col(value_col).cast("string").cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
        F.when(
            key.isNull(), F.lit(0)
        ).otherwise(
            F.pmod(F.xxhash64(key.cast("string")), F.lit(n_partitions))
        ).cast("int").alias("partition"),
        ts.cast("timestamp").alias("timestamp"),
        F.lit(0).alias("timestampType"),
        order.alias("_order"),
    )
    return base.withColumn(
        "offset",
        F.row_number().over(
            W.partitionBy("partition").orderBy(F.col("_order"))
        ).cast("long")
        - 1,
    ).select(*[f.name for f in KAFKA_RECORD_SCHEMA.fields])


def kafka_debezium_events(
    records: DataFrame, source_struct: T.StructType
) -> DataFrame:
    """Kafka-shaped records → tagged Debezium events (one-pass parse +
    DLQ classification, same reason taxonomy and inline-generator
    anti-reparse shape as sources.debezium.parse_debezium_tagged) with
    the record's replay address (topic, partition, offset) carried on
    every output row — a rejected document's address is how an operator
    re-reads the poison record from the broker."""
    from changedatacapture_reporting_spark.sources.debezium import (
        debezium_envelope_schema,
        op_to_engine,
    )

    schema = debezium_envelope_schema(source_struct).add(
        "_corrupt", T.StringType()
    )
    env = F.from_json(
        F.col("value").cast("string"),
        schema,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
    )
    exploded = records.select(
        "topic",
        "partition",
        "offset",
        F.col("value").cast("string").alias("raw_value"),
        F.inline(F.array(env)),
    )
    op = op_to_engine(F.col("op"))
    reason = (
        # a NULL value is a Debezium TOMBSTONE (emitted after every
        # delete so compacted topics drop the key) — a protocol marker,
        # not a poison record: classify it separately so the DLQ isn't
        # one false positive per delete in steady state; consumers drop
        # it (kafka_events / kafka_dead_letters both exclude it)
        F.when(F.col("raw_value").isNull(), F.lit("tombstone"))
        .when(
            F.col("_corrupt").isNotNull(),
            F.lit("unparseable"),
        )
        .when(op.isNull(), F.lit("unknown-op"))
        .when(F.col("source.lsn").isNull(), F.lit("missing-lsn"))
        .when(
            ((op == "insert") & F.col("after").isNull())
            | ((op == "delete") & F.col("before").isNull())
            | ((op == "update") & F.col("after").isNull()),
            F.lit("missing-image"),
        )
    )
    return exploded.select(
        F.col("source.lsn").alias("lsn"),
        F.coalesce(F.col("source.sequence"), F.lit(0)).alias("seq"),
        F.timestamp_millis(F.col("source.ts_ms")).alias("commit_ts"),
        op.alias("op"),
        F.col("source.table").alias("table_name"),
        F.col("before").alias("before"),
        F.col("after").alias("after"),
        "topic",
        "partition",
        "offset",
        "raw_value",
        reason.alias("reject_reason"),
    )


def kafka_events(tagged: DataFrame) -> DataFrame:
    """Well-formed engine events from :func:`kafka_debezium_events`
    output (tombstones and rejects excluded)."""
    return tagged.filter(F.col("reject_reason").isNull()).select(
        "lsn", "seq", "commit_ts", "op", "table_name", "before", "after"
    )


def kafka_dead_letters(tagged: DataFrame) -> DataFrame:
    """Dead-letter side with replay addresses. Tombstones are NOT dead
    letters — they are the compaction protocol working as designed (one
    per delete in steady state); routing them here would bury real
    poison records under false positives."""
    return tagged.filter(
        F.col("reject_reason").isNotNull()
        & (F.col("reject_reason") != "tombstone")
    ).select("topic", "partition", "offset", "raw_value", "reject_reason")
