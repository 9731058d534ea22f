"""Kafka-shaped ingestion: record-schema contract, env-gated connector
probe, and the file-backed stand-in driving the Debezium parse + DLQ
topology end-to-end through the streaming engine."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from changedatacapture_reporting_spark.sources.kafka import (
    KAFKA_RECORD_SCHEMA,
    KafkaConnectorUnavailable,
    file_kafka_stream,
    kafka_available,
    kafka_debezium_events,
    kafka_stream,
    make_kafka_records,
)

SRC = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("v", T.StringType()),
    ]
)


def test_kafka_connector_gate(spark):
    """Without spark-sql-kafka on the classpath the probe is False and
    kafka_stream fails with actionable instructions (never Spark's
    opaque provider error); with it, this test would exercise the real
    source instead."""
    if kafka_available(spark):
        q = kafka_stream(spark, "localhost:9092", "t")
        assert q.isStreaming
        return
    with pytest.raises(KafkaConnectorUnavailable, match="--packages"):
        kafka_stream(spark, "localhost:9092", "t")


def _envelope(lsn, op, before, after, table="t"):
    import json

    def img(x):
        return None if x is None else {"id": x[0], "v": x[1]}

    return json.dumps(
        {
            "before": img(before),
            "after": img(after),
            "source": {
                "lsn": lsn,
                "sequence": 0,
                "ts_ms": 1706745600000,
                "table": table,
            },
            "op": op,
            "ts_ms": 1706745600000,
        }
    )


def test_kafka_records_shape_and_routing(spark, tmp_path):
    """make_kafka_records emits exactly the connector's record schema;
    the file stand-in streams it; kafka_debezium_events parses + routes
    with the (topic, partition, offset) replay address on every row."""
    docs = [
        _envelope(1, "c", None, (1, "a")),
        _envelope(2, "u", (1, "a"), (1, "b")),
        _envelope(3, "d", (1, "b"), None),
        "garbage{",  # unparseable → DLQ
        _envelope(None, "c", None, (9, "z")),  # missing-lsn → DLQ
    ]
    df = spark.createDataFrame([(d,) for d in docs], "doc string")
    records = make_kafka_records(df, "doc", topic="cdc.orders", key_col="doc")
    assert [(f.name, f.dataType) for f in records.schema.fields] == [
        (f.name, f.dataType) for f in KAFKA_RECORD_SCHEMA.fields
    ]

    rec_path = f"{tmp_path}/records"
    records.write.parquet(rec_path)

    out_path = f"{tmp_path}/events"
    dlq_path = f"{tmp_path}/dlq"

    def route(batch_df, _epoch):
        batch_df.persist()
        batch_df.filter(F.col("reject_reason").isNull()).drop(
            "raw_value", "reject_reason"
        ).write.mode("append").parquet(out_path)
        batch_df.filter(F.col("reject_reason").isNotNull()).select(
            "topic", "partition", "offset", "raw_value", "reject_reason"
        ).write.mode("append").parquet(dlq_path)
        batch_df.unpersist()

    q = (
        kafka_debezium_events(file_kafka_stream(spark, rec_path), SRC)
        .writeStream.foreachBatch(route)
        .option("checkpointLocation", f"{tmp_path}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)

    events = spark.read.parquet(out_path)
    got = {r.lsn: (r.op, r.before, r.after) for r in events.collect()}
    assert got[1] == ("insert", None, (1, "a"))
    assert got[2] == ("update", (1, "a"), (1, "b"))
    assert got[3] == ("delete", (1, "b"), None)
    assert len(got) == 3
    assert events.select("commit_time" if "commit_time" in events.columns
                         else "commit_ts").head()[0] == dt.datetime(
        2024, 2, 1, 0, 0, 0
    )

    dlq = spark.read.parquet(dlq_path)
    reasons = {r.raw_value: r.reject_reason for r in dlq.collect()}
    assert reasons["garbage{"] == "unparseable"
    assert "missing-lsn" in reasons.values() and len(reasons) == 2
    # replay address present and real: each reject's offset resolves back
    # to the same value in the record fixture
    rec = spark.read.parquet(rec_path).select(
        "topic", "partition", "offset",
        F.col("value").cast("string").alias("raw"),
    )
    back = {
        (r.topic, r.partition, r.offset): r.raw for r in rec.collect()
    }
    for r in dlq.collect():
        assert back[(r.topic, r.partition, r.offset)] == r.raw_value
