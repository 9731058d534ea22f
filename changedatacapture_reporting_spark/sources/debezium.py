"""Debezium-envelope CDC parsing → the engine's event model.

Debezium is the de-facto open wire format for CDC (the modern equivalent of
the reference's SQL-Server-proprietary change function): one JSON document
per change with ``before``/``after`` images, an ``op`` code
('c'reate / 'u'pdate / 'd'elete / 'r'ead-snapshot), and a ``source`` block
carrying the log position and commit timestamp. Parsing it is a single
``from_json`` projection — fully JVM-side, usable identically under
``spark.read`` and ``spark.readStream`` (e.g. over a Kafka value column).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# op code mapping: Debezium → engine (snapshot 'r' rows are inserts)
_OP_MAP = {"c": "insert", "r": "insert", "u": "update", "d": "delete"}


def debezium_envelope_schema(source_struct: T.StructType) -> T.StructType:
    """Envelope schema for a given source-row type (payload-level — callers
    with the schema-registry wrapper select ``payload`` first)."""
    return T.StructType(
        [
            T.StructField("before", source_struct, True),
            T.StructField("after", source_struct, True),
            T.StructField(
                "source",
                T.StructType(
                    [
                        T.StructField("lsn", T.LongType(), True),
                        T.StructField("sequence", T.LongType(), True),
                        T.StructField("ts_ms", T.LongType(), True),
                        T.StructField("table", T.StringType(), True),
                    ]
                ),
                True,
            ),
            T.StructField("op", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
        ]
    )


def op_to_engine(op: Column) -> Column:
    out = F.lit(None).cast("string")
    for dbz, ours in _OP_MAP.items():
        out = F.when(op == dbz, F.lit(ours)).otherwise(out)
    return out


def parse_debezium(
    df: DataFrame, json_col: str, source_struct: T.StructType
) -> DataFrame:
    """JSON envelope column → event DataFrame (schema.cdc_event_schema).

    Malformed documents parse to NULL envelopes and are dropped (count them
    upstream with ``F.col(json_col).isNotNull() & env.isNull()`` if a
    dead-letter queue is needed).

    The envelope is materialized through ``inline`` (a generator) rather
    than plain projections: Catalyst's CollapseProject would otherwise
    inline the ``from_json`` into every output column and parse each
    document several times — a 3× slowdown measured at sf0.1.
    """
    env = F.from_json(F.col(json_col), debezium_envelope_schema(source_struct))
    exploded = df.select(F.inline(F.array(env)))
    return exploded.select(
        F.col("source.lsn").alias("lsn"),
        F.coalesce(F.col("source.sequence"), F.lit(0)).alias("seq"),
        F.timestamp_millis(F.col("source.ts_ms")).alias("commit_ts"),
        op_to_engine(F.col("op")).alias("op"),
        F.col("source.table").alias("table_name"),
        F.col("before").alias("before"),
        F.col("after").alias("after"),
    ).filter(F.col("op").isNotNull() & F.col("lsn").isNotNull())
