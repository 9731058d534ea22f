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


def events_to_debezium(events: DataFrame) -> DataFrame:
    """Engine event model → Debezium JSON envelopes (one ``value`` string
    column) — the outbound half of the adapter, for publishing a
    changelog to Debezium-speaking consumers (Kafka sinks, other CDC
    pipelines). ``parse_debezium(events_to_debezium(ev))`` is lossless
    for the event model (the roundtrip contract proves it), with the one
    wire-format caveat that ts_ms truncates commit_ts to milliseconds.
    """
    dbz_op = (
        F.when(F.col("op") == "insert", F.lit("c"))
        .when(F.col("op") == "update", F.lit("u"))
        .otherwise(F.lit("d"))
    )
    envelope = F.to_json(
        F.struct(
            F.col("before"),
            F.col("after"),
            F.struct(
                F.col("lsn"),
                F.col("seq").alias("sequence"),
                (F.unix_micros(F.col("commit_ts").cast("timestamp")) / 1000)
                .cast("long")
                .alias("ts_ms"),
                F.col("table_name").alias("table"),
            ).alias("source"),
            dbz_op.alias("op"),
        )
    )
    return events.select(envelope.alias("value"))


def parse_debezium_tagged(
    df: DataFrame, json_col: str, source_struct: T.StructType
) -> DataFrame:
    """One-pass parse + validation: event columns plus ``raw_value`` (the
    original document) and ``reject_reason`` (NULL = well-formed) — the
    dead-letter-queue form of :func:`parse_debezium` for production
    ingestion, where a poison document must be ROUTED, not dropped.

    Reasons, checked in order:

    - ``unparseable``  — the JSON does not parse (or the input is NULL);
    - ``unknown-op``   — op missing or outside c/r/u/d;
    - ``missing-lsn``  — no log position (events would be unorderable);
    - ``missing-image`` — the op's REQUIRED image is absent: insert
      without ``after``, delete without ``before``, update without
      ``after``. (An update without ``before`` is accepted — Debezium
      emits exactly that under partial REPLICA IDENTITY.)

    At scale route both sides of the split in ONE write pass (foreachBatch
    over this frame, or persist it before filtering) — filtering twice
    from the raw source would parse every document twice.

    The envelope is materialized through ``inline`` (a generator) rather
    than plain projections: Catalyst's CollapseProject would otherwise
    inline the ``from_json`` into every output column and parse each
    document several times — a 3× slowdown measured at sf0.1.
    """
    # a corrupt-record column distinguishes invalid JSON from a VALID
    # document that simply lacks fields ('{}' must classify unknown-op,
    # not unparseable)
    schema = debezium_envelope_schema(source_struct).add(
        "_corrupt", T.StringType()
    )
    env = F.from_json(
        F.col(json_col),
        schema,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
    )
    exploded = df.select(
        F.col(json_col).alias("raw_value"), F.inline(F.array(env))
    )
    op = op_to_engine(F.col("op"))
    reason = (
        F.when(
            F.col("_corrupt").isNotNull() | F.col("raw_value").isNull(),
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
        F.col("raw_value"),
        reason.alias("reject_reason"),
    )


def debezium_events(tagged: DataFrame) -> DataFrame:
    """Well-formed side of :func:`parse_debezium_tagged` (event model)."""
    return tagged.filter(F.col("reject_reason").isNull()).drop(
        "raw_value", "reject_reason"
    )


def debezium_rejects(tagged: DataFrame) -> DataFrame:
    """Dead-letter side: (raw_value, reject_reason) for quarantine sinks."""
    return tagged.filter(F.col("reject_reason").isNotNull()).select(
        "raw_value", "reject_reason"
    )


def parse_debezium(
    df: DataFrame, json_col: str, source_struct: T.StructType
) -> DataFrame:
    """JSON envelope column → event DataFrame (schema.cdc_event_schema).

    Documents without a parseable envelope, a known op, or a log position
    are dropped (historic behavior; rows flagged only ``missing-image``
    pass through — callers needing strict image validation or a
    dead-letter queue use :func:`parse_debezium_tagged`).
    """
    tagged = parse_debezium_tagged(df, json_col, source_struct)
    keep = F.col("reject_reason").isNull() | (
        F.col("reject_reason") == "missing-image"
    )
    return tagged.filter(keep).drop("raw_value", "reject_reason")
