"""Schemas: CDC event model and the changelog sink (SURVEY.md §1).

Event model (one row per change, Debezium-style — SURVEY.md §7 design
decision): ``struct<lsn, seq, commit_ts, op, table_name, before, after>``.
Updates carry both images in ONE row, so before/after pairing needs no
self-join (the reference joins two unpivoted streams on
(lsn, column_name, pk…), usp_cdc_populate_changelog.sql:340–364, and scans
the CDC function 4×; we scan once). ``seq`` mirrors ``__$seqval`` to order
multiple changes to one row within a transaction — a correctness gap in the
reference, which ignores it.

Changelog sink mirrors the reference DDL (usp_cdc_populate_changelog.sql:
138–177): one row per (transaction, row, changed column); insert/delete
marker rows use the literal strings at populate:371/383.
"""

from __future__ import annotations

from pyspark.sql import types as T

# __$operation mapping (usp_cdc_populate_changelog.sql:320,353,375,386):
# 1=delete, 2=insert, 3=update(before), 4=update(after). Our event model
# uses symbolic ops; updates hold both images.
OP_INSERT = "insert"
OP_UPDATE = "update"
OP_DELETE = "delete"

# Marker literals (populate:371 'DELETED RECORD', populate:383 'NEW RECORD')
DELETED_RECORD = "DELETED RECORD"
NEW_RECORD = "NEW RECORD"


def cdc_event_schema(source_struct: T.StructType) -> T.StructType:
    """CDC event schema for a given source-table row type."""
    return T.StructType(
        [
            T.StructField("lsn", T.LongType(), False),
            T.StructField("seq", T.LongType(), False),
            T.StructField("commit_ts", T.TimestampType(), False),
            T.StructField("op", T.StringType(), False),
            T.StructField("table_name", T.StringType(), False),
            T.StructField("before", source_struct, True),
            T.StructField("after", source_struct, True),
        ]
    )


def changelog_schema(pk_fields: list[T.StructField]) -> T.StructType:
    """Changelog sink schema (populate:138–177), with typed PK parts.

    The reference hard-codes PK columns as INT (populate:95–97) while
    converting their values through VARCHAR(128) (populate:104) — an internal
    inconsistency. We keep PKs in their native types plus a canonical
    ``pk_json`` string for composite-PK generality.
    """
    return T.StructType(
        [
            T.StructField("commit_time", T.TimestampType(), True),
            T.StructField("table_name", T.StringType(), True),
            *pk_fields,
            T.StructField("pk_json", T.StringType(), True),
            T.StructField("column_name", T.StringType(), True),
            T.StructField("old_value", T.StringType(), True),
            T.StructField("new_value", T.StringType(), True),
            T.StructField("created_dt", T.TimestampType(), True),
            T.StructField("created_by", T.StringType(), True),
        ]
    )


# Columns compared by tests/oracles (created_dt/created_by are wall-clock /
# environment defaults — populate:172–173 — and excluded from comparisons).
CHANGELOG_CORE_COLUMNS = [
    "commit_time",
    "table_name",
    "pk_json",
    "column_name",
    "old_value",
    "new_value",
]
