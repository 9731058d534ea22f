"""Deterministic CDC event stream derived from the ``orders`` fixture.

The driver's test data has no CDC capture log (the reference reads SQL
Server's ``fn_cdc_get_all_changes_*`` TVF, usp_cdc_populate_changelog.sql:
319), so we derive one *deterministically* from ``orders`` — every op kind,
multi-column updates, and NULL↔value transitions — using only
integer/string arithmetic so the identical derivation is expressible in the
DuckDB oracle SQL (no float formatting, no hashing, no randomness).

Derivation (key = o_orderkey):
- op:      key % 10 ∈ {0,1} → insert; key % 10 = 2 → delete; else update
- lsn=key, seq=0, commit_ts=o_orderdate, table_name='orders'
- row image columns:
    o_orderkey  bigint  (PK; never changes)
    status      string  — changes when key % 3 = 0  (→ 'X')
    priority    string  — changes when key % 7 = 0  (→ priority || '!')
    total       bigint  — floor(o_totalprice); changes when key % 2 = 0 (+5)
    note        string  — NULL→value when key % 5 = 0, value→NULL when
                          key % 5 = 3 (exercises null-safe change detection,
                          the P2 edge the reference's bitmask handles via
                          fn_cdc_is_bit_set, populate:304–306)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SIM_PK = ["o_orderkey"]
SIM_VALUE_COLS = ["o_orderkey", "status", "priority", "total", "note"]


def simulate_cdc_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    k = F.col("o_orderkey")

    b_note = F.when(k % 5 == 0, F.lit(None).cast("string")).otherwise(
        F.concat(F.lit("n"), (k % 4).cast("string"))
    )
    a_note = F.when(k % 5 == 3, F.lit(None).cast("string")).otherwise(
        F.concat(F.lit("n"), (k % 4).cast("string"))
    )

    def image(status, priority, total, note):
        return F.struct(
            k.alias("o_orderkey"),
            status.alias("status"),
            priority.alias("priority"),
            total.alias("total"),
            note.alias("note"),
        )

    before = image(
        F.col("o_orderstatus"),
        F.col("o_orderpriority"),
        F.floor("o_totalprice").cast("long"),
        b_note,
    )
    after = image(
        F.when(k % 3 == 0, F.lit("X")).otherwise(F.col("o_orderstatus")),
        F.when(k % 7 == 0, F.concat(F.col("o_orderpriority"), F.lit("!"))).otherwise(
            F.col("o_orderpriority")
        ),
        F.when(k % 2 == 0, F.floor("o_totalprice").cast("long") + 5).otherwise(
            F.floor("o_totalprice").cast("long")
        ),
        a_note,
    )

    op = (
        F.when((k % 10).isin(0, 1), F.lit("insert"))
        .when(k % 10 == 2, F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    null_image = F.lit(None).cast(
        "struct<o_orderkey:bigint,status:string,priority:string,total:bigint,note:string>"
    )
    return orders.select(
        k.alias("lsn"),
        F.lit(0).cast("long").alias("seq"),
        F.col("o_orderdate").alias("commit_ts"),
        op.alias("op"),
        F.lit("orders").alias("table_name"),
        F.when(op != "insert", before).otherwise(null_image).alias("before"),
        F.when(op != "delete", after).otherwise(null_image).alias("after"),
    )


# The same derivation, as DuckDB CTEs — prefix for the oracle SQL of every
# cdc_* query in __spark_entry__ (column-for-column identical semantics).
ORACLE_EVENTS_CTE = """
ev AS (
  SELECT
    o_orderkey AS lsn,
    o_orderdate AS commit_ts,
    CASE WHEN o_orderkey % 10 IN (0, 1) THEN 'insert'
         WHEN o_orderkey % 10 = 2 THEN 'delete'
         ELSE 'update' END AS op,
    o_orderkey,
    o_orderstatus AS b_status,
    CASE WHEN o_orderkey % 3 = 0 THEN 'X' ELSE o_orderstatus END AS a_status,
    o_orderpriority AS b_priority,
    CASE WHEN o_orderkey % 7 = 0 THEN o_orderpriority || '!' ELSE o_orderpriority END AS a_priority,
    CAST(FLOOR(o_totalprice) AS BIGINT) AS b_total,
    CAST(FLOOR(o_totalprice) AS BIGINT)
      + CASE WHEN o_orderkey % 2 = 0 THEN 5 ELSE 0 END AS a_total,
    CASE WHEN o_orderkey % 5 = 0 THEN NULL
         ELSE 'n' || CAST(o_orderkey % 4 AS VARCHAR) END AS b_note,
    CASE WHEN o_orderkey % 5 = 3 THEN NULL
         ELSE 'n' || CAST(o_orderkey % 4 AS VARCHAR) END AS a_note
  FROM orders
)
"""
