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


# Offsets placing the extra event waves strictly after every base lsn
# (o_orderkey < 10^8 at any driver SF) while keeping lsn arithmetic
# integer-exact in both engines.
MULTI_OFF_UPDATE = 100_000_000
MULTI_OFF_DELETE = 200_000_000


def simulate_cdc_events_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-event-per-key stream (for windowed/net-changes semantics —
    the base simulator emits exactly one event per key, which makes a
    net-changes collapse the identity). Derived from the base stream with
    the same integer/string arithmetic so the DuckDB oracle replays it:

    - keys with ``k % 4 == 1`` get a SECOND update at
      ``lsn = k + MULTI_OFF_UPDATE``: before = the base event's after
      image, after = same image with status 'Y' and total + 7;
    - keys with ``k % 20 ∈ {5, 11}`` get a trailing DELETE at
      ``lsn = k + MULTI_OFF_DELETE`` whose before is the key's latest
      image. ``k % 20 == 5`` keys also carry the second update → their
      history is update → update → delete (net delete); ``k % 20 == 11``
      keys start with a base insert (k % 10 == 1) and carry no second
      update → insert → delete (net ZERO — the dropped-row case).
    """
    base = simulate_cdc_events(spark, sf_dir)
    k = F.coalesce(F.col("after.o_orderkey"), F.col("before.o_orderkey"))
    null_image = F.lit(None).cast(base.schema["after"].dataType)

    upd_after = (
        F.col("after")
        .withField("status", F.lit("Y"))
        .withField("total", F.col("after.total") + 7)
    )
    upd = base.filter(k % 4 == 1).select(
        (F.col("lsn") + MULTI_OFF_UPDATE).alias("lsn"),
        F.col("seq"),
        F.col("commit_ts"),
        F.lit("update").alias("op"),
        F.col("table_name"),
        F.col("after").alias("before"),
        upd_after.alias("after"),
    )

    latest = F.when(k % 4 == 1, upd_after).otherwise(F.col("after"))
    dele = base.filter((k % 20).isin(5, 11)).select(
        (F.col("lsn") + MULTI_OFF_DELETE).alias("lsn"),
        F.col("seq"),
        F.col("commit_ts"),
        F.lit("delete").alias("op"),
        F.col("table_name"),
        latest.alias("before"),
        null_image.alias("after"),
    )
    return base.unionByName(upd).unionByName(dele)


# The same derivation as DuckDB CTEs (flattened b_*/a_* convention like
# ORACLE_EVENTS_CTE; consumers apply op-aware NULLing). Base delete rows
# (k % 10 == 2) are even keys, so the extra waves (odd keys) never stack
# on a base delete.
ORACLE_EVENTS_MULTI_CTE = (
    ORACLE_EVENTS_CTE
    + """,
evm AS (
  SELECT lsn, commit_ts, op, o_orderkey,
         b_status, a_status, b_priority, a_priority,
         b_total, a_total, b_note, a_note
  FROM ev
  UNION ALL
  SELECT lsn + 100000000, commit_ts, 'update', o_orderkey,
         a_status, 'Y', a_priority, a_priority,
         a_total, a_total + 7, a_note, a_note
  FROM ev WHERE o_orderkey % 4 = 1
  UNION ALL
  SELECT lsn + 200000000, commit_ts, 'delete', o_orderkey,
         CASE WHEN o_orderkey % 4 = 1 THEN 'Y' ELSE a_status END, NULL,
         a_priority, NULL,
         a_total + CASE WHEN o_orderkey % 4 = 1 THEN 7 ELSE 0 END, NULL,
         a_note, NULL
  FROM ev WHERE o_orderkey % 20 IN (5, 11)
)
"""
)


def simulate_cdc_events_cross_table(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """TWO-table event stream sharing one LSN sequence — the shape a
    multi-table transaction produces in SQL Server CDC (one commit LSN,
    per-table capture rows distinguished by seqval). Each base 'orders'
    event (seq 0) is joined by an 'orders_tax' event at the SAME lsn
    (seq 1): op class mirrors the base derivation; images are integer
    arithmetic so the DuckDB oracle replays them:

        rate: k % 9  → k % 9 + 1 when k % 3 == 0
        fee:  k % 11 → k % 11 + 2 when k % 2 == 0

    A consistent snapshot AT lsn X must cut BOTH tables at the same
    boundary — the property cdc_multi_table_snapshot checks.
    """
    base = simulate_cdc_events(spark, sf_dir)
    k = F.coalesce(F.col("after.o_orderkey"), F.col("before.o_orderkey"))

    def tax_image(rate, fee):
        return F.struct(
            k.alias("o_orderkey"), rate.alias("rate"), fee.alias("fee")
        )

    b_img = tax_image((k % 9).cast("long"), (k % 11).cast("long"))
    a_img = tax_image(
        F.when(k % 3 == 0, (k % 9).cast("long") + 1).otherwise(
            (k % 9).cast("long")
        ),
        F.when(k % 2 == 0, (k % 11).cast("long") + 2).otherwise(
            (k % 11).cast("long")
        ),
    )
    null_img = F.lit(None).cast(
        "struct<o_orderkey:bigint,rate:bigint,fee:bigint>"
    )
    tax = base.select(
        F.col("lsn"),
        F.lit(1).cast("long").alias("seq"),
        F.col("commit_ts"),
        F.col("op"),
        F.lit("orders_tax").alias("table_name"),
        F.when(F.col("op") != "insert", b_img).otherwise(null_img).alias(
            "before"
        ),
        F.when(F.col("op") != "delete", a_img).otherwise(null_img).alias(
            "after"
        ),
    )
    return base, tax
