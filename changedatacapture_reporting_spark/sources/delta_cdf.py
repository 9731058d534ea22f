"""Delta-Lake Change-Data-Feed-shaped input → the engine's event model.

SURVEY.md §1.3 names three CDC input forms for S1: SQL-Server
``fn_cdc_get_all_changes`` rows (sources/mssql_cdc.py), Debezium JSON
envelopes (sources/debezium.py), and Delta CDF ``table_changes()`` output.
This module completes the third. Delta's public CDF column convention
(documented in the open-source delta-lake protocol) is: the row's own
columns plus

- ``_change_type``       ∈ {insert, delete, update_preimage, update_postimage}
- ``_commit_version``    long  — the table version of the commit
- ``_commit_timestamp``  timestamp

Updates arrive as TWO rows (preimage + postimage) sharing a commit version
and primary key. Re-pairing them is the same problem the reference solves
for op-3/op-4 rows with a ``__$seqval`` self-join
(usp_cdc_populate_changelog.sql:331); here it is one hash aggregation on
(_commit_version, pk) — single shuffle, map-side partials, no join, no
second scan. The delta-spark package is not in this sandbox, so the input
is any DataFrame in the CDF column convention (e.g. parquet exported from
``table_changes()``); with delta-spark installed the same function applies
unchanged to ``spark.read.format("delta").option("readChangeFeed", ...)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CDF_META_COLS = ["_change_type", "_commit_version", "_commit_timestamp"]


def cdf_rows_to_events(
    df: DataFrame,
    pk_cols: list[str],
    value_cols: list[str] | None = None,
    table_name: str = "table",
) -> DataFrame:
    """CDF-convention rows → engine events
    (lsn, seq, commit_ts, op, table_name, before, after).

    One groupBy on (_commit_version, pk): each group holds exactly one
    insert row, one delete row, or an update_preimage/update_postimage
    pair, so conditional MAXes pick the images without a self-join —
    shuffle volume is one row per logical change, and at 100 TB the
    aggregation is partial map-side first.
    """
    if value_cols is None:
        value_cols = [c for c in df.columns if c not in CDF_META_COLS]
    ct = F.col("_change_type")
    img = F.struct(*[F.col(c).alias(c) for c in value_cols])

    grouped = df.groupBy(
        F.col("_commit_version"), *[F.col(c) for c in pk_cols]
    ).agg(
        F.max(
            F.when(ct == "insert", F.lit("insert"))
            .when(ct == "delete", F.lit("delete"))
            .when(
                ct.isin("update_preimage", "update_postimage"),
                F.lit("update"),
            )
        ).alias("op"),
        F.max(F.when(ct.isin("delete", "update_preimage"), img)).alias(
            "before"
        ),
        F.max(F.when(ct.isin("insert", "update_postimage"), img)).alias(
            "after"
        ),
        F.max("_commit_timestamp").alias("commit_ts"),
    )
    return grouped.select(
        F.col("_commit_version").alias("lsn"),
        F.lit(0).cast("long").alias("seq"),
        F.col("commit_ts"),
        F.col("op"),
        F.lit(table_name).alias("table_name"),
        F.col("before"),
        F.col("after"),
    ).filter(F.col("op").isNotNull())


def events_to_cdf_rows(events: DataFrame) -> DataFrame:
    """Engine events → CDF-convention rows (the inverse, used by the
    roundtrip contract and by sinks that publish a change feed).

    insert → one postimage row; delete → one preimage row; update → a
    preimage + postimage pair. Single scan: the 1-or-2 output rows come
    from one array + explode, not a union of filtered scans.
    """
    op = F.col("op")
    pre = F.struct(
        F.col("before").alias("img"), F.lit("update_preimage").alias("ct")
    )
    post = F.struct(
        F.col("after").alias("img"), F.lit("update_postimage").alias("ct")
    )
    ins = F.struct(F.col("after").alias("img"), F.lit("insert").alias("ct"))
    dele = F.struct(F.col("before").alias("img"), F.lit("delete").alias("ct"))
    arr = (
        F.when(op == "insert", F.array(ins))
        .when(op == "delete", F.array(dele))
        .otherwise(F.array(pre, post))
    )
    return (
        events.select(
            F.col("lsn").alias("_commit_version"),
            F.col("commit_ts").cast("timestamp").alias("_commit_timestamp"),
            F.explode(arr).alias("r"),
        )
        .select(
            "r.img.*",
            F.col("r.ct").alias("_change_type"),
            "_commit_version",
            "_commit_timestamp",
        )
    )
