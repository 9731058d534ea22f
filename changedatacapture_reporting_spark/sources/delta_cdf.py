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

A single commit may legally touch one key with BOTH a delete and an
insert (e.g. a Delta MERGE that deletes a row and re-inserts it): that
group re-emits TWO events, delete (seq 0) then insert (seq 1), so
downstream epoch semantics (operators/reconstruct.py delete→re-insert
reset) observe the delete marker. Any other multi-row group shape —
duplicate inserts, an unpaired preimage, update mixed with insert/delete
— is not a shape Delta CDF produces for one commit, and rather than
guess, the builder raises at execution time (F.raise_error) naming the
offending commit version.
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

    One groupBy on (_commit_version, pk): each group holds one insert
    row, one delete row, an update_preimage/update_postimage pair, or a
    delete+insert pair (same-commit re-insert, e.g. from MERGE).
    Conditional MAXes pick the images without a self-join — shuffle
    volume is one row per logical change, and at 100 TB the aggregation
    is partial map-side first. A delete+insert group fans back out to two
    ordered events via posexplode (seq = position: delete 0, insert 1);
    malformed groups raise at execution rather than silently collapsing.
    """
    if value_cols is None:
        value_cols = [c for c in df.columns if c not in CDF_META_COLS]
    ct = F.col("_change_type")
    img = F.struct(*[F.col(c).alias(c) for c in value_cols])

    grouped = df.groupBy(
        F.col("_commit_version"), *[F.col(c) for c in pk_cols]
    ).agg(
        F.max(F.when(ct == "insert", img)).alias("ins_img"),
        F.max(F.when(ct == "delete", img)).alias("del_img"),
        F.max(F.when(ct == "update_preimage", img)).alias("pre_img"),
        F.max(F.when(ct == "update_postimage", img)).alias("post_img"),
        F.count(F.when(ct == "insert", F.lit(1))).alias("n_ins"),
        F.count(F.when(ct == "delete", F.lit(1))).alias("n_del"),
        F.count(F.when(ct == "update_preimage", F.lit(1))).alias("n_pre"),
        F.count(F.when(ct == "update_postimage", F.lit(1))).alias("n_post"),
        F.count(F.lit(1)).alias("n_rows"),
        F.max("_commit_timestamp").alias("commit_ts"),
    )

    n_ins, n_del = F.col("n_ins"), F.col("n_del")
    n_pre, n_post = F.col("n_pre"), F.col("n_post")
    has_update = (n_pre > 0) | (n_post > 0)
    # typed NULL image (same struct type as the aggregated images)
    null_img = F.when(F.lit(False), F.col("ins_img"))

    ev_update = F.struct(
        F.lit("update").alias("op"),
        F.col("pre_img").alias("before"),
        F.col("post_img").alias("after"),
    )
    ev_delete = F.struct(
        F.lit("delete").alias("op"),
        F.col("del_img").alias("before"),
        null_img.alias("after"),
    )
    ev_insert = F.struct(
        F.lit("insert").alias("op"),
        null_img.alias("before"),
        F.col("ins_img").alias("after"),
    )
    # delete sorts before insert so posexplode's position IS the seq —
    # the delete marker precedes the re-insert within the commit.
    candidates = F.array(
        F.when(has_update, ev_update),
        F.when(n_del > 0, ev_delete),
        F.when(n_ins > 0, ev_insert),
    )
    events_arr = F.filter(candidates, lambda e: e.isNotNull())

    # One change per row per commit, except the delete+insert pair.
    # Anything else (dup inserts, unpaired pre/post image, update mixed
    # with insert/delete) is not a CDF shape for a single commit.
    valid = (
        (n_pre == n_post)
        & (n_pre <= 1)
        & (n_ins <= 1)
        & (n_del <= 1)
        & ~(has_update & ((n_ins > 0) | (n_del > 0)))
        # unknown _change_type values must not vanish silently
        & (F.col("n_rows") == n_ins + n_del + n_pre + n_post)
    )
    checked_arr = F.when(valid, events_arr).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "cdf_rows_to_events: unexpected change-row shape for"
                    " one (commit, pk) group at _commit_version="
                ),
                F.col("_commit_version").cast("string"),
                F.lit(" (counts ins/del/pre/post="),
                n_ins.cast("string"), F.lit("/"),
                n_del.cast("string"), F.lit("/"),
                n_pre.cast("string"), F.lit("/"),
                n_post.cast("string"), F.lit(")"),
            )
        )
    )

    return grouped.select(
        F.col("_commit_version"),
        F.col("commit_ts"),
        F.posexplode(checked_arr).alias("seq", "ev"),
    ).select(
        F.col("_commit_version").alias("lsn"),
        F.col("seq").cast("long").alias("seq"),
        F.col("commit_ts"),
        F.col("ev.op").alias("op"),
        F.lit(table_name).alias("table_name"),
        F.col("ev.before").alias("before"),
        F.col("ev.after").alias("after"),
    )


def events_to_cdf_rows(events: DataFrame) -> DataFrame:
    """Engine events → CDF-convention rows (the inverse, used by the
    roundtrip contract and by sinks that publish a change feed).

    insert → one postimage row; delete → one preimage row; update → a
    preimage + postimage pair. Single scan: the 1-or-2 output rows come
    from one array + explode, not a union of filtered scans.

    Representability: the CDF convention carries no ``seq`` or
    ``table_name`` column — it is a per-table feed whose within-commit
    order is implied by the change types. That makes the round trip
    through ``cdf_rows_to_events`` lossless exactly for the event shapes
    CDF itself can express: at most one insert, one delete, and one
    update per (lsn, pk), with a same-commit delete+insert pair
    reconstructed in order (delete seq 0, insert seq 1). Event streams
    with several updates of one key inside one lsn are NOT representable;
    serialize each micro-change as its own lsn (as the simulator does)
    before publishing a change feed.
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
