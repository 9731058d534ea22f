"""Changelog compaction: fold everything at or before an LSN boundary
into per-row base images, keep the tail verbatim — the retention
operator that makes an append-forever changelog affordable at 100 TB.

A CDC changelog grows without bound; most consumers only ever replay it
forward from "recent". Compaction rewrites the prefix ``lsn <=
upto_lsn`` as if every surviving row had been freshly inserted at its
last pre-boundary transaction: one ``NEW RECORD`` marker (when the row's
liveness was established by a marker) plus one row per column touched in
the row's current epoch, carrying the folded value. Rows dead at the
boundary vanish entirely. The tail (``lsn > upto_lsn``) is untouched and
orders strictly after every synthetic row, so every forward consumer —
:func:`..reconstruct.reconstruct_state` (at any ``as_of_lsn >=
upto_lsn``), :func:`..net_changes.net_changes` windows past the
boundary, :func:`..scd.scd2_merge` batches, serving refreshes — sees
identical results on the compacted log (the contract + pytest prove the
reconstruction identity; what is given up is only time travel INTO the
compacted range, which is the point of retention).

Scale shape: the fold is the reconstruct_state dataflow — two hash
aggregations over the prefix, ZERO joins, then a union with the tail
scan. Output size ∝ live rows × touched columns + tail, independent of
how many times each row was updated before the boundary; run it
periodically and the changelog's steady-state size becomes
O(state) + O(retention window) instead of O(history).

Reference anchor: the reference never compacts (its changelog tables
grow forever — usp_cdc_populate_changelog.sql keeps appending); this is
the §2.12-style supplied absence that makes the pattern operable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from changedatacapture_reporting_spark.schema import DELETED_RECORD, NEW_RECORD


def compact_changelog(
    changelog: DataFrame,
    pk_cols: list[str],
    upto_lsn: int | None = None,
    upto_time=None,
    order_cols: tuple[str, ...] = ("commit_time", "lsn", "seq"),
    keep_tombstones: bool = False,
) -> DataFrame:
    """Compacted changelog with the same schema as the input.

    The boundary is ``upto_lsn`` (requires an ``lsn`` column),
    ``upto_time`` (a ``commit_time`` cutoff, inclusive), or neither —
    then the WHOLE log folds to its minimal reconstructing form (the
    tail is empty). Every column beyond pk/column_name/values/order
    (``table_name``, ``pk_json``, audit columns…) is preserved on
    synthetic rows from the row's last pre-boundary event. Stays EAV
    (grouped by the ``column_name`` values actually present), so no
    ``value_cols`` enumeration is needed and heterogeneous/evolving
    column sets compact correctly.

    ``keep_tombstones``: rows dead at the boundary vanish by default
    (reconstruction never shows them). Consumers that MERGE the
    compacted log onto pre-existing older state need the death recorded
    — with ``True``, each dead row keeps exactly one ``DELETED RECORD``
    marker at its last pre-boundary position.
    """
    if upto_lsn is not None and "lsn" not in changelog.columns:
        raise ValueError("lsn boundary requires an lsn column")
    avail = [c for c in order_cols if c in changelog.columns]
    if upto_lsn is not None:
        in_head = F.col("lsn") <= F.lit(upto_lsn)
    elif upto_time is not None:
        in_head = F.col("commit_time") <= F.lit(upto_time).cast("timestamp")
    else:
        in_head = F.lit(True)
    head = changelog.filter(in_head)
    tail = changelog.filter(~in_head)

    ord_key = F.struct(*[F.col(c) for c in avail])
    special = {*pk_cols, "column_name", "old_value", "new_value", *avail}
    extra_cols = [c for c in changelog.columns if c not in special]

    liveness_case = (
        F.when(F.col("old_value") == DELETED_RECORD, F.lit("dead"))
        .when(F.col("new_value") == NEW_RECORD, F.lit("live"))
        .otherwise(F.lit("live"))
    )
    per_key = head.groupBy(*pk_cols, "column_name").agg(
        F.max_by("new_value", ord_key).alias("_v"),
        F.max_by(liveness_case, ord_key).alias("_live"),
        F.max(ord_key).alias("_ord"),
        F.max(
            F.when(F.col("old_value") == DELETED_RECORD, ord_key)
        ).alias("_del_ord"),
        F.max_by(F.struct(*extra_cols), ord_key).alias("_extras")
        if extra_cols
        else F.lit(None).alias("_extras"),
    )
    per_pk = per_key.groupBy(*pk_cols).agg(
        F.collect_list(
            F.when(
                F.col("column_name").isNotNull(),
                F.struct(
                    F.col("column_name").alias("c"),
                    F.col("_v").alias("v"),
                    F.col("_ord").alias("o"),
                ),
            )
        ).alias("_cols"),
        F.max(F.when(F.col("column_name").isNull(), F.col("_live"))).alias(
            "_marker"
        ),
        F.max(
            F.when(F.col("column_name").isNull(), F.col("_del_ord"))
        ).alias("_epoch"),
        F.max("_ord").alias("_last"),
        F.max_by("_extras", "_ord").alias("_x"),
    )
    is_dead = F.col("_marker") == "dead"

    # entries: optional marker + one entry per current-epoch column, all
    # stamped at the row's last pre-boundary position — one explode, the
    # single-pass shape build_changelog itself uses. Entry fields:
    # (c = column_name, ov = old_value, v = new_value, o = position).
    def _entry(c, ov, v):
        return F.struct(
            c.alias("c"), ov.alias("ov"), v.alias("v"),
            F.col("_last").alias("o"),
        )

    none = F.lit(None).cast("string")
    col_entries = F.transform(
        F.filter(
            F.col("_cols"),
            lambda s: F.col("_epoch").isNull() | (s["o"] > F.col("_epoch")),
        ),
        lambda s: _entry(s["c"], none, s["v"]),
    )
    insert_marker = F.array(_entry(none, none, F.lit(NEW_RECORD)))
    tombstone = F.array(_entry(none, F.lit(DELETED_RECORD), none))
    # slice(…, 1, 0) is the typed empty array — rows whose liveness came
    # from update rows alone (no marker in the prefix) get no synthetic
    # marker, preserving marker-presence semantics through compaction;
    # dead rows vanish (empty entries never explode) unless tombstones
    # are kept
    empty = F.slice(insert_marker, 1, 0)
    entries = (
        F.when(is_dead, tombstone if keep_tombstones else empty)
        .when(F.col("_marker") == "live", F.concat(insert_marker, col_entries))
        .otherwise(col_entries)
    )

    exploded = per_pk.select(
        *pk_cols, "_x", F.explode(entries).alias("_e")
    )
    synthetic = exploded.select(
        *[F.col("_e.o")[c].alias(c) for c in avail],
        *[F.col(f"_x.{c}").alias(c) for c in extra_cols],
        *pk_cols,
        F.col("_e.c").alias("column_name"),
        F.col("_e.ov").alias("old_value"),
        F.col("_e.v").alias("new_value"),
    ).select(*changelog.columns)

    return synthetic.unionByName(tail)
