"""Row-level snapshot diff between two LSN boundaries — "what changed
between yesterday's cut and today's", materialized as typed
insert/update/delete rows without building either snapshot.

The naive formulation reconstructs state at A, reconstructs at B, and
full-outer joins — two passes over history plus a state-sized shuffle
join. This operator folds BOTH boundaries in ONE hash aggregation over
the changelog (the reconstruct_state dataflow, evaluated at two cuts
via conditional aggregates), then derives the per-row verdict:

- live at A, gone at B            → ``delete``
- absent at A, live at B          → ``insert``
- live at both, any column differs → ``update`` (null-safe compare)
- live at both, nothing differs    → no row

Epoch correctness matches reconstruct_state at each boundary
independently: a column write at or before the row's last delete
marker ≤ the cut belongs to a dead incarnation and is NULL at that
cut — so a delete → re-insert between A and B reports as an ``update``
(or nothing) with the OLD epoch's values on the A side and the NEW
epoch's on the B side, never a leak across.

Scale: shuffle = one aggregation keyed on pk; no join anywhere; the
changelog scan prunes to ``lsn <= B`` via row-group stats. Output size
∝ rows that actually changed in (A, B].
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from changedatacapture_reporting_spark.schema import DELETED_RECORD, NEW_RECORD


def snapshot_diff(
    changelog: DataFrame,
    pk_cols: list[str],
    value_cols: list[str],
    lsn_a: int,
    lsn_b: int,
    order_cols: tuple[str, ...] = ("commit_time", "lsn", "seq"),
) -> DataFrame:
    """Diff of reconstructed state at ``lsn_a`` vs ``lsn_b`` (a < b,
    both inclusive cuts). Output: pk cols + ``change_kind``
    (insert/update/delete) + ``old_<c>`` / ``new_<c>`` per value
    column (string-typed — the changelog is type-erased)."""
    if lsn_a >= lsn_b:
        raise ValueError("lsn_a must be < lsn_b")
    log = changelog.filter(F.col("lsn") <= F.lit(lsn_b))
    avail = [c for c in order_cols if c in log.columns]
    ord_key = F.struct(*[F.col(c) for c in avail])
    at_a = F.col("lsn") <= F.lit(lsn_a)

    liveness = (
        F.when(F.col("old_value") == DELETED_RECORD, F.lit("dead"))
        .when(F.col("new_value") == NEW_RECORD, F.lit("live"))
        .otherwise(F.lit("live"))
    )

    def bounded(expr: Column, cut: Column | None):
        return F.when(cut, expr) if cut is not None else expr

    def last_at(tag: str, cut):
        return [
            F.max_by(
                bounded(F.col("new_value"), cut), bounded(ord_key, cut)
            ).alias(f"_v{tag}"),
            F.max_by(
                bounded(liveness, cut), bounded(ord_key, cut)
            ).alias(f"_live{tag}"),
            F.max(bounded(ord_key, cut)).alias(f"_ord{tag}"),
            F.max(
                bounded(
                    F.when(F.col("old_value") == DELETED_RECORD, ord_key),
                    cut,
                )
            ).alias(f"_del{tag}"),
        ]

    per_key = log.groupBy(*pk_cols, "column_name").agg(
        *last_at("a", at_a), *last_at("b", None)
    )

    def wide_at(tag: str):
        cols = []
        for c in value_cols:
            cols.append(
                F.max(
                    F.when(
                        F.col("column_name") == c,
                        F.struct(
                            F.col(f"_ord{tag}").alias("o"),
                            F.col(f"_v{tag}").alias("v"),
                        ),
                    )
                ).alias(f"_s{tag}_{c}")
            )
        cols.append(
            F.max(
                F.when(F.col("column_name").isNull(), F.col(f"_live{tag}"))
            ).alias(f"_marker{tag}")
        )
        cols.append(
            F.max(
                F.when(F.col("column_name").isNull(), F.col(f"_del{tag}"))
            ).alias(f"_epoch{tag}")
        )
        # row presence at the cut: ANY changelog row at or before it
        cols.append(
            F.max(F.col(f"_ord{tag}").isNotNull()).alias(f"_seen{tag}")
        )
        return cols

    wide = per_key.groupBy(*pk_cols).agg(*wide_at("a"), *wide_at("b"))

    def val(tag: str, c: str):
        s = F.col(f"_s{tag}_{c}")
        in_epoch = F.col(f"_epoch{tag}").isNull() | (
            s["o"] > F.col(f"_epoch{tag}")
        )
        return F.when(s.isNotNull() & in_epoch, s["v"])

    def live(tag: str):
        return F.col(f"_seen{tag}") & (
            F.col(f"_marker{tag}").isNull()
            | (F.col(f"_marker{tag}") == "live")
        )

    changed = None
    for c in value_cols:
        d = ~val("a", c).eqNullSafe(val("b", c))
        changed = d if changed is None else (changed | d)

    kind = (
        F.when(live("a") & ~live("b"), F.lit("delete"))
        .when(~live("a") & live("b"), F.lit("insert"))
        .when(live("a") & live("b") & changed, F.lit("update"))
    )
    return (
        wide.withColumn("change_kind", kind)
        .filter(F.col("change_kind").isNotNull())
        .select(
            *pk_cols,
            "change_kind",
            *[val("a", c).alias(f"old_{c}") for c in value_cols],
            *[val("b", c).alias(f"new_{c}") for c in value_cols],
        )
    )


def snapshots_to_events(
    snap_a: DataFrame,
    snap_b: DataFrame,
    pk_cols: list[str],
    value_cols: list[str] | None = None,
    lsn: int = 1,
    commit_ts=None,
    table_name: str = "table",
) -> DataFrame:
    """CDC WITHOUT CDC: derive the engine's event model (op, before,
    after) from two TABLE SNAPSHOTS — the standard ingestion pattern
    for sources that publish versioned tables but no change feed (a
    Delta table without CDF, nightly warehouse extracts, vendor dumps).
    The events feed build_changelog / populate exactly like a native
    feed, so snapshot-diff sources and log-based sources share every
    downstream operator.

    One full-outer join on the pk (each side scanned once):

    - only in B               → ``insert``  (after = B row)
    - only in A               → ``delete``  (before = A row)
    - in both, any value col differs (null-safe) → ``update``
    - in both, identical      → no event

    All events carry the SAME (lsn, commit_ts): a snapshot diff is one
    atomic transition, exactly like a single-transaction batch; ``seq``
    disambiguates nothing here and is 0. Per-key correctness needs no
    ordering because a key appears at most once per snapshot.

    Scale: shuffle = the two snapshot scans hashed on pk; output ∝
    changed rows. Intermediate churn (rows changed several times
    BETWEEN snapshots) is invisible by construction — the documented
    fidelity limit of snapshot-diff CDC.
    """
    cols_a = set(snap_a.columns)
    if cols_a != set(snap_b.columns):
        raise ValueError(
            f"snapshot schemas differ: {sorted(cols_a)} vs "
            f"{sorted(snap_b.columns)}"
        )
    if value_cols is None:
        value_cols = [c for c in snap_a.columns if c not in pk_cols]
    all_cols = [*pk_cols, *value_cols]

    a = snap_a.select(
        *[F.col(c).alias(f"_a_{c}") for c in all_cols],
        F.lit(True).alias("_in_a"),
    )
    b = snap_b.select(
        *[F.col(c).alias(f"_b_{c}") for c in all_cols],
        F.lit(True).alias("_in_b"),
    )
    cond = None
    for c in pk_cols:
        eq = F.col(f"_a_{c}") == F.col(f"_b_{c}")
        cond = eq if cond is None else cond & eq
    j = a.join(b, cond, "full_outer")

    # pk-only snapshots (empty value_cols) are legal membership-only
    # diffs: rows present in both simply emit no event (ADVICE r09 —
    # F.when(None, ...) would raise)
    changed = F.lit(False)
    for c in value_cols:
        ne = ~F.col(f"_a_{c}").eqNullSafe(F.col(f"_b_{c}"))
        changed = changed | ne
    op = (
        F.when(F.col("_in_a").isNull(), F.lit("insert"))
        .when(F.col("_in_b").isNull(), F.lit("delete"))
        .when(changed, F.lit("update"))
    )
    before = F.struct(
        *[F.col(f"_a_{c}").alias(c) for c in all_cols]
    )
    after = F.struct(*[F.col(f"_b_{c}").alias(c) for c in all_cols])
    ts = (
        F.lit(commit_ts).cast("timestamp")
        if commit_ts is not None
        else F.timestamp_seconds(F.lit(0))
    )
    return (
        j.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(
            F.lit(lsn).cast("long").alias("lsn"),
            F.lit(0).alias("seq"),
            ts.alias("commit_ts"),
            "op",
            F.lit(table_name).alias("table_name"),
            F.when(F.col("op") != "insert", before).alias("before"),
            F.when(F.col("op") != "delete", after).alias("after"),
        )
    )
