"""SCD Type-2 history: changelog → row versions with validity intervals.

The changelog (one row per transaction × row × changed column,
usp_cdc_populate_changelog.sql:138–177 schema) answers "what changed";
dimension consumers ask "what was the row between t1 and t2". This
operator folds the long-format changelog into slowly-changing-dimension
Type-2 shape: one row per (pk, version) with ``valid_from`` /
``valid_to`` / ``is_current``, values carried forward across versions.

The reference has no such operator (its users hand-join the changelog);
it is the interval-form dual of ``operators.reconstruct.reconstruct_state``
(point-in-time form).

Plan shape (scale notes):
- one aggregation to fold per-column rows into per-transaction version
  deltas (shuffle on (pk, txn));
- one window pass per pk (shuffle on pk) to carry values forward
  (``last(..., ignorenulls)``) and close intervals (``lead``);
- no joins, no per-group Python; both exchanges are on the PK, so a
  changelog sink bucketed by pk makes the first exchange free.

Build the changelog with ``record_insert_images=True`` if the insert-time
column values should appear in the first version — the reference-faithful
changelog only records *changes*, so columns never updated after insert
would otherwise be NULL in every version (documented reference gap,
SURVEY.md §2.13).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from changedatacapture_reporting_spark.schema import DELETED_RECORD


def scd2_history(
    changelog: DataFrame,
    pk_cols: list[str],
    value_cols: list[str],
    order_cols: tuple[str, ...] = ("commit_time", "lsn", "seq"),
    allow_coarse_order: bool = False,
) -> DataFrame:
    """One row per (pk, version): pk cols + value cols (string-typed, as
    the changelog is type-erased) + ``valid_from``, ``valid_to`` (NULL =
    still open), ``is_current``.

    A delete transaction closes the previous version's interval without
    emitting a version of its own; a later re-insert opens a new one.

    The changelog must carry ``lsn``/``seq`` (build it with
    ``carry_cols=["lsn", "seq"]``, as ``populate_changelog`` does):
    ``commit_time`` alone cannot distinguish two transactions committed
    in the same tick, so grouping by it would collapse them into one
    version with per-column values mixed nondeterministically across
    both (ADVICE r01). ``allow_coarse_order=True`` opts into that
    coarser grouping for changelogs that genuinely lack lsn/seq.
    """
    avail = [c for c in order_cols if c in changelog.columns]
    missing = [c for c in order_cols if c not in changelog.columns]
    if missing and not allow_coarse_order:
        raise ValueError(
            f"changelog lacks transaction-ordering columns {missing}: "
            "build it with carry_cols=['lsn', 'seq'] so same-commit_time "
            "transactions stay distinct versions, or pass "
            "allow_coarse_order=True to accept collapsing them"
        )

    per_txn = _per_txn(changelog, pk_cols, avail, value_cols)
    return _fold_versions(per_txn, pk_cols, avail, value_cols)


def _per_txn(
    changelog: DataFrame,
    pk_cols: list[str],
    avail: list[str],
    value_cols: list[str],
) -> DataFrame:
    """Fold the per-column rows of each transaction into one version
    delta; values are struct-wrapped so "changed to NULL" (a real
    changelog row with new_value NULL) stays distinguishable from "not
    changed in this transaction" (no row at all) through the
    carry-forward in _fold_versions."""
    return changelog.groupBy(*pk_cols, *avail).agg(
        *[
            F.max(
                F.when(
                    F.col("column_name") == c,
                    F.struct(F.col("new_value").alias("v")),
                )
            ).alias(c)
            for c in value_cols
        ],
        F.max(
            F.col("column_name").isNull()
            & (F.col("old_value") == DELETED_RECORD)
        ).alias("__is_delete"),
    )


def _fold_versions(
    per_txn: DataFrame,
    pk_cols: list[str],
    avail: list[str],
    value_cols: list[str],
) -> DataFrame:
    """Carry values across a key's version deltas (delete-bounded epochs)
    and close intervals — the window half of scd2_history."""
    w = W.partitionBy(*pk_cols).orderBy(*avail)
    fill = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    # values carry forward version-to-version; a re-insert after a delete
    # starts from its own images (delete resets the carry within the
    # window by bounding the fill at the last delete)
    delete_rank = F.sum(F.col("__is_delete").cast("int")).over(fill)
    carried = per_txn.withColumn("__epoch", delete_rank).select(
        *pk_cols,
        *avail,
        "__is_delete",
        *[
            F.last(F.col(c), ignorenulls=True)
            .over(
                W.partitionBy(*pk_cols, "__epoch")
                .orderBy(*avail)
                .rowsBetween(W.unboundedPreceding, W.currentRow)
            )
            .alias(c)
            for c in value_cols
        ],
    )

    nxt = F.lead(F.struct(*avail)).over(w)
    versions = carried.select(
        *pk_cols,
        *[F.col(c)["v"].alias(c) for c in value_cols],
        F.col(avail[0]).alias("valid_from"),
        nxt[avail[0]].alias("valid_to"),
        F.col("__is_delete"),
    )
    return versions.filter(~F.col("__is_delete")).select(
        *pk_cols,
        *value_cols,
        "valid_from",
        "valid_to",
        (F.col("valid_to").isNull()).alias("is_current"),
    )


def _plan_is_simple_scan(df: DataFrame) -> bool:
    """True when the optimized plan is (close to) a bare relation scan —
    a materialized table, possibly under a trivial project/filter.
    Re-scanning such a plan several times is cheap; recomputing a deep
    subtree (joins/windows) several times is not."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:  # pragma: no cover - defensive: plan introspection
        return True
    return len([ln for ln in plan.splitlines() if ln.strip()]) <= 3


def scd2_merge(
    existing: DataFrame,
    new_log: DataFrame,
    pk_cols: list[str],
    value_cols: list[str],
    order_cols: tuple[str, ...] = ("commit_time", "lsn", "seq"),
    allow_coarse_order: bool = False,
    materialize: bool | str = "auto",
) -> DataFrame:
    """Incrementally maintain an SCD2 history: merge a NEW changelog
    batch into an ``existing`` :func:`scd2_history` output without
    re-reading the full changelog — the steady-state dimension-refresh
    shape (nightly batch folds into a years-deep history).

    Per-key work is bounded by the batch:

    - keys absent from the batch pass through untouched (anti join);
    - touched keys keep their CLOSED versions verbatim; only the open
      version is re-derived — it becomes the carry SEED (ordered before
      every batch transaction) and the batch's version deltas fold on
      top through the same delete-bounded-epoch window as the full
      rebuild, closing the seed's interval if the batch adds versions
      and handling delete → re-insert epochs across the boundary.

    Precondition (the watermark contract populate_changelog maintains):
    every batch transaction orders AFTER the existing open versions'
    ``valid_from`` under ``order_cols`` — i.e. batches arrive in order.

    ``existing`` is referenced three times in the plan (anti join, closed
    semi join, seed). Pass the MATERIALIZED history table (the normal
    steady-state case) — handing it an unpersisted computation subtree
    recomputes that subtree three times. ``materialize`` guards this:

    - ``"auto"`` (default): warn when ``existing`` is uncached AND its
      optimized plan is a non-trivial computation (a bare table scan is
      fine to re-read; it is NOT auto-checkpointed because at large
      scale localCheckpointing a years-deep history would be far worse
      than three parquet scans);
    - ``True``: ``localCheckpoint`` ``existing`` eagerly so the subtree
      is computed exactly once (ad-hoc/test callers);
    - ``False``: use as-is, no warning.

    Equality contract (pytest + driver-checked):
    ``scd2_merge(scd2_history(log ≤ W), log > W) == scd2_history(log)``
    for any window split W.
    """
    avail = [c for c in order_cols if c in new_log.columns]
    missing = [c for c in order_cols if c not in new_log.columns]
    if missing and not allow_coarse_order:
        raise ValueError(
            f"changelog lacks transaction-ordering columns {missing}: "
            "build it with carry_cols=['lsn', 'seq'], or pass "
            "allow_coarse_order=True"
        )

    if materialize is True:
        existing = existing.localCheckpoint(eager=True)
    elif materialize == "auto":
        try:
            uncached = existing.storageLevel.useMemory is False and (
                existing.storageLevel.useDisk is False
            )
        except Exception:  # pragma: no cover - Connect-style sessions
            uncached = True
        if uncached and not _plan_is_simple_scan(existing):
            warnings.warn(
                "scd2_merge references `existing` three times; its plan "
                "is an unpersisted computation and will be recomputed "
                "3x. Pass the materialized history table, cache it, or "
                "call with materialize=True to localCheckpoint it.",
                stacklevel=2,
            )

    touched = new_log.select(*pk_cols).distinct()
    untouched = existing.join(touched, pk_cols, "left_anti")
    ex_touched = existing.join(touched, pk_cols, "left_semi")
    closed = ex_touched.filter(~F.col("is_current"))

    per_txn_new = _per_txn(new_log, pk_cols, avail, value_cols)
    order_types = {f.name: f.dataType for f in per_txn_new.schema.fields}
    seed = ex_touched.filter(F.col("is_current")).select(
        *pk_cols,
        F.col("valid_from").cast(order_types[avail[0]]).alias(avail[0]),
        # remaining order cols sort the seed before any real transaction
        # sharing the first order value (lsn/seq are non-negative)
        *[F.lit(-1).cast(order_types[c]).alias(c) for c in avail[1:]],
        *[F.struct(F.col(c).alias("v")).alias(c) for c in value_cols],
        F.lit(False).alias("__is_delete"),
    )
    recomputed = _fold_versions(
        seed.unionByName(per_txn_new.select(*seed.columns)),
        pk_cols,
        avail,
        value_cols,
    )
    out_cols = [*pk_cols, *value_cols, "valid_from", "valid_to", "is_current"]
    return (
        untouched.select(*out_cols)
        .unionByName(closed.select(*out_cols))
        .unionByName(recomputed.select(*out_cols))
    )


def scd2_validate(
    hist: DataFrame,
    pk_cols: list[str],
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Interval-integrity audit of an SCD2 history — the DQ gate run
    before anyone trusts point-in-time joins against it. Emits one row
    per (version, violated rule); a well-formed history emits nothing.

    Rules (closed-open convention; GAPS are legal — a delete closes an
    interval and a re-insert opens a later one, the gap IS the deleted
    period):

    - ``overlap``            — interval end exceeds the next version's
                               start within the same key;
    - ``open_not_last``      — NULL-ended interval that is not the
                               key's final version;
    - ``current_closed``     — flagged current but has an end;
    - ``noncurrent_open``    — NULL-ended but not flagged current;
    - ``multiple_current``   — more than one current row per key (each
                               current row of such a key is flagged).

    ONE shuffle: every rule is a window expression over the same
    (key, order) partitioning; flags collect into an array, explode
    drops clean versions, so output is violation-sized.
    """
    key = [F.col(c) for c in pk_cols]
    order = W.partitionBy(*key).orderBy(
        F.col(from_col).asc(), F.col(to_col).asc_nulls_last()
    )
    whole = W.partitionBy(*key)
    # window expressions first (generators cannot host them), flags after
    staged = hist.select(
        *pk_cols,
        from_col,
        to_col,
        current_col,
        F.lead(F.col(from_col)).over(order).alias("_nxt"),
        F.sum(F.when(F.col(current_col), F.lit(1)).otherwise(F.lit(0)))
        .over(whole)
        .alias("_n_current"),
    )
    flags = F.array(
        F.when(
            F.col(to_col).isNotNull()
            & F.col("_nxt").isNotNull()
            & (F.col(to_col) > F.col("_nxt")),
            F.lit("overlap"),
        ),
        F.when(
            F.col(to_col).isNull() & F.col("_nxt").isNotNull(),
            F.lit("open_not_last"),
        ),
        F.when(
            F.col(current_col) & F.col(to_col).isNotNull(),
            F.lit("current_closed"),
        ),
        F.when(
            ~F.col(current_col) & F.col(to_col).isNull(),
            F.lit("noncurrent_open"),
        ),
        F.when(
            F.col(current_col) & (F.col("_n_current") > 1),
            F.lit("multiple_current"),
        ),
    )
    return staged.select(
        *pk_cols,
        from_col,
        F.explode(F.filter(flags, lambda x: x.isNotNull())).alias("violation"),
    )
