"""Incremental aggregate maintenance — keep a grouped aggregate table
(a materialized view) exact under CDC without rescanning state.

The reference's consumers keep standing reporting aggregates over the
tables it captures (the dashboards usp_cdc_query_data.sql:49–57 feeds);
recomputing ``GROUP BY`` over 100 TB of state per batch is the cost this
operator removes. Classic incremental view maintenance for the
distributive aggregates (COUNT, SUM — and AVG as SUM/COUNT at read
time): every CDC change decomposes into a retraction of the before
image and an assertion of the after image, so a batch of changes folds
into per-group SIGNED deltas, and the maintained table advances by
adding them — O(batch) work, state never read.

- :func:`aggregate_deltas` — change frame (anything carrying
  ``before``/``after`` row-image structs: raw events, a
  ``net_changes`` window) → per-group delta rows. One projection +
  one hash aggregation; group-key CHANGES need no special case (the
  before image retracts from the old group, the after image asserts
  into the new one).
- :func:`merge_aggregate` — maintained table + deltas → next version.
  NOT a groupBy over the whole table: untouched groups pass through an
  anti join against the (broadcast) touched-group set — the maintained
  table never shuffles — and only touched groups re-sum. Groups whose
  row count reaches zero drop, so the view is always exactly
  ``SELECT group, agg FROM state GROUP BY group``.

Non-distributive aggregates (MIN/MAX, DISTINCT counts) are *not*
maintainable from deltas alone — a retraction of the current MIN needs
the runner-up. Those go through `operators.sketches` (mergeable HLL for
distinct) or a rebuild of the touched groups only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_deltas(
    changes: DataFrame,
    group_cols: list[str],
    sum_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Signed per-group deltas of one change batch.

    ``changes`` needs ``before`` / ``after`` struct columns whose fields
    include every ``group_cols`` entry and every ``sum_cols`` source
    (NULL struct = no image on that side: inserts retract nothing,
    deletes assert nothing). Output: group cols + ``n_rows`` (signed
    row-count delta) + one signed sum delta per ``sum_cols`` alias.

    Sum measures must be EXACT types (integer or decimal — the repo's
    money convention): a float measure is rejected, because retraction
    arithmetic on floats drifts (x added then subtracted need not cancel
    bit-for-bit), so a float-maintained view diverges from the
    from-scratch aggregate it must equal. Cast to decimal upstream.
    """
    sum_cols = sum_cols or {}
    img_type = changes.schema["after"].dataType
    for alias, src in sum_cols.items():
        t = img_type[src].dataType.typeName()
        if t in ("double", "float"):
            raise ValueError(
                f"sum measure {alias}={src!r} is {t}: retraction "
                "arithmetic needs an exact type — cast to decimal or a "
                "scaled integer upstream"
            )
    signed = changes.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(-1).alias("sign"), F.col("before").alias("img")
                ),
                F.struct(
                    F.lit(1).alias("sign"), F.col("after").alias("img")
                ),
            )
        ).alias("e")
    ).filter(F.col("e.img").isNotNull())
    return signed.groupBy(
        *[F.col(f"e.img.{c}").alias(c) for c in group_cols]
    ).agg(
        F.sum("e.sign").cast("long").alias("n_rows"),
        *[
            # no cast: the sum keeps the measure's own exact type
            # (long stays long, decimal widens per Spark's sum rules)
            F.sum(F.col("e.sign") * F.col(f"e.img.{src}")).alias(alias)
            for alias, src in sum_cols.items()
        ],
    )


def merge_aggregate(
    agg: DataFrame,
    deltas: DataFrame,
    group_cols: list[str],
    broadcast_deltas: bool = True,
    materialize: bool | str = "auto",
) -> DataFrame:
    """Advance a maintained aggregate by one batch of deltas.

    ``agg`` and ``deltas`` share the schema (group cols + ``n_rows`` +
    sum columns). Untouched groups anti-join through unshuffled; touched
    groups re-sum from (current row ∪ delta rows); groups reaching
    ``n_rows = 0`` vanish — matching a from-scratch GROUP BY of the
    post-batch state exactly. Group keys compare null-safely, so a NULL
    group maintains like any other.

    ``agg`` is referenced twice (anti join + semi join) — the
    steady-state caller holds the materialized table and pays nothing,
    but an unpersisted computed subtree would be derived twice, so the
    same guard as ``operators.scd.scd2_merge`` applies:
    ``materialize=True`` localCheckpoints it, ``"auto"`` (default) warns
    when the plan is a non-trivial unpersisted computation.
    """
    import warnings

    from changedatacapture_reporting_spark.operators.scd import (
        _plan_is_simple_scan,
    )

    if materialize is True:
        agg = agg.localCheckpoint(eager=True)
    elif materialize == "auto":
        try:
            uncached = agg.storageLevel.useMemory is False and (
                agg.storageLevel.useDisk is False
            )
        except Exception:  # pragma: no cover - Connect-style sessions
            uncached = True
        if uncached and not _plan_is_simple_scan(agg):
            warnings.warn(
                "merge_aggregate references `agg` twice; its plan is an "
                "unpersisted computation and will be recomputed 2x. "
                "Pass the materialized aggregate table, cache it, or "
                "call with materialize=True to localCheckpoint it.",
                stacklevel=2,
            )
    measure_cols = [c for c in agg.columns if c not in group_cols]

    def checked_cast(col: F.Column, name: str) -> F.Column:
        # Narrowing back to the maintained type can overflow; under
        # non-ANSI Spark that cast yields NULL SILENTLY, corrupting the
        # view. Surface it instead (ADVICE r8): a non-null value that
        # casts to null raises.
        target = agg.schema[name].dataType
        casted = col.cast(target)
        return F.when(
            col.isNotNull() & casted.isNull(),
            F.raise_error(
                F.lit(
                    f"merge_aggregate: overflow casting measure "
                    f"{name!r} to {target.simpleString()} — widen the "
                    "maintained table's measure type"
                )
            ).cast(target),
        ).otherwise(casted).alias(name)

    touched = deltas.select(*group_cols).distinct()
    if broadcast_deltas:
        touched = F.broadcast(touched)
    cond = [agg[c].eqNullSafe(touched[c]) for c in group_cols]
    untouched = agg.join(touched, cond, "left_anti")
    merged = (
        agg.join(touched, cond, "left_semi")
        .unionByName(
            deltas.select(
                *[
                    F.col(c).cast(agg.schema[c].dataType).alias(c)
                    if c in group_cols
                    else checked_cast(F.col(c), c)
                    for c in agg.columns
                ]
            )
        )
        .groupBy(*group_cols)
        .agg(
            *[
                checked_cast(F.sum(c), c)
                for c in measure_cols
            ]
        )
        .filter(F.col("n_rows") != 0)
    )
    return untouched.unionByName(merged)
