"""Drift detection — row-level consistency report between a
changelog-reconstructed state and a trusted source snapshot, the audit
a CDC operator runs before declaring a pipeline healthy (did we miss a
window? double-apply a batch? diverge after a schema change?).

One full-outer join on the pk, null-safe value comparison, and a
classification:

- ``missing_in_left``  — key only the snapshot has (lost events);
- ``missing_in_right`` — key only the reconstruction has (ghost rows —
  usually a missed delete);
- ``value_mismatch``   — key in both, any column differing null-safely;
- matching keys emit NOTHING — the report is drift-sized, not
  state-sized.

Scale: ONE shuffle join keyed on the pk (both sides usually already
live partitioned/bucketed by it); the per-column comparison is a
codegen expression. The summary form folds the report to one row per
class — run it first; pull the row-level report only when the counts
are non-zero.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def drift_report(
    left: DataFrame,
    right: DataFrame,
    pk_cols: list[str],
    value_cols: list[str],
) -> DataFrame:
    """Row-level drift between two same-schema states. Output: pk cols +
    ``drift_kind`` + ``left_<c>`` / ``right_<c>`` per value column
    (string-typed — both sides cast, so a typed snapshot compares
    cleanly against a type-erased reconstruction). Identical rows emit
    nothing."""
    def side(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            *pk_cols,
            F.lit(True).alias(f"_{tag}_present"),
            *[
                F.col(c).cast("string").alias(f"{tag}_{c}")
                for c in value_cols
            ],
        )

    l, r = side(left, "left"), side(right, "right")
    j = l.join(r, pk_cols, "full_outer")
    any_diff = None
    for c in value_cols:
        d = ~F.col(f"left_{c}").eqNullSafe(F.col(f"right_{c}"))
        any_diff = d if any_diff is None else (any_diff | d)
    kind = (
        F.when(F.col("_right_present").isNull(), F.lit("missing_in_right"))
        .when(F.col("_left_present").isNull(), F.lit("missing_in_left"))
        .when(any_diff, F.lit("value_mismatch"))
    )
    return (
        j.withColumn("drift_kind", kind)
        .filter(F.col("drift_kind").isNotNull())
        .select(
            *pk_cols,
            "drift_kind",
            *[F.col(f"left_{c}") for c in value_cols],
            *[F.col(f"right_{c}") for c in value_cols],
        )
    )


def drift_summary(
    left: DataFrame,
    right: DataFrame,
    pk_cols: list[str],
    value_cols: list[str],
) -> DataFrame:
    """One row per drift class with its count (zero-drift classes
    absent), plus an ``n_keys_compared`` row (distinct keys seen on
    either side) — the cheap health gate."""
    rep = drift_report(left, right, pk_cols, value_cols)
    counts = rep.groupBy("drift_kind").agg(
        F.count("*").cast("long").alias("n")
    )
    total = left.select(*pk_cols).unionByName(
        right.select(*pk_cols)
    ).distinct().agg(
        F.lit("n_keys_compared").alias("drift_kind"),
        F.count("*").cast("long").alias("n"),
    )
    return counts.unionByName(total)
