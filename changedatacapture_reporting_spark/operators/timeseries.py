"""Time-series regularization — turn the irregular per-key activity a
changelog/rollup produces into a dense daily grid (the shape every
dashboard, forecast, and window comparison expects): one row per
(key, day) between the key's first and last observation, gaps filled.

Fill policies:
- ``"locf"`` — last observation carried forward (state-like series: a
  balance is whatever it last was);
- ``"zero"`` — absent days are 0 (flow-like series: no changes happened
  that day — the right fill for rollup counts);
- ``"null"`` — keep the gap visible.

Plan shape (scale notes): the grid comes from ``sequence()`` exploded
per key — rows generated ∝ output size, no join against a calendar
table and no cross join; the observations attach by LEFT join on
(key, day) — one shuffle each side on the same key, which AQE plans as
a single co-partitioned exchange pair; LOCF is one per-key window
(``last(..., ignorenulls)``) over the already-key-partitioned data.
Dense output is the POINT of the operator — emit it only at reporting
granularity (per day per key), never at event granularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def resample_daily(
    df: DataFrame,
    key_cols: list[str],
    day_col: str,
    value_cols: list[str],
    fill: str = "locf",
) -> DataFrame:
    """Dense daily series per key over ``[min(day), max(day)]`` of that
    key, with ``value_cols`` filled per the policy. Input must be at
    most one row per (key, day) — pre-aggregate first (the rollup
    already is). Output: key cols + ``day`` + value cols +
    ``is_observed``."""
    if fill not in ("locf", "zero", "null"):
        raise ValueError(f"unknown fill policy: {fill!r}")
    span = df.groupBy(*key_cols).agg(
        F.min(day_col).alias("_lo"), F.max(day_col).alias("_hi")
    )
    grid = span.select(
        *key_cols,
        F.explode(
            F.sequence("_lo", "_hi", F.expr("interval 1 day"))
        ).alias("day"),
    )
    obs = df.select(
        *key_cols,
        F.col(day_col).alias("day"),
        F.lit(True).alias("is_observed"),
        *[F.col(c) for c in value_cols],
    )
    joined = grid.join(obs, [*key_cols, "day"], "left").withColumn(
        "is_observed", F.coalesce("is_observed", F.lit(False))
    )
    if fill == "null":
        return joined
    if fill == "zero":
        return joined.select(
            *key_cols,
            "day",
            *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in value_cols],
            "is_observed",
        )
    w = (
        W.partitionBy(*key_cols)
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        *key_cols,
        "day",
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ],
        "is_observed",
    )
