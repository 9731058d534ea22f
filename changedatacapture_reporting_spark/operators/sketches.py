"""Mergeable distinct-count sketches — the incremental rollup pattern
for COUNT(DISTINCT …), which plain additive rollups (operators.rollup)
cannot maintain: distinct counts don't sum across buckets, but HLL
sketches UNION losslessly-for-the-estimate, so a pipeline can keep one
small sketch per (bucket, dimension), append new buckets as data lands,
and answer "distinct users over any bucket range" by unioning sketches —
no rescan of history, error ~1.6%/√(2^lgK) regardless of scale.

Built on Spark's DataSketches-backed expressions (hll_sketch_agg /
hll_union_agg / hll_sketch_estimate — binary-compatible with the Apache
DataSketches HLL family other engines read). Everything is JVM-side;
sketches travel as binary columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_sketch_rollup(
    df: DataFrame,
    key_col: str,
    bucket_cols: list[str],
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch per bucket: (bucket_cols…, sketch, estimate).
    Append-only maintainable — recompute only new buckets and union
    into the stored rollup with :func:`merge_sketch_rollups`."""
    return df.groupBy(*bucket_cols).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lg_k)).alias("sketch")
    ).select(
        *bucket_cols,
        "sketch",
        F.hll_sketch_estimate("sketch").alias("estimate"),
    )


def merge_sketch_rollups(
    rollup: DataFrame,
    bucket_cols: list[str],
) -> DataFrame:
    """Union sketches across whatever ``bucket_cols`` grouping remains
    (empty list = one global row): the range-query side of the rollup.
    Cost ∝ number of sketches, never the raw data."""
    grouped = (
        rollup.groupBy(*bucket_cols) if bucket_cols else rollup.groupBy()
    )
    return grouped.agg(
        F.hll_union_agg("sketch").alias("sketch")
    ).select(
        *bucket_cols,
        "sketch",
        F.hll_sketch_estimate("sketch").alias("estimate"),
    )


def fixed_width_histogram(
    df: DataFrame,
    value_col: str,
    bucket_cols: list[str],
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """Mergeable fixed-grid histogram per bucket: (bucket_cols…, bin,
    bin_lo, bin_hi, n) with ``bin = clamp(floor((v − lo)/width), 0,
    n_bins−1)`` — out-of-range values land in the edge bins, NULLs drop.

    The quantile twin of the HLL rollup above: percentiles don't sum
    across buckets either, but fixed-grid bin COUNTS do (plain addition,
    exactly like operators.rollup partials), so a pipeline keeps one
    tiny histogram per (day, dimension) and answers "P95 over any day
    range" by adding histograms — no rescan, error bounded by the bin
    width BY CONSTRUCTION (not probabilistically). The binning rule is
    one IEEE subtract/divide/floor — bit-identical in any engine, so
    unlike t-digest/KLL the artifact itself is replayable and
    hash-checkable. One hash aggregation; output ≤ n_bins rows/bucket.
    """
    if not n_bins > 0:
        raise ValueError(f"n_bins must be positive, got {n_bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    width = (hi - lo) / n_bins
    v = F.col(value_col).cast("double")
    raw = F.floor((v - F.lit(float(lo))) / F.lit(width))
    bin_ = F.least(
        F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)
    ).cast("int")
    return (
        df.filter(v.isNotNull())
        .groupBy(*bucket_cols, bin_.alias("bin"))
        .agg(F.count("*").cast("long").alias("n"))
        .select(
            *bucket_cols,
            "bin",
            (F.lit(float(lo)) + F.col("bin") * F.lit(width)).alias("bin_lo"),
            (F.lit(float(lo)) + (F.col("bin") + 1) * F.lit(width)).alias(
                "bin_hi"
            ),
            "n",
        )
    )


def merge_histograms(hist: DataFrame, bucket_cols: list[str]) -> DataFrame:
    """Add bin counts across whatever grouping remains (the range-query
    side). Exact — histogram addition is lossless, the only
    approximation anywhere is the original grid resolution."""
    grouped = (
        hist.groupBy(*bucket_cols, "bin", "bin_lo", "bin_hi")
        if bucket_cols
        else hist.groupBy("bin", "bin_lo", "bin_hi")
    )
    return grouped.agg(F.sum("n").cast("long").alias("n"))


def histogram_quantiles(
    hist: DataFrame, bucket_cols: list[str], qs: list[float]
) -> DataFrame:
    """Per-bucket quantile brackets from a (merged) histogram: for each
    q, the [bin_lo, bin_hi) of the bin containing rank ``ceil(q·n)`` —
    the true quantile provably lies inside (clamping caveat at the edge
    bins). Window cumsum over ≤ n_bins rows per bucket — the input is
    sketch-sized, never data-sized."""
    from pyspark.sql.window import Window as W

    if not qs or any(not 0.0 < q <= 1.0 for q in qs):
        raise ValueError(f"quantiles must be in (0, 1]: {qs}")
    w = W.partitionBy(*bucket_cols).orderBy("bin") if bucket_cols else (
        W.orderBy("bin")
    )
    cum = hist.select(
        *bucket_cols,
        "bin",
        "bin_lo",
        "bin_hi",
        F.sum("n").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("cum"),
        F.sum("n").over(
            w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
        ).alias("total"),
    )
    out = None
    for q in qs:
        rank = F.ceil(F.lit(float(q)) * F.col("total"))
        picked = (
            cum.filter(F.col("cum") >= rank)
            .groupBy(*bucket_cols)
            .agg(
                F.lit(float(q)).alias("q"),
                F.min_by(F.col("bin_lo"), F.col("bin")).alias("q_lo"),
                F.min_by(F.col("bin_hi"), F.col("bin")).alias("q_hi"),
            )
        )
        out = picked if out is None else out.unionByName(picked)
    return out
