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
