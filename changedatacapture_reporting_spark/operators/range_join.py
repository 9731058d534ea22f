"""Range (point-in-interval) join — a join shape Spark has no native
operator for (SURVEY.md §2.12 lists it among the reference's absences; the
reference itself has only one equi-join, usp_cdc_populate_changelog.sql:
340–364).

Naive expression (``p.x BETWEEN i.start AND i.end`` with no equi-key)
becomes BroadcastNestedLoopJoin — O(|points| × |intervals|) comparisons,
a non-starter at scale. The scale-correct strategy here is **bucketed
equi-join**:

- each point lands in exactly ONE bucket: ``floor(x / width)``;
- each interval explodes to EVERY bucket it covers:
  ``sequence(floor(start/w), floor(end/w))``;
- equi-join on the bucket, then apply the exact range predicate.

Every qualifying (point, interval) pair meets in exactly one bucket (the
point's), so the join emits no duplicates and needs no post-dedup. The
shuffle is a plain hash exchange on a well-distributed integer key;
Catalyst/AQE pick broadcast vs sort-merge as usual.

Choosing ``bucket_width``: explosion factor per interval is
``len/width + 1``, while bucket fan-in grows as width grows. Set width to
the TYPICAL interval length — explosion stays O(1) per interval and each
point probes one bucket. Degenerate long-tail intervals (len ≫ typical)
are better handled by splitting them upstream; skewed hot buckets fall to
AQE skew-join handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__range_bucket"


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start_col <= point_col <= end_col`` (inclusive both ends).

    ``point_col``/``start_col``/``end_col`` must be integral (map dates to
    day numbers, timestamps to epoch seconds upstream — keeps the bucket
    arithmetic exact and domain-agnostic). Output columns: all point
    columns + all interval columns (names must not collide).

    ``how``: ``inner`` or ``left`` (left keeps pointless points with NULL
    interval columns — implemented as one extra anti-join branch, still no
    nested loop).
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"column name collision: {sorted(overlap)}")

    p = points.withColumn(
        _BUCKET, F.floor(F.col(point_col) / F.lit(bucket_width))
    )
    i = intervals.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(bucket_width)),
                F.floor(F.col(end_col) / F.lit(bucket_width)),
            )
        ),
    )
    matched = (
        p.join(i, on=_BUCKET, how="inner")
        .filter(F.col(point_col).between(F.col(start_col), F.col(end_col)))
        .drop(_BUCKET)
    )
    if how == "inner":
        return matched
    if how == "left":
        missed = points.join(
            matched.select(*points.columns), on=points.columns, how="left_anti"
        )
        for c in intervals.columns:
            missed = missed.withColumn(
                c, F.lit(None).cast(dict(intervals.dtypes)[c])
            )
        return matched.unionByName(missed)
    raise ValueError(f"unsupported how={how!r} (inner|left)")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: int,
) -> DataFrame:
    """Interval×interval overlap join: pairs where
    ``left_start <= right_end AND right_start <= left_end``.

    Both sides explode to their covered buckets; a pair of overlapping
    intervals shares at least one bucket, so candidates meet — but may
    meet in SEVERAL buckets, so the pair is kept only in the FIRST shared
    bucket (``max(floor(ls/w), floor(rs/w))``), restoring exactly-once
    output without a distinct.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"column name collision: {sorted(overlap)}")

    def burst(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.withColumn(
            _BUCKET,
            F.explode(
                F.sequence(
                    F.floor(F.col(s) / F.lit(bucket_width)),
                    F.floor(F.col(e) / F.lit(bucket_width)),
                )
            ),
        )

    l = burst(left, left_start, left_end)
    r = burst(right, right_start, right_end)
    first_shared = F.greatest(
        F.floor(F.col(left_start) / F.lit(bucket_width)),
        F.floor(F.col(right_start) / F.lit(bucket_width)),
    )
    return (
        l.join(r, on=_BUCKET, how="inner")
        .filter(
            (F.col(left_start) <= F.col(right_end))
            & (F.col(right_start) <= F.col(left_end))
            & (F.col(_BUCKET) == first_shared)
        )
        .drop(_BUCKET)
    )
