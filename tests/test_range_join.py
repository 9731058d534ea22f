"""Range-join operator: bucketed equi-join strategy vs the naive
cross-product, exactly-once semantics, and plan shape (no nested loop)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from changedatacapture_reporting_spark.operators.range_join import (
    interval_overlap_join,
    point_in_interval_join,
)


@pytest.fixture(scope="module")
def frames(spark):
    # deterministic, includes: interval spanning many buckets, zero-length
    # interval, point on both boundaries, point matching nothing,
    # overlapping intervals
    # repartition(1): createDataFrame spreads even 5 rows over 32
    # partitions (local[32] default parallelism); the naive crossJoin then
    # runs 32x32 = 1024 task pairs (~15s of scheduler overhead per action
    # on 200 logical rows), and coalesce(1) pays a fixed per-merged-parent
    # cost. A one-partition shuffle of tiny data is sub-second.
    points = spark.createDataFrame(
        [(i, i * 7 % 100) for i in range(40)], "pid long, day long"
    ).repartition(1)
    intervals = spark.createDataFrame(
        [
            (1, 0, 10),
            (2, 5, 5),       # zero-length
            (3, 8, 95),      # spans many buckets
            (4, 50, 60),
            (5, 200, 300),   # matches nothing
        ],
        "iid long, start_day long, end_day long",
    ).repartition(1)
    return points, intervals


def _naive(points, intervals):
    return points.crossJoin(intervals).filter(
        F.col("day").between(F.col("start_day"), F.col("end_day"))
    )


def _assert_same_multiset(got, expected):
    """One collect per side (results are tiny) beats exceptAll round
    trips, which re-execute both plans per direction."""
    cols = sorted(got.columns)
    g = sorted(map(tuple, got.select(*cols).collect()))
    e = sorted(map(tuple, expected.select(*cols).collect()))
    assert g == e


@pytest.mark.parametrize("width", [1, 7, 1000])
def test_point_in_interval_matches_naive(spark, frames, width):
    """Any bucket width gives the same exactly-once result."""
    points, intervals = frames
    got = point_in_interval_join(
        points, intervals, "day", "start_day", "end_day", bucket_width=width
    )
    expected = _naive(points, intervals)
    _assert_same_multiset(got, expected)


def test_left_join_keeps_unmatched_points(spark, frames):
    points, intervals = frames
    got = point_in_interval_join(
        points, intervals, "day", "start_day", "end_day", bucket_width=7,
        how="left",
    )
    matched_pids = {
        r.pid for r in _naive(points, intervals).select("pid").distinct().collect()
    }
    rows = got.collect()
    # every point appears; unmatched ones exactly once with NULL interval
    assert {r.pid for r in rows} == {r.pid for r in points.collect()}
    unmatched = [r for r in rows if r.iid is None]
    assert {r.pid for r in unmatched} == (
        {r.pid for r in points.collect()} - matched_pids
    )


def test_no_nested_loop_in_plan(spark, frames):
    points, intervals = frames
    got = point_in_interval_join(
        points, intervals, "day", "start_day", "end_day", bucket_width=7
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_interval_overlap_matches_naive(spark):
    left = spark.createDataFrame(
        [(i, i * 13 % 80, i * 13 % 80 + i % 9) for i in range(30)],
        "lid long, ls long, le long",
    ).repartition(1)
    right = spark.createDataFrame(
        [(j, j * 11 % 70, j * 11 % 70 + j % 25) for j in range(30)],
        "rid long, rs long, re long",
    ).repartition(1)
    got = interval_overlap_join(left, right, "ls", "le", "rs", "re", 10)
    expected = left.crossJoin(right).filter(
        (F.col("ls") <= F.col("re")) & (F.col("rs") <= F.col("le"))
    )
    _assert_same_multiset(got, expected)


def test_column_collision_rejected(spark, frames):
    points, _ = frames
    with pytest.raises(ValueError, match="collision"):
        point_in_interval_join(
            points, points, "day", "day", "day", bucket_width=7
        )
