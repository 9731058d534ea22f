"""usp_cdc_query_data semantics (SURVEY.md §3 entry point 2): changelog
resolution by pattern, day-truncated bounds, freshness banner, validation."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from changedatacapture_reporting_spark.operators.query_data import (
    ChangelogNotFoundError,
    freshness,
    query_changelog,
    resolve_changelog_name,
)


@pytest.fixture(scope="module")
def log(spark):
    rows = [
        (dt.datetime(2024, 1, 1, 23, 59), "t", "name", "a", "b"),
        (dt.datetime(2024, 1, 2, 0, 0), "t", "qty", "1", "2"),
        (dt.datetime(2024, 1, 3, 12, 30), "t", "name", "b", "c"),
        (dt.datetime(2024, 2, 1, 8, 0), "t", "qty", "2", "3"),
    ]
    return spark.createDataFrame(
        rows,
        "commit_time timestamp, table_name string, column_name string,"
        " old_value string, new_value string",
    ).withColumn("created_dt", F.col("commit_time"))


def test_resolve_by_pattern():
    """`name LIKE '<table>%_ChangeLog'` lookup (query:33, 38), case-insensitive."""
    cands = ["orders_changelog", "lineitem_v2_changelog", "other"]
    assert resolve_changelog_name(None, "Orders", cands) == "orders_changelog"
    assert (
        resolve_changelog_name(None, "lineitem", cands) == "lineitem_v2_changelog"
    )


def test_resolve_missing_raises():
    with pytest.raises(ChangelogNotFoundError):
        resolve_changelog_name(None, "nope", ["orders_changelog"])


def test_day_truncated_inclusive_bounds(log):
    """Bounds truncate to dates on BOTH ends (query:53–54): a from-date of
    Jan-1 23:00 still includes Jan-1 00:00 rows; a to-date of Jan-3 00:00
    includes all of Jan-3."""
    out = query_changelog(
        log, dt.datetime(2024, 1, 1, 23, 0), dt.datetime(2024, 1, 3, 0, 0)
    )
    times = sorted(r.commit_time for r in out.collect())
    assert times == [
        dt.datetime(2024, 1, 1, 23, 59),
        dt.datetime(2024, 1, 2, 0, 0),
        dt.datetime(2024, 1, 3, 12, 30),  # included despite 00:00 to-bound
    ]


def test_inverted_range_raises(log):
    with pytest.raises(ValueError):
        query_changelog(log, "2024-02-01", "2024-01-01")


def test_default_to_date_is_now(log):
    out = query_changelog(log, "2024-01-01")
    assert out.count() == 4


def test_freshness_banner(log):
    row = freshness(log).head()
    assert row.accurate_as_of == "02/01/2024"
    assert row.message == "ATTENTION: Data is accurate as of 02/01/2024"
