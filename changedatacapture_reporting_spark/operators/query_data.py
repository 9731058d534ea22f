"""Changelog reporting — ``usp_cdc_query_data.sql`` semantics.

Entry point 2 of the reference (query:9–12): resolve the changelog table,
emit a freshness banner (MAX(created_dt) formatted MM/dd/yyyy, query:41–46),
then a time-range slice whose bounds are **day-truncated on both ends**
(``CONVERT(VARCHAR(10), date, 101)``, query:53–54) — i.e. the range filter
is date-inclusive regardless of time-of-day in the arguments.
"""

from __future__ import annotations

import datetime as dt
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ChangelogNotFoundError(Exception):
    """Mirrors the reference RAISERROR when no ``<table>%_ChangeLog`` table
    exists (query:36–37)."""


def resolve_changelog_name(
    spark: SparkSession, table: str, candidates: list[str] | None = None
) -> str:
    """Resolve changelog by pattern ``<table>%_ChangeLog`` (query:33, 38)."""
    names = candidates
    if names is None:
        names = [t.name for t in spark.catalog.listTables()]
    pat = re.compile(re.escape(table.strip().lower()) + r".*_changelog$")
    for name in names:
        if pat.match(name.lower()):
            return name
    raise ChangelogNotFoundError(
        f"A change-log table for {table!r} does not exist"
    )


def query_changelog(
    changelog: DataFrame,
    from_date: dt.datetime | dt.date | str,
    to_date: dt.datetime | dt.date | str | None = None,
) -> DataFrame:
    """Day-truncated time-range slice (query:49–57).

    ``to_date`` defaults to now (query:24 ``COALESCE(@to_date, GETDATE())``);
    ``from_date > to_date`` raises (query:26–30). Both bounds are truncated
    to dates and the filter is inclusive: commit dates in [from_d, to_d].

    The filter is expressed on a date-cast of ``commit_time`` so Catalyst
    still pushes a min/max-style predicate into the parquet scan; when the
    frame carries the sink's ``commit_month`` partition column, the
    month-truncated bounds are applied to it too, so the scan prunes whole
    month partitions before reading a single row group.
    """
    to_date = to_date if to_date is not None else dt.datetime.now(dt.timezone.utc)
    from_c = F.to_date(F.lit(from_date).cast("timestamp"))
    to_c = F.to_date(F.lit(to_date).cast("timestamp"))
    invalid = changelog.sparkSession.range(1).select(
        (from_c > to_c).alias("bad")
    ).head()[0]
    if invalid:
        raise ValueError("The FROM DATE cannot be greater than the TO DATE")
    d = F.to_date("commit_time")
    pred = (d >= from_c) & (d <= to_c)
    if "commit_month" in changelog.columns:
        pred = pred & F.col("commit_month").between(
            F.trunc(from_c, "month"), F.trunc(to_c, "month")
        )
    return changelog.filter(pred)


def freshness(changelog: DataFrame, ts_col: str = "created_dt") -> DataFrame:
    """'ATTENTION: Data is accurate as of …' banner (query:41–46):
    MAX(created_dt) formatted MM/dd/yyyy."""
    return changelog.agg(
        F.concat(
            F.lit("ATTENTION: Data is accurate as of "),
            F.date_format(F.max(ts_col), "MM/dd/yyyy"),
        ).alias("message"),
        F.date_format(F.max(ts_col), "MM/dd/yyyy").alias("accurate_as_of"),
    )
