"""Cohort retention over an event stream: users grouped by their
first-activity period, counted back in every later period — the
retention-matrix query behind every "week-N retention" dashboard.

Plan shape (the 100 TB posture): the raw stream collapses FIRST to the
distinct (user, period) grid — one shuffle with map-side distinct; every
later step works on that grid, which is orders of magnitude smaller than
the events (bounded by users × periods). The cohort assignment is an
aggregation OF THE GRID (no second scan of the stream), and the final
join back to the grid is on the user key. No window functions, no
per-user state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cohort_retention(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Weekly retention matrix: (cohort_week, week_offset, n_users) —
    distinct users from the cohort active ``week_offset`` weeks after
    their first week (offset 0 = the cohort's own size). Weeks truncate
    to Monday, so offsets are exact multiples of 7 days."""
    grid = (
        events.select(
            F.col(user_col).alias("user"),
            F.date_trunc("week", F.col(ts_col)).cast("date").alias("wk"),
        )
        .distinct()
    )
    cohorts = grid.groupBy("user").agg(F.min("wk").alias("cohort_week"))
    return (
        grid.join(cohorts, "user")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("wk"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )
