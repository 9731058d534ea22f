"""Stream-stream interval joins (SURVEY.md §2.12 as-of/range family, true
streaming form): two watermarked event streams joined on an equi-key plus
an event-time interval condition.

Structured Streaming's stream-stream inner join emits each match as soon
as both sides have arrived; the watermark + time-range condition bound the
buffered state (each side keeps only rows inside the interval horizon), so
state is O(rate × horizon), not O(stream). This is the streaming
counterpart of the batch as-of/range joins in contracts_relational —
the reference has no streaming joins at all (its one join is batch,
usp_cdc_populate_changelog.sql:340).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_purchases_signups(
    purchases: DataFrame,
    signups: DataFrame,
    horizon: str = "2 hours",
    watermark: str = "1 hour",
) -> DataFrame:
    """Purchases joined to every signup by the same user within
    ``horizon`` BEFORE the purchase (inclusive both ends) — the
    attribution-window pattern over two live streams.

    Both inputs must be event frames (event_id, ts, user_id, …); they may
    be two filters of one source stream or two genuinely distinct
    streams. Returns (purchase_event_id, user_id, purchase_ts,
    signup_event_id, signup_ts).
    """
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("purchase_event_id"),
            F.col("user_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    s = (
        signups.withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("signup_event_id"),
            F.col("user_id").alias("s_user_id"),
            F.col("ts").alias("signup_ts"),
        )
    )
    return p.join(
        s,
        (F.col("user_id") == F.col("s_user_id"))
        & (F.col("signup_ts") <= F.col("purchase_ts"))
        & (
            F.col("signup_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}")
        ),
    ).select(
        "purchase_event_id",
        "user_id",
        "purchase_ts",
        "signup_event_id",
        "signup_ts",
    )
