"""Streaming analytics over the event stream (SURVEY.md §2.13): watermarked
tumbling/sliding windows, session windows, stateful dedup.

These are the true-streaming counterparts of the batch analogs in
contracts_relational (events_tumbling_5min / events_sessionization) —
tests drive both over the same data and assert agreement, which is this
engine's replacement for the reference's nonexistent streaming tests.

Watermarks bound state: at 100 TB/day the window state is
O(active windows × groups), not O(events), and late events beyond the
watermark are dropped deterministically (the reference simply errors on
out-of-range dates, ST4 — a watermark is the principled version).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling-window counts/sums per event_type."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding windows — each event lands in window/slide buckets."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def streaming_sessions(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based session windows per user (``session_window`` — the
    streaming-native form of the batch lag+cumsum sessionization)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def enriched_segment_counts(
    events: DataFrame,
    dim: DataFrame,
    on: tuple[str, str] = ("user_id", "c_custkey"),
    segment_col: str = "c_mktsegment",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Stream-static enrichment: join the event stream to a broadcast
    dimension, then windowed aggregation per dimension attribute — the
    canonical streaming star-join. A stream-static inner join is
    STATELESS in Structured Streaming (the static side is broadcast per
    micro-batch, no join state accumulates), so total state stays
    O(active windows × segments) regardless of stream length."""
    left, right = on
    enriched = events.join(
        F.broadcast(dim.select(right, segment_col)),
        F.col(left) == F.col(right),
    )
    return (
        enriched.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), segment_col)
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col(segment_col).alias("segment"),
            "n_events",
            "sum_value",
        )
    )


def stateful_dedup(
    events: DataFrame,
    keys: list[str],
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps each key's state only until the
    watermark passes — the streaming analog of hash-groupBy dedup that a
    100 TB/day ingest needs (unbounded dropDuplicates state would OOM)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )
