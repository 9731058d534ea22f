"""Streaming exact deduplication — the continuous-ingest side of the
corpus pipeline (:mod:`..operators.corpus`): drop documents/events whose
key was already seen, as they arrive.

Two state regimes, both Spark-native (state lives in the HDFS/RocksDB
state store, snapshotted with the checkpoint — no external KV store):

- unbounded (``within_watermark=None``): ``dropDuplicates`` keeps every
  key forever. Exactly-once per key for the life of the query; state
  grows with |distinct keys| — only for bounded keyspaces.
- watermark-bounded: ``dropDuplicatesWithinWatermark`` keeps a key only
  until the event-time watermark passes its last occurrence + the delay,
  so state is O(keys per watermark horizon) — the 100 TB regime.
  Duplicates farther apart than the horizon re-emit (documented
  trade-off; the batch dedup over the sink catches stragglers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def streaming_dedup(
    stream: DataFrame,
    key_cols: list[str],
    within_watermark: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """First-occurrence-wins dedup on ``key_cols`` over a streaming frame.

    Which physical row is "first" depends on arrival order, so downstream
    contracts should compare the emitted KEY SET (deterministic: exactly
    the distinct keys) rather than non-key columns.
    """
    if within_watermark is not None:
        return stream.withWatermark(
            ts_col, within_watermark
        ).dropDuplicatesWithinWatermark(key_cols)
    return stream.dropDuplicates(key_cols)
