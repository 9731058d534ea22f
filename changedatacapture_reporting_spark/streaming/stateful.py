"""Custom stateful streaming operator: a continuously-maintained current-state
view of the source table, driven by the CDC event stream.

The reference's changelog is write-only history; its users rebuild current
row state by hand (we provide the batch form in
``operators.reconstruct.reconstruct_state``). This is the *streaming*
form: ``applyInPandasWithState`` keeps one state record per primary key —
the latest (lsn, seq) applied, liveness, and the last row image — and on
every micro-batch emits the keys whose state changed. Downstream it is an
upsert feed for a serving store (the Debezium "read model" pattern).

Scale design (100 TB):
- State is O(live keys), NOT O(events): exactly the size of the source
  table's key space, the minimum any materialized view needs. Budget it
  explicitly: bytes/key ≈ 60 B fixed (lsn, seq, liveness, key hash) +
  the string row image (sum of value-column lengths). At 1e9 live keys ×
  ~200 B that is ~200 GB of state — spread over executors by the groupBy
  hash, so size executor memory (or the RocksDB state store) for
  ``keys × bytes_per_key / executors`` and monitor the real figure via
  :func:`state_metrics` (``memoryUsedBytes`` / ``numRowsTotal``).
- By default no timeout is set, because evicting a key forgets its
  liveness (a delete tombstone must outlive quiet periods). For keyspaces
  with churn-and-expire semantics pass ``ttl_minutes``: keys idle longer
  are evicted via ``ProcessingTimeTimeout``, bounding state at
  O(keys active within the TTL window) — an eviction is indistinguishable
  from "never seen", so a late event for an evicted key re-opens it as a
  fresh row (document this trade with your consumers).
  TERMINATION caveat: a TTL query never reads as idle (the processing-
  time timer keeps scheduling batches), so ``trigger(availableNow=True)``
  does NOT self-terminate and ``processAllAvailable()`` blocks forever.
  The TTL form is for CONTINUOUS queries; for a bounded drain use the
  no-TTL form, or poll your sink for the expected data and ``stop()``
  the query explicitly (see tests/test_streaming.py's TTL test).
- Arrival order is irrelevant: a monotonic (lsn, seq) guard makes the
  operator last-writer-wins by commit position, so replays, cross-batch
  reordering, and at-least-once sources converge to the same state.
- Per-batch work is vectorized: only the max-(lsn, seq) row per key is
  applied (full after-images make earlier rows in the batch redundant),
  so the Python cost is O(batch rows) filtering + one row materialized
  per changed key.

Event model cite: usp_cdc_populate_changelog.sql:319 (the CDC stream this
consumes); __$seqval ordering gap at populate:340–364 is handled here by
including ``seq`` in the guard.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from changedatacapture_reporting_spark.schema import OP_DELETE


def state_metrics(query) -> list[dict]:
    """Operational view of a running query's state budget: one dict per
    stateful operator from the last progress report —
    ``numRowsTotal`` (live keys), ``numRowsUpdated``, ``memoryUsedBytes``
    (the number to alert on vs the per-executor budget above). Empty
    until the first batch completes."""
    progress = query.lastProgress
    if not progress:
        return []
    return [
        {
            "operator": op.get("operatorName", "state"),
            "num_keys": op.get("numRowsTotal"),
            "num_updated": op.get("numRowsUpdated"),
            "num_removed": op.get("numRowsRemoved"),
            "memory_used_bytes": op.get("memoryUsedBytes"),
        }
        for op in progress.get("stateOperators", [])
    ]


def current_state_stream(
    events: DataFrame,
    pk_cols: list[str],
    value_cols: list[str],
    ttl_minutes: int | None = None,
) -> DataFrame:
    """Streaming per-key current state over a CDC event stream.

    Input: the standard event frame ``struct<lsn, seq, commit_ts, op,
    table_name, before, after>`` (streaming). Output (update mode): one row
    per key whose state changed in the micro-batch — pk cols + last row
    image (string-typed, matching the changelog's type erasure) +
    ``is_live`` + ``as_of_lsn``. A delete emits ``is_live = false`` with
    the last-known image retained (tombstone with context).
    """
    vcols = [f"v_{i}" for i in range(len(value_cols))]
    flat = events.select(
        *[
            F.coalesce(F.col(f"after.{c}"), F.col(f"before.{c}"))
            .cast("string")
            .alias(c)
            for c in pk_cols
        ],
        "lsn",
        "seq",
        "op",
        *[
            F.col(f"after.{c}").cast("string").alias(v)
            for c, v in zip(value_cols, vcols)
        ],
    )

    out_schema = T.StructType(
        [T.StructField(c, T.StringType()) for c in pk_cols]
        + [T.StructField(c, T.StringType()) for c in value_cols]
        + [
            T.StructField("is_live", T.BooleanType()),
            T.StructField("as_of_lsn", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("lsn", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("live", T.BooleanType()),
            T.StructField("image", T.ArrayType(T.StringType())),
        ]
    )

    def _clean(v: Any) -> Any:
        return None if v is None or pd.isna(v) else v

    ttl_ms = ttl_minutes * 60_000 if ttl_minutes else None

    def update_fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if ttl_ms and state.hasTimedOut:
            # idle past the TTL: evict — bounds state to keys active
            # within the window; a later event re-opens the key fresh
            state.remove()
            return
        if state.exists:
            lsn, seq, live, image = state.get
            image = list(image)
        else:
            lsn, seq, live, image = -1, -1, False, [None] * len(vcols)
        changed = False
        for pdf in pdfs:
            newer = pdf[(pdf["lsn"] > lsn) | ((pdf["lsn"] == lsn) & (pdf["seq"] > seq))]
            if newer.empty:
                continue
            # full after-images ⇒ only the latest row per key matters
            last = newer.sort_values(["lsn", "seq"]).iloc[-1]
            lsn, seq = int(last["lsn"]), int(last["seq"])
            if last["op"] == OP_DELETE:
                live = False
            else:
                live = True
                image = [_clean(last[v]) for v in vcols]
            changed = True
        if changed:
            state.update((lsn, seq, live, image))
            yield pd.DataFrame(
                [[*key, *image, live, lsn]],
                columns=[*pk_cols, *value_cols, "is_live", "as_of_lsn"],
            )
        if ttl_ms and (changed or state.exists):
            state.setTimeoutDuration(ttl_ms)  # re-arm on any activity

    return flat.groupBy(*pk_cols).applyInPandasWithState(
        update_fn,
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms
        else GroupStateTimeout.NoTimeout,
    )
