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
  table's key space, the minimum any materialized view needs. No timeout
  is set because evicting a key would forget its liveness; for keyspaces
  with churn-and-expire semantics a TTL variant can pass
  ``GroupStateTimeout.ProcessingTimeTimeout``.
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


def current_state_stream(
    events: DataFrame,
    pk_cols: list[str],
    value_cols: list[str],
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

    def update_fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
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

    return flat.groupBy(*pk_cols).applyInPandasWithState(
        update_fn,
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )
