"""Changelog sink maintenance: compaction and retention.

An append-only per-column changelog grows without bound (the reference
leaves this entirely to the DBA — nothing in usp_cdc_* ever deletes).
At 100 TB these are the two maintenance passes a real deployment runs:

- :func:`compact_changelog` — collapse history to the latest change per
  (table, row, column) plus the latest liveness marker per row. Point
  lookups ("what is X now?") stop paying for history.
- :func:`retain_changelog` — keep the full-fidelity tail newer than a
  cutoff, plus a *snapshot floor*: the latest change per (row, column) at
  the cutoff. Reconstruction as of any time ≥ cutoff stays exact while
  storage is bounded by |live state| + |recent tail|.

Both are pure DataFrames (callers decide how to swap the sink directory —
write-new-then-rename, or MERGE on a table format like Delta/Iceberg).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _latest_per(
    log: DataFrame, keys: list[str], order_cols: tuple[str, ...]
) -> DataFrame:
    avail = [c for c in order_cols if c in log.columns]
    ord_key = F.struct(*[F.col(c) for c in avail])
    others = [c for c in log.columns if c not in keys]
    return log.groupBy(*keys).agg(
        *[F.max_by(c, ord_key).alias(c) for c in others]
    )


def compact_changelog(
    log: DataFrame,
    pk_cols: list[str],
    order_cols: tuple[str, ...] = ("commit_time", "lsn", "seq"),
) -> DataFrame:
    """Latest change per (table, row, column) + latest marker per row.

    One hash-aggregate per branch (max_by — no full-history window sort);
    output is the minimal changelog that still reconstructs current state.
    """
    keys = ["table_name", *pk_cols]
    changes = _latest_per(
        log.filter(F.col("column_name").isNotNull()),
        [*keys, "column_name"],
        order_cols,
    )
    markers = _latest_per(
        log.filter(F.col("column_name").isNull()), keys, order_cols
    )
    return changes.unionByName(
        markers.select(*changes.columns), allowMissingColumns=False
    )


def retain_changelog(
    log: DataFrame,
    pk_cols: list[str],
    cutoff: dt.datetime | str,
    order_cols: tuple[str, ...] = ("commit_time", "lsn", "seq"),
) -> DataFrame:
    """Full tail after ``cutoff`` + compacted snapshot floor at ``cutoff``.

    Invariant (tested): ``reconstruct_state(retained, as_of=t)`` equals
    ``reconstruct_state(full, as_of=t)`` for every t ≥ cutoff.
    """
    cut = F.lit(cutoff).cast("timestamp")
    tail = log.filter(F.col("commit_time") > cut)
    floor = compact_changelog(
        log.filter(F.col("commit_time") <= cut), pk_cols, order_cols
    )
    return floor.select(*log.columns).unionByName(tail)
