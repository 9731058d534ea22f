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

PHYSICAL maintenance, sharing the sink commit protocol
(:mod:`.populate`):

- :func:`compact_sink_files` — merge the small files per-batch appends
  accumulate inside a ``(table_name, commit_month)`` partition into a few
  sorted files, swapped in atomically (staged + ``_COMMIT_REPLACE``
  marker; a crash on either side of the marker is healed by
  ``recover_sink``). Content-preserving: same rows, fewer files, restored
  commit_time sort order → row-group pruning quality actually improves
  as history compacts.
- :func:`expire_changelog_months` — partition-drop retention: delete
  whole month dirs older than a cutoff. O(#dirs) metadata work, no data
  read — the only retention shape that is practical at 100 TB. Pair with
  :func:`retain_changelog` first (append a compacted snapshot floor) if
  point-in-time reconstruction must stay exact at the boundary; rollup
  partials and watermarks are deliberately untouched (the maintained
  aggregate keeps reporting on expired months; lsn watermarks are maxima
  and never regress).

Single-maintenance-writer assumption (like every file-format sink
without a transactional catalog): don't run compaction concurrently
with itself. Concurrent populate appends to a partition being compacted
are structurally safe — the swap deletes only the snapshot the rewrite
consumed (the marker's old-generation manifest), never "whatever else
is there" — though on object stores without atomic rename a reader can
observe a transient partial swap; use a table format there.
"""

from __future__ import annotations

import datetime as dt
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from changedatacapture_reporting_spark import fs


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
    """Minimal changelog that still reconstructs current state: the
    whole log folded through the epoch-correct fold
    (operators.compaction.compact_changelog with no boundary), dead rows
    kept as single tombstones so downstream state MERGES still see the
    deletion.

    Earlier rounds kept the naive "latest change per (row, column) +
    latest marker per row" shape; that resurrects dead-epoch values
    when a delete → re-insert leaves a column unwritten in the new
    epoch (the re-insert marker displaces the delete marker, so the
    stale column row — written before the delete — survives compaction
    and reconstructs as live; regression-tested in
    tests/test_compaction.py). The shared fold filters per-column
    entries against the row's last delete position instead.
    """
    from changedatacapture_reporting_spark.operators.compaction import (
        compact_changelog as _fold,
    )

    return _fold(
        log, ["table_name", *pk_cols],
        order_cols=order_cols, keep_tombstones=True,
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
    from changedatacapture_reporting_spark.operators.compaction import (
        compact_changelog as _fold,
    )

    return _fold(
        log, ["table_name", *pk_cols],
        upto_time=cutoff, order_cols=order_cols, keep_tombstones=True,
    )


def _sink_partitions(
    spark: SparkSession, sink_path: str
) -> list[tuple[str, str]]:
    """(table_name=... , commit_month=...) leaf dirs of the sink."""
    out = []
    for t in fs.listdir(spark, sink_path):
        if not t.startswith("table_name="):
            continue
        for m in fs.listdir(spark, fs.join(sink_path, t)):
            if m.startswith("commit_month="):
                out.append((t, m))
    return out


def compact_sink_files(
    spark: SparkSession,
    sink_path: str,
    pk_cols: list[str],
    max_files: int = 4,
    target_files: int = 1,
) -> dict[str, int]:
    """Merge small files inside sink partitions that have accumulated
    more than ``max_files`` data files (each populate batch appends at
    least one file per touched partition, so a busy month fragments over
    time; parquet scan cost and footer pressure grow with file count).

    Per selected partition: snapshot its file listing, read EXACTLY
    those files, restore the global ``(commit_time, pk…, column_name)``
    sort, write ``target_files`` files to staging, verify row counts,
    then commit with a ``_COMMIT_REPLACE`` marker and swap atomically
    (``populate._publish_replace`` — crash-healed by ``recover_sink``
    from either side of the marker). The marker carries the snapshot
    (the old generation) as its manifest, so the swap deletes only what
    was compacted — a file a concurrent populate appends meanwhile is
    neither lost nor duplicated. Content-preserving by construction and
    verified by count before the marker is written.

    Returns ``{"partitions_compacted": n, "files_before": a,
    "files_after": b}``.
    """
    from changedatacapture_reporting_spark.operators.populate import (
        REPLACE_MARKER,
        STAGING_ROOT,
        _publish_replace,
        sink_write_options,
    )

    selected = []
    old_generation: list[str] = []
    for t, m in _sink_partitions(spark, sink_path):
        part = fs.join(sink_path, t, m)
        names = fs.list_data_files(spark, part)
        if len(names) > max_files:
            selected.append((t, m, part, names))
            old_generation += [f"{t}/{m}/{name}" for name in names]
    if not selected:
        return {
            "partitions_compacted": 0,
            "files_before": 0,
            "files_after": 0,
        }

    run_id = "compact-" + uuid.uuid4().hex
    staging = fs.join(sink_path, STAGING_ROOT, run_id)
    sort_cols = [c for c in ("commit_time", *pk_cols, "column_name")]
    for t, m, part, names in selected:
        # explicit file list (not the dir): the staged rewrite holds
        # exactly the snapshot the manifest will delete
        df = spark.read.parquet(*[fs.join(part, name) for name in names])
        staged_part = fs.join(staging, "data", t, m)
        (
            df.repartition(target_files)
            .sortWithinPartitions(*sort_cols)
            .write.mode("overwrite")
            .options(**sink_write_options())  # keep pk bloom filters
            .parquet(staged_part)
        )
        # content preservation gate before the commit marker
        if spark.read.parquet(staged_part).count() != df.count():
            fs.delete(spark, staging)
            raise RuntimeError(f"compaction row-count mismatch in {part}")

    # commit point: one marker write; its content is the old-generation
    # manifest recovery needs to finish the swap without guessing
    fs.write_text(
        spark, fs.join(staging, REPLACE_MARKER), "\n".join(old_generation)
    )
    _publish_replace(spark, staging, sink_path)

    files_after = sum(
        len(fs.list_data_files(spark, part)) for _t, _m, part, _n in selected
    )
    return {
        "partitions_compacted": len(selected),
        "files_before": len(old_generation),
        "files_after": files_after,
    }


def expire_changelog_months(
    spark: SparkSession, sink_path: str, keep_from: str
) -> dict[str, int]:
    """Partition-drop retention: delete every ``commit_month`` dir
    strictly older than ``keep_from`` (an ISO month/date string, e.g.
    ``"2024-02-01"``). Metadata-only (no data read), monotone and
    idempotent — a crash mid-way is finished by re-running.

    Reconstruction fidelity before the cutoff is gone by design; append
    a :func:`retain_changelog` snapshot floor FIRST when "state as of
    the cutoff" must remain answerable.
    """
    cutoff = dt.date.fromisoformat(keep_from).replace(day=1)
    dropped = kept = 0
    for t, m in _sink_partitions(spark, sink_path):
        month = dt.date.fromisoformat(m.split("=", 1)[1])
        if month < cutoff:
            fs.delete(spark, fs.join(sink_path, t, m))
            dropped += 1
        else:
            kept += 1
    return {"months_dropped": dropped, "months_kept": kept}


def expire_delta_months(
    spark: SparkSession, sink_path: str, keep_from: str
) -> dict[str, int]:
    """Partition-drop retention for the DELTA-format changelog sink
    (populate_changelog(sink_format="delta")): one metadata-only commit
    removing every live add whose ``commit_month`` partition value is
    strictly older than ``keep_from`` — no data read, no files
    rewritten, and (unlike the parquet sink's directory delete) the
    expired months stay TIME-TRAVELABLE until vacuum_delta reclaims
    them past the retention window. The same O(#files-metadata) shape
    real lakehouse retention jobs use at 100 TB.

    Returns {"months_dropped", "months_kept", "files_removed",
    "version"} (version None when nothing is old enough).
    """
    from changedatacapture_reporting_spark.sources.delta_table import (
        _commit_swap,
        _resolve_log,
    )

    cutoff = dt.date.fromisoformat(keep_from).replace(day=1)
    state = _resolve_log(spark, sink_path, None)
    old_adds, months_old, months_kept = [], set(), set()
    for a in state["files"].values():
        pv = a.get("partitionValues") or {}
        m = pv.get("commit_month")
        if m is None:
            continue
        month = dt.date.fromisoformat(m)
        if month < cutoff:
            old_adds.append(a)
            months_old.add(m)
        else:
            months_kept.add(m)
    if not old_adds:
        return {
            "months_dropped": 0,
            "months_kept": len(months_kept),
            "files_removed": 0,
            "version": None,
        }
    actions = [
        {
            "remove": {
                "path": a["path"],
                "deletionTimestamp": 0,
                "dataChange": True,
            }
        }
        for a in old_adds
    ]
    version = _commit_swap(
        spark, sink_path, actions, old_adds, None, "expire_months"
    )
    return {
        "months_dropped": len(months_old),
        "months_kept": len(months_kept),
        "files_removed": len(old_adds),
        "version": version,
    }
