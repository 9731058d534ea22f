"""Incremental batch populate — entry point 1 of the reference
(``usp_cdc_populate_changelog``, populate:11–16) as a Spark job.

Watermark/resume semantics (SURVEY.md §2.9):

- Reference: resumes from ``COALESCE(MAX(commit_time) + 1 minute,
  min_cdc_time)`` (populate:200–211) and maps times→LSNs with first-load
  inclusivity switching (populate:241–253). The +1-minute hop can silently
  skip changes committed within 60 s after the previous load.
- Ours (default): exact high-watermark on ``lsn``, kept PER TABLE — each
  run processes ``lsn > last_loaded(table)`` (and ``lsn <= to_lsn`` when a
  bound is given, matching the ``(@from_lsn, @to_lsn]`` window,
  populate:241). LSN is monotone, so the filter prunes parquet row groups
  via min/max stats.
- ``CompatFlags.legacy_minute_skip`` reproduces the reference behaviour.

Unlike the reference (one proc invocation per table), a single run ingests
a multi-table event stream: watermarks are computed per ``table_name`` (one
small aggregate over the sink, broadcast back against the events), so a
slow table can't hold back or double-load a fast one. The sink is an
append-only parquet directory partitioned by ``(table_name, commit_month)``
— time-range reports prune to the queried months (then to days via
row-group stats, files being commit_time-sorted) and incremental runs
never read history at all: watermarks come from the ``_watermarks``
sidecar (one row per table per run) and ``rows_changed`` from the batch
itself, so a populate run's I/O is proportional to the new data.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from changedatacapture_reporting_spark.config import CompatFlags
from changedatacapture_reporting_spark.operators.changelog import build_changelog


class ValidationError(Exception):
    """Mirrors the reference RAISERROR validations (populate:217–229)."""


@dataclass
class PopulateResult:
    rows_changed: int
    from_lsn: int | None  # max watermark across tables (None on first load)
    to_lsn: int | None


def _meta_path(sink_path: str) -> str:
    # underscore prefix: invisible to parquet directory reads of the sink
    return os.path.join(sink_path, "_watermarks")


def _sink_watermarks(spark: SparkSession, sink_path: str) -> dict[str, int] | None:
    """Per-table highest loaded LSN (replaces MAX(commit_time)+1min,
    populate:203), returned as plain values.

    Read from the ``_watermarks`` sidecar (one tiny row appended per table
    per run) — scanning the changelog itself for MAX(lsn) would read the
    ENTIRE history every run, turning an incremental load into a full-table
    pass at 100 TB. Falls back to the full scan for sinks written before
    the sidecar existed; either source survives restarts with no external
    state.

    Collected to literals deliberately (the map is one entry per SOURCE
    TABLE — small by construction): if the batch plan instead JOINED a
    frame that reads from under the sink, every append this run performs
    (sink, sidecar, rollup) would invalidate the cached batch via Spark's
    recacheByPath and recompute it against the run's OWN new watermark —
    i.e. as empty."""
    meta = _meta_path(sink_path)
    src = meta if os.path.exists(meta) else sink_path
    if not os.path.exists(src):
        return None
    rows = (
        spark.read.parquet(src)
        .groupBy("table_name")
        .agg(F.max("lsn").alias("_wm_lsn"))
        .collect()
    )
    return {r.table_name: r._wm_lsn for r in rows} or None


def populate_changelog(
    spark: SparkSession,
    events: DataFrame,
    sink_path: str,
    pk_cols: list[str],
    to_lsn: int | None = None,
    flags: CompatFlags | None = None,
    maintain_rollup: bool = True,
) -> PopulateResult:
    """One incremental run: filter new events per table, build changelog,
    append.

    ``to_lsn`` mirrors ``@to_date`` → ``@to_lsn`` ('largest less than',
    populate:241): pass None for "HIGHDATE completeness" (readme:24–25).
    Validation: a ``to_lsn`` below the resume point raises, as the
    reference raises when ``@to_date < @from_date`` (populate:217–229,
    416–422). ``CompatFlags.swallow_errors`` reproduces the reference's
    TRY/CATCH that reports any failure as "No changes were detected"
    (populate:401–409) — default False: failures surface.
    """
    flags = flags or CompatFlags()
    try:
        return _populate(
            spark, events, sink_path, pk_cols, to_lsn, flags, maintain_rollup
        )
    except Exception:
        if flags.swallow_errors:
            # reference-faithful ST5: any error → "No changes were detected"
            return PopulateResult(rows_changed=0, from_lsn=None, to_lsn=to_lsn)
        raise


def _populate(
    spark: SparkSession,
    events: DataFrame,
    sink_path: str,
    pk_cols: list[str],
    to_lsn: int | None,
    flags: CompatFlags,
    maintain_rollup: bool = True,
) -> PopulateResult:
    wm = _sink_watermarks(spark, sink_path)
    max_wm: int | None = max(wm.values()) if wm else None

    if flags.legacy_minute_skip and wm is not None:
        # reference-faithful: resume from MAX(commit_time)+1min (global —
        # the reference is single-table per invocation)
        prev = spark.read.parquet(sink_path).agg(F.max("commit_time")).head()[0]
        batch = events.filter(
            F.col("commit_ts") >= F.lit(prev) + F.expr("INTERVAL 1 MINUTE")
        )
    elif wm is not None:
        # literal per-table thresholds (no file-source dependency — see
        # _sink_watermarks); unknown tables pass through as first-load
        wm_col = F.create_map(
            *[F.lit(x) for kv in wm.items() for x in kv]
        )[F.col("table_name")]
        batch = events.filter(wm_col.isNull() | (F.col("lsn") > wm_col))
    else:
        batch = events

    if to_lsn is not None:
        if max_wm is not None and to_lsn <= max_wm:
            raise ValidationError(
                "TO date cannot be less than the minimum LSN date / resume point"
            )
        batch = batch.filter(F.col("lsn") <= F.lit(to_lsn))

    # month granularity: day-level dirs explode into thousands of tiny
    # partitions on historical backfills (measured: a 7-year fixture made
    # a 1005-task scan); months keep directory counts sane and day-level
    # pruning still happens via row-group min/max stats, because files are
    # sorted by commit_time within each partition
    changelog = build_changelog(
        batch, pk_cols, flags=flags, carry_cols=["lsn", "seq"]
    ).withColumn("commit_month", F.trunc("commit_time", "month"))

    # one computation of the batch serves the write, @@ROWCOUNT
    # (populate:399), AND the watermark sidecar — re-reading the sink to
    # count "rows newer than the pre-run watermark" would scan all history
    changelog.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        per_table = (
            changelog.groupBy("table_name")
            .agg(F.max("lsn").alias("lsn"), F.count("*").alias("n_rows"))
            .collect()
        )
        rows_changed = sum(r.n_rows for r in per_table)
        if rows_changed:
            (
                changelog.repartition("table_name", "commit_month")
                .sortWithinPartitions("commit_time", *pk_cols, "column_name")
                .write.mode("append")
                .partitionBy("table_name", "commit_month")
                .parquet(sink_path)
            )
            spark.createDataFrame(
                [(r.table_name, r.lsn) for r in per_table],
                "table_name string, lsn long",
            ).coalesce(1).write.mode("append").parquet(_meta_path(sink_path))
            if maintain_rollup:
                # continuous aggregate: O(batch) partials over the already-
                # persisted frame (operators.rollup merges them on read)
                from changedatacapture_reporting_spark.operators.rollup import (
                    update_rollup,
                )

                update_rollup(changelog, sink_path)
    finally:
        changelog.unpersist()
    return PopulateResult(
        rows_changed=rows_changed, from_lsn=max_wm, to_lsn=to_lsn
    )
