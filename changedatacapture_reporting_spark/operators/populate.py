"""Incremental batch populate — entry point 1 of the reference
(``usp_cdc_populate_changelog``, populate:11–16) as a Spark job.

Watermark/resume semantics (SURVEY.md §2.9):

- Reference: resumes from ``COALESCE(MAX(commit_time) + 1 minute,
  min_cdc_time)`` (populate:200–211) and maps times→LSNs with first-load
  inclusivity switching (populate:241–253). The +1-minute hop can silently
  skip changes committed within 60 s after the previous load.
- Ours (default): exact high-watermark on ``lsn`` — each run processes
  ``lsn > last_loaded`` (and ``lsn <= to_lsn`` when a bound is given,
  matching the ``(@from_lsn, @to_lsn]`` window, populate:241). LSN is
  monotone, so the filter prunes parquet row groups via min/max stats.
- ``CompatFlags.legacy_minute_skip`` reproduces the reference behaviour.

The sink is an append-only parquet/Delta-style directory partitioned by
``table_name`` — at 100 TB, partition pruning on table_name plus lsn
row-group stats keeps each incremental run's scan proportional to the new
data, not the history.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from changedatacapture_reporting_spark.config import CompatFlags
from changedatacapture_reporting_spark.operators.changelog import build_changelog


class ValidationError(Exception):
    """Mirrors the reference RAISERROR validations (populate:217–229)."""


@dataclass
class PopulateResult:
    rows_changed: int
    from_lsn: int | None
    to_lsn: int | None


def _sink_watermark(spark: SparkSession, sink_path: str) -> int | None:
    """Highest LSN already loaded (replaces MAX(commit_time)+1min,
    populate:203). Stored as a column in the sink so it survives restarts
    with no side-channel metadata."""
    if not os.path.exists(sink_path):
        return None
    row = spark.read.parquet(sink_path).agg(F.max("lsn")).head()
    return row[0] if row and row[0] is not None else None


def populate_changelog(
    spark: SparkSession,
    events: DataFrame,
    sink_path: str,
    pk_cols: list[str],
    to_lsn: int | None = None,
    flags: CompatFlags | None = None,
) -> PopulateResult:
    """One incremental run: filter new events, build changelog, append.

    ``to_lsn`` mirrors ``@to_date`` → ``@to_lsn`` ('largest less than',
    populate:241): pass None for "HIGHDATE completeness" (readme:24–25).
    Validation: a ``to_lsn`` below the resume point raises, as the
    reference raises when ``@to_date < @from_date`` (populate:217–229).
    """
    flags = flags or CompatFlags()
    last = _sink_watermark(spark, sink_path)

    if flags.legacy_minute_skip and last is not None:
        # reference-faithful: resume from MAX(commit_time)+1min
        prev = spark.read.parquet(sink_path).agg(F.max("commit_time")).head()[0]
        batch = events.filter(
            F.col("commit_ts") >= F.lit(prev) + F.expr("INTERVAL 1 MINUTE")
        )
    elif last is not None:
        batch = events.filter(F.col("lsn") > F.lit(last))
    else:
        batch = events

    if to_lsn is not None:
        if last is not None and to_lsn <= last:
            raise ValidationError(
                "TO date cannot be less than the minimum LSN date / resume point"
            )
        batch = batch.filter(F.col("lsn") <= F.lit(to_lsn))

    changelog = build_changelog(
        batch, pk_cols, flags=flags, carry_cols=["lsn", "seq"]
    )

    (
        changelog.repartition("table_name")
        .sortWithinPartitions("commit_time", *pk_cols, "column_name")
        .write.mode("append")
        .partitionBy("table_name")
        .parquet(sink_path)
    )
    # @@ROWCOUNT analog (populate:399): rows appended by THIS run
    loaded = spark.read.parquet(sink_path)
    if last is not None and not flags.legacy_minute_skip:
        loaded = loaded.filter(F.col("lsn") > F.lit(last))
    return PopulateResult(
        rows_changed=loaded.count(), from_lsn=last, to_lsn=to_lsn
    )
