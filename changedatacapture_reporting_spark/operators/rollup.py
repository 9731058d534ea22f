"""Incremental rollup maintenance — continuous aggregates over the
changelog, maintained in O(batch) instead of recomputed over history.

The reporting queries the reference serves (time-range activity slices,
usp_cdc_query_data.sql:49–57) re-scan the changelog every time. At 100 TB
the standing dashboards want a *maintained* aggregate: each populate batch
appends its PARTIAL aggregates (count/sum per group per day), and readers
merge partials on read — the classic partial-aggregation contract
(sum-of-sums, sum-of-counts), so appends never rewrite history and two
batches touching the same day stay correct.

This is incremental view maintenance for the append-only case: the
changelog never updates or deletes rows (it IS the history), so partial
re-aggregation is exact — no retraction logic needed. Compaction
(re-aggregating the partials file) is optional hygiene, not correctness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from changedatacapture_reporting_spark import fs

ROLLUP_DIR = "_rollup_daily"


def _partials(batch_changelog: DataFrame) -> DataFrame:
    """Per-(table, day) partial aggregates of one populate batch."""
    return (
        batch_changelog.withColumn("activity_date", F.to_date("commit_time"))
        .groupBy("table_name", "activity_date")
        .agg(
            F.count("*").alias("n_changes"),
            F.count(F.when(F.col("column_name").isNotNull(), 1)).alias(
                "n_column_changes"
            ),
            F.count(F.when(F.col("new_value") == "NEW RECORD", 1)).alias(
                "n_inserts"
            ),
            F.count(F.when(F.col("old_value") == "DELETED RECORD", 1)).alias(
                "n_deletes"
            ),
        )
    )


def write_partials(
    batch_changelog: DataFrame, out_dir: str, mode: str = "append"
) -> None:
    """Write one batch's partial aggregates (O(batch) work, tiny output)
    to ``out_dir``. ``populate.commit_batch`` stages partials here before
    its commit point so rollup and changelog advance atomically together."""
    # repartition(1), not coalesce(1): the partials are tiny, and coalesce
    # pays a fixed per-merged-parent-partition cost on local[N]
    _partials(batch_changelog).repartition(1).write.mode(mode).parquet(out_dir)


def write_negative_partials(
    purged_changelog: DataFrame, out_dir: str, mode: str = "append"
) -> None:
    """Retraction partials for rows REMOVED from the sink (GDPR purge,
    ``operators.forget.purge_keys_from_sink``): the same per-(table, day)
    aggregates with every count negated. Counts are algebraic, so
    appending the negation keeps ``read_rollup`` exact without touching
    any historical partial file — the purge commit stays append-only on
    the rollup side even though it rewrites data files."""
    neg = _partials(purged_changelog).select(
        "table_name",
        "activity_date",
        *[
            (-F.col(c)).alias(c)
            for c in (
                "n_changes",
                "n_column_changes",
                "n_inserts",
                "n_deletes",
            )
        ],
    )
    neg.repartition(1).write.mode(mode).parquet(out_dir)


def update_rollup(batch_changelog: DataFrame, sink_path: str) -> None:
    """Direct (non-staged) partial append for standalone use.

    Lives under the sink's ``_rollup_daily`` dir — the underscore keeps it
    invisible to parquet reads of the changelog itself.
    """
    write_partials(batch_changelog, fs.join(sink_path, ROLLUP_DIR))


def read_rollup(spark: SparkSession, sink_path: str) -> DataFrame:
    """Merge partials on read: counts add across batches. The merge input
    is one row per (table, day, batch) — trivially small next to the
    changelog it summarizes."""
    p = spark.read.parquet(fs.join(sink_path, ROLLUP_DIR))
    return p.groupBy("table_name", "activity_date").agg(
        F.sum("n_changes").alias("n_changes"),
        F.sum("n_column_changes").alias("n_column_changes"),
        F.sum("n_inserts").alias("n_inserts"),
        F.sum("n_deletes").alias("n_deletes"),
    )
