"""Incremental rollup: partials appended per populate batch must merge to
exactly the full recompute, across split incremental runs."""

from __future__ import annotations

from pyspark.sql import functions as F

from changedatacapture_reporting_spark.operators.populate import populate_changelog
from changedatacapture_reporting_spark.operators.rollup import read_rollup
from changedatacapture_reporting_spark.sources.cdc_simulator import (
    SIM_PK,
    simulate_cdc_events,
)


def test_rollup_matches_full_recompute_across_batches(spark, sf_dir, tmp_path):
    events = simulate_cdc_events(spark, sf_dir)
    sink = str(tmp_path / "sink")

    mid = events.agg(F.expr("percentile(lsn, 0.5)")).head()[0]
    populate_changelog(spark, events, sink, SIM_PK, to_lsn=int(mid))
    populate_changelog(spark, events, sink, SIM_PK)

    merged = read_rollup(spark, sink)
    full = (
        spark.read.parquet(sink)
        .withColumn("activity_date", F.to_date("commit_time"))
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
    assert merged.count() == full.count()
    assert merged.exceptAll(full).isEmpty()
    assert full.exceptAll(merged).isEmpty()
    # days split across the two runs must have merged partials (2 rows in)
    raw = spark.read.parquet(f"{sink}/_rollup_daily")
    assert raw.count() > merged.count()
