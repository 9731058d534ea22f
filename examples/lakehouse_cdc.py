"""Lakehouse CDC walkthrough — the jar-less Delta protocol surface:

    write a Delta table (spec-conformant _delta_log commits) →
    evolve it (append / atomic overwrite / checkpoint) →
    read any version (time travel) →
    derive CDC events from version transitions (snapshot-diff) →
    populate the engine's changelog incrementally (watermark resume
    IS version resume) → report.

Run:  python examples/lakehouse_cdc.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from changedatacapture_reporting_spark import get_spark
from changedatacapture_reporting_spark.operators.populate import (
    populate_changelog,
)
from changedatacapture_reporting_spark.sources.delta_table import (
    delta_version_events,
    read_delta,
    table_versions,
    write_checkpoint,
    write_delta,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("lakehouse_cdc_demo")
    root = tempfile.mkdtemp(prefix="lakehouse_")
    table, sink = f"{root}/customers_delta", f"{root}/changelog_sink"

    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    k = F.col("c_custkey")

    # v0: initial load; v1: append; v2: atomic overwrite with churn
    write_delta(spark, c.filter(k % 3 == 0), table, timestamp_ms=1_000)
    write_delta(spark, c.filter(k % 3 == 1), table, timestamp_ms=2_000)
    write_delta(
        spark,
        c.filter(k % 3 < 2).withColumn(
            "c_mktsegment",
            F.when(k % 5 == 0, F.lit("MACHINERY")).otherwise(
                F.col("c_mktsegment")
            ),
        ),
        table,
        mode="overwrite",
        timestamp_ms=3_000,
    )
    write_checkpoint(spark, table)
    print("versions:", table_versions(spark, table))
    print("rows @v0:", read_delta(spark, table, version=0).count(),
          "| rows @latest:", read_delta(spark, table).count())

    # data skipping: the commit's per-file stats prune the scan before
    # any task launches; the result is identical to read().filter()
    skipped = read_delta(spark, table, skip=[("c_custkey", "<", 50)])
    print("point-range read via stats skipping:", skipped.count(), "rows")

    # CDC without a change feed: version transitions → events → populate
    ev = delta_version_events(spark, table, ["c_custkey"], table_name="customer")
    r = populate_changelog(spark, ev, sink, ["c_custkey"])
    print(f"populate #1: {r.rows_changed} changelog rows")
    r2 = populate_changelog(
        spark,
        delta_version_events(spark, table, ["c_custkey"], table_name="customer"),
        sink,
        ["c_custkey"],
    )
    print(f"populate #2 (no new commits): {r2.rows_changed} rows")

    log = spark.read.parquet(f"{sink}/table_name=customer")
    log.groupBy("column_name").agg(
        F.count("*").alias("n_changes")
    ).orderBy("column_name").show()

    # object-store deployments: commits go through the pluggable
    # put-if-absent seam. Local/HDFS use the default exclusive-create
    # store; on S3-style stores WITHOUT conditional writes, install a
    # CoordinatedLogStore over any backend with an atomic claim
    # (DynamoDB conditional put, a SQL unique-key insert…) — shown here
    # with the in-memory coordinator:
    from changedatacapture_reporting_spark.logstore import (
        CoordinatedLogStore,
        InMemoryCoordinator,
        set_log_store,
    )

    prev = set_log_store(CoordinatedLogStore(InMemoryCoordinator()))
    try:
        v = write_delta(
            spark, c.filter(k % 3 == 0), table, timestamp_ms=4_000
        )
        print(f"coordinated commit landed at version {v}")
    finally:
        set_log_store(prev)


if __name__ == "__main__":
    main()
