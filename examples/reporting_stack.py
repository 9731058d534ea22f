"""Standing reporting stack over a CDC changelog — the round-8 operator
family end to end: incremental aggregate maintenance, anomaly
monitoring over the maintained rollup, SCD2 point-in-time enrichment,
and the mergeable events-side summaries (heavy hitters, histogram
quantiles).

Run: python examples/reporting_stack.py  (local[*], sf0.001 fixtures)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from changedatacapture_reporting_spark.operators.changelog import build_changelog
from changedatacapture_reporting_spark.operators.frequent import heavy_hitters
from changedatacapture_reporting_spark.operators.incremental_agg import (
    aggregate_deltas,
    merge_aggregate,
)
from changedatacapture_reporting_spark.operators.profile import activity_anomaly
from changedatacapture_reporting_spark.operators.scd import scd2_history
from changedatacapture_reporting_spark.operators.sketches import (
    fixed_width_histogram,
    histogram_quantiles,
    merge_histograms,
)
from changedatacapture_reporting_spark.operators.temporal import temporal_enrich
from changedatacapture_reporting_spark.session import get_spark
from changedatacapture_reporting_spark.sources.cdc_simulator import (
    SIM_PK,
    simulate_cdc_events,
)
from changedatacapture_reporting_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("reporting-stack-example")
    ev = simulate_cdc_events(spark, SF_DIR)

    # 1. Incremental view maintenance: the per-status aggregate advances
    #    from CDC deltas — the state table is never rescanned.
    pre_state = ev.filter(F.col("op") != "insert").select("before.*")
    agg0 = pre_state.groupBy("status").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("total").cast("long").alias("sum_total"),
    )
    maintained = merge_aggregate(
        agg0, aggregate_deltas(ev, ["status"], {"sum_total": "total"}), ["status"]
    )
    print("maintained per-status aggregate:")
    maintained.orderBy("status").show()

    # 2. Anomaly monitor over the (rollup-sized) daily activity.
    log = build_changelog(ev, SIM_PK, carry_cols=["lsn", "seq"])
    daily = (
        log.withColumn("change_date", F.to_date("commit_time"))
        .groupBy("table_name", "change_date")
        .agg(F.count("*").cast("long").alias("n_changes"))
    )
    anomalies = activity_anomaly(
        daily, ["table_name"], "change_date", "n_changes"
    ).filter("is_anomaly")
    print(f"anomalous ingestion days: {anomalies.count()}")

    # 3. Point-in-time enrichment: probe the SCD2 history at commit times.
    hist = scd2_history(
        build_changelog(
            ev, SIM_PK, carry_cols=["lsn", "seq"], record_insert_images=True
        ),
        SIM_PK,
        ["status", "total"],
    )
    probes = ev.select(
        F.col("after.o_orderkey").alias("o_orderkey"),
        F.col("commit_ts").alias("ts"),
    ).dropna().limit(5)
    print("state at probe times:")
    temporal_enrich(probes, hist, SIM_PK, "ts", ["status", "total"]).show()

    # 4. Events-side mergeable summaries.
    e = load_table(spark, SF_DIR, "events")
    print("heavy hitters (users in >= 2% of events):")
    heavy_hitters(e, "user_id", 0.02).orderBy(F.desc("n")).show(5)
    h = fixed_width_histogram(
        e.withColumn("day", F.to_date("ts")), "value",
        ["event_type", "day"], 0.0, 500.0, 40,
    )
    print("P95 value bracket per event_type (merged daily histograms):")
    histogram_quantiles(
        merge_histograms(h, ["event_type"]), ["event_type"], [0.95]
    ).show()


if __name__ == "__main__":
    main()
