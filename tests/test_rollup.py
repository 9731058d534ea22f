"""Incremental rollup: partials appended per populate batch must merge to
exactly the full recompute, across split incremental runs."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from changedatacapture_reporting_spark.operators.populate import populate_changelog
from changedatacapture_reporting_spark.operators.rollup import read_rollup
from changedatacapture_reporting_spark.sources.cdc_simulator import (
    SIM_PK,
    simulate_cdc_events,
)


@pytest.mark.soak  # randomized/exhaustive sweep - pre-commit gate only
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


def test_activity_anomaly_spike_and_cold_start(spark):
    """A 10x spike after a flat baseline flags; the first 3 days (cold
    start) and a zero-variance baseline never do; the spike day's own
    value is excluded from its baseline."""
    import datetime as dt

    from changedatacapture_reporting_spark.operators.profile import (
        activity_anomaly,
    )

    base = dt.date(2024, 1, 1)
    # flat-ish baseline 100±1 for 7 days, spike 1000 on day 8, back to 100
    vals = [100, 101, 99, 100, 101, 99, 100, 1000, 100]
    rows = [
        ("t", base + dt.timedelta(days=i), v) for i, v in enumerate(vals)
    ] + [("flat", base + dt.timedelta(days=i), 50) for i in range(6)]
    daily = spark.createDataFrame(
        rows, "table_name string, change_date date, n_changes long"
    )
    out = activity_anomaly(
        daily, ["table_name"], "change_date", "n_changes"
    )
    got = {
        (r.table_name, str(r.change_date)): (r.z_score, r.is_anomaly)
        for r in out.collect()
    }
    # cold start: first 3 days have <3 preceding observations
    for i in range(3):
        assert got[("t", str(base + dt.timedelta(days=i)))] == (None, False)
    # spike day: pin the z VALUE (baseline days 0-6: mean 100.0,
    # stddev_samp sqrt(4/6)) — the driver contract hashes only
    # booleans (accuracy form, r9), so the double is pinned here.
    import math

    z7, anom7 = got[("t", str(base + dt.timedelta(days=7)))]
    assert anom7 is True  # spike
    assert math.isclose(z7, 900.0 / math.sqrt(4.0 / 6.0), rel_tol=1e-6)
    # day after the spike: baseline now contains the spike → high stddev
    # → the return to 100 is NOT anomalous
    assert got[("t", str(base + dt.timedelta(days=8)))][1] is False
    # zero-variance baseline → NULL z, never anomalous
    for i in range(3, 6):
        assert got[("flat", str(base + dt.timedelta(days=i)))] == (None, False)


def test_resample_daily_fill_policies(spark):
    """Dense grid spans each key's own [min, max]; zero/locf/null fills
    behave; input duplicates rejected implicitly by precondition (not
    tested — documented); bad policy raises."""
    import datetime as dt

    import pytest as _pytest

    from changedatacapture_reporting_spark.operators.timeseries import (
        resample_daily,
    )

    d = dt.date
    rows = [
        ("a", d(2024, 1, 1), 10),
        ("a", d(2024, 1, 4), 40),   # 2 gap days
        ("b", d(2024, 2, 1), 7),    # single observation → 1-day span
    ]
    df = spark.createDataFrame(rows, "k string, day date, v long")

    zero = {
        (r.k, str(r.day)): (r.v, r.is_observed)
        for r in resample_daily(df, ["k"], "day", ["v"], "zero").collect()
    }
    assert zero == {
        ("a", "2024-01-01"): (10, True),
        ("a", "2024-01-02"): (0, False),
        ("a", "2024-01-03"): (0, False),
        ("a", "2024-01-04"): (40, True),
        ("b", "2024-02-01"): (7, True),
    }

    locf = {
        (r.k, str(r.day)): r.v
        for r in resample_daily(df, ["k"], "day", ["v"], "locf").collect()
    }
    assert locf[("a", "2024-01-02")] == 10 and locf[("a", "2024-01-03")] == 10
    assert locf[("a", "2024-01-04")] == 40

    nulls = {
        (r.k, str(r.day)): r.v
        for r in resample_daily(df, ["k"], "day", ["v"], "null").collect()
    }
    assert nulls[("a", "2024-01-02")] is None

    with _pytest.raises(ValueError):
        resample_daily(df, ["k"], "day", ["v"], "ffill")
