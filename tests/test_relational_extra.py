"""Bounds/determinism tests for the non-oracle relational queries
(approximate aggregates, sampling)."""

from __future__ import annotations

from pyspark.sql import functions as F

from changedatacapture_reporting_spark.contracts_relational import (
    approx_distinct_stats,
    deterministic_sample,
)
from changedatacapture_reporting_spark.sources.tables import load_table


def test_approx_count_distinct_within_bound(spark, sf_dir):
    """The contract output carries the sketch-accuracy assertion itself
    (estimate within bound of the exact count computed in-query); exact
    counts are cross-checked against an independent aggregation."""
    got = {r.l_returnflag: r for r in approx_distinct_stats(spark, sf_dir).collect()}
    exact = {
        r.l_returnflag: (r.orders, r.parts)
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("orders"),
            F.countDistinct("l_partkey").alias("parts"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for flag, r in got.items():
        assert (r.n_orders, r.n_parts) == exact[flag]
        assert r.orders_est_ok and r.parts_est_ok and r.median_est_ok, flag


def test_sample_is_deterministic_and_bounded(spark, sf_dir):
    s1 = deterministic_sample(spark, sf_dir)
    s2 = deterministic_sample(spark, sf_dir)
    rows1 = {tuple(r) for r in s1.collect()}
    rows2 = {tuple(r) for r in s2.collect()}
    assert rows1 == rows2  # same seed → same sample
    total = load_table(spark, sf_dir, "lineitem").count()
    assert 0.05 * total < len(rows1) < 0.15 * total


def test_sketch_rollup_merge_is_split_invariant(spark, sf_dir):
    """The rollup's reason to exist: sketches built per bucket and
    unioned must estimate the same as a sketch over everything, and an
    incremental append (new day's sketch unioned into the stored rollup)
    must equal rebuilding from scratch."""
    from pyspark.sql import functions as F

    from changedatacapture_reporting_spark.operators.sketches import (
        distinct_sketch_rollup,
        merge_sketch_rollups,
    )
    from changedatacapture_reporting_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    daily = distinct_sketch_rollup(e, "user_id", ["day"])

    whole = distinct_sketch_rollup(e.withColumn("one", F.lit(1)), "user_id", ["one"])
    merged = merge_sketch_rollups(daily, [])
    est_merged = merged.head().estimate
    est_whole = whole.head().estimate
    assert est_merged == est_whole  # same sketch family, same lgK → identical union

    exact = e.select("user_id").distinct().count()
    assert abs(est_merged - exact) <= 0.05 * exact

    # incremental append: rollup(old days) ∪ sketch(new day) == rollup(all)
    days = sorted(r.day for r in daily.select("day").collect())
    cut = days[len(days) // 2]
    old = distinct_sketch_rollup(
        e.filter(F.col("day") < F.lit(cut)), "user_id", ["day"]
    )
    new = distinct_sketch_rollup(
        e.filter(F.col("day") >= F.lit(cut)), "user_id", ["day"]
    )
    appended = merge_sketch_rollups(old.unionByName(new), [])
    assert appended.head().estimate == est_merged


def test_histogram_rollup_merge_is_split_invariant(spark):
    """Adding per-day histograms equals binning the whole table directly
    (exact merge), and the quantile bracket provably contains the true
    percentile."""
    import random

    from changedatacapture_reporting_spark.operators.sketches import (
        fixed_width_histogram,
        histogram_quantiles,
        merge_histograms,
    )

    rng = random.Random(8)
    rows = [
        (f"t{i % 3}", i % 5, rng.uniform(-10, 110)) for i in range(2000)
    ] + [("t0", 0, None), ("t0", 1, 999.0), ("t1", 2, -999.0)]  # clamp+null
    df = spark.createDataFrame(rows, "grp string, day int, v double")

    daily = fixed_width_histogram(df, "v", ["grp", "day"], 0.0, 100.0, 20)
    merged = merge_histograms(daily, ["grp"])
    direct = fixed_width_histogram(df, "v", ["grp"], 0.0, 100.0, 20)
    m = {(r.grp, r.bin): (r.bin_lo, r.bin_hi, r.n) for r in merged.collect()}
    d = {(r.grp, r.bin): (r.bin_lo, r.bin_hi, r.n) for r in direct.collect()}
    assert m == d  # merge is EXACT, not approximately close

    qs = histogram_quantiles(merged, ["grp"], [0.5, 0.95])
    brackets = {(r.grp, r.q): (r.q_lo, r.q_hi) for r in qs.collect()}
    import math

    for grp in ("t0", "t1", "t2"):
        vals = sorted(
            v for g, _, v in rows if g == grp and v is not None
        )
        for q in (0.5, 0.95):
            true_q = vals[math.ceil(q * len(vals)) - 1]
            lo, hi = brackets[(grp, q)]
            # edge bins absorb clamped out-of-range values, so the
            # bottom bracket's true lower bound is -inf and the top
            # bracket's true upper bound is +inf
            lo_eff = float("-inf") if lo <= 0.0 else lo
            hi_eff = float("inf") if hi >= 100.0 else hi
            assert lo_eff <= true_q < hi_eff, (grp, q)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        fixed_width_histogram(df, "v", [], 5.0, 5.0, 10)
    with _pytest.raises(ValueError):
        histogram_quantiles(merged, ["grp"], [0.0])


def test_correlations_contract_pins_values(spark, sf_dir):
    """The driver contract hashes only exact columns + booleans
    (accuracy form, r9); THIS test pins the actual double correlations
    against engine-native F.corr so a wrong value cannot hide behind
    the booleans."""
    import math

    from changedatacapture_reporting_spark.contracts_relational import (
        profile_lineitem_correlations,
    )
    from changedatacapture_reporting_spark.operators.profile import (
        profile_correlations,
    )

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    l = load_table(spark, sf_dir, "lineitem")
    got = {
        (r.col_a, r.col_b): r.corr
        for r in profile_correlations(l, cols).collect()
    }
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    want_row = l.agg(
        *[F.corr(a, b).alias(f"c{i}") for i, (a, b) in enumerate(pairs)]
    ).collect()[0]
    n = l.count()
    for i, (a, b) in enumerate(pairs):
        assert math.isclose(got[(a, b)], want_row[i], abs_tol=2e-6), (a, b)

    contract = profile_lineitem_correlations(spark, sf_dir).collect()
    assert len(contract) == 6
    for r in contract:
        assert r.n_pairs == n
        assert r.corr_defined and r.corr_close, (r.col_a, r.col_b)
