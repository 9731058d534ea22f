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
