"""plans.* utilities: explain assertions + salted aggregation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from changedatacapture_reporting_spark.plans import (
    assert_broadcast_join,
    assert_no_python_eval,
    assert_pushed_filter,
    salted_aggregate,
)
from changedatacapture_reporting_spark.sources.tables import load_table


def test_assert_helpers_pass_and_fail(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") > 100)
    assert_pushed_filter(o, "GreaterThan(o_orderkey,100)")
    assert_no_python_eval(o)
    with pytest.raises(AssertionError):
        assert_pushed_filter(o, "GreaterThan(o_orderkey,999999)")
    with pytest.raises(AssertionError):
        assert_broadcast_join(o)


def test_salted_aggregate_matches_plain(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    salted = salted_aggregate(
        o,
        ["o_orderstatus"],
        {
            "n": ("count", "*"),
            "max_key": ("max", "o_orderkey"),
            "min_key": ("min", "o_orderkey"),
            "sum_floor": ("sum", "o_orderkey"),
        },
    )
    plain = o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.max("o_orderkey").alias("max_key"),
        F.min("o_orderkey").alias("min_key"),
        F.sum("o_orderkey").alias("sum_floor"),
    )
    assert {tuple(r) for r in salted.collect()} == {
        tuple(r) for r in plain.collect()
    }


def test_recommend_sizing_scales_with_input():
    from changedatacapture_reporting_spark.plans.tuning import recommend_sizing

    small = recommend_sizing(100 * 1024 * 1024, cores=32)
    assert small.shuffle_partitions == 32  # floor at full parallelism

    big = recommend_sizing(1024**4, cores=32)  # 1 TB
    assert big.shuffle_partitions >= 8000  # ~128MB reduce partitions
    assert big.shuffle_partitions % 32 == 0  # whole waves

    exploding = recommend_sizing(
        1024**4, cores=32, shuffle_amplification=3.0
    )
    assert exploding.shuffle_partitions > big.shuffle_partitions


def test_salted_aggregate_rejects_nondecomposable(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    with pytest.raises(ValueError):
        salted_aggregate(o, ["o_orderstatus"], {"d": ("countDistinct", "x")})


def test_salted_join_equals_plain_join(spark):
    """Heavily skewed left side (one key holds half the rows): the
    salted join returns exactly the plain join's multiset for inner and
    left-outer (unmatched left rows exactly once, nulls on the right);
    bad params raise."""
    import pytest as _pytest

    from changedatacapture_reporting_spark.plans.skew import salted_join

    left_rows = [(1, i) for i in range(500)] + [
        (k, 1000 + k) for k in range(2, 60)
    ] + [(999, 0)]  # 999 unmatched
    right_rows = [(1, "hot"), (2, "a"), (3, "b"), (3, "b2")]  # dup right key
    left = spark.createDataFrame(left_rows, "k long, v long").repartition(8)
    right = spark.createDataFrame(right_rows, "k long, lbl string")

    for how in ("inner", "left"):
        got = sorted(
            (r.k, r.v, r.lbl)
            for r in salted_join(left, right, ["k"], 8, how).collect()
        )
        want = sorted(
            (r.k, r.v, r.lbl) for r in left.join(right, ["k"], how).collect()
        )
        assert got == want, how

    with _pytest.raises(ValueError):
        salted_join(left, right, ["k"], 8, "full")
    with _pytest.raises(ValueError):
        salted_join(left, right, ["k"], 1)


def test_fuzzy_match_blocking_and_distance(spark):
    """Linkage finds within-cap pairs inside blocks, misses cross-block
    pairs (documented recall tradeoff), length band never drops a
    true match, no cross join in the plan."""
    import pytest as _pytest

    from changedatacapture_reporting_spark.operators.linkage import fuzzy_match

    left = spark.createDataFrame(
        [(1, "Acme Corp"), (2, "Bravo Ltd"), (3, "zeta")],
        "id long, name string",
    )
    right = spark.createDataFrame(
        [(10, "ACME Corp"),   # case-only → distance 0
         (11, "Acme Crop"),  # transposition → distance 2
         (12, "Bravo Ltd"),  # exact
         (13, "cravo Ltd"),  # first-char edit → OUT OF BLOCK, missed
         (14, "zetaxx")],    # distance 2 but length band ok at cap 2
        "id long, name string",
    )
    out = {
        (r.left_id, r.right_id): r.distance
        for r in fuzzy_match(
            left, right, "id", "id", "name", "name", max_distance=2
        ).collect()
    }
    assert out == {(1, 10): 0, (1, 11): 2, (2, 12): 0, (3, 14): 2}

    plan = fuzzy_match(
        left, right, "id", "id", "name", "name"
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    with _pytest.raises(ValueError):
        fuzzy_match(left, right, "id", "id", "name", "name", max_distance=-1)


def test_profile_correlations_one_scan_and_values(spark):
    import math

    import pytest as _pytest

    from changedatacapture_reporting_spark.operators.profile import (
        profile_correlations,
    )

    rows = [(float(i), 2.0 * i + 1, float(-i), 5.0) for i in range(50)]
    df = spark.createDataFrame(rows, "a double, b double, c double, d double")
    out = {(r.col_a, r.col_b): r.corr
           for r in profile_correlations(df, ["a", "b", "c", "d"]).collect()}
    assert out[("a", "b")] == 1.0          # perfect linear
    assert out[("a", "c")] == -1.0         # perfect inverse
    assert out[("a", "d")] is None         # zero variance → undefined
    assert math.isclose(out[("b", "c")], -1.0)
    assert len(out) == 6                   # each unordered pair once

    # pairwise-complete semantics under DIFFERENT null patterns
    # (ADVICE r8 high): stddevs must be restricted to rows where the
    # OTHER column is non-null too, matching F.corr exactly.
    nrows = [
        (1.0, 1.0), (2.0, 2.0), (3.0, 3.0),
        (None, 1000.0), (None, -950.0),
    ]
    ndf = spark.createDataFrame(nrows, "a double, b double")
    got = profile_correlations(ndf, ["a", "b"]).collect()[0].corr
    want = ndf.agg(F.corr("a", "b")).collect()[0][0]
    assert math.isclose(got, want, abs_tol=1e-6)
    assert math.isclose(got, 1.0)          # pairwise-complete rows are linear

    plan = profile_correlations(df, ["a", "b"])._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.count("Scan") <= 2         # single aggregate pass

    with _pytest.raises(ValueError):
        profile_correlations(df, ["a"])
    with _pytest.raises(ValueError):
        profile_correlations(df, ["a", "a"])
