"""Heavy hitters: the two-pass MG-sketch-then-verify output must be
byte-identical to the naive GROUP BY … HAVING — including under forced
tiny Arrow batches, where the per-batch prune path actually executes."""

from __future__ import annotations

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from changedatacapture_reporting_spark.operators.frequent import (
    _prune_counts,
    heavy_hitters,
)


def _exact(df, col, frac):
    n = df.filter(F.col(col).isNotNull()).count()
    import math

    t = int(math.ceil(frac * n))
    return {
        (r.item, r.n)
        for r in df.select(F.col(col).alias("item"))
        .filter(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.count("*").cast("long").alias("n"))
        .filter(F.col("n") >= t)
        .collect()
    }


@pytest.fixture()
def tiny_batches(spark):
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "50")
    yield
    if old is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, old)


def test_prune_counts_is_mg_merge():
    c = pd.Series({"a": 10, "b": 7, "c": 3, "d": 2, "e": 1}).sort_values(
        ascending=False
    )
    got = _prune_counts(c, 2)  # d = 3rd largest = 3
    assert got.to_dict() == {"a": 7, "b": 4}
    assert _prune_counts(c, 5).to_dict() == c.to_dict()  # no prune needed


@pytest.mark.soak  # randomized/exhaustive sweep - pre-commit gate only
def test_heavy_hitters_exact_under_skew(spark, tiny_batches):
    """Zipf-ish skew + a long singleton tail, 4 partitions, 50-row Arrow
    batches → every batch prunes; the result must still equal the naive
    HAVING query exactly (items AND counts)."""
    rng = random.Random(8)
    vals = (
        ["h1"] * 300
        + ["h2"] * 120
        + ["m1"] * 60
        + [f"t{i}" for i in range(500)]
        + [None] * 25
    )
    rng.shuffle(vals)
    df = spark.createDataFrame(
        [(v,) for v in vals], "item_col string"
    ).repartition(4)

    for frac in (0.05, 0.1, 0.3):
        got = {
            (r.item, r.n)
            for r in heavy_hitters(df, "item_col", frac).collect()
        }
        assert got == _exact(df, "item_col", frac), frac
    # sanity: the 0.1 run keeps exactly the two real heavy hitters
    assert {i for i, _ in _exact(df, "item_col", 0.1)} == {"h1", "h2"}


def test_heavy_hitters_long_items_and_empty(spark, tiny_batches):
    df = spark.createDataFrame(
        [(i % 7,) for i in range(700)] + [(None,)], "k long"
    ).repartition(3)
    got = {(r.item, r.n) for r in heavy_hitters(df, "k", 0.14).collect()}
    assert got == _exact(df, "k", 0.14) == {(i, 100) for i in range(7)}
    # threshold above every count → empty frame with the right schema
    out = heavy_hitters(df, "k", 0.99)
    assert out.count() == 0 and out.columns == ["item", "n"]


def test_heavy_hitters_rejects_bad_params(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        heavy_hitters(df, "k", 0.0)
    with pytest.raises(ValueError):
        heavy_hitters(df, "k", 0.5, candidate_factor=1.0)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@given(
    counts=st.lists(
        st.tuples(st.integers(0, 30), st.integers(1, 40)), max_size=12
    ),
    frac=st.sampled_from([0.02, 0.05, 0.1, 0.25]),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@pytest.mark.soak  # randomized/exhaustive sweep - pre-commit gate only
def test_heavy_hitters_random_distributions(spark, tiny_batches, counts, frac):
    """Random multiplicity profiles under forced 50-row Arrow batches:
    the two-pass result equals the naive HAVING query for every drawn
    threshold."""
    vals = [f"v{i}" for i, n in counts for _ in range(n)]
    if not vals:
        return
    df = spark.createDataFrame(
        [(v,) for v in vals], "item_col string"
    ).repartition(3)
    got = {
        (r.item, r.n) for r in heavy_hitters(df, "item_col", frac).collect()
    }
    assert got == _exact(df, "item_col", frac), (counts, frac)


def test_heavy_hitters_one_pass_mode(spark, tiny_batches):
    """exact=False: one scan, every true heavy hitter present, weights
    undercount by at most N/k, and the exact pass over its candidate
    list reproduces the exact result."""
    vals = ["h1"] * 300 + ["h2"] * 120 + [f"t{i}" for i in range(400)]
    df = spark.createDataFrame(
        [(v,) for v in vals], "item_col string"
    ).repartition(4)
    n_total = len(vals)
    frac = 0.1
    import math

    k = math.ceil(2.0 / frac)
    approx = {
        r.item: r.n
        for r in heavy_hitters(df, "item_col", frac, exact=False).collect()
    }
    exact = dict(_exact(df, "item_col", frac))
    assert set(exact) <= set(approx)  # no true heavy hitter missed
    for item, true_n in exact.items():
        assert true_n - n_total / k <= approx[item] <= true_n
