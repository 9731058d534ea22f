"""Equivalence proof for the int64 fixed-point exact dot product
(VERDICT r14 #9): ``dot_decimal_int64`` must be BIT-IDENTICAL to
``dot_decimal`` — same decimal(38,12) values, same string rendering —
on the fixture embeddings and on adversarial inputs (grid ties,
negatives, zeros, out-of-bound magnitudes that exercise the fallback,
NaN/Inf whose decimal-cast semantics differ)."""

from __future__ import annotations

from pyspark.sql import functions as F

from changedatacapture_reporting_spark.functions.vectors import (
    dot_decimal,
    dot_decimal_int64,
)


def _compare(spark, rows):
    df = spark.createDataFrame(
        rows, "a array<float>, b array<float>"
    )
    out = df.select(
        dot_decimal(F.col("a"), F.col("b"))
        .cast("string")
        .alias("dec"),
        dot_decimal_int64(F.col("a"), F.col("b"))
        .cast("string")
        .alias("i64"),
    ).collect()
    for r in out:
        assert r["dec"] == r["i64"], (r["dec"], r["i64"])
    return [r["dec"] for r in out]


def test_dot_int64_adversarial_values(spark):
    tie_ish = [
        0.0000005,  # shortest-repr landing near a 1e-6 tie
        1.0000005,
        -0.0000015,
        0.1234565,
        2.5e-7,
        -2.5e-7,
        99.999999,  # at the int64-path magnitude boundary
        -99.999999,
        0.0,
        -0.0,
        1e-9,  # rounds to grid zero
    ]
    rows = [
        (tie_ish, list(reversed(tie_ish))),
        ([0.5] * 64, [0.25] * 64),
        ([1.0, -1.0, 0.0, 0.000001], [1.0, 1.0, 1.0, 1.0]),
        ([], []),  # empty → exact zero both ways
        ([0.1] * 3, [None, 0.2, 0.3]),  # NULL component → NULL both
    ]
    sims = _compare(spark, rows)
    assert sims[3] == "0.000000000000"
    assert sims[4] is None


def test_dot_int64_fallback_on_big_and_nonfinite(spark):
    """Components past the int64 bound route to the decimal path (the
    when-guard), so behavior there is dot_decimal's by construction —
    including its ANSI error on values outside decimal(10,6)'s domain
    (≥10⁴) and on NaN/Inf, which the guard also deflects (NaN/Inf
    compare false against the bound)."""
    import pytest as _pytest

    rows = [
        ([500.0, 2.0], [3.0, 4.0]),  # > bound → decimal path
        ([9999.0, -9999.0], [9999.0, 9999.0]),  # domain edge, exact
    ]
    _compare(spark, rows)
    # out-of-domain magnitudes: BOTH paths raise dot_decimal's ANSI
    # overflow — the int64 form may not silently answer where the
    # decimal form errors
    df = spark.createDataFrame(
        [([1e4, 1e4], [1e4, 1e4])], "a array<float>, b array<float>"
    )
    for fn in (dot_decimal, dot_decimal_int64):
        with _pytest.raises(Exception, match="Decimal|DECIMAL"):
            df.select(fn(F.col("a"), F.col("b"))).collect()


def test_dot_int64_matches_on_fixture_embeddings(spark, sf_dir):
    """The contract-shaped workload: every (query, corpus) pair for the
    first 10 vectors — the exact set the ANN recall contracts rank."""
    from changedatacapture_reporting_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    pairs = e.crossJoin(F.broadcast(q)).select(
        dot_decimal(F.col("qv"), F.col("embedding"))
        .cast("string")
        .alias("dec"),
        dot_decimal_int64(F.col("qv"), F.col("embedding"))
        .cast("string")
        .alias("i64"),
    )
    diff = pairs.filter(
        ~F.col("dec").eqNullSafe(F.col("i64"))
    ).count()
    assert diff == 0
