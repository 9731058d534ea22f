"""Data-quality expectations: per-rule violation counts on a fixture
with known defects, NULL semantics, fk orphans, and the one-scan shape
for row-level rules."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from changedatacapture_reporting_spark.operators.quality import (
    accepted_values,
    check_expectations,
    fk_exists,
    in_range,
    not_null,
    satisfies,
    unique,
)


@pytest.fixture()
def frame(spark):
    rows = [
        (1, "a", 10, 100),
        (2, "b", -5, 200),     # range violation
        (3, None, 20, 300),    # null violation
        (3, "z", 30, 400),     # duplicate id + bad value
        (4, "a", None, 999),   # null qty ok for range (null ≠ violation)
        (5, "a", 40, None),    # null fk ok (non-null children only)
    ]
    return spark.createDataFrame(rows, "id long, cat string, qty long, ck long")


@pytest.fixture()
def ref(spark):
    return spark.createDataFrame([(100,), (200,), (300,)], "k long")


def test_rule_counts(spark, frame, ref):
    out = check_expectations(
        frame,
        [
            not_null("cat"),
            accepted_values("cat", ["a", "b"]),
            in_range("qty", 0, 100),
            unique(["id"]),
            fk_exists("ck", ref, "k"),
            satisfies(F.col("qty").isNull() | (F.col("qty") < 35), "qty_small"),
        ],
    )
    got = {r.rule: (r.n_violations, r.passed) for r in out.collect()}
    assert got == {
        "not_null:cat": (1, False),
        "accepted_values:cat": (1, False),  # NULL not counted, 'z' is
        "in_range:qty": (1, False),         # -5 only; NULL passes
        "unique:id": (1, False),            # one excess duplicate row
        "fk_exists:ck": (2, False),         # 400 and 999 orphaned; NULL ok
        "qty_small": (1, False),            # qty=40
    }


def test_all_pass_and_errors(spark, frame, ref):
    out = check_expectations(frame, [not_null("id"), unique(["id", "cat"])])
    assert all(r.passed and r.n_violations == 0 for r in out.collect())

    with pytest.raises(ValueError):
        check_expectations(frame, [])
    with pytest.raises(ValueError):
        check_expectations(frame, [not_null("id"), not_null("id")])


def test_row_rules_share_one_scan(spark, frame):
    """Any number of row-level + unique rules produce a single-aggregate
    plan — exactly one scan of the input relation."""
    out = check_expectations(
        frame,
        [not_null("cat"), in_range("qty", 0, 100), unique(["id"])],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.lower().count("scan existingrdd") <= 1 or plan.count("Scan") <= 2
