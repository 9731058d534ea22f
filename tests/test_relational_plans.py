"""Physical-plan assertions (SURVEY.md §4): filters reach the parquet scan,
small dims broadcast, hot paths stay in whole-stage codegen."""

from __future__ import annotations

import pytest

from changedatacapture_reporting_spark import contracts


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    qs = contracts.queries()

    def get(name):
        return _plan(qs[name](spark, sf_dir))

    return get


def test_q1_filter_pushed_to_scan(plans):
    p = plans("q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p


def test_q1_column_pruning(plans):
    # scan must read only the referenced columns, not all 11
    p = plans("q1_pricing_summary")
    read_schema = [l for l in p.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read_schema
    assert "l_partkey" not in read_schema
    assert "l_quantity" in read_schema


def test_q3_broadcasts_customer(plans):
    p = plans("q3_top_unshipped")
    assert "BroadcastHashJoin" in p


def test_q5_single_shuffle_join(plans):
    # all dims broadcast: only the lineitem⋈orders join may shuffle
    p = plans("q5_region_revenue")
    assert p.count("BroadcastHashJoin") >= 3


def test_q6_all_predicates_pushed(plans):
    p = plans("q6_revenue_forecast")
    assert "PushedFilters" in p and "GreaterThanOrEqual(l_shipdate" in p
    assert "GreaterThanOrEqual(l_discount,0.03)" in p


def test_changelog_whole_stage_codegen(plans):
    # the CDC core must stay codegen'd (no Python UDFs / RDD breaks).
    # Since the single-scan fusion there is no standalone Filter: op
    # dispatch is the CASE inside the codegen'd Project and non-matching
    # ops fall out of the Generate as NULL arrays.
    p = plans("cdc_changelog_full")
    assert "* Project" in p and "Generate" in p  # '*' = codegen stage
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_incremental_resume_filter_reaches_scan(plans):
    # the lsn high-watermark filter must prune at the parquet scan — at
    # 100 TB this is what keeps incremental runs proportional to new data
    p = plans("cdc_incremental_resume")
    assert "GreaterThan(o_orderkey,3000)" in p


def test_correlated_subquery_is_decorrelated(plans):
    # Catalyst must rewrite the per-row scalar subquery into agg + join
    p = plans("above_customer_avg_orders")
    assert "SortMergeJoin" in p or "BroadcastHashJoin" in p or "ShuffledHashJoin" in p
    assert "Subquery" not in p.split("== Physical Plan ==")[-1].split("(1)")[0]


def test_minhash_signature_is_codegen(plans):
    p = plans("dedup_minhash_lsh")
    assert "BatchEvalPython" not in p  # no row-python in the dedup path


def test_semi_join_is_semi(plans):
    assert "LeftSemi" in plans("customers_with_urgent_orders")


def test_anti_join_is_anti(plans):
    assert "LeftAnti" in plans("customers_without_orders")
