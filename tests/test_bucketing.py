"""Bucketing: co-located joins without a shuffle (SURVEY.md §4 / the
100 TB join strategy). Writing both fact tables bucketed by the join key
lets Spark sort-merge them with NO Exchange on either side."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from changedatacapture_reporting_spark.plans.explain import plan_string
from changedatacapture_reporting_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    # managed tables land in ./spark-warehouse (gitignored); the in-memory
    # catalog forgets tables between sessions, so clear stale dirs first
    import shutil

    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        (
            load_table(spark, sf_dir, name)
            .write.bucketBy(8, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(f"b_{name}")
        )
    yield
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    l = spark.table("b_lineitem")
    o = spark.table("b_orders")
    # fixture tables are tiny so the planner would broadcast (which
    # disables bucketing); the merge hint forces the sort-merge path a
    # fact-fact join takes at scale
    joined = l.hint("merge").join(o, l.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "o_orderstatus", "l_quantity"
    )
    p = plan_string(joined)
    assert "SortMergeJoin" in p
    assert "Exchange" not in p  # both sides pre-bucketed on the key


def test_bucketed_join_results_match_unbucketed(spark, sf_dir, bucketed):
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    plain = l.join(o, l.l_orderkey == o.o_orderkey).count()
    bucketed_count = (
        spark.table("b_lineitem")
        .join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert plain == bucketed_count


def test_bucketed_groupby_skips_shuffle(spark, bucketed):
    agg = (
        spark.table("b_lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    assert "Exchange" not in plan_string(agg)
