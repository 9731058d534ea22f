"""SQL facade tests — views are lazy plans, predicates still push down."""

from __future__ import annotations

from pyspark.sql import functions as F

from changedatacapture_reporting_spark.sql import (
    register_tables,
    register_view,
    run_sql,
)


def test_run_sql_matches_dataframe(spark, sf_dir):
    got = {
        (r.o_orderstatus, r.n)
        for r in run_sql(
            spark,
            sf_dir,
            "SELECT o_orderstatus, COUNT(*) AS n FROM orders "
            "GROUP BY o_orderstatus",
        ).collect()
    }
    want = {
        (r.o_orderstatus, r.n)
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want and got


def test_register_tables_returns_names_and_prefix(spark, sf_dir):
    names = register_tables(spark, sf_dir, tables=("orders",), prefix="x_")
    assert names == ["x_orders"]
    assert spark.sql("SELECT COUNT(*) AS n FROM x_orders").head().n > 0


def test_sql_view_predicate_pushes_into_scan(spark, sf_dir):
    """The whole point of lazy views: a SQL WHERE over a registered view
    must reach the parquet scan as a pushed filter."""
    register_tables(spark, sf_dir, tables=("orders",))
    plan = (
        spark.sql("SELECT o_orderkey FROM orders WHERE o_orderkey = 42")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "o_orderkey" in plan


def test_register_view_composes_with_sql(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderkey") % 2 == 0
    )
    register_view(spark, df, "even_orders")
    n = spark.sql("SELECT COUNT(*) AS n FROM even_orders").head().n
    assert n == df.count()
