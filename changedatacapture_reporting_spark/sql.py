"""SQL surface — speak SQL to the engine.

The reference IS SQL (two T-SQL procedures + ad-hoc SELECTs over the
generated ``_ChangeLog`` tables; usp_cdc_query_data.sql:40–75 is just a
windowed SELECT). A user migrating from it expects to keep writing SQL,
not to learn the DataFrame API first — so this module registers the
engine's tables and derived frames as Spark temp views and hands back
``spark.sql``. Everything Catalyst does for the DataFrame plans
(pushdown, pruning, AQE) applies identically to the SQL text: views are
lazy logical plans, not materializations, so ``register_tables`` +
``run_sql`` costs nothing until an action runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from changedatacapture_reporting_spark.sources.tables import load_table

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def register_tables(
    spark: SparkSession,
    sf_dir: str,
    tables: tuple[str, ...] = TABLES,
    prefix: str = "",
) -> list[str]:
    """Register the corpus parquet tables as temp views (lazy — each
    view is the ``load_table`` scan plan, so SQL predicates still push
    into parquet). Returns the registered view names."""
    names = []
    for t in tables:
        name = f"{prefix}{t}"
        load_table(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names


def register_view(spark: SparkSession, df: DataFrame, name: str) -> str:
    """Expose any engine output (a changelog, an SCD2 history, a dedup
    verdict frame) to SQL. The view wraps the DataFrame's logical plan;
    downstream SQL composes with it inside one optimized plan."""
    df.createOrReplaceTempView(name)
    return name


def run_sql(
    spark: SparkSession, sf_dir: str, statement: str
) -> DataFrame:
    """One-call form: register the corpus tables, run the statement."""
    register_tables(spark, sf_dir)
    return spark.sql(statement)
