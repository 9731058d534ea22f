"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the full CDC populate dataflow,
SURVEY.md §3 entry point 3) at sf0.001. ``queries()``/``oracle_sql()``
expose every implemented operator from SURVEY.md §2 with a DuckDB oracle
where the semantics are SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from changedatacapture_reporting_spark import contracts

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: CDC events → per-column changelog (populate dataflow)."""
    return contracts.queries()["cdc_changelog_full"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return contracts.queries()


def oracle_sql() -> dict[str, str]:
    return contracts.oracle_sql()
