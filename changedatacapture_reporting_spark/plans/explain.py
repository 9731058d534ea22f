"""Physical-plan introspection helpers (SURVEY.md §4).

The 100 TB posture is enforced, not hoped for: tests assert that filters
reach the parquet scan, small sides broadcast, and no Python eval node
sneaks into a hot path. These helpers give those assertions a stable API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as text (same content as ``df.explain(mode)``)."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """Assert a predicate fragment appears in the scan's PushedFilters —
    e.g. ``"GreaterThan(o_orderkey,3000)"``."""
    p = plan_string(df)
    if fragment not in p:
        raise AssertionError(
            f"filter {fragment!r} not pushed to scan; plan:\n{p}"
        )


def assert_broadcast_join(df: DataFrame, at_least: int = 1) -> None:
    p = plan_string(df)
    n = p.count("BroadcastHashJoin")
    if n < at_least:
        raise AssertionError(
            f"expected ≥{at_least} broadcast joins, found {n}; plan:\n{p}"
        )


def assert_no_python_eval(df: DataFrame) -> None:
    """Hot paths must stay JVM-side (whole-stage codegen)."""
    p = plan_string(df)
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        if node in p:
            raise AssertionError(f"{node} found in plan:\n{p}")
