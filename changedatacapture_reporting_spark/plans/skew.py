"""Skew mitigation: salted two-phase aggregation.

AQE's skew-join handling (on in session.py) covers joins; skewed
*aggregations* — a groupBy where one key holds a disproportionate share of
rows (the classic hot tenant / hot table_name at 100 TB) — still funnel one
key's rows to one task. Salting splits each key across ``salt_buckets``
partial groups, aggregates, then merges: two small shuffles instead of one
skewed one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# merge function per partial-aggregate column, keyed by how the partial was
# produced: counts/sums re-sum; mins min; maxes max
_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase salted groupBy.

    ``aggs``: output name → (fn, input column), fn ∈ {sum, count, min, max}
    (the algebraic aggregates — decomposable into partial+merge; avg is
    sum/count composed by the caller).

    Example::

        salted_aggregate(log, ["table_name"],
                         {"n": ("count", "*"), "max_lsn": ("max", "lsn")})
    """
    for name, (fn, _) in aggs.items():
        if fn not in _MERGE:
            raise ValueError(f"{name}: non-decomposable aggregate {fn!r}")

    salt = (F.spark_partition_id() % salt_buckets).alias("_salt")

    def partial(name: str, fn: str, col: str) -> Column:
        if fn == "count":
            return (F.count("*") if col == "*" else F.count(col)).alias(name)
        return getattr(F, fn)(col).alias(name)

    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*[partial(n, fn, c) for n, (fn, c) in aggs.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[_MERGE[fn](n).alias(n) for n, (fn, _) in aggs.items()]
    )
