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


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-salted equi-join: spread each hot LEFT key across
    ``salt_buckets`` tasks by salting the left side and replicating the
    right side once per salt value, then joining on (keys, salt).

    Semantics are identical to ``left.join(right, on, how)`` for ``how``
    ∈ {inner, left}: every left row carries exactly one salt, so rows
    are never duplicated and left-outer unmatched rows surface exactly
    once. (right/full outer are rejected — an unmatched RIGHT row exists
    ``salt_buckets`` times in the replicated build side and would
    surface that many times.)

    When to use over AQE's skew-join split (on by default in
    session.py): AQE splits oversized SHUFFLE partitions after the map
    stage, which does nothing for a hot key that is also hot at the
    source (one giant map-side group), for broadcast-ineligible
    mid-sized right sides, or in static plans (foreachBatch bodies where
    AQE is disabled). The cost model is explicit: right side is written
    ``salt_buckets``× into the shuffle — size it so
    |right| · salt_buckets stays well under the big side's volume.

    The salt is ``spark_partition_id() % salt_buckets`` (same scheme as
    :func:`salted_aggregate`): deterministic for a fixed input layout,
    no RNG, and rows co-located in one input partition land in one
    salt — the shuffle spreads a hot key because its rows span many
    input partitions in the first place.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports inner/left, not {how!r} — a replicated "
            "right side would multiply unmatched right rows"
        )
    if salt_buckets < 2:
        raise ValueError("salt_buckets must be >= 2")
    salted_l = left.withColumn(
        "_salt", F.spark_partition_id() % salt_buckets
    )
    salted_r = right.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    return salted_l.join(salted_r, [*on, "_salt"], how).drop("_salt")
