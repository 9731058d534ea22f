"""Point-in-time (temporal) enrichment against an SCD2 dimension — the
canonical consumption of ``operators.scd.scd2_history`` output: give each
fact row the dimension attributes that were true AT ITS TIMESTAMP.

This is NOT the plain as-of join (``asof_signup_attribution``): SCD2
intervals have *gaps* — a key deleted at fact time, or not yet born —
and the correct answer there is NULL, not the stale previous version a
forward-fill would resurrect. The operator enforces interval semantics
``valid_from <= ts < valid_to`` (open version: NULL valid_to).

Plan shape (scale notes): the naive formulation is a range join
(fact.key = dim.key AND ts BETWEEN …) — a shuffle join whose matching
degenerates to per-key nested loops under skew. Here it is the
union+window pattern instead: tag dimension version-starts and facts
into ONE stream (the fact's columns ride along as a struct, so there is
no join back), sort per key, carry the latest version forward with
``last(..., ignorenulls)``, then null out carries whose interval had
already closed at the fact's timestamp. One shuffle on the key for both
inputs, no range explosion, no per-group Python. Version-start rows are
a vanishing fraction of the stream (dims change rarely next to fact
volume), so the sort cost is the fact sort any per-key window pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def temporal_enrich(
    facts: DataFrame,
    dim: DataFrame,
    key_cols: list[str],
    fact_ts_col: str,
    value_cols: list[str],
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Left-enrich ``facts`` with the ``dim`` version valid at each
    fact's ``fact_ts_col`` (``from_col <= ts < to_col``; NULL ``to_col``
    = still open). Facts in an interval gap, before the key's first
    version, or with a key the dimension never saw get NULL values —
    every fact row survives exactly once (duplicates included). A fact
    timestamp equal to a version's ``from_col`` takes THAT version
    (boundary is closed-open).

    Dimension versions for one key must be non-overlapping (what
    ``scd2_history`` produces); overlaps would resolve to the latest
    ``from_col`` at or before the fact, silently.
    """
    payload = F.struct(
        *[F.col(c).alias(c) for c in value_cols],
        F.col(to_col).alias("__valid_to"),
    )
    dim_stream = dim.select(
        *key_cols,
        F.col(from_col).alias("__ts"),
        F.lit(1).alias("__is_dim"),
        payload.alias("__payload"),
    )
    fact_struct = F.struct(*[F.col(c) for c in facts.columns])
    fact_stream = facts.select(
        *key_cols,
        F.col(fact_ts_col).alias("__ts"),
        F.lit(0).alias("__is_dim"),
        F.lit(None)
        .cast(dim_stream.schema["__payload"].dataType)
        .alias("__payload"),
        fact_struct.alias("__fact"),
    )
    u = dim_stream.withColumn(
        "__fact", F.lit(None).cast(fact_stream.schema["__fact"].dataType)
    ).unionByName(fact_stream)
    # at equal ts the dim row sorts first → from_col boundary inclusive
    w = (
        W.partitionBy(*key_cols)
        .orderBy(F.col("__ts"), F.desc("__is_dim"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = u.withColumn(
        "__ver", F.last("__payload", ignorenulls=True).over(w)
    ).filter(F.col("__is_dim") == 0)
    in_interval = F.col("__ver").isNotNull() & (
        F.col("__ver.__valid_to").isNull()
        | (F.col("__ts") < F.col("__ver.__valid_to"))
    )
    return carried.select(
        *[F.col(f"__fact.{c}").alias(c) for c in facts.columns],
        *[
            F.when(in_interval, F.col(f"__ver.{c}")).alias(c)
            for c in value_cols
        ],
    )
