"""Table profiling — per-column summary statistics in ONE scan.

The data-quality preamble of any large-scale pipeline: nulls, cardinality,
bounds per column. All aggregates for all columns run in a single pass
(Catalyst plans one partial-aggregate per partition; 4×n_cols aggregate
buffers, zero extra scans), then the single wide row is reshaped to
long form — at any corpus size the reshape input is ONE row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame, columns: list[str] | None = None, exact_distinct: bool = False
) -> DataFrame:
    """One row per column: n_rows, n_nulls, n_distinct, min/max as strings.

    ``exact_distinct=False`` (default) uses HyperLogLog++ — the only sane
    choice at 100 TB; True gives exact COUNT(DISTINCT) for oracle parity.
    """
    columns = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        distinct = (
            F.countDistinct(c) if exact_distinct else F.approx_count_distinct(c)
        )
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            distinct.alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)

    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("__n").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_str"),
                F.col(f"{c}__max").alias("max_str"),
            )
            for c in columns
        ]
    )
    return wide.select(F.explode(per_col).alias("p")).select("p.*")


def column_churn(
    changelog: DataFrame,
    pk_cols: list[str],
    exact_keys: bool = True,
) -> DataFrame:
    """Per-(table, column) change-frequency profile of a changelog — the
    tuning question a CDC operator asks first: WHICH columns churn, how
    hot are their keys, and when did they last move? High-churn columns
    drive capture-instance column lists, index choices, and SCD2
    value-column selection; a column whose changes concentrate in few
    keys (n_changes ≫ n_keys) signals an update loop upstream.

    One hash aggregation on (table_name, column_name) — marker rows
    (NULL column_name) are excluded, so the output covers real column
    writes only. n_keys is exact COUNT(DISTINCT pk); at 100 TB swap in
    approx_count_distinct via the ``exact_keys`` flag.
    """
    pk = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in pk_cols])
    n_keys = (
        F.countDistinct(pk) if exact_keys else F.approx_count_distinct(pk)
    )
    return (
        changelog.filter(F.col("column_name").isNotNull())
        .groupBy("table_name", "column_name")
        .agg(
            F.count("*").alias("n_changes"),
            n_keys.alias("n_keys"),
            F.sum(F.col("new_value").isNull().cast("long")).alias("n_to_null"),
            F.max("commit_time").alias("last_change"),
        )
    )


def activity_anomaly(
    daily: DataFrame,
    key_cols: list[str],
    day_col: str,
    value_col: str,
    trailing: int = 7,
    z_threshold: float = 2.0,
    min_history: int = 3,
) -> DataFrame:
    """Flag days whose activity departs from the trailing window — the
    standing "did ingestion spike/stall?" monitor over the maintained
    daily rollup (operators.rollup.read_rollup / the daily-activity
    aggregate), NOT over the raw changelog.

    Per key, each day's ``value_col`` is z-scored against the mean and
    sample stddev of the PRECEDING ``trailing`` days (current day
    excluded — an anomalous day must not dilute its own baseline). Days
    with fewer than ``min_history`` preceding observations, or a
    zero/undefined baseline stddev, get NULL ``z_score`` and are never
    anomalies (cold start is unknown, not anomalous).

    Scale: the input is already the per-(key, day) rollup — thousands of
    rows per table-year, not the event volume — so the window sort is
    negligible; one shuffle on the key.
    """
    from pyspark.sql.window import Window as W

    w = (
        W.partitionBy(*key_cols)
        .orderBy(day_col)
        .rowsBetween(-trailing, -1)
    )
    v = F.col(value_col).cast("double")
    n_prev = F.count(v).over(w)
    mean = F.avg(v).over(w)
    sd = F.stddev_samp(v).over(w)
    z = F.when(
        (n_prev >= min_history) & sd.isNotNull() & (sd > 0.0),
        (v - mean) / sd,
    )
    return daily.select(
        *daily.columns,
        F.round(z, 6).alias("z_score"),
        F.coalesce(
            F.abs(z) > F.lit(float(z_threshold)), F.lit(False)
        ).alias("is_anomaly"),
    )


def profile_correlations(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlation matrix in ONE scan — the multivariate
    step of table profiling ("which measures move together?") that
    otherwise triggers a scan per pair. All p·(p−1)/2 ``F.corr``
    aggregates run in a single partial-aggregate pass (p² buffer slots,
    zero extra scans — the profile_table recipe); the single wide row
    melts to long form (col_a < col_b lexicographically, each pair
    once). ``corr`` ignores rows with a NULL on either side, per the
    standard pairwise-deletion semantics. Output: col_a, col_b, corr
    (rounded 1e-6 — the cross-engine double-accumulation tolerance)."""
    if len(cols) < 2:
        raise ValueError("need at least two columns")
    if len(set(cols)) != len(cols):
        raise ValueError(f"duplicate columns: {cols}")
    pairs = [
        (a, b) for i, a in enumerate(cols) for b in cols[i + 1:]
    ]

    def corr(a: str, b: str):
        # covar_samp/(stddev·stddev) instead of F.corr: identical value
        # (the n−1 factors cancel), but guardable — F.corr's internal
        # division throws under ANSI mode when a column has zero
        # variance, where the correct profile answer is NULL (undefined).
        # Every moment is restricted to PAIRWISE-COMPLETE rows (a AND b
        # non-null): covar_samp only accumulates those, so the stddevs
        # must too, or the ratio is not Pearson when the columns have
        # different null patterns.
        av = F.when(F.col(b).isNotNull(), F.col(a))
        bv = F.when(F.col(a).isNotNull(), F.col(b))
        sa, sb = F.stddev_samp(av), F.stddev_samp(bv)
        return F.when(
            (sa > 0) & (sb > 0), F.covar_samp(a, b) / (sa * sb)
        )

    one = df.agg(
        *[
            F.round(corr(a, b), 6).alias(f"_c{i}")
            for i, (a, b) in enumerate(pairs)
        ]
    )
    stack_args = ", ".join(
        f"'{a}', '{b}', _c{i}" for i, (a, b) in enumerate(pairs)
    )
    return one.select(
        F.expr(
            f"stack({len(pairs)}, {stack_args}) as (col_a, col_b, corr)"
        )
    )


def key_skew(
    df: DataFrame, key_col: str, top_n: int = 20
) -> DataFrame:
    """Join/shuffle-key skew report: the top-``top_n`` heaviest keys
    with exact counts plus the table totals — the diagnostic run BEFORE
    a big join to decide between a plain shuffle, a broadcast, and
    salting (`operators.skew.salted_join`). At 100 TB the whole thing is
    one map-side-combinable hash aggregation down to distinct-key scale,
    one tiny top-N (TakeOrdered, per-partition heads), and a scalar
    total folded in as literals-by-join (no second scan of the fact
    table: totals aggregate FROM the key counts).

    Output: (key, n_rows, rank, total_rows, n_keys) — skew ratio =
    n_rows * n_keys / total_rows is derivable exactly from the integer
    columns, so nothing floating-point is emitted.
    """
    from pyspark.sql import Window

    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").alias("n_rows")
    )
    totals = counts.agg(
        F.sum("n_rows").cast("long").alias("total_rows"),
        F.count("*").alias("n_keys"),
    )
    top = (
        counts.orderBy(F.desc("n_rows"), F.asc("key"))
        .limit(top_n)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.desc("n_rows"), F.asc("key"))
            ),
        )
    )
    # ONE-ROW totals broadcast against the top_n rows — the q11 scalar
    # fold-in shape (O(top_n × 1); no equi key exists for a scalar)
    return top.crossJoin(F.broadcast(totals))


def join_cardinality(
    left: DataFrame,
    left_key: str,
    right: DataFrame,
    right_key: str,
) -> DataFrame:
    """EXACT pre-join cardinality report — what an equi-join would
    produce, computed WITHOUT running it: both sides collapse to
    per-key counts (map-side-combinable aggregations down to
    distinct-key scale), the count frames join on the key, and the
    output size is Σ_k cl(k)·cr(k) exactly. The companion to
    :func:`key_skew` for join planning: a 100 TB × 100 TB join's row
    count, match rates, and max single-key blowup for the cost of two
    aggregations over key columns only (column pruning reaches the
    scans) plus a distinct-key-scale join.

    One all-integer row: n_left/n_right (input rows), d_left/d_right
    (distinct keys), d_matched (keys on both sides), out_rows (exact
    join output size), max_key_out (largest single key's contribution —
    the skew-explosion early warning).
    """
    lc = left.groupBy(F.col(left_key).alias("k")).agg(
        F.count("*").alias("cl")
    )
    rc = right.groupBy(F.col(right_key).alias("k")).agg(
        F.count("*").alias("cr")
    )
    m = lc.join(rc, "k").select(
        (F.col("cl") * F.col("cr")).alias("prod")
    )
    matched = m.agg(
        F.count("*").alias("d_matched"),
        F.coalesce(F.sum("prod"), F.lit(0)).cast("long").alias("out_rows"),
        F.coalesce(F.max("prod"), F.lit(0)).cast("long").alias("max_key_out"),
    )
    lt = lc.agg(
        F.sum("cl").cast("long").alias("n_left"),
        F.count("*").alias("d_left"),
    )
    rt = rc.agg(
        F.sum("cr").cast("long").alias("n_right"),
        F.count("*").alias("d_right"),
    )
    # three ONE-ROW frames folded together — scalar broadcast shape
    return lt.crossJoin(F.broadcast(rt)).crossJoin(F.broadcast(matched))
