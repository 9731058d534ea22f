"""Relational operator surface (SURVEY.md §2.12 — operators absent from the
reference, supplied by this engine so a migrating user has a complete
analytics engine, not just the CDC core).

Spark side is DataFrame-API-first (Catalyst optimizes: filter pushdown,
broadcast joins for the small dims, partial aggregation); oracle side is
DuckDB SQL over the same parquet.

Float policy (see contracts.py): every money aggregate casts its double
inputs to DECIMAL *before* arithmetic — decimal sums are exact and
order-independent in both engines, so shuffle/partition order can't change
the hash; the final value is cast back to double. Raw double columns pass
through untouched (bit-identical in both engines). double→decimal rounding
agrees everywhere because an IEEE double can never land exactly on a
decimal rounding tie.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from changedatacapture_reporting_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# TPC-H-ish aggregation / join pipelines
# ---------------------------------------------------------------------------


def _dec(c: str, t: str = "decimal(12,2)"):
    return F.col(c).cast(t)


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped aggregation with 8 aggregates (classic pricing summary).

    Scale notes: partial aggregation (map-side combine) happens for free;
    only 6 groups survive the shuffle. Filter pushes down to the parquet
    scan (verified in tests/test_plans.py).
    """
    l = load_table(spark, sf_dir, "lineitem")
    disc_f = (F.lit(1) - F.col("l_discount")).cast("decimal(6,4)")
    charge_f = (F.lit(1) + F.col("l_tax")).cast("decimal(6,4)")
    return (
        l.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(_dec("l_extendedprice") * disc_f).cast("double").alias("sum_disc_price"),
            # scale-10 sum: unscaled value exceeds 2^53, where DuckDB's
            # decimal→double cast rounds differently than Spark's — keep it
            # exact decimal, then render to string: decimal-typed OUTPUT
            # columns normalize differently across drivers (pandas turns
            # DuckDB decimals into float64), while the plain-string form
            # "90025104.9648000000" is identical in both engines
            F.sum(_dec("l_extendedprice") * disc_f * charge_f)
            .cast("decimal(38,10)")
            .cast("string")
            .alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(_dec("l_discount").cast("decimal(6,4)")).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


SQL_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(6,4))) AS DOUBLE) AS sum_disc_price,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(6,4)) * CAST(1 + l_tax AS DECIMAL(6,4))) AS DECIMAL(38,10)) AS VARCHAR) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(CAST(l_discount AS DECIMAL(12,2)) AS DECIMAL(6,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q3_top_unshipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + agg + deterministic top-10 (shipping-priority shape).

    customer is the small side → explicit broadcast; orders⋈lineitem is the
    big shuffle join on l_orderkey (its natural key — co-partitioned with
    downstream groupBy, so one shuffle serves both)."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-01-01"
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-01-01"
    )
    disc_f = (F.lit(1) - F.col("l_discount")).cast("decimal(6,4)")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_dec("l_extendedprice") * disc_f).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


SQL_Q3 = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(6,4))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-table star join: all dims broadcast; the only shuffle is
    lineitem⋈orders + final groupBy on n_name."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    disc_f = (F.lit(1) - F.col("l_discount")).cast("decimal(6,4)")
    dims = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "c_nationkey", "n_name")
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
        .join(
            F.broadcast(supplier),
            (lineitem.l_suppkey == supplier.s_suppkey)
            & (F.col("c_nationkey") == supplier.s_nationkey),
        )
        .groupBy("n_name")
        .agg(F.sum(_dec("l_extendedprice") * disc_f).cast("double").alias("revenue"))
    )


SQL_Q5 = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(6,4))) AS DOUBLE) AS revenue
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure filter + global aggregate — every predicate reaches the scan."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount", "decimal(6,4)"))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


SQL_Q6 = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(6,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# window functions / top-k
# ---------------------------------------------------------------------------


def topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — row_number over a composite ordering
    (value desc, key asc) so ties can't make the result nondeterministic."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


SQL_TOPK = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders)
WHERE rn <= 3
"""


def running_total_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum window (integer-exact via floor to bigint)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.floor("o_totalprice").cast("long")).over(w).alias("running_spend"),
    )


SQL_RUNNING = """
SELECT o_custkey, o_orderkey,
       -- DuckDB SUM(BIGINT) yields HUGEINT, which drivers normalize as
       -- float64 — cast back to BIGINT so both engines emit int64
       CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT))
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_spend
FROM orders
"""


def order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag + datediff: days since the customer's previous order."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), prev).alias("days_since_prev"),
    )


SQL_GAPS = """
SELECT o_custkey, o_orderkey,
       DATE_DIFF('day',
                 LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey),
                 o_orderdate) AS days_since_prev
FROM orders
"""


def part_price_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile over a composite (tie-free) ordering."""
    p = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return p.select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
        F.ntile(4).over(w).alias("price_quartile"),
    )


SQL_RANKS = """
SELECT p_brand, p_partkey, p_retailprice,
       RANK() OVER w AS price_rank,
       DENSE_RANK() OVER w AS price_dense_rank,
       NTILE(4) OVER w AS price_quartile
FROM part
WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC)
"""


# ---------------------------------------------------------------------------
# semi/anti joins, distinct agg, set ops, grouping analytics, pivot
# ---------------------------------------------------------------------------


def customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS). At scale a semi-join ships only the join
    keys of the probe side — never the payload."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


SQL_SEMI = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS) against a FILTERED build side —
    customers with no urgent order. r10 hardening (VERDICT r09 item 8):
    the original unfiltered form returned 0 rows at the driver's gate
    sf (every sf0.01 customer has an order), making the green check
    vacuous; the urgent-order restriction is fixture-guaranteed
    non-empty at every sf (18 / 203 / 1986 rows at sf0.001/0.01/0.1)
    while keeping the exact anti-join plan shape under test."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


SQL_ANTI = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
"""


def order_priority_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation alongside plain aggregates."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


SQL_DISTINCT_AGG = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       COUNT(DISTINCT o_custkey) AS n_customers,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price
FROM orders
GROUP BY o_orderpriority
"""


def rollup_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with subtotal markers (integer-exact revenue)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.floor("o_totalprice").cast("long")).alias("revenue_floor"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "revenue_floor",
        )
    )


SQL_ROLLUP = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT) AS revenue_floor
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
"""


def cube_lineitem_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE across flag×status."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_lines",
            "sum_qty",
        )
    )


SQL_CUBE = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
"""


def nation_presence_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT + EXCEPT (distinct semantics), tagged and unioned."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    both = c.intersect(s).withColumn("presence", F.lit("both"))
    cust_only = c.subtract(s).withColumn("presence", F.lit("customers_only"))
    return both.unionByName(cust_only)


SQL_SETOPS = """
SELECT nationkey, 'both' AS presence
FROM (SELECT c_nationkey AS nationkey FROM customer
      INTERSECT SELECT s_nationkey FROM supplier)
UNION ALL
SELECT nationkey, 'customers_only' AS presence
FROM (SELECT c_nationkey AS nationkey FROM customer
      EXCEPT SELECT s_nationkey FROM supplier)
"""


def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (wide conditional aggregation)."""
    o = load_table(spark, sf_dir, "orders")
    out = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
    )
    return out.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0)).alias("n_open"),
        F.coalesce(F.col("F"), F.lit(0)).alias("n_finished"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_pending"),
    )


SQL_PIVOT = """
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending
FROM orders
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# events: JSON, as-of join, tumbling windows, sessionization (batch analogs;
# streaming versions live in changedatacapture_reporting_spark.streaming)
# ---------------------------------------------------------------------------

# oracle-side view of events with ns→µs truncation matching sources.tables
ORACLE_EV = """
ev AS (
  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props
  FROM events
)
"""


def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over the events.props payload column."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            (F.sum("k").cast("double") / F.count("k")).alias("avg_k"),
        )
    )


SQL_JSON = f"""
WITH {ORACLE_EV}
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
         / COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS avg_k
FROM ev
GROUP BY event_type
"""


def asof_signup_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (Spark has no native one — SURVEY.md §2.12): attribute
    each purchase to the user's most recent signup at-or-before it.

    Implementation is the scale-correct union+window pattern: tag both
    streams, sort once per user, carry the last signup forward with
    ``last(..., ignorenulls)``. One shuffle on user_id; no range explosion,
    no per-group pandas. DuckDB oracle uses its native ASOF JOIN.
    """
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.lit(0).alias("is_signup")
    )
    signups = e.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", "event_id", F.lit(1).alias("is_signup")
    )
    u = purchases.unionByName(signups)
    # signups sort before purchases at equal ts → at-or-before is inclusive
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", F.desc("is_signup"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = u.withColumn(
        "last_signup",
        F.last(
            F.when(
                F.col("is_signup") == 1,
                F.struct(F.col("ts").alias("s_ts"), F.col("event_id").alias("s_id")),
            ),
            ignorenulls=True,
        ).over(w),
    )
    return carried.filter(F.col("is_signup") == 0).select(
        F.col("event_id").alias("purchase_event_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("last_signup.s_id").alias("signup_event_id"),
        F.col("last_signup.s_ts").alias("signup_ts"),
    )


SQL_ASOF = f"""
WITH {ORACLE_EV}
SELECT p.event_id AS purchase_event_id, p.user_id, p.ts AS purchase_ts,
       s.event_id AS signup_event_id, s.ts AS signup_ts
FROM (SELECT * FROM ev WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM ev WHERE event_type = 'signup') s
  ON p.user_id = s.user_id AND p.ts >= s.ts
"""


def profile_lineitem_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan correlation matrix (operators.profile.
    profile_correlations): all six pairs of lineitem's measures in a
    single aggregate pass, melted to long form.

    Accuracy-contract form (r9, NOTES_r08 item 1): the hashed columns
    are exact — pair names, the exact pairwise-complete row count — plus
    two booleans: corr_defined, and corr_close (profile_correlations'
    covar/stddev value vs an INDEPENDENT engine-native Pearson, F.corr
    here / corr() in the DuckDB oracle, within 2e-6 — rounding half-step
    + accumulation noise). No double is hashed, so no cross-engine
    ulp/rounding-boundary flake is possible; the double values
    themselves are pinned by pytest (test_relational_extra)."""
    from changedatacapture_reporting_spark.operators.profile import (
        profile_correlations,
    )

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    l = load_table(spark, sf_dir, "lineitem")
    prof = profile_correlations(l, cols)
    ref_wide = l.agg(
        *[
            F.struct(
                F.corr(a, b).alias("ref_corr"),
                F.count(
                    F.when(
                        F.col(a).isNotNull() & F.col(b).isNotNull(), 1
                    )
                ).alias("n_pairs"),
            ).alias(f"_p{i}")
            for i, (a, b) in enumerate(pairs)
        ]
    )
    ref = ref_wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(a).alias("col_a"),
                        F.lit(b).alias("col_b"),
                        F.col(f"_p{i}.ref_corr").alias("ref_corr"),
                        F.col(f"_p{i}.n_pairs").alias("n_pairs"),
                    )
                    for i, (a, b) in enumerate(pairs)
                ]
            )
        ).alias("p")
    ).select("p.*")
    return prof.join(ref, ["col_a", "col_b"]).select(
        "col_a",
        "col_b",
        "n_pairs",
        F.col("corr").isNotNull().alias("corr_defined"),
        (F.abs(F.col("corr") - F.col("ref_corr")) < 2e-6).alias(
            "corr_close"
        ),
    )


SQL_CORRELATIONS = """
WITH c AS (
  SELECT corr(l_quantity, l_extendedprice) AS c_qe,
         corr(l_quantity, l_discount) AS c_qd,
         corr(l_quantity, l_tax) AS c_qt,
         corr(l_extendedprice, l_discount) AS c_ed,
         corr(l_extendedprice, l_tax) AS c_et,
         corr(l_discount, l_tax) AS c_dt,
         COUNT(*) AS n
  FROM lineitem
), m AS (
  -- independent recomputation from raw moments:
  -- corr = (n*Sab - Sa*Sb) / sqrt((n*Saa - Sa^2)*(n*Sbb - Sb^2))
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(l_quantity) AS sq, SUM(l_extendedprice) AS se,
         SUM(l_discount) AS sd, SUM(l_tax) AS st,
         SUM(l_quantity*l_quantity) AS sqq,
         SUM(l_extendedprice*l_extendedprice) AS see,
         SUM(l_discount*l_discount) AS sdd,
         SUM(l_tax*l_tax) AS stt,
         SUM(l_quantity*l_extendedprice) AS sqe,
         SUM(l_quantity*l_discount) AS sqd,
         SUM(l_quantity*l_tax) AS sqt,
         SUM(l_extendedprice*l_discount) AS sed,
         SUM(l_extendedprice*l_tax) AS set_,
         SUM(l_discount*l_tax) AS sdt
  FROM lineitem
)
SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
       c.n AS n_pairs, c_qe IS NOT NULL AS corr_defined,
       ABS(c_qe - (m.n*sqe - sq*se)
                  / SQRT((m.n*sqq - sq*sq)*(m.n*see - se*se))) < 2e-6
         AS corr_close
FROM c, m
UNION ALL SELECT 'l_quantity', 'l_discount', c.n,
       c_qd IS NOT NULL,
       ABS(c_qd - (m.n*sqd - sq*sd)
                  / SQRT((m.n*sqq - sq*sq)*(m.n*sdd - sd*sd))) < 2e-6
FROM c, m
UNION ALL SELECT 'l_quantity', 'l_tax', c.n,
       c_qt IS NOT NULL,
       ABS(c_qt - (m.n*sqt - sq*st)
                  / SQRT((m.n*sqq - sq*sq)*(m.n*stt - st*st))) < 2e-6
FROM c, m
UNION ALL SELECT 'l_extendedprice', 'l_discount', c.n,
       c_ed IS NOT NULL,
       ABS(c_ed - (m.n*sed - se*sd)
                  / SQRT((m.n*see - se*se)*(m.n*sdd - sd*sd))) < 2e-6
FROM c, m
UNION ALL SELECT 'l_extendedprice', 'l_tax', c.n,
       c_et IS NOT NULL,
       ABS(c_et - (m.n*set_ - se*st)
                  / SQRT((m.n*see - se*se)*(m.n*stt - st*st))) < 2e-6
FROM c, m
UNION ALL SELECT 'l_discount', 'l_tax', c.n,
       c_dt IS NOT NULL,
       ABS(c_dt - (m.n*sdt - sd*st)
                  / SQRT((m.n*sdd - sd*sd)*(m.n*stt - st*st))) < 2e-6
FROM c, m
"""


def fuzzy_match_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy record linkage (operators.linkage.fuzzy_match): customer
    names matched against a deterministically perturbed copy (even keys
    get an 'x' appended) — blocked on the first 17 normalized chars
    (never a cross join), length-band pruned (lossless under the
    distance cap), verified by JVM Levenshtein ≤ 1. Same-block sibling
    names differing in the final digit also match at distance 1 —
    deterministic, and the oracle replays the identical
    block + band + distance pipeline."""
    from changedatacapture_reporting_spark.operators.linkage import (
        fuzzy_match,
    )

    c = load_table(spark, sf_dir, "customer")
    right = c.select(
        (F.col("c_custkey") + 1_000_000).alias("rid"),
        F.when(
            F.col("c_custkey") % 2 == 0, F.concat(F.col("c_name"), F.lit("x"))
        ).otherwise(F.col("c_name")).alias("name"),
    )
    return fuzzy_match(
        c, right, "c_custkey", "rid", "c_name", "name",
        max_distance=1,
        block_key=lambda s: F.substring(s, 1, 17),
    )


SQL_FUZZY_MATCH = """
WITH r AS (
  SELECT c_custkey + 1000000 AS rid,
         CASE WHEN c_custkey % 2 = 0 THEN c_name || 'x'
              ELSE c_name END AS name
  FROM customer
),
ln AS (SELECT c_custkey AS lid, c_name, lower(trim(c_name)) AS lnorm
       FROM customer),
rn AS (SELECT rid, name, lower(trim(name)) AS rnorm FROM r)
SELECT lid AS left_id, rid AS right_id,
       c_name AS left_val, name AS right_val,
       levenshtein(lnorm, rnorm) AS distance
FROM ln JOIN rn ON substring(lnorm, 1, 17) = substring(rnorm, 1, 17)
WHERE abs(length(lnorm) - length(rnorm)) <= 1
  AND levenshtein(lnorm, rnorm) <= 1
"""


def salted_join_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted equi-join (plans.skew.salted_join): orders joined to
    customer with the left side salted and the dimension replicated per
    salt — the static-plan fallback for hot keys AQE can't split. The
    result must be IDENTICAL to the plain join (no duplicated or dropped
    rows), proven through per-segment counts and integer revenue sums
    the oracle computes with an unsalted join."""
    from changedatacapture_reporting_spark.plans.skew import salted_join

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.floor("o_totalprice").cast("long").alias("t"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    j = salted_join(o, c, ["o_custkey"], salt_buckets=8)
    return j.groupBy("c_mktsegment").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum("t").cast("long").alias("sum_total"),
    )


SQL_SALTED_JOIN = """
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT) AS sum_total
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1
"""


def dq_orders_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations (operators.quality.
    check_expectations): five rules over orders — nullability, accepted
    status values (deliberately excluding 'P' so violations are
    non-zero), a price range that real rows exceed, pk uniqueness, and
    the customer FK (broadcast anti join). All row-level rules fold
    into ONE scan; the oracle recomputes each count naively."""
    from changedatacapture_reporting_spark.operators.quality import (
        accepted_values,
        check_expectations,
        fk_exists,
        in_range,
        not_null,
        unique,
    )

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return check_expectations(
        o,
        [
            not_null("o_custkey"),
            accepted_values("o_orderstatus", ["F", "O"]),
            in_range("o_totalprice", 0.0, 300000.0),
            unique(["o_orderkey"]),
            fk_exists("o_custkey", c, "c_custkey"),
        ],
    )


SQL_DQ_ORDERS = """
WITH v AS (
  SELECT 'not_null:o_custkey' AS rule,
         COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS n
  FROM orders
  UNION ALL
  SELECT 'accepted_values:o_orderstatus',
         COUNT(CASE WHEN o_orderstatus IS NOT NULL
                     AND o_orderstatus NOT IN ('F', 'O') THEN 1 END)
  FROM orders
  UNION ALL
  SELECT 'in_range:o_totalprice',
         COUNT(CASE WHEN o_totalprice IS NOT NULL
                     AND (o_totalprice < 0 OR o_totalprice > 300000)
               THEN 1 END)
  FROM orders
  UNION ALL
  SELECT 'unique:o_orderkey', COUNT(*) - COUNT(DISTINCT o_orderkey)
  FROM orders
  UNION ALL
  SELECT 'fk_exists:o_custkey',
         (SELECT COUNT(*)
          FROM orders o
          WHERE o.o_custkey IS NOT NULL
            AND o.o_custkey NOT IN (SELECT c_custkey FROM customer))
)
SELECT rule, CAST(n AS BIGINT) AS n_violations, n = 0 AS passed FROM v
"""


def scd2_pointintime_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal point-in-time enrichment (operators.temporal.
    temporal_enrich): orders enriched with the customer-dimension
    version valid at o_orderdate. The dimension is two synthesized SCD2
    versions per customer (segment renamed and balance bumped at
    1995-07-01), with customers divisible by 7 having a one-year GAP
    before their second version — orders falling in the gap must enrich
    to NULL, which forward-fill as-of joins get wrong. Engine plan is
    the union+window carry (no range join); the oracle is the naive
    interval LEFT JOIN."""
    from changedatacapture_reporting_spark.operators.temporal import (
        temporal_enrich,
    )

    c = load_table(spark, sf_dir, "customer")
    cut = F.lit("1995-07-01").cast("timestamp")
    late = F.lit("1996-07-01").cast("timestamp")
    v0 = c.select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("segment"),
        F.floor("c_acctbal").cast("long").alias("bal"),
        F.lit("1992-01-01").cast("timestamp").alias("valid_from"),
        cut.alias("valid_to"),
    )
    v1 = c.select(
        F.col("c_custkey").alias("k"),
        F.concat(F.col("c_mktsegment"), F.lit("+")).alias("segment"),
        (F.floor("c_acctbal").cast("long") + 100).alias("bal"),
        F.when(F.col("c_custkey") % 7 == 0, late)
        .otherwise(cut)
        .alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    o = load_table(spark, sf_dir, "orders")
    facts = o.select(
        "o_orderkey",
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("ts"),
    )
    return temporal_enrich(
        facts, v0.unionByName(v1), ["k"], "ts", ["segment", "bal"]
    )


SQL_SCD2_ENRICH = """
WITH dim AS (
  SELECT c_custkey AS k, c_mktsegment AS segment,
         CAST(FLOOR(c_acctbal) AS BIGINT) AS bal,
         TIMESTAMP '1992-01-01' AS valid_from,
         TIMESTAMP '1995-07-01' AS valid_to
  FROM customer
  UNION ALL
  SELECT c_custkey, c_mktsegment || '+',
         CAST(FLOOR(c_acctbal) AS BIGINT) + 100,
         CASE WHEN c_custkey % 7 = 0 THEN TIMESTAMP '1996-07-01'
              ELSE TIMESTAMP '1995-07-01' END,
         NULL
  FROM customer
)
SELECT o.o_orderkey, o.o_custkey AS k, o.o_orderdate AS ts,
       d.segment, d.bal
FROM orders o
LEFT JOIN dim d
  ON o.o_custkey = d.k
 AND o.o_orderdate >= d.valid_from
 AND (d.valid_to IS NULL OR o.o_orderdate < d.valid_to)
"""


def events_tumbling_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute windows (batch analog of the streaming window op;
    exact decimal sum so the oracle hash is stable)."""
    e = load_table(spark, sf_dir, "events")
    bucket = F.expr("timestamp_micros((unix_micros(ts) div 300000000) * 300000000)")
    return (
        e.withColumn("window_start", bucket)
        .groupBy("window_start", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )


SQL_TUMBLING = f"""
WITH {ORACLE_EV}
SELECT make_timestamp((epoch_us(ts) // 300000000) * 300000000) AS window_start,
       event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM ev
GROUP BY 1, 2
"""


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel (operators.funnel.funnel_counts):
    view → click → purchase within 7 days of the first view, each step
    strictly after the previous. The engine runs the single-shuffle
    collect+fold plan; the oracle replays the equivalent join-chain
    formulation — the two must agree exactly."""
    from changedatacapture_reporting_spark.operators.funnel import (
        funnel_counts,
    )

    e = load_table(spark, sf_dir, "events")
    return funnel_counts(
        e, ["view", "click", "purchase"], horizon="7 days"
    )


SQL_FUNNEL = f"""
WITH {ORACLE_EV},
s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM ev
  WHERE event_type = 'view' GROUP BY 1
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM ev e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t1
    AND e.ts <= s1.t1 + INTERVAL 7 DAY
  GROUP BY 1
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM ev e
  JOIN s2 ON e.user_id = s2.user_id
  JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
    AND e.ts <= s1.t1 + INTERVAL 7 DAY
  GROUP BY 1
)
SELECT CAST(1 AS INTEGER) AS step, 'view' AS step_name,
       (SELECT COUNT(*) FROM s1) AS n_users
UNION ALL
SELECT CAST(2 AS INTEGER), 'click', (SELECT COUNT(*) FROM s2)
UNION ALL
SELECT CAST(3 AS INTEGER), 'purchase', (SELECT COUNT(*) FROM s3)
"""


def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix (operators.cohort.cohort_retention):
    the stream collapses to the distinct (user, week) grid first; cohort
    assignment and the matrix both derive from the grid."""
    from changedatacapture_reporting_spark.operators.cohort import (
        cohort_retention,
    )

    e = load_table(spark, sf_dir, "events")
    return cohort_retention(e)


SQL_COHORT = f"""
WITH {ORACLE_EV},
grid AS (
  SELECT DISTINCT user_id AS u, CAST(date_trunc('week', ts) AS DATE) AS wk
  FROM ev
),
coh AS (SELECT u, MIN(wk) AS cohort_week FROM grid GROUP BY 1)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, wk) // 7 AS INTEGER) AS week_offset,
       COUNT(*) AS n_users
FROM grid JOIN coh USING (u)
GROUP BY 1, 2
"""


def events_distinct_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL distinct rollup (operators.sketches): one sketch per
    (event_type, day), UNIONED per event_type — the incremental
    COUNT(DISTINCT) pattern (sums can't roll distincts up; sketches
    union). Sketch bytes are engine-specific, so the hash-checked output
    is the accuracy-contract form (approx_distinct_stats precedent):
    exact counts plus an in-bounds boolean on the union estimate."""
    from changedatacapture_reporting_spark.operators.sketches import (
        distinct_sketch_rollup,
        merge_sketch_rollups,
    )

    e = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    daily = distinct_sketch_rollup(e, "user_id", ["event_type", "day"])
    merged = merge_sketch_rollups(daily, ["event_type"]).select(
        "event_type", F.col("estimate").alias("union_est")
    )
    per_day = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_daily_sketches")
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_users")
    )
    return (
        exact.join(merged, "event_type")
        .join(per_day, "event_type")
        .select(
            "event_type",
            "exact_users",
            "n_daily_sketches",
            (
                F.abs(F.col("union_est") - F.col("exact_users"))
                <= F.col("exact_users") * 0.05
            ).alias("union_est_ok"),
        )
    )


SQL_SKETCH_ROLLUP = f"""
WITH {ORACLE_EV}
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_daily_sketches,
       TRUE AS union_est_ok
FROM ev
GROUP BY 1
"""


def events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters (operators.frequent.heavy_hitters): users in
    ≥ 0.75% of events, found by the two-pass MG-summary + exact-verify
    plan — no full-cardinality shuffle ever happens, but the RESULT is
    byte-identical to the naive GROUP BY … HAVING the oracle runs."""
    from changedatacapture_reporting_spark.operators.frequent import (
        heavy_hitters,
    )

    e = load_table(spark, sf_dir, "events")
    return heavy_hitters(e, "user_id", 0.0075)


SQL_HEAVY_HITTERS = f"""
WITH {ORACLE_EV}
SELECT user_id AS item, COUNT(*) AS n
FROM ev
WHERE user_id IS NOT NULL
GROUP BY 1
HAVING COUNT(*) >= CEIL(0.0075 * (
  SELECT COUNT(user_id) FROM ev))
"""


def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable fixed-grid histogram rollup (operators.sketches): one
    tiny histogram per (event_type, day), ADDED (exact merge — the
    quantile analog of the HLL union) into per-event_type histograms,
    then P50/P95 brackets from the cumulative bins. Because histogram
    addition is lossless, the oracle can bin DIRECTLY (ignoring the
    daily stage) and must land on identical brackets — the contract
    therefore proves the merge is exact, not approximately close."""
    from changedatacapture_reporting_spark.operators.sketches import (
        fixed_width_histogram,
        histogram_quantiles,
        merge_histograms,
    )

    e = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    daily = fixed_width_histogram(
        e, "value", ["event_type", "day"], 0.0, 500.0, 40
    )
    merged = merge_histograms(daily, ["event_type"])
    return histogram_quantiles(merged, ["event_type"], [0.5, 0.95])


SQL_VALUE_HISTOGRAM = f"""
WITH {ORACLE_EV},
h AS (
  SELECT event_type,
         CAST(LEAST(GREATEST(FLOOR(CAST(value AS DOUBLE) / 12.5), 0), 39)
              AS INTEGER) AS bin,
         COUNT(*) AS n
  FROM ev WHERE value IS NOT NULL
  GROUP BY 1, 2
),
c AS (
  SELECT event_type, bin, n,
         SUM(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
         SUM(n) OVER (PARTITION BY event_type) AS total
  FROM h
)
SELECT event_type, CAST(0.5 AS DOUBLE) AS q,
       CAST(MIN(CASE WHEN cum >= CEIL(0.5 * total) THEN bin END) * 12.5
            AS DOUBLE) AS q_lo,
       CAST((MIN(CASE WHEN cum >= CEIL(0.5 * total) THEN bin END) + 1) * 12.5
            AS DOUBLE) AS q_hi
FROM c GROUP BY 1
UNION ALL
SELECT event_type, CAST(0.95 AS DOUBLE),
       CAST(MIN(CASE WHEN cum >= CEIL(0.95 * total) THEN bin END) * 12.5
            AS DOUBLE),
       CAST((MIN(CASE WHEN cum >= CEIL(0.95 * total) THEN bin END) + 1) * 12.5
            AS DOUBLE)
FROM c GROUP BY 1
"""


def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: a >30-min silence starts a new session
    (lag + conditional cumsum — the batch equivalent of
    ``session_window``)."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_sess = F.when(
        gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    wc = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        e.withColumn("session_id", F.sum(new_sess).over(wc))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


SQL_SESSIONS = f"""
WITH {ORACLE_EV},
flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM sess
GROUP BY user_id, session_id
"""


def like_filter_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE pattern filtering (P8 analog in the data plane)."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_brand").like("Brand#1%") & F.col("p_type").like("%ECONOMY%"))
        .groupBy("p_brand", "p_type")
        .agg(F.count("*").alias("n_parts"))
    )


SQL_LIKE = """
SELECT p_brand, p_type, COUNT(*) AS n_parts
FROM part
WHERE p_brand LIKE 'Brand#1%' AND p_type LIKE '%ECONOMY%'
GROUP BY p_brand, p_type
"""


def scalar_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 scalar-function parity in the data plane: trim/lower/replace/
    concat/coalesce/date_format/interval-add (reference F1–F11)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    return o.select(
        "o_orderkey",
        F.lower(F.trim(F.col("o_orderpriority"))).alias("priority_lower"),
        F.replace(F.col("o_orderpriority"), F.lit("-"), F.lit("_")).alias("priority_snake"),
        F.concat(F.col("o_orderstatus"), F.lit(":"), F.col("o_orderpriority")).alias("status_tag"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("NOT_P")).alias("status_or_default"),
        F.date_format("o_orderdate", "MM/dd/yyyy").alias("order_date_us"),
        (F.col("o_orderdate") + F.expr("INTERVAL 1 MINUTE")).alias("plus_one_minute"),
        F.substring(F.col("o_orderpriority"), 1, 1).cast("int").alias("priority_rank"),
    )


SQL_SCALARS = """
SELECT o_orderkey,
       LOWER(TRIM(o_orderpriority)) AS priority_lower,
       REPLACE(o_orderpriority, '-', '_') AS priority_snake,
       o_orderstatus || ':' || o_orderpriority AS status_tag,
       COALESCE(NULLIF(o_orderstatus, 'P'), 'NOT_P') AS status_or_default,
       strftime(o_orderdate, '%m/%d/%Y') AS order_date_us,
       o_orderdate + INTERVAL 1 MINUTE AS plus_one_minute,
       CAST(SUBSTRING(o_orderpriority, 1, 1) AS INT) AS priority_rank
FROM orders
WHERE o_orderkey % 100 = 0
"""


def above_customer_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (the §2.12 decorrelation target): orders
    priced above their customer's own average. Catalyst decorrelates this
    into an aggregate + join — asserted in plan tests (no per-row
    subquery execution)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_sq")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey,
               CAST(FLOOR(o_totalprice) AS BIGINT) AS total_floor
        FROM orders_sq o
        WHERE o_totalprice > (SELECT AVG(i.o_totalprice)
                              FROM orders_sq i
                              WHERE i.o_custkey = o.o_custkey)
        """
    )


SQL_CORRELATED = """
SELECT o_orderkey, o_custkey, CAST(FLOOR(o_totalprice) AS BIGINT) AS total_floor
FROM orders o
WHERE o_totalprice > (SELECT AVG(i.o_totalprice) FROM orders i
                      WHERE i.o_custkey = o.o_custkey)
"""


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (status)/(priority)/() — the general form
    rollup/cube specialize."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT) AS revenue_floor
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


SQL_GROUPING_SETS = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT) AS revenue_floor
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def percentile_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation) of integer-floored spend
    per order status — the §2.12 quantile surface, kept on exact integers
    so the interpolation arithmetic is engine-identical."""
    o = load_table(spark, sf_dir, "orders")
    spend = F.floor("o_totalprice").cast("long")
    return (
        o.select("o_orderstatus", spend.alias("spend"))
        .groupBy("o_orderstatus")
        .agg(
            F.expr("percentile(spend, 0.5)").alias("p50"),
            F.expr("percentile(spend, 0.9)").alias("p90"),
            F.expr("percentile(spend, 0.99)").alias("p99"),
        )
    )


SQL_PERCENTILE = """
SELECT o_orderstatus,
       quantile_cont(CAST(FLOOR(o_totalprice) AS BIGINT), 0.5) AS p50,
       quantile_cont(CAST(FLOOR(o_totalprice) AS BIGINT), 0.9) AS p90,
       quantile_cont(CAST(FLOOR(o_totalprice) AS BIGINT), 0.99) AS p99
FROM orders
GROUP BY o_orderstatus
"""


def approx_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates (HyperLogLog++ / approx quantiles). Sketch
    estimates are engine-specific, so the contract output is exact counts
    plus IN-BOUNDS booleans (estimate within the configured error of the
    exact value, computed in the same query) — the oracle asserts the
    booleans are all true, making the sketch's accuracy contract itself
    the thing the driver hash-checks (VERDICT r01 item 5)."""
    l = load_table(spark, sf_dir, "lineitem")
    agg = l.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("a_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("a_parts"),
        F.percentile_approx("l_extendedprice", 0.5).alias("a_median"),
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    )
    within = lambda a, n: (  # noqa: E731 — 4σ of the rsd=2% HLL++ bound
        F.abs(F.col(a) - F.col(n)) <= F.col(n) * 0.08
    )
    return agg.select(
        "l_returnflag",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.col("n_parts").cast("long").alias("n_parts"),
        within("a_orders", "n_orders").alias("orders_est_ok"),
        within("a_parts", "n_parts").alias("parts_est_ok"),
        F.col("a_median").between(F.col("lo"), F.col("hi")).alias("median_est_ok"),
    )


SQL_APPROX_DISTINCT = """
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
       TRUE AS orders_est_ok,
       TRUE AS parts_est_ok,
       TRUE AS median_est_ok
FROM lineitem
GROUP BY l_returnflag
"""


def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampling — deterministic ~10% Bernoulli via content hashing: a row
    is in the sample iff the first two hex chars of md5(pk) < '1a'
    (26/256 ≈ 10.2%). Unlike ``df.sample()`` (per-partition XORShift —
    resample on repartition), a hash sample is stable under any
    partitioning/cluster layout AND replayable by any engine with md5 —
    giving this operator an exact SQL oracle. Scale: embarrassingly
    parallel, no shuffle, filter runs in the scan stage."""
    l = load_table(spark, sf_dir, "lineitem")
    key = F.concat_ws(":", F.col("l_orderkey"), F.col("l_linenumber"))
    return l.filter(F.substring(F.md5(key), 1, 2) < "1a").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


SQL_SAMPLE = """
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE substring(md5(CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)), 1, 2) < '1a'
"""


def range_join_order_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join (operators.range_join): every 1000th
    order opens a review window of (o_orderkey % 90) days; count and sum
    ALL orders (no key equality!) whose order date falls inside each
    window. Bucketed equi-join — the plan must contain no nested loop."""
    from changedatacapture_reporting_spark.operators.range_join import (
        point_in_interval_join,
    )

    o = load_table(spark, sf_dir, "orders")
    day = F.unix_date(F.to_date("o_orderdate")).cast("long")
    points = o.select(
        day.alias("day"), F.col("o_totalprice").cast("decimal(12,2)").alias("price")
    )
    intervals = o.filter(F.col("o_orderkey") % 1000 == 0).select(
        F.col("o_orderkey").alias("interval_id"),
        day.alias("start_day"),
        (day + F.col("o_orderkey") % 90).alias("end_day"),
    )
    joined = point_in_interval_join(
        points, intervals, "day", "start_day", "end_day", bucket_width=45
    )
    return joined.groupBy("interval_id").agg(
        F.count("*").alias("n_orders"),
        F.sum("price").cast("double").alias("window_revenue"),
    )


SQL_RANGE_JOIN = """
WITH intervals AS (
  SELECT o_orderkey AS interval_id,
         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS start_day,
         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
           + o_orderkey % 90 AS end_day
  FROM orders WHERE o_orderkey % 1000 = 0
)
SELECT i.interval_id,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(p.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS window_revenue
FROM orders p
JOIN intervals i
  ON CAST(CAST(p.o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
     BETWEEN i.start_day AND i.end_day
GROUP BY i.interval_id
"""


def q4_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per-priority count of orders having at least one
    lineitem shipped >60 days after the order date — a LEFT SEMI join
    whose condition spans both sides (not just the key), so the predicate
    evaluates inside the join, and each order counts once no matter how
    many lineitems qualify (the reason EXISTS ≠ inner join here)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    l = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (o.o_orderkey == l.l_orderkey)
        & (l.l_shipdate > F.date_add(F.col("o_orderdate"), 60)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


SQL_Q4 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
"""


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations by year —
    a 5-way join where both nation sides must broadcast (they're tiny)
    and the fact-side shuffle is only lineitem⋈orders."""
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") <= "1996-12-31")
    )
    disc_f = (F.lit(1) - F.col("l_discount")).cast("decimal(6,4)")
    # fixture nations are NATION_0..24 — using names that exist keeps this
    # contract non-vacuous (ADVICE r01: FRANCE/GERMANY matched zero rows)
    pair = (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_9")
    rpair = (F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_3")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair | rpair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.sum(_dec("l_extendedprice") * disc_f).cast("double").alias("volume"))
    )


SQL_Q7 = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       EXTRACT(YEAR FROM l_shipdate) AS l_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(6,4))) AS DOUBLE) AS volume
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_9')
       OR (n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_3'))
GROUP BY 1, 2, 3
"""


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer distribution by order count — LEFT OUTER
    join so zero-order customers survive into the c_count=0 bucket, then a
    second aggregation over the first's output."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


SQL_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) per_cust
GROUP BY c_count
"""


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total lineitem quantity exceeds a
    threshold (aggregate-HAVING subquery used as a semi-join filter),
    joined back to customer. The having-aggregate runs FIRST and is tiny,
    so it broadcasts into the orders scan."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            # raw double passthrough (no aggregation → bit-identical in both
            # engines; a decimal output would normalize differently)
            "o_totalprice",
            F.col("total_qty").cast("double").alias("total_qty"),
        )
    )


SQL_Q18 = """
SELECT c_name, c_custkey, o_orderkey,
       o_totalprice,
       CAST(total_qty AS DOUBLE) AS total_qty
FROM orders
JOIN (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 250
) big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's revenue share per year — a
    conditional-aggregate ratio over a 5-way join (the share numerator is
    a CASE inside the sum, so one pass computes both terms; no self-join)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    rev = (_dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast(
        "decimal(6,4)"
    )).alias("rev")
    base = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(F.year("o_orderdate").alias("o_year"), "n_name", rev)
    )
    zero = F.lit(0).cast("decimal(12,2)")
    return base.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("n_name") == "NATION_9", F.col("rev")).otherwise(zero))
            .cast("double")
            / F.sum("rev").cast("double")
        ).alias("mkt_share")
    )


SQL_Q8 = """
SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
       CAST(SUM(CASE WHEN n_name = 'NATION_9'
                THEN CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(6,4))
                ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(6,4))) AS DOUBLE)
       AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  AND p_type = 'ECONOMY'
GROUP BY 1
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and year for parts whose
    name matches a substring — LIKE pushdown on the broadcast dim, then a
    two-key rollup of the fact join."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    amount = _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast(
        "decimal(6,4)"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


SQL_Q9 = """
SELECT n_name AS nation, EXTRACT(YEAR FROM o_orderdate) AS o_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(6,4))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregate ratio (promo revenue share
    in a shipdate window). Both legs decimal-exact; the ratio computed
    double-from-decimal identically on both engines."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01")
    )
    p = load_table(spark, sf_dir, "part")
    amount = _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast(
        "decimal(6,4)"
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", amount)).alias("_promo"),
            F.sum(amount).alias("_total"),
        )
        .select(
            F.round(
                F.lit(100.0)
                * F.col("_promo").cast("double")
                / F.col("_total").cast("double"),
                6,
            ).alias("promo_pct")
        )
    )


SQL_Q14 = """
SELECT round(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(6,4)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(6,4))) AS DOUBLE), 6)
       AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average — revenue of lines
    whose quantity is below 20% of that part's average quantity, for one
    brand. Decorrelated as an aggregate + broadcast join (the per-part
    avg table is |parts|-sized, a dim)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#9")
    per_part = l.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.avg("l_quantity").alias("_avg_qty")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(per_part), l.l_partkey == F.col("_pk"))
        .filter(F.col("l_quantity") < 0.2 * F.col("_avg_qty"))
        .agg(
            F.sum(_dec("l_extendedprice")).cast("double").alias("small_qty_revenue"),
            F.count("*").cast("long").alias("n_lines"),
        )
    )


SQL_Q17 = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS small_qty_revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN (SELECT l_partkey AS _pk, AVG(l_quantity) AS _avg_qty
      FROM lineitem GROUP BY 1) ON l_partkey = _pk
WHERE p_brand = 'Brand#9' AND l_quantity < 0.2 * _avg_qty
"""


def q19_disjunctive_brackets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs bracket predicate across the join
    (brand × size × quantity windows) — exercises Catalyst disjunction
    handling and join-predicate pushdown."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    amount = _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast(
        "decimal(6,4)"
    )
    brackets = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#20")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(brackets)
        .agg(
            F.sum(amount).cast("double").alias("revenue"),
            F.count("*").cast("long").alias("n_lines"),
        )
    )


SQL_Q19 = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(6,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


def q21_single_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted to the fixture's columns): the double
    EXISTS / NOT EXISTS self-join on lineitem — suppliers having a line
    in a multi-line order where NO other supplier appears. Expressed as
    semi + anti self-joins, counted per supplier."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    l1 = l.alias("l1")
    l2 = l.alias("l2")
    l3 = l.alias("l3")
    multi = l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_linenumber") != F.col("l2.l_linenumber")),
        "left_semi",
    )
    only_supp = multi.join(
        l3,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
        "left_anti",
    )
    return (
        only_supp.join(F.broadcast(s), F.col("l1.l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("n_lines"))
    )


SQL_Q21 = """
SELECT s_name, COUNT(*) AS n_lines
FROM lineitem l1 JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_linenumber <> l1.l_linenumber)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
"""


def q10_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer —
    3-way fact join filtered on the return flag, grouped by the customer
    dim, top-20 with a deterministic tiebreak."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    amount = _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast(
        "decimal(6,4)"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(amount).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


SQL_Q10 = """
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(6,4))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the revenue "view" (per-supplier total in a
    shipdate window) consumed twice — once aggregated to its max, once
    filtered to the suppliers achieving it. Decimal-exact so the
    max-equality join can't be broken by float summation order."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-07-01")
    )
    s = load_table(spark, sf_dir, "supplier")
    amount = _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast(
        "decimal(6,4)"
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(amount).alias("total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("_max"))
    return (
        revenue.join(F.broadcast(top), F.col("total_revenue") == F.col("_max"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


SQL_Q15 = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(6,4))) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-07-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
FROM revenue JOIN supplier ON supplier_no = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balance and
    no URGENT orders (every fixture customer has SOME order, so the
    literal no-orders form would be vacuous) — scalar-subquery threshold
    + anti join, grouped by nation. The threshold is collected to a
    literal (one scalar — the idiomatic decorrelation; a broadcast
    theta-join of the 1-row aggregate plans as a nested loop that the
    audit would rightly flag on any bigger build side). Balance sums
    decimal-cast for order-independence."""
    c = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    threshold = (
        c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal")).head()[0]
    )
    rich = c.filter(F.col("c_acctbal") > F.lit(threshold))
    idle = rich.join(urgent, rich.c_custkey == urgent.o_custkey, "left_anti")
    return idle.groupBy("c_nationkey").agg(
        F.count("*").cast("long").alias("n_custs"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_bal"),
    )


SQL_Q22 = """
SELECT c_nationkey, COUNT(*) AS n_custs,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY 1
"""


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: the fixture has no partsupp table, so the
    (part, supplier) supply-cost relation is derived from lineitem as the
    MIN observed unit price). Correlated-MIN subquery decorrelated to a
    per-part aggregate + equi-join on the exact min; all dims broadcast;
    deterministic ORDER BY + LIMIT top-100. The double division is
    bit-identical in both engines, so the min-equality join is safe."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") % 10 == 5)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")

    ps = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
            "supply_cost"
        )
    )
    cost = (
        ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .join(F.broadcast(s), ps.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "p_partkey", "p_name", "s_name", "s_acctbal", "n_name",
            "supply_cost",
        )
    )
    wmin = cost.groupBy(F.col("p_partkey").alias("_pk")).agg(
        F.min("supply_cost").alias("_min_cost")
    )
    return (
        cost.join(
            wmin,
            (cost.p_partkey == wmin._pk)
            & (cost.supply_cost == wmin._min_cost),
        )
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            "supply_cost",
        )
        .orderBy(F.desc("s_acctbal"), "s_name", "p_partkey")
        .limit(100)
    )


SQL_Q2 = """
WITH ps AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS supply_cost
  FROM lineitem GROUP BY 1, 2
),
cost AS (
  SELECT p_partkey, p_name, s_name, s_acctbal, n_name, supply_cost
  FROM ps
  JOIN part ON l_partkey = p_partkey AND p_size % 10 = 5
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supply_cost
FROM cost
WHERE supply_cost = (SELECT MIN(supply_cost) FROM cost c2
                     WHERE c2.p_partkey = cost.p_partkey)
ORDER BY s_acctbal DESC, s_name, p_partkey
LIMIT 100
"""


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-group value share vs a GLOBAL scalar (HAVING
    value > fraction of total). Value per part from ASIA-region suppliers;
    decimal-exact sums so the threshold comparison is engine-identical;
    the one-row total is broadcast, not recomputed per group."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    val = _dec("l_extendedprice") * _dec("l_quantity")
    asia = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey")
    )
    grouped = (
        l.join(F.broadcast(asia), l.l_suppkey == asia.s_suppkey)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(val).alias("_value"))
    )
    total = grouped.agg(F.sum("_value").alias("_total"))
    return (
        grouped.crossJoin(F.broadcast(total))
        .filter(F.col("_value") > F.col("_total") * F.lit(0.0001).cast("decimal(5,4)"))
        .select(
            "partkey", F.col("_value").cast("double").alias("part_value")
        )
    )


SQL_Q11 = """
WITH grouped AS (
  SELECT l_partkey AS partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * CAST(l_quantity AS DECIMAL(12,2))) AS value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
  GROUP BY 1
)
SELECT partkey, CAST(value AS DOUBLE) AS part_value
FROM grouped
WHERE value > (SELECT SUM(value) FROM grouped) * CAST(0.0001 AS DECIMAL(5,4))
"""


def q12_shipping_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: the fixture lineitem has no shipmode /
    commit / receipt dates, so the category is the order→ship LATENCY
    bucket): CASE-bucketed conditional counting of high- vs low-priority
    orders per class — one scan, one aggregation."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    latency = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    cls = (
        F.when(latency <= 30, F.lit("fast"))
        .when(latency <= 90, F.lit("medium"))
        .otherwise(F.lit("slow"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(cls.alias("latency_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias(
                "high_line_count"
            ),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias(
                "low_line_count"
            ),
        )
    )


SQL_Q12 = """
SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                           CAST(l_shipdate AS DATE)) <= 30 THEN 'fast'
            WHEN date_diff('day', CAST(o_orderdate AS DATE),
                           CAST(l_shipdate AS DATE)) <= 90 THEN 'medium'
            ELSE 'slow' END AS latency_class,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


def q16_supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: DISTINCT supplier count per part attribute group,
    minus a NOT-IN supplier subquery (negative balance here standing in
    for the complaint filter). NOT IN is a broadcast anti-join — never a
    per-row subquery."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


SQL_Q16 = """
SELECT p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2
"""


def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: availqty derived from shipped volume):
    suppliers who shipped MORE THAN HALF of some part's total 1996 volume
    — a nested semi-join chain (shipped → per-part total → qualifying
    suppliers → supplier/nation dims). The threshold compare doubles the
    decimal (qty * 2 > total) instead of multiplying by 0.5, keeping the
    comparison exact in both engines."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")

    shipped = l.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_dec("l_quantity")).alias("qty")
    )
    tot = shipped.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.sum("qty").alias("total_qty")
    )
    excess = (
        shipped.join(tot, shipped.l_partkey == tot._pk)
        .filter(F.col("qty") * 2 > F.col("total_qty"))
        .select("l_suppkey")
    )
    return (
        s.join(excess, s.s_suppkey == excess.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


SQL_Q20 = """
WITH shipped AS (
  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY 1, 2
),
tot AS (SELECT l_partkey, SUM(qty) AS total_qty FROM shipped GROUP BY 1)
SELECT s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (SELECT l_suppkey FROM shipped JOIN tot USING (l_partkey)
                    WHERE qty * 2 > total_qty)
ORDER BY s_name
"""


def profile_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew report (operators.profile.key_skew) over the
    events fact's user_id — the diagnostic run before a big join to
    choose plain-shuffle vs broadcast vs salting. One map-side-
    combinable aggregation to distinct-key scale, a 20-row TakeOrdered,
    and the 1-row totals folded in by a constant-key broadcast hash
    join. All-integer output, so the skew ratio is derivable exactly."""
    from changedatacapture_reporting_spark.operators.profile import key_skew

    return key_skew(load_table(spark, sf_dir, "events"), "user_id", 20)


SQL_KEY_SKEW = """
WITH counts AS (
  SELECT user_id AS key, COUNT(*) AS n_rows FROM events GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n_rows) AS BIGINT) AS total_rows,
         COUNT(*) AS n_keys
  FROM counts
),
top AS (
  SELECT key, n_rows,
         CAST(ROW_NUMBER() OVER (ORDER BY n_rows DESC, key) AS INT) AS rank
  FROM counts ORDER BY n_rows DESC, key LIMIT 20
)
SELECT key, n_rows, rank, total_rows, n_keys FROM top, tot
"""


def _zorder_sql() -> str:
    """The morton-interleave mirror, generated term-by-term with the
    same bit arithmetic operators/layout.py builds as Spark expressions."""
    terms = []
    for i in range(10):
        terms.append(f"(((x >> {i}) & 1) << {2 * i})")
        terms.append(f"(((y >> {i}) & 1) << {2 * i + 1})")
    z = " + ".join(terms)
    return f"""
WITH dims AS (
  SELECT user_id % 1024 AS x,
         CAST(FLOOR(date_part('epoch', ts) / 60) AS BIGINT) % 1024 AS y
  FROM events
),
zvals AS (SELECT x, y, ({z}) AS z FROM dims)
SELECT z >> 16 AS zbucket, COUNT(*) AS n_rows,
       MIN(x) AS min_x, MAX(x) AS max_x,
       MIN(y) AS min_y, MAX(y) AS max_y
FROM zvals
GROUP BY 1
"""


SQL_ZORDER = _zorder_sql()


def layout_zorder_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout report (operators.layout.zorder_bucket_stats):
    bucket the events fact by the top 4 bits of the Morton interleave
    of (user_id mod 1024, epoch-minute mod 1024) — the file/task
    boundaries a z-ordered rewrite would produce — and emit each
    bucket's bounding box in BOTH original dimensions. Tight boxes in
    both columns = min/max file stats prune either predicate; this
    one-scan report is what you run before paying for the 100 TB
    rewrite (operators.layout.write_zordered). Pure integer expressions
    (scan-stage, engine-portable), one hash aggregation."""
    from changedatacapture_reporting_spark.operators.layout import (
        zorder_bucket_stats,
    )

    e = load_table(spark, sf_dir, "events")
    return zorder_bucket_stats(
        e,
        x=F.col("user_id") % 1024,
        y=F.floor(F.col("ts").cast("long") / 60) % 1024,
        bits=10,
        n_buckets=16,
    )


def dq_scd2_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 interval-integrity audit (operators.scd.scd2_validate): a
    two-version-per-key history fabricated from orders, deterministically
    corrupted (key%7: v1 end overruns v2 start → overlap; key%11: v1
    left open → open_not_last + noncurrent_open; key%13: v1 also flagged
    current → current_closed + multiple_current on both rows), then
    audited. Output is violation-sized; the oracle replays the
    fabrication, the corruption, and every window rule."""
    from changedatacapture_reporting_spark.operators.scd import scd2_validate

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    k = F.col("o_orderkey")
    day = lambda n: F.expr(f"INTERVAL {n} DAYS")  # noqa: E731
    v1 = o.select(
        k.alias("o_orderkey"),
        F.col("o_orderdate").alias("valid_from"),
        F.when(k % 11 == 0, F.lit(None).cast("timestamp"))
        .when(k % 7 == 0, F.col("o_orderdate") + day(40))
        .otherwise(F.col("o_orderdate") + day(30))
        .alias("valid_to"),
        (k % 13 == 0).alias("is_current"),
    )
    v2 = o.select(
        k.alias("o_orderkey"),
        (F.col("o_orderdate") + day(30)).alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return scd2_validate(v1.unionByName(v2), ["o_orderkey"])


SQL_SCD2_VALIDATE = """
WITH hist AS (
  SELECT o_orderkey, o_orderdate AS valid_from,
         CASE WHEN o_orderkey % 11 = 0 THEN NULL
              WHEN o_orderkey % 7 = 0 THEN o_orderdate + INTERVAL 40 DAY
              ELSE o_orderdate + INTERVAL 30 DAY END AS valid_to,
         o_orderkey % 13 = 0 AS is_current
  FROM orders
  UNION ALL
  SELECT o_orderkey, o_orderdate + INTERVAL 30 DAY, NULL, TRUE FROM orders
),
w AS (
  SELECT *,
         LEAD(valid_from) OVER (PARTITION BY o_orderkey
                                ORDER BY valid_from, valid_to NULLS LAST)
           AS nxt,
         SUM(CASE WHEN is_current THEN 1 ELSE 0 END)
           OVER (PARTITION BY o_orderkey) AS n_current
  FROM hist
)
SELECT o_orderkey, valid_from, violation FROM (
  SELECT o_orderkey, valid_from, 'overlap' AS violation FROM w
  WHERE valid_to IS NOT NULL AND nxt IS NOT NULL AND valid_to > nxt
  UNION ALL
  SELECT o_orderkey, valid_from, 'open_not_last' FROM w
  WHERE valid_to IS NULL AND nxt IS NOT NULL
  UNION ALL
  SELECT o_orderkey, valid_from, 'current_closed' FROM w
  WHERE is_current AND valid_to IS NOT NULL
  UNION ALL
  SELECT o_orderkey, valid_from, 'noncurrent_open' FROM w
  WHERE NOT is_current AND valid_to IS NULL
  UNION ALL
  SELECT o_orderkey, valid_from, 'multiple_current' FROM w
  WHERE is_current AND n_current > 1
)
"""


def profile_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pre-join cardinality report (operators.profile.
    join_cardinality) for orders ⋈ customer on custkey — the join's
    output size, match rates, and worst single-key blowup computed from
    two key-column-only aggregations plus a distinct-key-scale join,
    never the join itself. All-integer output."""
    from changedatacapture_reporting_spark.operators.profile import (
        join_cardinality,
    )

    return join_cardinality(
        load_table(spark, sf_dir, "orders"),
        "o_custkey",
        load_table(spark, sf_dir, "customer"),
        "c_custkey",
    )


SQL_JOIN_CARDINALITY = """
WITH lc AS (SELECT o_custkey AS k, COUNT(*) AS cl FROM orders GROUP BY 1),
rc AS (SELECT c_custkey AS k, COUNT(*) AS cr FROM customer GROUP BY 1),
m AS (SELECT cl * cr AS prod FROM lc JOIN rc USING (k))
SELECT (SELECT CAST(SUM(cl) AS BIGINT) FROM lc) AS n_left,
       (SELECT COUNT(*) FROM lc) AS d_left,
       (SELECT CAST(SUM(cr) AS BIGINT) FROM rc) AS n_right,
       (SELECT COUNT(*) FROM rc) AS d_right,
       (SELECT COUNT(*) FROM m) AS d_matched,
       (SELECT CAST(COALESCE(SUM(prod), 0) AS BIGINT) FROM m) AS out_rows,
       (SELECT CAST(COALESCE(MAX(prod), 0) AS BIGINT) FROM m) AS max_key_out
"""


REGISTRY_RELATIONAL = {
    "profile_key_skew": (profile_key_skew, SQL_KEY_SKEW),
    "layout_zorder_events": (layout_zorder_events, SQL_ZORDER),
    "dq_scd2_validate": (dq_scd2_validate, SQL_SCD2_VALIDATE),
    "profile_join_cardinality": (
        profile_join_cardinality,
        SQL_JOIN_CARDINALITY,
    ),
    "q1_pricing_summary": (q1_pricing_summary, SQL_Q1),
    "q3_top_unshipped": (q3_top_unshipped, SQL_Q3),
    "q5_region_revenue": (q5_region_revenue, SQL_Q5),
    "q6_revenue_forecast": (q6_revenue_forecast, SQL_Q6),
    "topk_orders_per_customer": (topk_orders_per_customer, SQL_TOPK),
    "running_total_per_customer": (running_total_per_customer, SQL_RUNNING),
    "order_gaps": (order_gaps, SQL_GAPS),
    "part_price_ranks": (part_price_ranks, SQL_RANKS),
    "customers_with_urgent_orders": (customers_with_urgent_orders, SQL_SEMI),
    "customers_without_orders": (customers_without_orders, SQL_ANTI),
    "order_priority_stats": (order_priority_stats, SQL_DISTINCT_AGG),
    "rollup_order_revenue": (rollup_order_revenue, SQL_ROLLUP),
    "cube_lineitem_counts": (cube_lineitem_counts, SQL_CUBE),
    "nation_presence_setops": (nation_presence_setops, SQL_SETOPS),
    "pivot_status_by_priority": (pivot_status_by_priority, SQL_PIVOT),
    "json_props_stats": (json_props_stats, SQL_JSON),
    "asof_signup_attribution": (asof_signup_attribution, SQL_ASOF),
    "scd2_pointintime_enrich": (scd2_pointintime_enrich, SQL_SCD2_ENRICH),
    "dq_orders_expectations": (dq_orders_expectations, SQL_DQ_ORDERS),
    "salted_join_segment_revenue": (salted_join_segment_revenue, SQL_SALTED_JOIN),
    "fuzzy_match_customers": (fuzzy_match_customers, SQL_FUZZY_MATCH),
    "profile_lineitem_correlations": (profile_lineitem_correlations, SQL_CORRELATIONS),
    "events_tumbling_5min": (events_tumbling_5min, SQL_TUMBLING),
    "events_sessionization": (events_sessionization, SQL_SESSIONS),
    "events_funnel": (events_funnel, SQL_FUNNEL),
    "events_cohort_retention": (events_cohort_retention, SQL_COHORT),
    "events_distinct_sketch_rollup": (events_distinct_sketch_rollup, SQL_SKETCH_ROLLUP),
    "events_heavy_hitters": (events_heavy_hitters, SQL_HEAVY_HITTERS),
    "events_value_histogram": (events_value_histogram, SQL_VALUE_HISTOGRAM),
    "like_filter_parts": (like_filter_parts, SQL_LIKE),
    "scalar_functions_showcase": (scalar_functions_showcase, SQL_SCALARS),
    "above_customer_avg_orders": (above_customer_avg_orders, SQL_CORRELATED),
    "grouping_sets_revenue": (grouping_sets_revenue, SQL_GROUPING_SETS),
    "percentile_spend": (percentile_spend, SQL_PERCENTILE),
    "approx_distinct_stats": (approx_distinct_stats, SQL_APPROX_DISTINCT),
    "deterministic_sample": (deterministic_sample, SQL_SAMPLE),
    "range_join_order_windows": (range_join_order_windows, SQL_RANGE_JOIN),
    "q4_late_orders": (q4_late_orders, SQL_Q4),
    "q7_nation_volume": (q7_nation_volume, SQL_Q7),
    "q13_order_count_distribution": (q13_order_count_distribution, SQL_Q13),
    "q18_large_volume_customers": (q18_large_volume_customers, SQL_Q18),
    "q8_market_share": (q8_market_share, SQL_Q8),
    "q9_product_profit": (q9_product_profit, SQL_Q9),
    "q14_promo_revenue": (q14_promo_revenue, SQL_Q14),
    "q17_small_quantity_revenue": (q17_small_quantity_revenue, SQL_Q17),
    "q19_disjunctive_brackets": (q19_disjunctive_brackets, SQL_Q19),
    "q21_single_supplier_orders": (q21_single_supplier_orders, SQL_Q21),
    "q10_returned_item_revenue": (q10_returned_item_revenue, SQL_Q10),
    "q15_top_supplier": (q15_top_supplier, SQL_Q15),
    "q22_idle_rich_customers": (q22_idle_rich_customers, SQL_Q22),
    "q2_min_cost_supplier": (q2_min_cost_supplier, SQL_Q2),
    "q11_important_parts": (q11_important_parts, SQL_Q11),
    "q12_shipping_latency": (q12_shipping_latency, SQL_Q12),
    "q16_supplier_count_by_part": (q16_supplier_count_by_part, SQL_Q16),
    "q20_excess_suppliers": (q20_excess_suppliers, SQL_Q20),
}
