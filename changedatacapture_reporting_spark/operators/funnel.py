"""Ordered-sequence funnel analysis over an event stream — the classic
product-analytics query (view → click → purchase: who advanced how far,
and when) that CDC/event-log consumers run downstream of the changelog.

Semantics: for each user, step 1's time is the user's EARLIEST step-1
event; step i+1's time is the earliest step-(i+1) event STRICTLY after
step i's time (ties at identical timestamps do not advance the funnel);
optionally every later step must land within ``horizon`` of step 1
(conversion windows — "purchased within 7 days of first visit").

Plan shape (the 100 TB posture): NOT a k-way self-join chain (k − 1
shuffled joins, each rescanning the events). One pass:

1. filter to the step types (pushed to the scan),
2. ONE shuffle — groupBy(user).collect_list(ts, step) with map-side
   partial aggregation,
3. an expression-only fold (array_sort + F.aggregate) computes all k
   step times inside whole-stage codegen; per-user state is its own
   (filtered) events, never the stream.

The join-chain formulation is what the DuckDB oracle replays — the two
must agree exactly, which the contract hash-checks.

Skew note: per-user state is that user's own step-typed events. A
pathological key (a bot with millions of clicks) concentrates in one
task; if such keys exist, pre-filter them out (they are not funnel
subjects) or cap events per (user, step) to the earliest N before
calling — capping is an approximation only for users whose funnel
completes beyond their N-th event of a step.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_times(
    events: DataFrame,
    steps: list[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    horizon: str | None = None,
) -> DataFrame:
    """Per-user step completion times: (user, t1 … tk) — tk NULL where
    the funnel stalled. ``horizon`` (an INTERVAL string, e.g.
    ``'7 days'``) bounds steps 2…k relative to step 1's time."""
    k = len(steps)
    if k < 2:
        raise ValueError("a funnel needs at least two steps")
    step_idx = F.create_map(
        *[x for i, s in enumerate(steps) for x in (F.lit(s), F.lit(i))]
    )
    ev = (
        events.filter(F.col(type_col).isin(steps))
        .select(
            F.col(user_col).alias("user"),
            F.struct(
                F.col(ts_col).alias("ts"),
                step_idx[F.col(type_col)].alias("step"),
            ).alias("e"),
        )
        .groupBy("user")
        .agg(F.array_sort(F.collect_list("e")).alias("evs"))
    )

    init = F.struct(
        *[F.lit(None).cast("timestamp").alias(f"t{i + 1}") for i in range(k)]
    )

    def fold(acc: Column, e: Column) -> Column:
        fields = []
        for i in range(k):
            cur = acc[f"t{i + 1}"]
            cond = cur.isNull() & (e["step"] == i)
            if i > 0:
                prev = acc[f"t{i}"]
                cond = cond & prev.isNotNull() & (e["ts"] > prev)
                if horizon is not None:
                    cond = cond & (
                        e["ts"] <= acc["t1"] + F.expr(f"INTERVAL {horizon}")
                    )
            fields.append(
                F.coalesce(cur, F.when(cond, e["ts"])).alias(f"t{i + 1}")
            )
        return F.struct(*fields)

    times = F.aggregate(F.col("evs"), init, fold)
    return ev.select(
        F.col("user").alias(user_col),
        *[times[f"t{i + 1}"].alias(f"t{i + 1}") for i in range(k)],
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    horizon: str | None = None,
) -> DataFrame:
    """Funnel summary: (step, step_name, n_users) — users whose funnel
    reached at least this step. One tiny aggregation over funnel_times."""
    t = funnel_times(events, steps, ts_col, user_col, type_col, horizon)
    return (
        t.select(
            *[
                F.sum(F.col(f"t{i + 1}").isNotNull().cast("long")).alias(
                    f"n{i + 1}"
                )
                for i in range(len(steps))
            ]
        )
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i + 1).cast("int").alias("step"),
                            F.lit(s).alias("step_name"),
                            F.col(f"n{i + 1}").alias("n_users"),
                        )
                        for i, s in enumerate(steps)
                    ]
                )
            ).alias("r")
        )
        .select("r.step", "r.step_name", "r.n_users")
    )
