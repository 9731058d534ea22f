"""Incremental aggregate maintenance invariants: for RANDOM op
histories split at a RANDOM point, maintaining the pre-split aggregate
with the post-split deltas equals the from-scratch GROUP BY of the
final state — including group-key moves, groups born and dying
mid-stream, and NULL group keys."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from changedatacapture_reporting_spark.operators.incremental_agg import (
    aggregate_deltas,
    merge_aggregate,
)

SRC = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("grp", T.StringType()),
        T.StructField("qty", T.LongType()),
    ]
)
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("commit_ts", T.TimestampType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("table_name", T.StringType(), False),
        T.StructField("before", SRC, True),
        T.StructField("after", SRC, True),
    ]
)

step = st.tuples(
    st.sampled_from(["insert", "set_grp", "set_qty", "delete"]),
    st.one_of(st.none(), st.sampled_from(["a", "b", "c"]), st.integers(0, 9)),
)
corpus = st.dictionaries(st.integers(1, 6), st.lists(step, max_size=5), max_size=5)


def _events_and_states(corpus, split_frac):
    """Build a sanitized event list; return (rows, split_lsn, state@split,
    final state) where states map id -> (grp, qty)."""
    rows, lsn = [], 0
    base = dt.datetime(2024, 1, 1)
    alive: dict[int, dict] = {}
    queues = {k: list(steps) for k, steps in sorted(corpus.items())}
    while any(queues.values()):
        for key in sorted(queues):
            if not queues[key]:
                continue
            kind, val = queues[key].pop(0)
            lsn += 1
            ts = base + dt.timedelta(minutes=lsn)
            if key not in alive:
                grp = val if isinstance(val, str) else None
                alive[key] = {"grp": grp, "qty": lsn % 5}
                rows.append(
                    (lsn, 0, ts, "insert", "t", None, (key, grp, lsn % 5))
                )
                continue
            st_ = alive[key]
            before = (key, st_["grp"], st_["qty"])
            if kind == "delete":
                del alive[key]
                rows.append((lsn, 0, ts, "delete", "t", before, None))
            else:
                if kind == "set_grp":
                    st_["grp"] = val if isinstance(val, str) else None
                elif kind == "set_qty" and isinstance(val, int):
                    st_["qty"] = val
                rows.append(
                    (lsn, 0, ts, "update", "t", before,
                     (key, st_["grp"], st_["qty"]))
                )
    if not rows:
        return rows, 0, {}, {}
    split_lsn = int(len(rows) * split_frac)
    return rows, split_lsn, _replay(rows, split_lsn), _replay(rows, lsn)


def _replay(rows, upto):
    state = {}
    for lsn, _seq, _ts, op, _t, before, after in rows:
        if lsn > upto:
            break
        key = (after or before)[0]
        if op == "delete":
            state.pop(key, None)
        else:
            state[key] = (after[1], after[2])
    return state


def _direct_agg(state):
    out = {}
    for _id, (grp, qty) in state.items():
        n, s = out.get(grp, (0, 0))
        out[grp] = (n + 1, s + qty)
    return out


@given(corpus=corpus, frac=st.floats(0.0, 1.0))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_maintained_equals_direct(spark, corpus, frac):
    rows, split_lsn, at_split, final = _events_and_states(corpus, frac)
    if not rows:
        return
    events = spark.createDataFrame(rows, EVENT_SCHEMA).localCheckpoint()

    base_rows = [
        (grp, n, s) for grp, (n, s) in _direct_agg(at_split).items()
    ]
    agg0 = spark.createDataFrame(
        base_rows, "grp string, n_rows long, sum_qty long"
    )
    deltas = aggregate_deltas(
        events.filter(F.col("lsn") > split_lsn), ["grp"], {"sum_qty": "qty"}
    )
    got = {
        r.grp: (r.n_rows, r.sum_qty)
        for r in merge_aggregate(agg0, deltas, ["grp"]).collect()
    }
    assert got == _direct_agg(final), (split_lsn, rows)


def test_group_key_move_and_death(spark):
    """An update that moves a row between groups retracts from the old
    group and asserts into the new one; a group emptied by the batch
    disappears from the maintained view."""
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, 0, base, "update", "t", (1, "a", 5), (1, "b", 5)),
        (2, 0, base, "delete", "t", (2, "c", 9), None),
    ]
    events = spark.createDataFrame(rows, EVENT_SCHEMA)
    agg0 = spark.createDataFrame(
        [("a", 1, 5), ("c", 1, 9), ("z", 2, 4)],
        "grp string, n_rows long, sum_qty long",
    )
    deltas = aggregate_deltas(events, ["grp"], {"sum_qty": "qty"})
    got = {
        r.grp: (r.n_rows, r.sum_qty)
        for r in merge_aggregate(agg0, deltas, ["grp"]).collect()
    }
    assert got == {"b": (1, 5), "z": (2, 4)}


def test_merge_aggregate_materialize_guard(spark):
    """An unpersisted computed `agg` warns about the double reference;
    materialize=True silences it by checkpointing (scd2_merge parity)."""
    import warnings

    from pyspark.sql import functions as F

    base = spark.range(1000).select(
        (F.col("id") % 3).cast("string").alias("grp"),
        F.lit(1).alias("x"),
    )
    dim = spark.range(3).select(
        F.col("id").cast("string").alias("grp"), F.lit("d").alias("lbl")
    )
    computed = (
        base.join(dim, "grp")  # deep subtree — NOT a bare table scan
        .groupBy("grp")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("x").cast("long").alias("sum_qty"),
        )
    )
    deltas = spark.createDataFrame(
        [("0", 1, 5)], "grp string, n_rows long, sum_qty long"
    )
    def guard_warnings(ws):
        return [x for x in ws if "recomputed 2x" in str(x.message)]

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        merge_aggregate(computed, deltas, ["grp"]).collect()
    assert guard_warnings(w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        merge_aggregate(computed, deltas, ["grp"], materialize=True).collect()
    assert not guard_warnings(w)


def test_aggregate_deltas_rejects_float_and_keeps_decimal(spark):
    """Float measures raise (retraction drift); decimal measures keep
    their exact type end-to-end through delta + merge."""
    import pytest as _pytest
    from pyspark.sql import types as T

    src_f = T.StructType([
        T.StructField("grp", T.StringType()),
        T.StructField("x", T.DoubleType()),
    ])
    ev_f = spark.createDataFrame(
        [(None, ("a", 1.5))],
        T.StructType([
            T.StructField("before", src_f), T.StructField("after", src_f),
        ]),
    )
    with _pytest.raises(ValueError, match="exact type"):
        aggregate_deltas(ev_f, ["grp"], {"sx": "x"})

    src_d = T.StructType([
        T.StructField("grp", T.StringType()),
        T.StructField("x", T.DecimalType(12, 2)),
    ])
    from decimal import Decimal

    ev_d = spark.createDataFrame(
        [(None, ("a", Decimal("1.50"))), (("a", Decimal("0.25")), None)],
        T.StructType([
            T.StructField("before", src_d), T.StructField("after", src_d),
        ]),
    )
    deltas = aggregate_deltas(ev_d, ["grp"], {"sx": "x"})
    [row] = deltas.collect()
    assert row.n_rows == 0 and row.sx == Decimal("1.25")
    agg0 = spark.createDataFrame(
        [("a", 3, Decimal("10.00"))],
        "grp string, n_rows long, sx decimal(22,2)",
    )
    [out] = merge_aggregate(agg0, deltas, ["grp"]).collect()
    assert out.n_rows == 3 and out.sx == Decimal("11.25")


def test_merge_aggregate_overflow_raises(spark):
    """A widened delta sum that no longer fits the maintained measure
    type must RAISE, not silently write NULL (non-ANSI decimal cast
    overflow → NULL corrupts the view; ADVICE r8)."""
    from decimal import Decimal

    import pytest as _pytest

    agg0 = spark.createDataFrame(
        [("a", 1, Decimal("99.00"))],
        "grp string, n_rows long, sx decimal(4,2)",
    )
    deltas = spark.createDataFrame(
        [("a", 0, Decimal("5.00"))],
        "grp string, n_rows long, sx decimal(14,2)",
    )
    # ANSI mode (the session default): the cast itself raises; the
    # explicit guard covers non-ANSI deployments where the cast would
    # otherwise yield NULL silently — check BOTH.
    out = merge_aggregate(agg0, deltas, ["grp"])
    with _pytest.raises(
        Exception, match="overflow casting measure|NUMERIC_VALUE_OUT_OF_RANGE"
    ):
        out.collect()

    ansi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        with _pytest.raises(Exception, match="overflow casting measure"):
            merge_aggregate(agg0, deltas, ["grp"]).collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi)

    # a fitting merge still works bit-exactly
    deltas_ok = spark.createDataFrame(
        [("a", 0, Decimal("0.50"))],
        "grp string, n_rows long, sx decimal(14,2)",
    )
    [row] = merge_aggregate(agg0, deltas_ok, ["grp"]).collect()
    assert row.sx == Decimal("99.50")
