"""Net-changes collapse (operators.net_changes): the
fn_cdc_get_net_changes analog — one net row per key per window."""

from __future__ import annotations

import pytest

import datetime as dt

from pyspark.sql import types as T

from changedatacapture_reporting_spark.operators.net_changes import net_changes

SRC = T.StructType(
    [T.StructField("id", T.IntegerType()), T.StructField("v", T.StringType())]
)
SCHEMA = T.StructType(
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

TS = dt.datetime(2024, 1, 1, 12, 0)


def _events(spark):
    rows = [
        # key 1: insert → update → update  ⇒ net insert with FINAL image
        (1, 0, TS, "insert", "t", None, (1, "a")),
        (2, 0, TS, "update", "t", (1, "a"), (1, "b")),
        (3, 0, TS, "update", "t", (1, "b"), (1, "c")),
        # key 2: update → delete           ⇒ net delete with FIRST before
        (4, 0, TS, "update", "t", (2, "x"), (2, "y")),
        (5, 0, TS, "delete", "t", (2, "y"), None),
        # key 3: insert → delete           ⇒ net zero (no row)
        (6, 0, TS, "insert", "t", None, (3, "q")),
        (7, 0, TS, "delete", "t", (3, "q"), None),
        # key 4: delete → re-insert        ⇒ net update (existed both edges)
        (8, 0, TS, "delete", "t", (4, "old"), None),
        (9, 0, TS, "insert", "t", None, (4, "new")),
        # key 5: lone update               ⇒ net update unchanged
        (10, 0, TS, "update", "t", (5, "m"), (5, "n")),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_net_changes_semantics(spark):
    got = {r.id: r for r in net_changes(_events(spark), ["id"]).collect()}
    assert set(got) == {1, 2, 4, 5}  # key 3 nets to zero

    assert got[1].net_op == "insert"
    assert got[1].before is None and got[1].after.v == "c"
    assert got[1].last_lsn == 3

    assert got[2].net_op == "delete"
    assert got[2].before.v == "x" and got[2].after is None

    assert got[4].net_op == "update"
    assert (got[4].before.v, got[4].after.v) == ("old", "new")

    assert got[5].net_op == "update"
    assert (got[5].before.v, got[5].after.v) == ("m", "n")


def test_net_changes_lsn_window(spark):
    """The window bound changes which events are 'edges': restricting to
    lsn 2..5 makes key 1's first op an update (it 'existed before')."""
    got = {
        r.id: r
        for r in net_changes(
            _events(spark), ["id"], from_lsn=2, to_lsn=5
        ).collect()
    }
    assert set(got) == {1, 2}
    assert got[1].net_op == "update"
    assert (got[1].before.v, got[1].after.v) == ("a", "c")


def test_net_changes_plan_single_aggregate_no_join(spark):
    """One hash aggregation, zero joins — never a window sort of the
    full history."""
    plan = (
        net_changes(_events(spark), ["id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan


# ---------------------------------------------------------------------------
# property: net_changes == a Python reference fold, for ANY valid history
# and ANY window placement
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


def _interpret(draws):
    """Raw draws → a VALID CDC history over ids 1-4 (insert when absent,
    update/delete when present), one event per lsn."""
    alive: dict[int, tuple] = {}
    events = []
    lsn = 0
    for action, rid, v in draws:
        rid = rid % 4 + 1
        lsn += 1
        if rid not in alive:
            row = (rid, f"v{v}")
            events.append((lsn, 0, TS, "insert", "t", None, row))
            alive[rid] = row
        elif action == 0:
            events.append((lsn, 0, TS, "delete", "t", alive.pop(rid), None))
        else:
            old = alive[rid]
            new = (rid, f"v{v}")
            events.append((lsn, 0, TS, "update", "t", old, new))
            alive[rid] = new
    return events


def _reference_net(events, lo, hi):
    """Dead-simple per-key fold over the window — the semantics oracle."""
    window = [e for e in events if lo <= e[0] <= hi]
    by_key: dict[int, list] = {}
    for e in window:
        rid = (e[6] or e[5])[0]
        by_key.setdefault(rid, []).append(e)
    out = {}
    for rid, evs in by_key.items():
        first, last = evs[0], evs[-1]  # already lsn-ordered
        existed = first[3] != "insert"
        exists = last[3] != "delete"
        if not existed and not exists:
            continue
        op = ("update" if existed and exists
              else "insert" if exists else "delete")
        out[rid] = (
            op,
            first[5][1] if existed else None,
            last[6][1] if exists else None,
            last[0],
        )
    return out


@settings(max_examples=5, deadline=None)
@given(
    draws=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(0, 9)),
        min_size=3,
        max_size=18,
    ),
    win=st.tuples(st.floats(0.0, 1.0), st.floats(0.0, 1.0)),
)
def test_net_changes_matches_reference_fold(spark, draws, win):
    events = _interpret(draws)
    n = len(events)
    lo, hi = sorted((max(1, int(w * n)) for w in win))
    got = {
        r.id: (
            r.net_op,
            r.before.v if r.before else None,
            r.after.v if r.after else None,
            r.last_lsn,
        )
        for r in net_changes(
            spark.createDataFrame(events, SCHEMA), ["id"],
            from_lsn=lo, to_lsn=hi,
        ).collect()
    }
    assert got == _reference_net(events, lo, hi)


def test_column_churn_counts(spark):
    """Hand-checked churn profile over a tiny changelog."""
    from changedatacapture_reporting_spark.operators.changelog import (
        build_changelog,
    )
    from changedatacapture_reporting_spark.operators.profile import column_churn
    from pyspark.sql import types as T
    import datetime as dt

    src = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType()),
         T.StructField("w", T.StringType())]
    )
    schema = T.StructType(
        [T.StructField("lsn", T.LongType()), T.StructField("seq", T.LongType()),
         T.StructField("commit_ts", T.TimestampType()),
         T.StructField("op", T.StringType()),
         T.StructField("table_name", T.StringType()),
         T.StructField("before", src), T.StructField("after", src)]
    )
    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 1, 2)
    ev = spark.createDataFrame(
        [
            (1, 0, t0, "update", "t", (1, "a", "x"), (1, "b", "x")),  # v
            (2, 0, t1, "update", "t", (1, "b", "x"), (1, "c", None)),  # v + w→NULL
            (3, 0, t1, "update", "t", (2, "a", "x"), (2, "b", "x")),  # v
            (4, 0, t1, "delete", "t", (2, "b", "x"), None),           # marker only
        ],
        schema,
    )
    log = build_changelog(ev, ["id"], with_audit_cols=False)
    got = {r.column_name: r for r in column_churn(log, ["id"]).collect()}
    assert set(got) == {"v", "w"}
    assert (got["v"].n_changes, got["v"].n_keys, got["v"].n_to_null) == (3, 2, 0)
    assert (got["w"].n_changes, got["w"].n_keys, got["w"].n_to_null) == (1, 1, 1)
    assert got["v"].last_change == t1
    # approx mode returns the same shape (values approximate)
    approx = column_churn(log, ["id"], exact_keys=False)
    assert {r.column_name for r in approx.collect()} == {"v", "w"}


def _reference_final_state(events):
    """Row-level end state: last image per surviving key."""
    alive: dict[int, tuple] = {}
    for e in events:  # lsn-ordered by construction
        rid = (e[6] or e[5])[0]
        if e[3] == "delete":
            alive.pop(rid, None)
        else:
            alive[rid] = e[6]
    return {rid: row[1] for rid, row in alive.items()}


@settings(max_examples=5, deadline=None)
@given(
    draws=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(0, 9)),
        min_size=3,
        max_size=18,
    ),
    split=st.floats(0.0, 1.0),
)
def test_apply_composition_matches_reference(spark, draws, split):
    """For ANY valid history and ANY split point:
    apply(apply(∅, net(≤S)), net(>S)) == the row-level end state —
    the consumer pipeline composes across arbitrary window boundaries
    (delete→re-insert and insert→delete may straddle S)."""
    from pyspark.sql import types as T

    from changedatacapture_reporting_spark.operators.apply import apply_changes

    events = _interpret(draws)
    n = len(events)
    s = max(0, min(n, int(split * n)))
    df = spark.createDataFrame(events, SCHEMA)
    empty = spark.createDataFrame(
        [],
        T.StructType(
            [T.StructField("id", T.IntegerType()), T.StructField("v", T.StringType())]
        ),
    )
    target = apply_changes(
        empty, net_changes(df, ["id"], to_lsn=s), ["id"], ["v"]
    )
    final = apply_changes(
        target, net_changes(df, ["id"], from_lsn=s + 1), ["id"], ["v"]
    )
    got = {r.id: r.v for r in final.collect()}
    assert got == _reference_final_state(events)


@settings(max_examples=5, deadline=None)
@given(
    draws=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(0, 9)),
        min_size=3,
        max_size=18,
    ),
    cuts=st.lists(st.floats(0.0, 1.0), min_size=0, max_size=4),
)
@pytest.mark.soak  # randomized/exhaustive sweep - pre-commit gate only
def test_apply_any_window_partition_matches_replay(spark, draws, cuts):
    """apply(net(window)) folded over ANY partition of the history into
    consecutive LSN windows (not just one split point — 1 to 5 windows,
    boundaries anywhere, empty windows allowed) equals BOTH the
    row-level reference fold and the engine's own one-shot replay
    (reconstruct_state over the full changelog) — the consumer MERGE
    pipeline and the reconstruction operator agree on every random
    op-sequence, including delete→re-insert chains straddling any
    boundary."""
    from pyspark.sql import types as T

    from changedatacapture_reporting_spark.operators.apply import apply_changes
    from changedatacapture_reporting_spark.operators.changelog import (
        build_changelog,
    )
    from changedatacapture_reporting_spark.operators.reconstruct import (
        reconstruct_state,
    )

    events = _interpret(draws)
    n = len(events)
    bounds = sorted({max(0, min(n, int(c * n))) for c in cuts})
    windows = []
    lo = 0
    for b in [*bounds, n]:
        windows.append((lo + 1, b))  # inclusive lsn window, may be empty
        lo = b

    df = spark.createDataFrame(events, SCHEMA)
    state = spark.createDataFrame(
        [],
        T.StructType(
            [T.StructField("id", T.IntegerType()),
             T.StructField("v", T.StringType())]
        ),
    )
    for lo_w, hi_w in windows:
        state = apply_changes(
            state,
            net_changes(df, ["id"], from_lsn=lo_w, to_lsn=hi_w),
            ["id"],
            ["v"],
        )
    got = {r.id: r.v for r in state.collect()}

    ref = _reference_final_state(events)
    assert got == ref

    log = build_changelog(
        df, ["id"], with_audit_cols=False, carry_cols=["lsn", "seq"],
        record_insert_images=True,
    )
    replayed = {
        int(r.id): r.v
        for r in reconstruct_state(log, ["id"], ["v"]).collect()
    }
    assert replayed == ref
