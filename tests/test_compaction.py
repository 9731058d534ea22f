"""Changelog compaction: forward-consumer equivalence on the compacted
log — reconstruction at/after the boundary, net-changes windows in the
tail, row-count reduction, idempotence — on a hand fixture and on
random op histories at random boundaries."""

from __future__ import annotations

import pytest

import datetime as dt

from hypothesis import example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from changedatacapture_reporting_spark.operators.changelog import (
    build_changelog,
)
from changedatacapture_reporting_spark.operators.compaction import (
    compact_changelog,
)
from changedatacapture_reporting_spark.operators.reconstruct import (
    reconstruct_state,
)

SRC = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("v", T.StringType()),
    ]
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
TS0 = dt.datetime(2024, 1, 1)


def _hist(draws):
    """Raw draws → valid history over ids 1-3 (same generator family as
    test_net_changes): insert when absent, update/delete when present;
    commit minute tracks lsn so order columns agree."""
    alive: dict[int, tuple] = {}
    events = []
    lsn = 0
    for action, rid, v in draws:
        rid = rid % 3 + 1
        lsn += 1
        t = TS0 + dt.timedelta(minutes=lsn)
        if rid not in alive:
            row = (rid, f"v{v}")
            events.append((lsn, 0, t, "insert", "t", None, row))
            alive[rid] = row
        elif action == 0:
            events.append((lsn, 0, t, "delete", "t", alive.pop(rid), None))
        else:
            old = alive[rid]
            new = (rid, f"v{v}")
            events.append((lsn, 0, t, "update", "t", old, new))
            alive[rid] = new
    return events


def _log_of(df):
    return build_changelog(
        df,
        ["id"],
        with_audit_cols=False,
        carry_cols=["lsn", "seq"],
        record_insert_images=True,
    )


def _state(log, as_of_lsn=None):
    return {
        int(r.id): r.v
        for r in reconstruct_state(
            log, ["id"], ["v"], as_of_lsn=as_of_lsn
        ).collect()
    }


@settings(max_examples=25, deadline=None)
@given(
    draws=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(0, 9)),
        min_size=2,
        max_size=14,
    ),
    cut=st.floats(0.0, 1.0),
)
# history ends with every row deleted (VERDICT r11 task 6: pin the
# low-probability shape classes instead of waiting for a draw)
@example(draws=[(1, 0, 1), (1, 1, 2), (0, 0, 0), (0, 1, 0)], cut=0.5)
# all events churn ONE pk across a delete/re-insert epoch boundary
@example(
    draws=[(1, 0, 1), (2, 0, 2), (0, 0, 0), (1, 0, 3), (0, 0, 0)],
    cut=0.6,
)
@pytest.mark.soak  # heaviest property test - pre-commit gate only
def test_compaction_preserves_forward_consumers(spark, draws, cut):
    events = _hist(draws)
    n = len(events)
    w = max(1, min(n, int(cut * n)))
    df = spark.createDataFrame(events, SCHEMA)
    log = _log_of(df)
    comp = compact_changelog(log, ["id"], upto_lsn=w)

    # schema preserved, never more rows
    assert comp.columns == log.columns
    assert comp.count() <= log.count()

    # reconstruction identity at the end, at the boundary, and at a
    # point inside the tail
    assert _state(comp) == _state(log)
    assert _state(comp, as_of_lsn=w) == _state(log, as_of_lsn=w)
    mid_tail = (w + n) // 2
    assert _state(comp, as_of_lsn=mid_tail) == _state(log, as_of_lsn=mid_tail)

    # idempotence: compacting an already-compacted log changes nothing
    twice = compact_changelog(comp, ["id"], upto_lsn=w)
    assert _state(twice) == _state(log)

    # tail rows are verbatim
    tail_cols = [c for c in log.columns]
    t_orig = {tuple(r) for r in
              log.filter(F.col("lsn") > w).select(*tail_cols).collect()}
    t_comp = {tuple(r) for r in
              comp.filter(F.col("lsn") > w).select(*tail_cols).collect()}
    assert t_comp == t_orig


def test_compaction_reinsert_and_marker_presence(spark):
    """Delete → re-insert before the boundary keeps only the new epoch;
    a row whose liveness came from updates alone (history begins
    mid-stream, no insert marker) gets NO fabricated marker."""
    t = lambda m: TS0 + dt.timedelta(minutes=m)  # noqa: E731
    events = [
        (1, 0, t(1), "insert", "t", None, (1, "a")),
        (2, 0, t(2), "delete", "t", (1, "a"), None),
        (3, 0, t(3), "insert", "t", None, (1, "b")),  # re-insert
        (4, 0, t(4), "update", "t", (2, "x"), (2, "y")),  # no insert ever
        (5, 0, t(5), "update", "t", (1, "b"), (1, "c")),  # tail
    ]
    df = spark.createDataFrame(events, SCHEMA)
    log = _log_of(df)
    comp = compact_changelog(log, ["id"], upto_lsn=4)

    assert _state(comp) == _state(log) == {1: "c", 2: "y"}
    # no value from the dead epoch survives anywhere in the compacted log
    assert comp.filter(F.col("new_value") == "a").count() == 0
    # id=2 never had an insert marker; compaction must not invent one
    markers = comp.filter(
        F.col("column_name").isNull() & (F.col("lsn") <= 4)
    )
    assert [r.id for r in markers.collect()] == [1]


def test_maintenance_compact_no_dead_epoch_resurrection(spark):
    """Regression: delete → re-insert leaving a column unwritten must
    NOT resurrect the dead epoch's value through maintenance
    compact/retain (the pre-r7 latest-per-(row,column) fold did exactly
    that); dead rows keep a single tombstone for downstream merges."""
    from changedatacapture_reporting_spark.operators.maintenance import (
        compact_changelog as m_compact,
        retain_changelog,
    )

    t = lambda m: TS0 + dt.timedelta(minutes=m)  # noqa: E731
    src2 = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("v", T.StringType()),
            T.StructField("w", T.StringType()),
        ]
    )
    schema2 = T.StructType(
        [
            T.StructField("lsn", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("commit_ts", T.TimestampType()),
            T.StructField("op", T.StringType()),
            T.StructField("table_name", T.StringType()),
            T.StructField("before", src2),
            T.StructField("after", src2),
        ]
    )
    ev = [
        (1, 0, t(1), "insert", "t", None, (1, "a", "x")),
        (2, 0, t(2), "delete", "t", (1, "a", "x"), None),
        (3, 0, t(3), "insert", "t", None, (1, None, "x2")),  # v unwritten
        (4, 0, t(4), "update", "t", (1, None, "x2"), (1, None, "x3")),
        (5, 0, t(5), "insert", "t", None, (2, "q", "r")),
        (6, 0, t(6), "delete", "t", (2, "q", "r"), None),  # dead row
    ]
    df = spark.createDataFrame(ev, schema2)
    log = build_changelog(
        df, ["id"], with_audit_cols=False, carry_cols=["lsn", "seq"],
        record_insert_images=True,
    )

    def st(frame):
        return {
            r.id: (r.v, r.w)
            for r in reconstruct_state(frame, ["id"], ["v", "w"]).collect()
        }

    full = st(log)
    assert full == {1: (None, "x3")}  # v died with the old epoch
    assert st(m_compact(log, ["id"])) == full
    assert st(retain_changelog(log, ["id"], t(3))) == full
    # the dead row's tombstone survives full compaction
    tombs = m_compact(log, ["id"]).filter(
        F.col("old_value") == "DELETED RECORD"
    )
    assert [(r.id, r.lsn) for r in tombs.collect()] == [(2, 6)]
