"""Randomized differential fuzz of the CDC core: random event histories
(lifecycle-valid per key, shared-LSN transactions, NULL transitions,
delete→re-insert epochs) are run through build_changelog and
reconstruct_state and compared row-for-row against an independent
pure-Python CDC interpreter. The hand-built fixtures pin the known edge
cases; this pins the ones nobody thought to write down."""

from __future__ import annotations

import datetime as dt
import os

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from changedatacapture_reporting_spark.operators.changelog import build_changelog
from changedatacapture_reporting_spark.operators.reconstruct import (
    reconstruct_state,
)
from changedatacapture_reporting_spark.schema import DELETED_RECORD, NEW_RECORD


import pytest

# full differential power is the pre-commit gate's job;
# the fast lane (-m 'not soak') skips it
pytestmark = pytest.mark.soak

PK = ["id"]
VALUE_COLS = ["id", "v1", "v2"]
T0 = dt.datetime(2024, 1, 1, 0, 0, 0)

_SRC = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("v1", T.IntegerType()),
        T.StructField("v2", T.StringType()),
    ]
)
_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("commit_ts", T.TimestampType()),
        T.StructField("op", T.StringType()),
        T.StructField("table_name", T.StringType()),
        T.StructField("before", _SRC),
        T.StructField("after", _SRC),
    ]
)

# one hypothesis-drawn history: per key a lifecycle-op stream encoded as
# draws; values drawn from a tiny pool so collisions/no-op updates and
# NULL transitions occur often
_HISTORY = st.lists(
    st.tuples(
        st.integers(0, 3),                    # key
        st.integers(0, 9),                    # op selector
        st.one_of(st.none(), st.integers(0, 2)),   # v1 candidate
        st.one_of(st.none(), st.sampled_from(["x", "y"])),  # v2 candidate
        st.booleans(),                        # share lsn with previous op
    ),
    min_size=1,
    max_size=24,
)


def _events_from_draw(draw):
    """Deterministic lifecycle repair: selector picks update/delete for
    live keys, anything on a dead key becomes an insert."""
    alive: dict[int, tuple] = {}
    events = []
    lsn, seq = 0, 0
    for key, sel, v1, v2, share in draw:
        if share and events:
            seq += 1
        else:
            lsn += 1
            seq = 0
        ts = T0 + dt.timedelta(minutes=lsn)
        cur = alive.get(key)
        if cur is None:
            after = (key, v1, v2)
            events.append((lsn, seq, ts, "insert", "t", None, after))
            alive[key] = after
        elif sel < 7:
            after = (key, v1, v2)
            events.append((lsn, seq, ts, "update", "t", cur, after))
            alive[key] = after
        else:
            events.append((lsn, seq, ts, "delete", "t", cur, None))
            del alive[key]
    return events


def _py_changelog(events, record_insert_images):
    rows = set()
    for lsn, seq, ts, op, _, before, after in events:
        if op == "insert":
            rows.add((lsn, seq, ts, None, None, NEW_RECORD))
            if record_insert_images:
                for i, c in enumerate(VALUE_COLS):
                    if after[i] is not None:
                        rows.add((lsn, seq, ts, c, None, str(after[i])))
        elif op == "delete":
            rows.add((lsn, seq, ts, None, DELETED_RECORD, None))
        else:
            for i, c in enumerate(VALUE_COLS):
                if before[i] != after[i]:
                    rows.add(
                        (
                            lsn,
                            seq,
                            ts,
                            c,
                            None if before[i] is None else str(before[i]),
                            None if after[i] is None else str(after[i]),
                        )
                    )
    return rows


def _py_state(events, as_of_lsn):
    state = {}
    for lsn, seq, ts, op, _, before, after in sorted(
        events, key=lambda e: (e[0], e[1])
    ):
        if lsn > as_of_lsn:
            break
        key = (after or before)[0]
        if op == "delete":
            state.pop(key, None)
        else:
            state[key] = after
    return {
        k: tuple(None if v is None else str(v) for v in row)
        for k, row in state.items()
    }


@settings(max_examples=int(os.environ.get("FUZZ_EXAMPLES", "12")), deadline=None)
@given(_HISTORY)
def test_changelog_matches_python_interpreter(spark, draw):
    events = _events_from_draw(draw)
    df = spark.createDataFrame(events, _SCHEMA)
    for rii in (False, True):
        log = build_changelog(
            df, PK, with_audit_cols=False, carry_cols=["lsn", "seq"],
            record_insert_images=rii,
        )
        got = {
            (r.lsn, r.seq, r.commit_time, r.column_name, r.old_value, r.new_value)
            for r in log.collect()
        }
        assert got == _py_changelog(events, rii)


@settings(max_examples=int(os.environ.get("FUZZ_EXAMPLES", "12")), deadline=None)
@given(_HISTORY, st.integers(0, 25))
def test_reconstruct_matches_python_fold(spark, draw, cut):
    events = _events_from_draw(draw)
    df = spark.createDataFrame(events, _SCHEMA)
    log = build_changelog(
        df, PK, with_audit_cols=False, carry_cols=["lsn", "seq"],
        record_insert_images=True,
    )
    got = {
        r.id: (r.v1, r.v2)
        for r in reconstruct_state(
            log, PK, ["v1", "v2"], as_of_lsn=cut
        ).collect()
    }
    want = {
        k: (row[1], row[2]) for k, row in _py_state(events, cut).items()
    }
    assert got == want


def _py_scd2(events):
    """Independent SCD2 interpreter: per (lsn, seq) transaction, carry
    values within delete-bounded epochs (explicit NULL writes carry as
    null, unwritten columns stay absent), close each version at the
    NEXT transaction's commit_time (delete transactions close but emit
    no version), last open version is current."""
    by_key: dict[int, list] = {}
    for lsn, seq, ts, op, _, before, after in sorted(
        events, key=lambda e: (e[0], e[1])
    ):
        key = (after or before)[0]
        if op == "delete":
            by_key.setdefault(key, []).append((ts, "delete", None))
            continue
        if op == "insert":
            delta = {
                c: str(after[i])
                for i, c in enumerate(VALUE_COLS)
                if after[i] is not None
            }
            by_key.setdefault(key, []).append((ts, "insert", delta))
            continue
        delta = {}
        for i, c in enumerate(VALUE_COLS):
            if before[i] != after[i]:
                delta[c] = None if after[i] is None else str(after[i])
        if delta:  # a no-op update emits no changelog rows -> no version
            by_key.setdefault(key, []).append((ts, "update", delta))

    rows = set()
    for key, txns in by_key.items():
        carry: dict = {}
        for i, (ts, kind, delta) in enumerate(txns):
            if kind == "delete":
                carry = {}
                continue
            if kind == "insert":
                carry = dict(delta)
            else:
                carry.update(delta)
            valid_to = txns[i + 1][0] if i + 1 < len(txns) else None
            rows.add(
                (
                    key,
                    carry.get("v1"),
                    carry.get("v2"),
                    ts,
                    valid_to,
                    valid_to is None,
                )
            )
    return rows


@settings(max_examples=int(os.environ.get("FUZZ_EXAMPLES", "12")), deadline=None)
@given(_HISTORY)
def test_scd2_history_matches_python_interpreter(spark, draw):
    from changedatacapture_reporting_spark.operators.scd import scd2_history

    events = _events_from_draw(draw)
    df = spark.createDataFrame(events, _SCHEMA)
    log = build_changelog(
        df, PK, with_audit_cols=False, carry_cols=["lsn", "seq"],
        record_insert_images=True,
    )
    got = {
        (r.id, r.v1, r.v2, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_history(log, PK, ["v1", "v2"]).collect()
    }
    assert got == _py_scd2(events)


def _py_net(events, from_lsn, to_lsn):
    win = [
        e for e in sorted(events, key=lambda e: (e[0], e[1]))
        if from_lsn <= e[0] <= to_lsn
    ]
    by_key: dict[int, list] = {}
    for e in win:
        by_key.setdefault((e[6] or e[5])[0], []).append(e)
    rows = set()
    for key, es in by_key.items():
        first, last = es[0], es[-1]
        existed_before = first[3] != "insert"
        exists_after = last[3] != "delete"
        if not (existed_before or exists_after):
            continue
        net_op = (
            "update" if existed_before and exists_after
            else "insert" if exists_after else "delete"
        )
        rows.add(
            (
                key,
                net_op,
                first[5] if existed_before else None,  # before image
                last[6] if exists_after else None,     # after image
                max(e[0] for e in es),
                last[2],
            )
        )
    return rows


@settings(max_examples=int(os.environ.get("FUZZ_EXAMPLES", "12")), deadline=None)
@given(_HISTORY, st.integers(0, 20), st.integers(0, 8))
def test_net_changes_matches_python_interpreter(spark, draw, lo, width):
    from changedatacapture_reporting_spark.operators.net_changes import (
        net_changes,
    )

    events = _events_from_draw(draw)
    hi = lo + width
    df = spark.createDataFrame(events, _SCHEMA)
    got = {
        (
            r.id,
            r.net_op,
            tuple(r.before) if r.before is not None else None,
            tuple(r.after) if r.after is not None else None,
            r.last_lsn,
            r.last_commit_ts,
        )
        for r in net_changes(df, PK, from_lsn=lo, to_lsn=hi).collect()
    }
    assert got == _py_net(events, lo, hi)
