"""Serving-state snapshot: initial build, incremental bucket-level
refresh, delete/re-insert epochs, idempotent re-apply, untouched buckets
left physically untouched."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from changedatacapture_reporting_spark import fs
from changedatacapture_reporting_spark.operators.changelog import build_changelog
from changedatacapture_reporting_spark.operators.reconstruct import reconstruct_state
from changedatacapture_reporting_spark.operators.serving import (
    BUCKET_COL,
    build_state_snapshot,
    refresh_state_snapshot,
)

SRC = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("qty", T.IntegerType()),
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
VALUE_COLS = ["name", "qty"]


def _log(spark, rows):
    ev = spark.createDataFrame(rows, SCHEMA)
    return build_changelog(ev, ["id"], carry_cols=["lsn", "seq"])


def _ts(m):
    return dt.datetime(2024, 1, 1, 10, m)


def _base_rows():
    return [
        (i, 0, _ts(i), "insert", "t", None, (i, f"n{i}", 10 * i))
        for i in range(1, 21)
    ] + [
        # updates so initial values are non-NULL for ids 1..20
        (100 + i, 0, _ts(30 + i % 20), "update", "t",
         (i, f"n{i}", 10 * i), (i, f"N{i}", 10 * i + 1))
        for i in range(1, 21)
    ]


@pytest.fixture()
def snapshot(spark, tmp_path):
    path = str(tmp_path / "state")
    log = _log(spark, _base_rows())
    n = build_state_snapshot(spark, log, path, ["id"], VALUE_COLS, n_buckets=8)
    assert n == 20
    return path


def _state(spark, path):
    return {
        r.id: (r.name, r.qty)
        for r in spark.read.parquet(path).select("id", "name", "qty").collect()
    }


def test_initial_build_matches_reconstruct(spark, snapshot):
    log = _log(spark, _base_rows())
    expect = {
        r.id: (r.name, r.qty)
        for r in reconstruct_state(log, ["id"], VALUE_COLS).collect()
    }
    assert _state(spark, snapshot) == {
        k: (v[0], v[1]) for k, v in expect.items()
    }
    assert expect[1] == ("N1", "11")  # updates applied, stringly typed


def test_incremental_refresh_only_touches_changed_buckets(spark, snapshot):
    files_before = {
        f for f in fs.list_data_files(spark, snapshot)
    }
    delta = [
        # update id=1 (qty only), delete id=2, re-insert id=3, new id=50
        (200, 0, _ts(50), "update", "t", (1, "N1", 11), (1, "N1", 999)),
        (201, 0, _ts(51), "delete", "t", (2, "N2", 21), None),
        (202, 0, _ts(52), "delete", "t", (3, "N3", 31), None),
        (203, 0, _ts(53), "insert", "t", None, (3, "fresh", 0)),
        (204, 0, _ts(54), "update", "t", (3, "fresh", 0), (3, "fresh3", 7)),
        (205, 0, _ts(55), "insert", "t", None, (50, "new", 1)),
    ]
    full_log = _log(spark, _base_rows() + delta)
    got = refresh_state_snapshot(spark, full_log, snapshot, ["id"], VALUE_COLS)
    assert got["watermark_lsn"] == 205
    assert 1 <= got["buckets_rewritten"] <= 8

    state = _state(spark, snapshot)
    expect = {
        r.id: (r.name, r.qty)
        for r in reconstruct_state(full_log, ["id"], VALUE_COLS).collect()
    }
    assert state == expect
    assert 2 not in state                      # deleted
    assert state[1] == ("N1", "999")           # per-column merge kept name
    assert state[3] == ("fresh3", "7")         # re-insert epoch, no leak
    assert state[50] == (None, None)           # insert marker carries no values

    # buckets not containing changed pks keep their exact files
    touched = {
        f.split("/")[0]
        for f in set(fs.list_data_files(spark, snapshot)) - files_before
    }
    untouched_files = {
        f for f in files_before if f.split("/")[0] not in touched
    }
    assert untouched_files <= set(fs.list_data_files(spark, snapshot))
    assert len(touched) == got["buckets_rewritten"]


def test_refresh_noop_when_no_new_rows(spark, snapshot):
    log = _log(spark, _base_rows())
    got = refresh_state_snapshot(spark, log, snapshot, ["id"], VALUE_COLS)
    assert got == {"rows_applied": 0, "buckets_rewritten": 0,
                   "watermark_lsn": 120}


def test_refresh_is_idempotent_after_meta_crash(spark, snapshot):
    """Crash between publish and meta advance = same delta re-applied:
    the merged state must be a fixpoint."""
    from changedatacapture_reporting_spark.operators import serving

    delta = [
        (300, 0, _ts(58), "update", "t", (5, "N5", 51), (5, "vv", None)),
        (301, 0, _ts(59), "delete", "t", (6, "N6", 61), None),
    ]
    full_log = _log(spark, _base_rows() + delta)

    # first refresh, but simulate the crash by restoring the OLD meta
    old_meta = fs.read_text(spark, fs.join(snapshot, serving.META_FILE))
    refresh_state_snapshot(spark, full_log, snapshot, ["id"], VALUE_COLS)
    state1 = _state(spark, snapshot)
    fs.write_text(spark, fs.join(snapshot, serving.META_FILE), old_meta)

    got = refresh_state_snapshot(spark, full_log, snapshot, ["id"], VALUE_COLS)
    assert got["watermark_lsn"] == 301
    assert _state(spark, snapshot) == state1
    assert state1[5] == ("vv", None)  # explicit NULL-set survived re-apply
    assert 6 not in state1


# ---------------------------------------------------------------------------
# property: build(prefix) + refresh(full) == reconstruct(full), any history
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


def _interpret(draws):
    """Turn raw hypothesis draws into a VALID CDC history over ids 1-5:
    insert when absent, update/delete when present."""
    alive: dict[int, tuple] = {}
    events = []
    lsn = 0
    for action, rid, name_i, qty in draws:
        rid = rid % 5 + 1
        lsn += 1
        ts = _ts(lsn % 60)
        if rid not in alive:
            row = (rid, f"n{name_i}", qty)
            events.append((lsn, 0, ts, "insert", "t", None, row))
            alive[rid] = row
        elif action == 0:
            events.append((lsn, 0, ts, "delete", "t", alive.pop(rid), None))
        else:
            old = alive[rid]
            new = (rid, f"n{name_i}" if action == 1 else old[1],
                   qty if action == 2 else old[2])
            events.append((lsn, 0, ts, "update", "t", old, new))
            alive[rid] = new
    return events


@settings(max_examples=5, deadline=None)
@given(
    draws=st.lists(
        st.tuples(
            st.integers(0, 2),
            st.integers(0, 50),
            st.integers(0, 3),
            st.one_of(st.none(), st.integers(0, 9)),
        ),
        min_size=3,
        max_size=16,
    ),
    split_frac=st.floats(0.1, 0.9),
)
def test_split_refresh_equals_full_reconstruct(spark, tmp_path_factory,
                                               draws, split_frac):
    events = _interpret(draws)
    full = _log(spark, events)
    mid = max(1, int(len(events) * split_frac))
    path = str(tmp_path_factory.mktemp("prop") / "state")

    build_state_snapshot(
        spark, full.filter(F.col("lsn") <= mid), path, ["id"], VALUE_COLS,
        n_buckets=4,
    )
    refresh_state_snapshot(spark, full, path, ["id"], VALUE_COLS)

    got = _state(spark, path)
    expect = {
        r.id: (r.name, r.qty)
        for r in reconstruct_state(full, ["id"], VALUE_COLS).collect()
    }
    assert got == expect
