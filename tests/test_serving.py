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
    read_state_snapshot,
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
    # the schema-pinned read path — survives an emptied snapshot
    return {
        r.id: (r.name, r.qty)
        for r in read_state_snapshot(spark, path)
        .select("id", "name", "qty")
        .collect()
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


def test_refresh_to_empty_state_leaves_readable_snapshot(spark, tmp_path):
    """VERDICT_r11's falsifying history (insert 2, insert 4, delete 4,
    delete 2; split at 0.5): the refresh's survivor set is EMPTY, so the
    partitioned rewrite lands zero data files — the snapshot must still
    read back (0 rows) via the schema pinned in the meta, and a
    follow-up refresh with new inserts must succeed."""
    events = [
        (1, 0, _ts(1), "insert", "t", None, (2, "n0", None)),
        (2, 0, _ts(2), "insert", "t", None, (4, "n0", None)),
        (3, 0, _ts(3), "delete", "t", (4, "n0", None), None),
        (4, 0, _ts(4), "delete", "t", (2, "n0", None), None),
    ]
    full = _log(spark, events)
    path = str(tmp_path / "state")
    build_state_snapshot(
        spark, full.filter(F.col("lsn") <= 2), path, ["id"], VALUE_COLS,
        n_buckets=4,
    )
    refresh_state_snapshot(spark, full, path, ["id"], VALUE_COLS)
    assert _state(spark, path) == {}

    # the emptied snapshot must accept the NEXT delta cleanly (insert
    # markers carry no values in this changelog config, so the update
    # supplies both columns)
    more = events + [
        (5, 0, _ts(5), "insert", "t", None, (7, "x", 1)),
        (6, 0, _ts(6), "update", "t", (7, "x", 1), (7, "back", 2)),
    ]
    got = refresh_state_snapshot(
        spark, _log(spark, more), path, ["id"], VALUE_COLS
    )
    assert got["watermark_lsn"] == 6
    assert _state(spark, path) == {7: ("back", "2")}


def test_build_on_all_dead_changelog_is_readable(spark, tmp_path):
    """Initial build where every pk ends deleted: zero live rows means
    zero data files, but the snapshot must still be a functioning table
    (readable, refreshable)."""
    events = [
        (1, 0, _ts(1), "insert", "t", None, (1, "a", 1)),
        (2, 0, _ts(2), "delete", "t", (1, "a", 1), None),
    ]
    path = str(tmp_path / "state")
    n = build_state_snapshot(
        spark, _log(spark, events), path, ["id"], VALUE_COLS, n_buckets=4
    )
    assert n == 0
    assert read_state_snapshot(spark, path).count() == 0

    more = events + [
        (3, 0, _ts(3), "insert", "t", None, (9, "w", 4)),
        (4, 0, _ts(4), "update", "t", (9, "w", 4), (9, "z", 5)),
    ]
    refresh_state_snapshot(spark, _log(spark, more), path, ["id"], VALUE_COLS)
    assert _state(spark, path) == {9: ("z", "5")}


def test_pre_schema_meta_heals_forward(spark, snapshot):
    """A meta written before the schema field existed still reads (the
    snapshot has files), and the first refresh rewrites the meta WITH
    the schema so a later emptying refresh can't brick it."""
    import json as _json

    from changedatacapture_reporting_spark.operators import serving

    meta_path = fs.join(snapshot, serving.META_FILE)
    meta = _json.loads(fs.read_text(spark, meta_path))
    del meta["schema"]
    fs.write_text(spark, meta_path, _json.dumps(meta))
    assert len(_state(spark, snapshot)) == 20  # inference fallback

    delta = [(200, 0, _ts(50), "update", "t",
              (1, "N1", 11), (1, "N1", 999))]
    refresh_state_snapshot(
        spark, _log(spark, _base_rows() + delta), snapshot, ["id"], VALUE_COLS
    )
    healed = _json.loads(fs.read_text(spark, meta_path))
    assert "schema" in healed
    assert _state(spark, snapshot)[1] == ("N1", "999")


# ---------------------------------------------------------------------------
# property: build(prefix) + refresh(full) == reconstruct(full), any history
# ---------------------------------------------------------------------------

from hypothesis import example, given, settings
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


@settings(max_examples=25, deadline=None)
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
# VERDICT_r11's falsifying draw: history ends with every row deleted
@example(
    draws=[(0, 6, 0, None), (0, 13, 0, None), (0, 38, 0, None),
           (0, 1, 0, None)],
    split_frac=0.5,
)
# all events on ONE pk: insert → update → delete → re-insert churn
@example(
    draws=[(1, 0, 1, 1), (1, 0, 2, 2), (0, 0, 0, None), (2, 0, 3, 3),
           (0, 0, 0, None), (1, 0, 0, 9)],
    split_frac=0.4,
)
@pytest.mark.soak  # heaviest property test - pre-commit gate only
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

def test_composite_pk_with_null_component(spark, tmp_path):
    """Composite pk where one component is NULL: the eqNullSafe merge
    (both the broadcast left-outer path and the pk-only anti-join for
    new keys) and the xxhash64 bucket assignment must treat NULL as a
    stable key value — build + refresh + delete + re-insert, compared
    against one-shot reconstruction."""
    src = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("tenant", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("qty", T.IntegerType()),
        ]
    )
    schema = T.StructType(
        [
            T.StructField("lsn", T.LongType(), False),
            T.StructField("seq", T.LongType(), False),
            T.StructField("commit_ts", T.TimestampType(), False),
            T.StructField("op", T.StringType(), False),
            T.StructField("table_name", T.StringType(), False),
            T.StructField("before", src, True),
            T.StructField("after", src, True),
        ]
    )
    pk = ["id", "tenant"]

    def log_of(rows):
        ev = spark.createDataFrame(rows, schema)
        return build_changelog(ev, pk, carry_cols=["lsn", "seq"])

    base = [
        (1, 0, _ts(1), "insert", "t", None, (1, "a", "x", 1)),
        (2, 0, _ts(2), "insert", "t", None, (1, None, "y", 2)),  # NULL pk
        (3, 0, _ts(3), "update", "t", (1, "a", "x", 1), (1, "a", "x2", 1)),
        (4, 0, _ts(4), "update", "t",
         (1, None, "y", 2), (1, None, "y2", 2)),
    ]
    path = str(tmp_path / "state")
    n = build_state_snapshot(
        spark, log_of(base), path, pk, VALUE_COLS, n_buckets=4
    )
    assert n == 2

    more = base + [
        # update the NULL-tenant row (existing key -> broadcast branch),
        # delete+re-insert the (1, 'a') row, and a brand-new NULL-pk
        # key (new key -> pk-only anti-join branch)
        (5, 0, _ts(5), "update", "t",
         (1, None, "y2", 2), (1, None, "y3", 9)),
        (6, 0, _ts(6), "delete", "t", (1, "a", "x2", 1), None),
        (7, 0, _ts(7), "insert", "t", None, (1, "a", "z", 0)),
        (8, 0, _ts(8), "update", "t", (1, "a", "z", 0), (1, "a", "z2", 5)),
        (9, 0, _ts(9), "insert", "t", None, (2, None, "w", 3)),
        (10, 0, _ts(10), "update", "t",
         (2, None, "w", 3), (2, None, "w2", 4)),
    ]
    refresh_state_snapshot(spark, log_of(more), path, pk, VALUE_COLS)

    got = {
        (r.id, r.tenant): (r.name, r.qty)
        for r in read_state_snapshot(spark, path)
        .select("id", "tenant", "name", "qty")
        .collect()
    }
    expect = {
        (r.id, r.tenant): (r.name, r.qty)
        for r in reconstruct_state(log_of(more), pk, VALUE_COLS).collect()
    }
    assert got == expect
    assert got[(1, None)] == ("y3", "9")     # NULL-pk update merged
    assert got[(1, "a")] == ("z2", "5")      # re-insert epoch, no leak
    assert got[(2, None)] == ("w2", "4")     # brand-new NULL-pk key
