"""PK-change fusion (operators/changelog.fuse_pk_change_events)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from changedatacapture_reporting_spark.operators.changelog import (
    OP_PK_UPDATE,
    fuse_pk_change_events,
)

SRC = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("val", T.StringType()),
        T.StructField("qty", T.IntegerType()),
    ]
)
EVENT = T.StructType(
    [
        T.StructField("lsn", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("commit_ts", T.TimestampType()),
        T.StructField("op", T.StringType()),
        T.StructField("table_name", T.StringType()),
        T.StructField("before", SRC),
        T.StructField("after", SRC),
    ]
)

TS = dt.datetime(2024, 1, 1)


def _ev(lsn, seq, op, before, after, table="t"):
    return (lsn, seq, TS, op, table, before, after)


def _fuse(spark, rows):
    df = spark.createDataFrame(rows, EVENT)
    return fuse_pk_change_events(df, ["id"], ["val", "qty"]).collect()


def test_basic_pair_fuses(spark):
    out = _fuse(
        spark,
        [
            _ev(5, 1, "delete", (1, "a", 10), None),
            _ev(5, 2, "insert", None, (99, "a", 10)),
        ],
    )
    assert len(out) == 1
    r = out[0]
    assert r["op"] == OP_PK_UPDATE
    assert r["before"]["id"] == 1 and r["after"]["id"] == 99
    assert r["seq"] == 2  # the insert's seq (the later event)


def test_different_lsn_does_not_fuse(spark):
    out = _fuse(
        spark,
        [
            _ev(5, 1, "delete", (1, "a", 10), None),
            _ev(6, 2, "insert", None, (99, "a", 10)),
        ],
    )
    assert sorted(r["op"] for r in out) == ["delete", "insert"]


def test_different_value_image_does_not_fuse(spark):
    out = _fuse(
        spark,
        [
            _ev(5, 1, "delete", (1, "a", 10), None),
            _ev(5, 2, "insert", None, (99, "a", 11)),
        ],
    )
    assert sorted(r["op"] for r in out) == ["delete", "insert"]


def test_null_values_match_null_safe(spark):
    # (a, NULL) must fuse with (a, NULL) but NOT with (a,)-shaped or
    # different-null-position images
    out = _fuse(
        spark,
        [
            _ev(5, 1, "delete", (1, "a", None), None),
            _ev(5, 2, "insert", None, (99, "a", None)),
            _ev(5, 3, "delete", (2, None, 7), None),
            _ev(5, 4, "insert", None, (98, None, 8)),
        ],
    )
    ops = sorted(r["op"] for r in out)
    assert ops == ["delete", "insert", OP_PK_UPDATE]
    fused = [r for r in out if r["op"] == OP_PK_UPDATE][0]
    assert fused["before"]["id"] == 1 and fused["after"]["id"] == 99


def test_ambiguous_pairs_rank_deterministic(spark):
    # two identical value images in one txn: delete seq 1<->insert seq 3,
    # delete seq 2<->insert seq 4 (rank-to-rank by seq)
    out = _fuse(
        spark,
        [
            _ev(5, 1, "delete", (1, "a", 10), None),
            _ev(5, 2, "delete", (2, "a", 10), None),
            _ev(5, 3, "insert", None, (91, "a", 10)),
            _ev(5, 4, "insert", None, (92, "a", 10)),
        ],
    )
    assert all(r["op"] == OP_PK_UPDATE for r in out)
    pairs = sorted((r["before"]["id"], r["after"]["id"]) for r in out)
    assert pairs == [(1, 91), (2, 92)]


def test_unbalanced_sides_leave_remainder(spark):
    out = _fuse(
        spark,
        [
            _ev(5, 1, "delete", (1, "a", 10), None),
            _ev(5, 2, "delete", (2, "a", 10), None),
            _ev(5, 3, "insert", None, (91, "a", 10)),
        ],
    )
    ops = sorted(r["op"] for r in out)
    assert ops == ["delete", OP_PK_UPDATE]
    leftover = [r for r in out if r["op"] == "delete"][0]
    assert leftover["before"]["id"] == 2  # rank 2 delete stays a delete


def test_updates_pass_through_untouched(spark):
    out = _fuse(
        spark,
        [
            _ev(5, 1, "update", (1, "a", 10), (1, "b", 10)),
            _ev(5, 2, "delete", (2, "z", 1), None),
        ],
    )
    ops = sorted(r["op"] for r in out)
    assert ops == ["delete", "update"]
    up = [r for r in out if r["op"] == "update"][0]
    assert up["before"]["val"] == "a" and up["after"]["val"] == "b"


def test_tables_do_not_cross_fuse(spark):
    out = _fuse(
        spark,
        [
            _ev(5, 1, "delete", (1, "a", 10), None, table="t1"),
            _ev(5, 2, "insert", None, (99, "a", 10), table="t2"),
        ],
    )
    assert sorted(r["op"] for r in out) == ["delete", "insert"]


# -- adversarial separator injection (VERDICT r10) --------------------------
# The pre-r11 value-image key concatenated casted columns with \x1f and a
# \x00NULL marker; images crafted to contain those bytes could forge a
# collision between two DISTINCT images and mispair a delete/insert. The
# struct key must keep them apart.

SRC2 = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("a", T.StringType()),
        T.StructField("b", T.StringType()),
    ]
)
EVENT2 = T.StructType(
    [
        T.StructField("lsn", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("commit_ts", T.TimestampType()),
        T.StructField("op", T.StringType()),
        T.StructField("table_name", T.StringType()),
        T.StructField("before", SRC2),
        T.StructField("after", SRC2),
    ]
)


def _fuse2(spark, rows):
    df = spark.createDataFrame(rows, EVENT2)
    return fuse_pk_change_events(df, ["id"], ["a", "b"]).collect()


def test_separator_injection_does_not_collide(spark):
    # concat key: ('a\x1fb', 'c') and ('a', 'b\x1fc') both -> "a\x1fb\x1fc"
    out = _fuse2(
        spark,
        [
            _ev(5, 1, "delete", (1, "a\x1fb", "c"), None),
            _ev(5, 2, "insert", None, (99, "a", "b\x1fc")),
        ],
    )
    assert sorted(r["op"] for r in out) == ["delete", "insert"]


def test_null_marker_injection_does_not_collide(spark):
    # concat key: ('a', '\x00NULL') and ('a', NULL) both -> "a\x1f\x00NULL"
    out = _fuse2(
        spark,
        [
            _ev(5, 1, "delete", (1, "a", "\x00NULL"), None),
            _ev(5, 2, "insert", None, (99, "a", None)),
        ],
    )
    assert sorted(r["op"] for r in out) == ["delete", "insert"]


def test_separator_containing_values_still_fuse_with_equal_image(spark):
    # identical adversarial images on both sides MUST still pair
    out = _fuse2(
        spark,
        [
            _ev(5, 1, "delete", (1, "a\x1fb", None), None),
            _ev(5, 2, "insert", None, (99, "a\x1fb", None)),
        ],
    )
    assert len(out) == 1 and out[0]["op"] == OP_PK_UPDATE
