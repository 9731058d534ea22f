"""operators.apply — consumer-side MERGE of a net-changes window."""

from __future__ import annotations

from pyspark.sql import functions as F

from changedatacapture_reporting_spark.operators.apply import apply_changes

PK = ["k"]
VALUE_COLS = ["v", "n"]


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", "10"), (2, "b", "20"), (3, "c", "30"), (4, "d", "40")],
        "k long, v string, n string",
    )


def _net(spark):
    # update k=2, delete k=3, insert k=6 — typed after image (bigint n)
    rows = [
        (2, "update", ("B", 200)),
        (3, "delete", None),
        (6, "insert", ("F", 600)),
    ]
    return spark.createDataFrame(
        rows, "k long, net_op string, after struct<v:string,n:long>"
    )


def test_apply_changes_upsert_delete_passthrough(spark):
    out = apply_changes(_target(spark), _net(spark), PK, VALUE_COLS)
    got = {r.k: (r.v, r.n) for r in out.collect()}
    assert got == {
        1: ("a", "10"),          # untouched passthrough
        2: ("B", "200"),         # whole-row overwrite, bigint cast to string
        4: ("d", "40"),          # untouched passthrough
        6: ("F", "600"),         # net insert of a previously-absent key
    }


def test_apply_changes_is_idempotent_for_fixed_window(spark):
    once = apply_changes(_target(spark), _net(spark), PK, VALUE_COLS)
    twice = apply_changes(once, _net(spark), PK, VALUE_COLS)
    assert {tuple(r) for r in twice.collect()} == {
        tuple(r) for r in once.collect()
    }


def test_apply_changes_broadcasts_net_side(spark):
    """broadcast_net=True must produce a broadcast anti join — the target
    (the 100 TB side) never shuffles; and no full-outer join anywhere."""
    out = apply_changes(
        _target(spark), _net(spark), PK, VALUE_COLS, broadcast_net=True
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FullOuter" not in plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_apply_net_of_empty_window_is_identity(spark):
    net = _net(spark).filter(F.lit(False))
    out = apply_changes(_target(spark), net, PK, VALUE_COLS)
    assert {tuple(r) for r in out.collect()} == {
        tuple(r) for r in _target(spark).collect()
    }
