"""Changelog-replay invariants (SURVEY.md §5.3 golden replay + §5.4
property-based): random op sequences → replaying the changelog reconstructs
exactly the final table state; populate twice → no double-load."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from changedatacapture_reporting_spark.operators.changelog import build_changelog
from changedatacapture_reporting_spark.operators.reconstruct import reconstruct_state

SRC = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("qty", T.IntegerType()),
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

# one key's lifecycle: insert, then updates (possibly no-op), maybe delete,
# maybe re-insert afterwards
op_step = st.tuples(
    st.sampled_from(["set_name", "set_qty", "noop"]),
    st.one_of(st.none(), st.text(alphabet="abc", max_size=3), st.integers(0, 99)),
)
key_history = st.lists(op_step, max_size=5)
corpus = st.dictionaries(st.integers(1, 8), key_history, max_size=6)


@given(corpus=corpus, deletes=st.sets(st.integers(1, 8)))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_replay_reconstructs_final_state(spark, corpus, deletes):
    rows, expected = [], {}
    lsn = 0
    base = dt.datetime(2024, 1, 1)
    for key, history in sorted(corpus.items()):
        lsn += 1
        state = {"id": key, "name": "init", "qty": 0}
        rows.append(
            (lsn, 0, base + dt.timedelta(minutes=lsn), "insert", "t", None,
             (key, "init", 0))
        )
        for kind, val in history:
            before = dict(state)
            if kind == "set_name":
                state["name"] = str(val) if val is not None else None
            elif kind == "set_qty":
                state["qty"] = (
                    val if isinstance(val, int) else (len(val) if val else None)
                )
            lsn += 1
            rows.append(
                (lsn, 0, base + dt.timedelta(minutes=lsn), "update", "t",
                 (before["id"], before["name"], before["qty"]),
                 (state["id"], state["name"], state["qty"]))
            )
        if key in deletes:
            lsn += 1
            rows.append(
                (lsn, 0, base + dt.timedelta(minutes=lsn), "delete", "t",
                 (state["id"], state["name"], state["qty"]), None)
            )
        else:
            expected[key] = state

    if not rows:
        return
    events = spark.createDataFrame(rows, EVENT_SCHEMA)
    log = build_changelog(
        events, ["id"], with_audit_cols=False,
        carry_cols=["lsn", "seq"], record_insert_images=True,
    )
    got = {
        r.id: {"name": r.name, "qty": r.qty}
        for r in reconstruct_state(log, ["id"], ["name", "qty"]).collect()
    }
    want = {
        k: {
            "name": str(v["name"]) if v["name"] is not None else None,
            "qty": str(v["qty"]) if v["qty"] is not None else None,
        }
        for k, v in expected.items()
    }
    assert got == want


def test_golden_replay_scenario(spark, tmp_path):
    """FIXTURES.md §B golden scenario end-to-end through the SINK:
    3 inserts → multi-column update → NULL→value update → delete →
    same-transaction double update; populate twice (idempotent resume);
    reconstruct matches the hand-computed final state."""
    from changedatacapture_reporting_spark.operators.populate import (
        populate_changelog,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, 0, base, "insert", "t", None, (1, "a", 10)),
        (2, 0, base + dt.timedelta(minutes=1), "insert", "t", None, (2, "b", 20)),
        (3, 0, base + dt.timedelta(minutes=2), "insert", "t", None, (3, "c", None)),
        (4, 0, base + dt.timedelta(minutes=3), "update", "t",
         (1, "a", 10), (1, "a2", 11)),
        (5, 0, base + dt.timedelta(minutes=4), "update", "t",
         (3, "c", None), (3, "c", 33)),
        (6, 0, base + dt.timedelta(minutes=5), "delete", "t",
         (2, "b", 20), None),
        (7, 0, base + dt.timedelta(minutes=6), "update", "t",
         (1, "a2", 11), (1, "a3", 11)),
        (7, 1, base + dt.timedelta(minutes=6), "update", "t",
         (1, "a3", 11), (1, "a4", 11)),
    ]
    events = spark.createDataFrame(rows, EVENT_SCHEMA)
    sink = str(tmp_path / "sink")

    r1 = populate_changelog(spark, events, sink, ["id"])
    assert r1.rows_changed > 0
    r2 = populate_changelog(spark, events, sink, ["id"])
    assert r2.rows_changed == 0  # idempotent resume, no double-load

    log = spark.read.parquet(sink)
    # golden: markers + per-changed-column rows
    got = {
        (r.id, r.column_name, r.old_value, r.new_value)
        for r in log.select("id", "column_name", "old_value", "new_value").collect()
    }
    assert (1, "name", "a", "a2") in got
    assert (1, "qty", "10", "11") in got
    assert (3, "qty", None, "33") in got
    assert (2, None, "DELETED RECORD", None) in got
    assert (1, "name", "a3", "a4") in got  # second same-txn update intact

    state = {
        r.id: (r.name, r.qty)
        for r in reconstruct_state(log, ["id"], ["name", "qty"]).collect()
    }
    # insert images are NOT recorded by default → a never-updated column
    # (3.name stayed 'c') is unknowable from the changelog alone
    assert state == {1: ("a4", "11"), 3: (None, "33")}


def test_reinsert_epoch_does_not_leak_predelete_values(spark):
    """r5 regression (found by test_split_refresh_equals_full_reconstruct):
    update → delete → re-insert must NOT resurrect the pre-delete column
    value. The re-inserted row knows only columns written after the
    re-insert (insert markers carry no values by default)."""
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, 0, base, "insert", "t", None, (1, "a", 10)),
        (2, 0, base + dt.timedelta(minutes=1), "update", "t",
         (1, "a", 10), (1, "a", 0)),          # qty ← 0 (pre-delete epoch)
        (3, 0, base + dt.timedelta(minutes=2), "delete", "t",
         (1, "a", 0), None),
        (4, 0, base + dt.timedelta(minutes=3), "insert", "t", None,
         (1, "z", 5)),                         # re-insert (marker only)
    ]
    events = spark.createDataFrame(rows, EVENT_SCHEMA)
    log = build_changelog(events, ["id"], carry_cols=["lsn", "seq"])
    state = {
        r.id: (r.name, r.qty)
        for r in reconstruct_state(log, ["id"], ["name", "qty"]).collect()
    }
    assert state == {1: (None, None)}  # not (None, "0")

    # with insert images recorded, the new epoch's own values win instead
    log2 = build_changelog(
        events, ["id"], carry_cols=["lsn", "seq"], record_insert_images=True
    )
    state2 = {
        r.id: (r.name, r.qty)
        for r in reconstruct_state(log2, ["id"], ["name", "qty"]).collect()
    }
    assert state2 == {1: ("z", "5")}


def test_reconstruct_as_of_lsn_slices_mid_history(spark, sf_dir):
    """The LSN bound cuts between the second-update and trailing-delete
    waves of the multi stream — something the commit-time bound cannot
    express (all waves share commit_ts)."""
    from changedatacapture_reporting_spark.sources.cdc_simulator import (
        MULTI_OFF_DELETE,
        MULTI_OFF_UPDATE,
        SIM_PK,
        simulate_cdc_events_multi,
    )

    ev = simulate_cdc_events_multi(spark, sf_dir)
    log = build_changelog(
        ev, SIM_PK, with_audit_cols=False, carry_cols=["lsn", "seq"],
        record_insert_images=True,
    )
    cols = ["status", "priority", "total", "note"]
    mid = (MULTI_OFF_UPDATE + MULTI_OFF_DELETE) // 2

    at_mid = {r.o_orderkey: r for r in
              reconstruct_state(log, SIM_PK, cols, as_of_lsn=mid).collect()}
    full = {r.o_orderkey: r for r in
            reconstruct_state(log, SIM_PK, cols).collect()}

    # a key carrying update→update→delete history: alive (updated) at the
    # mid cut, gone at the end
    k5 = [k for k in at_mid if k % 20 == 5]
    assert k5, "fixture must contain k%20==5 keys"
    for k in k5:
        assert at_mid[k].status == "Y"
        assert k not in full
    # second-update keys that survive: 'Y' at mid and at the end
    k1 = [k for k in at_mid if k % 4 == 1 and k % 20 != 5]
    assert k1 and all(at_mid[k].status == "Y" for k in k1)
    # keys untouched by the extra waves agree between the two cuts
    for k in list(at_mid)[:50]:
        if k % 4 != 1 and k % 20 not in (5, 11):
            assert tuple(at_mid[k]) == tuple(full[k])


def test_multi_table_snapshot_is_transactionally_consistent(spark, sf_dir):
    """One LSN cut binds both tables: no key beyond the cut leaks into
    either table, and keys inserted by a shared transaction are visible
    in BOTH tables or NEITHER (atomic multi-table visibility)."""
    from changedatacapture_reporting_spark.operators.reconstruct import (
        snapshot_tables_at_lsn,
    )
    from changedatacapture_reporting_spark.sources.cdc_simulator import (
        SIM_PK,
        simulate_cdc_events_cross_table,
    )

    base, tax = simulate_cdc_events_cross_table(spark, sf_dir)

    def log_of(e):
        return build_changelog(
            e, SIM_PK, with_audit_cols=False, carry_cols=["lsn", "seq"],
            record_insert_images=True,
        )

    log = log_of(base).unionByName(log_of(tax))
    cut = 700
    snap = snapshot_tables_at_lsn(
        log,
        {"orders": (SIM_PK, ["status", "total"]),
         "orders_tax": (SIM_PK, ["rate", "fee"])},
        as_of_lsn=cut,
    )
    keys = {
        (r.table_name, int(r.row_key))
        for r in snap.select("table_name", "row_key").distinct().collect()
    }
    assert keys, "cut must keep some rows"
    assert all(k <= cut for _, k in keys)  # nothing beyond the cut, anywhere

    o_keys = {k for t, k in keys if t == "orders"}
    t_keys = {k for t, k in keys if t == "orders_tax"}
    # insert transactions (k%10 in {0,1}) are atomic across both tables
    o_ins = {k for k in o_keys if k % 10 in (0, 1)}
    t_ins = {k for k in t_keys if k % 10 in (0, 1)}
    assert o_ins == t_ins and o_ins


def test_drift_report_classes_and_silence(spark):
    """Identical states emit nothing; each drift class fires exactly on
    its construction; the summary counts match."""
    from changedatacapture_reporting_spark.operators.consistency import (
        drift_report,
        drift_summary,
    )

    left = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, None, 30), (4, "d", None)],
        "id long, s string, q long",
    )
    assert drift_report(left, left, ["id"], ["s", "q"]).count() == 0

    right = spark.createDataFrame(
        [(1, "a", 10),      # identical → silent
         (2, "b", 99),      # value_mismatch
         (3, "c", 30),      # NULL→value mismatch (null-safe compare)
         (5, "e", 50)],     # missing_in_left; id 4 → missing_in_right
        "id long, s string, q long",
    )
    got = {
        r.id: r.drift_kind
        for r in drift_report(left, right, ["id"], ["s", "q"]).collect()
    }
    assert got == {
        2: "value_mismatch", 3: "value_mismatch",
        4: "missing_in_right", 5: "missing_in_left",
    }
    summary = {
        r.drift_kind: r.n
        for r in drift_summary(left, right, ["id"], ["s", "q"]).collect()
    }
    assert summary == {
        "value_mismatch": 2, "missing_in_right": 1,
        "missing_in_left": 1, "n_keys_compared": 5,
    }
