"""snapshot_diff invariants (ADVICE r07 item 1): for RANDOM op
histories (inserts, updates, no-op updates, deletes, re-inserts) and
RANDOM A/B LSN cuts, the one-aggregation diff must equal the naive
reference — reconstruct state at A, reconstruct at B, full-outer join,
classify. The operator's whole point is computing that WITHOUT either
reconstruction or the join, so the reference is the semantics oracle."""

from __future__ import annotations

import pytest

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from changedatacapture_reporting_spark.operators.changelog import build_changelog
from changedatacapture_reporting_spark.operators.diff import snapshot_diff
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
VALUE_COLS = ["name", "qty"]

# abstract per-key steps; sanitized against liveness while building events
step = st.tuples(
    st.sampled_from(["insert", "set_name", "set_qty", "noop", "delete"]),
    st.one_of(st.text(alphabet="abc", max_size=2), st.integers(0, 9)),
)
corpus = st.dictionaries(st.integers(1, 6), st.lists(step, max_size=6), max_size=5)


def _build_events(corpus):
    """Interleave keys round-robin so cuts land mid-history for several
    keys at once. Returns (rows, max_lsn)."""
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
                # any op on a dead key becomes (re-)insert
                state = {"id": key, "name": f"i{lsn}", "qty": lsn % 7}
                alive[key] = state
                rows.append(
                    (lsn, 0, ts, "insert", "t", None,
                     (key, state["name"], state["qty"]))
                )
                continue
            state = alive[key]
            before = (key, state["name"], state["qty"])
            if kind == "delete":
                del alive[key]
                rows.append((lsn, 0, ts, "delete", "t", before, None))
            else:
                if kind == "set_name":
                    state["name"] = str(val)
                elif kind == "set_qty":
                    state["qty"] = val if isinstance(val, int) else len(val)
                # noop → before == after → changelog records nothing
                rows.append(
                    (lsn, 0, ts, "update", "t", before,
                     (key, state["name"], state["qty"]))
                )
    return rows, lsn


def _reference_diff(log, lsn_a, lsn_b):
    """Naive semantics: reconstruct at each cut, join, classify."""
    def state_at(cut):
        return {
            r.id: (r.name, r.qty)
            for r in reconstruct_state(
                log, ["id"], VALUE_COLS, as_of_lsn=cut
            ).collect()
        }

    a, b = state_at(lsn_a), state_at(lsn_b)
    out = {}
    for k in set(a) | set(b):
        if k in a and k not in b:
            out[k] = ("delete", a[k], (None, None))
        elif k not in a and k in b:
            out[k] = ("insert", (None, None), b[k])
        elif a[k] != b[k]:
            out[k] = ("update", a[k], b[k])
    return out


@given(corpus=corpus, cuts=st.tuples(st.integers(0, 40), st.integers(1, 40)))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_snapshot_diff_matches_reconstruct_and_join(spark, corpus, cuts):
    rows, max_lsn = _build_events(corpus)
    if not rows:
        return
    lo, hi = sorted(cuts)
    lsn_a = lo % (max_lsn + 1)
    lsn_b = 1 + (hi % (max_lsn + 1))
    if lsn_a >= lsn_b:
        lsn_a, lsn_b = max(0, lsn_b - 1), max(1, lsn_a + 1)
    if lsn_a >= lsn_b:
        return

    events = spark.createDataFrame(rows, EVENT_SCHEMA)
    log = build_changelog(
        events, ["id"], with_audit_cols=False,
        carry_cols=["lsn", "seq"], record_insert_images=True,
    ).localCheckpoint()

    got = {
        r.id: (r.change_kind, (r.old_name, r.old_qty), (r.new_name, r.new_qty))
        for r in snapshot_diff(
            log, ["id"], VALUE_COLS, lsn_a=lsn_a, lsn_b=lsn_b
        ).collect()
    }
    want = {
        k: (kind,
            tuple(None if v is None else str(v) for v in old),
            tuple(None if v is None else str(v) for v in new))
        for k, (kind, old, new) in _reference_diff(log, lsn_a, lsn_b).items()
    }
    assert got == want, (lsn_a, lsn_b, rows)


def test_snapshot_diff_delete_reinsert_between_cuts(spark):
    """delete → re-insert strictly inside (A, B] must surface as an
    update (old = A-epoch values, new = B-epoch values) with no value
    leaking across the delete boundary — the epoch case the docstring
    promises and the one a naive last-value diff gets wrong."""
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, 0, base, "insert", "t", None, (1, "a", 10)),
        (2, 0, base + dt.timedelta(minutes=1), "update", "t",
         (1, "a", 10), (1, "a", 7)),
        # --- cut A = 2 ---
        (3, 0, base + dt.timedelta(minutes=2), "delete", "t",
         (1, "a", 7), None),
        (4, 0, base + dt.timedelta(minutes=3), "insert", "t", None,
         (1, "z", 5)),
        # key 2: insert then delete entirely inside (A, B] → no diff row
        (5, 0, base + dt.timedelta(minutes=4), "insert", "t", None,
         (2, "b", 1)),
        (6, 0, base + dt.timedelta(minutes=5), "delete", "t",
         (2, "b", 1), None),
        # --- cut B = 6 ---
    ]
    events = spark.createDataFrame(rows, EVENT_SCHEMA)
    log = build_changelog(
        events, ["id"], with_audit_cols=False,
        carry_cols=["lsn", "seq"], record_insert_images=True,
    )
    out = {
        r.id: (r.change_kind, r.old_name, r.old_qty, r.new_name, r.new_qty)
        for r in snapshot_diff(
            log, ["id"], VALUE_COLS, lsn_a=2, lsn_b=6
        ).collect()
    }
    assert out == {1: ("update", "a", "7", "z", "5")}


@given(corpus=corpus, ncuts=st.integers(1, 4))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@pytest.mark.soak  # randomized/exhaustive sweep - pre-commit gate only
def test_reconstruct_series_equals_per_cut_states(spark, corpus, ncuts):
    """reconstruct_series at N random cuts == reconstruct_state run once
    per cut — the one-pass fold must agree with the trusted per-cut
    operator on every boundary, delete→re-insert epochs included."""
    from changedatacapture_reporting_spark.operators.reconstruct import (
        reconstruct_series,
    )

    rows, max_lsn = _build_events(corpus)
    if not rows:
        return
    cuts = sorted({1 + (7 * i * max_lsn // (ncuts + 1)) % (max_lsn + 1)
                   for i in range(1, ncuts + 1)})
    events = spark.createDataFrame(rows, EVENT_SCHEMA)
    log = build_changelog(
        events, ["id"], with_audit_cols=False,
        carry_cols=["lsn", "seq"], record_insert_images=True,
    ).localCheckpoint()

    got = {
        (r.cut, r.id): (r.name, r.qty)
        for r in reconstruct_series(
            # K=2 forces the r11 multi-pass batching for any ncuts ≥ 3,
            # so the fuzz exercises batch boundaries (incl. delete →
            # re-insert epochs straddling them) against the per-cut
            # oracle, not just the single-pass fold
            log, ["id"], VALUE_COLS, cuts=cuts, max_cuts_per_pass=2
        ).collect()
    }
    want = {}
    for cut in cuts:
        for r in reconstruct_state(
            log, ["id"], VALUE_COLS, as_of_lsn=cut
        ).collect():
            want[(cut, r.id)] = (r.name, r.qty)
    assert got == want, (cuts, rows)


def test_reconstruct_series_batched_equals_single_pass(spark):
    """C > max_cuts_per_pass splits the fold into ⌈C/K⌉ passes (bounded
    whole-stage-codegen, VERDICT r10 #4) — the union of batches must be
    row-identical to one unbatched pass over the same 12 cuts."""
    from changedatacapture_reporting_spark.operators.reconstruct import (
        reconstruct_series,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    lsn = 0
    # 3 keys × insert/update/delete/re-insert churn spread over 24 lsns
    for k in (1, 2, 3):
        rows.append((lsn := lsn + 1, 0, base, "insert", "t", None,
                     (k, f"a{k}", 10 * k)))
        rows.append((lsn := lsn + 1, 0, base, "update", "t",
                     (k, f"a{k}", 10 * k), (k, f"b{k}", 10 * k + 1)))
        rows.append((lsn := lsn + 1, 0, base, "delete", "t",
                     (k, f"b{k}", 10 * k + 1), None))
        rows.append((lsn := lsn + 1, 0, base, "insert", "t", None,
                     (k, f"c{k}", 10 * k + 2)))
    events = spark.createDataFrame(rows, EVENT_SCHEMA)
    log = build_changelog(
        events, ["id"], with_audit_cols=False,
        carry_cols=["lsn", "seq"], record_insert_images=True,
    ).localCheckpoint()
    cuts = list(range(1, 13))  # C=12 > K=8 -> two passes

    def _run(**kw):
        return sorted(
            (r.cut, r.id, r.name, r.qty)
            for r in reconstruct_series(
                log, ["id"], VALUE_COLS, cuts=cuts, **kw
            ).collect()
        )

    batched = _run()  # default K=8
    single = _run(max_cuts_per_pass=100)
    tiny = _run(max_cuts_per_pass=1)  # degenerate: one pass per cut
    assert batched == single == tiny and batched
