"""SCD Type-2 history over the changelog: version intervals, carry-forward
(including change-to-NULL), delete closing, epoch reset on re-insert."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from changedatacapture_reporting_spark.operators.changelog import build_changelog
from changedatacapture_reporting_spark.operators.scd import scd2_history

PK = ["id", "tenant_id"]
VALS = ["name", "qty", "note"]


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_scd2_versions_from_fixture(spark, cdc_fixture):
    log = build_changelog(
        cdc_fixture, PK, with_audit_cols=False, record_insert_images=True,
        carry_cols=["lsn", "seq"]
    )
    got = {
        ((r.id, r.tenant_id), r.valid_from): r
        for r in scd2_history(log, PK, VALS).collect()
    }

    # row (1,1): insert → 2 updates; NULL→value note transition
    v1 = got[((1, 1), ts("2024-01-01 10:00:00"))]
    assert (v1.name, v1.qty, v1.note) == ("a", "10", None)
    assert v1.valid_to == ts("2024-01-02 09:00:00") and not v1.is_current
    v2 = got[((1, 1), ts("2024-01-02 09:00:00"))]
    assert (v2.name, v2.qty, v2.note) == ("a2", "11", None)
    v3 = got[((1, 1), ts("2024-01-02 09:30:00"))]
    assert (v3.name, v3.qty, v3.note) == ("a2", "11", "filled")
    assert v3.valid_to is None and v3.is_current

    # row (2,1): value→NULL transition must override the carried value,
    # and the same-timestamp double update folds to its final image
    v2b = got[((2, 1), ts("2024-01-02 09:45:00"))]
    assert (v2b.name, v2b.qty, v2b.note) == ("b", "20", None)
    v3b = got[((2, 1), ts("2024-01-04 12:00:00"))]
    assert (v3b.name, v3b.qty, v3b.note) == ("b", "22", None)
    assert v3b.is_current

    # row (3,2): deleted — last version closed at delete time, no current
    v1c = got[((3, 2), ts("2024-01-01 10:02:00"))]
    assert v1c.valid_to == ts("2024-01-03 08:00:00") and not v1c.is_current
    assert not any(k[0] == (3, 2) and got[k].is_current for k in got)

    # version count: 3 + 3 + 1 (delete txn emits no version)
    assert len(got) == 7


def test_scd2_reinsert_after_delete_resets_carry(spark):
    """A re-inserted key must NOT inherit values from its deleted life."""
    from pyspark.sql import types as T

    src = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
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
    events = spark.createDataFrame(
        [
            (1, 0, ts("2024-01-01 10:00:00"), "insert", "t", None, (1, "a", 10)),
            (2, 0, ts("2024-01-02 10:00:00"), "update", "t",
             (1, "a", 10), (1, "a", 99)),
            (3, 0, ts("2024-01-03 10:00:00"), "delete", "t", (1, "a", 99), None),
            # re-insert with qty NULL — must not inherit 99
            (4, 0, ts("2024-01-04 10:00:00"), "insert", "t", None, (1, "z", None)),
        ],
        schema,
    )
    log = build_changelog(
        events, ["id"], with_audit_cols=False, record_insert_images=True,
        carry_cols=["lsn", "seq"]
    )
    versions = scd2_history(log, ["id"], ["name", "qty"]).collect()
    current = [v for v in versions if v.is_current]
    assert len(current) == 1
    assert (current[0].name, current[0].qty) == ("z", None)
    # the pre-delete life is closed at the delete timestamp
    closed = {v.valid_from: v.valid_to for v in versions if not v.is_current}
    assert closed[ts("2024-01-02 10:00:00")] == ts("2024-01-03 10:00:00")


def test_scd2_intervals_partition_time(spark, cdc_fixture):
    """For every key: intervals are adjacent (valid_to == next valid_from),
    non-overlapping, and at most one current version."""
    log = build_changelog(
        cdc_fixture, PK, with_audit_cols=False, record_insert_images=True,
        carry_cols=["lsn", "seq"]
    )
    rows = scd2_history(log, PK, VALS).collect()
    by_key: dict = {}
    for r in rows:
        by_key.setdefault((r.id, r.tenant_id), []).append(r)
    for vs in by_key.values():
        vs.sort(key=lambda r: r.valid_from)
        assert sum(1 for v in vs if v.is_current) <= 1
        for a, b in zip(vs, vs[1:]):
            assert a.valid_to is not None and a.valid_to <= b.valid_from


def test_scd2_requires_transaction_order_cols(spark, cdc_fixture):
    """A changelog built without lsn/seq cannot distinguish
    same-commit_time transactions — scd2_history must refuse it unless
    the caller opts into coarse grouping (ADVICE r01)."""
    import pytest

    coarse = build_changelog(
        cdc_fixture, PK, with_audit_cols=False, record_insert_images=True
    )
    with pytest.raises(ValueError, match="carry_cols"):
        scd2_history(coarse, PK, VALS)
    # explicit opt-in still works
    assert scd2_history(coarse, PK, VALS, allow_coarse_order=True).count() > 0


def test_scd2_same_commit_time_transactions_stay_distinct(spark):
    """Two transactions on one pk with EQUAL commit_time but different
    lsn must yield two versions in order — not one nondeterministically
    mixed version."""
    schema = (
        "lsn long, seq long, commit_ts timestamp, op string, "
        "table_name string, "
        "before struct<id:long, name:string, qty:long>, "
        "after struct<id:long, name:string, qty:long>"
    )
    t = ts("2024-06-01 12:00:00")
    events = spark.createDataFrame(
        [
            (1, 0, t, "insert", "t", None, (1, "a", 10)),
            (2, 0, t, "update", "t", (1, "a", 10), (1, "b", 10)),
            (3, 0, t, "update", "t", (1, "b", 10), (1, "c", 20)),
        ],
        schema,
    )
    log = build_changelog(
        events, ["id"], with_audit_cols=False, record_insert_images=True,
        carry_cols=["lsn", "seq"]
    )
    versions = sorted(
        scd2_history(log, ["id"], ["name", "qty"]).collect(),
        key=lambda r: (r.valid_from, r.name),
    )
    assert [v.name for v in versions] == ["a", "b", "c"]
    assert [v.is_current for v in versions] == [False, False, True]


def _vset(df):
    return {tuple(r) for r in df.collect()}


def test_scd2_merge_equals_full_rebuild_every_split(spark, cdc_fixture):
    """scd2_merge(scd2_history(log ≤ W), log > W) == scd2_history(log)
    at the three boundary-class splits of the fixture: after the inserts
    only (w=3 — every batch txn hits an open seed), immediately before
    the delete (w=6 — the batch closes an interval), and between the
    delete and the same-lsn double update (w=7 — the double update folds
    onto a seed as one version). (Originally every w in 1..7; the other
    four splits repeat these classes and cost ~25 s of suite budget.)"""
    from changedatacapture_reporting_spark.operators.scd import scd2_merge

    def log_of(ev):
        return build_changelog(
            ev, PK, with_audit_cols=False, record_insert_images=True,
            carry_cols=["lsn", "seq"],
        )

    full = _vset(scd2_history(log_of(cdc_fixture), PK, VALS))
    for w in (3, 6, 7):
        existing = scd2_history(
            log_of(cdc_fixture.filter(F.col("lsn") <= w)), PK, VALS
        )
        merged = scd2_merge(
            existing, log_of(cdc_fixture.filter(F.col("lsn") > w)), PK, VALS
        )
        assert _vset(merged) == full, f"split at lsn {w} diverged"


def test_scd2_merge_reinsert_crossing_the_batch_boundary(spark):
    """Key deleted in the existing history, re-inserted by the batch:
    the new life must not inherit values from the deleted one."""
    from pyspark.sql import types as T

    from changedatacapture_reporting_spark.operators.scd import scd2_merge

    src = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("tenant_id", T.IntegerType()),
            T.StructField("name", T.StringType()),
            T.StructField("qty", T.IntegerType()),
            T.StructField("note", T.StringType()),
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
    first = spark.createDataFrame(
        [
            (1, 0, ts("2024-01-01 00:00:00"), "insert", "t", None,
             (9, 1, "old", 5, "sticky")),
            (2, 0, ts("2024-01-02 00:00:00"), "delete", "t",
             (9, 1, "old", 5, "sticky"), None),
        ],
        schema,
    )
    second = spark.createDataFrame(
        [
            (3, 0, ts("2024-01-03 00:00:00"), "insert", "t", None,
             (9, 1, "new", 6, None)),
        ],
        schema,
    )

    def log_of(ev):
        return build_changelog(
            ev, PK, with_audit_cols=False, record_insert_images=True,
            carry_cols=["lsn", "seq"],
        )

    existing = scd2_history(log_of(first), PK, VALS)
    merged = scd2_merge(existing, log_of(second), PK, VALS)
    rows = {(r.id, r.tenant_id, r.valid_from): r for r in merged.collect()}
    v_old = rows[(9, 1, ts("2024-01-01 00:00:00"))]
    assert v_old.valid_to == ts("2024-01-02 00:00:00") and not v_old.is_current
    v_new = rows[(9, 1, ts("2024-01-03 00:00:00"))]
    assert (v_new.name, v_new.qty, v_new.note) == ("new", "6", None)
    assert v_new.is_current
    assert len(rows) == 2


# ---------------------------------------------------------------------------
# property: merge == full rebuild for ANY valid history and ANY split
# ---------------------------------------------------------------------------

from hypothesis import example, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

_SRC = T.StructType(
    [T.StructField("id", T.IntegerType()), T.StructField("v", T.StringType())]
)
_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("commit_ts", T.TimestampType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("table_name", T.StringType(), False),
        T.StructField("before", _SRC, True),
        T.StructField("after", _SRC, True),
    ]
)
_TS0 = ts("2024-01-01 00:00:00")


def _hist(draws):
    """Raw draws → valid history over ids 1-3 (insert when absent,
    update/delete when present; lsn doubles as the commit minute so
    order_cols stay strictly increasing)."""
    import datetime as dt

    alive: dict[int, tuple] = {}
    events = []
    lsn = 0
    for action, rid, v in draws:
        rid = rid % 3 + 1
        lsn += 1
        t = _TS0 + dt.timedelta(minutes=lsn)
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


@settings(max_examples=25, deadline=None)
@given(
    draws=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(0, 9)),
        min_size=2,
        max_size=14,
    ),
    split=st.floats(0.0, 1.0),
)
# history ends with every row deleted (the class VERDICT r11's serving
# counterexample lived in — max_examples=5 took three rounds to draw it)
@example(draws=[(1, 0, 1), (1, 1, 2), (0, 0, 0), (0, 1, 0)], split=0.5)
# all events churn ONE pk: insert → update → delete → re-insert → delete
@example(
    draws=[(1, 0, 1), (2, 0, 2), (0, 0, 0), (1, 0, 3), (0, 0, 0)],
    split=0.4,
)
@pytest.mark.soak  # heaviest property test - pre-commit gate only
def test_scd2_merge_matches_full_rebuild_any_history(spark, draws, split):
    from changedatacapture_reporting_spark.operators.scd import scd2_merge

    events = _hist(draws)
    n = len(events)
    s = max(1, min(n, int(split * n)))
    df = spark.createDataFrame(events, _SCHEMA)

    def log_of(e):
        return build_changelog(
            e, ["id"], with_audit_cols=False, record_insert_images=True,
            carry_cols=["lsn", "seq"],
        )

    full = _vset(scd2_history(log_of(df), ["id"], ["v"]))
    existing = scd2_history(
        log_of(df.filter(F.col("lsn") <= s)), ["id"], ["v"]
    )
    merged = scd2_merge(
        existing, log_of(df.filter(F.col("lsn") > s)), ["id"], ["v"]
    )
    assert _vset(merged) == full


def test_scd2_merge_materialize_guard(spark, cdc_fixture):
    """The `materialize` guard: auto mode warns when `existing` is an
    unpersisted computation (it is referenced 3x in the merge plan),
    stays silent for a materialized (parquet-backed) history or with
    materialize=True/False, and materialize=True collapses the existing
    subtree to a localCheckpoint scan while preserving the result."""
    import tempfile
    import warnings as _w

    from changedatacapture_reporting_spark.operators.scd import scd2_merge

    def log_of(ev):
        return build_changelog(
            ev, PK, with_audit_cols=False, record_insert_images=True,
            carry_cols=["lsn", "seq"],
        )

    existing = scd2_history(log_of(cdc_fixture.filter(F.col("lsn") <= 3)), PK, VALS)
    batch = log_of(cdc_fixture.filter(F.col("lsn") > 3))

    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        scd2_merge(existing, batch, PK, VALS)  # auto, computed subtree
    assert any("recomputed" in str(c.message) for c in caught)

    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        scd2_merge(existing, batch, PK, VALS, materialize=False)
        merged_true = scd2_merge(existing, batch, PK, VALS, materialize=True)
    assert not any("recomputed" in str(c.message) for c in caught)

    with tempfile.TemporaryDirectory(prefix="scd2_guard_") as d:
        existing.write.parquet(f"{d}/hist")
        hist = spark.read.parquet(f"{d}/hist")
        with _w.catch_warnings(record=True) as caught:
            _w.simplefilter("always")
            merged_tbl = scd2_merge(hist, batch, PK, VALS)  # auto, table scan
        assert not any("recomputed" in str(c.message) for c in caught)
        # the existing subtree appears exactly once per reference as a
        # checkpoint/table scan — and results agree across all modes
        assert _vset(merged_tbl) == _vset(merged_true)


def test_scd2_validate_rules(spark):
    """Every rule fires on a crafted defect; a well-formed history is
    silent; multi-rule versions emit one row per rule."""
    import datetime as dt

    from changedatacapture_reporting_spark.operators.scd import scd2_validate

    t = lambda d: dt.datetime(2024, 1, d)  # noqa: E731
    rows = [
        # key 1: well-formed (closed then open+current) -> silent
        (1, t(1), t(10), False),
        (1, t(10), None, True),
        # key 2: overlap (first ends after second starts)
        (2, t(1), t(15), False),
        (2, t(10), None, True),
        # key 3: open interval that is not last (+ noncurrent_open)
        (3, t(1), None, False),
        (3, t(10), None, True),
        # key 4: two current rows, first also closed
        (4, t(1), t(10), True),
        (4, t(10), None, True),
        # key 5: legal GAP after a delete -> silent
        (5, t(1), t(5), False),
        (5, t(20), None, True),
    ]
    df = spark.createDataFrame(
        rows, "id long, valid_from timestamp, valid_to timestamp, is_current boolean"
    )
    got = {
        (r.id, r.valid_from.day, r.violation)
        for r in scd2_validate(df, ["id"]).collect()
    }
    assert got == {
        (2, 1, "overlap"),
        (3, 1, "open_not_last"),
        (3, 1, "noncurrent_open"),
        (4, 1, "current_closed"),
        (4, 1, "multiple_current"),
        (4, 10, "multiple_current"),
    }
