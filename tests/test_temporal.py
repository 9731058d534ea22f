"""temporal_enrich: interval semantics (closed-open, gaps → NULL, open
versions), every fact surviving exactly once, and agreement with both a
naive range-join reference and the scd2_history/reconstruct_state pair."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from changedatacapture_reporting_spark.operators.temporal import temporal_enrich

D = dt.datetime


def _dim(spark, rows):
    return spark.createDataFrame(
        rows, "k long, seg string, valid_from timestamp, valid_to timestamp"
    )


def _facts(spark, rows):
    return spark.createDataFrame(rows, "fid long, k long, ts timestamp")


def test_interval_semantics(spark):
    dim = _dim(
        spark,
        [
            (1, "a", D(2020, 1, 1), D(2020, 2, 1)),
            (1, "b", D(2020, 3, 1), None),  # gap Feb, open from Mar
            (2, "z", D(2020, 1, 1), D(2020, 1, 10)),  # closes, never reopens
        ],
    )
    facts = _facts(
        spark,
        [
            (1, 1, D(2019, 12, 31)),  # before first version → NULL
            (2, 1, D(2020, 1, 1)),    # exactly valid_from → that version
            (3, 1, D(2020, 1, 31)),   # inside v0
            (4, 1, D(2020, 2, 1)),    # exactly valid_to → gap → NULL
            (5, 1, D(2020, 2, 15)),   # gap → NULL
            (6, 1, D(2020, 3, 1)),    # open version start
            (7, 1, D(2021, 1, 1)),    # open version, far future
            (8, 2, D(2020, 1, 15)),   # after key's only version closed
            (9, 3, D(2020, 1, 1)),    # unknown key
            (10, 1, D(2020, 1, 31)),  # duplicate timestamp of fid 3
        ],
    )
    out = temporal_enrich(facts, dim, ["k"], "ts", ["seg"])
    got = {r.fid: r.seg for r in out.collect()}
    assert got == {
        1: None, 2: "a", 3: "a", 4: None, 5: None,
        6: "b", 7: "b", 8: None, 9: None, 10: "a",
    }
    assert out.count() == 10  # every fact exactly once
    assert out.columns == ["fid", "k", "ts", "seg"]


versions_strategy = st.lists(
    st.tuples(st.integers(0, 20), st.integers(1, 8), st.text("xy", min_size=1, max_size=2)),
    max_size=6,
)
facts_strategy = st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 25)), max_size=8
)


@given(vspec=versions_strategy, fspec=facts_strategy)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_matches_naive_range_join(spark, vspec, fspec):
    """Random non-overlapping versions per key vs a pure-Python interval
    lookup."""
    base = D(2020, 1, 1)
    # build non-overlapping versions per key: sort starts, duration caps
    # at the next start (may leave gaps); last version stays open
    by_key: dict[int, list] = {}
    for start, dur, seg in vspec:
        by_key.setdefault(start % 4 + 1, []).append((start, dur, seg))
    dim_rows, intervals = [], {}
    for k, vs in by_key.items():
        starts = sorted({s for s, _, _ in vs})
        ivs = []
        for i, s in enumerate(starts):
            dur = next(d for ss, d, _ in vs if ss == s)
            seg = next(g for ss, _, g in vs if ss == s)
            hi = starts[i + 1] if i + 1 < len(starts) else None
            end = None if hi is None else min(s + dur, hi)
            if end is not None and end <= s:
                end = hi  # zero-length → stretch to next start (still valid)
            if end == s:
                continue
            fr = base + dt.timedelta(days=s)
            to = None if end is None else base + dt.timedelta(days=end)
            dim_rows.append((k, seg, fr, to))
            ivs.append((fr, to, seg))
        intervals[k] = ivs
    facts_rows = [
        (i, k, base + dt.timedelta(days=d, hours=1))
        for i, (k, d) in enumerate(fspec)
    ]
    if not dim_rows or not facts_rows:
        return

    def lookup(k, ts):
        for fr, to, seg in intervals.get(k, []):
            if fr <= ts and (to is None or ts < to):
                return seg
        return None

    out = temporal_enrich(
        _facts(spark, facts_rows), _dim(spark, dim_rows), ["k"], "ts", ["seg"]
    )
    got = {r.fid: r.seg for r in out.collect()}
    want = {i: lookup(k, ts) for i, k, ts in facts_rows}
    assert got == want, (dim_rows, facts_rows)


def test_scd2_history_roundtrip(spark):
    """Enriching probes against scd2_history output equals querying each
    version interval directly — including the delete gap."""
    import pyspark.sql.types as T

    from changedatacapture_reporting_spark.operators.changelog import (
        build_changelog,
    )
    from changedatacapture_reporting_spark.operators.scd import scd2_history

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
    ev = [
        (1, 0, D(2024, 1, 1), "insert", "t", None, (1, "a")),
        (2, 0, D(2024, 1, 2), "update", "t", (1, "a"), (1, "b")),
        (3, 0, D(2024, 1, 3), "delete", "t", (1, "b"), None),
        (4, 0, D(2024, 1, 5), "insert", "t", None, (1, "c")),
    ]
    log = build_changelog(
        spark.createDataFrame(ev, SCHEMA), ["id"],
        carry_cols=["lsn", "seq"], record_insert_images=True,
    )
    hist = scd2_history(log, ["id"], ["v"])
    probes = spark.createDataFrame(
        [
            (1, 1, D(2024, 1, 1, 12)),  # v='a'
            (2, 1, D(2024, 1, 2, 12)),  # v='b'
            (3, 1, D(2024, 1, 4)),      # deleted → NULL
            (4, 1, D(2024, 1, 6)),      # re-inserted → 'c'
        ],
        "fid long, id int, ts timestamp",
    )
    out = temporal_enrich(probes, hist, ["id"], "ts", ["v"])
    assert {r.fid: r.v for r in out.collect()} == {
        1: "a", 2: "b", 3: None, 4: "c",
    }
