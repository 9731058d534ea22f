"""operators.funnel + operators.cohort — event analytics."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from changedatacapture_reporting_spark.operators.cohort import cohort_retention
from changedatacapture_reporting_spark.operators.funnel import (
    funnel_counts,
    funnel_times,
)


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        # user 1: full funnel in order
        (1, ts("2024-01-01 10:00:00"), "view"),
        (1, ts("2024-01-01 10:05:00"), "click"),
        (1, ts("2024-01-01 10:30:00"), "purchase"),
        # user 2: purchase BEFORE click — funnel stalls at click... no:
        # view → purchase → click: click counts (after view), purchase
        # does NOT (its only event is before the click)
        (2, ts("2024-01-02 09:00:00"), "view"),
        (2, ts("2024-01-02 09:10:00"), "purchase"),
        (2, ts("2024-01-02 09:20:00"), "click"),
        # user 3: click only — never enters the funnel
        (3, ts("2024-01-03 12:00:00"), "click"),
        # user 4: view, then click outside a 1-hour horizon
        (4, ts("2024-01-04 08:00:00"), "view"),
        (4, ts("2024-01-04 10:30:00"), "click"),
        # user 5: same-timestamp view+click — tie must NOT advance
        (5, ts("2024-01-05 07:00:00"), "view"),
        (5, ts("2024-01-05 07:00:00"), "click"),
    ]
    return spark.createDataFrame(
        [(u, t, et) for u, t, et in rows],
        "user_id long, ts timestamp, event_type string",
    )


def test_funnel_times_ordering_rules(ev):
    t = {
        r.user_id: (r.t1, r.t2, r.t3)
        for r in funnel_times(ev, ["view", "click", "purchase"]).collect()
    }
    assert t[1] == (
        ts("2024-01-01 10:00:00"),
        ts("2024-01-01 10:05:00"),
        ts("2024-01-01 10:30:00"),
    )
    # user 2: click counts, purchase (earlier than click) does not
    assert t[2] == (
        ts("2024-01-02 09:00:00"),
        ts("2024-01-02 09:20:00"),
        None,
    )
    assert 3 not in t or t[3] == (None, None, None)
    # user 5: identical timestamps do not advance
    assert t[5] == (ts("2024-01-05 07:00:00"), None, None)


def test_funnel_counts_and_horizon(ev):
    got = {
        r.step_name: r.n_users
        for r in funnel_counts(ev, ["view", "click", "purchase"]).collect()
    }
    assert got == {"view": 4, "click": 3, "purchase": 1}

    bounded = {
        r.step_name: r.n_users
        for r in funnel_counts(
            ev, ["view", "click", "purchase"], horizon="1 hour"
        ).collect()
    }
    # user 4's click is 2.5h after the view — outside the horizon
    assert bounded == {"view": 4, "click": 2, "purchase": 1}


def test_funnel_requires_two_steps(ev):
    with pytest.raises(ValueError):
        funnel_times(ev, ["view"])


# (fold-vs-join-chain equivalence is proven by the events_funnel driver
# contract every round: the DuckDB oracle IS the join-chain formulation,
# hash-compared at sf0.01 — a pytest replay of the same differential
# costs ~10 s of suite budget for no added signal)


def test_cohort_retention_hand_checked(spark):
    rows = [
        # cohort of Mon 2024-01-01: users 1, 2
        (1, ts("2024-01-02 10:00:00")),  # week 0
        (1, ts("2024-01-09 10:00:00")),  # week 1
        (1, ts("2024-01-24 10:00:00")),  # week 3
        (2, ts("2024-01-03 10:00:00")),  # week 0
        (2, ts("2024-01-10 10:00:00")),  # week 1
        # cohort of Mon 2024-01-08: user 3
        (3, ts("2024-01-08 00:00:00")),  # week 0 (boundary instant)
        (3, ts("2024-01-16 10:00:00")),  # week 1
    ]
    e = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.cohort_week.isoformat(), r.week_offset): r.n_users
        for r in cohort_retention(e).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 2,
        ("2024-01-01", 3): 1,
        ("2024-01-08", 0): 1,
        ("2024-01-08", 1): 1,
    }


# ---------------------------------------------------------------------------
# property: funnel fold == a Python reference, for ANY event multiset
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_STEPS = ["view", "click", "purchase"]


def _reference_funnel(rows):
    """Strict-ordering reference: process each user's events in (ts,
    step-index) order — the same tiebreak as the operator's array_sort
    on struct(ts, step) — advancing at most one step per event."""
    by_user: dict[int, list] = {}
    for u, t, s in rows:
        by_user.setdefault(u, []).append((t, _STEPS.index(s)))
    out = {}
    for u, evs in by_user.items():
        times = [None, None, None]
        for t, si in sorted(evs):
            for i in (0, 1, 2):
                if times[i] is None and si == i and (
                    i == 0 or (times[i - 1] is not None and t > times[i - 1])
                ):
                    times[i] = t
                    break
        out[u] = tuple(times)
    return out


@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(1, 4),                       # user
            st.integers(0, 9),                       # minute offset (ties likely)
            st.sampled_from(_STEPS),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_funnel_times_matches_reference(spark, rows):
    base = dt.datetime(2024, 3, 1)
    data = [
        (u, base + dt.timedelta(minutes=m), s) for u, m, s in rows
    ]
    df = spark.createDataFrame(
        data, "user_id long, ts timestamp, event_type string"
    )
    got = {
        r.user_id: (r.t1, r.t2, r.t3)
        for r in funnel_times(df, _STEPS).collect()
    }
    ref = _reference_funnel(
        [(u, base + dt.timedelta(minutes=m), s) for u, m, s in rows]
    )
    assert got == ref
