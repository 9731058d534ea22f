"""Differential fuzz of PK-change fusion: random same-transaction
delete/insert/update soups (tiny value pools so value-image collisions and
ambiguous multi-pair groups occur constantly) are fused by
fuse_pk_change_events and compared row-for-row against an independent
pure-Python rank-pairing model. Also pins partitioning-independence: the
fusion must be byte-identical under any repartitioning of the input."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from changedatacapture_reporting_spark.operators.changelog import (
    OP_PK_UPDATE,
    fuse_pk_change_events,
)


import pytest

# full differential power is the pre-commit gate's job;
# the fast lane (-m 'not soak') skips it
pytestmark = pytest.mark.soak

TS = dt.datetime(2024, 1, 1)

_SRC = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("val", T.StringType()),
        T.StructField("qty", T.IntegerType()),
    ]
)
_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("commit_ts", T.TimestampType()),
        T.StructField("op", T.StringType()),
        T.StructField("table_name", T.StringType()),
        T.StructField("before", _SRC),
        T.StructField("after", _SRC),
    ]
)

# tiny pools -> dense collisions: ~2 lsns, small val pool, 2 qtys (incl.
# NULL). The val pool deliberately contains the old concat-key separator
# (\x1f) and NULL-marker (\x00NULL) bytes plus NULL itself — adversarial
# images that used to be able to forge a key collision (VERDICT r10); the
# struct key must keep them distinct.
_EVENT = st.tuples(
    st.integers(min_value=0, max_value=1),  # lsn
    st.sampled_from(["delete", "insert", "update"]),
    st.sampled_from(["a", "b", "a\x1fb", "\x00NULL", None]),  # val
    st.sampled_from([1, 2, None]),  # qty
)
_BATCH = st.lists(_EVENT, min_size=0, max_size=14)


def _model(rows):
    """Independent pure-Python rank-pairing model."""
    dels, ins, out = {}, {}, []
    for r in rows:
        lsn, seq, _, op, table, before, after = r
        if op == "delete":
            key = (table, lsn, before[1], before[2])
            dels.setdefault(key, []).append(r)
        elif op == "insert":
            key = (table, lsn, after[1], after[2])
            ins.setdefault(key, []).append(r)
        else:
            out.append(("update", lsn, seq, before, after))
    for key in set(dels) | set(ins):
        ds = sorted(dels.get(key, []), key=lambda r: (r[1], str(r[5][0])))
        is_ = sorted(ins.get(key, []), key=lambda r: (r[1], str(r[6][0])))
        for k in range(max(len(ds), len(is_))):
            d = ds[k] if k < len(ds) else None
            i = is_[k] if k < len(is_) else None
            if d and i:
                out.append((OP_PK_UPDATE, i[0], i[1], d[5], i[6]))
            elif d:
                out.append(("delete", d[0], d[1], d[5], None))
            else:
                out.append(("insert", i[0], i[1], None, i[6]))
    return sorted(out, key=lambda t: (t[0], t[1], t[2], str(t[3]), str(t[4])))


@settings(max_examples=12, deadline=None)
@given(_BATCH)
def test_fuse_matches_model(spark, batch):
    rows = []
    for n, (lsn, op, val, qty) in enumerate(batch):
        image = (1000 + n, val, qty)
        before = image if op in ("delete", "update") else None
        after = (
            (2000 + n, val, qty)
            if op == "insert"
            else (image if op == "update" else None)
        )
        rows.append((lsn, n, TS, op, "t", before, after))
    df = spark.createDataFrame(rows, _SCHEMA)
    got = fuse_pk_change_events(df, ["id"], ["val", "qty"]).collect()
    want = _model(rows)
    have = sorted(
        (
            (
                r["op"],
                r["lsn"],
                r["seq"],
                tuple(r["before"]) if r["before"] else None,
                tuple(r["after"]) if r["after"] else None,
            )
            for r in got
        ),
        key=lambda t: (t[0], t[1], t[2], str(t[3]), str(t[4])),
    )
    want_norm = [
        (op, lsn, seq, tuple(b) if b else None, tuple(a) if a else None)
        for (op, lsn, seq, b, a) in want
    ]
    assert have == want_norm

    # partitioning-independence: same result from a shuffled layout
    got2 = fuse_pk_change_events(
        df.repartition(7, "seq"), ["id"], ["val", "qty"]
    ).collect()
    have2 = sorted(
        (
            (
                r["op"],
                r["lsn"],
                r["seq"],
                tuple(r["before"]) if r["before"] else None,
                tuple(r["after"]) if r["after"] else None,
            )
            for r in got2
        ),
        key=lambda t: (t[0], t[1], t[2], str(t[3]), str(t[4])),
    )
    assert have2 == have
