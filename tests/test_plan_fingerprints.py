"""Structural plan lockfile: the pinned-17 physical plan shapes must
match the committed fixture — a join-strategy flip, lost pushdown, or
extra shuffle fails HERE with an operator-sequence diff instead of
surfacing as a bench regression rounds later. After a DELIBERATE,
audited plan change: python tools/plan_fingerprints.py --write."""

from __future__ import annotations

import json
import os

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "changedatacapture_reporting_spark",
    "fixtures",
    "plan_fingerprints_sf0001.json",
)


def test_pinned17_plan_shapes_match_lockfile(spark, sf_dir):
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.plan_fingerprints import current

    want = json.load(open(FIXTURE))
    got = current()
    drift = {
        n: {"locked": want.get(n), "current": h}
        for n, h in got.items()
        if want.get(n) != h
    }
    assert not drift, f"plan drift (audit, then --write to relock): {drift}"
    assert len(got) == 27  # pinned-17 + the 10 most expensive non-pinned
