"""Structural plan lockfile for the pinned-17 headline queries.

The per-property plan tests (tests/test_relational_plans.py) assert
SPECIFIC facts — a filter pushed, a join broadcast. This tool locks the
WHOLE physical plan shape: the normalized sequence of physical operator
heads for each pinned-17 query at sf0.001, committed as a fixture. Any
change — a join strategy flip after an innocent-looking refactor, a lost
pushdown, an extra shuffle — shows up as a fingerprint drift in
tests/test_plan_fingerprints.py BEFORE it shows up as a bench
regression, with a diff of the operator sequences instead of a slower
number three rounds later.

Normalization keeps the operator head tokens only (codegen ids, column
lists, expr ids, paths all stripped), so the fingerprint is stable
across runs/machines but sensitive to structure. The initial physical
plan is taken pre-execution (AQE hasn't rewritten it), which is
deterministic given the session config and the committed fixture sizes.

Regenerate DELIBERATELY after a plan change you have audited:

    python tools/plan_fingerprints.py --write
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "changedatacapture_reporting_spark",
    "fixtures",
    "plan_fingerprints_sf0001.json",
)

_HEAD = re.compile(r"^[\s:+\-*()0-9]*([A-Za-z][A-Za-z0-9_]*)")


def plan_heads(df) -> list[str]:
    """Physical operator head per plan line, normalized."""
    txt = df._jdf.queryExecution().executedPlan().toString()
    heads = []
    for line in txt.splitlines():
        if line.startswith("   ") and ":" in line[:20] and "+-" not in line:
            # continuation/detail lines under formatted output
            continue
        m = _HEAD.match(line)
        if not m:
            continue
        h = m.group(1)
        if h in ("AdaptiveSparkPlan", "ResultQueryStage", "Execute"):
            continue
        heads.append(h)
    return heads


# Most expensive NON-pinned entries (VERDICT r10 #6): strategy flips
# where the money is must fail here as a fingerprint diff, not surface
# as bench noise three rounds later.
EXTRA_LOCKED = [
    "ann_topk_ivfpq",
    "ann_topk_ivfpq_residual",
    "cdc_reconstruct_series",
    "cdc_scd2_incremental",
    "corpus_bpe_encode",
    "corpus_lm_surprisal",
    "dedup_cluster_representatives",
    "dedup_embedding_incremental",
    "dedup_incremental_batch",
    "text_mixed_language",
]


def current(names: list[str] | None = None) -> dict[str, list[str]]:
    import bench
    from changedatacapture_reporting_spark import contracts
    from changedatacapture_reporting_spark.session import get_spark

    spark = get_spark("plan_fingerprints")
    qs = contracts.queries()
    locked = sorted(bench.HEADLINE_TOTAL_SET) + EXTRA_LOCKED
    if names:
        locked = [n for n in locked if n in set(names)]
    out = {}
    for n in locked:
        # cached/persisted frames (dedup band indexes etc.) left by a
        # previous entry — or by earlier tests sharing the session —
        # get substituted into matching plan subtrees as
        # InMemoryRelation, making the fingerprint depend on session
        # history; capture every plan from a clean cache slate
        spark.catalog.clearCache()
        out[n] = plan_heads(qs[n](spark, SF_DIR))
    return out


def main() -> None:
    got = current([a for a in sys.argv[1:] if not a.startswith("-")])
    if "--write" in sys.argv:
        with open(FIXTURE, "w") as f:
            json.dump(got, f, indent=1, sort_keys=True)
        print(f"wrote {len(got)} fingerprints to {FIXTURE}")
        return
    want = json.load(open(FIXTURE))
    bad = 0
    for n, heads in got.items():
        if want.get(n) != heads:
            bad += 1
            print(f"DRIFT {n}")
            print(f"  locked:  {want.get(n)}")
            print(f"  current: {heads}")
        else:
            print(f"  {n:40} ok")
    if bad:
        print(f"{bad} plan(s) drifted — audit, then --write to relock")
        sys.exit(1)
    print(f"{len(got)}/{len(got)} plans match the lockfile")


if __name__ == "__main__":
    main()
