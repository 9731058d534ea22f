"""Physical-plan audit over every contract query.

Greps each query's executed plan for scale red flags:

- ``BroadcastNestedLoopJoin`` / ``CartesianProduct`` — O(n*m) joins;
- ``BatchEvalPython`` — row-at-a-time Python in the dataflow (Arrow-
  vectorized ``ArrowEvalPython`` / ``MapInPandas`` / ``FlatMapGroupsInPandas``
  are fine and expected for the declared Python ops);
- parquet scans that read every column (no pruning) for queries that
  project a subset.

Exit code 1 if any non-allowlisted flag fires. Usage:

    python tools/audit_plans.py [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

# queries whose semantics legitimately need the flagged node
ALLOW = {
    # intentionally quadratic verification oracles (documented; the
    # production paths are the LSH variants). dedup_embedding_neardup moved
    # to the LSH-bucketed equi-join path in r5 and is no longer allowed any
    # nested-loop node.
    "dedup_ngram_jaccard": {"CartesianProduct", "BroadcastNestedLoopJoin"},
    "ann_topk_bruteforce": {"CartesianProduct", "BroadcastNestedLoopJoin"},
    # Q11's HAVING > fraction-of-global-total: the ONE-ROW total is
    # broadcast and crossJoined (no equi key exists for a scalar
    # threshold) — O(n x 1), the correct plan at any scale
    "q11_important_parts": {"BroadcastNestedLoopJoin"},
    # accuracy contracts that compare the scale path against an embedded
    # exact reference (all-pairs jaccard / brute-force top-k) — the
    # quadratic node is the reference side, not the production path
    "dedup_simhash": {"CartesianProduct", "BroadcastNestedLoopJoin"},
    "ann_topk_lsh": {"CartesianProduct", "BroadcastNestedLoopJoin"},
    "ann_topk_ivf": {"CartesianProduct", "BroadcastNestedLoopJoin"},
}

FLAGS = ["BroadcastNestedLoopJoin", "CartesianProduct", "BatchEvalPython"]


def main() -> int:
    import __spark_entry__ as e
    from changedatacapture_reporting_spark.session import get_spark

    spark = get_spark("plan_audit")
    qs = e.queries()
    # streaming_* contract entries EXECUTE the stream (availableNow drain)
    # before returning a memory-sink scan — minutes of runtime for a
    # trivial audited plan. Their transformation plans are covered by the
    # batch analogs (events_tumbling_5min, events_sessionization, ...) and
    # tests/test_streaming.py; skip them unless named explicitly.
    names = sys.argv[1:] or [n for n in qs if not n.startswith("streaming_")]
    bad = 0
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # noqa: BLE001
            print(f"  {name:42s} ERROR building plan: {ex}")
            bad += 1
            continue
        hits = [f for f in FLAGS if f in plan and f not in ALLOW.get(name, set())]
        if hits:
            print(f"  {name:42s} FLAG {','.join(hits)}")
            bad += 1
        else:
            print(f"  {name:42s} ok")
    print(f"{len(names) - bad}/{len(names)} clean")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
