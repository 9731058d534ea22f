"""Physical-plan audit over every contract query.

Greps each query's executed plan for scale red flags:

- ``BroadcastNestedLoopJoin`` / ``CartesianProduct`` — O(n*m) joins;
- ``BatchEvalPython`` — row-at-a-time Python in the dataflow (Arrow-
  vectorized ``ArrowEvalPython`` / ``MapInPandas`` / ``FlatMapGroupsInPandas``
  are fine and expected for the declared Python ops);
- parquet scans that read every column (no pruning) for queries that
  project a subset.

``streaming_*`` entries are audited via their PRE-SINK plans
(contracts_streaming.STREAM_PLANS): the unstarted streaming DataFrame is
explained — no execution, no availableNow drain — and additionally
checked for unbounded-state shapes: a stateful operator (StateStoreSave /
SessionWindowStateStore / StreamingSymmetricHashJoin /
StreamingDeduplicate) with no EventTimeWatermark in the plan, which at
100 TB is state that grows without bound.

Exit code 1 if any non-allowlisted flag fires. Usage:

    python tools/audit_plans.py [query ...]        # batch + streaming
    python tools/audit_plans.py --streaming        # streaming only
    python tools/audit_plans.py --batch            # batch only
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
    # same scalar shape: the ONE-ROW corpus document count broadcast
    # into the tf-idf score expression
    "corpus_tfidf_terms": {"BroadcastNestedLoopJoin"},
    # same scalar shape: the ONE-ROW total weight broadcast into the
    # PPS keep rule (operators/sampling.pps_sample)
    "corpus_pps_sample": {"BroadcastNestedLoopJoin"},
    # same scalar shape: the ONE-ROW (total_rows, n_keys) totals
    # broadcast against the top-N skew rows (operators/profile.key_skew)
    "profile_key_skew": {"BroadcastNestedLoopJoin"},
    # same scalar shape: three ONE-ROW aggregate frames folded into the
    # single report row (operators/profile.join_cardinality)
    "profile_join_cardinality": {"BroadcastNestedLoopJoin"},
    # same scalar shape: three ONE-ROW aggregate frames folded into the
    # ~7-row dataset card (operators/corpus.corpus_datasheet)
    "corpus_datasheet": {"BroadcastNestedLoopJoin"},
    # same scalar shape: the ONE-ROW vocabulary size |V| broadcast into
    # the add-one smoothing denominator (operators/lm.lm_surprisal_scores)
    "corpus_lm_surprisal": {"BroadcastNestedLoopJoin"},
    # accuracy contracts that compare the scale path against an embedded
    # exact reference (all-pairs jaccard / brute-force top-k) — the
    # quadratic node is the reference side, not the production path
    "dedup_simhash": {"CartesianProduct", "BroadcastNestedLoopJoin"},
    "ann_topk_lsh": {"CartesianProduct", "BroadcastNestedLoopJoin"},
    "ann_topk_ivf": {"CartesianProduct", "BroadcastNestedLoopJoin"},
    "ann_topk_pq": {"CartesianProduct", "BroadcastNestedLoopJoin"},
    "ann_topk_ivfpq": {"CartesianProduct", "BroadcastNestedLoopJoin"},
    "ann_topk_ivfpq_residual": {"CartesianProduct", "BroadcastNestedLoopJoin"},
    # applyInPandasWithState keyed on the CDC primary key: state is
    # O(live keys) and bounded by delete-tombstone semantics + timeouts,
    # not by event time — no watermark is required or meaningful here
    "streaming_current_state": {"StatefulWithoutWatermark"},
}

FLAGS = ["BroadcastNestedLoopJoin", "CartesianProduct", "BatchEvalPython"]

# physical stateful operators that, without an EventTimeWatermark in the
# same plan, accumulate state forever
STATEFUL_MARKERS = [
    "StateStoreSave",
    "SessionWindowStateStore",
    "StreamingSymmetricHashJoin",
    "StreamingDeduplicate",
    "FlatMapGroupsInPandasWithState",
    "FlatMapGroupsWithState",
]


def _flag_hits(name: str, plan: str, streaming: bool) -> list[str]:
    hits = [f for f in FLAGS if f in plan and f not in ALLOW.get(name, set())]
    if streaming:
        stateful = any(m in plan for m in STATEFUL_MARKERS)
        if (
            stateful
            and "EventTimeWatermark" not in plan
            and "StatefulWithoutWatermark" not in ALLOW.get(name, set())
        ):
            hits.append("StatefulWithoutWatermark")
        if not stateful and "StreamingRelation" not in plan:
            # a "streaming" plan with no streaming source at all means the
            # pre-sink builder drifted from the contract — audit is void
            hits.append("NotAStreamingPlan")
    return hits


def main() -> int:
    import __spark_entry__ as e
    from changedatacapture_reporting_spark.contracts_streaming import (
        STREAM_PLANS,
    )
    from changedatacapture_reporting_spark.session import get_spark

    spark = get_spark("plan_audit")
    qs = e.queries()
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    mode = {a for a in sys.argv[1:] if a.startswith("--")}

    batch_names = [n for n in qs if not n.startswith("streaming_")]
    stream_names = list(STREAM_PLANS)
    if args:
        batch_names = [n for n in args if n in qs and n not in STREAM_PLANS]
        stream_names = [n for n in args if n in STREAM_PLANS]
    if "--streaming" in mode:
        batch_names = []
    if "--batch" in mode:
        stream_names = []

    missing = set(n for n in qs if n.startswith("streaming_")) - set(
        STREAM_PLANS
    )
    bad = 0
    if missing and not args:
        # every streaming contract entry must have a pre-sink plan to audit
        print(f"  streaming entries without STREAM_PLANS: {sorted(missing)}")
        bad += 1

    for name in batch_names:
        try:
            df = qs[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # noqa: BLE001
            print(f"  {name:42s} ERROR building plan: {ex}")
            bad += 1
            continue
        hits = _flag_hits(name, plan, streaming=False)
        if hits:
            print(f"  {name:42s} FLAG {','.join(hits)}")
            bad += 1
        else:
            print(f"  {name:42s} ok")

    explain = spark._sc._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString
    for name in stream_names:
        try:
            df = STREAM_PLANS[name](spark, SF_DIR)
            # pre-start explain: physical plan with StreamingRelation
            # placeholders — never executes the stream
            plan = explain(df._jdf.queryExecution(), "extended")
        except Exception as ex:  # noqa: BLE001
            print(f"  {name:42s} ERROR building plan: {ex}")
            bad += 1
            continue
        hits = _flag_hits(name, plan, streaming=True)
        if hits:
            print(f"  {name:42s} FLAG {','.join(hits)}")
            bad += 1
        else:
            print(f"  {name:42s} ok (streaming pre-sink)")

    total = len(batch_names) + len(stream_names) + (1 if missing and not args else 0)
    print(f"{total - bad}/{total} clean")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
