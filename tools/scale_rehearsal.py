"""Scale rehearsal: time registry entries (and bench steady overrides) at
two scale factors in ONE session and print the ratio table for NOTES.

The question this answers is the 100 TB one: when the data grows 10×,
does the operator's cost grow ≤10× (linear or better) or blow up
superlinearly (a hidden all-pairs / global-sort / driver loop)?

Usage:
  python tools/make_sf1.py                       # once per container
  python tools/scale_rehearsal.py [op ...]       # default: the wave-2 set
Env: REHEARSAL_BASE (default /root/testdata/sf0.1),
     REHEARSAL_BIG (default /tmp/sf1), REHEARSAL_REPS (default 3).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# wave 2 (VERDICT r9 item 7): the incremental-ingestion paths whose 100 TB
# story is "shuffle ∝ batch, not corpus" — unmeasured at 10× until now —
# plus the steady-state ANN serving path.
DEFAULT_OPS = [
    "dedup_incremental_batch",
    "dedup_embedding_incremental",
    "ann_topk_ivfpq_steady",
    "corpus_lm_surprisal",
]


def main() -> None:
    import bench as b
    import __spark_entry__ as e
    from changedatacapture_reporting_spark.session import get_spark

    ops = sys.argv[1:] or DEFAULT_OPS
    base = os.environ.get("REHEARSAL_BASE", "/root/testdata/sf0.1")
    big = os.environ.get("REHEARSAL_BIG", "/tmp/sf1")
    reps = int(os.environ.get("REHEARSAL_REPS", "3"))

    spark = get_spark("scale_rehearsal")
    qs = e.queries() | b._overrides()
    missing = [o for o in ops if o not in qs]
    if missing:
        raise SystemExit(f"unknown ops: {missing}")

    def run(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        return best

    # warm the JVM once, untimed
    qs[ops[0]](spark, base).limit(1).collect()

    print(f"| query | {base} (s) | {big} (s) | ratio at 10x data |")
    print("|---|---|---|---|")
    for name in ops:
        # contracts .cache() intermediates (band indexes etc.); leftover
        # cached frames from the previous op skew the next one's JVM —
        # start each op from a clean executor-storage slate
        spark.catalog.clearCache()
        t_base = run(name, base)
        t_big = run(name, big)
        print(
            f"| {name} | {t_base:.3f} | {t_big:.3f} |"
            f" {t_big / t_base:.2f}x |",
            flush=True,
        )


if __name__ == "__main__":
    main()
