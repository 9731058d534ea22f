"""Time specific registry/bench entries into the noop sink (min of N
reps, bench.py methodology) — the r15 before/after A/B harness.

    python tools/ab_entries.py name1 name2 ... [--reps N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as e
    from changedatacapture_reporting_spark.session import get_spark

    spark = get_spark("ab_entries")
    qs = e.queries()
    qs[args[0]](spark, sf_dir).limit(1).collect()  # warm JVM
    for name in args:
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(time.perf_counter() - t0)
        print(
            f"{name}: min={min(runs):.3f}s "
            f"all={[round(r, 3) for r in runs]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
