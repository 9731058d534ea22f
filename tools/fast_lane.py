"""Sharded fast lane: the `-m "not soak"` suite across N parallel
pytest processes, each on its own SparkSession (``SPARK_GRAFT_CPUS``
per shard × N shards ≈ the box), because the sequential lane is
latency-bound — hundreds of small Spark jobs leave 32 cores idle.

Shards are whole test FILES (session/module fixtures stay coherent),
greedy-balanced by a committed weight table (measured seconds; files
not listed weigh by test count). Exit code is non-zero if ANY shard
fails; per-shard tails are printed either way.

    python tools/fast_lane.py            # 4 shards, 8 cores each
    SHARDS=3 python tools/fast_lane.py
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHARDS = int(os.environ.get("SHARDS", "4"))
CPUS_PER_SHARD = max(4, 32 // SHARDS)

# measured fast-lane seconds (r13 box, -m "not soak"); unlisted files
# weigh 3 s per collected test
WEIGHTS = {
    "test_streaming.py": 150,
    "test_delta_table.py": 110,
    "test_layout.py": 95,
    "test_deletion_vectors.py": 87,
    "test_llm_ops.py": 85,
    "test_populate.py": 75,
    "test_serving.py": 70,
    "test_fuzz_deletion_vectors.py": 60,
    "test_commit_protocol.py": 55,
    "test_foreign_dv.py": 50,
    "test_relational_plans.py": 45,
    "test_compaction.py": 45,
    "test_scd.py": 45,
    "test_maintenance.py": 40,
    "test_empty_generation.py": 40,
    "test_net_changes.py": 35,
    "test_diff.py": 35,
    "test_cdc_sources.py": 30,
    "test_plan_fingerprints.py": 32,
}


def main() -> int:
    files = sorted(
        os.path.basename(p) for p in glob.glob(f"{REPO}/tests/test_*.py")
    )
    shards: list[list[str]] = [[] for _ in range(SHARDS)]
    loads = [0.0] * SHARDS
    for f in sorted(files, key=lambda f: -WEIGHTS.get(f, 20)):
        i = loads.index(min(loads))
        shards[i].append(f)
        loads[i] += WEIGHTS.get(f, 20)

    procs = []
    t0 = time.time()
    for i, group in enumerate(shards):
        env = dict(os.environ)
        env["SPARK_GRAFT_CPUS"] = str(CPUS_PER_SHARD)
        env["SPARK_GRAFT_DRIVER_MEM"] = "16g"
        out = tempfile.NamedTemporaryFile(
            mode="w+", suffix=f"_shard{i}.log", delete=False
        )
        p = subprocess.Popen(
            [
                sys.executable, "-m", "pytest",
                "-m", "not soak", "-q", "-p", "no:cacheprovider",
                *[f"tests/{f}" for f in group],
            ],
            cwd=REPO, env=env, stdout=out, stderr=subprocess.STDOUT,
        )
        procs.append((i, p, out.name, group))
    rc = 0
    for i, p, log, group in procs:
        code = p.wait()
        with open(log) as fh:
            tail = fh.read().strip().splitlines()
        summary = tail[-1] if tail else "(no output)"
        print(f"shard {i} rc={code}: {summary}")
        if code != 0:
            rc = 1
            print("\n".join(tail[-40:]))
    print(f"fast lane total: {time.time() - t0:.0f}s across {SHARDS} shards")
    return rc


if __name__ == "__main__":
    sys.exit(main())
