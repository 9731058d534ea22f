"""Capture the r15 before/after plan evidence (run in BOTH trees —
the pre-round clone and HEAD — with OUT=plans/r15 SUFFIX=before|after):

- optimize one-pass staged-write plan (slot map: create_map literal
  vs broadcast join) + plan size and wall at 1x vs 10x file count;
- multi-group ZORDER: Spark JOB COUNT for an 8-group OPTIMIZE ZORDER
  (per-group loop vs one-pass) + the staged-write plan;
- CDF MERGE: the staged change-data frame's plan (postimage/insert
  legs recomputing the source lineage vs re-reading staged files);
- contract read-back plans for the touched bench entries.

    SUFFIX=after OUT=/root/repo/plans/r15 python tools/capture_r15_plans.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from changedatacapture_reporting_spark.plans.explain import (  # noqa: E402
    plan_string,
)
from changedatacapture_reporting_spark.session import get_spark  # noqa: E402
from changedatacapture_reporting_spark.sources import (  # noqa: E402
    delta_table as dt,
)

OUT = os.environ.get("OUT", "/root/repo/plans/r15")
SUFFIX = os.environ.get("SUFFIX", "after")
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
# comma-separated subset of {slotmap, zorder, merge, contracts}
STEPS = set(
    (os.environ.get("STEPS") or "slotmap,zorder,merge,contracts").split(",")
)


def dump(name: str, text: str) -> None:
    os.makedirs(OUT, exist_ok=True)
    with open(f"{OUT}/{name}_{SUFFIX}.txt", "w") as f:
        f.write(text)
    print(f"wrote {name}_{SUFFIX}.txt ({len(text)} chars)")


def job_count(spark, fn) -> int:
    """Spark jobs submitted by ``fn`` — read off the DAGScheduler's
    job-id counter, which (unlike job groups) also counts jobs
    submitted from worker THREADS (the r14 zorder path pools its
    per-group rewrites)."""
    sched = spark.sparkContext._jsc.sc().dagScheduler()
    before = int(sched.nextJobId())  # py4j unboxes the AtomicInteger
    fn()
    return int(sched.nextJobId()) - before


def main() -> None:
    spark = get_spark("capture_r15_plans")

    # --- 1. one-pass compaction slot map (multi-group, no zorder) ----
    def build_table(n_parts: int, commits: int, tag: str) -> str:
        path = tempfile.mkdtemp(prefix=f"plan_opt_{tag}_") + "/t"
        df = spark.range(0, 100 * n_parts).select(
            F.col("id"),
            (F.col("id") % n_parts).cast("int").alias("p"),
        )
        for _ in range(commits):
            dt.write_delta(
                spark, df.repartition(2), path, partition_by=["p"]
            )
        return path

    for scale, n_parts, commits in (
        ("1x", 4, 3),
        ("10x", 40, 3),
    ) if "slotmap" in STEPS else ():
        path = build_table(n_parts, commits, scale)
        n_files = len(
            dt._resolve_log(spark, path, None)["files"]
        )
        probe: dict = {}
        dt._PLAN_PROBE = probe
        t0 = time.perf_counter()
        jobs = job_count(
            spark, lambda: dt.optimize_delta(spark, path)
        )
        wall = time.perf_counter() - t0
        dt._PLAN_PROBE = None
        plan = probe.get("compact_one_pass", "(single-group path)")
        dump(f"optimize_slotmap_{scale}", plan)
        print(
            f"# optimize_slotmap {scale}: files={n_files} "
            f"plan_chars={len(plan)} jobs={jobs} wall={wall:.2f}s"
        )

    # --- 2. multi-group ZORDER job count ------------------------------
    if "zorder" in STEPS:
        _step_zorder(spark)

    # --- 3. CDF MERGE staged change-data plan -------------------------
    if "merge" in STEPS:
        _step_merge(spark)

    # --- 4. contract read-back plans ----------------------------------
    if "contracts" in STEPS:
        _step_contracts(spark)


def _step_zorder(spark) -> None:
    path = tempfile.mkdtemp(prefix="plan_zord_") + "/t"
    df = spark.range(0, 16000).select(
        F.col("id"),
        (F.col("id") % 8).cast("int").alias("p"),
        (F.col("id") * 37 % 1000).cast("long").alias("k"),
        (F.col("id") % 7).cast("long").alias("t"),
    )
    dt.write_delta(spark, df.repartition(4), path, partition_by=["p"])
    probe = {}
    dt._PLAN_PROBE = probe
    t0 = time.perf_counter()
    jobs = job_count(
        spark,
        lambda: dt.optimize_delta(
            spark, path, target_file_bytes=16 << 10,
            zorder_by=("k", "t"),
        ),
    )
    wall = time.perf_counter() - t0
    dt._PLAN_PROBE = None
    dump(
        "optimize_zorder_multigroup",
        probe.get(
            "zorder_one_pass",
            f"(per-group path; jobs={jobs})",
        ),
    )
    print(f"# zorder 8-group: jobs={jobs} wall={wall:.2f}s")


def _step_merge(spark) -> None:
    path = tempfile.mkdtemp(prefix="plan_cdf_") + "/t"
    base_dir = tempfile.mkdtemp(prefix="plan_cdf_base_")
    spark.range(0, 2000).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    ).write.mode("overwrite").parquet(base_dir)
    base = spark.read.parquet(base_dir)  # nullable schema, like src
    dt.write_delta(spark, base, path)
    # enable CDF the way the contract fixtures do
    state = dt._resolve_log(spark, path, None)
    meta = dict(state["meta"])
    cfg = dict(meta.get("configuration") or {})
    cfg["delta.enableChangeDataFeed"] = "true"
    meta["configuration"] = cfg
    log = dt._log_path(path)
    import json as _json

    from changedatacapture_reporting_spark import fs as _fs

    _fs.write_text(
        spark,
        _fs.join(log, dt._commit_name(state["version"] + 1)),
        _json.dumps({"metaData": meta}) + "\n",
    )
    # parquet-backed source with a non-trivial derivation, the shape
    # the CDF contracts feed MERGE (a range() source would make the
    # lineage recomputation look free)
    src_dir = tempfile.mkdtemp(prefix="plan_cdf_src_")
    spark.range(500, 2500).select(
        F.col("id"), (F.col("id") * 3).alias("v")
    ).write.mode("overwrite").parquet(src_dir)
    raw = spark.read.parquet(src_dir)
    src = (
        raw.groupBy("id")
        .agg(F.max("v").alias("v"))
        .select("id", (F.col("v") + 0).alias("v"))
    )
    probe = {}
    dt._PLAN_PROBE = probe
    jobs = job_count(
        spark,
        lambda: dt.merge_delta(spark, src, path, ["id"]),
    )
    dt._PLAN_PROBE = None
    plans = probe.get("stage_cdc", ["(none)"])
    dump("merge_cdf_stage", "\n\n===\n\n".join(plans))
    n_scans = plans[0].count("Scan parquet")
    print(f"# merge cdf: jobs={jobs} cdc_plan_scans={n_scans}")


def _step_contracts(spark) -> None:
    import __spark_entry__ as e

    qs = e.queries()
    for name in (
        "cdc_forget_keys_delta",
        "cdc_populate_delta_sink",
        "delta_cdf_writes",
        "ann_topk_bruteforce",
    ):
        try:
            dfq = qs[name](spark, SF)
            dump(name, plan_string(dfq))
        except Exception as exc:  # noqa: BLE001
            print(f"# {name}: ERROR {exc}")


if __name__ == "__main__":
    main()
