"""Wave-6 scale rehearsal: the compaction/maintenance family at 10x.

The claims under test (the "O(state) + O(window)" story VERDICT r12 #8
asked to measure rather than assert):

- ``compact_changelog`` / ``retain_changelog`` — one pass over the log,
  output ∝ live state (+ tail): wall time should scale ≈ linearly with
  log size, never superlinearly.
- ``compact_sink_files`` — physical rewrite ∝ selected partitions'
  bytes (here: all of them, so ≈ linear), never history-squared.
- ``expire_changelog_months`` — partition-DROP retention is metadata
  work: wall time should stay FLAT at 10x data.
- post-compaction equality at the BIG scale: reconstruct_state over the
  compacted log == over the full log (exceptAll both ways), re-proving
  the fold's correctness where the file counts are real.

Run from the repo root:

    python tools/rehearsal_wave6.py            # 1x vs 10x ratio table
    N_REP=4 python tools/rehearsal_wave6.py    # cheaper soak
"""

from __future__ import annotations

import datetime as dt
import os
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from changedatacapture_reporting_spark.operators.maintenance import (  # noqa: E402
    compact_changelog,
    compact_sink_files,
    expire_changelog_months,
    retain_changelog,
)
from changedatacapture_reporting_spark.operators.populate import (  # noqa: E402
    populate_changelog,
)
from changedatacapture_reporting_spark.operators.reconstruct import (  # noqa: E402
    reconstruct_state,
)
from changedatacapture_reporting_spark.session import get_spark  # noqa: E402
from changedatacapture_reporting_spark.sources.cdc_simulator import (  # noqa: E402
    SIM_PK,
    simulate_cdc_events,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_REP = int(os.environ.get("N_REP", "10"))
VALUE_COLS = ["status", "priority", "total", "note"]


def replicate(ev, n):
    """Key-offset replicas (offset ≡ 0 mod 10 so op-mix selectors keyed
    on k % m are preserved per replica — the make_sf1 lesson)."""
    out = None
    for i in range(n):
        off = i * 100_000_000
        b = (
            ev.withColumn("lsn", F.col("lsn") + F.lit(off))
            .withColumn(
                "before",
                F.when(
                    F.col("before").isNotNull(),
                    F.col("before").withField(
                        "o_orderkey",
                        F.col("before.o_orderkey") + F.lit(off),
                    ),
                ),
            )
            .withColumn(
                "after",
                F.when(
                    F.col("after").isNotNull(),
                    F.col("after").withField(
                        "o_orderkey",
                        F.col("after.o_orderkey") + F.lit(off),
                    ),
                ),
            )
        )
        out = b if out is None else out.unionByName(b)
    return out


def build_sink(spark, ev, n_batches=8):
    """Populate in n windowed runs so partitions fragment the way a
    real incremental deployment's do (compact_sink_files needs >4
    files per partition to select anything)."""
    sink = tempfile.mkdtemp(prefix="w6_") + "/sink"
    bounds = [
        float(x)
        for x in ev.select(
            F.expr(
                "percentile(lsn, array("
                + ",".join(
                    str((i + 1) / n_batches) for i in range(n_batches - 1)
                )
                + "))"
            )
        ).head()[0]
    ]
    for b in bounds:
        populate_changelog(spark, ev, sink, SIM_PK, to_lsn=int(b))
    populate_changelog(spark, ev, sink, SIM_PK)
    return sink


def clock(fn):
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


def measure(spark, ev, label, check_equality=False):
    sink = build_sink(spark, ev)
    log = spark.read.parquet(sink)
    log.count()  # warm page cache / JVM
    lo, hi = log.agg(
        F.min("commit_time"), F.max("commit_time")
    ).head()
    cutoff_ts = lo + (hi - lo) / 2

    t_compact, _ = clock(
        lambda: compact_changelog(log, SIM_PK).count()
    )
    t_retain, _ = clock(
        lambda: retain_changelog(log, SIM_PK, cutoff_ts).count()
    )
    t_files, files_res = clock(
        lambda: compact_sink_files(spark, sink, SIM_PK, max_files=4)
    )
    t_expire, exp_res = clock(
        lambda: expire_changelog_months(
            spark, sink, cutoff_ts.date().replace(day=1).isoformat()
        )
    )
    print(
        f"{label}: compact={t_compact:.2f}s retain={t_retain:.2f}s "
        f"compact_files={t_files:.2f}s "
        f"(parts={files_res['partitions_compacted']}, "
        f"{files_res['files_before']}->{files_res['files_after']}) "
        f"expire={t_expire:.2f}s (dropped={exp_res})"
    )
    if check_equality:
        # the done-condition proof at the BIG scale: reconstruction over
        # the compacted log equals reconstruction over the full log.
        # (Run on a FRESH sink — the one above had months expired.)
        sink2 = build_sink(spark, ev)
        log2 = spark.read.parquet(sink2)
        full = reconstruct_state(log2, SIM_PK, VALUE_COLS)
        comp = reconstruct_state(
            compact_changelog(log2, SIM_PK), SIM_PK, VALUE_COLS
        )
        extra = comp.exceptAll(full).count()
        missing = full.exceptAll(comp).count()
        assert extra == 0 and missing == 0, (extra, missing)
        print(
            f"{label}: post-compaction reconstruct equality PROVEN "
            f"({full.count()} state rows, exceptAll both ways = 0)"
        )
    return {
        "compact": t_compact,
        "retain": t_retain,
        "compact_files": t_files,
        "expire": t_expire,
    }


def main():
    spark = get_spark("wave6")
    ev = simulate_cdc_events(spark, SF_DIR).persist()
    ev.count()
    base = measure(spark, ev, "1x")
    big = replicate(ev, N_REP)
    scaled = measure(spark, big, f"{N_REP}x", check_equality=True)
    print("\nratios at {}x data:".format(N_REP))
    for k in base:
        print(f"  {k}: {base[k]:.2f}s -> {scaled[k]:.2f}s "
              f"= {scaled[k] / max(base[k], 1e-9):.2f}x")


if __name__ == "__main__":
    main()
