"""Phase profile for the cdc_forget_keys_delta composite fixture
(VERDICT r14 next-round item 1): time each leg — populate, delete,
optimize, vacuum, read — separately at $SPARK_GRAFT_SF_DIR, with the
same session config as bench.py. Prints one line per phase per rep.

    python tools/profile_forget_delta.py [reps]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from changedatacapture_reporting_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("profile_forget_delta")

    from changedatacapture_reporting_spark.operators.populate import (
        populate_changelog,
    )
    from changedatacapture_reporting_spark.sources.cdc_simulator import (
        SIM_PK,
        simulate_cdc_events,
    )
    from changedatacapture_reporting_spark.sources.delta_table import (
        delete_delta,
        optimize_delta,
        read_delta,
        vacuum_delta,
    )

    ev = simulate_cdc_events(spark, sf_dir)
    ev.limit(1).collect()  # warm

    for rep in range(reps):
        sink = tempfile.mkdtemp(prefix="prof_forget_delta_") + "/sink"
        t = {}

        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription("forget_delta: populate")
        populate_changelog(
            spark, ev, sink, SIM_PK, maintain_rollup=False,
            sink_format="delta",
        )
        t["populate"] = time.perf_counter() - t0

        k = F.coalesce(F.col("after.o_orderkey"), F.col("before.o_orderkey"))
        keys = (
            ev.select(k.alias("o_orderkey")).filter(k % 50 == 3).distinct()
        )

        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription("forget_delta: delete")
        res = delete_delta(spark, sink, keys, deletion_vectors=True)
        t["delete"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription("forget_delta: optimize")
        opt = optimize_delta(spark, sink, target_file_bytes=0)
        t["optimize"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription("forget_delta: vacuum")
        vacuum_delta(
            spark, sink, retain_versions=1, orphan_min_age_minutes=0
        )
        t["vacuum"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription("forget_delta: read")
        read_delta(spark, sink).write.format("noop").mode(
            "overwrite"
        ).save()
        t["read"] = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)

        total = sum(t.values())
        print(
            f"rep{rep}: "
            + " ".join(f"{k}={v:.2f}s" for k, v in t.items())
            + f" total={total:.2f}s"
            + f" (deleted={res['rows_deleted']},"
            f" opt_removed={opt['files_removed']},"
            f" opt_added={opt['files_added']})",
            flush=True,
        )


if __name__ == "__main__":
    main()
