"""sf1 rehearsal wave 4 (VERDICT r11 task 8): the serving refresh path.

The two operators whose 100 TB story is "I/O ∝ delta + touched buckets,
never state size", measured at 10× BOTH state and delta:

- ``operators.serving.refresh_state_snapshot`` — build the snapshot
  from the first half of the LSN range, then time the refresh that
  applies the second half (each rep refreshes a fresh copy of the
  snapshot: a refresh advances the watermark, so re-running it in place
  would time a no-op).
- ``streaming.apply_stream.stream_apply_bucketed`` — bootstrap from
  batch 1 (untimed), then time the availableNow drain of batch 2 (the
  steady per-micro-batch cost; stream machinery overhead is identical
  at both scales so the RATIO isolates the data-dependent part).

Plus the touched-bucket I/O proof at the big scale: a small delta (a
few hundred pks) must rewrite only the bucket partitions containing
those pks — confirmed by file listing, not by trusting the return dict.

Usage:  python tools/make_sf1.py   # once per container
        python tools/rehearsal_wave4.py
Env: REHEARSAL_BASE (default /root/testdata/sf0.1),
     REHEARSAL_BIG (default /tmp/sf1), REHEARSAL_REPS (default 3).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _log_of(spark, sf_dir):
    from changedatacapture_reporting_spark.operators.changelog import (
        build_changelog,
    )
    from changedatacapture_reporting_spark.sources.cdc_simulator import (
        SIM_PK,
        simulate_cdc_events,
    )

    ev = simulate_cdc_events(spark, sf_dir)
    log = build_changelog(
        ev,
        SIM_PK,
        with_audit_cols=False,
        carry_cols=["lsn", "seq"],
        record_insert_images=True,
    )
    return log, SIM_PK


VALUE_COLS = ["status", "priority", "total", "note"]
N_BUCKETS = 64


def refresh_timings(spark, sf_dir, reps) -> tuple[float, float]:
    """(build_s, best refresh_s) — build once, refresh a fresh COPY of
    the snapshot per rep."""
    from changedatacapture_reporting_spark.operators.serving import (
        build_state_snapshot,
        refresh_state_snapshot,
    )

    log, pk = _log_of(spark, sf_dir)
    # materialize the changelog once so reps don't re-derive it
    scratch = tempfile.mkdtemp(prefix="wave4_")
    log_path = os.path.join(scratch, "log")
    log.write.parquet(log_path)
    log = spark.read.parquet(log_path)
    mid = int(log.agg(F.expr("percentile(lsn, 0.5)")).head()[0])

    base_snap = os.path.join(scratch, "state")
    t0 = time.perf_counter()
    build_state_snapshot(
        spark,
        log.filter(F.col("lsn") <= mid),
        base_snap,
        pk,
        VALUE_COLS,
        n_buckets=N_BUCKETS,
    )
    build_s = time.perf_counter() - t0

    best = float("inf")
    for i in range(reps):
        snap = os.path.join(scratch, f"state_rep{i}")
        shutil.copytree(base_snap, snap)
        t0 = time.perf_counter()
        refresh_state_snapshot(spark, log, snap, pk, VALUE_COLS)
        best = min(best, time.perf_counter() - t0)
    shutil.rmtree(scratch, ignore_errors=True)
    return build_s, best


def bucketed_drain_timings(spark, sf_dir, reps) -> float:
    """Best steady-batch drain: bootstrap on batch 1 (untimed), time the
    drain of batch 2."""
    from pyspark.sql import types as T

    from changedatacapture_reporting_spark.schema import cdc_event_schema
    from changedatacapture_reporting_spark.sources.cdc_simulator import (
        simulate_cdc_events,
    )
    from changedatacapture_reporting_spark.streaming.apply_stream import (
        stream_apply_bucketed,
    )

    ev = simulate_cdc_events(spark, sf_dir)
    src_struct = T.StructType(
        [f for f in ev.schema["after"].dataType.fields]
    )
    schema = cdc_event_schema(src_struct)
    mid = int(ev.agg(F.expr("percentile(lsn, 0.5)")).head()[0])

    best = float("inf")
    for _ in range(reps):
        scratch = tempfile.mkdtemp(prefix="wave4s_")
        ev_path = os.path.join(scratch, "events")
        snap = os.path.join(scratch, "state")
        ckpt = os.path.join(scratch, "ckpt")
        ev.filter(F.col("lsn") <= mid).write.mode("append").parquet(ev_path)

        def drain():
            q = stream_apply_bucketed(
                spark,
                ev_path,
                schema,
                snap,
                ckpt,
                ["o_orderkey"],
                VALUE_COLS,
                n_buckets=N_BUCKETS,
            )
            q.awaitTermination(600)

        drain()  # untimed bootstrap (build_state_snapshot path)
        ev.filter(F.col("lsn") > mid).write.mode("append").parquet(ev_path)
        t0 = time.perf_counter()
        drain()  # the steady refresh batch
        best = min(best, time.perf_counter() - t0)
        shutil.rmtree(scratch, ignore_errors=True)
    return best


def touched_bucket_proof(spark, sf_dir, n_keys=200) -> dict:
    """At the big scale: a refresh whose delta touches ``n_keys`` pks
    must leave every untouched bucket's files BYTE-IDENTICAL BY NAME."""
    from changedatacapture_reporting_spark import fs
    from changedatacapture_reporting_spark.operators.serving import (
        BUCKET_COL,
        build_state_snapshot,
        refresh_state_snapshot,
    )

    log, pk = _log_of(spark, sf_dir)
    scratch = tempfile.mkdtemp(prefix="wave4p_")
    snap = os.path.join(scratch, "state")
    hi = int(log.agg(F.max("lsn")).head()[0])
    build_state_snapshot(spark, log, snap, pk, VALUE_COLS, N_BUCKETS)

    # a small tail delta: updates on n_keys existing pks past the
    # watermark (synthesized directly in changelog shape)
    keys = [r[0] for r in log.select(pk[0]).distinct().limit(n_keys).collect()]
    sample = (
        log.filter(F.col(pk[0]).isin(keys))
        .filter(F.col("column_name").isNotNull())
        .groupBy(pk[0], "column_name")
        .agg(
            F.max("commit_time").alias("commit_time"),
            F.max("old_value").alias("old_value"),
            F.max("new_value").alias("new_value"),
        )
        .withColumn("lsn", F.lit(hi + 1).cast("long"))
        .withColumn("seq", F.lit(0).cast("long"))
    )
    delta = sample.select(*[c for c in log.columns if c in sample.columns])
    for c in log.columns:
        if c not in delta.columns:
            delta = delta.withColumn(c, F.lit(None).cast(log.schema[c].dataType))
    delta = delta.select(*log.columns)

    before = set(fs.list_data_files(spark, snap))
    res = refresh_state_snapshot(
        spark, log.unionByName(delta), snap, pk, VALUE_COLS
    )
    after = set(fs.list_data_files(spark, snap))
    touched_dirs = {
        f.split("/")[0] for f in (before - after) | (after - before)
    }
    untouched_survive = all(
        f in after for f in before if f.split("/")[0] not in touched_dirs
    )
    out = {
        "keys_in_delta": len(keys),
        "buckets_rewritten": res["buckets_rewritten"],
        "bucket_dirs_with_file_changes": len(touched_dirs),
        "total_buckets": N_BUCKETS,
        "untouched_files_survive_by_name": untouched_survive,
    }
    shutil.rmtree(scratch, ignore_errors=True)
    return out


def main() -> None:
    from changedatacapture_reporting_spark.session import get_spark

    base = os.environ.get("REHEARSAL_BASE", "/root/testdata/sf0.1")
    big = os.environ.get("REHEARSAL_BIG", "/tmp/sf1")
    reps = int(os.environ.get("REHEARSAL_REPS", "3"))
    spark = get_spark("wave4")

    # warm the JVM/codegen on the small scale, untimed — the first
    # wave-4 run measured base COLD vs big WARM and read nonsense
    # ratios (<1 at 10×); the build number stays single-shot and is
    # reported as informational only
    log, pk = _log_of(spark, base)
    log.limit(100).groupBy(pk[0]).count().count()

    rows = []
    for name, fn in [
        ("serving_refresh", refresh_timings),
        ("stream_apply_bucketed_batch", bucketed_drain_timings),
    ]:
        spark.catalog.clearCache()
        a = fn(spark, base, reps)
        spark.catalog.clearCache()
        b = fn(spark, big, reps)
        if name == "serving_refresh":
            rows.append(("serving_snapshot_build", a[0], b[0]))
            rows.append(("serving_refresh", a[1], b[1]))
        else:
            rows.append((name, a, b))

    print(f"| operator | {base} (s) | {big} (s) | ratio at 10x |")
    print("|---|---|---|---|")
    for name, ta, tb in rows:
        print(f"| {name} | {ta:.3f} | {tb:.3f} | {tb / ta:.2f}x |", flush=True)

    print("\ntouched-bucket proof at", big, ":")
    print(touched_bucket_proof(spark, big))


if __name__ == "__main__":
    main()
