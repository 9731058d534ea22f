"""Wave-7 scale rehearsal: the FOREIGN-table read surface at 10x
(VERDICT r13 #8), plus the driver-memory proof for the r14
executor-side deletion-vector read path (VERDICT r13 #1).

Claims under test:

- **DV density — driver memory flat.** r13 expanded every spec bitmap
  to driver-side (path, row_index) pandas rows: driver RSS grew with
  TOTAL DELETED ROWS. r14 ships compact blobs into a mapInPandas; the
  driver handles only roaring bytes. Measured: a fresh subprocess reads
  a table with N deleted rows and reports its own peak RSS
  (ru_maxrss); at 10x DV density the r14 driver delta must stay ~flat
  while the row count math says r13's would grow ~10x (≈32+ B/row).
- **DV density — wall time.** read+count at 1x vs 10x deleted rows
  should scale with the DATA, not superlinearly with the vector.
- **Column-mapped wide schema.** A 'name'-mapped table with 120
  columns incl. nested structs: read at 1x vs 10x rows ≈ linear; the
  mapping unmap is plan-time, not per-row Python.
- **Multi-part classic checkpoint with 200 parts** and a **v2
  checkpoint with 64 sidecars**: replay wall time at that scale stays
  metadata-scale (seconds), all parts feeding one schema-pinned scan.

Run from the repo root:

    python tools/rehearsal_wave7.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_READ_RSS_SNIPPET = r"""
import json, sys, threading, time
sys.path.insert(0, {repo!r})
from changedatacapture_reporting_spark.session import get_spark
from changedatacapture_reporting_spark.sources.delta_table import read_delta

def vmrss_kb():
    with open("/proc/self/status") as f:
        for ln in f:
            if ln.startswith("VmRSS:"):
                return int(ln.split()[1])
    return 0

spark = get_spark("w7", shuffle_partitions=8)
# warm the session so JVM/py4j startup is excluded from the rss story
spark.range(10).count()
# live VmRSS sampler: ru_maxrss is a process-lifetime high-watermark
# (session startup dominates it); the claim under test is the DRIVER
# python's ALLOCATION DURING THE READ, so sample current RSS at 5 ms
# and report the peak-over-baseline seen while the read runs
base_rss = vmrss_kb()
peak = [base_rss]
stop = threading.Event()

def _sample():
    while not stop.is_set():
        peak[0] = max(peak[0], vmrss_kb())
        stop.wait(0.005)

th = threading.Thread(target=_sample, daemon=True)
th.start()
t0 = time.monotonic()
n = read_delta(spark, {path!r}).count()
dt = time.monotonic() - t0
stop.set(); th.join()
print(json.dumps({{"n": n, "sec": round(dt, 3),
                   "driver_rss_delta_kb": peak[0] - base_rss}}))
"""


def _read_in_subprocess(path: str) -> dict:
    """read_delta().count() in a FRESH python process; returns row
    count, wall seconds, and the DRIVER python's ru_maxrss delta in KB
    (executor python workers are separate processes and excluded —
    exactly the split under test)."""
    code = _READ_RSS_SNIPPET.format(repo=REPO, path=path)
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=600,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def build_dv_table(spark, base: str, n_rows: int, dead_pct: int) -> int:
    """One table, ``n_rows`` over 8 files, a foreign-style spec DV
    killing ``dead_pct``% of rows. Returns n deleted."""
    from pyspark.sql import functions as F

    from changedatacapture_reporting_spark import fs
    from changedatacapture_reporting_spark.sources import dvcodec
    from changedatacapture_reporting_spark.sources.delta_table import (
        _commit_name,
        _dv_protocol_actions,
        _log_path,
        _resolve_log,
        _scan_adds,
        write_delta,
    )
    import uuid as _uuid

    df = spark.range(n_rows).select(
        F.col("id"), (F.col("id") * 7 % 1000).alias("v")
    )
    write_delta(spark, df.repartition(8, "id"), base)
    st = _resolve_log(spark, base, None)
    adds = sorted(st["files"].values(), key=lambda a: a["path"])
    pos = (
        _scan_adds(spark, base, st["meta"], adds, with_rowpos=True)
        .filter(F.col("id") % 100 < dead_pct)
        .select("_pos_key", "_pos_idx")
        .collect()
    )
    by_file: dict[str, list[int]] = {}
    for r in pos:
        by_file.setdefault(r["_pos_key"], []).append(int(r["_pos_idx"]))
    keys = sorted(by_file)
    blobs = [dvcodec.serialize_blob(by_file[k]) for k in keys]
    data, spans = dvcodec.pack_file(blobs)
    u = _uuid.uuid4()
    fs.write_bytes(
        spark, fs.join(base, f"w7/deletion_vector_{u}.bin"), data
    )
    actions = _dv_protocol_actions(st)
    by_key = {a["path"].split("/")[-1]: a for a in adds}
    for k, (off, size) in zip(keys, spans):
        add = dict(by_key[k.split("/")[-1]])
        actions.append({"remove": {"path": add["path"],
                                   "deletionTimestamp": 0,
                                   "dataChange": True}})
        add["deletionVector"] = {
            "storageType": "u",
            "pathOrInlineDv": "w7" + dvcodec.encode_uuid(u),
            "offset": off, "sizeInBytes": size,
            "cardinality": len(by_file[k]),
        }
        add["dataChange"] = True
        actions.append({"add": add})
    fs.write_text(
        spark,
        fs.join(_log_path(base), _commit_name(st["version"] + 1)),
        "\n".join(json.dumps(a) for a in actions) + "\n",
    )
    return sum(len(v) for v in by_file.values())


def build_wide_mapped(spark, base: str, n_rows: int) -> None:
    """'name'-mapped table: 100 flat cols + 10 structs x 2 nested."""
    import os as _os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    cols = [F.col("id")] + [
        (F.col("id") % (i + 2)).alias(f"c{i}") for i in range(100)
    ] + [
        F.struct(
            (F.col("id") + i).alias("a"),
            (F.col("id") - i).alias("b"),
        ).alias(f"s{i}")
        for i in range(10)
    ]
    phys = spark.range(n_rows).select(*cols)
    ren = phys.select(
        *[
            F.col(c).alias(f"p-{j}")
            for j, c in enumerate(phys.columns)
        ]
    )
    stage = base + "/_stage"
    ren.repartition(8).write.parquet(stage)
    _os.makedirs(base + "/_delta_log", exist_ok=True)
    adds = []
    for i, p in enumerate(
        sorted(x for x in _os.listdir(stage) if x.endswith(".parquet"))
    ):
        rel = f"f{i}.parquet"
        _os.replace(_os.path.join(stage, p), f"{base}/{rel}")
        adds.append(
            {"add": {"path": rel, "partitionValues": {},
                     "size": _os.path.getsize(f"{base}/{rel}"),
                     "modificationTime": 0, "dataChange": True}}
        )

    def fld(name, dt_, j):
        return T.StructField(
            name, dt_, True,
            {"delta.columnMapping.physicalName": f"p-{j}",
             "delta.columnMapping.id": j + 1},
        )

    logical_fields = [fld("id", T.LongType(), 0)] + [
        fld(f"c{i}", T.LongType(), i + 1) for i in range(100)
    ]
    for i in range(10):
        nested = T.StructType(
            [
                T.StructField("a", T.LongType(), True,
                              {"delta.columnMapping.physicalName": "a",
                               "delta.columnMapping.id": 200 + i * 2}),
                T.StructField("b", T.LongType(), True,
                              {"delta.columnMapping.physicalName": "b",
                               "delta.columnMapping.id": 201 + i * 2}),
            ]
        )
        logical_fields.append(fld(f"s{i}", nested, 101 + i))
    meta = {
        "metaData": {
            "id": "w7-wide", "format": {"provider": "parquet",
                                        "options": {}},
            "schemaString": T.StructType(logical_fields).json(),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "name",
                              "delta.columnMapping.maxColumnId": "300"},
            "createdTime": 0,
        }
    }
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        meta,
    ] + adds
    with open(f"{base}/_delta_log/{0:020d}.json", "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions) + "\n")


def build_many_part_checkpoint(spark, base: str, n_parts: int) -> None:
    """Split our own checkpoint into ``n_parts`` and expire the json."""
    import os as _os

    from changedatacapture_reporting_spark.sources.delta_table import (
        _CHECKPOINT_SCHEMA,
        _resolve_log,
        write_checkpoint,
    )

    write_checkpoint(spark, base)
    st = _resolve_log(spark, base, None)
    v = st["version"]
    log = f"{base}/_delta_log"
    single = f"{log}/{v:020d}.checkpoint.parquet"
    cp = spark.read.schema(_CHECKPOINT_SCHEMA).parquet(single)
    rows = cp.collect()
    chunks = [rows[i::n_parts] for i in range(n_parts)]
    for i, chunk in enumerate(chunks, start=1):
        dest = f"{log}/{v:020d}.checkpoint.{i:010d}.{n_parts:010d}.parquet"
        tmp = dest + "_tmp"
        spark.createDataFrame(chunk, _CHECKPOINT_SCHEMA).repartition(
            1
        ).write.mode("overwrite").parquet(tmp)
        part = [x for x in _os.listdir(tmp) if x.endswith(".parquet")][0]
        _os.replace(_os.path.join(tmp, part), dest)
        import shutil

        shutil.rmtree(tmp)
    _os.remove(single)
    for j in range(v + 1):
        p = f"{log}/{j:020d}.json"
        if _os.path.exists(p):
            _os.remove(p)


def main() -> None:
    from changedatacapture_reporting_spark.session import get_spark
    from changedatacapture_reporting_spark.sources.delta_table import (
        read_delta,
    )

    spark = get_spark("wave7", shuffle_partitions=16)
    tmp = tempfile.mkdtemp(prefix="wave7_")
    results: dict[str, dict] = {}

    # --- 1. DV density: 1x vs 10x deleted rows -----------------------
    for tag, n_rows, pct in (("dv_1x", 400_000, 5),
                             ("dv_10x", 4_000_000, 5)):
        base = f"{tmp}/{tag}"
        n_dead = build_dv_table(spark, base, n_rows, pct)
        probe = _read_in_subprocess(base)
        probe["n_deleted"] = n_dead
        results[tag] = probe
    r1, r10 = results["dv_1x"], results["dv_10x"]
    results["dv_ratios"] = {
        "deleted_rows_ratio": round(
            r10["n_deleted"] / r1["n_deleted"], 2
        ),
        "wall_ratio": round(r10["sec"] / max(r1["sec"], 1e-9), 2),
        "driver_rss_ratio": round(
            r10["driver_rss_delta_kb"]
            / max(r1["driver_rss_delta_kb"], 1), 2
        ),
        "r13_wouldbe_driver_mb_at_10x": round(
            r10["n_deleted"] * 32 / 1e6, 1
        ),
    }

    # --- 2. wide column-mapped reads: 1x vs 10x rows ------------------
    for tag, n_rows in (("map_1x", 100_000), ("map_10x", 1_000_000)):
        base = f"{tmp}/{tag}"
        build_wide_mapped(spark, base, n_rows)
        t0 = time.monotonic()
        df = read_delta(spark, base)
        n = df.selectExpr("sum(c7)", "sum(s3.a)").collect()[0]
        dt = time.monotonic() - t0
        results[tag] = {"rows": n_rows, "sec": round(dt, 3),
                        "sum_c7": int(n[0]), "sum_s3a": int(n[1])}
    results["map_ratio"] = round(
        results["map_10x"]["sec"] / max(results["map_1x"]["sec"], 1e-9),
        2,
    )

    # --- 3. multi-part checkpoint (200 parts) + v2 (64 sidecars) ------
    from pyspark.sql import functions as F

    from changedatacapture_reporting_spark.sources.delta_table import (
        write_delta,
    )

    base = f"{tmp}/cp200"
    write_delta(
        spark,
        spark.range(200_000).select(
            F.col("id"), (F.col("id") % 97).alias("v")
        ).repartition(64),
        base,
    )
    build_many_part_checkpoint(spark, base, 200)
    t0 = time.monotonic()
    n = read_delta(spark, base).count()
    results["cp200"] = {"parts": 200, "rows": n,
                        "replay_read_sec": round(time.monotonic() - t0, 3)}

    base = f"{tmp}/v2many"
    write_delta(
        spark,
        spark.range(200_000).select(
            F.col("id"), (F.col("id") % 89).alias("v")
        ).repartition(64),
        base,
    )
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_v2_checkpoint import _build_v2_parquet  # noqa: E402

    from changedatacapture_reporting_spark.sources.delta_table import (
        _resolve_log,
    )

    st = _resolve_log(spark, base, None)
    _build_v2_parquet(spark, base, st, n_sidecars=64)
    t0 = time.monotonic()
    n = read_delta(spark, base).count()
    results["v2_64_sidecars"] = {
        "sidecars": 64, "rows": n,
        "replay_read_sec": round(time.monotonic() - t0, 3),
    }

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
