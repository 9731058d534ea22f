"""Wave-5 scale rehearsal: deletion-vector mutations at 10x data.

The claim under test: vector DELETE/MERGE cost is proportional to the
MATCHED rows, not the table size — at a constant matched-key count the
wall time should stay flat when the table grows 10x (the rewrite path,
by contrast, pays the touched files' full bytes). Run from the repo
root:

    python tools/rehearsal_wave5.py

Measured r12 (local[32], lineitem sf0.1 -> 10x key-offset replicas,
200 matched keys both scales): delete 3.32 -> 3.40 s (1.02x), merge
4.61 -> 4.63 s (1.00x); read-with-live-vectors 0.95 -> 2.05 s for 10x
rows (sublinear scan; the vector overhead itself is a fixed ~0.6 s
two-broadcast job, row-count independent).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from changedatacapture_reporting_spark.sources.delta_table import (  # noqa: E402
    delete_delta,
    merge_delta,
    read_delta,
    write_delta,
)

COLS = [
    "l_orderkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_returnflag", "l_shipdate",
]


def replicate(df, n):
    out = None
    for i in range(n):
        b = df.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(i * 100_000_000)
        )
        out = b if out is None else out.unionByName(b)
    return out


def measure(spark, li, n_rep, files):
    src = replicate(li, n_rep)
    d = tempfile.mkdtemp() + "/t"
    write_delta(spark, src.repartition(files), d)
    read_delta(spark, d).count()  # warm
    keys = li.select("l_orderkey", "l_linenumber").distinct().limit(200)
    t0 = time.time()
    delete_delta(spark, d, keys)
    t_del = time.time() - t0
    # the fixture carries duplicate (orderkey, linenumber) pairs —
    # dedupe the merge source or the ambiguity check rejects it
    upd = (
        li.filter(F.col("l_orderkey") % 997 == 1)
        .dropDuplicates(["l_orderkey", "l_linenumber"])
        .withColumn("l_returnflag", F.lit("U"))
        .withColumn("_del", F.lit(False))
    )
    t0 = time.time()
    merge_delta(
        spark, upd, d, ["l_orderkey", "l_linenumber"],
        delete_col="_del", deletion_vectors=True,
    )
    t_mrg = time.time() - t0
    t0 = time.time()
    n = read_delta(spark, d).count()
    t_read = time.time() - t0
    return t_del, t_mrg, t_read, n


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet").select(
        *COLS
    )
    d1, m1, r1, n1 = measure(spark, li, 1, 8)
    print(
        f"W5 1x : rows {n1} delete {d1:.2f}s merge {m1:.2f}s "
        f"read {r1:.2f}s", flush=True,
    )
    d10, m10, r10, n10 = measure(spark, li, 10, 80)
    print(
        f"W5 10x: rows {n10} delete {d10:.2f}s merge {m10:.2f}s "
        f"read {r10:.2f}s", flush=True,
    )
    print(
        f"W5 ratios at 10x data, same matched-key count: "
        f"delete {d10 / d1:.2f}x merge {m10 / m1:.2f}x "
        f"read {r10 / r1:.2f}x", flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
