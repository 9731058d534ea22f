"""Row-group pruning retention for the ordered one-pass OPTIMIZE
(VERDICT r14 "what's wrong" #4): compact a 2-group table whose files
are id-sorted and disjoint into ONE multi-row-group file per group
(parquet.block.size forced small so the output carries many row
groups), then read the output footers and report how many row groups a
narrow id probe overlaps. With input ordering preserved the probe hits
~1 row group; with shuffle arrival order nearly every row group spans
the whole id range and none can be skipped.

    python tools/rehearsal_rowgroup_order.py [rows_per_file]
"""

from __future__ import annotations

import os
import sys
import tempfile
from urllib.parse import unquote

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from changedatacapture_reporting_spark.session import get_spark  # noqa: E402


def main() -> None:
    rows_per = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    spark = get_spark("rehearsal_rowgroup_order")
    from changedatacapture_reporting_spark.sources.delta_table import (
        _resolve_log,
        optimize_delta,
        write_delta,
    )

    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    old_block = hconf.get("parquet.block.size")
    hconf.setInt("parquet.block.size", 1 << 20)  # many row groups
    try:
        path = tempfile.mkdtemp(prefix="rowgroup_order_") + "/t"
        for k in range(8):  # 8 id-sorted disjoint files per group
            df = spark.range(
                k * rows_per, (k + 1) * rows_per
            ).select(
                F.col("id"),
                (F.col("id") % 2).cast("int").alias("g"),
                (F.col("id") * 31 % 997).alias("v"),
            )
            write_delta(
                spark,
                df.repartition(1, "g").sortWithinPartitions("id"),
                path,
                partition_by=["g"],
            )
        res = optimize_delta(spark, path, target_file_bytes=1 << 40)
        assert res["files_added"] == 2, res
        lo, hi = 3 * rows_per, 3 * rows_per + 1000  # narrow probe
        for add in _resolve_log(spark, path, None)["files"].values():
            f = pq.ParquetFile(f"{path}/{unquote(add['path'])}")
            n = f.metadata.num_row_groups
            hit = 0
            for i in range(n):
                st = f.metadata.row_group(i).column(0).statistics
                if st.min <= hi and st.max >= lo:
                    hit += 1
            print(
                f"{add['path'].rsplit('/', 1)[0]}: {n} row groups, "
                f"probe [{lo},{hi}] overlaps {hit} "
                f"({100.0 * hit / n:.0f}%)",
                flush=True,
            )
    finally:
        if old_block is None:
            hconf.unset("parquet.block.size")
        else:
            hconf.set("parquet.block.size", old_block)


if __name__ == "__main__":
    main()
