"""Multi-dimensional data layout — Z-order (Morton) clustering for
scan pruning.

A 100 TB fact table is usually filtered on MORE than one column
(entity AND time, key AND date). Sorting the files by one column makes
the other's min/max file statistics useless; interleaving the bits of
both (the Z-order curve) keeps each file's bounding box tight in BOTH
dimensions, so format-level min/max stats (parquet row groups, Delta/
Iceberg file stats) prune either predicate. This is the same layout
step `OPTIMIZE ... ZORDER BY` performs in lakehouse engines, expressed
as ordinary columns + ``repartitionByRange`` so it works on plain
parquet.

Everything here is pure integer expressions (JVM whole-stage codegen,
engine-portable bit arithmetic — no UDFs), so the z-value computation
adds scan-stage cost only; the single range shuffle IS the clustering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_interleave(x: Column, y: Column, bits: int = 10) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints into a
    2·bits-bit Z-value (x in even positions, y in odd). Built as a sum
    of masked shifts — pure integer arithmetic, identical in any engine
    with ``&``, ``<<``, ``>>`` (the DuckDB oracle replays it term by
    term). Inputs must already be bucketed into [0, 2^bits); the caller
    owns the bucketing (modulo, epoch-minute, …) because that mapping
    is the schema-level decision."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31]: {bits}")
    xs = x.cast("long")
    ys = y.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(
            F.shiftright(xs, i).bitwiseAND(F.lit(1)), 2 * i
        )
        z = z + F.shiftleft(
            F.shiftright(ys, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return z


def zorder_bucket_stats(
    df: DataFrame,
    x: Column,
    y: Column,
    bits: int = 10,
    n_buckets: int = 16,
) -> DataFrame:
    """The pruning-tightness report for a prospective Z-order layout:
    bucket rows by the TOP bits of their z-value (bucket = file/task
    boundary under a range repartition, since z-value range partitions
    split on exactly those bits) and emit each bucket's bounding box in
    the ORIGINAL dimensions — (zbucket, n_rows, min_x, max_x, min_y,
    max_y). Tight boxes in both columns = both predicates prune.

    One hash aggregation over scan-stage expressions; the report is
    n_buckets rows. Run it before committing to a rewrite of a 100 TB
    table — the report costs one scan, the rewrite costs a full
    shuffle."""
    if n_buckets < 1 or n_buckets & (n_buckets - 1):
        raise ValueError(f"n_buckets must be a power of two: {n_buckets}")
    shift = 2 * bits - n_buckets.bit_length() + 1
    z = morton_interleave(x, y, bits)
    return (
        df.select(
            F.shiftright(z, shift).alias("zbucket"),
            x.cast("long").alias("_x"),
            y.cast("long").alias("_y"),
        )
        .groupBy("zbucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("_x").alias("min_x"),
            F.max("_x").alias("max_x"),
            F.min("_y").alias("min_y"),
            F.max("_y").alias("max_y"),
        )
    )


def write_zordered(
    df: DataFrame,
    path: str,
    x: Column,
    y: Column,
    bits: int = 10,
    n_files: int = 16,
) -> None:
    """Materialize the layout: range-repartition on the z-value (one
    shuffle; AQE balances the ranges from a sampled sketch) and drop
    the helper column at write. Files come out bounding-box-tight in
    both dimensions, which is what makes later min/max pruning work."""
    zcol = morton_interleave(x, y, bits).alias("__z")
    (
        df.select("*", zcol)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
