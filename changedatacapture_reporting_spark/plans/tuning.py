"""Spill-aware sizing heuristics (the "would this survive 100 TB" knobs).

Two numbers dominate whether a Spark job spills or straggles:

- ``spark.sql.shuffle.partitions`` — each reduce partition should hold
  roughly shuffle_bytes / partitions ≈ 100–200 MB: small enough to fit in
  an executor task's memory fraction, big enough not to drown the
  scheduler. AQE coalesces *down* at runtime, but cannot split a plan that
  started with far too few partitions, so the static value must err high.
- ``spark.sql.files.maxPartitionBytes`` — input split size; bigger splits
  amortize task overhead on columnar scans as long as a split fits in
  memory alongside the operators above it.

These helpers turn "input bytes at the target scale factor" into concrete
settings; session.py applies sane fixtures defaults, a production caller
recomputes per dataset.
"""

from __future__ import annotations

from dataclasses import dataclass

MB = 1024 * 1024


@dataclass(frozen=True)
class ShuffleSizing:
    shuffle_partitions: int
    max_partition_bytes: int
    reason: str


def recommend_sizing(
    input_bytes: int,
    cores: int = 32,
    target_partition_bytes: int = 128 * MB,
    shuffle_amplification: float = 1.0,
) -> ShuffleSizing:
    """Size shuffle partitions for an input volume.

    ``shuffle_amplification`` estimates shuffled bytes / input bytes for
    the pipeline (≈1 for repartition-style, <1 after selective filters or
    partial aggregation, >1 for exploding operators like the changelog
    melt, which emits one row per changed column).
    """
    shuffle_bytes = int(input_bytes * shuffle_amplification)
    by_size = max(1, shuffle_bytes // target_partition_bytes)
    # at least enough for full parallelism, rounded to whole waves so the
    # last wave isn't a straggler tail
    partitions = max(cores, by_size)
    partitions = ((partitions + cores - 1) // cores) * cores
    # splits: cap so a scan task's working set stays bounded even when the
    # file count is tiny relative to the cluster
    max_split = min(256 * MB, max(16 * MB, input_bytes // cores or 16 * MB))
    return ShuffleSizing(
        shuffle_partitions=int(partitions),
        max_partition_bytes=int(max_split),
        reason=(
            f"shuffle≈{shuffle_bytes / MB:.0f}MB → "
            f"{partitions} partitions of ≈"
            f"{shuffle_bytes / max(partitions,1) / MB:.0f}MB on {cores} cores"
        ),
    )


def apply_sizing(spark, sizing: ShuffleSizing) -> None:
    spark.conf.set("spark.sql.shuffle.partitions", str(sizing.shuffle_partitions))
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes", str(sizing.max_partition_bytes)
    )
