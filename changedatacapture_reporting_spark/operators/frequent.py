"""Exact heavy hitters over unbounded-cardinality columns — two passes,
never a full-cardinality shuffle.

``GROUP BY item HAVING count >= θ·N`` is the obvious plan, and Spark's
partial aggregation makes it fine when ``distinct(item)`` fits the
aggregation hash maps. The regime this operator exists for is the other
one — user ids / URLs / shingles at 100 TB, where the groupBy shuffles
one partial row per distinct item per partition and the reduce side
materializes billions of groups to keep the handful above threshold.

Plan here (the classic two-pass sketch-then-verify):

1. **Candidate generation** — one scan through ``mapInPandas``: each
   Arrow batch's exact value counts are pruned to ``k`` counters by
   subtracting the (k+1)-th largest count (the Misra-Gries / mergeable-
   summaries merge step, Agarwal et al. 2012): memory O(k) per batch,
   output ≤ k+1 rows per batch. A tiny aggregation sums the summaries;
   the MG bound says any item's undercount ≤ N/(k+1), so with
   ``k ≥ candidate_factor/θ`` (factor ≥ 2) every true heavy hitter
   survives with merged weight ≥ θN − N/k ≥ θN/2, and filtering at that
   bound caps the candidate set at ~2/θ items regardless of data size.
2. **Exact verification** — second scan: semi join the (broadcast)
   candidate set, count exactly, keep ``count ≥ ceil(θN)``.

The output is therefore EXACT — identical to the naive HAVING query —
while the shuffle volume is O(k) rows per partition in pass 1 and
O(candidates) per partition in pass 2. NULL items are ignored (N counts
non-null rows), matching the GROUP BY semantics of a HAVING filter that
no one applies to NULL keys.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _prune_counts(counts: "pd.Series", k: int) -> "pd.Series":
    """Misra-Gries batch prune: keep ≤ k counters by subtracting the
    (k+1)-th largest count from every counter and dropping non-positive
    ones. Exact when the batch has ≤ k distinct items."""
    if len(counts) <= k:
        return counts
    d = counts.iloc[k]  # counts is sorted desc; (k+1)-th largest
    pruned = counts.iloc[:k] - d
    return pruned[pruned > 0]


def heavy_hitters(
    df: DataFrame,
    col: str,
    threshold_fraction: float,
    candidate_factor: float = 2.0,
    exact: bool = True,
) -> DataFrame:
    """Items of ``col`` occurring in ≥ ``threshold_fraction`` of non-null
    rows, with their EXACT counts. Output: ``item`` (the column's own
    type), ``n`` (long), n ≥ ceil(θ·N) — byte-identical to the naive
    ``GROUP BY … HAVING`` result.

    ``exact=False`` skips the verification pass — ONE scan total,
    returning every candidate with its merged MG weight as ``n``. The
    guarantees then are the sketch's own: every true heavy hitter is
    present; ``n`` UNDERCOUNTS by at most ``N/k`` (so true count ∈
    [n, n + N/k]); items between θN − N/k and θN may appear as false
    positives. The single-scan form is for when re-reading the data is
    the cost that matters (a tail of a pipeline that won't rescan 100 TB
    for exact counts) — downstream exact verification can always run
    later on just the candidate list.
    """
    if not 0.0 < threshold_fraction <= 1.0:
        raise ValueError(f"threshold_fraction not in (0, 1]: {threshold_fraction}")
    if candidate_factor < 2.0:
        raise ValueError("candidate_factor < 2 voids the survival bound")
    k = int(math.ceil(candidate_factor / threshold_fraction))

    item_type = df.schema[col].dataType
    summary_schema = T.StructType(
        [
            T.StructField("item", item_type, True),
            T.StructField("weight", T.LongType(), False),
        ]
    )

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            s = pdf[col]
            n = int(s.count())  # non-null
            if not n:
                continue
            counts = _prune_counts(s.value_counts(), k)
            out = pd.DataFrame(
                {"item": counts.index, "weight": counts.to_numpy("int64")}
            )
            # one NULL-item row carries the batch's non-null row count,
            # so N comes out of the same scan as the summaries
            out = pd.concat(
                [out, pd.DataFrame({"item": [None], "weight": [n]})],
                ignore_index=True,
            )
            yield out

    summaries = (
        df.select(col)
        .mapInPandas(summarize, summary_schema)
        .groupBy("item")
        .agg(F.sum("weight").alias("weight"))
        .persist()
    )
    try:
        n_total = (
            summaries.filter(F.col("item").isNull())
            .agg(F.sum("weight"))
            .collect()[0][0]
        ) or 0
        empty = df.sparkSession.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("item", item_type),
                    T.StructField("n", T.LongType()),
                ]
            ),
        )
        if not n_total:
            return empty
        threshold = int(math.ceil(threshold_fraction * n_total))
        # MG undercount ≤ N/k → any true heavy hitter's merged weight is
        # at least θN − N/k; filtering there keeps the guarantee AND
        # bounds the surviving set at ~N/(θN−N/k) ≤ 2/θ items — so the
        # collect below is driver-small by construction, like the IVF
        # centroid pull (operators/similarity.py)
        floor_w = threshold_fraction * n_total - n_total / k
        survivors = summaries.filter(
            F.col("item").isNotNull() & (F.col("weight") >= floor_w)
        )
        if not exact:
            # one-scan form: candidates with their merged MG weights
            # (collected then re-created so the unpersist below can't
            # invalidate the returned frame's lineage)
            rows = [(r.item, int(r.weight)) for r in survivors.collect()]
            return df.sparkSession.createDataFrame(
                rows,
                T.StructType(
                    [
                        T.StructField("item", item_type),
                        T.StructField("n", T.LongType()),
                    ]
                ),
            )
        candidates = [r.item for r in survivors.collect()]
    finally:
        summaries.unpersist()
    if not candidates:
        return empty

    cand_df = df.sparkSession.createDataFrame(
        [(c,) for c in candidates],
        T.StructType([T.StructField("item", item_type)]),
    )
    return (
        df.select(F.col(col).alias("item"))
        .join(F.broadcast(cand_df), "item", "left_semi")
        .groupBy("item")
        .agg(F.count("*").cast("long").alias("n"))
        .filter(F.col("n") >= threshold)
    )
