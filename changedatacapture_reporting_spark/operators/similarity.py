"""Similarity search over an embedding column (``array<float>``).

Two tiers, per the prompt's scale contract:

- :func:`brute_force_topk` — exact baseline: queries × corpus with a
  JVM-side dot product, ranked per query. Correct at any scale where
  |queries| × |corpus| is joinable (broadcast the queries!); the oracle
  path for recall measurement.
- :func:`lsh_topk` — random-hyperplane LSH: L tables × p planes; vectors
  colliding with the query in ≥1 table are candidates, exact-ranked.
  Collision probability per table is (1−θ/π)^p — size p to the corpus:
  p=4 suits the 500-vector fixtures; a billion-vector corpus wants p≈16–24
  so per-bucket population stays bounded while recall comes from L.
  The self-join key is (table, bucket) → work ∝ collisions, not |corpus|².
  Hyperplanes are *deterministic* (seeded xxhash64 folded to [-0.5, 0.5])
  so results are reproducible across runs and engines — no RNG state to
  ship to executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from changedatacapture_reporting_spark.functions.vectors import (
    dot_decimal,
    dot_double,
)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exact_decimal: bool = False,
) -> DataFrame:
    """Exact top-k by dot product (fixtures are L2-normalized → cosine).

    queries is broadcast — the scan of the corpus happens once, no shuffle
    until the per-query top-k aggregation. exact_decimal ranks on the
    decimal-grid dot product (bit-stable across engines, used by the
    DuckDB oracle)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    dot = dot_decimal if exact_decimal else dot_double
    sim = dot(F.col("qv"), F.col("cv")).alias("sim")
    pairs = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim)
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _plane_component(table: int, plane: int, dim: Column) -> Column:
    """Deterministic pseudo-random hyperplane component in [-0.5, 0.5):
    xxhash64(table, plane, dim) folded onto a 2001-step grid."""
    h = F.xxhash64(F.lit(table), F.lit(plane), dim)
    return (F.pmod(h, F.lit(2001)) - 1000).cast("double") / 2000.0


def lsh_bucket_ids(
    vec: Column, tables: int = 12, planes: int = 4, dim: int = 64
) -> Column:
    """array<struct<table:int, bucket:long>> — sign-of-projection bits per
    table. Pure expression: usable on both streaming and batch frames."""
    def bucket(t: int) -> Column:
        bits = [
            F.when(
                F.aggregate(
                    F.zip_with(
                        vec,
                        F.sequence(F.lit(0), F.lit(dim - 1)),
                        lambda x, i: x.cast("double") * _plane_component(t, p, i),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                > 0,
                F.lit(1 << p),
            ).otherwise(F.lit(0))
            for p in range(planes)
        ]
        total = bits[0]
        for b in bits[1:]:
            total = total + b
        return total.cast("long")

    return F.array(
        *[
            F.struct(F.lit(t).alias("table"), bucket(t).alias("bucket"))
            for t in range(tables)
        ]
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    tables: int = 12,
    planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """ANN top-k: candidates = corpus vectors sharing ≥1 (table, bucket)
    with the query; exact dot re-rank of candidates only.

    At 100 TB: corpus bucket ids are computed once (persist/write them),
    the join key (table, bucket) distributes uniformly by construction
    (hash-derived planes), and per-bucket population is ~|corpus| / 2^planes
    per table — tune `planes` so buckets fit executor memory."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.explode(lsh_bucket_ids(F.col(vec_col), tables, planes, dim)).alias("b"),
    ).select("neighbor_id", "cv", "b.table", "b.bucket")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(lsh_bucket_ids(F.col(vec_col), tables, planes, dim)).alias("b"),
    ).select("query_id", "qv", "b.table", "b.bucket")

    candidates = (
        c.join(F.broadcast(q), on=["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qv", "neighbor_id", "cv")
        .distinct()
    )
    sim = dot_double(F.col("qv"), F.col("cv")).alias("sim")
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        candidates.select("query_id", "neighbor_id", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
