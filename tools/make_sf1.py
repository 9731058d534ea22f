"""Generate the 10× scale-rehearsal fixture (default /tmp/sf1) from sf0.1.

r9 built this ad hoc and the recipe evaporated with the container; this
commits it. Replication is 10 key-offset copies per table with two
structure-preserving tweaks so scale tests measure the OPERATOR, not an
artifact of naive duplication:

- ``documents``: every token gets a per-replica suffix
  (``word`` → ``word_r3``), so shingle/minhash/bigram spaces are disjoint
  across replicas — the near-dup pair graph grows LINEARLY (10 identical
  copies would grow it quadratically inside each 10-clone clique);
- ``embeddings``: replica r gets its dimensions rotated by r positions
  (a permutation — orthogonal, so every in-replica pairwise cosine is
  EXACTLY preserved) — replicas are mutually decorrelated with no
  cross-replica cosine near-dups, so dedup/ANN candidate sets scale
  linearly, and no replica collapses toward an axis (an additive tilt
  does, which concentrates hyperplane-LSH buckets and fabricates a
  quadratic in-bucket blowup the real data doesn't have).

Small dimension tables (region/nation/…) and the rest of the TPC-H side
are hard-copied unchanged — the wave-2 rehearsal targets read documents
and embeddings; copying keeps ``load_table`` working for anything else.

Usage: python tools/make_sf1.py [--src /root/testdata/sf0.1] [--out /tmp/sf1]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICAS = 10
DOC_OFFSET = 10_000_000
VEC_OFFSET = 10_000_000

COPY_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "lineitem",
    "events",
]

# orders feeds the CDC simulator (lsn = o_orderkey, one event per key),
# so the serving/refresh rehearsal (wave 4) needs it REPLICATED, not
# copied: 10 key-offset bands give 10× state AND 10× delta with the
# op mix preserved (the offset is ≡ 0 mod 10, so k % 10 — the
# insert/delete/update selector — is unchanged per replica).
ORDERS_OFFSET = 10_000_000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sf1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from changedatacapture_reporting_spark.session import get_spark

    os.makedirs(args.out, exist_ok=True)
    for t in COPY_TABLES:
        src = os.path.join(args.src, f"{t}.parquet")
        dst = os.path.join(args.out, f"{t}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            (shutil.copytree if os.path.isdir(src) else shutil.copy2)(
                src, dst
            )

    spark = get_spark("make_sf1")
    reps = spark.range(REPLICAS).select(F.col("id").alias("_r"))

    docs = spark.read.parquet(os.path.join(args.src, "documents.parquet"))
    # token-suffix per replica: shingles disjoint across replicas
    suffixed = docs.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") + F.col("_r") * DOC_OFFSET).alias("doc_id"),
        F.when(F.col("_r") == 0, F.col("text"))
        .otherwise(
            F.regexp_replace(
                F.col("text"),
                F.lit(r"(\S+)"),
                F.concat(F.lit("$1_r"), F.col("_r").cast("string")),
            )
        )
        .alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    suffixed.write.mode("overwrite").parquet(
        os.path.join(args.out, "documents.parquet")
    )

    orders = spark.read.parquet(os.path.join(args.src, "orders.parquet"))
    replicated = orders.crossJoin(F.broadcast(reps)).select(
        (F.col("o_orderkey") + F.col("_r") * ORDERS_OFFSET).alias(
            "o_orderkey"
        ),
        *[c for c in orders.columns if c != "o_orderkey"],
    )
    replicated.write.mode("overwrite").parquet(
        os.path.join(args.out, "orders.parquet")
    )

    emb = spark.read.parquet(os.path.join(args.src, "embeddings.parquet"))
    dim = len(emb.select("embedding").head()[0])
    tilted = emb.crossJoin(F.broadcast(reps)).select(
        (F.col("vec_id") + F.col("_r") * VEC_OFFSET).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.element_at(
                F.col("embedding"),
                ((i + F.col("_r")) % F.lit(dim)).cast("int") + 1,
            ),
        ).alias("embedding"),
        "label",
    )
    tilted.write.mode("overwrite").parquet(
        os.path.join(args.out, "embeddings.parquet")
    )
    print(
        f"wrote {args.out}: documents x{REPLICAS}, embeddings "
        f"x{REPLICAS}, orders x{REPLICAS}"
    )


if __name__ == "__main__":
    main()
