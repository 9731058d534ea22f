"""Training-corpus pipeline walkthrough — the curation surface end to end:

    documents → LM-surprisal quality gate (perplexity filter) →
    chunk (sliding window) → chunk-level exact dedup →
    doc-level MinHash near-dup → connected components → keep/drop
    (cluster representatives) → language-consistency audit →
    curriculum buckets (exact rank, no global sort) → BPE encode
    (token accounting) → JSONL sharded export + manifest,
    with the pre-flight diagnostics (key skew, join cardinality,
    Z-order tightness) shown on the events fact.

Run:  python examples/corpus_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from changedatacapture_reporting_spark import get_spark
from changedatacapture_reporting_spark.operators.bpe import bpe_encode, bpe_train
from changedatacapture_reporting_spark.operators.corpus import (
    chunk_documents,
    chunk_exact_dedup,
)
from changedatacapture_reporting_spark.operators.dedup import (
    cluster_representatives,
    minhash_lsh_pairs,
    neardup_clusters,
)
from changedatacapture_reporting_spark.operators.export import export_shards
from changedatacapture_reporting_spark.operators.layout import zorder_bucket_stats
from changedatacapture_reporting_spark.operators.profile import (
    join_cardinality,
    key_skew,
)
from changedatacapture_reporting_spark.operators.sampling import rank_buckets


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("corpus_pipeline_demo")
    raw = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 0. LM-surprisal quality gate (CCNet-style perplexity filter):
    #    self-score the corpus, drop docs dominated by rare bigrams.
    #    In production the model is lm_counts persisted once per epoch
    #    (and refreshed batch-side with lm_merge_counts); streaming
    #    ingestion applies the same gate via streaming.quality_gate.
    from changedatacapture_reporting_spark.operators.lm import (
        lm_surprisal_scores,
    )

    scores = lm_surprisal_scores(raw)
    docs = raw.join(
        scores.filter(~F.col("flagged")).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    print(f"lm quality gate: {raw.count()} docs -> {docs.count()} kept")

    # 1. doc-level near-dup keep/drop: LSH pairs → components → keepers
    pairs = minhash_lsh_pairs(docs, threshold=0.8)
    verdict = cluster_representatives(docs, neardup_clusters(pairs))
    kept = docs.join(
        verdict.filter("is_kept").select("doc_id"), "doc_id", "left_semi"
    )
    print(f"near-dup keep/drop: {docs.count()} docs -> {kept.count()} kept")

    # 2. chunk + chunk-level exact dedup (boilerplate spans)
    chunks = chunk_documents(kept, chunk_tokens=16, overlap=4)
    cdd = chunk_exact_dedup(chunks)
    n_drop = cdd.filter(~F.col("is_kept")).count()
    print(f"chunk dedup: {chunks.count()} chunks, {n_drop} duplicate spans dropped")

    # 3. curriculum buckets over doc length (exact, no global sort)
    buckets = rank_buckets(kept, "n_chars", "doc_id", k=4)
    print("curriculum buckets:",
          sorted((r.bucket, r.cnt) for r in
                 buckets.groupBy("bucket").agg(F.count("*").alias("cnt")).collect()))

    # 4. tokenizer: train once, encode the kept corpus
    merges, _ = bpe_train(kept, n_merges=10)
    enc = bpe_encode(kept, [(a, b) for a, b, _ in merges])
    tot = enc.agg(F.sum("n_words").alias("w"), F.sum("n_bpe_units").alias("u")).head()
    print(f"bpe: {len(merges)} merges, {tot.w} words -> {tot.u} units")

    # 5. JSONL sharded export with manifest-last commit
    out = tempfile.mkdtemp(prefix="corpus_export_") + "/shards"
    manifest = export_shards(spark, kept, out, n_shards=4, data_format="json")
    print("export manifest:")
    manifest.orderBy("shard").show()

    # 6. pre-flight diagnostics on the events fact
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    key_skew(events, "user_id", top_n=5).show()
    join_cardinality(
        spark.read.parquet(f"{sf_dir}/orders.parquet"), "o_custkey",
        spark.read.parquet(f"{sf_dir}/customer.parquet"), "c_custkey",
    ).show()
    zorder_bucket_stats(
        events,
        x=F.col("user_id") % 1024,
        y=F.floor(F.col("ts").cast("long") / 60) % 1024,
        bits=10,
        n_buckets=16,
    ).orderBy("zbucket").show()


if __name__ == "__main__":
    main()
