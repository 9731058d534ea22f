"""Streaming corpus quality gate — foreachBatch LM scoring at ingestion.

The ingestion-time shape of ``operators.lm``: documents stream in, each
micro-batch is scored against a PERSISTED epoch LM (``lm_counts``
frames, typically parquet-read from the index store) and written through
an idempotent per-batch parquet commit.

Why foreachBatch and not a stateful streaming aggregate: a document is
row-atomic — its tokens never span micro-batches — and the LM model is
static within an epoch, so per-document scores decompose EXACTLY per
batch (each doc's diagnostics depend only on its own bigrams plus the
global count tables). The gate is therefore STATELESS across batches: no
state store, no watermark, no memory growth on an unbounded stream — the
plan-audit shape a 100 TB ingestion firehose requires. Cross-epoch model
refresh is ``lm_merge_counts`` on the batch side, not stream state.

Exactly-once: the micro-batch id keys the output subdirectory, so a
replay after failure overwrites the same directory (idempotent) and the
checkpoint guarantees no batch is skipped or double-counted in a later
read.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

SCORE_COLUMNS = [
    "doc_id",
    "n_tokens",
    "n_bigrams",
    "sum_bigram_freq",
    "n_hapax_bigrams",
    "n_rare_bigrams",
    "flagged",
    "avg_logprob",
    "ppl_proxy",
]


def stream_score_documents(
    spark: SparkSession,
    source_dir: str,
    schema,
    counts: tuple[DataFrame, DataFrame],
    target_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_files_per_trigger: int = 1,
    **lm_kwargs,
):
    """Drain a parquet-directory document stream through per-batch LM
    scoring into ``target_dir``; returns the started StreamingQuery
    (availableNow trigger — the bounded-completeness mode every other
    streaming contract uses)."""
    from changedatacapture_reporting_spark.operators.lm import (
        lm_surprisal_scores,
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def _score(batch_df: DataFrame, batch_id: int) -> None:
        out = lm_surprisal_scores(
            batch_df,
            counts=counts,
            id_col=id_col,
            text_col=text_col,
            **lm_kwargs,
        )
        out.select(*SCORE_COLUMNS).write.mode("overwrite").parquet(
            os.path.join(target_dir, f"b{batch_id}")
        )

    return (
        stream.writeStream.foreachBatch(_score)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_scored(spark: SparkSession, target_dir: str) -> DataFrame:
    """Union of all committed batch outputs."""
    return spark.read.parquet(os.path.join(target_dir, "b*"))
