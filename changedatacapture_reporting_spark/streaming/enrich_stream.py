"""Streaming point-in-time enrichment — decorate a fact stream with the
SCD2 dimension version valid at each fact's OWN timestamp (not
arrival time), the stream-static temporal join Structured Streaming
cannot express natively (the union+window carry is an unsupported
non-time window on a stream).

Per micro-batch the BATCH form runs instead: ``foreachBatch`` applies
``operators.temporal.temporal_enrich`` (batch facts × static dimension)
and lands the enriched rows in a per-epoch directory committed by the
same marker-file ledger as ``apply_stream`` — a replayed epoch is
detected and skipped, so enrichment is exactly-once without trusting
the checkpoint, and a crash between data and marker replays into an
overwrite. Readers union only committed epochs.

Scale posture: per-batch work is the batch-sized union+window (the
dimension's version-start rows ride along — dims are small next to
fact volume); the dimension snapshot is read per batch, so point it at
a materialized table (scd2_history output, a serving snapshot), not a
computed subtree. Late facts are HANDLED BY CONSTRUCTION: a fact
arriving days late still joins the version valid at its event time —
no watermark races, because the dimension's history is full SCD2, not
a stream-state buffer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from changedatacapture_reporting_spark.fs import listdir, write_text
from changedatacapture_reporting_spark.operators.temporal import (
    temporal_enrich,
)
from changedatacapture_reporting_spark.streaming.populate_stream import (
    epoch_run_id,
)


def _committed(spark: SparkSession, out_path: str) -> list[str]:
    return [
        n
        for n in listdir(spark, os.path.join(out_path, "_epochs"))
        if n.startswith("epoch-")
    ]


def stream_temporal_enrich(
    spark: SparkSession,
    facts_path: str,
    fact_schema: T.StructType,
    dim: DataFrame,
    out_path: str,
    checkpoint_path: str,
    key_cols: list[str],
    fact_ts_col: str,
    value_cols: list[str],
    available_now: bool = True,
) -> StreamingQuery:
    """Drain a fact stream through per-batch temporal enrichment into an
    epoch-committed parquet target. ``dim`` is an SCD2 frame
    (key + value cols + valid_from/valid_to), evaluated per batch."""
    stream = spark.readStream.schema(fact_schema).parquet(facts_path)

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        session = batch_df.sparkSession
        run_id = epoch_run_id(epoch_id)
        if run_id in _committed(session, out_path):
            return  # replayed epoch — already visible
        enriched = temporal_enrich(
            batch_df, dim, key_cols, fact_ts_col, value_cols
        )
        enriched.write.mode("overwrite").parquet(
            os.path.join(out_path, f"e={run_id}")
        )
        # COMMIT POINT — marker after the epoch directory lands
        write_text(session, os.path.join(out_path, "_epochs", run_id))

    writer = stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_enriched(
    spark: SparkSession,
    out_path: str,
    fact_schema: T.StructType,
    dim: DataFrame,
    value_cols: list[str],
) -> DataFrame:
    """Union of committed epochs (an empty typed frame — fact fields +
    the dimension's own value types — before the first commit)."""
    epochs = _committed(spark, out_path)
    if not epochs:
        fields = list(fact_schema.fields) + [
            T.StructField(c, dim.schema[c].dataType) for c in value_cols
        ]
        return spark.createDataFrame([], T.StructType(fields))
    return spark.read.parquet(
        *[os.path.join(out_path, f"e={e}") for e in epochs]
    )
