"""Streaming materialized current-state table: per micro-batch, collapse
the batch to NET changes and MERGE them into a served snapshot — the
streaming form of the consumer-side pipeline
(operators.net_changes → operators.apply), kept exactly-once the same way
stream_populate is: deterministic epoch ids with a marker-file commit
point, so a replayed epoch is detected in the target's own ledger and
skipped (sink-side idempotency, not checkpoint trust).

Versioned-snapshot layout (the MERGE must read the table it replaces, so
updates go to a fresh version directory and a marker flips visibility):

    target/
      v=<epoch>/…parquet       one directory per committed epoch
      _epochs/epoch-…          marker per committed epoch (COMMIT POINT —
                               written AFTER the version directory lands;
                               max marker = current version)

A crash after data, before marker: the version dir is invisible and the
epoch replays into it (overwrite). A crash after marker: the replayed
epoch is detected and skipped. Readers resolve the max marker — always a
complete version.

Scale posture: each batch's work is net_changes (one aggregation over
the BATCH) + apply_changes (broadcast anti-join of batch keys against
the current version — the target never shuffles) + a full-version
rewrite. The rewrite is the cost of plain-parquet storage; swap the
writer for operators.serving's bucket-level refresh when the state is
large relative to batches.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from changedatacapture_reporting_spark.fs import listdir, write_text
from changedatacapture_reporting_spark.operators.apply import apply_changes
from changedatacapture_reporting_spark.operators.net_changes import net_changes
from changedatacapture_reporting_spark.streaming.populate_stream import (
    epoch_run_id,
)


def _committed_epochs(spark: SparkSession, target_path: str) -> list[str]:
    marker_dir = os.path.join(target_path, "_epochs")
    return [n for n in listdir(spark, marker_dir) if n.startswith("epoch-")]


def read_current_state(
    spark: SparkSession,
    target_path: str,
    pk_cols: list[str],
    value_cols: list[str],
    source_struct: T.StructType,
) -> DataFrame:
    """The served table: the max committed version, or an empty typed
    frame before the first commit."""
    epochs = _committed_epochs(spark, target_path)
    if not epochs:
        fields = [
            f for f in source_struct.fields if f.name in (*pk_cols, *value_cols)
        ]
        return spark.createDataFrame([], T.StructType(fields))
    current = epochs[-1]
    return spark.read.parquet(os.path.join(target_path, f"v={current}"))


def stream_apply(
    spark: SparkSession,
    events_path: str,
    event_schema: T.StructType,
    target_path: str,
    checkpoint_path: str,
    pk_cols: list[str],
    value_cols: list[str],
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain the current-state table from a CDC event stream."""
    source_struct = event_schema["after"].dataType
    stream = spark.readStream.schema(event_schema).parquet(events_path)

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        session = batch_df.sparkSession
        run_id = epoch_run_id(epoch_id)
        if run_id in _committed_epochs(session, target_path):
            return  # replayed epoch — already visible

        current = read_current_state(
            session, target_path, pk_cols, value_cols, source_struct
        )
        net = net_changes(batch_df, pk_cols)
        applied = apply_changes(
            current, net, pk_cols, value_cols, broadcast_net=True
        )
        version_dir = os.path.join(target_path, f"v={run_id}")
        applied.write.mode("overwrite").parquet(version_dir)
        # COMMIT POINT — single marker file after the version lands
        write_text(session, os.path.join(target_path, "_epochs", run_id))

    writer = stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def vacuum_versions(
    spark: SparkSession, target_path: str, keep: int = 2
) -> int:
    """Drop all but the newest ``keep`` committed versions (markers stay
    — they are the replay ledger and cost one empty file each). Readers
    resolve the max marker, so removing older version DIRECTORIES is
    safe at any time; ``keep >= 2`` leaves the previous version for
    readers that resolved it just before a commit. Returns the number of
    versions removed."""
    from changedatacapture_reporting_spark.fs import delete

    if keep < 1:
        raise ValueError("keep must be >= 1")
    epochs = sorted(_committed_epochs(spark, target_path))
    doomed = epochs[:-keep] if keep < len(epochs) else []
    removed = 0
    for e in doomed:
        if delete(spark, os.path.join(target_path, f"v={e}")):
            removed += 1
    return removed
