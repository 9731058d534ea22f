"""Streaming populate — the reference's incremental ETL as Structured
Streaming (SURVEY.md §2.9, build-plan step 5).

The reference simulates a stream with bounded LSN windows per proc run
(``(@from_lsn, @to_lsn]``, populate:241–253) and a +1-minute time watermark
(populate:203) that can both skip and double-load at boundaries. Structured
Streaming replaces all of it exactly:

- checkpoint offsets = the LSN window bookkeeping (ST1/ST2), exact;
- ``trigger(availableNow=True)`` = the README's "pass HIGHDATE … TO ENSURE
  COMPLETENESS" mode (ST3): drain everything available, then stop;
- idempotent re-run = checkpoint replay, no duplicate loads (ST6) — the
  reference's TRY/CATCH "No changes were detected" swallow (ST5) becomes
  a genuinely empty micro-batch.

The per-batch transformation is the SAME builder as batch mode
(:func:`build_changelog`) inside ``foreachBatch`` — one code path for both
engines of execution, which is the point of the Spark re-design.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from changedatacapture_reporting_spark.config import CompatFlags
from changedatacapture_reporting_spark.operators.changelog import build_changelog


def stream_populate(
    spark: SparkSession,
    events_path: str,
    event_schema: T.StructType,
    sink_path: str,
    checkpoint_path: str,
    pk_cols: list[str],
    flags: CompatFlags | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously (or drain-once) populate the changelog sink from a
    parquet event-stream directory.

    At scale the source would be Kafka/Kinesis/Delta-CDF; the parquet file
    source has the same offset/commit semantics so the pipeline code is
    source-agnostic.
    """
    flags = flags or CompatFlags()
    stream = spark.readStream.schema(event_schema).parquet(events_path)

    def write_batch(batch_df, epoch_id: int) -> None:
        from pyspark.sql import functions as F

        # same sink layout as batch populate: (table_name, commit_month)
        changelog = build_changelog(
            batch_df, pk_cols, flags=flags, carry_cols=["lsn", "seq"]
        ).withColumn("commit_month", F.trunc("commit_time", "month"))
        (
            changelog.repartition("table_name", "commit_month")
            .sortWithinPartitions("commit_time", *pk_cols, "column_name")
            .write.mode("append")
            .partitionBy("table_name", "commit_month")
            .parquet(sink_path)
        )

    writer = stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
