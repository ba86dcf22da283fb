"""Streaming ingest — the Structured-Streaming alternative to the
batch COPY pattern (SURVEY §2.9 / §4.2-3).

The batch engine gets file-level exactly-once from the load ledger;
the streaming file source gets it from the checkpoint's file log:
``readStream`` lists the stage, remembers processed files in the
checkpoint, and a re-trigger (``availableNow``) picks up only new
files — the same idempotency contract as Snowflake's COPY load
history, with zero engine bookkeeping.

``Trigger.AvailableNow`` makes this runnable from the same cron
entry point as the batch DAG (drain everything pending, then stop) —
a streaming job that behaves like an incremental batch job, which is
exactly the reference's operating model.

Scale: file listing is driver-side — at millions of stage files set
``maxFilesPerTrigger`` to bound per-batch work and compact the
checkpoint file log (``spark.sql.streaming.fileSource.log.
compactInterval``); the transform/append stages are identical to
batch ingest and scale the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery


def read_feed_stream(
    spark: SparkSession,
    stage_dir: str,
    schema: T.StructType,
    path_glob: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming scan of a stage directory with a declared schema
    (schema-on-read, like the batch reader)."""
    reader = spark.readStream.schema(schema)
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(stage_dir)


def ingest_once(
    stream: DataFrame,
    target_path: str,
    checkpoint_dir: str,
    partition_by: list[str] | None = None,
) -> StreamingQuery:
    """Drain all currently-available files into the raw table and
    stop (the COPY-task analog). Exactly-once per file via the
    checkpoint; re-running after new files land appends only the new
    ones."""
    writer = (
        stream.writeStream.format("parquet")
        .option("path", target_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    return writer.start()
