"""Streaming dedup + watermarked window aggregation.

The batch engine dedups replayed events with a plain hash-groupBy
(``operators/dedup.py``); a streaming ingest needs the same guarantee
without unbounded state. Two standard pieces:

- ``dedup_stream``: row-level exactly-once within a lateness bound via
  ``dropDuplicatesWithinWatermark`` — state holds only keys younger
  than the watermark, so memory is O(arrival rate x lateness), not
  O(history). This is the streaming twin of the load-ledger's
  file-level idempotency (``sources/ledger.py``): the ledger stops
  whole-file replays, this stops row replays inside late/overlapping
  files.

- ``windowed_counts``: event-time tumbling/sliding aggregation with a
  watermark, append-mode-compatible (windows emit once finalized —
  exactly the reference's daily-rollup semantics, SURVEY §2.5, at
  arbitrary grain).

Scale: state store size is the product of key cardinality inside the
lateness horizon; RocksDB state store + changelog checkpointing keeps
it off-heap on real clusters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["dedup_stream", "windowed_counts"]


def _event_time(df: DataFrame, ts_col: str) -> tuple[DataFrame, str]:
    """Normalize the event-time column to a real ``_event_time``
    timestamp regardless of the physical encoding — nanos-since-epoch
    bigint (TIMESTAMP(NANOS) parquet under nanosAsLong) or a native
    timestamp/timestamp_ntz (microsecond parquet). Always emitting
    the same column name keeps downstream stateful chains (dedup ->
    windowed agg, join output prefixes) schema-stable across data
    encodings; NTZ casts to session-zone timestamp under the engine's
    pinned-UTC conf, so window arithmetic is unchanged."""
    if ts_col == "_event_time":
        return df, ts_col
    if dict(df.dtypes).get(ts_col) == "bigint":
        col = F.timestamp_micros(F.expr(f"{ts_col} DIV 1000"))
    else:
        col = F.col(ts_col).cast("timestamp")
    return df.withColumn("_event_time", col), "_event_time"


def dedup_stream(
    stream: DataFrame,
    keys: list[str],
    ts_col: str,
    lateness: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate rows (same ``keys``) arriving within the
    ``lateness`` horizon of each other. Unlike ``dropDuplicates``,
    state for a key is evicted once the watermark passes it, so the
    operator runs forever at bounded memory; duplicates farther apart
    than ``lateness`` are the load-ledger's job (file granularity)."""
    df, et = _event_time(stream, ts_col)
    return df.withWatermark(et, lateness).dropDuplicatesWithinWatermark(
        keys
    )


def windowed_counts(
    stream: DataFrame,
    ts_col: str,
    window: str,
    keys: list[str] | None = None,
    lateness: str | None = "10 minutes",
    aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Event-time tumbling-window aggregation with late-data handling:
    rows later than ``lateness`` are dropped, and in append output
    mode a window emits exactly once, when the watermark passes its
    end. Default aggregate is ``n_events``; pass ``aggs`` (alias ->
    summable expression) for more.

    ``lateness=None`` declares NO watermark here — required when an
    upstream stateful operator (e.g. ``dedup_stream``) already set
    one: Spark disallows redefining the watermark mid-chain, and the
    upstream declaration propagates through."""
    df, et = _event_time(stream, ts_col)
    aggs = aggs or {}
    exprs = [F.count(F.lit(1)).cast("long").alias("n_events")] + [
        e.alias(a) for a, e in aggs.items()
    ]
    if lateness is not None:
        df = df.withWatermark(et, lateness)
    return (
        df
        .groupBy(F.window(et, window), *(keys or []))
        .agg(*exprs)
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *(keys or []),
            "n_events",
            *aggs.keys(),
        )
    )
