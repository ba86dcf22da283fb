"""Streaming layer tests: exactly-once file ingest via checkpoint,
session_window sessionization, and the reference-exact stateful
sessionizer across micro-batches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from samba_tv_ingest_etl_spark.streaming.ingest import (
    ingest_once,
    read_feed_stream,
)
from samba_tv_ingest_etl_spark.streaming.sessionize import (
    sessionize_stream_stateful,
    sessionize_stream_window,
)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("hh_id", T.StringType()),
        T.StructField("exposure_start_ts", T.LongType()),
        T.StructField("exposure_end_ts", T.LongType()),
        T.StructField("duration", T.LongType()),
    ]
)


def _write_batch(spark, rows, path):
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_streaming_ingest_exactly_once(spark, tmp_path):
    stage = str(tmp_path / "stage")
    target = str(tmp_path / "raw")
    ckpt = str(tmp_path / "ckpt")

    _write_batch(spark, [("a", 1, 2, 1), ("b", 3, 4, 1)], stage)
    stream = read_feed_stream(spark, stage, EVENT_SCHEMA)
    assert stream.isStreaming
    ingest_once(stream, target, ckpt).awaitTermination()
    assert spark.read.parquet(target).count() == 2

    # re-trigger with no new files: nothing appended (checkpoint log)
    ingest_once(
        read_feed_stream(spark, stage, EVENT_SCHEMA), target, ckpt
    ).awaitTermination()
    assert spark.read.parquet(target).count() == 2

    # new file lands -> only it is ingested
    _write_batch(spark, [("c", 5, 6, 1)], stage)
    ingest_once(
        read_feed_stream(spark, stage, EVENT_SCHEMA), target, ckpt
    ).awaitTermination()
    assert spark.read.parquet(target).count() == 3


def _run_stateful(spark, stage, ckpt, out_dir):
    stream = read_feed_stream(spark, stage, EVENT_SCHEMA)
    sessions = sessionize_stream_stateful(
        stream,
        key_cols=["hh_id"],
        gap_seconds=300,
        min_total_duration=180,
    )
    q = (
        sessions.writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)


def test_stateful_sessionize_reference_semantics(spark, tmp_path):
    """Gap measured from previous END, break iff > 300, HAVING >= 180;
    sessions close across micro-batches; state carries the open tail."""
    stage = str(tmp_path / "stage")
    ckpt = str(tmp_path / "ck")

    # batch 1: hh_1 gap exactly 300 (stays), then gap 301 (breaks;
    # first session 100+100=200 >= 180 -> will be emitted when cut)
    _write_batch(
        spark,
        [
            ("hh_1", 1000, 1100, 100),
            ("hh_1", 1400, 1500, 100),  # 1400-1100=300 -> same session
            ("hh_1", 1801, 1901, 100),  # 1801-1500=301 -> break
            ("hh_2", 5000, 5100, 100),  # short lone session (dropped)
        ],
        stage,
    )
    out = _run_stateful(spark, stage, ckpt, str(tmp_path / "out"))
    rows = {
        (r["hh_id"], r["session_id"]): r for r in out.collect()
    }
    assert ("hh_1", 1) in rows
    assert rows[("hh_1", 1)]["total_duration"] == 200
    assert rows[("hh_1", 1)]["session_end_ts"] == 1500
    assert len(rows) == 1  # hh_1's open tail + hh_2 not emitted yet

    # batch 2: continue hh_1's open session (gap 299 from 1901), then
    # sentinel far-future events close everything
    _write_batch(
        spark,
        [
            ("hh_1", 2200, 2300, 100),   # 2200-1901=299 -> same session
            ("hh_1", 99000, 99001, 1),   # closes session 2 (200s >= 180)
            ("hh_2", 99000, 99001, 1),   # closes hh_2's 100s session (dropped)
        ],
        stage,
    )
    out = _run_stateful(spark, stage, ckpt, str(tmp_path / "out"))
    rows = {(r["hh_id"], r["session_id"]): r for r in out.collect()}
    assert rows[("hh_1", 2)]["total_duration"] == 200
    assert rows[("hh_1", 2)]["session_start_ts"] == 1801
    assert rows[("hh_1", 2)]["session_end_ts"] == 2300
    assert ("hh_2", 1) not in rows  # 100s < 180 floor


def test_session_window_variant(spark, tmp_path):
    """The built-in session_window path (documented start-to-start gap
    semantics): instantaneous events 100s apart merge into one window
    under a 300s gap; a 301s-later event starts a new window.
    Append-mode windows are emitted only once the watermark passes the
    window end, so each assertion batch is followed by a sentinel
    batch that advances the watermark."""
    stage = str(tmp_path / "stage")
    ckpt = str(tmp_path / "ck")
    out_dir = str(tmp_path / "out")

    def run():
        stream = read_feed_stream(spark, stage, EVENT_SCHEMA).select(
            "hh_id",
            F.timestamp_seconds("exposure_start_ts").alias("event_time"),
            "duration",
        )
        sessions = sessionize_stream_window(
            stream,
            key_cols=["hh_id"],
            time_col="event_time",
            duration_col="duration",
            gap_seconds=300,
            min_total_duration=100,
            watermark="0 seconds",
        )
        (
            sessions.writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        ).awaitTermination()
        return spark.read.parquet(out_dir)

    _write_batch(
        spark,
        [
            ("hh_1", 1000, 1000, 100),
            ("hh_1", 1100, 1100, 100),
            ("hh_1", 1702, 1702, 100),  # 1100+300=1400 < 1702 -> new window
        ],
        stage,
    )
    run()  # watermark was 0 during this batch: nothing emitted yet

    # sentinel advances the watermark past both window ends
    # (availableNow runs follow-up batches until emission quiesces);
    # the 1-duration sentinel window stays under the 100s floor
    _write_batch(spark, [("hh_1", 99_000, 99_000, 1)], stage)
    got = sorted(
        (r["total_duration"], r["n_events"]) for r in run().collect()
    )
    assert got == [(100, 1), (200, 2)]
