"""Streaming dedup + watermarked windows: duplicates across batches
collapse; finalized windows emit once; data later than the watermark
is dropped. Each stage file is drained by its own availableNow run —
the checkpoint carries state and watermark across runs, which pins
batch order deterministically (in-run file order follows listing
order, not write order). Parquet sink per the checkpoint-recovery
constraint (memory sink can't resume one)."""

from __future__ import annotations

from pyspark.sql import types as T

from samba_tv_ingest_etl_spark.streaming.dedup import (
    dedup_stream,
    windowed_counts,
)
from samba_tv_ingest_etl_spark.streaming.ingest import read_feed_stream

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # nanos, like the driver
        T.StructField("user", T.StringType()),
    ]
)

_BASE = 1_700_000_000  # seconds


def _ns(sec_offset: int) -> int:
    return (_BASE + sec_offset) * 1_000_000_000


def _write(spark, rows, path):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _drain(spark, stage, out, ckpt, xform):
    q = (
        xform(read_feed_stream(spark, stage, SCHEMA))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out)


def test_dedup_across_batches(spark, tmp_path):
    stage, out, ckpt = (
        str(tmp_path / d) for d in ("stage", "out", "ckpt")
    )
    dd = lambda s: dedup_stream(  # noqa: E731
        s, ["event_id"], "ts", lateness="10 minutes"
    )
    _write(spark, [(1, _ns(0), "a"), (2, _ns(60), "b")], stage)
    _drain(spark, stage, out, ckpt, dd)
    # replayed id=1 in a later file: dropped by streaming state
    _write(spark, [(1, _ns(0), "a"), (3, _ns(120), "c")], stage)
    got = _drain(spark, stage, out, ckpt, dd)
    assert sorted(r["event_id"] for r in got.collect()) == [1, 2, 3]


def test_windowed_counts_finalize_and_drop_late(spark, tmp_path):
    stage, out, ckpt = (
        str(tmp_path / d) for d in ("stage", "out", "ckpt")
    )
    wc = lambda s: windowed_counts(  # noqa: E731
        s, "ts", "1 minute", lateness="1 minute"
    )
    # batch 1: two events inside one 1-minute window (aligned: epoch
    # windows start on minute boundaries, and _BASE % 60 == 20)
    w1 = 40  # window [_BASE+40, _BASE+100)
    _write(
        spark, [(1, _ns(w1 + 5), "a"), (2, _ns(w1 + 50), "b")], stage
    )
    _drain(spark, stage, out, ckpt, wc)
    # batch 2: far-future event -> watermark passes window 1 + lateness
    _write(spark, [(3, _ns(3600), "c")], stage)
    _drain(spark, stage, out, ckpt, wc)
    # batch 3: older than the watermark -> must be dropped
    _write(spark, [(4, _ns(w1 + 10), "d")], stage)
    got = _drain(spark, stage, out, ckpt, wc).collect()

    by_start = {
        r["window_start"].timestamp(): r["n_events"] for r in got
    }
    # window 1 finalized with exactly the 2 on-time events; the late
    # event neither re-emits the window nor creates a new one
    w1_start = float(_BASE + w1)
    assert by_start.get(w1_start) == 2, by_start
    assert len([s for s in by_start if s == w1_start]) == 1


def test_dedup_stream_rocksdb_state_store(spark, tmp_path):
    """The 100 TB streaming path keeps state off-heap in RocksDB
    (changelog-checkpointed on real clusters). Same dedup semantics,
    different provider — results must be identical to the default
    HDFS-backed store."""
    import os

    from pyspark.sql import functions as F

    from samba_tv_ingest_etl_spark.streaming.dedup import dedup_stream
    from samba_tv_ingest_etl_spark.streaming.ingest import read_feed_stream

    rows = [(i, 1_700_000_000_000_000_000 + i * 10**9) for i in range(50)]
    ev = spark.createDataFrame(rows, ["event_id", "ts"])
    stage = str(tmp_path / "stage")
    ev.coalesce(1).write.parquet(stage)
    ev.filter(F.col("event_id") % 5 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(stage)  # replayed rows

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        out = str(tmp_path / "out")
        stream = read_feed_stream(spark, stage, ev.schema)
        deduped = dedup_stream(
            stream, keys=["event_id"], ts_col="ts", lateness="1 hour"
        )
        (
            deduped.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        ).awaitTermination()
        got = sorted(r["event_id"] for r in spark.read.parquet(out).collect())
        assert got == list(range(50))
        # the state store actually used RocksDB (sst/log files on disk)
        ckpt_state = os.path.join(str(tmp_path / "ckpt"), "state")
        assert os.path.isdir(ckpt_state)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
