"""Exactly-once foreachBatch sink: replayed and half-written batches
must not duplicate rows."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from samba_tv_ingest_etl_spark.streaming.ingest import read_feed_stream
from samba_tv_ingest_etl_spark.streaming.sink import (
    ExactlyOnceForeachBatch,
)


def _run_stream(spark, stage, out, ckpt, schema, app_id="default"):
    sink = ExactlyOnceForeachBatch(out, app_id=app_id)
    q = (
        read_feed_stream(spark, stage, schema)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_sink_writes_all_rows_once(spark, tmp_path):
    base = str(tmp_path)
    stage, out, ckpt = (
        os.path.join(base, d) for d in ("stage", "out", "ckpt")
    )
    src = spark.range(100).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )
    src.coalesce(1).write.parquet(stage)
    _run_stream(spark, stage, out, ckpt, src.schema)
    got = spark.read.parquet(out)
    assert got.count() == 100
    assert got.select(F.sum("v")).collect()[0][0] == 9900


def test_replayed_batch_is_skipped(spark, tmp_path):
    base = str(tmp_path)
    stage, out, ckpt = (
        os.path.join(base, d) for d in ("stage", "out", "ckpt")
    )
    src = spark.range(50).select(F.col("id"))
    src.coalesce(1).write.parquet(stage)
    _run_stream(spark, stage, out, ckpt, src.schema)
    # simulate the crash-after-write-before-offset-commit replay:
    # run the SAME batch content with a FRESH checkpoint so the
    # engine re-delivers it with the same batch id
    _run_stream(spark, stage, out, os.path.join(base, "ckpt2"), src.schema)
    assert spark.read.parquet(out).count() == 50  # no duplicates


def test_half_written_batch_is_replaced(spark, tmp_path):
    base = str(tmp_path)
    stage, out, ckpt = (
        os.path.join(base, d) for d in ("stage", "out", "ckpt")
    )
    src = spark.range(20).select(F.col("id"))
    src.coalesce(1).write.parquet(stage)
    # fake a crashed first attempt: batch dir with data but NO
    # _COMMITTED marker
    crashed = os.path.join(out, "_txn_app_id=default", "_batch_id=0")
    spark.range(7).select(F.col("id")).write.parquet(crashed)
    _run_stream(spark, stage, out, ckpt, src.schema)
    got = spark.read.parquet(out)
    assert got.count() == 20  # the 7 half-written rows are gone


def test_distinct_apps_share_one_path(spark, tmp_path):
    """batchId restarts at 0 per checkpoint: a DIFFERENT pipeline
    writing to the same path must not have its batch 0 mistaken for
    app A's already-committed batch 0 (the batchId-only-ledger bug)."""
    base = str(tmp_path)
    out = os.path.join(base, "out")
    for app, n in (("appa", 30), ("appb", 40)):
        stage = os.path.join(base, f"stage_{app}")
        ckpt = os.path.join(base, f"ckpt_{app}")
        src = spark.range(n).select(F.col("id"))
        src.coalesce(1).write.parquet(stage)
        _run_stream(spark, stage, out, ckpt, src.schema, app_id=app)
    got = spark.read.parquet(out)
    assert got.count() == 70  # appb's batch 0 was NOT skipped
    per_app = {
        r["_txn_app_id"]: r["n"]
        for r in got.groupBy("_txn_app_id").agg(F.count("*").alias("n")).collect()
    }
    assert per_app == {"appa": 30, "appb": 40}
