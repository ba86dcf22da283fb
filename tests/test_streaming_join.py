"""Stream-stream interval join: conversions attribute to impressions
within the horizon, including across micro-batch runs (buffered
state), and out-of-horizon conversions never match."""

from __future__ import annotations

from pyspark.sql import types as T

from samba_tv_ingest_etl_spark.streaming.ingest import read_feed_stream
from samba_tv_ingest_etl_spark.streaming.join import (
    stream_stream_interval_join,
)

IMP = T.StructType(
    [
        T.StructField("user", T.StringType()),
        T.StructField("imp_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # nanos
    ]
)
CONV = T.StructType(
    [
        T.StructField("user", T.StringType()),
        T.StructField("conv_id", T.LongType()),
        T.StructField("ts", T.LongType()),
    ]
)

_BASE = 1_700_000_000


def _ns(off):
    return (_BASE + off) * 1_000_000_000


def _write(spark, rows, schema, path):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _drain(spark, imp_dir, conv_dir, out, ckpt):
    joined = stream_stream_interval_join(
        read_feed_stream(spark, imp_dir, IMP),
        read_feed_stream(spark, conv_dir, CONV),
        on=["user"],
        left_ts="ts",
        right_ts="ts",
        max_delay="5 minutes",
    ).select("imp_id", "r_conv_id")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out)


def test_attribution_within_horizon_across_batches(spark, tmp_path):
    imp, conv, out, ckpt = (
        str(tmp_path / d) for d in ("imp", "conv", "out", "ckpt")
    )
    # run 1: impressions only — no conversions yet, nothing joins
    _write(
        spark,
        [("a", 1, _ns(0)), ("b", 2, _ns(10))],
        IMP,
        imp,
    )
    _write(spark, [], CONV, conv)
    assert _drain(spark, imp, conv, out, ckpt).count() == 0

    # run 2: conversions arrive later — a converts inside 5 min
    # (joins the buffered impression from run 1), b converts after
    # the horizon (never matches), c has no impression
    _write(
        spark,
        [
            ("a", 11, _ns(120)),
            ("b", 12, _ns(10 + 600)),
            ("c", 13, _ns(30)),
        ],
        CONV,
        conv,
    )
    got = _drain(spark, imp, conv, out, ckpt)
    assert [
        (r["imp_id"], r["r_conv_id"]) for r in got.collect()
    ] == [(1, 11)]
