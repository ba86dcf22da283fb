"""KMV sketch: estimator accuracy when saturated, exactness when
unsaturated, and the merge == rescan identity."""

from __future__ import annotations

from pyspark.sql import functions as F

from samba_tv_ingest_etl_spark.operators import sketch as SK

from .conftest import SF_DIR


def _events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def test_unsaturated_sketch_is_exact(spark):
    ev = _events(spark)
    sk = SK.kmv_sketch(ev, ["event_type"], "user_id", k=10_000)
    est = sk.select(
        "event_type",
        SK.kmv_estimate("kth_min_hash", "sketch_size", 10_000).alias(
            "est"
        ),
    )
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for r in est.collect():
        assert r["est"] == float(exact[r["event_type"]])


def test_saturated_estimate_within_tolerance(spark):
    ev = _events(spark)  # event_id: one distinct hash per row
    k = 128
    sk = SK.kmv_sketch(ev, [], "event_id", k=k)
    row = sk.select(
        SK.kmv_estimate("kth_min_hash", "sketch_size", k).alias("est")
    ).collect()[0]
    exact = ev.select("event_id").distinct().count()
    assert exact > k  # saturated regime, or the test is vacuous
    # KMV stderr ~ 1/sqrt(k-2) ~ 9% at k=128; allow 3 sigma
    assert abs(row["est"] - exact) / exact < 0.27, (row["est"], exact)


def test_merge_equals_rescan(spark):
    ev = _events(spark)
    k = 64
    per = SK.kmv_sketch(ev, ["event_type"], "event_id", k=k)
    merged = SK.kmv_merge(per, keys=[], k=k).collect()[0]
    direct = SK.kmv_sketch(ev, [], "event_id", k=k).collect()[0]
    assert merged["sketch"] == direct["sketch"]
    assert merged["kth_min_hash"] == direct["kth_min_hash"]


def test_prefilter_exact_when_enough_survivors(spark):
    ev = _events(spark)
    k = 64
    full = SK.kmv_sketch(ev, [], "event_id", k=k).collect()[0]
    # any threshold above the observed kth keeps the result identical
    pre = SK.kmv_sketch(
        ev, [], "event_id", k=k, prefilter=full["kth_min_hash"] + 1
    ).collect()[0]
    assert pre["sketch"] == full["sketch"]
