"""Skew operators: salted results must equal the naive plans, and the
plans must actually carry the salt through the shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

from samba_tv_ingest_etl_spark.operators import skew as K

from .conftest import SF_DIR


def _events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id",
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )


def test_salted_sum_equals_naive_groupby(spark):
    ev = _events(spark)
    salted = K.salted_sum(
        ev,
        keys=["event_type"],
        sums={"n": F.count(F.lit(1)), "s": F.sum("cents")},
        salt_source="event_id",
        n_salts=7,
    )
    naive = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
    )
    a = {r["event_type"]: (r["n"], r["s"]) for r in salted.collect()}
    b = {r["event_type"]: (r["n"], r["s"]) for r in naive.collect()}
    assert a == b


def test_distinct_count_equals_count_distinct(spark):
    ev = _events(spark)
    two_phase = {
        r["event_type"]: r["n_users"]
        for r in K.distinct_count(
            ev, ["event_type"], "user_id", "n_users"
        ).collect()
    }
    naive = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert two_phase == naive


def test_salted_join_equals_plain_join(spark):
    ev = _events(spark)
    dim = ev.groupBy("event_type").agg(F.sum("cents").alias("s"))
    salted = K.salted_join(
        ev, dim, on=["event_type"], salt_source="event_id", n_salts=5
    )
    plain = ev.join(dim, "event_type")
    assert sorted(salted.columns) == sorted(plain.columns)
    cols = sorted(salted.columns)
    a = sorted(tuple(r) for r in salted.select(*cols).collect())
    b = sorted(tuple(r) for r in plain.select(*cols).collect())
    assert a == b


def test_salted_join_left_preserves_unmatched(spark):
    ev = _events(spark).limit(100)
    dim = spark.createDataFrame(
        [("click", 1)], "event_type string, flag int"
    )
    out = K.salted_join(
        ev, dim, on=["event_type"], salt_source="event_id",
        n_salts=3, how="left",
    )
    plain = ev.join(dim, "event_type", "left")
    assert out.count() == plain.count()
    assert (
        out.filter(F.col("flag").isNull()).count()
        == plain.filter(F.col("flag").isNull()).count()
    )


def test_salt_is_deterministic(spark):
    ev = _events(spark).limit(1000)
    s1 = ev.select("event_id", K.salt_column("event_id", 16).alias("s"))
    s2 = ev.select("event_id", K.salt_column("event_id", 16).alias("s"))
    assert sorted(map(tuple, s1.collect())) == sorted(
        map(tuple, s2.collect())
    )
    vals = {r["s"] for r in s1.collect()}
    assert vals <= set(range(16)) and len(vals) > 1


def test_salted_join_shuffles_on_key_and_salt(spark):
    """With the right side too big to broadcast (forced here), the
    join's exchanges must hash on (key, _salt) — that IS the skew
    mitigation; without _salt in the clustering the operator
    silently degenerates to the hot-key plan. (When the right side
    DOES fit the broadcast budget Spark broadcasts it and no shuffle
    exists at all — also correct, just not the case under test.)"""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ev = _events(spark)
        dim = ev.groupBy("event_type").agg(F.sum("cents").alias("s"))
        out = K.salted_join(
            ev, dim, on=["event_type"], salt_source="event_id",
            n_salts=5,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        import re

        parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
        assert any(
            "event_type" in p and "_salt" in p for p in parts
        ), parts
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_aqe_splits_skew_in_real_weighting_pipeline(spark, tmp_path):
    """The production hazard the reference's data makes likely (a
    popular device piling events onto one smba_id): run the REAL
    pipeline — q61's feed derivation (_samba_feeds, unmodified) ->
    union -> panel attribution -> geo weighting -> sessionize — over
    a 1.2M-event corpus where ONE device carries ~10% of all events,
    and assert AQE splits the weighting join's hot partition at
    runtime (skew=true in the final adaptive plan), with results
    identical to the unsplit plan. Complements
    test_aqe_splits_skewed_join_partition (toy-join mechanism only).

    Probe discipline, learned the hard way: the consumer must be the
    FULL pipeline. A narrow probe (count-style) lets Catalyst prune
    the join shuffle down to its keys, and the hot device's keys-only
    rows are so self-similar that lz4 compressed a 13x-row hot
    partition to 1.3x the median's BYTES — byte-based skew detection
    correctly saw nothing worth splitting for that consumer. With
    sessionize consuming the full rows the same 10% hot key clears
    the bar. (Fleet note: for narrow consumers of a skewed join the
    deterministic salting operators — operators/skew.py — remain the
    row-semantic mitigation.)"""
    import time

    from samba_tv_ingest_etl_spark.plans.backfill import (
        build_viewing_sessions,
    )
    from samba_tv_ingest_etl_spark.operators.panels import (
        attribute_panels, panel_windows,
    )
    from samba_tv_ingest_etl_spark.operators.union_events import (
        raw_viewing_events,
    )
    from samba_tv_ingest_etl_spark.operators.weighting import (
        weighted_events,
    )
    from samba_tv_ingest_etl_spark.queries.core import _samba_feeds

    n = 1_200_000
    base_s = 1_700_000_000 - (1_700_000_000 % 86_400)
    ev = spark.range(n).select(
        F.col("id").alias("event_id"),
        # hash-spread timestamps: the feed derivation dedups on
        # (household, second), so arithmetic ts cycles would silently
        # dedup the hot key away
        F.timestamp_seconds(
            F.lit(base_s)
            + F.pmod(F.hash((F.col("id") * 7 + 3).cast("long")),
                     F.lit(5 * 86_400))
        ).alias("ts"),
        # hot device: ~10% of events on user 0. pmod(id,10)<1, NOT
        # id%3-style: the feed derivation thins on event_id%3, and a
        # hot rule sharing that modulus makes the whole kept corpus
        # the hot device
        F.when(F.pmod(F.col("id"), F.lit(10)) < 1, F.lit(0))
        .otherwise(F.pmod(F.hash(F.col("id")), F.lit(15_000)))
        .cast("long")
        .alias("user_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in
                      ["click", "error", "purchase", "signup", "view"]]),
            (F.col("id") % 5 + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(F.col("id") * 7, F.lit(561))).cast("double").alias("value"),
        F.lit('{"k":1}').alias("props"),
    )
    ev.write.parquet(str(tmp_path / "events.parquet"))

    def sessions():
        acr, stb, geo = _samba_feeds(spark, str(tmp_path))
        raw = raw_viewing_events(acr, stb)
        with_panel = attribute_panels(raw, panel_windows(geo))
        return build_viewing_sessions(weighted_events(with_panel, geo))

    def checksum():
        return sessions().agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("total_duration").alias("dur"),
            F.sum(F.crc32(F.concat_ws(
                "|", "hh_id", "title", "content_id",
                F.col("session_start_ts").cast("string"),
            ))).alias("h"),
        ).collect()[0]

    confs = {
        # fixture-sized thresholds (production defaults are 256MB/
        # 64MB/1MB — same DETECTION RULE, scaled to fixture bytes)
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        # enough reduce partitions that the ~10% hot key towers over
        # the median partition (~3%); at the test session's default 8,
        # the median partition holds 12.5% of rows and a 10% key is
        # literally below median — undetectable by definition
        "spark.sql.shuffle.partitions": "32",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        probe = sessions().groupBy(
            F.spark_partition_id().alias("p")
        ).count()
        t0 = time.perf_counter()
        n_sessions = sum(r["count"] for r in probe.collect())
        t_on = time.perf_counter() - t0
        plan = probe._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
        assert n_sessions > 0

        ref_on = checksum()
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        t0 = time.perf_counter()
        ref_off = checksum()
        t_off = time.perf_counter() - t0
        assert tuple(ref_on) == tuple(ref_off)
        print(
            f"\nskew pipeline (~10% of events on one device): "
            f"{t_on:.2f}s with split, {t_off:.2f}s without; "
            f"sessions={ref_on['n']}"
        )
    finally:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark):
    """Runtime complement to the deterministic salting operators: with
    AQE skew-join on, a sort-merge join whose left side piles onto one
    hot key gets its oversized partition SPLIT at runtime (the final
    adaptive plan marks the join skew=true). Thresholds are lowered so
    the fixture-sized skew triggers the same code path a 100 TB hot
    key would."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # half the rows on one key: the hot post-shuffle partition is
        # ~4x the median, clearing the factor=2 detection bar
        left = spark.range(300_000).select(
            F.when(F.col("id") % 2 == 0, 0)
            .otherwise(F.col("id"))
            .alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(0, 50_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("rv")
        )
        # cheap projection so the collect below moves counts, not rows
        joined = (
            left.join(right, "k")
            .groupBy(F.spark_partition_id().alias("p"))
            .count()
        )
        # execute THIS df's own QueryExecution (count()/noop would
        # plan a fresh one and leave this plan isFinalPlan=false)
        assert len(joined.collect()) > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
