"""Bucketed tables: the write-once-shuffle-never-again contract.

A self-join (or fact-to-fact join) on the bucket columns of two
tables bucketed the same way must run with ZERO exchanges — the scan
itself reports the hash partitioning. This is the co-location story
for repeated big joins at scale.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from samba_tv_ingest_etl_spark.sources.writer import write_bucketed


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    left = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    right = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 3 % 101).alias("w")
    )
    # force the sort-merge path: at test scale the planner would
    # broadcast (which also skips the shuffle, but doesn't exercise
    # the bucketed scan we're pinning)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(
            left, "t_bleft", ["k"], 8, path=str(tmp_path / "bl")
        )
        write_bucketed(
            right, "t_bright", ["k"], 8, path=str(tmp_path / "br")
        )
        joined = spark.table("t_bleft").join(spark.table("t_bright"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert joined.count() == 10_000
        # same join WITHOUT bucketing shuffles both sides
        plain = left.join(right, "k")
        pplan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in pplan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_bleft")
        spark.sql("DROP TABLE IF EXISTS t_bright")


def test_bucketed_aggregation_has_no_exchange(spark, tmp_path):
    df = spark.range(10_000).select(
        (F.col("id") % 500).alias("k"), F.col("id").alias("v")
    )
    try:
        write_bucketed(df, "t_bagg", ["k"], 8, path=str(tmp_path / "ba"))
        agg = spark.table("t_bagg").groupBy("k").agg(F.sum("v"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert not re.search(r"Exchange hashpartitioning", plan), plan
        assert agg.count() == 500
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bagg")
