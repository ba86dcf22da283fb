"""Sequence-packing operator: two-phase global cumsum correctness
and the concat-then-chunk placement arithmetic."""

from __future__ import annotations

from pyspark.sql import functions as F

from samba_tv_ingest_etl_spark.operators.packing import (
    global_cumsum,
    pack_sequences,
)


def test_global_cumsum_matches_naive_window(spark):
    rows = [(i, (i * 37) % 11 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, ["k", "v"]).repartition(13)
    got = {
        r["k"]: r["cum_before"]
        for r in global_cumsum(df, "v", "k").collect()
    }
    acc, want = 0, {}
    for k, v in rows:
        want[k] = acc
        acc += v
    assert got == want


def test_global_cumsum_no_single_partition_exchange(spark):
    """The plan must not contain a SinglePartition exchange — the
    whole point of the two-phase shape."""
    df = spark.range(1000).select(
        F.col("id").alias("k"), F.lit(3).alias("v")
    )
    plan = (
        global_cumsum(df, "v", "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan


def test_pack_sequences_placement(spark):
    # tokens: 100, 200, 50, 300 -> starts 0, 100, 300, 350 (seq 256)
    rows = [(1, 100), (2, 200), (3, 50), (4, 300), (5, 0)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    out = {
        r["doc_id"]: (
            r["start_offset"], r["seq_first"], r["seq_last"], r["n_seqs"]
        )
        for r in pack_sequences(df, seq_len=256).collect()
    }
    assert out == {
        1: (0, 0, 0, 1),      # [0, 99]
        2: (100, 0, 1, 2),    # [100, 299] crosses the 256 cut
        3: (300, 1, 1, 1),    # [300, 349]
        4: (350, 1, 2, 2),    # [350, 649]
    }  # doc 5 (0 tokens) dropped


def test_global_cumsum_bucket_path_single_exchange(spark):
    """With a monotone bucket, the cumsum's visible cost is ONE hash
    exchange (the checkpoint hides it from the final plan, so assert
    on the pre-checkpoint stage via the full query): bucket results
    must equal the generic range-partitioned path exactly."""
    rows = [(i, (i * 13) % 9 + 1) for i in range(2000)]
    df = spark.createDataFrame(rows, ["k", "v"]).repartition(11)
    generic = {
        r["k"]: r["cum_before"]
        for r in global_cumsum(df, "v", "k").collect()
    }
    bucketed = {
        r["k"]: r["cum_before"]
        for r in global_cumsum(
            df, "v", "k", bucket_of=F.expr("k DIV 128")
        ).collect()
    }
    assert bucketed == generic
