"""Scan-split estimation (sources/splits.py): the metadata-only
estimate must agree with Spark's actual partitioning — at least on the
widening DECISION its callers consume — and widen_to_cores must be a
no-op (no exchange) for already-wide inputs."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from samba_tv_ingest_etl_spark.sources.splits import (
    estimated_scan_splits,
    widen_to_cores,
)

from .conftest import SF_DIR


def test_estimate_matches_actual_on_fixture_tables(spark):
    cores = spark.sparkContext.defaultParallelism
    for table in ["documents", "embeddings", "events", "lineitem"]:
        df = spark.read.parquet(f"{SF_DIR}/{table}.parquet")
        est = estimated_scan_splits(df)
        actual = df.rdd.getNumPartitions()
        # the decision the callers consume must agree exactly; the
        # raw count may differ by Spark's bin-packing edge cases
        assert (est < cores) == (actual < cores), (table, est, actual)
        assert abs(est - actual) <= 1, (table, est, actual)


def test_estimate_matches_actual_on_multifile_table(spark, tmp_path):
    p = str(tmp_path / "multi")
    spark.range(100_000).select(
        F.col("id"), F.sha2(F.col("id").cast("string"), 256).alias("s")
    ).repartition(6).write.parquet(p)
    df = spark.read.parquet(p)
    est = estimated_scan_splits(df)
    actual = df.rdd.getNumPartitions()
    assert abs(est - actual) <= 1, (est, actual)


def test_widen_only_widens(spark, tmp_path):
    cores = spark.sparkContext.defaultParallelism
    # under-split input -> exchange appears, parallelism = cores
    narrow = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    widened = widen_to_cores(narrow)
    assert widened.rdd.getNumPartitions() == cores
    # wide input (more files than cores) -> untouched plan, no exchange
    p = str(tmp_path / "wide")
    spark.range(10_000).repartition(cores * 2).write.parquet(p)
    wide = spark.read.parquet(p)
    out = widen_to_cores(wide)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Repartition" not in plan


def test_estimate_handles_non_scan_input(spark):
    # derived frames with no input files: nothing to widen, no error
    df = spark.range(10).groupBy((F.col("id") % 2).alias("k")).count()
    assert estimated_scan_splits(df) >= 1


def test_parse_bytes_units():
    from samba_tv_ingest_etl_spark.sources.splits import _parse_bytes

    assert _parse_bytes("128MB") == 128 << 20
    assert _parse_bytes("134217728b") == 128 << 20
    assert _parse_bytes("4m") == 4 << 20
    assert _parse_bytes("1024") == 1024
