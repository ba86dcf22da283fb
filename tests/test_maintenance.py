"""Compaction + vacuum: content-preserving file-count reduction and
safe cleanup of crashed-swap leftovers."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from samba_tv_ingest_etl_spark.plans.backfill import Warehouse
from samba_tv_ingest_etl_spark.plans.maintenance import (
    compact_table,
    vacuum_warehouse,
)


def _parquet_files(path):
    out = []
    for root, _dirs, files in os.walk(path):
        out += [os.path.join(root, f) for f in files if f.endswith(".parquet")]
    return out


def _rows(wh, table, cols):
    return sorted(map(tuple, wh.read(table).select(*cols).collect()))


def test_compact_flat_table(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    df = spark.range(1000).select("id", (F.col("id") % 7).alias("v"))
    # simulate daily appends: many small files
    for i in range(5):
        wh.append(df.filter(F.col("id") % 5 == i).repartition(4), "t")
    before_files = len(_parquet_files(wh.path("t")))
    before_rows = _rows(wh, "t", ["id", "v"])
    assert before_files >= 20
    n = compact_table(wh, "t")
    assert n == 1000
    assert len(_parquet_files(wh.path("t"))) == 1
    assert _rows(wh, "t", ["id", "v"]) == before_rows


def test_compact_single_partition_leaves_others(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path), layout={"t": ["p"]})
    df = spark.range(400).select(
        "id", (F.col("id") % 2).alias("p")
    )
    for i in range(4):
        wh.append(
            df.filter(F.col("id") % 4 == i).repartition(3), "t"
        )
    before_rows = _rows(wh, "t", ["id", "p"])
    p1_dir = os.path.join(wh.path("t"), "p=1")
    untouched_before = {
        f: os.path.getmtime(os.path.join(p1_dir, f))
        for f in os.listdir(p1_dir)
    }
    n = compact_table(wh, "t", partition_value=0)
    assert n == 200
    # compacted partition: one file; other partition: untouched bytes
    p0_files = [
        f for f in os.listdir(os.path.join(wh.path("t"), "p=0"))
        if f.endswith(".parquet")
    ]
    assert len(p0_files) == 1
    untouched_after = {
        f: os.path.getmtime(os.path.join(p1_dir, f))
        for f in os.listdir(p1_dir)
    }
    assert untouched_after == untouched_before
    assert _rows(wh, "t", ["id", "p"]) == before_rows


def test_vacuum_removes_leftovers_keeps_orphans(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    spark.range(10).write.parquet(wh.path("live"))
    # crashed-swap debris next to a live table
    os.makedirs(wh.path("live") + "__tmp__")
    os.makedirs(wh.path("live") + "__old__")
    # leftover whose live dir is GONE: the only copy — must survive
    os.makedirs(wh.path("lost") + "__old__")
    removed = vacuum_warehouse(wh)
    assert removed == ["live__old__", "live__tmp__"]
    assert not os.path.exists(wh.path("live") + "__tmp__")
    assert os.path.exists(wh.path("lost") + "__old__")
    assert spark.read.parquet(wh.path("live")).count() == 10
