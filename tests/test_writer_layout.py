"""Clustered writer: partition pruning reaches the scan, files are
sorted so row-group stats are tight, and file counts stay bounded."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from samba_tv_ingest_etl_spark.sources.writer import write_clustered

from .conftest import SF_DIR


def _events(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    return ev.select(
        "event_id", "user_id", "event_type", F.col("ts").alias("ts")
    )


def test_partition_pruning_and_file_sort(spark, tmp_path):
    out = str(tmp_path / "clustered")
    write_clustered(
        _events(spark),
        out,
        partition_by=["event_type"],
        cluster_by=["ts"],
    )

    # one file per hive partition (no task x partition explosion)
    for d in os.scandir(out):
        if not d.name.startswith("event_type="):
            continue
        files = [
            f for f in os.listdir(d.path) if f.endswith(".parquet")
        ]
        assert len(files) == 1, (d.name, files)
        # file internally sorted on ts -> row-group stats usable
        pf = pq.ParquetFile(os.path.join(d.path, files[0]))
        mins, maxs = [], []
        idx = pf.schema_arrow.names.index("ts")
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        assert all(
            maxs[i] <= mins[i + 1] for i in range(len(mins) - 1)
        ), "row groups overlap — file not sorted"

    # equality predicate on the partition column prunes at plan time
    read = spark.read.parquet(out).filter(
        F.col("event_type") == "click"
    )
    plan = read._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    got = read.count()
    want = (
        _events(spark).filter(F.col("event_type") == "click").count()
    )
    assert got == want


def test_files_per_partition_split(spark, tmp_path):
    out = str(tmp_path / "split")
    write_clustered(
        _events(spark),
        out,
        partition_by=["event_type"],
        cluster_by=["ts"],
        files_per_partition=3,
    )
    dirs = [
        e.path
        for e in os.scandir(out)
        if e.name.startswith("event_type=")
    ]
    per_dir = [
        len([f for f in os.listdir(d) if f.endswith(".parquet")])
        for d in dirs
    ]
    assert all(n <= 3 for n in per_dir), per_dir
    # hash collisions can fuse two splits in SOME dir, but not in all
    assert sum(per_dir) > len(dirs), per_dir
    # round-trip: nothing lost
    assert (
        spark.read.parquet(out).count() == _events(spark).count()
    )


def test_sized_write_follows_data_size_not_task_count(spark, tmp_path):
    """``sized``: a small checkpointed frame coalesces to ONE output
    file regardless of its upstream partition count (guide §6 — the
    small-file problem is a write-time decision); the row content is
    untouched, and an unknown-stats frame passes through unchanged."""
    from samba_tv_ingest_etl_spark.sources.writer import sized

    df = (
        spark.range(0, 10_000, 1, 32)
        .select(F.col("id"), F.sha2(F.col("id").cast("string"), 256).alias("h"))
        .localCheckpoint(eager=True)
    )
    out = str(tmp_path / "sized")
    sized(df).write.parquet(out)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) == 1, files
    assert spark.read.parquet(out).count() == 10_000

    # unknown-stats sentinel (driver-local relation defaults to
    # Long.MaxValue): sized() must be a harmless pass-through, not a
    # py4j long-overflow crash
    local = spark.createDataFrame([(1, "a")], ["id", "v"])
    assert sized(local.localCheckpoint(eager=True)).count() == 1

    # scale-adaptive branch: with a target far below the frame's
    # estimate, the write keeps ceil(est/target) > 1 files (never
    # collapses a fleet-size index into one task)
    out2 = str(tmp_path / "sized_multi")
    est = int(
        df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    sized(df, target_est_bytes=est // 4).write.parquet(out2)
    files2 = [f for f in os.listdir(out2) if f.endswith(".parquet")]
    assert 1 < len(files2) <= 32, files2
    assert spark.read.parquet(out2).count() == 10_000


def test_band_index_bootstrap_lands_compact(spark, tmp_path):
    """A fresh MinHash band index bootstraps BELOW the maintenance
    fragmentation gate: one data file per directory/hive partition,
    not one per shuffle partition — so the first nightly ``maintain``
    no longer full-rewrites a just-built index."""
    from samba_tv_ingest_etl_spark.operators import dedup as D
    from samba_tv_ingest_etl_spark.plans.maintenance import (
        index_fragmentation,
    )

    docs = spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(F.lit(f"w{i}_"), (F.col("id") % (i + 7)))
                for i in range(12)
            ],
        ).alias("text"),
    )
    path = str(tmp_path / "bidx")
    D.write_band_index(D.shingle_docs(docs), path)
    frag = index_fragmentation(spark, path, "minhash_band")
    for comp, scopes in frag.items():
        for scope, n in scopes.items():
            assert n == 1, (comp, scope, n)
