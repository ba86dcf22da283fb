"""Persisted IVF index: the at-rest path must be bit-identical to
the inline ``topk_ivf`` (same codebook, shared probe stage), appends
under a frozen codebook must equal a wholesale write, and the probe
must physically prune to the probed cluster partitions."""

from __future__ import annotations

import pyspark.sql.functions as F

from samba_tv_ingest_etl_spark.operators import similarity as S

SF_DIR = "/root/testdata/sf0.001"


def _corpus(spark):
    return (
        S.quantize(spark.read.parquet(SF_DIR + "/embeddings.parquet"))
        .filter(F.col("norm2") > 0)
        .localCheckpoint(eager=True)
    )


def _rows(df):
    return sorted(
        (r["query_id"], r["cand_id"], r["rank"], r["cos_scaled"])
        for r in df.collect()
    )


def test_indexed_probe_matches_inline(spark, tmp_path):
    q = _corpus(spark)
    probes = q.filter(F.col("vec_id") < 10)
    inline = S.topk_ivf(
        q, probes, k=10, n_centroids=8, iters=2, nprobe=2,
        train_sample=(1, 4), route_width=4,
    )
    path = str(tmp_path / "ivf")
    S.write_ivf_index(
        q, path, n_centroids=8, iters=2,
        train_sample=(1, 4), route_width=4,
    )
    indexed = S.topk_ivf_indexed(spark, path, probes, k=10, nprobe=2)
    assert _rows(indexed) == _rows(inline)


def test_append_equals_wholesale(spark, tmp_path):
    """Assignment is per-row given the codebook, so write(part1) +
    append(part2) must be bit-identical to write(whole) — the
    increments≡wholesale property, ported from the dedup index."""
    q = _corpus(spark)
    probes = q.filter(F.col("vec_id") < 10)
    cents = S.kmeans_centroids(q, k=8, iters=2, train_sample=(1, 4))

    whole = str(tmp_path / "whole")
    S.write_ivf_index(q, whole, cents=cents, route_width=4)

    parts = str(tmp_path / "parts")
    S.write_ivf_index(
        q.filter(F.col("vec_id") % 2 == 0), parts,
        cents=cents, route_width=4,
    )
    S.append_ivf_index(
        q.filter(F.col("vec_id") % 2 == 1), parts, route_width=4
    )

    got = S.topk_ivf_indexed(spark, parts, probes, k=10, nprobe=2)
    want = S.topk_ivf_indexed(spark, whole, probes, k=10, nprobe=2)
    assert _rows(got) == _rows(want)


def test_probe_prunes_partitions(spark, tmp_path):
    """The probed clusters' coarse cells must reach the scan as a
    PARTITION filter (directory pruning) with the cluster ids pushed
    as an in-file data filter — the physical form of 'a query
    touches nprobe partitions' under the two-level layout (the flat
    cluster-partitioned first cut measured pathological at derived
    k: 3,125 directories of tiny files at sf10, SCALING_r10)."""
    q = _corpus(spark)
    probes = q.filter(F.col("vec_id") < 2)
    path = str(tmp_path / "ivf")
    S.write_ivf_index(q, path, n_centroids=8, iters=2)
    plan = (
        S.topk_ivf_indexed(spark, path, probes, k=10, nprobe=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    assert re.search(r"PartitionFilters: \[[^\]]*cell", plan), plan[:2000]
    assert re.search(r"PushedFilters: \[[^\]]*[Ii]n\(cluster", plan), (
        plan[:2000]
    )


def test_semdedup_increment_sequential_equals_union(spark, tmp_path):
    """Two ordered increments (each appending) must equal one
    increment of their union when the first batch's ids are lower —
    the same increments≡wholesale shape the MinHash index pins."""
    q = _corpus(spark)
    cents = S.kmeans_centroids(q, k=8, iters=2, train_sample=(1, 4))
    idx_side = q.filter(F.col("vec_id") % 3 == 0)
    batch = q.filter(F.col("vec_id") % 3 != 0)
    b1 = batch.filter(F.col("vec_id") < 100)
    b2 = batch.filter(F.col("vec_id") >= 100)

    seq = str(tmp_path / "seq")
    S.write_ivf_index(idx_side, seq, cents=cents, route_width=4)
    s1 = S.semdedup_increment_against_index(
        b1, seq, threshold_pct=35, route_width=4
    )
    s2 = S.semdedup_increment_against_index(
        b2, seq, threshold_pct=35, route_width=4
    )
    got = sorted(
        r["vec_id"] for r in s1.unionByName(s2).collect()
    )

    uni = str(tmp_path / "uni")
    S.write_ivf_index(idx_side, uni, cents=cents, route_width=4)
    want = sorted(
        r["vec_id"]
        for r in S.semdedup_increment_against_index(
            batch, uni, threshold_pct=35, route_width=4
        ).collect()
    )
    assert got == want and len(want) > 0


def test_semdedup_increment_replay_identical(spark, tmp_path):
    """A replay after the append (crash window) must be
    bit-identical: the index side excludes the batch's own ids."""
    q = _corpus(spark)
    cents = S.kmeans_centroids(q, k=8, iters=2, train_sample=(1, 4))
    path = str(tmp_path / "ivf")
    S.write_ivf_index(
        q.filter(F.col("vec_id") % 3 == 0), path,
        cents=cents, route_width=4,
    )
    batch = q.filter(F.col("vec_id") % 3 != 0)
    first = sorted(
        r["vec_id"]
        for r in S.semdedup_increment_against_index(
            batch, path, threshold_pct=35, route_width=4
        ).collect()
    )
    replay = sorted(
        r["vec_id"]
        for r in S.semdedup_increment_against_index(
            batch, path, threshold_pct=35, route_width=4
        ).collect()
    )
    assert replay == first
