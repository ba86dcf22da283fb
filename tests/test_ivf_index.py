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


def test_probe_neutral_to_replayed_append(spark, tmp_path):
    """A RETRIED append (crash before the caller's ledger commit)
    leaves bit-identical duplicate rows in vectors/; the probe must
    rank as if the append ran once — without the candidate-side
    dropDuplicates(vec_id) a duplicated vector takes two row_number
    ranks and displaces a genuine neighbor (r10 advice)."""
    q = _corpus(spark)
    probes = q.filter(F.col("vec_id") < 10)
    cents = S.kmeans_centroids(q, k=8, iters=2, train_sample=(1, 4))
    once = str(tmp_path / "once")
    S.write_ivf_index(
        q.filter(F.col("vec_id") % 2 == 0), once,
        cents=cents, route_width=4,
    )
    batch = q.filter(F.col("vec_id") % 2 == 1)
    S.append_ivf_index(batch, once, route_width=4)
    want = _rows(S.topk_ivf_indexed(spark, once, probes, k=10, nprobe=2))

    twice = str(tmp_path / "twice")
    S.write_ivf_index(
        q.filter(F.col("vec_id") % 2 == 0), twice,
        cents=cents, route_width=4,
    )
    S.append_ivf_index(batch, twice, route_width=4)
    S.append_ivf_index(batch, twice, route_width=4)  # the replay
    got = _rows(S.topk_ivf_indexed(spark, twice, probes, k=10, nprobe=2))
    assert got == want


def test_prune_to_clusters_semi_join_equals_literals(spark, tmp_path):
    """Past ISIN_LITERAL_CAP the in-file cluster test switches from a
    literal IN to a broadcast semi-join; both are exact membership
    tests, so a deliberately wide cluster spread (cap forced to 1)
    must return identical rows AND keep the cell partition filter."""
    q = _corpus(spark)
    path = str(tmp_path / "ivf")
    S.write_ivf_index(q, path, n_centroids=8, iters=2)
    _, vectors = S.read_ivf_index(spark, path)
    clusters = sorted(
        r["cluster"]
        for r in vectors.select("cluster").distinct().collect()
    )
    cells = sorted(
        r["cell"] for r in vectors.select("cell").distinct().collect()
    )
    lit = S._prune_to_clusters(
        vectors, cells, clusters, isin_cap=len(clusters)
    )
    semi = S._prune_to_clusters(vectors, cells, clusters, isin_cap=1)
    key = lambda r: (r["vec_id"], r["cluster"])  # noqa: E731
    assert sorted(map(key, semi.collect())) == sorted(
        map(key, lit.collect())
    )
    plan = semi._jdf.queryExecution().executedPlan().toString()
    import re

    assert re.search(r"PartitionFilters: \[[^\]]*cell", plan), plan[:2000]
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan[:2000]


def test_codebook_guard_raises(spark, tmp_path, monkeypatch):
    """read_ivf_index must refuse a codebook past MAX_CODEBOOK_ROWS
    loudly (counted before collecting), naming the hierarchical
    successor — the MAX_TRAIN_ROWS pattern applied to the driver
    pull that grows with derived k."""
    import pytest

    q = _corpus(spark)
    path = str(tmp_path / "ivf")
    S.write_ivf_index(q, path, n_centroids=8, iters=2)
    monkeypatch.setattr(S, "MAX_CODEBOOK_ROWS", 7)
    with pytest.raises(ValueError, match="hierarchical"):
        S.read_ivf_index(spark, path)


def test_semdedup_increment_inline_matches_indexed(spark, tmp_path):
    """The measurement twin (index side assigned inline per call)
    must produce identical survivors to the at-rest path under the
    same codebook — assignment is per-row deterministic and the
    decision core is shared code."""
    q = _corpus(spark)
    cents = S.kmeans_centroids(q, k=8, iters=2, train_sample=(1, 4))
    idx_side = q.filter(F.col("vec_id") % 3 == 0)
    batch = q.filter(F.col("vec_id") % 3 != 0)
    path = str(tmp_path / "ivf")
    S.write_ivf_index(idx_side, path, cents=cents, route_width=4)
    indexed = sorted(
        r["vec_id"]
        for r in S.semdedup_increment_against_index(
            batch, path, threshold_pct=35, route_width=4, append=False
        ).collect()
    )
    inline = sorted(
        r["vec_id"]
        for r in S.semdedup_increment_inline(
            batch, idx_side, cents, threshold_pct=35, route_width=4
        ).collect()
    )
    assert inline == indexed and len(indexed) > 0


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


# ---------------------------------------------------------------------
# hierarchical codebook (r11 verdict #4): O(√k) driver pulls for probe
# and append, exactness pinned against the flat paths.


def test_hier_probe_all_cells_equals_flat(spark, tmp_path):
    """probe_cells=None routes through ALL cells, so the sub-codebook
    union is the full codebook and the hierarchical probe must equal
    the flat probe EXACTLY — the pure-plumbing identity that holds on
    any data."""
    q = _corpus(spark)
    probes = q.filter(F.col("vec_id") < 10)
    path = str(tmp_path / "ivf")
    S.write_ivf_index(q, path, n_centroids=8, iters=2, route_width=4)
    flat = _rows(S.topk_ivf_indexed(spark, path, probes, k=10, nprobe=2))
    hier = _rows(
        S.topk_ivf_indexed_hier(
            spark, path, probes, k=10, nprobe=2, probe_cells=None
        )
    )
    assert hier == flat and len(flat) > 0


def test_hier_probe_shipped_width_equals_flat(spark, tmp_path):
    """At the shipped probe width the routed cells must cover the
    true nprobe nearest centroids on the test corpus — the
    data-dependent equality q140 also pins through DuckDB."""
    q = _corpus(spark)
    probes = q.filter(F.col("vec_id") < 10)
    path = str(tmp_path / "ivf")
    S.write_ivf_index(q, path, n_centroids=8, iters=2, route_width=4)
    flat = _rows(S.topk_ivf_indexed(spark, path, probes, k=10, nprobe=2))
    hier = _rows(
        S.topk_ivf_indexed_hier(
            spark, path, probes, k=10, nprobe=2, probe_cells=4
        )
    )
    assert hier == flat and len(flat) > 0


def test_hier_sub_codebook_reads_only_probed_cells(spark, tmp_path):
    """The driver-memory contract: _read_sub_codebook must return
    centroids of exactly the requested cells, never the flat
    codebook."""
    q = _corpus(spark)
    path = str(tmp_path / "ivf")
    S.write_ivf_index(q, path, n_centroids=8, iters=2, route_width=4)
    cents_full, _ = S.read_ivf_index(spark, path)
    _, cell_of = S.coarse_route(cents_full)
    some_cell = min(cell_of.values())
    sub, sub_cells = S._read_sub_codebook(spark, path, [some_cell])
    assert set(sub_cells.values()) == {some_cell}
    assert set(sub) == {c for c, g in cell_of.items() if g == some_cell}
    assert 0 < len(sub) < len(cents_full)


def test_hier_append_equals_flat_append(spark, tmp_path):
    """append_ivf_index_hier must land bit-identical vectors/ rows to
    the flat append at the same route_width: the routed kernel only
    scores centroids in a row's routed cells, which the sub-codebook
    read covers exactly."""
    q = _corpus(spark)
    probes = q.filter(F.col("vec_id") < 10)
    half1 = q.filter(F.col("vec_id") % 2 == 0)
    half2 = q.filter(F.col("vec_id") % 2 == 1)
    flat_p = str(tmp_path / "flat")
    hier_p = str(tmp_path / "hier")
    cents = S.kmeans_centroids(q, k=8, iters=2, train_sample=(1, 4))
    S.write_ivf_index(half1, flat_p, cents=cents, route_width=4)
    S.write_ivf_index(half1, hier_p, cents=cents, route_width=4)
    S.append_ivf_index(half2, flat_p, route_width=4)
    S.append_ivf_index_hier(half2, hier_p, route_width=4)
    key = lambda r: (r["vec_id"], r["cluster"], r["cell"])  # noqa: E731
    got = sorted(
        map(key, spark.read.parquet(hier_p + "/vectors").collect())
    )
    want = sorted(
        map(key, spark.read.parquet(flat_p + "/vectors").collect())
    )
    assert got == want and len(got) > 0
    assert _rows(
        S.topk_ivf_indexed(spark, hier_p, probes, k=10, nprobe=2)
    ) == _rows(S.topk_ivf_indexed(spark, flat_p, probes, k=10, nprobe=2))


def test_hier_requires_cells_level(spark, tmp_path):
    """A pre-hierarchical index (no cells/) must raise a named error
    pointing at the rebuild path, not a path-not-found surprise."""
    import shutil

    import pytest

    q = _corpus(spark)
    path = str(tmp_path / "ivf")
    S.write_ivf_index(q, path, n_centroids=8, iters=2, route_width=4)
    shutil.rmtree(path + "/cells")
    with pytest.raises(ValueError, match="cells/"):
        S.topk_ivf_indexed_hier(spark, path, q.filter(F.col("vec_id") < 2))
