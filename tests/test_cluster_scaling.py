"""Corpus-size-derived cluster counts (VERDICT r2 #4): SemDeDup/IVF
k must scale with n so per-cluster pair candidates stay bounded, and
the SQL oracle must derive the IDENTICAL k from count(*)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from samba_tv_ingest_etl_spark.operators.similarity import (
    derived_cluster_count,
    ivf_assign,
    kmeans_centroids,
)
from samba_tv_ingest_etl_spark.queries.llmdata import (
    _IVF_KMIN,
    _IVF_SAMPLE,
    _IVF_TARGET,
    _SEM_KMIN,
    _SEM_TARGET,
    _embeddings_q,
)

from .conftest import SF_DIR


def test_formula_matches_sql_exactly():
    """The Python derivation and the oracle's GREATEST/intdiv SQL must
    agree on every n — integer-exact, no float sqrt divergence."""
    con = duckdb.connect()
    for kmin, target in [(_IVF_KMIN, _IVF_TARGET), (_SEM_KMIN, _SEM_TARGET), (1, 1), (5, 7)]:
        for n in [0, 1, target - 1, target, target + 1, 2 * target,
                  499, 500, 501, 2000, 123_456, 10**9]:
            sql = con.execute(
                f"SELECT GREATEST({kmin}, ({n} + {target} - 1) // {target})"
            ).fetchone()[0]
            assert derived_cluster_count(n, kmin, target) == sql, (n, kmin, target)


def test_formula_bounds_and_backcompat():
    # mean cluster size <= target is guaranteed: k * target >= n
    for n in [1, 100, 500, 2000, 10**6, 10**12]:
        k = derived_cluster_count(n, _SEM_KMIN, _SEM_TARGET)
        assert k * _SEM_TARGET >= n
        assert k >= _SEM_KMIN
    # monotone in n (more data never means fewer clusters)
    ks = [derived_cluster_count(n, _IVF_KMIN, _IVF_TARGET)
          for n in range(0, 5000, 37)]
    assert ks == sorted(ks)
    # the historical fixture constants are reproduced at n=500, so the
    # derivation changes nothing at the driver's sf0.01 corpora
    assert derived_cluster_count(500, _IVF_KMIN, _IVF_TARGET) == 8
    assert derived_cluster_count(500, _SEM_KMIN, _SEM_TARGET) == 32
    # ...and grows at sf0.1 (n=2000)
    assert derived_cluster_count(2000, _IVF_KMIN, _IVF_TARGET) == 32
    assert derived_cluster_count(2000, _SEM_KMIN, _SEM_TARGET) == 125
    with pytest.raises(ValueError):
        derived_cluster_count(-1, 8, 64)
    with pytest.raises(ValueError):
        derived_cluster_count(10, 0, 64)


def test_per_cluster_candidates_bounded(spark):
    """Empirical bound on the engine's own assignment: with derived k
    the within-cluster pair-candidate total must collapse versus
    all-pairs (the SemDeDup scale claim), and the mean cluster size
    must respect the target."""
    q = _embeddings_q(spark, SF_DIR)
    n = q.count()
    k = derived_cluster_count(n, _SEM_KMIN, _SEM_TARGET)
    cents = kmeans_centroids(
        q, k=k, iters=2, dim=64, train_sample=_IVF_SAMPLE
    )
    sizes = [
        r["c"]
        for r in ivf_assign(q, cents)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ]
    assert sum(sizes) == n
    assert sum(sizes) / len(sizes) <= _SEM_TARGET  # guaranteed by k
    # pair candidates: sum nc*(nc-1)/2 far below all-pairs n*(n-1)/2.
    # k-means clusters skew, so per-cluster sizes vary — the bound
    # that must hold structurally is on the TOTAL candidate mass.
    cand = sum(s * (s - 1) // 2 for s in sizes)
    assert cand <= (n * (n - 1) // 2) // 4

# ---------------------------------------------------------------------
# Two-level routed assignment (VERDICT r3 #2): with k ∝ n, the flat
# nearest-centroid pass is O(n·k) = O(n²/target); routing through
# ⌈√k⌉ coarse cells makes it O(n·√k) and must stay oracle-exact.


def test_coarse_count_matches_sql_exactly():
    """Python ``derived_coarse_count`` (math.isqrt) and the oracle's
    floor(sqrt)+integer-CASE fixup must agree on every k."""
    from samba_tv_ingest_etl_spark.operators.similarity import (
        derived_coarse_count,
    )

    con = duckdb.connect()
    ks = list(range(1, 200)) + [
        313, 1250, 9999, 10_000, 10_001, 10**6, 10**6 + 1, 10**12,
        10**12 + 1, (10**6 - 1) ** 2, (10**6 - 1) ** 2 + 1,
    ]
    for k in ks:
        sql = con.execute(f"""
            SELECT GREATEST(1, CASE
                     WHEN s - 1 >= 1 AND (s - 1) * (s - 1) >= k THEN s - 1
                     WHEN s * s >= k THEN s
                     ELSE s + 1 END)
            FROM (SELECT {k} AS k,
                         CAST(floor(sqrt(CAST({k} AS DOUBLE))) AS BIGINT) AS s)
        """).fetchone()[0]
        got = derived_coarse_count(k)
        assert got == sql, (k, got, sql)
        assert got * got >= k and (got - 1) * (got - 1) < k
    with pytest.raises(ValueError):
        derived_coarse_count(0)


def test_routed_assignment_totality_and_agreement(spark):
    """Routed assignment must (a) assign EVERY vector to a live
    cluster, (b) be deterministic, (c) degenerate to the exact flat
    argmin when route_width covers every coarse cell."""
    from samba_tv_ingest_etl_spark.operators.similarity import (
        _assign_pandas,
        _assign_pandas_routed,
        coarse_route,
        quantize,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = quantize(emb).filter(F.col("norm2") > 0).cache()
    n = q.count()
    k = derived_cluster_count(n, _SEM_KMIN, _SEM_TARGET)
    cents = kmeans_centroids(
        q, k=k, iters=2, dim=64, train_sample=_IVF_SAMPLE
    )
    from samba_tv_ingest_etl_spark.queries.llmdata import _ROUTE_WIDTH

    route = coarse_route(cents)
    routed = _assign_pandas_routed(q, cents, route, _ROUTE_WIDTH, keep=[])
    rows = {r["vec_id"]: r["cluster"] for r in routed.collect()}
    assert len(rows) == n  # total: nobody lost to an empty cell
    assert set(rows.values()) <= set(cents)
    rows2 = {
        r["vec_id"]: r["cluster"]
        for r in _assign_pandas_routed(
            q, cents, route, _ROUTE_WIDTH, keep=[]
        ).collect()
    }
    assert rows == rows2  # deterministic
    # route everywhere -> exact flat argmin, bit for bit
    full_rw = len(route[0])
    wide = {
        r["vec_id"]: r["cluster"]
        for r in _assign_pandas_routed(
            q, cents, route, full_rw, keep=[]
        ).collect()
    }
    flat = {
        r["vec_id"]: r["cluster"]
        for r in _assign_pandas(q, cents, keep=[]).collect()
    }
    assert wide == flat
    # rw=_ROUTE_WIDTH agrees with exact argmin on the vast majority
    agree = sum(1 for v, c in rows.items() if flat[v] == c)
    assert agree / n >= 0.9, f"routing agreement {agree}/{n}"
    q.unpersist()


def test_derived_block_count_bounds():
    """Block count for the exact all-pairs kernel must grow with the
    corpus so a block-pair task's dot matrix stays ~target² — the
    fixed default is fixture-scale only."""
    import pytest

    from samba_tv_ingest_etl_spark.operators.similarity import (
        TARGET_BLOCK_ROWS, derived_block_count,
    )

    assert derived_block_count(0) == 16          # kmin floor
    assert derived_block_count(2_000) == 16      # fixture sizes keep 16
    assert derived_block_count(200_000) == -(-200_000 // TARGET_BLOCK_ROWS)
    # per-block membership never exceeds target (mean bound)
    for n in (1, 10_000, 65_536, 200_000, 5_000_000):
        b = derived_block_count(n)
        assert n / b <= TARGET_BLOCK_ROWS
    with pytest.raises(ValueError):
        derived_block_count(-1)


def test_imatmul_exactness_at_bounds():
    """_imatmul (float64 BLAS) must equal the naive int64 matmul
    bit-for-bit, including at the magnitude bounds the engine
    actually uses (QUANT=1000 vectors, 2^30 hyperplane weights), and
    must refuse inputs whose dot could round (> 2^53)."""
    import numpy as np
    import pytest

    from samba_tv_ingest_etl_spark.operators.similarity import _imatmul

    rng = np.random.RandomState(7)
    # engine-shaped: quantized vectors x quantized vectors
    A = rng.randint(-1000, 1001, size=(37, 64)).astype(np.int64)
    B = rng.randint(-1000, 1001, size=(29, 64)).astype(np.int64)
    assert (_imatmul(A, B.T) == A @ B.T).all()
    # engine-shaped: quantized vectors x hyperplane weights (2^30)
    W = rng.randint(-(1 << 30), 1 << 30, size=(8, 64)).astype(np.int64)
    assert (_imatmul(A, W.T) == A @ W.T).all()
    # adversarial: max-magnitude entries right at the guard boundary
    m = (2**53 - 1) // (4 * 1_000_000)  # dim=4, |B|<=1e6
    A2 = np.full((3, 4), m, dtype=np.int64)
    B2 = np.full((5, 4), 1_000_000, dtype=np.int64)
    assert (_imatmul(A2, B2.T) == A2 @ B2.T).all()
    # over the bound -> loud refusal, never a silent rounding.
    # OverflowError, not AssertionError: the guard must survive
    # `python -O` (asserts are stripped there).
    with pytest.raises(OverflowError):
        _imatmul(A2 * 2, B2.T)


# ---------------------------------------------------------------------
# Graceful oversized-cluster handling (VERDICT r5 #4): max_cluster_rows
# must not be job-fatal at fleet scale — on_oversized='split' shards a
# degenerate cluster across block-pair tasks and must reproduce the
# unsplit prune BIT-FOR-BIT (same drops, same n_dominators, same
# max_cos_scaled).


def _semdedup(spark, **kw):
    from samba_tv_ingest_etl_spark.operators.similarity import (
        semdedup_drops,
    )

    q = _embeddings_q(spark, SF_DIR)
    # tau=0.35: q76's threshold, which the fixture corpus is built to
    # trip (0.80 yields no drops here and a vacuous test)
    return semdedup_drops(
        q, threshold_pct=35, n_centroids=4, iters=2, dim=64, **kw
    )


def test_split_prune_equals_unsplit_reference(spark):
    ref = sorted(tuple(r) for r in _semdedup(spark).collect())
    assert ref, "fixture produced no semantic dups — vacuous test"
    # cap far below the biggest cluster (500 vectors, 4 centroids ->
    # clusters of ~125): every cluster shards into multiple blocks
    split = sorted(
        tuple(r)
        for r in _semdedup(
            spark, max_cluster_rows=20, on_oversized="split"
        ).collect()
    )
    assert split == ref
    # a cap even below the BLOCK-pair group bound still agrees (more
    # blocks, same partials)
    split7 = sorted(
        tuple(r)
        for r in _semdedup(
            spark, max_cluster_rows=7, on_oversized="split"
        ).collect()
    )
    assert split7 == ref


def test_split_mode_noop_when_nothing_oversized(spark):
    ref = sorted(tuple(r) for r in _semdedup(spark).collect())
    same = sorted(
        tuple(r) for r in _semdedup(spark, on_oversized="split").collect()
    )
    assert same == ref


def test_oversized_raise_mode_names_the_cluster(spark):
    import pytest

    with pytest.raises(Exception, match="max_cluster_rows"):
        _semdedup(spark, max_cluster_rows=20).collect()
    with pytest.raises(ValueError, match="on_oversized"):
        _semdedup(spark, on_oversized="explode")
