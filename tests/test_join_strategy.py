"""Candidate self-joins must stay sort-merge (optimization r13, C6).

The pair-generation family joins two projections of the SAME
exploded/banded corpus; on a fixture-sized corpus the planner's
statistics would pick BroadcastHashJoin — a serial single-thread
hash-relation build here and an executor OOM at fleet size, because
neither side ever "fits" at scale. The operators pin the strategy
with hint("merge"); these tests pin the hint (a regression to the
stats-driven pick would pass every value-level oracle at fixture
scale and only fail in production).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from samba_tv_ingest_etl_spark.operators import dedup as D

from .conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
    )


def test_overlap_pairs_candidate_join_is_sort_merge(spark):
    sh = D.shingle_docs(_docs(spark), ngram=3)
    pairs = D.jaccard_pairs(sh, threshold_pct=50, stop_shingle_df=50)
    plan = _plan(pairs)
    assert "SortMergeJoin" in plan, plan


def test_minhash_band_join_is_sort_merge(spark):
    sh = D.shingle_docs(_docs(spark), ngram=3)
    signed = D.minhash_signatures(sh, hash_mode="sha2")
    pairs = D.minhash_lsh_pairs(signed, threshold_pct=50)
    plan = _plan(pairs)
    assert "SortMergeJoin" in plan, plan


def test_simhash_band_join_is_sort_merge(spark):
    fps = D.simhash_fingerprints(_docs(spark))
    pairs = D.simhash_pairs(fps, max_hamming=3)
    plan = _plan(pairs)
    assert "SortMergeJoin" in plan, plan
