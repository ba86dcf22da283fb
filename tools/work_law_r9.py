#!/usr/bin/env python
"""Work-law measurement for the r8 scale flags (SCALING_r9.md input).

The r8 verdict flagged five headline queries whose sf1->sf10 wall
ratios (5.1-6.6x for 10x rows) had no written explanation. A wall
ratio on a fixed 32-core box conflates three things: the WORK law
(rows processed, candidate pairs generated, dot products computed),
amortization of fixed per-query overhead (~0.5-1.5 s of planning and
job setup that dominates small-sf runs), and BLAS/codegen
throughput. This tool measures the work terms directly — exact row
and candidate counts per stage, plus the closed-form dot-product
arithmetic for the clustered (IVF/SemDeDup) paths — so the scaling
report can attribute each wall ratio to a named law instead of a
guess.

Usage:
    python tools/work_law_r9.py [--dirs .testdata/sf1,.testdata/sf10]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from samba_tv_ingest_etl_spark.session import get_spark  # noqa: E402


def q22_counts(spark, sf_dir: str) -> dict:
    """MinHash band-join candidate law on the prefix corpus."""
    from samba_tv_ingest_etl_spark.operators import dedup as D
    from samba_tv_ingest_etl_spark.operators.dedup import (
        MINHASH_BANDS,
        MINHASH_PERMS,
        _banded,
    )
    from samba_tv_ingest_etl_spark.queries.llmdata import (
        _JACCARD_PCT,
        _NGRAM,
        _prefix_corpus,
    )

    corpus = _prefix_corpus(spark, sf_dir)
    sh = D.shingle_docs(corpus, ngram=_NGRAM)
    signed = D.minhash_signatures(sh, hash_mode="sha2").localCheckpoint(
        eager=True
    )
    banded = _banded(signed, MINHASH_PERMS, MINHASH_BANDS)
    a = banded.select(F.col("doc_id").alias("doc_a"), "band", "slice")
    b = banded.select(F.col("doc_id").alias("doc_b"), "band", "slice")
    cand = (
        a.join(b, ["band", "slice"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
    )
    n_docs = corpus.count()
    n_cand_raw = cand.count()  # per-bucket pair emissions
    n_cand = cand.distinct().count()  # distinct pairs to verify
    width = (
        banded.groupBy("band", "slice")
        .agg(F.count(F.lit(1)).alias("w"))
        .agg(F.max("w").alias("mx"))
        .collect()[0]["mx"]
    )
    n_pairs = D.minhash_lsh_pairs(
        signed, threshold_pct=_JACCARD_PCT
    ).count()
    return {
        "docs": n_docs,
        "bucket_pair_emissions": n_cand_raw,
        "distinct_candidates": n_cand,
        "candidates_per_doc": round(n_cand / n_docs, 2),
        "max_bucket_width": width,
        "verified_pairs": n_pairs,
    }


def q46_q117_counts(spark, sf_dir: str) -> dict:
    """Token-grain row counts: every q46/q117 stage is a linear map
    or a bounded aggregate over these."""
    from samba_tv_ingest_etl_spark.operators import text as X
    from samba_tv_ingest_etl_spark.queries.llmdata import _documents

    docs = _documents(spark, sf_dir)
    ex = docs.select(
        "doc_id", F.explode(X.tokens(F.col("text"))).alias("token")
    )
    agg = ex.agg(
        F.count(F.lit(1)).alias("occ"),
        F.count_distinct("doc_id", "token").alias("tf_rows"),
        F.count_distinct("token").alias("vocab"),
    ).collect()[0]
    return {
        "docs": docs.count(),
        "token_occurrences": agg["occ"],
        "tf_rows": agg["tf_rows"],
        "vocab": agg["vocab"],
    }


def ivf_arithmetic(n: int) -> dict:
    """Closed-form dot-product counts for the clustered paths — no
    Spark needed; these are pure functions of the corpus size and
    the constants in queries/llmdata.py."""
    from samba_tv_ingest_etl_spark.operators.similarity import (
        derived_cluster_count,
        derived_coarse_count,
    )
    from samba_tv_ingest_etl_spark.queries.llmdata import (
        _IVF_KMIN,
        _IVF_SAMPLE,
        _IVF_TARGET,
        _ROUTE_WIDTH,
        _SEM_KMIN,
        _SEM_TARGET,
    )

    out = {}
    num, den = _IVF_SAMPLE
    n_train = n * num // den
    for name, kmin, target in (
        ("q32_ivf", _IVF_KMIN, _IVF_TARGET),
        ("q76_semdedup", _SEM_KMIN, _SEM_TARGET),
    ):
        k = derived_cluster_count(n, kmin, target)
        mc = derived_coarse_count(k)
        # training: 2 Lloyd iterations, sampled rows x k centroids
        train_dots = 2 * n_train * k
        # routed assignment: mc coarse dots + ~route_width cells of
        # ~k/mc members each, per vector
        assign_dots = n * (mc + _ROUTE_WIDTH * math.ceil(k / mc))
        out[name] = {
            "n": n,
            "k": k,
            "coarse_cells": mc,
            "train_rows": n_train,
            "train_dots": train_dots,
            "assign_dots": assign_dots,
        }
    return out


def q76_pair_counts(spark, sf_dir: str) -> dict:
    """Empirical within-cluster pair candidates for SemDeDup: the
    post-assignment term the arithmetic above cannot predict (it
    depends on realized cluster sizes, not the mean)."""
    from samba_tv_ingest_etl_spark.operators.similarity import (
        coarse_route,
        derived_cluster_count,
        kmeans_centroids,
        _assign_pandas_routed,
    )
    from samba_tv_ingest_etl_spark.queries.llmdata import (
        _IVF_ITERS,
        _IVF_SAMPLE,
        _ROUTE_WIDTH,
        _SEM_KMIN,
        _SEM_TARGET,
        _embeddings_q,
    )

    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    q = _embeddings_q(spark, sf_dir)
    cents = kmeans_centroids(
        q,
        k=derived_cluster_count(n, _SEM_KMIN, _SEM_TARGET),
        iters=_IVF_ITERS,
        train_sample=_IVF_SAMPLE,
    )
    route = coarse_route(cents)
    assigned = _assign_pandas_routed(
        q, cents, route, _ROUTE_WIDTH, keep=[]
    )
    stats = (
        assigned.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("m"))
        .agg(
            F.sum(F.expr("m * (m - 1) / 2")).alias("pairs"),
            F.max("m").alias("max_m"),
            F.count(F.lit(1)).alias("live"),
        )
        .collect()[0]
    )
    return {
        "within_cluster_pairs": int(stats["pairs"]),
        "max_cluster_size": stats["max_m"],
        "live_clusters": stats["live"],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs", default=".testdata/sf1,.testdata/sf10")
    args = ap.parse_args()
    spark = get_spark("work-law")
    spark.sparkContext.setLogLevel("ERROR")
    report: dict[str, dict] = {}
    for d in args.dirs.split(","):
        label = os.path.basename(d.rstrip("/"))
        n_emb = spark.read.parquet(f"{d}/embeddings.parquet").count()
        rec = {
            "q22": q22_counts(spark, d),
            "token_grain": q46_q117_counts(spark, d),
            "ivf_arithmetic": ivf_arithmetic(n_emb),
            "q76_pairs": q76_pair_counts(spark, d),
        }
        report[label] = rec
        print(f"== {label} ==", file=sys.stderr)
        print(json.dumps(rec, indent=1), file=sys.stderr)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
