#!/usr/bin/env python
"""Recall-vs-cost frontier for the ANN operators (r9 verdict #2).

q125 measured recall@10 ~5% for the shipped single-bucket 8-plane
LSH — the meter worked and what it measured is that AND-matching all
bits is near-blind in this corpus's neighbor regime (top-10 sits near
cos ~0.5, where each hyperplane bit carries little signal). This tool
measures the actual frontier so the defaults are chosen from data:

- LSH banded OR-construction (``topk_lsh_banded``) across a
  (planes, bands) grid — recall@10 vs candidate fraction (the scored
  share of the corpus per probe, the honest cost proxy: wall at
  fixture scale is scheduling noise) plus wall for reference;
- single-bucket ``topk_lsh`` (the q26 reference) as the baseline row;
- IVF (``topk_ivf``) across an nprobe grid at the q32 configuration.

Output: one markdown table per family (paste into SCALING_r10.md) and
a JSON line for tooling.

Usage:
    python tools/ann_frontier.py [--sf-dir /root/testdata/sf0.1]
                                 [--probes 50] [--k 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LSH_GRID = [
    (16, 4),
    (16, 8),
    (24, 6),
    (24, 8),
    (30, 10),
    (32, 4),
    (32, 8),
    (32, 16),
    (36, 12),
    (40, 10),
    (48, 8),
    (48, 16),
]
IVF_NPROBES = [1, 2, 4, 8, 12, 16]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--probes", type=int, default=50)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from samba_tv_ingest_etl_spark.operators import similarity as S
    from samba_tv_ingest_etl_spark.session import get_spark

    spark = get_spark("ann_frontier", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
    q = S.quantize(emb).filter(F.col("norm2") > 0).localCheckpoint(eager=True)
    n = q.count()
    probes = q.filter(F.col("vec_id") < args.probes).localCheckpoint(eager=True)
    n_probes = probes.count()

    exact = (
        S.topk_bruteforce(q, probes, k=args.k)
        .select("query_id", "cand_id")
        .localCheckpoint(eager=True)
    )
    n_exact = exact.count()

    def recall(approx_df) -> float:
        hits = exact.join(
            approx_df.select("query_id", "cand_id"),
            ["query_id", "cand_id"],
            "left_semi",
        ).count()
        return hits / n_exact

    def lsh_cand_fraction(planes: int, bands: int) -> float:
        """Distinct scored (query, cand) pairs per probe / corpus."""
        qs = S.lsh_buckets(probes, planes).select(
            F.col("vec_id").alias("query_id"),
            F.posexplode(F.array(*S._band_keys(planes, bands))).alias(
                "band", "key"
            ),
        )
        c = S.lsh_buckets(q, planes).select(
            F.col("vec_id").alias("cand_id"),
            F.posexplode(F.array(*S._band_keys(planes, bands))).alias(
                "band", "key"
            ),
        )
        pairs = (
            c.join(F.broadcast(qs), ["band", "key"])
            .filter(F.col("cand_id") != F.col("query_id"))
            .select("query_id", "cand_id")
            .distinct()
            .count()
        )
        return pairs / (n_probes * (n - 1))

    rows = []

    # baseline: the q26 single-bucket reference
    t0 = time.monotonic()
    base = S.topk_lsh(q, probes, k=args.k, planes=8).localCheckpoint(eager=True)
    w = time.monotonic() - t0
    rows.append(
        {
            "family": "lsh_single_bucket",
            "config": "planes=8 (q26)",
            "recall": round(recall(base), 3),
            "cand_fraction": round(lsh_cand_fraction(8, 1), 4),
            "wall_s": round(w, 2),
        }
    )

    for planes, bands in LSH_GRID:
        t0 = time.monotonic()
        ap_df = S.topk_lsh_banded(
            q, probes, k=args.k, planes=planes, bands=bands
        ).localCheckpoint(eager=True)
        w = time.monotonic() - t0
        rows.append(
            {
                "family": "lsh_banded",
                "config": f"planes={planes} bands={bands} r={planes // bands}",
                "recall": round(recall(ap_df), 3),
                "cand_fraction": round(lsh_cand_fraction(planes, bands), 4),
                "wall_s": round(w, 2),
            }
        )

    # IVF at the q32 derivation (kmin=8, target=64), nprobe swept
    k_cents = max(8, -(-n // 64))
    for nprobe in IVF_NPROBES:
        if nprobe > k_cents:
            continue
        t0 = time.monotonic()
        ap_df = S.topk_ivf(
            q, probes, k=args.k, n_centroids=k_cents, iters=2,
            nprobe=nprobe, train_sample=(1, 4),
        ).localCheckpoint(eager=True)
        w = time.monotonic() - t0
        rows.append(
            {
                "family": "ivf",
                "config": f"k={k_cents} nprobe={nprobe}",
                "recall": round(recall(ap_df), 3),
                "cand_fraction": round(nprobe / k_cents, 4),
                "wall_s": round(w, 2),
            }
        )

    print(f"\ncorpus n={n}, probes={n_probes}, k={args.k}, sf_dir={args.sf_dir}\n")
    print("| family | config | recall@10 | cand fraction | wall s |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['family']} | {r['config']} | {r['recall']} "
            f"| {r['cand_fraction']} | {r['wall_s']} |"
        )
    print()
    print(json.dumps({"sf_dir": args.sf_dir, "n": n, "rows": rows}))


if __name__ == "__main__":
    main()
