#!/usr/bin/env python
"""Recall-vs-cost frontier for the HIERARCHICAL IVF probe width
(r12 verdict #2): ``topk_ivf_indexed_hier``'s ``probe_cells`` default
shipped as a plausible 4 — q140 pins it against q32's oracle at
benchmark shape, but no measured frontier backed the choice the way
``tools/ann_frontier.py`` derived banded ANN's (48,16). This tool
measures it.

Design: build ONE hierarchical index at the engine's derived shape
(``derived_cluster_count`` fine centroids, ``derived_coarse_count``
cells), then sweep ``probe_cells`` at the shipped ``nprobe`` and
report, per width:

- ``recall@k`` vs the brute-force exact top-k (total loss: routing
  approximation ON TOP of IVF's own nprobe approximation);
- ``flat_agree`` vs the FLAT indexed probe at the same nprobe
  (``topk_ivf_indexed``) — the routing-ONLY loss this knob controls;
  1.0 means the width already covers every query's true nprobe
  nearest centroids, i.e. wider buys nothing;
- ``sub_centroids`` — fine-codebook rows actually pulled to the
  driver (the O(probe_cells·√k) cost the hierarchy exists to bound),
  vs the flat probe's O(k) pull;
- probe wall (best of ``--runs``; at fixture scale mostly
  scheduling, the honest cost axis is ``sub_centroids``).

The flat probe itself is the exactness ceiling for this sweep
(``probe_cells=None`` is pinned identical to it by
tests/test_ivf_index.py), so ``flat_agree`` isolates exactly what the
default trades away.

Usage:
    python tools/hier_frontier.py [--sf-dir .testdata/sf1]
                                  [--probes 50] [--k 10] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

WIDTHS = [1, 2, 3, 4, 6, 8, 12, None]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=".testdata/sf1")
    ap.add_argument("--probes", type=int, default=50)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from samba_tv_ingest_etl_spark.operators import similarity as S
    from samba_tv_ingest_etl_spark.session import get_spark

    spark = get_spark(
        "hier_frontier",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")),
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
    n = emb.count()
    q = S.quantize(emb).filter(F.col("norm2") > 0).localCheckpoint(
        eager=True
    )
    probes = q.filter(F.col("vec_id") < args.probes).localCheckpoint(
        eager=True
    )
    n_probes = probes.count()

    k_cents = S.derived_cluster_count(n, 8, 64)  # the q32 derivation
    n_cells = S.derived_coarse_count(k_cents)
    nprobe = 2  # the shipped q32/q133/q140 probe depth

    path = tempfile.mkdtemp(prefix="hier_frontier_")
    t0 = time.monotonic()
    S.write_ivf_index(
        q, path, n_centroids=k_cents, iters=2, train_sample=(1, 4),
        route_width=4,
    )
    build_s = time.monotonic() - t0

    exact = (
        S.topk_bruteforce(q, probes, k=args.k)
        .select("query_id", "cand_id")
        .localCheckpoint(eager=True)
    )
    n_exact = exact.count()
    flat = (
        S.topk_ivf_indexed(spark, path, probes, k=args.k, nprobe=nprobe)
        .select("query_id", "cand_id")
        .localCheckpoint(eager=True)
    )
    n_flat = flat.count()

    def overlap(ref_df, n_ref, approx_df) -> float:
        hits = ref_df.join(
            approx_df.select("query_id", "cand_id"),
            ["query_id", "cand_id"],
            "left_semi",
        ).count()
        return hits / n_ref

    # ---- per-query covering width (the honest routing frontier) ----
    # The batch sweep below pools the UNION of all queries' routed
    # cells before per-query centroid selection, so a diverse batch
    # saturates the pool and hides the per-query routing loss (a
    # width-1 probe with 50 spread queries still pulls most cells).
    # The knob's true frontier is per query: the smallest width whose
    # cells contain the query's true nprobe nearest centroids —
    # computed exactly here (same int64 d = norm2 - 2*q.cv + cn and
    # (d, id) tie-break as _join_dist/_nearest_ids, in numpy).
    import numpy as np

    fine = spark.read.parquet(path + "/centroids").collect()
    cells_cb = S.read_ivf_cells(spark, path)
    cell_ids = np.array(sorted(cells_cb), dtype=np.int64)
    cell_mat = np.array(
        [cells_cb[int(g)] for g in cell_ids], dtype=np.int64
    )
    fine_ids = np.array([r["c"] for r in fine], dtype=np.int64)
    order = np.argsort(fine_ids)
    fine_ids = fine_ids[order]
    fine_mat = np.array(
        [fine[int(i)]["cv"] for i in order], dtype=np.int64
    )
    fine_cell = np.array(
        [fine[int(i)]["cell"] for i in order], dtype=np.int64
    )
    qrows = probes.select("vec_id", "q", "norm2").collect()
    covering = []
    for r in qrows:
        qv = np.array(r["q"], dtype=np.int64)
        n2 = int(r["norm2"])

        def dist(mat):
            return n2 - 2 * (mat @ qv) + (mat * mat).sum(axis=1)

        dc = dist(cell_mat)
        cell_rank = {
            int(cell_ids[i]): rank
            for rank, i in enumerate(
                sorted(range(len(dc)), key=lambda i: (dc[i], cell_ids[i])),
                start=1,
            )
        }
        df_ = dist(fine_mat)
        near = sorted(
            range(len(df_)), key=lambda i: (df_[i], fine_ids[i])
        )[:nprobe]
        covering.append(
            max(cell_rank[int(fine_cell[i])] for i in near)
        )
    cov = np.array(covering)
    cov_stats = {
        "p50": int(np.percentile(cov, 50)),
        "p90": int(np.percentile(cov, 90)),
        "p99": int(np.percentile(cov, 99)),
        "max": int(cov.max()),
        "covered_frac": {
            w: round(float((cov <= w).mean()), 3)
            for w in [1, 2, 3, 4, 6, 8]
        },
    }
    print(f"covering width per query (n={len(cov)}): {cov_stats}", flush=True)

    # ---- solo-probe end recall per width (exact numpy replica) ----
    # Coverage misses pick the next-best centroids, which often still
    # hold the true neighbors — so translate covering width into what
    # a SINGLE-query probe (no batch pooling) actually returns:
    # replicate the full probe in numpy — same (d, c) centroid
    # ordering, same floor(1e6·dot/sqrt(n_q·n_c)) scoring, same
    # (cos desc, cand_id asc) top-k — per width, vs brute force.
    vrows = spark.read.parquet(path + "/vectors").select(
        "vec_id", "q", "norm2", "cluster"
    ).collect()
    v_ids = np.array([r["vec_id"] for r in vrows], dtype=np.int64)
    v_mat = np.array([r["q"] for r in vrows], dtype=np.int64)
    v_n2 = np.array([r["norm2"] for r in vrows], dtype=np.int64)
    v_cl = np.array([r["cluster"] for r in vrows], dtype=np.int64)

    def topk_ids(qid, qv, n2, mask):
        dots = v_mat[mask] @ qv
        cs = np.floor(
            1e6 * dots.astype(np.float64)
            / np.sqrt(float(n2) * v_n2[mask].astype(np.float64))
        ).astype(np.int64)
        ids = v_ids[mask]
        keep = ids != qid
        ids, cs = ids[keep], cs[keep]
        order_ = np.lexsort((ids, -cs))[: args.k]
        return set(ids[order_].tolist())

    solo_widths = [1, 2, 4, 8, None]
    solo = {("None(all)" if w is None else w): [] for w in solo_widths}
    for r in qrows:
        qid, qv, n2 = int(r["vec_id"]), np.array(r["q"], np.int64), int(r["norm2"])
        truth = topk_ids(qid, qv, n2, np.ones(len(v_ids), bool))
        dc = n2 - 2 * (cell_mat @ qv) + (cell_mat * cell_mat).sum(axis=1)
        cell_order = sorted(range(len(dc)), key=lambda i: (dc[i], cell_ids[i]))
        dfine = n2 - 2 * (fine_mat @ qv) + (fine_mat * fine_mat).sum(axis=1)
        for w in solo_widths:
            pool_cells = {
                int(cell_ids[i])
                for i in cell_order[: (len(cell_order) if w is None else w)]
            }
            in_pool = np.isin(fine_cell, list(pool_cells))
            pi = np.flatnonzero(in_pool)
            pi = sorted(pi, key=lambda i: (dfine[i], fine_ids[i]))[:nprobe]
            probed_cl = {int(fine_ids[i]) for i in pi}
            mask = np.isin(v_cl, list(probed_cl))
            got = topk_ids(qid, qv, n2, mask)
            solo["None(all)" if w is None else w].append(
                len(got & truth) / max(1, len(truth))
            )
    solo_recall = {
        k_: round(float(np.mean(v)), 3) for k_, v in solo.items()
    }
    print(f"solo-probe recall@{args.k} per width: {solo_recall}", flush=True)

    rows = []
    for width in WIDTHS:
        if width is not None and width >= n_cells:
            continue  # same pull as None; keep one all-cells row
        # driver-pull cost of this width, via the probe's own stages
        gdf = S._centroid_df(spark, S.read_ivf_cells(spark, path))
        routed = S._nearest_ids(
            probes, gdf, n_cells if width is None else width
        )
        cents_sub, _ = S._read_sub_codebook(spark, path, routed)
        best = None
        for _ in range(args.runs):
            t0 = time.monotonic()
            ap_df = S.topk_ivf_indexed_hier(
                spark, path, probes, k=args.k, nprobe=nprobe,
                probe_cells=width,
            ).localCheckpoint(eager=True)
            w = time.monotonic() - t0
            best = w if best is None else min(best, w)
        rows.append(
            {
                "probe_cells": "None(all)" if width is None else width,
                "recall": round(overlap(exact, n_exact, ap_df), 3),
                "flat_agree": round(overlap(flat, n_flat, ap_df), 3),
                "routed_cells": len(routed),
                "sub_centroids": len(cents_sub),
                "wall_s": round(best, 2),
            }
        )
        print(rows[-1], flush=True)

    shutil.rmtree(path, ignore_errors=True)

    print(
        f"\ncorpus n={n}, k_cents={k_cents}, cells={n_cells}, "
        f"nprobe={nprobe}, probes={n_probes}, k={args.k}, "
        f"build_s={build_s:.1f}, flat codebook pull={k_cents} rows, "
        f"sf_dir={args.sf_dir}\n"
    )
    print(
        "| probe_cells | recall@k | flat agree | routed cells "
        "| sub-codebook rows | wall s |"
    )
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['probe_cells']} | {r['recall']} | {r['flat_agree']} "
            f"| {r['routed_cells']} | {r['sub_centroids']} "
            f"| {r['wall_s']} |"
        )
    print()
    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "n": n,
                "k_cents": k_cents,
                "n_cells": n_cells,
                "nprobe": nprobe,
                "flat_codebook_rows": k_cents,
                "covering": cov_stats,
                "solo_recall": solo_recall,
                "rows": rows,
            }
        )
    )


if __name__ == "__main__":
    main()
