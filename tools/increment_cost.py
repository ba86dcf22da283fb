#!/usr/bin/env python
"""Per-increment cost of MinHash dedup: inline re-sign vs the
persisted band index (r9 verdict #1's 'done' criterion — show the
per-increment wall is flat in index size once the index is read at
rest, instead of growing with the O(corpus) re-sign term).

Protocol: from a corpus directory, take a FIXED batch (the last
``--batch`` docs by id) and dedup it against standing indexes of
increasing size (prefixes of the remaining corpus). For each index
size measure:

- inline: ``incremental_minhash_survivors`` (re-signs the index
  per run — r9's shipped shape);
- at_rest: ``dedup_increment_against_index`` with append=False
  against an index built ONCE by ``write_band_index`` (build time
  reported separately — it is the amortized one-time cost).

Best-of-N timing with the bench discipline. Output: markdown table +
one JSON line for SCALING_r10.md.

Usage:
    python tools/increment_cost.py [--sf-dir .testdata/sf1]
        [--batch 2000] [--index-sizes 6000,12000,24000,48000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _best_of(fn, runs: int = 3) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=".testdata/sf1")
    ap.add_argument("--batch", type=int, default=2000)
    ap.add_argument(
        "--index-sizes", default="6000,12000,24000,48000"
    )
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()
    sizes = [int(s) for s in args.index_sizes.split(",")]

    from pyspark.sql import functions as F

    from samba_tv_ingest_etl_spark.operators import dedup as D
    from samba_tv_ingest_etl_spark.session import get_spark

    spark = get_spark(
        "increment_cost",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    batch_ids = set(ids[-args.batch:])
    lo_batch = min(batch_ids)
    sh = D.shingle_docs(docs, ngram=3).localCheckpoint(eager=True)
    batch_sh = sh.filter(F.col("doc_id") >= lo_batch).localCheckpoint(
        eager=True
    )
    rows = []
    for size in sizes:
        if size > len(ids) - args.batch:
            print(f"skip index size {size}: corpus too small")
            continue
        hi = ids[size - 1]
        idx_sh = sh.filter(F.col("doc_id") <= hi).localCheckpoint(
            eager=True
        )
        t_inline = _best_of(
            lambda: D.incremental_minhash_survivors(
                batch_sh, idx_sh
            ).count(),
            args.runs,
        )
        path = tempfile.mkdtemp(prefix="inc_cost_idx_")
        t0 = time.monotonic()
        D.write_band_index(idx_sh, path)
        t_build = time.monotonic() - t0
        t_at_rest = _best_of(
            lambda: D.dedup_increment_against_index(
                batch_sh, path, append=False
            ).count(),
            args.runs,
        )
        shutil.rmtree(path, ignore_errors=True)
        rows.append(
            {
                "index_docs": size,
                "batch_docs": args.batch,
                "inline_s": round(t_inline, 2),
                "at_rest_s": round(t_at_rest, 2),
                "build_once_s": round(t_build, 2),
            }
        )
        print(rows[-1], flush=True)

    print("\n| index docs | batch | inline s | at-rest s | build-once s |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['index_docs']} | {r['batch_docs']} | {r['inline_s']} "
            f"| {r['at_rest_s']} | {r['build_once_s']} |"
        )
    print()
    print(json.dumps({"sf_dir": args.sf_dir, "rows": rows}))


if __name__ == "__main__":
    main()
