#!/usr/bin/env python
"""Per-increment cost of the incremental operators: inline re-process
vs the persisted index, across a growing standing corpus — the
measured law behind every "per-increment cost is flat" claim.

Three kinds, one protocol each (fixed work unit, index/corpus grown
~8x, inline vs at-rest columns, build-once cost reported separately):

- ``minhash`` (r10, SCALING_r10.md): fixed doc batch deduped against
  band indexes of growing size. inline = ``incremental_minhash_
  survivors`` (re-signs the index per run); at_rest = ``dedup_
  increment_against_index`` (append=False).
- ``ivf`` (r10 verdict #2): fixed vector batch SemDeDup'd against IVF
  indexes of growing size under the same codebook. inline =
  ``semdedup_increment_inline`` (re-assigns the index per run — the
  O(|index|) term); at_rest = ``semdedup_increment_against_index``
  (append=False — reads only the batch's clusters' partitions).
- ``ann_band`` (r10 verdict #1's 'done' criterion): fixed 10-query
  probe against banded-ANN indexes of growing corpus size. inline =
  ``topk_lsh_banded`` (re-signs the corpus per probe); at_rest =
  ``topk_lsh_banded_indexed`` (signs only the probe batch; key-
  pruned bands/ scan + streamed docs/ payload probe). NOTE the
  honest reading of its law: the index deletes the O(corpus)
  SIGNING term (the at-rest column), but per-probe cost stays
  O(candidates), which at the recall-first (48, 16) config is O(n)
  by construction — the flat fleet-scale probe is ``ivf_probe``.
- ``ivf_probe``: same protocol over the persisted IVF index
  (``topk_ivf_indexed`` vs inline ``topk_ivf``): with derived k the
  probed row count is ~ target · nprobe, constant in corpus size —
  the router's flat path that the banded index hands off to.
- ``decon`` (r11, SCALING_r11 §5): fixed eval set, growing corpus,
  semantic decon inline vs the payload band index.
- ``fragmentation`` (r12): sizes = APPEND COUNTS — probe wall against
  an N-append fragmented band index vs the same index after
  ``compact_index`` (content pinned identical by tests).
- ``decon_sparse`` (r12): sizes = EVAL sizes, fixed corpus — at-rest
  decon with vs without the key-literal pushdown, plus probed-key
  counts, measuring where sparse-eval row-group pruning starts to
  bite.

Best-of-N timing with the bench discipline. Output: markdown table +
one JSON line for SCALING_r{N}.md.

Usage:
    python tools/increment_cost.py [--kind minhash|ivf|ann_band]
        [--sf-dir .testdata/sf1] [--batch 2000]
        [--index-sizes 6000,12000,24000,48000] [--runs 3]
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


def _emit(rows: list[dict], sf_dir: str, kind: str) -> None:
    cols = list(rows[0]) if rows else []
    print("\n| " + " | ".join(cols) + " |")
    print("|" + "---|" * len(cols))
    for r in rows:
        print("| " + " | ".join(str(r[c]) for c in cols) + " |")
    print()
    print(json.dumps({"kind": kind, "sf_dir": sf_dir, "rows": rows}))


def run_minhash(spark, args, sizes) -> list[dict]:
    from pyspark.sql import functions as F

    from samba_tv_ingest_etl_spark.operators import dedup as D

    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    lo_batch = ids[-args.batch]
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
    return rows


def _vectors(spark, sf_dir):
    from pyspark.sql import functions as F

    from samba_tv_ingest_etl_spark.operators import similarity as S

    return (
        S.quantize(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))
        .filter(F.col("norm2") > 0)
        .select("vec_id", "q", "norm2")
        .localCheckpoint(eager=True)
    )


def run_ivf(spark, args, sizes) -> list[dict]:
    """Fixed batch, growing index, SAME codebook per index size for
    both columns (trained on the index side with the q135 config:
    derived k, bounded sample, routed assignment) — the inline
    column's growth is the per-call index re-assignment, which is
    exactly what the at-rest path deletes."""
    from pyspark.sql import functions as F

    from samba_tv_ingest_etl_spark.operators import similarity as S

    q = _vectors(spark, args.sf_dir)
    ids = sorted(r["vec_id"] for r in q.select("vec_id").collect())
    lo_batch = ids[-args.batch]
    batch = q.filter(F.col("vec_id") >= lo_batch).localCheckpoint(
        eager=True
    )
    rows = []
    for size in sizes:
        if size > len(ids) - args.batch:
            print(f"skip index size {size}: corpus too small")
            continue
        hi = ids[size - 1]
        idx_q = q.filter(F.col("vec_id") <= hi).localCheckpoint(
            eager=True
        )
        k = S.derived_cluster_count(size, 32, 16)  # q135's SemDeDup k
        t0 = time.monotonic()
        cents = S.kmeans_centroids(
            idx_q, k=k, iters=2, train_sample=(1, 4)
        )
        t_train = time.monotonic() - t0
        t_inline = _best_of(
            lambda: S.semdedup_increment_inline(
                batch, idx_q, cents, threshold_pct=35, route_width=4
            ).count(),
            args.runs,
        )
        path = tempfile.mkdtemp(prefix="inc_cost_ivf_")
        t0 = time.monotonic()
        S.write_ivf_index(idx_q, path, cents=cents, route_width=4)
        t_build = time.monotonic() - t0
        t_at_rest = _best_of(
            lambda: S.semdedup_increment_against_index(
                batch, path, threshold_pct=35, route_width=4,
                append=False,
            ).count(),
            args.runs,
        )
        shutil.rmtree(path, ignore_errors=True)
        rows.append(
            {
                "index_vecs": size,
                "k": k,
                "batch_vecs": args.batch,
                "inline_s": round(t_inline, 2),
                "at_rest_s": round(t_at_rest, 2),
                "train_once_s": round(t_train, 2),
                "build_once_s": round(t_build, 2),
            }
        )
        print(rows[-1], flush=True)
    return rows


def run_ann_band(spark, args, sizes) -> list[dict]:
    """Fixed 10-query probe, growing corpus: the inline column
    carries the O(corpus) signing term, the at-rest column reads the
    persisted band index (key-pruned)."""
    from pyspark.sql import functions as F

    from samba_tv_ingest_etl_spark.operators import similarity as S

    q = _vectors(spark, args.sf_dir)
    ids = sorted(r["vec_id"] for r in q.select("vec_id").collect())
    probes = q.filter(F.col("vec_id") < 10).localCheckpoint(eager=True)
    rows = []
    for size in sizes:
        if size > len(ids):
            print(f"skip corpus size {size}: corpus too small")
            continue
        hi = ids[size - 1]
        corp = q.filter(F.col("vec_id") <= hi).localCheckpoint(
            eager=True
        )
        t_inline = _best_of(
            lambda: S.topk_lsh_banded(corp, probes, k=10).count(),
            args.runs,
        )
        path = tempfile.mkdtemp(prefix="inc_cost_vband_")
        t0 = time.monotonic()
        S.write_vector_band_index(corp, path)
        t_build = time.monotonic() - t0
        t_at_rest = _best_of(
            lambda: S.topk_lsh_banded_indexed(
                spark, path, probes, k=10
            ).count(),
            args.runs,
        )
        shutil.rmtree(path, ignore_errors=True)
        rows.append(
            {
                "corpus_vecs": size,
                "probe_vecs": 10,
                "inline_s": round(t_inline, 2),
                "at_rest_s": round(t_at_rest, 2),
                "build_once_s": round(t_build, 2),
            }
        )
        print(rows[-1], flush=True)
    return rows


def run_ivf_probe(spark, args, sizes) -> list[dict]:
    """Fixed 10-query probe, growing corpus, IVF index: with k
    derived (k ∝ n / target) the probed row count is ~ target ·
    nprobe — CONSTANT in corpus size — so this is the flat-probe
    router path for fleet-scale ANN (the banded-LSH index deletes
    the signing term but its recall-first candidacy stays O(n));
    inline = ``topk_ivf`` (retrains + re-assigns the corpus per
    call)."""
    from pyspark.sql import functions as F

    from samba_tv_ingest_etl_spark.operators import similarity as S

    q = _vectors(spark, args.sf_dir)
    ids = sorted(r["vec_id"] for r in q.select("vec_id").collect())
    probes = q.filter(F.col("vec_id") < 10).localCheckpoint(eager=True)
    rows = []
    for size in sizes:
        if size > len(ids):
            print(f"skip corpus size {size}: corpus too small")
            continue
        hi = ids[size - 1]
        corp = q.filter(F.col("vec_id") <= hi).localCheckpoint(
            eager=True
        )
        k = S.derived_cluster_count(size, 8, 64)  # q32/q133's config
        t_inline = _best_of(
            lambda: S.topk_ivf(
                corp, probes, k=10, n_centroids=k, iters=2, nprobe=2,
                train_sample=(1, 4), route_width=4,
            ).count(),
            args.runs,
        )
        path = tempfile.mkdtemp(prefix="inc_cost_ivfp_")
        t0 = time.monotonic()
        S.write_ivf_index(
            corp, path, n_centroids=k, iters=2, train_sample=(1, 4),
            route_width=4,
        )
        t_build = time.monotonic() - t0
        t_at_rest = _best_of(
            lambda: S.topk_ivf_indexed(
                spark, path, probes, k=10, nprobe=2
            ).count(),
            args.runs,
        )
        shutil.rmtree(path, ignore_errors=True)
        rows.append(
            {
                "corpus_vecs": size,
                "k": k,
                "probe_vecs": 10,
                "inline_s": round(t_inline, 2),
                "at_rest_s": round(t_at_rest, 2),
                "build_once_s": round(t_build, 2),
            }
        )
        print(rows[-1], flush=True)
    return rows


def run_decon(spark, args, sizes) -> list[dict]:
    """Fixed eval set (every 97th vector, q123's split), growing
    corpus, semantic decontamination at the verbatim-leak config
    (τ=0.8, 4 × 8-bit bands): inline = ``contamination_matches_lsh``
    (signs the corpus per call); at_rest =
    ``contamination_matches_lsh_indexed`` against the PAYLOAD band
    index (scores in-join over key-sorted posting lists)."""
    from pyspark.sql import functions as F

    from samba_tv_ingest_etl_spark.operators import similarity as S

    q = _vectors(spark, args.sf_dir)
    ids = sorted(r["vec_id"] for r in q.select("vec_id").collect())
    is_eval = F.col("vec_id") % 97 == 0
    ev = q.filter(is_eval).localCheckpoint(eager=True)
    rows = []
    for size in sizes:
        if size > len(ids):
            print(f"skip corpus size {size}: corpus too small")
            continue
        hi = ids[size - 1]
        corp = q.filter(
            (F.col("vec_id") <= hi) & ~is_eval
        ).localCheckpoint(eager=True)
        t_inline = _best_of(
            lambda: S.contamination_matches_lsh(
                corp, ev, threshold_pct=80, planes=32, bands=4
            ).count(),
            args.runs,
        )
        path = tempfile.mkdtemp(prefix="inc_cost_decon_")
        t0 = time.monotonic()
        S.write_vector_band_index(
            corp, path, planes=32, bands=4, band_payload=True
        )
        t_build = time.monotonic() - t0
        t_at_rest = _best_of(
            lambda: S.contamination_matches_lsh_indexed(
                spark, path, ev, threshold_pct=80, planes=32, bands=4
            ).count(),
            args.runs,
        )
        shutil.rmtree(path, ignore_errors=True)
        rows.append(
            {
                "corpus_vecs": size,
                "eval_vecs": ev.count(),
                "inline_s": round(t_inline, 2),
                "at_rest_s": round(t_at_rest, 2),
                "build_once_s": round(t_build, 2),
            }
        )
        print(rows[-1], flush=True)
    return rows


def run_fragmentation(spark, args, sizes) -> list[dict]:
    """Probe wall against an N-APPEND fragmented band index vs the
    SAME index compacted (r11 verdict #1's measured row): ``sizes``
    are append counts here, not corpus sizes — the whole corpus is
    written as 1 bootstrap + N appends (the daily cadence compressed),
    so per-band file count grows with N while content is constant,
    isolating exactly the listing + row-group-overlap cost
    ``compact_index`` exists to remove. Results are pinned identical
    pre/post by tests; this measures what that identity COSTS to
    keep."""
    import os as _os

    from pyspark.sql import functions as F

    from samba_tv_ingest_etl_spark.operators import similarity as S
    from samba_tv_ingest_etl_spark.plans.maintenance import (
        compact_index,
    )

    q = _vectors(spark, args.sf_dir)
    ids = sorted(r["vec_id"] for r in q.select("vec_id").collect())
    probes = q.filter(F.col("vec_id") < 10).localCheckpoint(eager=True)
    rows = []
    for n_appends in sizes:
        bounds = [
            ids[(len(ids) * (i + 1)) // (n_appends + 1) - 1]
            for i in range(n_appends)
        ]
        path = tempfile.mkdtemp(prefix="inc_cost_frag_")
        lo = None
        for i, hi in enumerate(bounds + [None]):
            part = q
            if lo is not None:
                part = part.filter(F.col("vec_id") > lo)
            if hi is not None:
                part = part.filter(F.col("vec_id") <= hi)
            if i == 0:
                S.write_vector_band_index(part, path)
            else:
                S.append_vector_band_index(part, path)
            lo = hi
        band0 = f"{path}/bands/band=0"
        files_before = len(
            [f for f in _os.listdir(band0) if f.endswith(".parquet")]
        )

        def probe_io():
            """(files opened, MiB read) of one probe — the plan's
            post-pruning scan file set (DataFrame.inputFiles, a
            metadata-only call over bands/ + docs/). On an object
            store every opened file is >= 1 GET (footer) before any
            data range — THIS is the fragmentation cost local-disk
            walls understate (r12 verdict #4)."""
            fl = S.topk_lsh_banded_indexed(
                spark, path, probes, k=10
            ).inputFiles()
            mb = sum(
                _os.stat(f.removeprefix("file:")).st_size for f in fl
            ) / (1024 * 1024)
            return len(fl), mb

        files_frag, mb_frag = probe_io()
        t_frag = _best_of(
            lambda: S.topk_lsh_banded_indexed(
                spark, path, probes, k=10
            ).count(),
            args.runs,
        )
        t0 = time.monotonic()
        compact_index(spark, path, "vector_band")
        t_compact = time.monotonic() - t0
        files_after = len(
            [f for f in _os.listdir(band0) if f.endswith(".parquet")]
        )
        files_comp, mb_comp = probe_io()
        t_comp = _best_of(
            lambda: S.topk_lsh_banded_indexed(
                spark, path, probes, k=10
            ).count(),
            args.runs,
        )
        shutil.rmtree(path, ignore_errors=True)
        rows.append(
            {
                "appends": n_appends,
                "corpus_vecs": len(ids),
                "files_per_band_frag": files_before,
                "files_per_band_compact": files_after,
                "probe_files_frag": files_frag,
                "probe_files_compact": files_comp,
                "probe_mb_frag": round(mb_frag, 1),
                "probe_mb_compact": round(mb_comp, 1),
                "probe_frag_s": round(t_frag, 2),
                "probe_compact_s": round(t_comp, 2),
                "compact_once_s": round(t_compact, 2),
            }
        )
        print(rows[-1], flush=True)
    return rows


def run_maintain(spark, args, sizes) -> list[dict]:
    """Nightly-maintenance cost at constant corpus with daily appends,
    GATED vs UNGATED (r12 verdict #1's measured row): ``sizes`` are
    night counts — the corpus is written as 1 bootstrap + N appends,
    and after EVERY append a maintenance pass runs. Ungated
    (``only_if_over=0``) that pass rewrites the whole index each
    night — O(index·N) total; gated (``only_if_over=8``, the shipped
    default) it rewrites only when a partition's file count exceeds
    the gate — O(index·N/8) total, with ~7 of 8 nights listing-only.
    Columns: total maintenance wall across the N nights, nights that
    actually rewrote, and the final per-band file count (the probe
    cost the gate trades: at most gate+1 file sets vs always 1)."""
    import os as _os

    from pyspark.sql import functions as F

    from samba_tv_ingest_etl_spark.operators import similarity as S
    from samba_tv_ingest_etl_spark.plans.maintenance import (
        compact_index,
    )

    q = _vectors(spark, args.sf_dir)
    ids = sorted(r["vec_id"] for r in q.select("vec_id").collect())
    rows = []
    for n_nights in sizes:
        if n_nights < 1:
            print(f"skip nights={n_nights}: need >= 1")
            continue
        bounds = [
            ids[(len(ids) * (i + 1)) // (n_nights + 1) - 1]
            for i in range(n_nights)
        ]
        out = {"nights": n_nights, "corpus_vecs": len(ids)}
        for mode, gate in (("gated", 8), ("ungated", 0)):
            path = tempfile.mkdtemp(prefix=f"inc_cost_maint_{mode}_")
            S.write_vector_band_index(
                q.filter(F.col("vec_id") <= bounds[0]), path
            )
            total, rewrites = 0.0, 0
            lo = bounds[0]
            for hi in bounds[1:] + [None]:
                part = q
                if lo is not None:
                    part = part.filter(F.col("vec_id") > lo)
                if hi is not None:
                    part = part.filter(F.col("vec_id") <= hi)
                S.append_vector_band_index(part, path)
                t0 = time.monotonic()
                counts = compact_index(
                    spark, path, "vector_band", only_if_over=gate
                )
                total += time.monotonic() - t0
                if any(v > 0 for v in counts.values()):
                    rewrites += 1
                lo = hi
            band0 = f"{path}/bands/band=0"
            out[f"{mode}_total_s"] = round(total, 2)
            out[f"{mode}_rewrote_nights"] = rewrites
            out[f"{mode}_final_files_band0"] = len(
                [f for f in _os.listdir(band0) if f.endswith(".parquet")]
            )
            shutil.rmtree(path, ignore_errors=True)
        rows.append(out)
        print(rows[-1], flush=True)
    return rows


def run_components(spark, args, sizes) -> list[dict]:
    """Union-find-at-rest increment law (r13): ``sizes`` are BASE
    GRAPH node counts — for each, bootstrap the at-rest components
    state from a deterministic random graph of that size, then fold
    in a CONSTANT ``--batch``-edge increment two ways:

    - ``increment_s``: ``components_increment`` against the persisted
      state — the claim under test is that this is O(batch), flat in
      base-graph size (bucket-pruned endpoint lookup + CC over the
      label graph only);
    - ``wholesale_s``: ``connected_components`` over base+batch — the
      rerun-everything wall it replaces, expected to grow with size.

    Plus ``read_s`` (log-resolved full read — the consumer's scan) and
    ``bootstrap_s`` (one-time). Graph shape: nodes 0..N-1, 2N edges
    (i, xxhash64(i, salt) % N) — mixed component sizes, deterministic;
    batch edges attach one NEW node each (ids N..N+batch-1) to an
    existing one — the daily-arrival shape; --bridge swaps in
    cross-component merge edges instead."""
    from pyspark.sql import functions as F

    from samba_tv_ingest_etl_spark.operators import components as C

    def graph(n, m_per=2):
        e = None
        for salt in range(m_per):
            part = spark.range(n).select(
                F.col("id").alias("src"),
                F.pmod(
                    F.xxhash64(F.col("id"), F.lit(salt)), F.lit(n)
                ).alias("dst"),
            )
            e = part if e is None else e.unionByName(part)
        return e.filter(F.col("src") != F.col("dst"))

    rows = []
    for size in sizes:
        base = graph(size).localCheckpoint(eager=True)
        nb = args.batch
        if getattr(args, "bridge", False):
            # bridge shape: every batch edge joins two EXISTING nodes
            # — the heavy-merge path (each edge can merge two
            # established components, so the remap log and the label
            # graph carry real work), vs the arrival shape where each
            # edge attaches one NEW node
            batch = (
                spark.range(nb)
                .select(
                    F.pmod(
                        F.xxhash64(F.col("id"), F.lit(101)),
                        F.lit(size),
                    ).alias("src"),
                    F.pmod(
                        F.xxhash64(F.col("id"), F.lit(202)),
                        F.lit(size),
                    ).alias("dst"),
                )
                .filter(F.col("src") != F.col("dst"))
                .localCheckpoint(eager=True)
            )
            nb = batch.count()  # self-loops filtered: report the real edge count
        else:
            batch = (
                spark.range(size, size + nb)
                .select(
                    F.col("id").alias("src"),
                    F.pmod(F.xxhash64(F.col("id")), F.lit(size)).alias(
                        "dst"
                    ),
                )
                .localCheckpoint(eager=True)
            )
        path = tempfile.mkdtemp(prefix="inc_cost_cc_")
        t0 = time.monotonic()
        C.write_components_state(
            C.connected_components(base), path, buckets=64
        )
        t_boot = time.monotonic() - t0
        # the increment MUTATES the state: time the first application
        # once (the honest daily cost), then the replays best-of —
        # a replay finds labels merged and nodes present, so its
        # wall is the no-op floor (also worth knowing)
        t0 = time.monotonic()
        C.components_increment(spark, path, batch)
        t_inc = time.monotonic() - t0
        t_replay = _best_of(
            lambda: C.components_increment(spark, path, batch),
            args.runs,
        )
        t_read = _best_of(
            lambda: C.read_components_state(spark, path).count(),
            args.runs,
        )
        t_whole = _best_of(
            lambda: C.connected_components(
                base.unionByName(batch)
            ).count(),
            args.runs,
        )
        shutil.rmtree(path, ignore_errors=True)
        rows.append(
            {
                "base_nodes": size,
                "batch_edges": nb,
                "increment_s": round(t_inc, 2),
                "replay_noop_s": round(t_replay, 2),
                "read_s": round(t_read, 2),
                "wholesale_s": round(t_whole, 2),
                "bootstrap_once_s": round(t_boot, 2),
            }
        )
        print(rows[-1], flush=True)
    return rows


def run_decon_sparse(spark, args, sizes) -> list[dict]:
    """The sparse-eval pruning claim, measured (r11 verdict #6):
    SCALING_r11 §5 stated that the payload index's key-literal
    pushdown prunes the bands/ scan only for SPARSE evals (a
    benchmark-sized eval covers all 256 key values per band, so the
    filter passes everything). ``sizes`` are EVAL sizes here; the
    corpus is fixed at the full sf-dir. Columns: at-rest wall WITH
    the key pushdown vs WITHOUT it (``push_key_literals=False`` —
    same join, same output, the filter is optimization-only), plus
    the probed-key count vs the 256·bands key space, so the
    crossover where pruning starts to bite is a table, not a
    docstring clause."""
    from pyspark.sql import functions as F

    from samba_tv_ingest_etl_spark.operators import similarity as S

    q = _vectors(spark, args.sf_dir)
    is_eval = F.col("vec_id") % 97 == 0
    ev_all = q.filter(is_eval).localCheckpoint(eager=True)
    corp = q.filter(~is_eval).localCheckpoint(eager=True)
    path = tempfile.mkdtemp(prefix="inc_cost_sparse_")
    t0 = time.monotonic()
    S.write_vector_band_index(
        corp, path, planes=32, bands=4, band_payload=True
    )
    t_build = time.monotonic() - t0
    rows = []
    for n_eval in sizes:
        ev = (
            ev_all.orderBy("vec_id").limit(n_eval)
            .localCheckpoint(eager=True)
        )
        keys = (
            S.lsh_buckets(ev.select("vec_id", "q", "norm2"), 32, 64)
            .select(
                F.posexplode(
                    F.array(*S._band_keys(32, 4))
                ).alias("band", "key")
            )
            .select("key")
            .distinct()
            .count()
        )
        t_pruned = _best_of(
            lambda: S.contamination_matches_lsh_indexed(
                spark, path, ev, threshold_pct=80, planes=32, bands=4
            ).count(),
            args.runs,
        )
        t_unpruned = _best_of(
            lambda: S.contamination_matches_lsh_indexed(
                spark, path, ev, threshold_pct=80, planes=32, bands=4,
                push_key_literals=False,
            ).count(),
            args.runs,
        )
        rows.append(
            {
                "eval_vecs": n_eval,
                "corpus_vecs": corp.count(),
                "distinct_keys": keys,
                "key_space": 256,
                "pruned_s": round(t_pruned, 2),
                "unpruned_s": round(t_unpruned, 2),
                "build_once_s": round(t_build, 2),
            }
        )
        print(rows[-1], flush=True)
    shutil.rmtree(path, ignore_errors=True)
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--kind", default="minhash",
        choices=["minhash", "ivf", "ann_band", "ivf_probe", "decon",
                 "fragmentation", "decon_sparse", "maintain", "components"],
    )
    ap.add_argument("--sf-dir", default=".testdata/sf1")
    ap.add_argument("--batch", type=int, default=2000)
    ap.add_argument(
        "--index-sizes", default="6000,12000,24000,48000"
    )
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--bridge", action="store_true",
                    help="components kind: batch edges bridge "
                    "EXISTING nodes (heavy-merge path) instead of "
                    "attaching new ones")
    args = ap.parse_args()
    sizes = [int(s) for s in args.index_sizes.split(",")]

    from samba_tv_ingest_etl_spark.session import get_spark

    spark = get_spark(
        "increment_cost",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    spark.sparkContext.setLogLevel("ERROR")
    runner = {
        "minhash": run_minhash,
        "ivf": run_ivf,
        "ann_band": run_ann_band,
        "ivf_probe": run_ivf_probe,
        "decon": run_decon,
        "components": run_components,
        "fragmentation": run_fragmentation,
        "decon_sparse": run_decon_sparse,
        "maintain": run_maintain,
    }[args.kind]
    _emit(runner(spark, args, sizes), args.sf_dir, args.kind)


if __name__ == "__main__":
    main()
