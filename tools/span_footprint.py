#!/usr/bin/env python
"""Measure the span-dedup kernel's checkpoint storage footprint and
decide (with numbers) between the shipped gram-TEXT localCheckpoint
and a hash-only checkpoint + candidate-only gram re-derivation.

VERDICT r6 (performance section): ``duplicated_span_intervals``
localCheckpoints the gram explode WITH gram text (dedup.py) — ~k x
corpus bytes of executor-local storage at fleet scale. The proposed
alternative checkpoints only (doc_id, pos, xxhash64(gram)) — ~24
B/row — and re-derives gram text for CANDIDATE rows only (dup-
density-bounded) by joining the candidate positions back to the
token arrays and slicing ``toks[pos, pos+k)``. That trades ~8x less
checkpoint storage for one extra doc-keyed join + per-row slice on
the candidate subset. This script runs BOTH shapes at each given
scale dir, verifies their outputs are bit-identical (multiset
checksum), and reports wall seconds + checkpoint bytes (memory +
disk, attributed by RDD id diff) so the decision is measured, not
argued.

Usage:
    python tools/span_footprint.py [DIR ...]   # default: .testdata/sf1 .testdata/sf10
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from samba_tv_ingest_etl_spark.operators.dedup import (  # noqa: E402
    duplicated_span_intervals,
)
from samba_tv_ingest_etl_spark.operators.text import (  # noqa: E402
    ngram_occurrences,
)
from samba_tv_ingest_etl_spark.queries.llmdata import (  # noqa: E402
    _SPAN_K,
    _span_corpus,
)
from samba_tv_ingest_etl_spark.session import get_spark  # noqa: E402


def span_intervals_hash_ckpt(toks_df, k: int, min_count: int = 2):
    """The storage-light alternative: identical semantics to
    ``duplicated_span_intervals`` but the corpus-grain checkpoint
    carries (doc_id, pos, h) only; gram text for the exact re-count
    is re-derived for candidate rows by slicing the token arrays."""
    from pyspark.sql import Window

    gh = toks_df.select(
        "doc_id",
        F.posexplode(ngram_occurrences(F.col("toks"), k)).alias(
            "pos", "gram"
        ),
    ).select(
        "doc_id", "pos", F.xxhash64("gram").alias("h")
    ).localCheckpoint(eager=True)
    hot_h = (
        gh.groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_count)
        .select("h")
    )
    cand = gh.join(hot_h, "h").select("doc_id", "pos")
    # candidate-only gram re-derivation: doc-keyed join back to the
    # token arrays, slice [pos, pos+k) (slice is 1-indexed)
    cand_g = cand.join(toks_df, "doc_id").select(
        "doc_id",
        "pos",
        F.concat_ws(
            " ", F.slice(F.col("toks"), F.col("pos") + 1, k)
        ).alias("gram"),
    ).localCheckpoint(eager=True)  # feeds re-count + extraction
    dup_gram = (
        cand_g.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_count)
        .select("gram")
    )
    pos_df = cand_g.join(dup_gram, "gram").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    islands = pos_df.withColumn(
        "brk",
        F.when(F.col("pos") - F.lag("pos").over(w) > k, 1).otherwise(0),
    ).withColumn("island", F.sum("brk").over(w))
    return islands.groupBy("doc_id", "island").agg(
        F.min("pos").alias("p0"),
        F.max("pos").alias("p1"),
        F.count(F.lit(1)).alias("npos"),
    ).select("doc_id", "p0", "p1", "npos")


def _storage_snapshot(spark) -> dict[int, tuple[str, int, int]]:
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return {
        i.id(): (i.name(), i.memSize(), i.diskSize()) for i in infos
    }


def _checksum(df):
    """Multiset checksum of the interval rows: equal counts + equal
    decimal sums of the per-row hash imply identical result sets."""
    h = F.xxhash64(
        F.concat_ws(
            ",",
            F.col("doc_id").cast("string"),
            F.col("p0").cast("string"),
            F.col("p1").cast("string"),
            F.col("npos").cast("string"),
        )
    )
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(h.cast("decimal(38,0)")).alias("s"),
    ).collect()[0]
    return int(row["n"]), int(row["s"] or 0)


def _run(spark, make_df) -> tuple[tuple[int, int], float, int, int]:
    before = _storage_snapshot(spark)
    t0 = time.monotonic()
    df = make_df()
    chk = _checksum(df)
    wall = time.monotonic() - t0
    after = _storage_snapshot(spark)
    new = {k: v for k, v in after.items() if k not in before}
    mem = sum(v[1] for v in new.values())
    disk = sum(v[2] for v in new.values())
    # keep df referenced until snapshot is taken, then let GC own it
    del df
    return chk, wall, mem, disk


def main() -> None:
    dirs = sys.argv[1:] or [".testdata/sf1", ".testdata/sf10"]
    spark = get_spark("span-footprint")
    out = {}
    for d in dirs:
        corpus = _span_corpus(spark, d)  # checkpointed; shared input
        corpus.count()
        shipped_chk, shipped_s, shipped_mem, shipped_disk = _run(
            spark, lambda: duplicated_span_intervals(corpus, k=_SPAN_K)
        )
        hash_chk, hash_s, hash_mem, hash_disk = _run(
            spark, lambda: span_intervals_hash_ckpt(corpus, k=_SPAN_K)
        )
        out[d] = {
            "identical": shipped_chk == hash_chk,
            "n_spans": shipped_chk[0],
            "shipped_gram_text": {
                "wall_s": round(shipped_s, 2),
                "ckpt_mem_bytes": shipped_mem,
                "ckpt_disk_bytes": shipped_disk,
            },
            "hash_only": {
                "wall_s": round(hash_s, 2),
                "ckpt_mem_bytes": hash_mem,
                "ckpt_disk_bytes": hash_disk,
            },
            "storage_ratio": round(
                (shipped_mem + shipped_disk)
                / max(1, hash_mem + hash_disk),
                2,
            ),
        }
        print(f"{d}: {out[d]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
