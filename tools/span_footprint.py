#!/usr/bin/env python
"""Measure the span-dedup kernel's checkpoint storage footprint:
shipped hash-only checkpoint + candidate-only gram re-derivation vs
the legacy gram-TEXT checkpoint.

DECIDED r8 (SCALING_r8.md, run from this script): the hash-only
shape — corpus-grain checkpoint carries (doc_id, pos, xxhash64(gram))
only; gram text is re-derived for CANDIDATE rows (dup-density-
bounded) by joining positions back to the token arrays and slicing
``toks[pos, pos+k)`` — was bit-identical at sf1 AND sf10, used 1.5x
less checkpoint storage (391 MB -> 258 MB sf1; 3.90 GB -> 2.58 GB
sf10), and was FASTER (10.74 -> 6.84 s sf1; 18.47 -> 17.15 s sf10):
the per-candidate slice costs less than writing/reading gram text
through the checkpoint. ``duplicated_span_intervals`` now ships the
hash-only shape; ``span_intervals_gram_text`` below preserves the
legacy shape so the comparison stays reproducible.

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


def span_intervals_gram_text(toks_df, k: int, min_count: int = 2):
    """The LEGACY shape (shipped before r8): identical semantics to
    ``duplicated_span_intervals`` but the corpus-grain checkpoint
    carries the gram TEXT alongside (doc_id, pos, h) — ~k x corpus
    bytes — so the candidate join keeps the gram without re-deriving
    it. Kept here so the r8 decision stays reproducible."""
    from pyspark.sql import Window

    g = toks_df.select(
        "doc_id",
        F.posexplode(ngram_occurrences(F.col("toks"), k)).alias(
            "pos", "gram"
        ),
    ).withColumn(
        "h", F.xxhash64("gram")
    ).localCheckpoint(eager=True)
    hot_h = (
        g.groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_count)
        .select("h")
    )
    cand = g.join(hot_h, "h").localCheckpoint(eager=True)
    dup_gram = (
        cand.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_count)
        .select("gram")
    )
    pos_df = cand.join(dup_gram, "gram").select("doc_id", "pos")
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
        legacy_chk, legacy_s, legacy_mem, legacy_disk = _run(
            spark, lambda: span_intervals_gram_text(corpus, k=_SPAN_K)
        )
        hash_chk, hash_s, hash_mem, hash_disk = _run(
            spark, lambda: duplicated_span_intervals(corpus, k=_SPAN_K)
        )
        out[d] = {
            "identical": legacy_chk == hash_chk,
            "n_spans": legacy_chk[0],
            "legacy_gram_text": {
                "wall_s": round(legacy_s, 2),
                "ckpt_mem_bytes": legacy_mem,
                "ckpt_disk_bytes": legacy_disk,
            },
            "shipped_hash_only": {
                "wall_s": round(hash_s, 2),
                "ckpt_mem_bytes": hash_mem,
                "ckpt_disk_bytes": hash_disk,
            },
            "storage_ratio": round(
                (legacy_mem + legacy_disk)
                / max(1, hash_mem + hash_disk),
                2,
            ),
        }
        print(f"{d}: {out[d]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
