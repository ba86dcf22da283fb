"""Corpus-hygiene operators for LLM training pipelines:
benchmark decontamination and boilerplate detection.

Beyond-reference surface (the reference pipeline stops at audience
modelling; a training-data pipeline over the same engine needs these
— SURVEY §7 phase 5 extension), built entirely from JVM-side
``pyspark.sql.functions`` on top of the tokenize/shingle primitives
in ``operators/text.py``.

Scale designs:

- ``contamination``: the eval set is benchmark-sized (thousands of
  docs) against a 100 TB corpus, so its exploded n-gram side is
  broadcast — the corpus never shuffles. Per-(doc, eval) overlap
  counts partial-aggregate map-side; fan-out per corpus n-gram is
  bounded by the number of eval docs containing it, so there is no
  hot-key hazard to cap (unlike the jaccard self-join, where both
  sides are corpus-sized).
- ``boilerplate_chunks``: chunk document-frequency counts shuffle
  64-hex sha2 digests, never chunk text (same trick as
  ``dedup.exact_dedup`` — the shuffle payload is what kills
  full-text groupBys at scale). The boilerplate digest set joins
  back without a broadcast hint: its size depends on the corpus, so
  AQE picks the strategy from runtime stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens, word_shingles

__all__ = ["contamination", "boilerplate_chunks"]


def contamination(
    docs: DataFrame,
    evals: DataFrame,
    ngram: int = 5,
    min_shared: int = 1,
) -> DataFrame:
    """Flag training docs overlapping an evaluation set: returns
    (``doc_id``, ``eval_id``, ``shared_ngrams``) for every pair
    sharing at least ``min_shared`` DISTINCT word n-grams.

    ``docs``: (doc_id, text). ``evals``: (eval_id, text). Shingles
    are per-doc distinct (``word_shingles``), so the join-then-count
    is an exact distinct-overlap count without a distinct shuffle.
    """
    d = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    dx = d.select(
        "doc_id",
        F.explode(word_shingles(F.col("toks"), ngram)).alias("g"),
    )
    e = evals.select("eval_id", tokens(F.col("text")).alias("toks"))
    ex = e.select(
        "eval_id",
        F.explode(word_shingles(F.col("toks"), ngram)).alias("g"),
    )
    return (
        dx.join(F.broadcast(ex), "g")
        .groupBy("doc_id", "eval_id")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_ngrams"))
        .filter(F.col("shared_ngrams") >= min_shared)
    )


def boilerplate_chunks(
    docs: DataFrame,
    chunk: int = 8,
    min_df: int = 3,
) -> DataFrame:
    """Per-document boilerplate measurement over fixed-width token
    chunks — the deterministic analog of line-based boilerplate
    removal for corpora without line structure. A chunk appearing in
    at least ``min_df`` distinct documents is boilerplate; each doc
    reports how much of it is made of such chunks.

    Returns (``doc_id``, ``n_chunks``, ``n_boiler_chunks``,
    ``boiler_ppm``) for docs with at least one full chunk.
    ``boiler_ppm`` is floor-scaled parts-per-million (hash-stable
    across engines).
    """
    toked = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    # non-overlapping windows; docs shorter than one chunk drop out.
    # The size guard comes FIRST: sequence(0, stop) with stop < 0
    # produces a DESCENDING [0, -1] in Spark, not an empty array.
    chunks = toked.filter(F.size("toks") >= chunk).select(
        "doc_id",
        F.transform(
            F.sequence(
                F.lit(0), F.floor(F.size("toks") / chunk).cast("int") - 1
            ),
            lambda i: F.concat_ws(
                " ", F.slice("toks", i * chunk + 1, chunk)
            ),
        ).alias("chunks"),
    )
    inst = chunks.select(
        "doc_id", F.explode("chunks").alias("_chunk")
    ).select("doc_id", F.sha2(F.col("_chunk"), 256).alias("cid"))
    # document frequency over distinct (doc, chunk) — dedup first so
    # the count needs no count-distinct expansion
    dfs = (
        inst.distinct()
        .groupBy("cid")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
        .select("cid")
    )
    # flag-join instead of semi-join + second aggregation: every doc's
    # totals and boilerplate counts come out of ONE doc_id shuffle
    marked = inst.join(
        dfs.withColumn("_hot", F.lit(1)), "cid", "left"
    )
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum(F.coalesce("_hot", F.lit(0))).cast("long").alias(
            "n_boiler_chunks"
        ),
    ).select(
        "doc_id",
        "n_chunks",
        "n_boiler_chunks",
        F.floor(
            F.col("n_boiler_chunks") * F.lit(1_000_000) / F.col("n_chunks")
        )
        .cast("long")
        .alias("boiler_ppm"),
    )
