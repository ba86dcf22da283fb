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
  sides are corpus-sized). "Benchmark-sized" is ENFORCED, not
  assumed: both entry points pass the exploded eval gram frame
  through ``_checked_eval_grams`` — one eager checkpoint (the frame
  is read up to four times downstream), one count, and a loud
  ``ValueError`` past ``EVAL_GRAM_BUDGET_ROWS``. A caller whose
  eval split is corpus-proportional (the q122/q123 flaw the r8
  verdict caught in the semantic variants) fails fast with the fix
  spelled out instead of silently planning an unbounded broadcast.
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

__all__ = ["contamination", "boilerplate_chunks", "EVAL_GRAM_BUDGET_ROWS"]

# Broadcast budget for the EXPLODED eval n-gram side, in rows.
# 5M (gram, id, [size]) rows is a few hundred MB broadcast — the
# same order as dedup.EVAL_GRAM_BUDGET for the span-grain path and
# comfortably under a 1 GiB driver broadcast ceiling. An eval set
# that exceeds it is not benchmark-sized and must be capped at the
# caller (fixed id range, the q122/q123 ``_EVAL_MAX_ID`` treatment).
EVAL_GRAM_BUDGET_ROWS = 5_000_000


def _checked_eval_grams(ex: DataFrame, max_eval_grams: int) -> DataFrame:
    """Materialize the exploded eval-gram frame once and enforce the
    broadcast budget. The checkpoint is not just for the count: both
    call sites read this frame several times (vocab probe, hot
    arrays, anti-join, final join), so without it the eval tokenize →
    shingle → explode lineage re-executes per read — the same
    double-evaluation the r9 advice flagged in
    ``dedup.contaminated_span_intervals``."""
    ex = ex.localCheckpoint(eager=True)
    n = ex.count()
    if n > max_eval_grams:
        raise ValueError(
            f"eval side explodes to {n:,} n-gram rows, over the "
            f"broadcast budget of {max_eval_grams:,}. The eval set "
            "must be benchmark-sized (fixed, corpus-independent); "
            "cap the eval selection to a fixed id range "
            "(doc_id < CAP) or raise max_eval_grams deliberately."
        )
    return ex


def contamination(
    docs: DataFrame,
    evals: DataFrame,
    ngram: int = 5,
    min_shared: int = 1,
    max_eval_grams: int = EVAL_GRAM_BUDGET_ROWS,
) -> DataFrame:
    """Flag training docs overlapping an evaluation set: returns
    (``doc_id``, ``eval_id``, ``shared_ngrams``) for every pair
    sharing at least ``min_shared`` DISTINCT word n-grams.

    ``docs``: (doc_id, text). ``evals``: (eval_id, text). Shingles
    are per-doc distinct (``word_shingles``), so the join-then-count
    is an exact distinct-overlap count without a distinct shuffle.
    Both sides shingle through ``shingle_docs``' token barrier —
    without it Catalyst collapses the projections and re-inlines the
    regex tokenizer into the gram lambda (O(L²) per doc, the trap
    ``shingle_docs`` documents; re-measured here: the corpus-side
    shingle pass at sf10 dropped ~70 s -> seconds).

    NOT fully lazy: the eval-side budget check runs Spark jobs at
    CALL time (``_checked_eval_grams`` — one eager localCheckpoint
    of the exploded eval grams + one count), so the budget violation
    raises here, before any action on the returned frame (pinned by
    ``tests/test_contamination.py``), and the checkpointed eval
    blocks stay pinned in executor storage for the session. The
    CORPUS side stays lazy — eval sets are benchmark-sized by the
    enforced contract, so the eager cost is bounded and tiny.
    """
    from .dedup import shingle_docs

    dx = shingle_docs(docs, ngram=ngram).select(
        "doc_id", F.explode("shingles").alias("g")
    )
    ex = _checked_eval_grams(
        shingle_docs(evals, id_col="eval_id", ngram=ngram).select(
            F.col("doc_id").alias("eval_id"),
            F.explode("shingles").alias("g"),
        ),
        max_eval_grams,
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


def fuzzy_contamination(
    docs: DataFrame,
    evals: DataFrame,
    ngram: int = 5,
    threshold_ppm: int = 300_000,
    stop_gram_df: int | None = None,
    max_eval_grams: int = EVAL_GRAM_BUDGET_ROWS,
) -> DataFrame:
    """Jaccard-thresholded doc-vs-eval overlap (the fuzzy complement
    of ``contamination``'s raw shared-gram count): returns
    (``doc_id``, ``eval_id``, ``shared_ngrams``, ``jaccard_ppm``)
    for every pair whose DISTINCT-``ngram``-set Jaccard reaches
    ``threshold_ppm`` (integer arithmetic, ``common * 1e6 div
    union``).

    ``stop_gram_df`` is the q21/jaccard_pairs skew discipline for
    the bipartite case: grams whose CORPUS document frequency
    exceeds the cap are excluded from candidate generation (on a
    vocabulary-dense corpus, min_shared=1 candidacy is
    near-cartesian — every doc shares some gram with some eval
    item), then verification re-counts EXACTLY via per-doc /
    per-eval hot-gram arrays, so ``shared_ngrams``/``jaccard_ppm``
    are true full-set values. The only approximation is candidacy:
    a pair is missed iff it shares NO sub-cap gram.

    The bipartite shape makes the cap machinery cheap in a way the
    self-join case cannot be: only grams PRESENT IN THE EVAL SET can
    ever form a pair, so the df count, the hot set, and the hot
    arrays are all computed against the eval vocabulary — every
    broadcast here is bounded by the (tiny) eval gram set no matter
    how large or how duplicated the corpus is. (A first cut computed
    corpus-global hot sets: at sf10 that broadcast most of the gram
    vocabulary three times and ran SLOWER than uncapped — measured,
    fixed, and the restriction is result-identical because every
    shared gram is eval-present by definition.) Candidate join
    volume is bounded by cap * eval gram occurrences; the hot-array
    build is one doc-keyed aggregate over the dense eval-gram mass —
    the same cost class as the df count itself. Shingling goes
    through ``shingle_docs``' token barrier — without it Catalyst
    re-inlines the tokenizer into the gram lambda (O(L²) per doc;
    the corpus shingle pass alone measured ~70 s at sf10 with the
    collapsed projection, seconds with the barrier).

    "Tiny eval gram set" is enforced, not assumed:
    ``_checked_eval_grams`` raises past ``max_eval_grams`` exploded
    rows, so a corpus-proportional eval split fails loudly instead
    of planning an unbounded broadcast chain. As with
    ``contamination``, that check makes the call EAGER on the eval
    side: the exploded eval grams are localCheckpointed and counted
    at call time (raising before any action on the result), and the
    checkpointed blocks stay pinned in executor storage for the
    session — bounded by the same budget that gates them."""
    from .dedup import shingle_docs

    dx = shingle_docs(docs, ngram=ngram).select(
        "doc_id",
        F.col("set_size").cast("long").alias("size_d"),
        F.explode("shingles").alias("g"),
    )
    ex = _checked_eval_grams(
        shingle_docs(evals, id_col="eval_id", ngram=ngram).select(
            F.col("doc_id").alias("eval_id"),
            F.col("set_size").cast("long").alias("size_e"),
            F.explode("shingles").alias("g"),
        ),
        max_eval_grams,
    )
    hot_e = None
    hot_d = None
    if stop_gram_df is not None:
        # df count + candidacy probe + hot arrays all read the gram
        # table; materialize it once (GC-owned)
        dx = dx.localCheckpoint(eager=True)
        eval_vocab = ex.select("g").distinct()
        hot = (
            dx.join(F.broadcast(eval_vocab), "g", "left_semi")
            .groupBy("g")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > stop_gram_df)
            .select("g")
        )  # subset of the eval vocabulary -> always broadcastable
        hot_e = (
            ex.join(F.broadcast(hot), "g", "left_semi")
            .groupBy("eval_id")
            .agg(F.sort_array(F.collect_set("g")).alias("_hot_e"))
        )
        hot_d = (
            dx.join(F.broadcast(hot), "g", "left_semi")
            .groupBy("doc_id")
            .agg(F.sort_array(F.collect_set("g")).alias("_hot_d"))
        )
        ex = ex.join(F.broadcast(hot), "g", "left_anti")
    pairs = (
        dx.join(F.broadcast(ex), "g")
        .groupBy("doc_id", "eval_id", "size_d", "size_e")
        .agg(F.count(F.lit(1)).cast("long").alias("common"))
    )
    if stop_gram_df is not None:
        empty = F.array().cast("array<string>")
        pairs = (
            pairs.join(hot_d, "doc_id", "left")
            .join(F.broadcast(hot_e), "eval_id", "left")
            .withColumn(
                "common",
                F.col("common")
                + F.size(
                    F.array_intersect(
                        F.coalesce("_hot_d", empty),
                        F.coalesce("_hot_e", empty),
                    )
                ).cast("long"),
            )
        )
    union = F.col("size_d") + F.col("size_e") - F.col("common")
    return pairs.filter(
        F.col("common") * 1_000_000 >= F.lit(threshold_ppm) * union
    ).select(
        "doc_id",
        "eval_id",
        F.col("common").alias("shared_ngrams"),
        F.expr(
            "common * 1000000 div (size_d + size_e - common)"
        ).cast("long").alias("jaccard_ppm"),
    )
