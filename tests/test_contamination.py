"""Unit tests for corpus-hygiene operators (contamination /
boilerplate) and the BPE-ish token estimator, on hand-built docs
where the expected values are computable by eye."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from samba_tv_ingest_etl_spark.operators.contamination import (
    boilerplate_chunks,
    contamination,
    fuzzy_contamination,
)
from samba_tv_ingest_etl_spark.operators.text import token_stats


def test_contamination_counts_distinct_shared_ngrams(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),          # contains eval 3-grams
            (2, "x y z w v u"),          # disjoint
            (3, "a b c a b c a b c"),    # repeats: distinct grams only
        ],
        ["doc_id", "text"],
    )
    evals = spark.createDataFrame(
        [(100, "a b c d")], ["eval_id", "text"]
    )
    out = {
        (r["doc_id"], r["eval_id"]): r["shared_ngrams"]
        for r in contamination(docs, evals, ngram=3, min_shared=1).collect()
    }
    # eval grams: {a b c, b c d}; doc1 shares both; doc3 shares only
    # "a b c" (its repeats dedup); doc2 none
    assert out == {(1, 100): 2, (3, 100): 1}


def test_contamination_min_shared_threshold(spark):
    docs = spark.createDataFrame([(1, "a b c d e f")], ["doc_id", "text"])
    evals = spark.createDataFrame([(9, "a b c d")], ["eval_id", "text"])
    assert contamination(docs, evals, ngram=3, min_shared=3).count() == 0


def test_boilerplate_chunks_flags_shared_windows(spark):
    boiler = "one two three four"
    docs = spark.createDataFrame(
        [
            (1, f"{boiler} alpha beta gamma delta"),
            (2, f"{boiler} eps zeta eta theta"),
            (3, "iota kappa lam mu nu xi omicron pi"),
            (4, "shorty"),  # < one chunk -> excluded entirely
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["n_chunks"], r["n_boiler_chunks"], r["boiler_ppm"])
        for r in boilerplate_chunks(docs, chunk=4, min_df=2).collect()
    }
    # docs 1-2 share their first 4-token chunk; second chunks unique
    assert out == {
        1: (2, 1, 500000),
        2: (2, 1, 500000),
        3: (2, 0, 0),
    }


def test_boilerplate_counts_instances_not_types(spark):
    # the shared chunk appears TWICE in doc 1 -> both instances count
    docs = spark.createDataFrame(
        [
            (1, "a b a b a b a b"),  # chunks: [a b a b, a b a b]
            (2, "a b a b x y z w"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["n_boiler_chunks"]
        for r in boilerplate_chunks(docs, chunk=4, min_df=2).collect()
    }
    assert out == {1: 2, 2: 1}


def test_token_stats_bpe_estimate(spark):
    docs = spark.createDataFrame(
        [
            (1, "hi supercalifragilistic a"),  # 2+5+1 pieces @4 chars
            (2, ""),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (
            r["n_tokens"], r["bpe_est_tokens"], r["chars_per_token_ppm"]
        )
        for r in token_stats(docs).collect()
    }
    # lens: hi=2 (1 piece), supercalifragilistic=20 (5), a=1 (1)
    assert out[1] == (3, 7, int(23 * 1_000_000 / 3))
    assert out[2] == (0, 0, 0)


def test_contamination_eval_side_broadcast(spark):
    """The corpus side must not broadcast — the plan broadcasts the
    exploded EVAL n-grams (benchmark-sized at scale)."""
    docs = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} w{i+3}") for i in range(50)],
        ["doc_id", "text"],
    )
    evals = spark.createDataFrame([(0, "w0 w1 w2 w3")], ["eval_id", "text"])
    plan = (
        contamination(docs, evals, ngram=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_contamination_eval_budget_raises(spark):
    """A corpus-proportional eval side must fail LOUDLY, not plan an
    unbounded broadcast (the q122/q123 flaw class, r9 advice on
    q127; here enforced for the exact + fuzzy decon operators)."""
    docs = spark.createDataFrame([(1, "a b c d e f")], ["doc_id", "text"])
    evals = spark.createDataFrame(
        [(i, f"e{i} a b c d") for i in range(4)], ["eval_id", "text"]
    )  # 4 eval docs x 3 distinct 3-grams = 12 gram rows > budget 5
    with pytest.raises(ValueError, match="broadcast budget"):
        contamination(docs, evals, ngram=3, max_eval_grams=5).count()
    with pytest.raises(ValueError, match="broadcast budget"):
        fuzzy_contamination(
            docs, evals, ngram=3, max_eval_grams=5
        ).count()


def test_fuzzy_contamination_within_budget_unchanged(spark):
    """The guard is a no-op below budget: same pairs, same exact
    jaccard, with and without the candidacy cap."""
    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x y z w v u t")],
        ["doc_id", "text"],
    )
    evals = spark.createDataFrame([(9, "a b c d e")], ["eval_id", "text"])
    for cap in (None, 1):
        out = {
            (r["doc_id"], r["eval_id"]): r["jaccard_ppm"]
            for r in fuzzy_contamination(
                docs, evals, ngram=3, threshold_ppm=1,
                stop_gram_df=cap,
            ).collect()
        }
        # doc1 grams {abc,bcd,cde,def,efg} (5), eval {abc,bcd,cde}
        # (3): common 3, union 5 -> 600000 ppm
        assert out == {(1, 9): 600000}
