"""Unit tests for corpus-hygiene operators (contamination /
boilerplate) and the BPE-ish token estimator, on hand-built docs
where the expected values are computable by eye."""

from __future__ import annotations

from pyspark.sql import functions as F

from samba_tv_ingest_etl_spark.operators.contamination import (
    boilerplate_chunks,
    contamination,
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
