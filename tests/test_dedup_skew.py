"""Hot-shingle skew guard: a shingle shared by every document must not
become a single candidate-join key carrying the whole corpus (O(n²)
pairs through one reducer). With ``stop_shingle_df`` the candidate
join runs on sub-threshold shingles only, while the reported
common/union values stay EXACT (hot overlap re-added per candidate
pair via array_intersect)."""

from __future__ import annotations

from pyspark.sql import functions as F

from samba_tv_ingest_etl_spark.operators import dedup as D

CAP = 5
N_DOCS = 60

# every doc starts with the same sentence -> ~10 universal shingles
_PREFIX = "the quick brown fox jumps over the lazy dog again and again"


def _corpus(spark):
    rows = []
    for i in range(N_DOCS):
        # 30 unique filler tokens: prefix-only overlap stays far below
        # the 50% Jaccard threshold, so non-dup pairs are NOT similar
        filler = " ".join(f"tok{i}x{j}" for j in range(30))
        rows.append((i, f"{_PREFIX} {filler}"))
    # one true near-dup pair sharing its filler (and the hot prefix)
    shared = " ".join(f"dup{j}" for j in range(30))
    rows.append((1000, f"{_PREFIX} {shared}"))
    rows.append((1001, f"{_PREFIX} {shared} trailer"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _cand_count(ex):
    a = ex.select(F.col("doc_id").alias("a"), "shingle")
    b = ex.select(F.col("doc_id").alias("b"), "shingle")
    return (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
        .count()
    )


def test_cap_kills_quadratic_candidates(spark):
    sh = D.shingle_docs(_corpus(spark))
    ex = sh.select(
        "doc_id", "set_size", F.explode("shingles").alias("shingle")
    )
    # uncapped: universal prefix shingles pair every doc with every
    # other doc — quadratic candidate set
    n = N_DOCS + 2
    assert _cand_count(ex) == n * (n - 1) // 2
    # capped: only docs sharing a sub-threshold shingle remain
    hot = (
        ex.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > CAP)
        .select("shingle")
    )
    cold = ex.join(hot, "shingle", "left_anti")
    assert _cand_count(cold) == 1  # just the planted near-dup pair
    # and no surviving join key exceeds the cap
    max_df = (
        cold.groupBy("shingle").count().agg(F.max("count")).collect()[0][0]
    )
    assert max_df <= CAP


def test_cap_is_exact_on_surviving_pairs(spark):
    sh = D.shingle_docs(_corpus(spark))
    uncapped = sorted(
        D.jaccard_pairs(sh, threshold_pct=50).collect()
    )
    capped = sorted(
        D.jaccard_pairs(sh, threshold_pct=50, stop_shingle_df=CAP).collect()
    )
    # every similar pair shares a cold shingle here, so the capped run
    # returns the same pairs AND the same exact common/union values
    # (hot overlap re-added — a candidates-only count would undercount
    # common by the ~10 shared prefix shingles and fail this)
    assert capped == uncapped
    assert len(capped) == 1
    (row,) = capped
    assert {row.doc_a, row.doc_b} == {1000, 1001}
    # common includes the hot prefix shingles: far more than the
    # cold-only overlap
    assert row.common > 30
