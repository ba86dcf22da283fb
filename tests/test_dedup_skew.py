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


# ---------------------------------------------------------------------
# Hot-BUCKET skew guard for the MinHash band join (VERDICT r5 #1): a
# mega-cluster of near-identical docs shares every band bucket, so an
# uncapped band join pays C(m, 2) candidate pairs through one join
# key. max_bucket_width bounds that to m*cap while preserving the
# min-id survivor set (every cluster member still pairs with the
# bucket's smallest ids).

N_CLONES = 40
_CLONE_TEXT = " ".join(f"clone{j} body" for j in range(20))


def _mega_bucket_corpus(spark):
    rows = [(i, _CLONE_TEXT) for i in range(N_CLONES)]
    # distinct background docs: unique fillers, no cross similarity
    for i in range(10):
        rows.append(
            (100 + i, " ".join(f"bg{i}w{j}" for j in range(25)))
        )
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_band_stats_expose_the_mega_bucket(spark):
    signed = D.minhash_signatures(
        D.shingle_docs(_mega_bucket_corpus(spark)), hash_mode="sha2"
    )
    stats = D.lsh_band_stats(signed)
    assert stats["n_docs"] == N_CLONES + 10
    # the clone cluster shares all 4 band buckets
    assert stats["max_bucket_width"] == N_CLONES
    # generated pairs count the cluster once PER BAND...
    assert (
        stats["generated_pairs"]
        >= D.MINHASH_BANDS * N_CLONES * (N_CLONES - 1) // 2
    )
    # ...but distinct candidates collapse to the cluster's pair set
    assert stats["candidate_pairs"] == N_CLONES * (N_CLONES - 1) // 2


def test_bucket_cap_identical_when_buckets_fit(spark):
    signed = D.minhash_signatures(
        D.shingle_docs(_mega_bucket_corpus(spark)), hash_mode="sha2"
    )
    uncapped = sorted(
        tuple(r) for r in D.minhash_lsh_pairs(signed).collect()
    )
    capped = sorted(
        tuple(r)
        for r in D.minhash_lsh_pairs(
            signed, max_bucket_width=N_CLONES
        ).collect()
    )
    assert capped == uncapped  # cap >= every width -> bit-identical


def test_bucket_cap_bounds_pairs_and_keeps_survivors(spark):
    corpus = _mega_bucket_corpus(spark)
    signed = D.minhash_signatures(
        D.shingle_docs(corpus), hash_mode="sha2"
    )
    cap = 5
    uncapped = D.minhash_lsh_pairs(signed)
    capped = D.minhash_lsh_pairs(signed, max_bucket_width=cap)
    n_un, n_cap = uncapped.count(), capped.count()
    assert n_un == N_CLONES * (N_CLONES - 1) // 2  # quadratic
    # capped: doc_a must rank <= cap in the (single) clone bucket:
    # pairs = C(cap, 2) + (m - cap) * cap — linear in m
    assert n_cap == cap * (cap - 1) // 2 + (N_CLONES - cap) * cap
    # survivor set identical: every clone still pairs with the
    # bucket's min id, so keep_min_id drops the same docs
    ids = corpus.select("doc_id")
    s_un = sorted(
        r["doc_id"] for r in D.keep_min_id(ids, uncapped).collect()
    )
    s_cap = sorted(
        r["doc_id"] for r in D.keep_min_id(ids, capped).collect()
    )
    assert s_cap == s_un
    assert s_un == [0] + [100 + i for i in range(10)]


def test_bucket_cap_rank_rule_matches_duckdb(spark):
    """Cross-engine pin of the OVER-cap rank rule: at driver-parity
    scale every bucket fits q108's cap (capped == uncapped there), so
    this runs the capped oracle SQL and the capped engine path on a
    corpus with a 40-wide bucket and cap=5 — the cap actually bites,
    and DuckDB must agree on the exact survivor set."""
    import duckdb

    from samba_tv_ingest_etl_spark.queries.llmdata import (
        _minhash_capped_oracle,
    )

    corpus = _mega_bucket_corpus(spark)
    rows = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE mega(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO mega VALUES (?, ?)", rows)
    sql = _minhash_capped_oracle(
        corpus_sql="corpus AS (SELECT doc_id, text FROM mega)", cap=5
    )
    want = sorted(r[0] for r in con.execute(sql).fetchall())
    signed = D.minhash_signatures(
        D.shingle_docs(corpus), hash_mode="sha2"
    )
    pairs = D.minhash_lsh_pairs(
        signed, threshold_pct=50, max_bucket_width=5
    )
    got = sorted(
        r["doc_id"]
        for r in D.keep_min_id(corpus.select("doc_id"), pairs).collect()
    )
    assert got == want
    # sanity: the cap bit — fewer pairs than C(40,2) (checked in the
    # bounds test) yet survivors unchanged vs uncapped
    assert len(got) == 1 + 10  # clone head + 10 background docs
