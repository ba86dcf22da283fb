"""Property tests (hypothesis) for the MinHash-LSH hot-bucket cap:
for ANY corpus of planted clone clusters plus unique docs, and any
cap,

1. capped candidate pairs are a SUBSET of uncapped pairs (the cap
   only removes candidacy, never invents a pair), so capped
   survivors are a SUPERSET of uncapped survivors;
2. with cap >= the widest band bucket, capped == uncapped
   BIT-FOR-BIT (every doc's bucket rank is within the cap).

These are the two laws the q108 oracle relies on; the fixed-corpus
tests in test_dedup_skew.py pin exact counts, this pins the laws on
arbitrary cluster layouts."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from samba_tv_ingest_etl_spark.operators import dedup as D


@st.composite
def corpora(draw):
    """Clone clusters of drawn sizes + singleton background docs.
    Texts are generated (never drawn) so Spark work stays bounded."""
    sizes = draw(
        st.lists(
            st.integers(min_value=1, max_value=12),
            min_size=1, max_size=4,
        )
    )
    n_bg = draw(st.integers(min_value=0, max_value=5))
    cap = draw(st.integers(min_value=1, max_value=15))
    rows, next_id = [], 0
    for c, size in enumerate(sizes):
        body = " ".join(f"cl{c}w{j} word" for j in range(12))
        for _ in range(size):
            rows.append((next_id, body))
            next_id += 1
    for i in range(n_bg):
        rows.append(
            (next_id, " ".join(f"bg{i}x{j}" for j in range(15)))
        )
        next_id += 1
    return rows, cap


@settings(max_examples=8, deadline=None)
@given(corpora())
def test_cap_laws(spark, case):
    rows, cap = case
    df = spark.createDataFrame(rows, "doc_id long, text string")
    signed = D.minhash_signatures(
        D.shingle_docs(df), hash_mode="sha2"
    ).localCheckpoint(eager=True)
    un = {tuple(r) for r in D.minhash_lsh_pairs(signed).collect()}
    capped = {
        tuple(r)
        for r in D.minhash_lsh_pairs(
            signed, max_bucket_width=cap
        ).collect()
    }
    # law 1: the cap only removes candidacy
    assert capped <= un
    dropped_un = {b for _, b, _, _ in un}
    dropped_cap = {b for _, b, _, _ in capped}
    assert dropped_cap <= dropped_un  # survivors grow monotonically
    # law 2: cap >= widest bucket -> identical output
    width = D.lsh_band_stats(signed)["max_bucket_width"]
    if cap >= width:
        assert capped == un
    full = {
        tuple(r)
        for r in D.minhash_lsh_pairs(
            signed, max_bucket_width=width
        ).collect()
    }
    assert full == un
