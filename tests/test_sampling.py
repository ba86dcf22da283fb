"""Hash sampling: split exhaustiveness/disjointness, stability under
repartitioning (the property rand(seed) lacks), and sample-rate
sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from samba_tv_ingest_etl_spark.operators.sampling import (
    hash_split,
    stratified_sample,
)

from .conftest import SF_DIR


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id"
    )


def test_split_is_exhaustive_and_proportional(spark):
    docs = _docs(spark)
    out = hash_split(docs, "doc_id", {"train": 90, "val": 5, "test": 5})
    counts = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    n = docs.count()
    assert sum(counts.values()) == n  # no row unassigned
    assert counts["train"] > counts.get("val", 0)
    assert counts["train"] > counts.get("test", 0)


def test_split_stable_under_repartition(spark):
    docs = _docs(spark)
    a = hash_split(docs, "doc_id", {"train": 90, "val": 10})
    b = hash_split(
        docs.repartition(17, "doc_id"), "doc_id", {"train": 90, "val": 10}
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_sample_rate_and_determinism(spark):
    docs = _docs(spark)
    s1 = stratified_sample(docs, "doc_id", 1, 10)
    s2 = stratified_sample(docs, "doc_id", 1, 10)
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    assert ids1 == sorted(r["doc_id"] for r in s2.collect())
    n, k = docs.count(), len(ids1)
    assert 0 < k < n
    assert abs(k / n - 0.1) < 0.08  # small SF -> loose bound


def test_mixture_sample_binding_source_kept_whole(spark):
    # src_a: 100 tokens w=2, src_b: 400 tokens w=1 -> binding is
    # src_a (100/2 < 400/1): keep all of a, b sampled to ~50 tokens
    rows = [(i, "src_a", 10) for i in range(10)] + [
        (100 + i, "src_b", 10) for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_tokens"])
    from samba_tv_ingest_etl_spark.operators.sampling import (
        mixture_rates,
        mixture_sample,
    )

    rates = {
        r["source"]: (r["avail_tokens"], r["keep_den"])
        for r in mixture_rates(
            df, "source", {"src_a": 2}, token_col="n_tokens", den=1000
        ).collect()
    }
    # m = min(100*1000//2, 400*1000//1) = 50000
    # a: min(1000, 50000*2//100) = 1000; b: 50000*1//400 = 125
    assert rates == {"src_a": (100, 1000), "src_b": (400, 125)}
    kept = mixture_sample(
        df, "source", {"src_a": 2}, token_col="n_tokens",
        key_col="doc_id", den=1000,
    )
    by_src = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert by_src["src_a"] == 10          # binding source kept whole
    assert 0 < by_src.get("src_b", 0) < 40  # others downsampled


def test_mixture_sample_deterministic(spark):
    rows = [(i, "s", 5) for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_tokens"])
    from samba_tv_ingest_etl_spark.operators.sampling import mixture_sample

    a = sorted(
        r["doc_id"]
        for r in mixture_sample(
            df.repartition(7), "source", {}, token_col="n_tokens",
            key_col="doc_id",
        ).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in mixture_sample(
            df.repartition(3), "source", {}, token_col="n_tokens",
            key_col="doc_id",
        ).collect()
    )
    assert a == b  # partitioning-independent (hash of key, not rand)


def test_group_cap_exact_and_deterministic(spark):
    from samba_tv_ingest_etl_spark.operators.sampling import group_cap

    rows = [(i, "big") for i in range(100)] + [(1000 + i, "small") for i in range(3)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    kept_a = sorted(
        r["doc_id"]
        for r in group_cap(
            df.repartition(7), "source", "doc_id", 10
        ).collect()
    )
    kept_b = sorted(
        r["doc_id"]
        for r in group_cap(
            df.repartition(3), "source", "doc_id", 10
        ).collect()
    )
    assert kept_a == kept_b                      # partitioning-stable
    big = [k for k in kept_a if k < 1000]
    small = [k for k in kept_a if k >= 1000]
    assert len(big) == 10                        # capped exactly
    assert len(small) == 3                       # under-cap passes whole


def test_epoch_upsample_fractional_factors(spark):
    from samba_tv_ingest_etl_spark.operators.sampling import (
        epoch_upsample,
        hash_bucket,
    )

    rows = [(i, "a" if i < 40 else "b") for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    up = epoch_upsample(
        df, "source", {"a": (5, 2), "b": (1, 2)}, key_col="doc_id"
    )
    got = [(r["doc_id"], r["source"], r["epoch"]) for r in up.collect()]
    # every 'a' doc appears 2 or 3 times (epochs 0..n-1, contiguous)
    from collections import Counter

    per = Counter((d, s) for d, s, _ in got)
    a_counts = {per[(i, "a")] for i in range(40)}
    assert a_counts <= {2, 3} and a_counts == {2, 3}
    # 'b' docs appear 0 or 1 times (deterministic 50% downsample)
    b_counts = {per.get((i, "b"), 0) for i in range(40, 80)}
    assert b_counts == {0, 1}
    # extra-copy set == the hash rule, exactly
    marked = {
        r["doc_id"]
        for r in df.filter(hash_bucket("doc_id", 2) < 1).collect()
    }
    assert {d for (d, s), c in per.items() if s == "a" and c == 3} == (
        marked & set(range(40))
    )
    assert {d for (d, s), c in per.items() if s == "b" and c == 1} == (
        marked & set(range(40, 80))
    )
    # epochs are contiguous 0..n-1 per doc
    ep = {}
    for d, s, e in got:
        ep.setdefault(d, []).append(e)
    assert all(sorted(v) == list(range(len(v))) for v in ep.values())
    # determinism across runs
    again = [(r["doc_id"], r["source"], r["epoch"]) for r in up.collect()]
    assert sorted(got) == sorted(again)
    # bad factors raise
    import pytest

    with pytest.raises(ValueError):
        epoch_upsample(df, "source", {"a": (1, 0)}, key_col="doc_id")
