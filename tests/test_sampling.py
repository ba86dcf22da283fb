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
