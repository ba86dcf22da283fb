"""keep_min_id must anti-join against a MATERIALIZED dropped set
(optimization r14, C1): the corpus side is typically a union, and a
lazy dropped set both re-plans the whole pair DAG below the pushed
anti-join and denies the planner a usable size estimate (forcing a
full corpus exchange+sort). A regression back to the lazy shape would
pass every value-level oracle and only show up as wasted work."""

from __future__ import annotations

from pyspark.sql import functions as F

from samba_tv_ingest_etl_spark.operators import dedup as D

from .conftest import SF_DIR


def test_keep_min_id_drops_pair_dag_from_final_plan(spark):
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
    )
    sh = D.shingle_docs(docs, ngram=3)
    signed = D.minhash_signatures(sh, hash_mode="sha2")
    pairs = D.minhash_lsh_pairs(signed, threshold_pct=50)
    kept = D.keep_min_id(docs.select("doc_id"), pairs)
    plan = kept._jdf.queryExecution().executedPlan().toString()
    # the dropped side is a checkpointed RDD scan, not the pair DAG:
    # no python verify kernel and no shingle explode below the join
    assert "ExistingRDD" in plan, plan
    assert "MapInPandas" not in plan, plan
    assert "SortMergeJoin Inner" not in plan, plan


def test_keep_min_id_results_unchanged_by_materialization(spark):
    rows = [(1, 2), (2, 5), (4, 9)]
    pairs = spark.createDataFrame(rows, "doc_a long, doc_b long")
    docs = spark.range(1, 11).select(F.col("id").alias("doc_id"))
    kept = {r["doc_id"] for r in D.keep_min_id(docs, pairs).collect()}
    assert kept == {1, 3, 4, 6, 7, 8, 10}
