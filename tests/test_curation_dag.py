"""Incremental curation DAG (plans/curation.CurationDag): the
pipeline-grain incremental≡backfill property (N id-monotone daily
increments ≡ one wholesale pass), no-op re-runs, idempotent curated
landing, and the task-graph wiring (AFTER chain, suspended-root
skip)."""

from __future__ import annotations

import pyspark.sql.functions as F

from samba_tv_ingest_etl_spark.operators.text import tokens
from samba_tv_ingest_etl_spark.plans.curation import CurationDag

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return (
        spark.read.parquet(SF_DIR + "/documents.parquet")
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )


def _eval_toks(spark):
    docs = _docs(spark)
    return docs.filter(F.col("doc_id") % 50 == 0).select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )


def _train(spark):
    docs = _docs(spark)
    return docs.filter(F.col("doc_id") % 50 != 0).unionByName(
        # verbatim copies: real dedup work for the MinHash stage
        docs.filter(F.col("doc_id") % 10 == 1).select(
            (F.col("doc_id") + F.lit(1_000_000_000_000)).alias(
                "doc_id"
            ),
            "text",
        )
    )


def _curated_rows(dag):
    return sorted(
        (r["doc_id"], r["n_tokens"], r["n_kept"])
        for r in dag.curated().collect()
    )


def _run_days(spark, root, train, bounds):
    """One CurationDag driven through len(bounds)+1 id-monotone daily
    batches split at the given id bounds, ascending."""
    dag = CurationDag(spark, root, _eval_toks(spark))
    lo = None
    for i, hi in enumerate(list(bounds) + [None]):
        b = train
        if lo is not None:
            b = b.filter(F.col("doc_id") > lo)
        if hi is not None:
            b = b.filter(F.col("doc_id") <= hi)
        b.write.mode("overwrite").parquet(f"{root}/stage/day{i}")
        dag.run_once()
        lo = hi
    return dag


def test_increments_equal_wholesale(spark, tmp_path):
    """Three id-monotone daily increments must accumulate to exactly
    the single-pass result — the reference's incremental≡backfill
    property (SURVEY §5) at curation-pipeline grain."""
    train = _train(spark).localCheckpoint(eager=True)
    ids = sorted(r["doc_id"] for r in train.select("doc_id").collect())
    b1, b2 = ids[len(ids) // 3], ids[2 * len(ids) // 3]
    inc = _run_days(spark, str(tmp_path / "inc"), train, [b1, b2])
    whole = _run_days(spark, str(tmp_path / "whole"), train, [])
    got, want = _curated_rows(inc), _curated_rows(whole)
    assert got == want and len(want) > 0


def test_rerun_without_new_files_is_noop(spark, tmp_path):
    """A pass with nothing newly staged must be a no-op end to end
    (the availableNow-cron operating model: idle fires are free)."""
    train = _train(spark)
    dag = _run_days(spark, str(tmp_path / "root"), train, [])
    before = _curated_rows(dag)
    results = dag.run_once()
    assert results["curation_ingest"] == 0
    assert _curated_rows(dag) == before


def test_curated_landing_idempotent(spark, tmp_path):
    """The curated write is a dynamic overwrite of the run's own
    partition: replaying it (the crash-before-ledger-commit window)
    must not duplicate rows."""
    train = _train(spark)
    dag = _run_days(spark, str(tmp_path / "root"), train, [])
    before = _curated_rows(dag)
    gated = dag.curated().withColumnRenamed("doc_id", "doc_id")
    run_id = (
        dag.spark.read.parquet(dag.curated_path)
        .select("run_id")
        .distinct()
        .collect()[0]["run_id"]
    )
    dag._write_curated(gated, run_id)  # the replay
    assert _curated_rows(dag) == before


def test_crash_replay_bit_identical(spark, tmp_path):
    """Crash window: index appended + curated landed, but the ledger
    commit never ran. The next pass re-ingests the same files and
    must reproduce the same curated pool bit-for-bit (replay-safe
    dedup increment + idempotent landing)."""
    train = _train(spark).localCheckpoint(eager=True)
    ids = sorted(r["doc_id"] for r in train.select("doc_id").collect())
    mid = ids[len(ids) // 2]
    root = str(tmp_path / "root")
    dag = _run_days(spark, root, train, [mid])
    want = _curated_rows(dag)

    # same two days, but day 2's first attempt crashes after dedup +
    # landing and BEFORE the ledger commit: simulate by running the
    # tasks directly without recording the ledger, then replay the
    # full pass
    root2 = str(tmp_path / "root2")
    dag2 = CurationDag(spark, root2, _eval_toks(spark))
    train.filter(F.col("doc_id") <= mid).write.mode("overwrite").parquet(
        f"{root2}/stage/day0"
    )
    dag2.run_once()
    train.filter(F.col("doc_id") > mid).write.mode("overwrite").parquet(
        f"{root2}/stage/day1"
    )
    state: dict = {}
    dag2._task_ingest(state)
    dag2._task_dedup(state)
    dag2._task_decontaminate(state)
    dag2._write_curated(state["gated"], state["run_id"])  # no ledger!
    dag2.run_once()  # the replay: files still unrecorded
    assert _curated_rows(dag2) == want


def test_dag_wiring(spark, tmp_path):
    """AFTER chain order and suspended-root semantics come from
    TaskDag; pin the wiring: topological order is the 4-stage chain,
    the root carries the reference's ETL cron, and suspending the
    root skips the whole pass."""
    dag = CurationDag(spark, str(tmp_path / "root"), _eval_toks(spark))
    tdag = dag.build_dag()
    assert tdag.order() == [
        "curation_ingest",
        "curation_dedup",
        "curation_decontaminate",
        "curation_append",
    ]
    shown = {t["name"]: t for t in tdag.show()}
    assert shown["curation_ingest"]["schedule"] == "0 5 * * *"
    assert shown["curation_ingest"]["timezone"] == "UTC"
    tdag.suspend("curation_ingest")
    assert tdag.run() == {}


def test_bootstrap_crash_between_index_writes_recovers(spark, tmp_path):
    """Crash window between the bootstrap's docs/ and bands/ writes
    (r11 advice): _index_exists must route the replay back to the
    bootstrap branch — whose atomic overwrites are idempotent —
    instead of the steady-state branch, whose read of the missing
    bands/ would crash-loop permanently."""
    import shutil

    from samba_tv_ingest_etl_spark.operators import dedup as D

    train = _train(spark).localCheckpoint(eager=True)
    want = _curated_rows(_run_days(spark, str(tmp_path / "clean"), train, []))

    root = str(tmp_path / "root")
    dag = CurationDag(spark, root, _eval_toks(spark))
    train.write.mode("overwrite").parquet(f"{root}/stage/day0")
    # simulate the crashed bootstrap: docs/ landed, bands/ (and the
    # meta row, written after it) did not
    D.write_band_index(
        D.shingle_docs(train.select("doc_id", "text"), ngram=dag.ngram),
        dag.index_path,
    )
    shutil.rmtree(dag.index_path + "/bands")
    shutil.rmtree(dag.index_path + "/meta")
    dag.run_once()  # the replay: must re-bootstrap, not crash
    assert _curated_rows(dag) == want and len(want) > 0


def test_drifting_replay_no_duplicates(spark, tmp_path):
    """The r11-advice orphan window: a crash AFTER the curated write
    but BEFORE the run manifest/ledger commit, with NEW files staged
    before the replay — the replay ingests old+new under a DIFFERENT
    run_id, so the crashed attempt's partition would double-count its
    docs if it stayed visible. curated() must hide it immediately
    (manifest left-semi) and the replay must garbage-collect it."""
    train = _train(spark).localCheckpoint(eager=True)
    ids = sorted(r["doc_id"] for r in train.select("doc_id").collect())
    b1, b2 = ids[len(ids) // 3], ids[2 * len(ids) // 3]
    # clean equivalent: day A = ids<=b1, day B = the rest in one pass
    want = _curated_rows(
        _run_days(spark, str(tmp_path / "clean"), train, [b1])
    )

    root = str(tmp_path / "root")
    dag = CurationDag(spark, root, _eval_toks(spark))
    train.filter(F.col("doc_id") <= b1).write.mode("overwrite").parquet(
        f"{root}/stage/day0"
    )
    dag.run_once()
    committed = _curated_rows(dag)

    # day 1 attempt crashes right after the curated landing
    train.filter(
        (F.col("doc_id") > b1) & (F.col("doc_id") <= b2)
    ).write.mode("overwrite").parquet(f"{root}/stage/day1")
    state: dict = {}
    dag._task_ingest(state)
    dag._task_dedup(state)
    dag._task_decontaminate(state)
    dag._write_curated(state["gated"], state["run_id"])  # then crash
    orphan_run = state["run_id"]
    # a read between the crash and the replay sees ONLY committed runs
    assert _curated_rows(dag) == committed

    # new files staged before the replay -> the replay's file set
    # (day1+day2) hashes to a different run_id than the crashed day1
    train.filter(F.col("doc_id") > b2).write.mode("overwrite").parquet(
        f"{root}/stage/day2"
    )
    dag.run_once()
    assert _curated_rows(dag) == want
    # the orphan partition itself was garbage-collected, not just hidden
    fs, jpath = dag._fs()
    names = {
        s.getPath().getName()
        for s in fs.listStatus(jpath(dag.curated_path))
    }
    assert f"run_id={orphan_run}" not in names


def test_maintain_preserves_results(spark, tmp_path):
    """Nightly maintenance (index compaction + ledger/manifest squash
    + vacuum) between daily passes must change NOTHING observable:
    curated() identical before/after, and the next increment lands
    the same rows a maintenance-free twin lands."""
    train = _train(spark).localCheckpoint(eager=True)
    ids = sorted(r["doc_id"] for r in train.select("doc_id").collect())
    b1, b2 = ids[len(ids) // 3], ids[2 * len(ids) // 3]

    plain = _run_days(spark, str(tmp_path / "plain"), train, [b1, b2])
    want = _curated_rows(plain)

    root = str(tmp_path / "maint")
    dag = CurationDag(spark, root, _eval_toks(spark))
    lo = None
    for i, hi in enumerate([b1, b2, None]):
        b = train
        if lo is not None:
            b = b.filter(F.col("doc_id") > lo)
        if hi is not None:
            b = b.filter(F.col("doc_id") <= hi)
        b.write.mode("overwrite").parquet(f"{root}/stage/day{i}")
        dag.run_once()
        before = _curated_rows(dag)
        out = dag.maintain()
        assert "index" in out
        assert _curated_rows(dag) == before
        lo = hi
    assert _curated_rows(dag) == want and len(want) > 0
    # the squashed ledger still gates re-ingest: a re-run is a no-op
    assert dag.run_once()["curation_ingest"] == 0
