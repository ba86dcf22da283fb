"""Manifest-committed table (sources/manifest.py): multi-partition
atomic commits, snapshot isolation across a crash mid-commit, time
travel, vacuum (superseded versions + crash orphans), and the
Warehouse/incremental-DAG integration — the manifest backend must be
result-indistinguishable from the backfill (the reference's EP2≡EP3
contract) while flipping all touched panel Mondays in one pointer
swap."""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F

from samba_tv_ingest_etl_spark.plans.backfill import Warehouse, backfill
from samba_tv_ingest_etl_spark.plans.incremental import run_incremental
from samba_tv_ingest_etl_spark.sources.manifest import ManifestTable

from . import samba_fixtures as fx

# ------------------------------------------------------------------ unit


def _mk(spark, rows):
    return spark.createDataFrame(rows, "p string, v int")


def _rows(df):
    return sorted((r["p"], r["v"]) for r in df.collect())


def test_commit_read_roundtrip_and_versions(spark, tmp_path):
    mt = ManifestTable(spark, str(tmp_path / "t"), "p")
    assert not mt.exists()
    mt.commit({"a": _mk(spark, [("a", 1), ("a", 2)]).filter("p='a'"),
               "b": _mk(spark, [("b", 3)])})
    assert mt.exists() and mt.version() == 1
    assert _rows(mt.read()) == [("a", 1), ("a", 2), ("b", 3)]
    # replace one partition, drop another, add a third — one commit
    mt.commit({"a": _mk(spark, [("a", 9)]), "b": None,
               "c": _mk(spark, [("c", 7)])})
    assert mt.version() == 2
    assert _rows(mt.read()) == [("a", 9), ("c", 7)]
    # time travel: v1 still readable until vacuumed
    assert _rows(mt.read(version=1)) == [("a", 1), ("a", 2), ("b", 3)]
    # partition pruning happens at the manifest
    assert _rows(mt.read(partitions=["a"])) == [("a", 9)]
    pruned_empty = mt.read(partitions=["zzz"])
    assert pruned_empty.count() == 0
    assert pruned_empty.schema == mt.read().schema


def test_commit_dataframe_one_job_full_and_upsert(spark, tmp_path):
    mt = ManifestTable(spark, str(tmp_path / "t"), "p")
    mt.commit_dataframe(
        _mk(spark, [("a", 1), ("b", 2), ("b", 3)]), full=True
    )
    assert _rows(mt.read()) == [("a", 1), ("b", 2), ("b", 3)]
    # upsert: rewrite b, leave a untouched, clear an expected-but-empty c
    mt.commit({"c": _mk(spark, [("c", 99)])})
    mt.commit_dataframe(
        _mk(spark, [("b", 5)]),
        expected_partitions=["b", "c"],  # c logically emptied
    )
    assert _rows(mt.read()) == [("a", 1), ("b", 5)]
    # full=True drops everything df doesn't carry
    mt.commit_dataframe(_mk(spark, [("z", 0)]), full=True)
    assert _rows(mt.read()) == [("z", 0)]


def test_null_partition_value_roundtrip(spark, tmp_path):
    mt = ManifestTable(spark, str(tmp_path / "t"), "p")
    mt.commit_dataframe(
        spark.createDataFrame([(None, 1), ("a", 2)], "p string, v int"),
        full=True,
    )
    got = sorted(
        ((r["p"], r["v"]) for r in mt.read().collect()),
        key=lambda t: (t[0] is not None, t),
    )
    assert got == [(None, 1), ("a", 2)]


class _CrashBeforeSwap:
    """Raise exactly where a process death between 'manifest written'
    and '_CURRENT swapped' would leave the table."""

    def __init__(self):
        self.armed = True

    def __call__(self, mt):
        orig = ManifestTable._write_text_atomic

        def crash(self_, fs, p, content):
            if self.armed and p.endswith("_CURRENT"):
                raise RuntimeError("simulated crash before pointer swap")
            return orig(self_, fs, p, content)

        return crash


def test_crash_mid_commit_reader_sees_old_version(
    spark, tmp_path, monkeypatch
):
    """The q-gate property the per-partition backend can't give: a
    crash after the data AND the next manifest are durably written,
    but before the pointer swap, must leave every reader on the old
    version — and a retry must succeed without colliding with the
    wreckage."""
    mt = ManifestTable(spark, str(tmp_path / "t"), "p")
    mt.commit_dataframe(_mk(spark, [("a", 1), ("b", 2)]), full=True)

    crash = _CrashBeforeSwap()
    monkeypatch.setattr(
        ManifestTable, "_write_text_atomic", crash(mt)
    )
    with pytest.raises(RuntimeError, match="simulated crash"):
        mt.commit_dataframe(
            _mk(spark, [("a", 100), ("b", 200)]), full=True
        )
    # reader: still the old version, never a mix
    assert mt.version() == 1
    assert _rows(mt.read()) == [("a", 1), ("b", 2)]
    # the orphaned manifest_2.json exists on disk but is dead
    assert os.path.exists(
        str(tmp_path / "t" / "_manifests" / "manifest_2.json")
    )
    # retry (process restart): succeeds, allocates PAST the orphan
    crash.armed = False
    v = mt.commit_dataframe(_mk(spark, [("a", 100), ("b", 200)]), full=True)
    assert v == 3 and mt.version() == 3
    assert _rows(mt.read()) == [("a", 100), ("b", 200)]


def test_vacuum_keeps_live_drops_old_and_orphans(spark, tmp_path):
    mt = ManifestTable(spark, str(tmp_path / "t"), "p")
    mt.commit_dataframe(_mk(spark, [("a", 1)]), full=True)
    mt.commit_dataframe(_mk(spark, [("a", 2)]), full=True)
    # fabricate a crash orphan: a batch dir no manifest references
    orphan = str(tmp_path / "t" / "data" / "_commit_deadbeef")
    _mk(spark, [("x", 0)]).write.partitionBy("p").parquet(orphan)
    removed = mt.vacuum(keep_versions=1)
    assert any("_commit_deadbeef" in d for d in removed)
    assert not os.path.exists(orphan)
    # current version untouched; old version's manifest gone
    assert _rows(mt.read()) == [("a", 2)]
    with pytest.raises(Exception):
        mt.read(version=1)
    # vacuum never deletes what the kept manifest references
    assert _rows(mt.read()) == [("a", 2)]


# ------------------------------------------------------- integration

SESSION_COLS = [
    "hh_id", "title", "content_id", "panel_monday", "session_id",
    "session_start_ts", "session_end_ts", "total_duration", "panel_weight",
]


def _sessions_set(wh):
    return sorted(
        map(tuple, wh.read("viewing_sessions").select(*SESSION_COLS).collect())
    )


def _manifest_wh(spark, root) -> Warehouse:
    return Warehouse(
        spark,
        str(root),
        layout=Warehouse.SCALE_LAYOUT,
        manifest=Warehouse.MANIFEST_TABLES,
    )


@pytest.fixture()
def feeds(spark):
    return fx.acr(spark), fx.stb(spark), fx.geo_weights(spark)


def test_manifest_incremental_matches_backfill(spark, tmp_path, feeds):
    """q61/q69's EP2≡EP3 contract on the manifest backend: day-by-day
    incremental through manifest commits == one-shot backfill."""
    acr, stb, geo = feeds
    wh_full = Warehouse(spark, str(tmp_path / "full"))
    backfill(wh_full, acr, stb, geo)

    wh_inc = _manifest_wh(spark, tmp_path / "inc")
    days = sorted(
        {r["metadata_date"]
         for df in (acr, stb)
         for r in df.select("metadata_date").distinct().collect()}
    )
    for day in days:
        le = F.col("metadata_date") <= F.lit(day)
        run_incremental(wh_inc, acr.filter(le), stb.filter(le), geo)

    assert _sessions_set(wh_inc) == _sessions_set(wh_full)
    # the commits really went through the manifest: versioned history
    mt = wh_inc.manifest_table("viewing_sessions")
    assert mt.exists() and mt.version() >= 1
    assert (tmp_path / "inc" / "viewing_sessions" / "_CURRENT").exists()


def test_manifest_incremental_idempotent(spark, tmp_path, feeds):
    acr, stb, geo = feeds
    wh = _manifest_wh(spark, tmp_path / "wh")
    run_incremental(wh, acr, stb, geo)
    before = _sessions_set(wh)
    v_before = wh.manifest_table("viewing_sessions").version()
    results = run_incremental(wh, acr, stb, geo)  # no new data
    assert results["update_raw_events"] == 0
    assert _sessions_set(wh) == before
    # no touched keys -> no mondays -> zero manifest churn
    assert wh.manifest_table("viewing_sessions").version() == v_before


def test_manifest_crash_mid_dag_preserves_snapshot(
    spark, tmp_path, feeds, monkeypatch
):
    """Crash the pointer swap during the DAG's session rewrite: the
    warehouse keeps serving the complete previous day's sessions
    (cross-partition snapshot), and the rerun converges to the same
    final state as an uninterrupted replay."""
    acr, stb, geo = feeds
    days = sorted(
        {r["metadata_date"]
         for df in (acr, stb)
         for r in df.select("metadata_date").distinct().collect()}
    )
    assert len(days) >= 2
    wh = _manifest_wh(spark, tmp_path / "wh")
    first = F.col("metadata_date") <= F.lit(days[0])
    run_incremental(wh, acr.filter(first), stb.filter(first), geo)
    day1 = _sessions_set(wh)

    crash = _CrashBeforeSwap()
    monkeypatch.setattr(ManifestTable, "_write_text_atomic", crash(None))
    with pytest.raises(RuntimeError, match="simulated crash"):
        run_incremental(wh, acr, stb, geo)
    # mid-crash reader: exactly the day-1 snapshot, not a partial mix
    assert _sessions_set(wh) == day1
    crash.armed = False
    monkeypatch.undo()

    # rerun after 'restart' — watermark never advanced (the control
    # update is downstream of the crashed task), so the pass repeats
    run_incremental(wh, acr, stb, geo)
    wh_ref = _manifest_wh(spark, tmp_path / "ref")
    for day in days:
        le = F.col("metadata_date") <= F.lit(day)
        run_incremental(wh_ref, acr.filter(le), stb.filter(le), geo)
    assert _sessions_set(wh) == _sessions_set(wh_ref)


def test_warehouse_manifest_dispatch(spark, tmp_path):
    wh = _manifest_wh(spark, tmp_path / "wh")
    df = spark.createDataFrame(
        [(dt.date(2025, 5, 5), "x", 1)],
        "panel_monday date, k string, v int",
    )
    wh.write(df, "viewing_sessions")
    assert wh.exists("viewing_sessions")
    assert wh.read("viewing_sessions").count() == 1
    got = wh.read_partitions("viewing_sessions", [dt.date(2025, 5, 5)])
    assert got.count() == 1
    none = wh.read_partitions("viewing_sessions", [dt.date(1999, 1, 1)])
    assert none.count() == 0
    with pytest.raises(NotImplementedError):
        wh.append(df, "viewing_sessions")
    with pytest.raises(ValueError, match="partition column"):
        Warehouse(
            spark, str(tmp_path / "w2"), manifest={"viewing_sessions"}
        ).manifest_table("viewing_sessions")
    # manifest JSON is O(partitions): one entry for the one Monday
    cur = (tmp_path / "wh" / "viewing_sessions" / "_CURRENT").read_text()
    man = json.loads(
        (tmp_path / "wh" / "viewing_sessions" / "_manifests" /
         f"manifest_{cur.strip()}.json").read_text()
    )
    assert list(man) == ["2025-05-05"]
