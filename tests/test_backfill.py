"""Backfill chain on Samba-shaped fixtures — golden end-to-end
expectations hand-computed in samba_fixtures.py's case list."""

from __future__ import annotations

import datetime as dt

import pytest

from samba_tv_ingest_etl_spark.operators.panels import (
    attribute_panels,
    panel_windows,
)
from samba_tv_ingest_etl_spark.plans.backfill import (
    Warehouse,
    backfill,
    v_audience_metrics,
)

from . import samba_fixtures as fx


@pytest.fixture()
def wh(spark, tmp_path):
    w = Warehouse(spark, str(tmp_path / "wh"))
    backfill(w, fx.acr(spark), fx.stb(spark), fx.geo_weights(spark))
    return w


def test_panel_windows_mondays_only(spark):
    pw = panel_windows(fx.geo_weights(spark)).collect()
    got = {r["panel_monday"]: (r["window_start"], r["window_end"]) for r in pw}
    assert got == {
        fx.M1: (dt.date(2025, 5, 5), dt.date(2025, 6, 1)),
        fx.M2: (dt.date(2025, 5, 12), dt.date(2025, 6, 8)),
    }  # 06-04 non-Monday excluded; duplicates collapsed


def test_attribution_strategies_agree(spark):
    pw = panel_windows(fx.geo_weights(spark))
    from samba_tv_ingest_etl_spark.operators.union_events import (
        raw_viewing_events,
    )

    ev = raw_viewing_events(fx.acr(spark), fx.stb(spark))
    a = attribute_panels(ev, pw, strategy="array")
    j = attribute_panels(ev, pw, strategy="join")
    key = ["smba_id", "exposure_start_ts", "panel_monday"]
    assert sorted(map(tuple, a.select(key).collect())) == sorted(
        map(tuple, j.select(key).collect())
    )


def test_attribution_max_monday_wins_and_null_when_uncovered(spark):
    pw = panel_windows(fx.geo_weights(spark))
    from samba_tv_ingest_etl_spark.operators.union_events import (
        raw_viewing_events,
    )

    ev = attribute_panels(raw_viewing_events(fx.acr(spark), fx.stb(spark)), pw)
    got = {
        (r["smba_id"], r["title"]): r["panel_monday"]
        for r in ev.select("smba_id", "title", "panel_monday").distinct().collect()
    }
    assert got[("dev_1", "titleA")] == fx.M2  # covered by both -> MAX
    assert got[("dev_2", "titleB")] == fx.M1  # covered by M1 only
    assert got[("dev_1", "titleD")] is None   # no covering window


def test_weighted_events_filters(wh):
    we = wh.read("weighted_events")
    devices = {r["smba_id"] for r in we.select("smba_id").distinct().collect()}
    # dropped: dev_5 (no geo), dev_3 (null weight), dev_1/titleD (no panel)
    assert "dev_5" not in devices and "dev_3" not in devices
    titles = {r["title"] for r in we.select("title").distinct().collect()}
    assert "titleD" not in titles
    # fan-out: dev_2's single event duplicated by the double weight row
    assert we.filter(we.smba_id == "dev_2").count() == 2


def test_viewing_sessions_golden(wh):
    rows = wh.read("viewing_sessions").collect()
    got = {
        (r["hh_id"], r["title"], float(r["panel_weight"])): (
            r["session_id"], r["session_start_ts"], r["session_end_ts"],
            r["total_duration"], r["panel_monday"],
        )
        for r in rows
    }
    assert len(rows) == 4
    # A: gap-300 stays (200s kept), gap-301 session (100s) dropped by HAVING
    assert got[("hh_1", "titleA", 1.6)] == (1, 1000, 1500, 200, fx.M2)
    # B: fan-out doubles the duration
    assert got[("hh_2", "titleB", 0.8)] == (1, 2000, 2200, 400, fx.M1)
    # E: one gap-session, two weights -> two rows sharing session_id
    assert got[("hh_6", "titleE", 1.0)] == (1, 5000, 5200, 200, fx.M2)
    assert got[("hh_6", "titleE", 2.0)] == (1, 5300, 5500, 200, fx.M2)


def test_audience_metrics_view(wh):
    m = v_audience_metrics(wh)
    r = m.filter(m.hh_id == "hh_1").collect()[0]
    assert r["weighted_view"] == 1.6 and r["weighted_hh"] == 1.6
    assert r["weighted_duration"] == pytest.approx(200 * 1.6)
    assert r["metadata_date"] == dt.date(1970, 1, 1)  # epoch-secs 1000
    assert r["total_duration"] == 200


def test_task_control_seeded(wh):
    tc = {r["task_name"] for r in wh.read("task_control").collect()}
    assert tc == {"raw_events_update", "panel_windows_update"}


def test_reach_rollup_dedups_households_across_dims(spark):
    """A household with sessions in TWO dmas must count once (with
    one weight) in the event_type subtotal and the grand total — the
    exact bug a naive rollup() over pre-aggregated rows would have."""
    from samba_tv_ingest_etl_spark.operators.metrics import (
        reach_frequency_rollup,
    )

    rows = [
        # (event_type, dma, hh_id, view_w, hh_w)
        ("play", "NY", "hh_1", 10, 10),
        ("play", "LA", "hh_1", 10, 10),  # same hh, other dma
        ("play", "NY", "hh_2", 5, 5),
    ]
    m = spark.createDataFrame(
        rows, ["event_type", "dma", "hh_id", "wv", "wh"]
    )
    out = {
        (r["event_type"], r["dma"], r["grouping_level"]): (
            r["weighted_reach"], r["n_households"], r["weighted_views"]
        )
        for r in reach_frequency_rollup(
            m, dims=["event_type", "dma"], hh_col="hh_id",
            view_weight_col="wv", hh_weight_col="wh",
        ).collect()
    }
    assert out[("play", "NY", 0)] == (15, 2, 15)
    assert out[("play", "LA", 0)] == (10, 1, 10)
    # subtotal: hh_1 deduped -> reach 15, NOT 25
    assert out[("play", None, 1)] == (15, 2, 25)
    assert out[(None, None, 2)] == (15, 2, 25)
