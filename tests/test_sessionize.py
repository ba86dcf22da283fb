"""Golden sessionization fixtures (SURVEY §5.2 edge checklist):
gap exactly 300 stays, 301 splits, NULL gap first event, negative gap
(overlap), total duration exactly 180 kept, group-split on extra keys.
"""

from __future__ import annotations

from pyspark.sql import types as T

from samba_tv_ingest_etl_spark.operators.sessionize import (
    sessionize,
    with_session_ids,
)

SCHEMA = T.StructType(
    [
        T.StructField("hh_id", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("start_ts", T.LongType()),
        T.StructField("end_ts", T.LongType()),
        T.StructField("duration", T.LongType()),
        T.StructField("weight", T.DoubleType()),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _ids(spark, rows):
    df = with_session_ids(
        _df(spark, rows), ["hh_id", "title"], "start_ts", "end_ts"
    )
    return {
        r["start_ts"]: (r["gap_seconds"], r["session_break"], r["session_id"])
        for r in df.collect()
    }


def test_gap_300_stays_in_session(spark):
    # second event starts exactly 300s after the first one ENDS
    rows = [
        ("h1", "t", 1000, 1100, 100, 1.0),
        ("h1", "t", 1400, 1500, 100, 1.0),
    ]
    out = _ids(spark, rows)
    assert out[1000] == (None, 1, 1)
    assert out[1400] == (300, 0, 1)


def test_gap_301_splits(spark):
    rows = [
        ("h1", "t", 1000, 1100, 100, 1.0),
        ("h1", "t", 1401, 1500, 99, 1.0),
    ]
    out = _ids(spark, rows)
    assert out[1401] == (301, 1, 2)


def test_negative_gap_overlap_stays(spark):
    # overlapping exposures: gap is negative -> same session
    rows = [
        ("h1", "t", 1000, 1200, 200, 1.0),
        ("h1", "t", 1100, 1300, 200, 1.0),
    ]
    out = _ids(spark, rows)
    assert out[1100] == (-100, 0, 1)


def test_gap_measured_from_previous_end_not_start(spark):
    # start-to-start gap is 500 (>300) but end-to-start gap is 100 -> no split
    rows = [
        ("h1", "t", 1000, 1400, 400, 1.0),
        ("h1", "t", 1500, 1600, 100, 1.0),
    ]
    out = _ids(spark, rows)
    assert out[1500] == (100, 0, 1)


def test_sessions_independent_per_partition(spark):
    rows = [
        ("h1", "t", 1000, 1100, 100, 1.0),
        ("h2", "t", 1000, 1100, 100, 1.0),
        ("h1", "u", 1000, 1100, 100, 1.0),
    ]
    df = with_session_ids(_df(spark, rows), ["hh_id", "title"], "start_ts", "end_ts")
    assert [r["session_id"] for r in df.collect()] == [1, 1, 1]


def test_min_duration_exactly_180_kept(spark):
    rows = [
        ("h1", "t", 1000, 1090, 90, 1.0),
        ("h1", "t", 1090, 1180, 90, 1.0),  # sums to exactly 180 -> kept
        ("h2", "t", 1000, 1179, 179, 1.0),  # 179 -> dropped
    ]
    out = sessionize(
        _df(spark, rows), ["hh_id", "title"], "start_ts", "end_ts", "duration"
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["hh_id"] == "h1"
    assert r["total_duration"] == 180
    assert r["session_start_ts"] == 1000 and r["session_end_ts"] == 1180


def test_group_superset_splits_session_rows(spark):
    # same gap-session, two different weights -> two output rows sharing
    # one session_id (reference GROUP BY includes panel_weight,
    # etl-ddl-backfill.sql:190-192; SURVEY §1.4-5)
    rows = [
        ("h1", "t", 1000, 1200, 200, 1.0),
        ("h1", "t", 1250, 1450, 200, 2.0),
    ]
    out = sessionize(
        _df(spark, rows),
        ["hh_id", "title"],
        "start_ts",
        "end_ts",
        "duration",
        group_cols=["hh_id", "title", "weight"],
    ).collect()
    assert len(out) == 2
    assert {r["session_id"] for r in out} == {1}
    assert {r["weight"] for r in out} == {1.0, 2.0}


def test_session_ids_one_based_running_sum(spark):
    rows = [
        ("h1", "t", 1000, 1100, 100, 1.0),
        ("h1", "t", 1500, 1600, 100, 1.0),  # gap 400 -> new session
        ("h1", "t", 1700, 1800, 100, 1.0),  # gap 100 -> same
        ("h1", "t", 5000, 5100, 100, 1.0),  # new session
    ]
    df = with_session_ids(_df(spark, rows), ["hh_id", "title"], "start_ts", "end_ts")
    got = {r["start_ts"]: r["session_id"] for r in df.collect()}
    assert got == {1000: 1, 1500: 2, 1700: 2, 5000: 3}
