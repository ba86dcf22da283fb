"""SCD2 history build: run-length semantics on hand-built timelines."""

from __future__ import annotations

from samba_tv_ingest_etl_spark.operators.scd import scd2_history


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )


def test_scd2_runs_and_validity(spark):
    src = spark.createDataFrame(
        [
            # user 1: A -> A -> B -> A  (flip-back = new version)
            (1, 10, 1, "A"),
            (1, 20, 2, "A"),
            (1, 30, 3, "B"),
            (1, 40, 4, "A"),
            # user 2: single run, stays current
            (2, 15, 5, "X"),
        ],
        "user_id long, ts long, event_id long, attr string",
    )
    out = scd2_history(
        src, keys=["user_id"], ts_col="ts", attrs=["attr"],
        tiebreak=["event_id"],
    )
    assert _rows(out.select(
        "user_id", "attr", "version", "valid_from", "valid_to"
    )) == [
        (1, "A", 1, 10, 30),
        (1, "A", 3, 40, None),
        (1, "B", 2, 30, 40),
        (2, "X", 1, 15, None),
    ]


def test_scd2_null_attr_runs_collapse(spark):
    # NULL == NULL for run purposes (null-safe compare): one version,
    # then a real value starts version 2
    src = spark.createDataFrame(
        [(1, 10, 1, None), (1, 20, 2, None), (1, 30, 3, "V")],
        "user_id long, ts long, event_id long, attr string",
    )
    out = scd2_history(
        src, keys=["user_id"], ts_col="ts", attrs=["attr"],
        tiebreak=["event_id"],
    )
    assert _rows(out.select("attr", "version", "valid_from")) == [
        ("V", 2, 30),
        (None, 1, 10),
    ]


def test_scd2_same_ts_tiebreak_deterministic(spark):
    # two events at the same ts: event_id orders them, so the run
    # boundary is stable across shuffles/retries
    src = spark.createDataFrame(
        [(1, 10, 2, "B"), (1, 10, 1, "A"), (1, 20, 3, "B")],
        "user_id long, ts long, event_id long, attr string",
    )
    out = scd2_history(
        src, keys=["user_id"], ts_col="ts", attrs=["attr"],
        tiebreak=["event_id"],
    )
    assert _rows(out.select("attr", "version")) == [
        ("A", 1),
        ("B", 2),
    ]
