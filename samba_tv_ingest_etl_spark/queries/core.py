"""Core reference-parity queries (SURVEY §2 / §5.3) on the driver's
testdata tables.

The driver's ``events(event_id, ts, user_id, event_type, value,
props)`` table stands in for viewing events (FIXTURES.md mapping):
``user_id`` -> household, ``event_type`` -> content key, ``ts`` ->
exposure start, ``floor(value)`` -> duration seconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sessionize import sessionize, with_session_ids
from . import query

SESSION_KEYS = ["user_id", "event_type"]
GAP_SECONDS = 300
MIN_TOTAL_DURATION = 180


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _epoch_seconds(df: DataFrame, col: str):
    """Epoch seconds as long, whether ``col`` arrived as a timestamp or
    as nanos-since-epoch (the driver's parquet is TIMESTAMP(NANOS),
    which Spark surfaces as bigint under nanosAsLong)."""
    if dict(df.dtypes).get(col) == "bigint":
        # integer DIV: exact (double division would lose precision past
        # 2^53); truncation == floor for the positive epochs in data,
        # matching DuckDB floor(epoch(ts)).
        return F.expr(f"{col} DIV 1000000000")
    return F.unix_timestamp(col)


def viewing_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> viewing-event shape (epoch-second longs, like the
    reference's raw layer, SURVEY §1.2)."""
    ev = _events(spark, sf_dir)
    start = _epoch_seconds(ev, "ts")
    dur = F.floor("value").cast("long")
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        start.alias("start_ts"),
        (start + dur).alias("end_ts"),
        dur.alias("duration_s"),
    )


# Shared oracle CTE mirroring viewing_events().
_BASE_CTE = """
base AS (
  SELECT event_id, user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS start_ts,
         CAST(floor(epoch(ts)) AS BIGINT) + CAST(floor(value) AS BIGINT) AS end_ts,
         CAST(floor(value) AS BIGINT) AS duration_s
  FROM events
)
"""

_SESSION_IDS_SQL = f"""
WITH {_BASE_CTE},
ordered AS (
  SELECT *,
         start_ts - LAG(end_ts) OVER (
             PARTITION BY user_id, event_type
             ORDER BY start_ts, event_id) AS gap_seconds
  FROM base
),
marked AS (
  SELECT *,
         CASE WHEN gap_seconds IS NULL OR gap_seconds > {GAP_SECONDS}
              THEN 1 ELSE 0 END AS session_break
  FROM ordered
),
ids AS (
  SELECT *,
         CAST(SUM(session_break) OVER (
             PARTITION BY user_id, event_type
             ORDER BY start_ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS session_id
  FROM marked
)
"""


@query(
    "q13_session_ids",
    oracle=_SESSION_IDS_SQL
    + """
SELECT event_id, user_id, event_type, start_ts, end_ts,
       gap_seconds, session_break, session_id
FROM ids
""",
)
def q13_session_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG-gap -> break flag -> running-sum session ids (W1/P8/W2,
    reference etl-ddl-backfill.sql:123-167)."""
    ev = viewing_events(spark, sf_dir)
    ids = with_session_ids(
        ev,
        SESSION_KEYS,
        order_col="start_ts",
        end_col="end_ts",
        gap_seconds=GAP_SECONDS,
        tiebreak_cols=["event_id"],
    )
    return ids.select(
        "event_id",
        "user_id",
        "event_type",
        "start_ts",
        "end_ts",
        "gap_seconds",
        "session_break",
        "session_id",
    )


@query(
    "q14_sessions",
    oracle=_SESSION_IDS_SQL
    + f"""
SELECT user_id, event_type, session_id,
       MIN(start_ts) AS session_start_ts,
       MAX(end_ts)   AS session_end_ts,
       CAST(SUM(duration_s) AS BIGINT) AS total_duration
FROM ids
GROUP BY user_id, event_type, session_id
HAVING SUM(duration_s) >= {MIN_TOTAL_DURATION}
""",
)
def q14_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session MIN/MAX/SUM + HAVING (A2/A3, reference
    etl-ddl-backfill.sql:169-193)."""
    ev = viewing_events(spark, sf_dir)
    return sessionize(
        ev,
        SESSION_KEYS,
        order_col="start_ts",
        end_col="end_ts",
        duration_col="duration_s",
        gap_seconds=GAP_SECONDS,
        min_total_duration=MIN_TOTAL_DURATION,
        tiebreak_cols=["event_id"],
    )


def sessionized_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: sessionize -> reach & frequency rollup per content key
    (the analysis v_audience_metrics exists for,
    etl-ddl-backfill.sql:211-216)."""
    sessions = q14_sessions(spark, sf_dir)
    return (
        sessions.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.countDistinct("user_id").alias("reach_hh"),
            F.sum("total_duration").alias("total_view_seconds"),
        )
        .withColumn(
            "frequency",
            F.col("n_sessions") / F.col("reach_hh"),
        )
    )
