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


def _as_date(df: DataFrame, col: str):
    """DATE from a column that may be a timestamp or nanos-since-epoch
    bigint (driver parquet under nanosAsLong)."""
    if dict(df.dtypes).get(col) == "bigint":
        return F.to_date(F.timestamp_micros(F.expr(f"{col} DIV 1000")))
    return F.to_date(col)


@query(
    "q01_scan_cast_project",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(l_quantity AS BIGINT) AS quantity,
       CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
       l_returnflag,
       CAST(l_shipdate AS DATE) AS ship_date
FROM lineitem
WHERE l_quantity > 10
""",
)
def q01_scan_cast_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan + explicit casts + projection + pushed filter
    (S3/P1/P4/P5 — the '$1:field::TYPE' idiom collapses to typed reads
    + .cast, SURVEY §1.2). Filter and pruned columns reach the scan."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.filter(F.col("l_quantity") > 10).select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("long").alias("quantity"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_cents"),
        "l_returnflag",
        _as_date(li, "l_shipdate").alias("ship_date"),
    )


@query(
    "q02_path_partition_extraction",
    oracle=r"""
WITH paths AS (
  SELECT event_id,
         CASE WHEN event_id % 13 = 0
              THEN 'EVENTS/yyyy=__HIVE_DEFAULT_PARTITION__/mm=__HIVE_DEFAULT_PARTITION__/dd=__HIVE_DEFAULT_PARTITION__/part-0.parquet'
              ELSE concat('EVENTS/yyyy=', strftime(ts, '%Y'),
                          '/mm=', strftime(ts, '%m'),
                          '/dd=', strftime(ts, '%d'), '/part-0.parquet')
         END AS file_path
  FROM events
),
extracted AS (
  SELECT event_id, file_path,
         nullif(regexp_replace(file_path, '.*/yyyy=(\d{4})/.*', '\1'),
                '__HIVE_DEFAULT_PARTITION__') AS yyyy,
         nullif(regexp_replace(file_path, '.*/mm=(\d{2})/.*', '\1'),
                '__HIVE_DEFAULT_PARTITION__') AS mm,
         nullif(regexp_replace(file_path, '.*/dd=(\d{2})/.*', '\1'),
                '__HIVE_DEFAULT_PARTITION__') AS dd
  FROM paths
)
SELECT event_id, file_path, yyyy, mm, dd,
       try_cast(yyyy || '-' || mm || '-' || dd AS DATE) AS metadata_date
FROM extracted
""",
)
def q02_path_partition_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """metadata$filename partition extraction (F1-F4/S6, reference
    ingest-dag.sql:7-28): regexp_replace backref + nullif hive-default
    + NULL-propagating concat + try_to_date. Paths are synthesized from
    event dates (1/13 of rows get a hive-default path)."""
    from ..functions.paths import HIVE_DEFAULT, partition_columns

    ev = _events(spark, sf_dir)
    d = F.timestamp_seconds(_epoch_seconds(ev, "ts"))
    default_path = (
        f"EVENTS/yyyy={HIVE_DEFAULT}/mm={HIVE_DEFAULT}/dd={HIVE_DEFAULT}"
        "/part-0.parquet"
    )
    path = F.when(F.col("event_id") % 13 == 0, F.lit(default_path)).otherwise(
        F.concat(
            F.lit("EVENTS/yyyy="), F.date_format(d, "yyyy"),
            F.lit("/mm="), F.date_format(d, "MM"),
            F.lit("/dd="), F.date_format(d, "dd"),
            F.lit("/part-0.parquet"),
        )
    )
    out = ev.select("event_id", path.alias("file_path"))
    parts = partition_columns(F.col("file_path"))
    for name, col in parts.items():
        out = out.withColumn(name, col)
    return out


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
