"""Temporal-join queries: as-of attribution of events to the latest
preceding order state.

The reference's attribution is day-grain equi-join only
(``weighting.sql``; SURVEY §2.3 J3); these queries add the sub-day
temporal surface (as-of join) a real attribution / training-data
pipeline needs. Oracle: DuckDB's native ``ASOF LEFT JOIN``, which
pins the exact greatest-ts-at-or-before semantics our union+window
plan must reproduce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from . import query
from .core import _epoch_seconds, _events

_ORD_CTE = """
ord AS (
  SELECT o_custkey AS user_id,
         CAST(floor(epoch(o_orderdate)) AS BIGINT) AS od_sec,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS max_order_cents
  FROM orders GROUP BY 1, 2
)
"""


def _order_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (customer, order-date) rollup — unique per (key, ts), as
    ``asof_join`` requires. Mirrors _ORD_CTE."""
    ords = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        ords.select(
            F.col("o_custkey").alias("user_id"),
            F.unix_timestamp("o_orderdate").alias("od_sec"),
            F.round(F.col("o_totalprice") * 100)
            .cast("long")
            .alias("cents"),
        )
        .groupBy("user_id", "od_sec")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.max("cents").alias("max_order_cents"),
        )
    )


# ---------------------------------------------------------------- q39

@query(
    "q39_asof_order_attribution",
    oracle=f"""
WITH ev AS (
  SELECT event_id, user_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
  FROM events
),
{_ORD_CTE}
SELECT e.event_id, e.user_id, e.ts_sec,
       o.od_sec AS order_sec, o.n_orders, o.max_order_cents,
       (e.ts_sec - o.od_sec) // 86400 AS days_since_order
FROM ev e ASOF LEFT JOIN ord o
  ON e.user_id = o.user_id AND e.ts_sec >= o.od_sec
""",
)
def q39_asof_order_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Each event attributed to the customer's latest order placed
    at-or-before the event: one union+window as-of join (single
    shuffle on user_id — see ``operators/asof.py``). Unmatched events
    (no prior order) survive with nulls, so the left-join semantics
    are checked too."""
    ev = _events(spark, sf_dir)
    ev = ev.select(
        "event_id",
        "user_id",
        _epoch_seconds(ev, "ts").alias("ts_sec"),
    )
    out = asof_join(
        ev,
        _order_state(spark, sf_dir),
        on=["user_id"],
        left_ts="ts_sec",
        right_ts="od_sec",
        how="left",
        matched_ts_alias="order_sec",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts_sec",
        "order_sec",
        "n_orders",
        "max_order_cents",
        F.expr("(ts_sec - order_sec) DIV 86400").alias(
            "days_since_order"
        ),
    )


# ---------------------------------------------------------------- q40

@query(
    "q40_asof_recency_cohorts",
    oracle=f"""
WITH ev AS (
  SELECT event_id, user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
  FROM events
),
{_ORD_CTE},
matched AS (
  SELECT e.event_type, e.ts_sec, o.od_sec
  FROM ev e ASOF JOIN ord o
    ON e.user_id = o.user_id AND e.ts_sec >= o.od_sec
  WHERE e.ts_sec - o.od_sec <= 30 * 365 * 86400
)
SELECT event_type,
       (ts_sec - od_sec) // (365 * 86400) AS recency_years,
       CAST(count(*) AS BIGINT) AS n_events
FROM matched GROUP BY 1, 2
""",
)
def q40_asof_recency_cohorts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Recency cohorts: events bucketed by whole-year age of the
    latest prior order, capped at 30 years via the as-of join's
    tolerance (inner + tolerance == DuckDB ASOF JOIN + age
    predicate). The narrow select before the join keeps the shuffled
    rows to three columns."""
    ev = _events(spark, sf_dir)
    ev = ev.select(
        "event_id",
        "user_id",
        "event_type",
        _epoch_seconds(ev, "ts").alias("ts_sec"),
    )
    out = asof_join(
        ev,
        _order_state(spark, sf_dir).select(
            "user_id", "od_sec", "n_orders"
        ),
        on=["user_id"],
        left_ts="ts_sec",
        right_ts="od_sec",
        how="inner",
        tolerance=30 * 365 * 86400,
        matched_ts_alias="od_sec",
    )
    return (
        out.groupBy(
            "event_type",
            F.expr("(ts_sec - od_sec) DIV (365 * 86400)").alias(
                "recency_years"
            ),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )

# ---------------------------------------------------------------- q47

def _coactivity_oracle() -> str:
    from .core import MIN_TOTAL_DURATION, _SESSION_IDS_SQL

    return f"""{_SESSION_IDS_SQL},
sess AS (
  SELECT user_id, event_type, session_id,
         MIN(start_ts) AS s_start, MAX(end_ts) AS s_end
  FROM ids GROUP BY 1, 2, 3
  HAVING SUM(duration_s) >= {MIN_TOTAL_DURATION}
)
SELECT s.user_id, s.event_type, s.session_id,
       CAST(count(b.event_id) AS BIGINT) AS n_other_events
FROM sess s LEFT JOIN base b
  ON b.start_ts BETWEEN s.s_start AND s.s_end
 AND b.user_id <> s.user_id
GROUP BY 1, 2, 3
"""


@query("q47_session_coactivity", oracle=_coactivity_oracle())
def q47_session_coactivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per qualified session, how many events OTHER users produced
    inside its time span — a keyless range join (the only join key is
    the time containment itself; the <> predicate rules out an
    equi-join rewrite). Runs through the bucketed interval join
    (operators/interval.py): hour-wide buckets turn the would-be
    nested loop into an equi-shuffle on bucket id; the oracle is the
    plain BETWEEN theta-join. LEFT semantics (sessions with zero
    co-activity survive) come from re-attaching counts to the session
    table with a broadcast of the aggregated — tiny — count side."""
    from ..operators.interval import interval_join
    from .core import q14_sessions, viewing_events

    sess = q14_sessions(spark, sf_dir).select(
        F.col("user_id").alias("s_user"),
        F.col("event_type").alias("s_type"),
        "session_id",
        F.col("session_start_ts").alias("s_start"),
        F.col("session_end_ts").alias("s_end"),
    )
    pts = viewing_events(spark, sf_dir).select(
        "event_id", "user_id", "start_ts"
    )
    sess = sess.localCheckpoint(eager=True)  # reused: join input + re-attach; GC-owned
    hits = (
        interval_join(
            pts,
            sess,
            point_ts="start_ts",
            start_col="s_start",
            end_col="s_end",
            bucket_width=3600,
        )
        .filter(F.col("user_id") != F.col("s_user"))
        .groupBy("s_user", "s_type", "session_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_other_events"))
    )
    return (
        sess.join(
            F.broadcast(hits),
            ["s_user", "s_type", "session_id"],
            "left",
        )
        .select(
            F.col("s_user").alias("user_id"),
            F.col("s_type").alias("event_type"),
            "session_id",
            F.coalesce("n_other_events", F.lit(0)).alias(
                "n_other_events"
            ),
        )
    )


# ---------------------------------------------------------------- q77

_SCD2_ORACLE = """
WITH ev AS (
  SELECT user_id, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
         CAST(json_extract(props, '$.k') AS BIGINT) // 25 AS tier
  FROM events
),
lagged AS (
  SELECT *, LAG(tier) OVER (
           PARTITION BY user_id ORDER BY ts_sec, event_id
         ) AS prev_tier
  FROM ev
),
runs AS (
  SELECT user_id, tier, ts_sec, event_id FROM lagged
  WHERE prev_tier IS DISTINCT FROM tier
)
SELECT user_id, tier,
       CAST(row_number() OVER (
         PARTITION BY user_id ORDER BY ts_sec, event_id
       ) AS BIGINT) AS version,
       ts_sec AS valid_from,
       LEAD(ts_sec) OVER (
         PARTITION BY user_id ORDER BY ts_sec, event_id) AS valid_to
FROM runs
"""


@query("q77_scd2_user_tier_history", oracle=_SCD2_ORACLE)
def q77_scd2_user_tier_history(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SCD2 dimension history from the event stream: each user's
    ``tier`` (a props-derived attribute) as [valid_from, valid_to)
    versioned intervals — the standard type-2 build the reference's
    insert-only warehouse lacks (``operators/scd.py``). One shuffle
    on user_id; the run-length collapse happens before the validity
    LEAD, so the second window processes transitions, not events.
    Composes with ``asof_join`` (q39/q40) for point-in-time
    attribute lookup."""
    from ..operators.scd import scd2_history

    ev = _events(spark, sf_dir)
    src = ev.select(
        "user_id",
        "event_id",
        _epoch_seconds(ev, "ts").alias("ts_sec"),
        (F.get_json_object("props", "$.k").cast("long") / 25)
        .cast("long")
        .alias("tier"),
    )
    out = scd2_history(
        src,
        keys=["user_id"],
        ts_col="ts_sec",
        attrs=["tier"],
        tiebreak=["event_id"],
    )
    return out.select(
        "user_id", "tier", "version", "valid_from", "valid_to"
    )


# ---------------------------------------------------------------- q89

_PIT_ORACLE = """
WITH ev AS (
  SELECT user_id, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
         CAST(json_extract(props, '$.k') AS BIGINT) // 25 AS tier
  FROM events
),
lagged AS (
  SELECT *, LAG(tier) OVER (
           PARTITION BY user_id ORDER BY ts_sec, event_id
         ) AS prev_tier
  FROM ev
),
runs AS (
  SELECT user_id, tier, ts_sec, event_id FROM lagged
  WHERE prev_tier IS DISTINCT FROM tier
),
hist AS (
  SELECT user_id, tier,
         CAST(row_number() OVER (
           PARTITION BY user_id ORDER BY ts_sec, event_id
         ) AS BIGINT) AS version,
         ts_sec AS valid_from,
         LEAD(ts_sec) OVER (
           PARTITION BY user_id ORDER BY ts_sec, event_id
         ) AS valid_to
  FROM runs
),
live AS (
  SELECT * FROM hist WHERE valid_to IS NULL OR valid_from < valid_to
)
SELECT e.event_id, e.user_id, e.ts_sec,
       h.tier AS tier_at_event, h.version AS tier_version
FROM ev e JOIN live h
  ON e.user_id = h.user_id
 AND e.ts_sec >= h.valid_from
 AND (h.valid_to IS NULL OR e.ts_sec < h.valid_to)
"""


@query("q89_point_in_time_features", oracle=_PIT_ORACLE)
def q89_point_in_time_features(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Point-in-time feature attachment (the feature-store
    correctness primitive): every event gets the attribute version
    that was VALID AT ITS TIMESTAMP — no leakage from the future.
    Composes the engine's SCD2 build (q77) with the union+window
    as-of join (q39): history rows with empty [from, to) intervals
    (two same-second transitions) are dropped so the as-of match is
    exactly interval containment, and the oracle checks it against a
    literal interval join. Two shuffles total, both on user_id."""
    from ..operators.asof import asof_join
    from ..operators.scd import scd2_history

    ev = _events(spark, sf_dir)
    src = ev.select(
        "user_id",
        "event_id",
        _epoch_seconds(ev, "ts").alias("ts_sec"),
        (F.get_json_object("props", "$.k").cast("long") / 25)
        .cast("long")
        .alias("tier"),
    )
    hist = scd2_history(
        src, keys=["user_id"], ts_col="ts_sec", attrs=["tier"],
        tiebreak=["event_id"],
    )
    live = hist.filter(
        F.col("valid_to").isNull()
        | (F.col("valid_from") < F.col("valid_to"))
    ).select(
        "user_id",
        F.col("valid_from"),
        F.col("tier").alias("tier_at_event"),
        F.col("version").alias("tier_version"),
    )
    out = asof_join(
        src.select("user_id", "event_id", "ts_sec"),
        live,
        on=["user_id"],
        left_ts="ts_sec",
        right_ts="valid_from",
        how="inner",
        matched_ts_alias="_from",
    )
    return out.select(
        "event_id", "user_id", "ts_sec", "tier_at_event",
        "tier_version",
    )
