"""Behavioral analytics: ordered funnels and cohort retention.

The reference stops at sessions + reach/frequency (SURVEY §2.5); the
next questions an audience team asks are sequential: "how many users
progressed view -> click -> purchase, in that order?" and "of the
users first seen in week W, how many came back k weeks later?" Both
reduce to per-user min-timestamp aggregation plus integer week
arithmetic — one shuffle on user_id each, no window needed, additive
re-aggregation after, so they hold at any scale and oracle-check
exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query
from .core import _epoch_seconds, _events

_STEPS = ["view", "click", "purchase"]


def _ev_sec(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return ev.select(
        "user_id",
        "event_type",
        _epoch_seconds(ev, "ts").alias("ts_sec"),
    )


# ---------------------------------------------------------------- q50

_FUNNEL_ORACLE = """
WITH ev AS (
  SELECT user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
  FROM events
),
per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts_sec END) AS t_view,
         min(CASE WHEN event_type = 'click' THEN ts_sec END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN ts_sec END) AS t_buy
  FROM ev GROUP BY 1
)
SELECT
  CAST(count(*) AS BIGINT) AS n_users,
  CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_view,
  CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
  CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                 AND t_buy > t_click THEN 1 ELSE 0 END) AS BIGINT)
    AS n_full_funnel
FROM per_user
"""


@query("q50_ordered_funnel", oracle=_FUNNEL_ORACLE)
def q50_ordered_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel view -> click -> purchase: per-user FIRST
    occurrence of each step (conditional min — one hash aggregate on
    user_id, map-side combinable), then ordering comparisons and a
    global additive rollup. No window, no self-join: the classic
    n-way 'sequence' funnel collapses to first-timestamps because
    steps must occur in order after the PREVIOUS step's first
    occurrence. Null comparisons (missing steps) are NULL > x ->
    false on both engines."""
    pu = (
        _ev_sec(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            *[
                F.min(
                    F.when(
                        F.col("event_type") == s, F.col("ts_sec")
                    )
                ).alias(f"t_{s}")
                for s in _STEPS
            ]
        )
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    bought = clicked & (F.col("t_purchase") > F.col("t_click"))
    flag = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    return pu.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        flag(viewed).alias("n_view"),
        flag(clicked).alias("n_view_click"),
        flag(bought).alias("n_full_funnel"),
    )


# ---------------------------------------------------------------- q51

_RETENTION_ORACLE = """
WITH ev AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 // 7 AS week
  FROM events
),
weeks AS (SELECT DISTINCT user_id, week FROM ev),
cohorts AS (
  SELECT user_id, min(week) AS cohort_week FROM weeks GROUP BY 1
)
SELECT c.cohort_week, w.week - c.cohort_week AS week_offset,
       CAST(count(*) AS BIGINT) AS n_active_users
FROM weeks w JOIN cohorts c USING (user_id)
GROUP BY 1, 2
"""


@query("q51_cohort_retention", oracle=_RETENTION_ORACLE)
def q51_cohort_retention(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Weekly cohort retention triangle: cohort = first active epoch
    week, one row per (cohort, week offset) with distinct active
    users. Two aggregations keyed on user_id (dedup to user-weeks,
    then cohort min) — the user-week dedup happens BEFORE the join,
    so the join carries ~users x active-weeks rows, not raw events.
    count(*) is exact-distinct by construction (weeks is deduped)."""
    ev = _ev_sec(spark, sf_dir).select(
        "user_id",
        F.expr("ts_sec DIV 86400 DIV 7").alias("week"),
    )
    weeks = ev.distinct()
    cohorts = weeks.groupBy("user_id").agg(
        F.min("week").alias("cohort_week")
    )
    return (
        weeks.join(cohorts, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias(
                "week_offset"
            ),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_active_users"))
    )


# ---------------------------------------------------------------- q60

_REACH_CURVE_ORACLE = """
WITH ev AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
  FROM events
),
first_day AS (
  SELECT user_id, min(day) AS day FROM ev GROUP BY 1
),
daily_new AS (
  SELECT day, CAST(count(*) AS BIGINT) AS new_users
  FROM first_day GROUP BY 1
)
SELECT day, new_users,
       CAST(sum(new_users) OVER (ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cumulative_reach
FROM daily_new
"""


@query("q60_cumulative_reach_curve", oracle=_REACH_CURVE_ORACLE)
def q60_cumulative_reach_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Campaign reach growth curve: cumulative DISTINCT users by day.
    A naive rolling count-distinct re-scans every prefix; the
    first-appearance rewrite (min day per user -> daily new-user
    counts -> running sum) makes it one user-keyed aggregate plus a
    window over ~days rows. The global window runs on day-grain data
    (a few thousand rows for years), not events — the reach curve of
    the reference's audience metrics extended to time series."""
    ev = _ev_sec(spark, sf_dir).select(
        "user_id", F.expr("ts_sec DIV 86400").alias("day")
    )
    first_day = ev.groupBy("user_id").agg(F.min("day").alias("day"))
    daily_new = first_day.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("new_users")
    )
    from pyspark.sql import Window

    w = (
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily_new.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("long").alias(
            "cumulative_reach"
        ),
    )


# ---------------------------------------------------------------- q80

_TRANSITION_ORACLE = """
WITH ev AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
  FROM events
),
seq AS (
  SELECT coalesce(LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY ts_sec, event_id),
           '__start__') AS from_type,
         event_type AS to_type
  FROM ev
),
t AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n_transitions
  FROM seq GROUP BY 1, 2
)
SELECT from_type, to_type, n_transitions,
       CAST((n_transitions * 1000000) //
            SUM(n_transitions) OVER (PARTITION BY from_type)
         AS BIGINT) AS ppm_of_from
FROM t
"""


@query("q80_session_transitions", oracle=_TRANSITION_ORACLE)
def q80_session_transitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First-order user-journey transition matrix: per-user event
    sequences (LAG over one user_id shuffle, '__start__' for session
    entry), rolled up to (from, to) counts plus the row-normalized
    transition rate in integer ppm. The per-from normalization runs
    over the MATRIX (|types|^2 rows), not events — the classic
    two-grain plan: heavy shuffle once at user grain, windows only
    on the tiny aggregate."""
    from pyspark.sql import Window

    raw = _events(spark, sf_dir)
    ev = raw.select(
        "user_id",
        "event_id",
        "event_type",
        _epoch_seconds(raw, "ts").alias("ts_sec"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    seq = ev.select(
        F.coalesce(
            F.lag("event_type").over(w), F.lit("__start__")
        ).alias("from_type"),
        F.col("event_type").alias("to_type"),
    )
    t = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_transitions")
    )
    fw = Window.partitionBy("from_type")
    # exact integer DIV (both sides positive -> trunc == floor ==
    # DuckDB //); double division could round past the floor
    return (
        t.withColumn("_tot", F.sum("n_transitions").over(fw))
        .withColumn(
            "ppm_of_from",
            F.expr("n_transitions * 1000000 DIV _tot").cast("long"),
        )
        .drop("_tot")
    )


# ---------------------------------------------------------------- q85

_COOC_ORACLE = """
WITH b AS (
  SELECT DISTINCT user_id, event_type FROM events
),
n AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_users
  FROM b GROUP BY 1
),
co AS (
  SELECT a.event_type AS type_a, c.event_type AS type_b,
         CAST(count(*) AS BIGINT) AS n_co
  FROM b a JOIN b c
    ON a.user_id = c.user_id AND a.event_type < c.event_type
  GROUP BY 1, 2
)
SELECT co.type_a, co.type_b, co.n_co,
       CAST(floor(1000000 * CAST(co.n_co AS DOUBLE) /
            sqrt(CAST(na.n_users AS DOUBLE) *
                 CAST(nb.n_users AS DOUBLE))) AS BIGINT)
         AS cos_scaled
FROM co
JOIN n na ON na.event_type = co.type_a
JOIN n nb ON nb.event_type = co.type_b
"""


@query("q85_item_cooccurrence", oracle=_COOC_ORACLE)
def q85_item_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item co-occurrence cosine over user baskets (the
    collaborative-filtering similarity core): distinct (user, item)
    baskets, self-join on user_id for pair counts, per-item totals
    broadcast back, scaled-integer cosine. The user_id self-join is
    the standard plan while per-user basket width is bounded (here
    |event types|); for catalog-scale baskets switch to
    collect_set-per-user + bounded pair explode so the shuffle
    carries pair rows, not a user-keyed cross product."""
    b = (
        _events(spark, sf_dir)
        .select("user_id", "event_type")
        .distinct()
    )
    b = b.localCheckpoint(eager=True)  # reused 3x: pairs (both sides) + totals
    n = b.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    a = b.select("user_id", F.col("event_type").alias("type_a"))
    c = b.select("user_id", F.col("event_type").alias("type_b"))
    co = (
        a.join(c, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_co"))
    )
    na = F.broadcast(n.select(F.col("event_type").alias("type_a"),
                              F.col("n_users").alias("_na")))
    nb = F.broadcast(n.select(F.col("event_type").alias("type_b"),
                              F.col("n_users").alias("_nb")))
    return (
        co.join(na, "type_a")
        .join(nb, "type_b")
        .select(
            "type_a",
            "type_b",
            "n_co",
            F.floor(
                F.lit(1_000_000)
                * F.col("n_co").cast("double")
                / F.sqrt(
                    F.col("_na").cast("double")
                    * F.col("_nb").cast("double")
                )
            )
            .cast("long")
            .alias("cos_scaled"),
        )
    )


# ---------------------------------------------------------------- q98

_DECAY_HALF_LIFE_DAYS = 7

_DECAY_ORACLE = f"""
WITH ev AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
anchor AS (SELECT max(day) AS now_day FROM ev),
w AS (
  SELECT user_id,
         cents // (1 << CAST(least((a.now_day - day)
                      // {_DECAY_HALF_LIFE_DAYS}, 62) AS INT))
           AS decayed
  FROM ev, anchor a
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(decayed) AS BIGINT) AS decayed_cents
FROM w GROUP BY 1
"""


@query("q98_decayed_engagement", oracle=_DECAY_ORACLE)
def q98_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted engagement scoring with an EXACT integer
    decay: value halves every {_DECAY_HALF_LIFE_DAYS} days via a bit
    shift (cents >> floor(age / half_life)) — step-wise exponential
    decay with none of the float pow() drift that breaks
    cross-engine reproducibility. The anchor 'now' is the corpus max
    day (a 1-row scalar), so the score is a pure function of the
    data. One shuffle: the per-user aggregate."""
    from .core import _epoch_seconds

    raw = _events(spark, sf_dir)
    ev = raw.select(
        "user_id",
        _epoch_seconds(raw, "ts").alias("ts_sec"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    ).select(
        "user_id", F.expr("ts_sec DIV 86400").alias("day"), "cents"
    )
    now_day = ev.agg(F.max("day")).collect()[0][0]
    # cents >= 0 in this corpus, so Spark's truncating DIV equals the
    # oracle's floor division
    decayed = F.expr(
        f"cents DIV shiftleft(1L, CAST(least((({int(now_day)} - day) DIV "
        f"{_DECAY_HALF_LIFE_DAYS}), 62) AS INT))"
    )
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(decayed).cast("long").alias("decayed_cents"),
    )
