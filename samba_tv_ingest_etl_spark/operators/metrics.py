"""Audience metrics view + reach/frequency rollups.

``audience_metrics`` — reference ``etl-ddl-backfill.sql:196-222``
(the only VIEW): per-session weighted projections. A session counts as
one view with its panel weight; ``weighted_duration = total_duration *
panel_weight``; ``metadata_date = TO_DATE(TO_TIMESTAMP(start))`` ->
``to_date(timestamp_seconds(...))`` (SURVEY §1.4-9).

``reach_frequency`` — the downstream aggregation the view is designed
for (comments at ``:211-216``): per group, views = Σ weighted_view
over sessions; reach counts each household ONCE with its weight;
frequency = views / reach. Two-level aggregation so the per-household
dedup is exact and shuffle-efficient (partial aggs map-side, the
second agg reuses the first's hash partitioning on a key prefix).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def audience_metrics(viewing_sessions: DataFrame) -> DataFrame:
    dims = [
        "title", "content_id", "episode_title", "season", "episode",
        "network", "content_type", "application", "source_table",
        "panel_monday", "dma", "hh_id", "panel_weight",
    ]
    return viewing_sessions.select(
        *dims,
        F.col("panel_weight").alias("weighted_view"),
        F.col("panel_weight").alias("weighted_hh"),
        (F.col("total_duration") * F.col("panel_weight")).alias("weighted_duration"),
        "session_start_ts",
        "session_end_ts",
        "total_duration",
        F.to_date(F.timestamp_seconds("session_start_ts")).alias("metadata_date"),
    )


def reach_frequency(
    metrics: DataFrame,
    group_cols: Sequence[str],
    hh_col: str = "hh_id",
    view_weight_col: str = "weighted_view",
    hh_weight_col: str = "weighted_hh",
) -> DataFrame:
    """views / weighted reach / frequency per group (engine-defined —
    the reference ships only the view these are computed from)."""
    per_hh = (
        metrics.groupBy(*group_cols, hh_col)
        .agg(
            F.sum(view_weight_col).alias("_hh_views"),
            F.max(hh_weight_col).alias("_hh_weight"),
            F.count(F.lit(1)).alias("_hh_sessions"),
        )
    )
    return (
        per_hh.groupBy(*group_cols)
        .agg(
            F.sum("_hh_views").alias("weighted_views"),
            F.sum("_hh_weight").alias("weighted_reach"),
            F.sum("_hh_sessions").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_households"),
        )
        .withColumn(
            "frequency", F.col("weighted_views") / F.col("weighted_reach")
        )
    )
