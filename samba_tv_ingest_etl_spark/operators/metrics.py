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


def reach_frequency_rollup(
    metrics: DataFrame,
    dims: Sequence[str],
    hh_col: str = "hh_id",
    view_weight_col: str = "weighted_view",
    hh_weight_col: str = "weighted_hh",
) -> DataFrame:
    """Hierarchical (ROLLUP-style) reach/frequency over ``dims``
    with a ``grouping_level`` column (0 = finest, len(dims) = grand
    total), suppressed dims NULL-padded.

    Reach does NOT distribute over dimensions — each grouping set
    must dedup households independently, so a naive ``df.rollup()``
    over pre-aggregated rows would double-count reach. Instead the
    finest per-household aggregate is computed once (the only shuffle
    that sees session-grain data) and re-aggregated per level:
    sum-of-sums / max-of-maxes / sum-of-counts compose exactly.
    Coarser levels shuffle only the per-household table (|hh| rows),
    which at 100 TB is orders of magnitude smaller than sessions."""
    per_hh = (
        metrics.groupBy(*dims, hh_col)
        .agg(
            F.sum(view_weight_col).alias("_hh_views"),
            F.max(hh_weight_col).alias("_hh_weight"),
            F.count(F.lit(1)).alias("_hh_sessions"),
        )
        # GC-owned materialization (NOT .persist()): every rollup
        # level re-reads this one table, but a CacheManager entry
        # would outlive the query — a service calling the rollup
        # repeatedly accumulates session-lifetime pins nobody
        # unpersists. localCheckpoint gives the same reuse (levels
        # scan the materialized partitions) and the ContextCleaner
        # reclaims the blocks when the result DataFrame is dropped —
        # the same discipline as the dedup chain's lineage barrier
        # (operators/dedup.py). Eager: the session-grain shuffle runs
        # exactly once, here, not lazily per level. Bounded: |hh|
        # rows per invocation.
        .localCheckpoint(eager=True)
    )
    dim_schema = {
        f.name: f.dataType for f in metrics.select(*dims).schema.fields
    }
    out = None
    for lvl in range(len(dims) + 1):
        keep = list(dims[: len(dims) - lvl])
        ph = per_hh
        if lvl:
            ph = per_hh.groupBy(*keep, hh_col).agg(
                F.sum("_hh_views").alias("_hh_views"),
                F.max("_hh_weight").alias("_hh_weight"),
                F.sum("_hh_sessions").alias("_hh_sessions"),
            )
        agg = ph.groupBy(*keep).agg(
            F.sum("_hh_views").alias("weighted_views"),
            F.sum("_hh_weight").alias("weighted_reach"),
            F.sum("_hh_sessions").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_households"),
        )
        for d in dims[len(dims) - lvl:]:
            agg = agg.withColumn(d, F.lit(None).cast(dim_schema[d]))
        agg = agg.select(
            *dims,
            F.lit(lvl).cast("int").alias("grouping_level"),
            "weighted_views", "weighted_reach",
            "n_sessions", "n_households",
        )
        out = agg if out is None else out.unionByName(agg)
    return out.withColumn(
        "frequency",
        F.col("weighted_views").cast("double")
        / F.col("weighted_reach").cast("double"),
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
