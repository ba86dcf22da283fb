"""Geo-weight attachment (reference ``etl-ddl-backfill.sql:91-120``).

LEFT JOIN to geo_weights on ``(smba_id, metadata_date = panel_monday)``
followed by NULL filters that make it effectively inner — EXCEPT that a
matching geo row carrying NULL ``hh_id``/``geo_weight`` is also dropped
(SURVEY §1.4-3), so the implementation keeps the literal
``join('left').filter(...)`` shape rather than an inner join.

GEO_WEIGHTS has no uniqueness guarantee on ``(smba_id,
metadata_date)``; duplicate weight rows fan events out through the
join. The reference accepts this; so does the engine (SURVEY §1.4-4).

Scale: both sides shuffle on ``smba_id`` (+date); skewed hot devices
are split by AQE skew-join. If the weights relation fits the broadcast
threshold Catalyst broadcasts it automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def weighted_events(
    events_with_panel: DataFrame,
    geo_weights: DataFrame,
    device_col: str = "smba_id",
    panel_col: str = "panel_monday",
) -> DataFrame:
    g = geo_weights.select(
        F.col(device_col).alias("_g_device"),
        F.col("metadata_date").alias("_g_date"),
        "hh_id",
        F.col("geo_weight").alias("panel_weight"),
    )
    e = events_with_panel
    joined = e.join(
        g,
        (g["_g_device"] == e[device_col]) & (g["_g_date"] == e[panel_col]),
        "left",
    ).drop("_g_device", "_g_date")
    return joined.filter(
        F.col(panel_col).isNotNull()        # valid panel        (:118)
        & F.col("hh_id").isNotNull()        # valid household    (:119)
        & F.col("panel_weight").isNotNull() # valid weight       (:120)
    )
