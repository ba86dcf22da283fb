"""ACR ∪ STB -> raw_viewing_events (reference
``etl-ddl-backfill.sql:16-63``).

Column-aligned UNION ALL with a ``source_table`` discriminator literal
and ``NULL AS application`` padding for STB (which doesn't carry the
column). Implemented with ``unionByName`` — by-name alignment is safer
than the reference's positional UNION and produces the identical
result here (SURVEY §2.4-U1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# reference projection order (etl-ddl-backfill.sql:18-37)
EVENT_COLUMNS = [
    "source_table",
    "smba_id",
    "content_type",
    "application",
    "title",
    "content_id",
    "episode_title",
    "season",
    "episode",
    "network",
    "duration",
    "exposure_start_ts",
    "exposure_end_ts",
    "dma",
    "zip",
    "metadata_date",
    "yyyy",
    "mm",
    "dd",
]


def _project(df: DataFrame, source: str) -> DataFrame:
    cols = []
    for c in EVENT_COLUMNS:
        if c == "source_table":
            cols.append(F.lit(source).alias(c))
        elif c not in df.columns:
            cols.append(F.lit(None).cast("string").alias(c))
        else:
            # yyyy/mm/dd arrive as int (ACR) or string (STB); normalize
            # to string so the union's schema is well-defined
            if c in ("yyyy", "mm", "dd"):
                cols.append(F.col(c).cast("string").alias(c))
            else:
                cols.append(F.col(c))
    return df.select(*cols)


def raw_viewing_events(acr: DataFrame, stb: DataFrame) -> DataFrame:
    """'ACR' rows ∪ 'STB' rows (STB gets NULL application)."""
    return _project(acr, "ACR").unionByName(_project(stb, "STB"))
