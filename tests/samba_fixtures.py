"""In-process Samba-shaped fixtures (FIXTURES.md edge-case checklist).

Panel Mondays M1=2025-06-02, M2=2025-06-09 with windows
[05-05..06-01] and [05-12..06-08].

Cases encoded:
- A: dev_1 event dated 05-20 covered by BOTH windows -> MAX (M2) wins;
     gaps 300 (stays) / 301 (splits); split session <180s dropped.
- B: dev_2 dated 05-10 -> M1 only; geo has a DUPLICATE weight row ->
     event fans out, doubling session duration.
- C: dev_5 has no geo row -> dropped at hh_id IS NOT NULL.
- D: event dated 06-20 has no covering window -> panel NULL, dropped.
- E: household hh_6 with two devices carrying different weights ->
     one gap-session splits into two output rows sharing session_id.
- F: dev_3 geo row with NULL weight -> dropped at geo_weight filter.
- non-Monday geo row (06-04) excluded from panel_windows.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

M1 = dt.date(2025, 6, 2)
M2 = dt.date(2025, 6, 9)

_GEO_SCHEMA = T.StructType([
    T.StructField("yyyy", T.StringType()),
    T.StructField("mm", T.StringType()),
    T.StructField("dd", T.StringType()),
    T.StructField("metadata_date", T.DateType()),
    T.StructField("hh_id", T.StringType()),
    T.StructField("smba_id", T.StringType()),
    T.StructField("geo_weight", T.DoubleType()),
])


def _geo(d, hh, dev, w):
    return (f"{d.year:04d}", f"{d.month:02d}", f"{d.day:02d}", d, hh, dev, w)


def geo_weights(spark):
    rows = [
        _geo(M1, "hh_1", "dev_1", 1.5),
        _geo(M2, "hh_1", "dev_1", 1.6),
        _geo(M1, "hh_2", "dev_2", 0.8),
        _geo(M1, "hh_2", "dev_2", 0.8),            # duplicate -> fan-out
        _geo(M1, "hh_3", "dev_3", None),           # NULL weight -> dropped
        _geo(dt.date(2025, 6, 4), "hh_4", "dev_4", 1.0),  # non-Monday
        _geo(M2, "hh_6", "dev_6a", 1.0),
        _geo(M2, "hh_6", "dev_6b", 2.0),
    ]
    return spark.createDataFrame(rows, _GEO_SCHEMA)


_EVENT_FIELDS = [
    ("smba_id", T.StringType()),
    ("content_type", T.StringType()),
    ("title", T.StringType()),
    ("content_id", T.StringType()),
    ("episode_title", T.StringType()),
    ("season", T.StringType()),
    ("episode", T.StringType()),
    ("network", T.StringType()),
    ("duration", T.LongType()),
    ("exposure_start_ts", T.LongType()),
    ("exposure_end_ts", T.LongType()),
    ("dma", T.StringType()),
    ("zip", T.StringType()),
    ("metadata_date", T.DateType()),
]


def _event(dev, title, cid, start, end, dur, d):
    return {
        "smba_id": dev, "content_type": "live", "title": title,
        "content_id": cid, "episode_title": None, "season": None,
        "episode": None, "network": "N1", "duration": dur,
        "exposure_start_ts": start, "exposure_end_ts": end,
        "dma": "501", "zip": "10001", "metadata_date": d,
    }


def _with_parts(row, yyyy_int):
    d = row["metadata_date"]
    if yyyy_int:
        row.update(yyyy=d.year, mm=d.month, dd=d.day, application="app_01",
                   release_date=None)
    else:
        row.update(yyyy=f"{d.year:04d}", mm=f"{d.month:02d}", dd=f"{d.day:02d}")
    return row


def acr(spark):
    """ACR feed: cases A (gap 300/301), D (no window), E (hh_6 split)."""
    d_a = dt.date(2025, 5, 20)
    d_e = dt.date(2025, 5, 15)
    rows = [
        _event("dev_1", "titleA", "ct1", 1000, 1100, 100, d_a),
        _event("dev_1", "titleA", "ct1", 1400, 1500, 100, d_a),  # gap 300
        _event("dev_1", "titleA", "ct1", 1801, 1901, 100, d_a),  # gap 301
        _event("dev_1", "titleD", "ct4", 9000, 9300, 300, dt.date(2025, 6, 20)),
        _event("dev_6a", "titleE", "ct5", 5000, 5200, 200, d_e),
        _event("dev_6b", "titleE", "ct5", 5300, 5500, 200, d_e),
    ]
    rows = [_with_parts(r, yyyy_int=True) for r in rows]
    schema = T.StructType(
        [T.StructField(n, t) for n, t in _EVENT_FIELDS]
        + [
            T.StructField("yyyy", T.IntegerType()),
            T.StructField("mm", T.IntegerType()),
            T.StructField("dd", T.IntegerType()),
            T.StructField("application", T.StringType()),
            T.StructField("release_date", T.DateType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def stb(spark):
    """STB feed: cases B (fan-out) and C (no geo row)."""
    rows = [
        _event("dev_2", "titleB", "ct2", 2000, 2200, 200, dt.date(2025, 5, 10)),
        _event("dev_5", "titleC", "ct3", 3000, 3400, 400, dt.date(2025, 5, 20)),
        _event("dev_3", "titleF", "ct6", 4000, 4400, 400, dt.date(2025, 5, 10)),
    ]
    rows = [_with_parts(r, yyyy_int=False) for r in rows]
    schema = T.StructType(
        [T.StructField(n, t) for n, t in _EVENT_FIELDS]
        + [
            T.StructField("yyyy", T.StringType()),
            T.StructField("mm", T.StringType()),
            T.StructField("dd", T.StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema)
