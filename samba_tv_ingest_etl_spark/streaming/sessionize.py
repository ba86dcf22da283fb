"""Streaming sessionization — two variants (SURVEY §2.6/§2.9).

1. ``sessionize_stream_window`` — the idiomatic built-in:
   ``session_window(event_time, gap)`` + watermark. NOT bit-identical
   to the reference: ``session_window`` merges events whose
   ``[start, start+gap)`` intervals overlap (gap measured from event
   START), while the reference cuts when
   ``start - previous_END > gap``. For instantaneous events the two
   agree; for events with duration the built-in is stricter. Use it
   when streaming-native semantics are acceptable.

2. ``sessionize_stream_stateful`` — ``applyInPandasWithState`` with
   the reference's exact rule (gap from previous event's END, break
   iff gap > gap_seconds, ``HAVING total_duration >= min``). Closed
   sessions are emitted as soon as a later event proves the cut;
   the open tail session per key stays in state until a later batch
   closes it (production: event-time timeout flush; tests close with
   a sentinel). Correct under per-key in-order arrival across
   batches — the streaming analog of the batch operator, not a
   replacement for the late-data recompute (that remains the
   incremental DAG's job).

Scale: state is O(1) per active (hh, title, content) group — a few
dozen bytes each; the shuffle is the same session-key exchange as the
batch pipeline; RocksDB state store handles fleets of keys.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEFAULT_GAP_SECONDS = 300
DEFAULT_MIN_TOTAL_DURATION = 180


def sessionize_stream_window(
    events: DataFrame,
    key_cols: list[str],
    time_col: str,
    duration_col: str,
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    min_total_duration: int = DEFAULT_MIN_TOTAL_DURATION,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Built-in session windows over an event-time column (must be
    TimestampType for watermarking)."""
    gap = f"{gap_seconds} seconds"
    out = (
        events.withWatermark(time_col, watermark)
        .groupBy(*key_cols, F.session_window(F.col(time_col), gap))
        .agg(
            F.min(time_col).alias("session_start"),
            F.max(time_col).alias("session_last_start"),
            F.sum(duration_col).alias("total_duration"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .filter(F.col("total_duration") >= min_total_duration)
    )
    return out.select(
        *key_cols,
        F.col("session_window.start").alias("window_start"),
        F.col("session_window.end").alias("window_end"),
        "session_start",
        "total_duration",
        "n_events",
    )


_STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_id", T.LongType()),
        T.StructField("session_start_ts", T.LongType()),
        T.StructField("session_end_ts", T.LongType()),
        T.StructField("total_duration", T.LongType()),
    ]
)


def _output_schema(key_fields: list[T.StructField]) -> T.StructType:
    return T.StructType(
        key_fields
        + [
            T.StructField("session_id", T.LongType()),
            T.StructField("session_start_ts", T.LongType()),
            T.StructField("session_end_ts", T.LongType()),
            T.StructField("total_duration", T.LongType()),
        ]
    )


def sessionize_stream_stateful(
    events: DataFrame,
    key_cols: list[str],
    start_col: str = "exposure_start_ts",
    end_col: str = "exposure_end_ts",
    duration_col: str = "duration",
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    min_total_duration: int = DEFAULT_MIN_TOTAL_DURATION,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Reference-exact gap-from-previous-END sessionization as a
    custom stateful operator. Emits a session once it is provably
    closed (a following event broke the gap) and it meets the
    duration floor. ``tiebreak_cols`` pins the processing order of
    same-start events to match the batch operator's window
    ordering."""
    key_fields = [
        f for f in events.schema.fields if f.name in set(key_cols)
    ]
    out_schema = _output_schema(key_fields)

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            sid, s_start, s_end, s_dur = state.get
        else:
            sid, s_start, s_end, s_dur = 0, None, None, 0

        closed: list[tuple] = []
        sort_keys = [start_col] + list(tiebreak_cols or [])
        for pdf in pdfs:
            pdf = pdf.sort_values(sort_keys)
            for row in pdf.itertuples(index=False):
                start = int(getattr(row, start_col))
                end = int(getattr(row, end_col))
                dur = int(getattr(row, duration_col))
                brk = s_end is None or (start - s_end) > gap_seconds
                if brk:
                    if s_start is not None and s_dur >= min_total_duration:
                        closed.append(
                            key + (sid, s_start, s_end, s_dur)
                        )
                    sid += 1
                    s_start, s_end, s_dur = start, end, dur
                else:
                    s_end = max(s_end, end)
                    s_dur += dur
        state.update((sid, s_start, s_end, s_dur))
        if closed:
            yield pd.DataFrame(closed, columns=[f.name for f in out_schema])

    return events.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
