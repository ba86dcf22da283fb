"""Stream-stream interval join: attribute one event stream to another
(conversions -> impressions) with bounded state.

The reference's attribution is batch (weights joined at day grain); a
live pipeline joins two unbounded streams. Spark buffers both sides
in the state store and needs two things to ever evict: a watermark on
each input and a time-range constraint tying the two event-time
columns — state then holds only rows inside the join horizon
(O(rate x (max_delay + lateness)), not O(history)). Without the
range condition the join is legal but state grows forever; this
wrapper makes the bound mandatory.

Cross-batch semantics: a left row arriving in one micro-batch joins a
right row arriving batches later, as long as the watermark hasn't
passed the horizon — exercised in ``tests/test_streaming_join.py`` by
draining the two sides in separate availableNow runs over one
checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _event_time

__all__ = ["stream_stream_interval_join"]


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    max_delay: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join right-stream rows to left-stream rows with equal ``on``
    keys where ``right_ts`` falls in [left_ts, left_ts + max_delay]
    (attribution direction: right happens AFTER left). Both sides are
    watermarked with ``max_delay`` so join state is evictable. The
    right side's key/ts columns are prefixed ``r_`` in the output.
    ``how``: inner or leftOuter (outer emits unmatched left rows once
    the watermark closes their horizon)."""
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"unsupported how: {how}")
    l, lts = _event_time(left, left_ts)
    r, rts = _event_time(right, right_ts)
    for c in r.columns:  # prefix the whole right side: no ambiguity
        r = r.withColumnRenamed(c, f"r_{c}")
    rts = f"r_{rts}"
    l = l.withWatermark(lts, max_delay)
    r = r.withWatermark(rts, max_delay)
    cond = (F.col(rts) >= F.col(lts)) & (
        F.col(rts) <= F.col(lts) + F.expr(f"INTERVAL {max_delay}")
    )
    for k in on:
        cond = cond & (F.col(k) == F.col(f"r_{k}"))
    return l.join(r, cond, how)
