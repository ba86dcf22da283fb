"""Bucketed interval (range) join: points joined to the intervals
containing them, without an equi-key.

Spark has no native range join: ``ON p.ts BETWEEN i.s AND i.e`` with
no equality conjunct falls back to BroadcastNestedLoopJoin — O(|P|x|I|)
predicate evaluations, a non-starter once the interval side outgrows a
few thousand rows (and an OOM risk once it outgrows the broadcast
budget). The reference never needs one (its joins are all equi-joins,
SURVEY §2.3), but interval attribution — "which campaign window /
maintenance window / session span does this event fall in" — is a
standard analytics ask.

The standard rewrite: quantize time into fixed-width buckets. Each
interval replicates to every bucket it overlaps; each point maps to
exactly ONE bucket; an equi-join on the bucket id then only compares
point-interval pairs that can possibly match, and the exact BETWEEN
predicate filters within the bucket. A matching pair joins exactly
once (the point's bucket is the one bucket of the interval's range
containing its ts), so no post-dedup is needed.

Cost model: interval replication = ceil(len/width)+1 rows; bucket
fan-in = points-per-width x intervals-overlapping-a-width. Pick
``bucket_width`` ~ the typical interval length (p90 is a good
default): much smaller explodes the interval side, much larger turns
each bucket into a mini nested-loop. Peak-time bucket skew responds
to AQE skew-join splitting, or salt the points side with
``skew.salt_column`` and replicate interval-bucket rows per salt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]

_BUCKET = "_ivl_bucket"


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Inner-join each ``points`` row to every ``intervals`` row with
    ``start_col <= point_ts <= end_col`` (inclusive ends). Column sets
    must be disjoint — rename before calling. Apply any extra
    (theta) predicates on the result; they don't change the bucket
    pruning. ts/start/end must share one numeric unit."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    clash = set(points.columns) & set(intervals.columns)
    if clash:
        raise ValueError(f"overlapping columns: {clash}")
    # integer DIV, not double division: exact at any magnitude (and
    # floor == truncate for the non-negative epochs in play)
    p = points.withColumn(
        _BUCKET, F.expr(f"CAST({point_ts} AS BIGINT) DIV {bucket_width}")
    )
    i = intervals.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.expr(f"CAST({start_col} AS BIGINT) DIV {bucket_width}"),
                F.expr(f"CAST({end_col} AS BIGINT) DIV {bucket_width}"),
            )
        ),
    )
    return (
        p.join(i, _BUCKET)
        .filter(
            F.col(point_ts).between(F.col(start_col), F.col(end_col))
        )
        .drop(_BUCKET)
    )
