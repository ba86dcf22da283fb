"""As-of (merge-asof) join: for each left row, attach the most recent
right row at-or-before the left timestamp, per key.

The reference joins panel weights to events only at day grain
(``weighting.sql``'s equi-join on panel_date; SURVEY §2.3 J3) — it has
no sub-day temporal join. A training-data / attribution pipeline needs
the general operator: "state of X as of this event". Spark has no
built-in as-of join, so this implements it as a UNION + WINDOW plan:

    tag left/right -> unionByName -> window last(ignorenulls)
        over (partition by key order by ts, side) -> keep left rows

which Catalyst executes as ONE hash-partition exchange on the key plus
one sort by (ts, side) — exactly the cost of a sort-merge join, with
no per-row Python and no range-explosion. This beats the naive
"join on key + ts<=ts then argmax" plan, which shuffles the full
left x right per-key cross product before reducing it.

At 100 TB: both sides shuffle once on the join key; skew on a hot key
can be handled upstream with ``operators/skew.salt_column`` by salting
BOTH sides identically only if per-key ordering is preserved within
salt (i.e. salt on key only when the hot key's right side is small
enough to replicate — see ``salted_join``). Window state is O(1) per
row (running last), so no per-key memory blowup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]

_SIDE = "_asof_side"
_TS = "_asof_ts"
_RTS = "_asof_rts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    how: str = "left",
    tolerance: int | None = None,
    matched_ts_alias: str = "matched_ts",
) -> DataFrame:
    """For each ``left`` row, attach the columns of the ``right`` row
    with the greatest ``right_ts`` <= ``left_ts`` within the same
    ``on`` key (inclusive match at equality).

    ``right`` must be unique per (key, right_ts) — pre-aggregate it if
    not; with duplicates "the latest right row" is ill-defined and any
    engine (including DuckDB's ASOF JOIN) picks arbitrarily.

    ``tolerance`` (same unit as the ts columns) drops matches older
    than ``left_ts - tolerance``. ``how`` is ``left`` (unmatched left
    rows keep null right columns) or ``inner``.

    The matched right timestamp is exposed as ``matched_ts_alias``.
    Timestamp columns may be any orderable type; left and right must
    agree (cast epoch-seconds longs on both sides, see
    ``queries/temporal.py``).
    """
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join supports left/inner, got {how}")
    payload = [c for c in right.columns if c not in (*on, right_ts)]
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(f"right payload columns clash with left: {clash}")

    l2 = left.select(
        *left.columns,
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(dict(right.dtypes)[right_ts]).alias(_RTS),
        *[
            F.lit(None).cast(t).alias(c)
            for c, t in right.dtypes
            if c in payload
        ],
    )
    r2 = right.select(
        *[
            F.lit(None).cast(t).alias(c)
            for c, t in left.dtypes
            if c not in on
        ],
        *on,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        F.col(right_ts).alias(_RTS),
        *payload,
    )
    u = l2.unionByName(r2)

    # side 0 (right) sorts before side 1 (left) at equal ts -> the
    # running last() includes an exactly-simultaneous right row.
    w = (
        Window.partitionBy(*on)
        .orderBy(_TS, _SIDE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried: list[Column] = [
        F.last(c, ignorenulls=True).over(w).alias(c) for c in payload
    ]
    rts = F.last(_RTS, ignorenulls=True).over(w).alias(_RTS)

    out = (
        u.select(*left.columns, _SIDE, rts, *carried)
        .filter(F.col(_SIDE) == 1)
        .drop(_SIDE)
    )
    if tolerance is not None:
        stale = F.col(left_ts) - F.col(_RTS) > F.lit(tolerance)
        out = out.select(
            *left.columns,
            *[
                F.when(stale, F.lit(None)).otherwise(F.col(c)).alias(c)
                for c in (_RTS, *payload)
            ],
        )
    if how == "inner":
        out = out.filter(F.col(_RTS).isNotNull())
    return out.withColumnRenamed(_RTS, matched_ts_alias)
