"""Type-2 slowly-changing-dimension (SCD2) history build.

The reference keeps only current-state tables (its MERGEs are
insert-only — ``etl-dag.sql:12-26`` — and its watermarks are
UPDATE-in-place); a warehouse also needs the standard *history*
shape: for each key, the timeline of attribute values as
``[valid_from, valid_to)`` intervals with a version counter. This is
the dimension-table twin of the as-of join (``operators/asof.py``):
SCD2 builds the state timeline once, as-of attaches it per event.

Plan shape (the scale contract): ONE hash exchange on the key — the
change-detection LAG, the version ROW_NUMBER, and the validity LEAD
all share the same ``(key) x (order)`` window spec, so Catalyst plans
a single shuffle + sort and chains the window operators without
re-partitioning. Run-length collapsing happens before the LEAD, so
the second window sees only change rows (bounded by the number of
value *transitions*, not events).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_history"]


def scd2_history(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    attrs: Sequence[str],
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Collapse an event-grain table into SCD2 intervals: one row per
    (key, run of identical ``attrs`` values), with ``valid_from`` (the
    run's first ``ts_col``), ``valid_to`` (the next run's start, NULL
    for the current run) and a 1-based ``version``.

    ``tiebreak`` columns make the ordering total when ``ts_col`` has
    duplicates — required for a deterministic history (and for oracle
    parity). A value that flips A -> B -> A produces three versions
    (runs collapse only *consecutive* duplicates — SCD2 semantics,
    not DISTINCT)."""
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak]]
    w = Window.partitionBy(*keys).orderBy(*order)
    cur = F.struct(*[F.col(a) for a in attrs])
    changed = ~cur.eqNullSafe(F.lag(cur).over(w))
    runs = df.withColumn(
        "_chg", F.coalesce(changed, F.lit(True))
    ).filter(F.col("_chg"))
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return runs.select(
        *keys,
        *attrs,
        F.row_number().over(w2).cast("long").alias("version"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
    )
