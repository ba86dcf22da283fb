"""Warehouse maintenance: small-file compaction and crash-leftover
vacuum.

The incremental DAG appends one file set per arrival day
(``Warehouse.append``) — correct, but at 100 TB a year of daily
appends is thousands of small files per table and the scan's task
count (and NameNode/listing pressure) grows with file count, not
data size. ``compact_table`` rewrites a table (or a single hive
partition of it) through the existing atomic-swap / dynamic-overwrite
writers, so compaction is crash-safe the same way mutations are.

``vacuum_warehouse`` removes ``__tmp__``/``__old__`` sibling
directories that a crashed ``atomic_overwrite`` can leave behind
(the writer deliberately leaves them for recovery — vacuum is the
explicit "recovery is done" step).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.writer import atomic_overwrite, overwrite_partitions
from .backfill import Warehouse


def compact_table(
    wh: Warehouse,
    table: str,
    partition_value=None,
    target_files: int = 1,
) -> int:
    """Rewrite ``table`` into ``target_files`` files (per hive
    partition, when the table is partitioned), preserving content
    byte-for-byte at the row level. With ``partition_value`` set on a
    partitioned table, ONLY that partition is rewritten (directory-
    scoped compaction — the nightly-maintenance shape: compact
    yesterday's partition, never touch the rest). Returns the number
    of rows in the compacted scope."""
    part_cols = wh.partitioning(table)
    df = wh.read(table)
    if partition_value is not None:
        if not part_cols or len(part_cols) != 1:
            raise ValueError(
                "partition_value needs a single-column partitioned table"
            )
        scope = df.filter(F.col(part_cols[0]) == F.lit(partition_value))
        n = scope.count()
        overwrite_partitions(
            scope.repartition(target_files),
            wh.path(table),
            part_cols,
            expected_partitions=[partition_value],
        )
        return n
    n = df.count()
    if part_cols:
        # one output file per hive partition x target_files
        out = df.repartition(target_files, *[F.col(c) for c in part_cols])
        atomic_overwrite(out, wh.path(table), part_cols)
    else:
        atomic_overwrite(df.repartition(target_files), wh.path(table))
    return n


def vacuum_warehouse(wh: Warehouse) -> list[str]:
    """Delete ``__tmp__``/``__old__`` leftovers from crashed atomic
    swaps across the warehouse root. Returns the removed paths.
    Safe by construction: a completed ``atomic_overwrite`` never
    leaves these behind, so anything found is either a crashed
    write's staging (tmp) or its pre-swap backup (old) — both
    superseded once the live directory reads cleanly."""
    spark = wh.spark
    sc = spark.sparkContext
    jvm = sc._jvm
    root = jvm.org.apache.hadoop.fs.Path(wh.root)
    fs = root.getFileSystem(sc._jsc.hadoopConfiguration())
    if not fs.exists(root):
        return []
    removed = []
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        if name.endswith("__tmp__") or name.endswith("__old__"):
            live = name.removesuffix("__tmp__").removesuffix("__old__")
            live_path = jvm.org.apache.hadoop.fs.Path(wh.path(live))
            if not fs.exists(live_path):
                # crashed between renames with no live table: the
                # leftover IS the only copy — never delete it
                continue
            if not fs.delete(status.getPath(), True):
                raise RuntimeError(f"vacuum: failed to delete {name}")
            removed.append(name)
    return sorted(removed)
