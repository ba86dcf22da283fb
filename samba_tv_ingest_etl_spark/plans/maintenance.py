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
    return _vacuum_dir(wh.spark, wh.root)


def _vacuum_dir(spark, root: str) -> list[str]:
    sc = spark.sparkContext
    jvm = sc._jvm
    jroot = jvm.org.apache.hadoop.fs.Path(root)
    fs = jroot.getFileSystem(sc._jsc.hadoopConfiguration())
    if not fs.exists(jroot):
        return []
    removed = []
    for status in fs.listStatus(jroot):
        name = status.getPath().getName()
        if name.endswith("__tmp__") or name.endswith("__old__"):
            live = name.removesuffix("__tmp__").removesuffix("__old__")
            live_path = jvm.org.apache.hadoop.fs.Path(
                root.rstrip("/") + "/" + live
            )
            if not fs.exists(live_path):
                # crashed between renames with no live table: the
                # leftover IS the only copy — never delete it
                continue
            if not fs.delete(status.getPath(), True):
                raise RuntimeError(f"vacuum: failed to delete {name}")
            removed.append(name)
    return sorted(removed)


# Persisted-index layouts the maintenance pass knows how to compact:
# component subdir -> (hive partition columns, within-file sort).
# The sort restores exactly what each index's probe depends on — the
# band indexes' key-sorted row groups (q136's literal pushdown prunes
# at row-group stats) and, for IVF, cluster-sorted cells so the
# in-file ``cluster IN (...)`` filter skips row groups too (the
# original writer only compacts per cell; sorting here is a strict
# improvement with identical content).
INDEX_LAYOUTS: dict[str, list[tuple[str, list[str] | None, list[str] | None]]] = {
    "minhash_band": [
        ("docs", None, None),
        ("bands", ["band"], ["slice"]),
    ],
    "vector_band": [
        ("docs", None, None),
        ("bands", ["band"], ["key"]),
    ],
    "ivf": [
        ("cells", None, None),
        ("centroids", ["cell"], ["c"]),
        ("vectors", ["cell"], ["cluster"]),
    ],
}


def _jfs(spark, path: str):
    """(FileSystem, Path-class) for ``path`` — one place for the py4j
    plumbing this module's listing/gating paths share."""
    sc = spark.sparkContext
    jp = sc._jvm.org.apache.hadoop.fs.Path
    return jp(path).getFileSystem(sc._jsc.hadoopConfiguration()), jp


def _is_data_file(name: str) -> bool:
    return not (name.startswith("_") or name.startswith("."))


def _scope_file_counts(
    spark, d: str, partitioned: bool
) -> dict[str | None, int]:
    """Data-file counts per compaction scope: ``{hive-dir-name: n}``
    for a partitioned component, ``{None: n}`` for a flat one. One
    driver-side recursive listing — the same metadata the scan's file
    listing pays every probe, so reading it here costs nothing new."""
    fs, jp = _jfs(spark, d)
    if not fs.exists(jp(d)):
        return {}

    def _count(sub) -> int:
        n = 0
        it = fs.listFiles(sub, True)
        while it.hasNext():
            if _is_data_file(it.next().getPath().getName()):
                n += 1
        return n

    if not partitioned:
        return {None: _count(jp(d))}
    out: dict[str | None, int] = {}
    for status in fs.listStatus(jp(d)):
        name = status.getPath().getName()
        if not (status.isDirectory() and "=" in name):
            continue
        if name.split("=", 1)[1] == "__HIVE_DEFAULT_PARTITION__":
            # a NULL partition value cannot be addressed by the gated
            # path's typed IN filter (and the index writers never
            # produce one — band/cell are pmod outputs); leave it to
            # the ungated whole-component swap rather than abort the
            # nightly pass on int("__HIVE_DEFAULT_PARTITION__")
            continue
        out[name] = _count(status.getPath())
    return out


def index_fragmentation(
    spark, path: str, kind: str
) -> dict[str, dict[str | None, int]]:
    """Per-scope data-file counts for every component of a persisted
    index — the fragmentation stat the maintenance gate reads and
    ``tools/increment_cost.py --kind fragmentation`` reports. Keys
    are hive partition dir names (``band=3``) or ``None`` for flat
    components."""
    if kind not in INDEX_LAYOUTS:
        raise ValueError(
            f"unknown index kind {kind!r}: one of "
            f"{sorted(INDEX_LAYOUTS)}"
        )
    p = path.rstrip("/")
    return {
        sub: _scope_file_counts(spark, f"{p}/{sub}", bool(part_cols))
        for sub, part_cols, _ in INDEX_LAYOUTS[kind]
    }


def _typed_partition_values(df, col: str, names: list[str]) -> list:
    """Hive dir names (``band=3``) -> typed partition values matching
    the frame's inferred column type, so the pre-rewrite filter stays
    a foldable predicate the file listing prunes by."""
    vals = [n.split("=", 1)[1] for n in names]
    dt = dict(zip(df.schema.fieldNames(), df.schema))[col].dataType
    if dt.simpleString() in ("tinyint", "smallint", "int", "bigint"):
        return [int(v) for v in vals]
    return vals


def compact_index(
    spark,
    path: str,
    kind: str,
    target_files: int = 1,
    only_if_over: int | None = None,
) -> dict[str, int]:
    """Rewrite a persisted index's directories into ``target_files``
    files per hive partition, row-content identical — the maintenance
    discipline ``compact_table`` gives warehouse tables, extended to
    the index layouts daily appends fragment (r11 verdict #1): a year
    of ``append_vector_band_index``/``append_ivf_index`` calls (the
    reference's daily-task cadence, ingest-dag.sql:1-3) leaves one
    file set per day per partition, so listing cost grows with file
    count and per-file key ranges overlap — eroding exactly the
    row-group pruning the indexed probes depend on. Compaction
    rewrites each partition key-sorted through the existing
    atomic-swap writer (crash-safe the same way mutations are; a
    leftover ``__tmp__``/``__old__`` is ``vacuum_index``'s job).

    Content contract: row-level byte-identical, INCLUDING duplicate
    rows from replayed appends — result-neutrality of duplicates is
    the consumers' documented contract, not the compactor's to
    enforce (dropping them here would mask a consumer that forgot
    it). Probe/increment results are therefore byte-identical pre-
    and post-compaction (pinned by ``tests/test_maintenance.py``).

    ``kind`` picks the layout (``INDEX_LAYOUTS``); the identity
    ``meta/`` row, where present, is left untouched. Returns rows
    REWRITTEN per component (0 = nothing exceeded the gate).

    ``only_if_over`` is the fragmentation gate (r12 verdict #1): a
    scope — one hive partition, or a whole flat component — is
    rewritten only when its data-file count exceeds the gate.
    Ungated, every nightly ``maintain`` is an O(index) full rewrite
    to absorb a batch-sized append, inverting the at-rest economics
    the index exists for; gated, a scope is rewritten once per
    ~``only_if_over`` appends and a maintenance pass with nothing
    fragmented touches ZERO data files (pinned by
    ``tests/test_maintenance.py``: second consecutive maintain is a
    byte-level no-op). Gated partition rewrites go through dynamic
    partition overwrite (per-partition atomicity — benign here: the
    rewrite is content-neutral, so a crash mid-commit leaves every
    partition holding identical rows in either old or new files);
    the ungated path keeps the whole-component atomic swap."""
    if kind not in INDEX_LAYOUTS:
        raise ValueError(
            f"unknown index kind {kind!r}: one of "
            f"{sorted(INDEX_LAYOUTS)}"
        )
    p = path.rstrip("/")
    # existence-check every component up front (r12 advice): a
    # pre-hierarchical IVF index (no cells/) — or any half-written
    # index — must fail with the same named rebuild-pointing error
    # the readers raise, not a raw path-not-found AnalysisException
    # after some components were already rewritten.
    fs, jp = _jfs(spark, p)
    for sub, _, _ in INDEX_LAYOUTS[kind]:
        if not fs.exists(jp(f"{p}/{sub}")):
            hint = (
                "it was written before the hierarchical layout "
                "existed — rewrite it with write_ivf_index (same "
                "codebook via cents=read_ivf_index(...)[0])"
                if kind == "ivf" and sub == "cells"
                else "rebuild it with its writer before compacting"
            )
            raise ValueError(
                f"{kind} index at {path} has no {sub}/ component: "
                f"{hint}."
            )
    counts: dict[str, int] = {}
    for sub, part_cols, sort_cols in INDEX_LAYOUTS[kind]:
        scope_values = None
        frag: list[str] | None = None
        if only_if_over is not None:
            # gate BEFORE the reader: a listing-only night must not
            # pay parquet schema inference / leaf-file enumeration
            # for components it will not touch
            fc = _scope_file_counts(
                spark, f"{p}/{sub}", bool(part_cols)
            )
            if not part_cols:
                if fc.get(None, 0) <= only_if_over:
                    counts[sub] = 0
                    continue
            else:
                frag = [
                    name
                    for name, n in fc.items()
                    if name is not None and n > only_if_over
                ]
                if not frag:
                    counts[sub] = 0
                    continue
        df = spark.read.parquet(f"{p}/{sub}")
        if frag is not None:
            scope_values = _typed_partition_values(
                df, part_cols[0], frag
            )
            df = df.filter(F.col(part_cols[0]).isin(scope_values))
        counts[sub] = df.count()
        if not part_cols:
            atomic_overwrite(df.repartition(target_files), f"{p}/{sub}")
            continue
        keys = [F.col(c) for c in part_cols]
        if target_files > 1:
            # deterministic split of the sort key pins extra write
            # parallelism per partition (the write_clustered recipe;
            # explicit numPartitions so AQE can't fuse splits back)
            n = int(
                spark.conf.get("spark.sql.shuffle.partitions")
            )
            out = (
                df.withColumn(
                    "_split",
                    F.pmod(
                        F.xxhash64(*(sort_cols or part_cols)),
                        F.lit(target_files),
                    ),
                )
                .repartition(n, *keys, F.col("_split"))
                .sortWithinPartitions(
                    *part_cols, "_split", *(sort_cols or [])
                )
                .drop("_split")
            )
        else:
            out = df.repartition(*keys).sortWithinPartitions(
                *part_cols, *(sort_cols or [])
            )
        if scope_values is not None:
            overwrite_partitions(
                out, f"{p}/{sub}", part_cols,
                expected_partitions=scope_values,
            )
        else:
            atomic_overwrite(out, f"{p}/{sub}", part_cols)
    return counts


def vacuum_index(spark, path: str) -> list[str]:
    """``vacuum_warehouse`` for a persisted index root: remove
    ``__tmp__``/``__old__`` siblings a crashed ``compact_index`` (or
    index write) left next to docs/ bands/ vectors/ centroids/,
    with the same only-if-live-exists safety rule."""
    return _vacuum_dir(spark, path.rstrip("/"))
