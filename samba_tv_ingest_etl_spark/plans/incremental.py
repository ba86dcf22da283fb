"""Incremental modelling DAG — reference entry point 3
(``etl-dag.sql``, SURVEY §3-EP3).

Five tasks with the reference's exact edge structure::

    root ─┬─ update_panel_windows  (insert-only MERGE on panel_monday)
          └─ update_raw_events     (MERGE on (smba_id, exposure_start_ts))
              └─(both)─ update_weighted_events  (attribute+weight new slice)
                  └─ update_viewing_sessions    (affected-key recompute)
                      └─ update_control_table   (advance watermarks)

State crosses task boundaries only through tables (``task_control``
and the modelling tables), exactly like the reference — every task is
restartable from storage. All incremental filters read the watermark
*before* the final task advances it, so a single DAG pass sees one
consistent snapshot.

Fidelity notes (each a correctness trap the oracle tests pin):

- the MERGE key ``(smba_id, exposure_start_ts)`` is deliberately weak
  (``etl-dag.sql:43,80``): two different programs starting the same
  second on one device collapse on incremental loads but not in the
  backfill — replicated, not fixed (SURVEY §1.4-10);
- new panel Mondays never retro-attribute previously loaded events
  (the weighted MERGE only sees the new raw slice, and already-merged
  keys are skipped);
- the affected-key recompute re-sessionizes ALL weighted events of a
  touched ``(hh_id, title, content_id)`` group, not just the new ones
  (``etl-dag.sql:99-121``) — late data can re-cut old sessions;
- ``raw_events_update`` advances to the LEAST of the two feeds' max
  dates (trail the slower feed), ``panel_windows_update`` to geo's max,
  both COALESCE-defaulted to 1900-01-01 (``etl-dag.sql:136-142``).

Scale: each task reads only the watermark slice (partition pruning on
``metadata_date`` when raw tables are date-partitioned); the affected
keys set is DISTINCT over that slice — broadcast into both the DELETE
anti-join and the recompute semi-join. The recompute shuffles only the
affected groups. With the default flat layout the DELETE rewrites
``viewing_sessions`` once per pass (atomic swap); with
``Warehouse.SCALE_LAYOUT`` the pass rewrites ONLY the touched
``panel_monday`` partitions (``_update_sessions_partitioned``) — the
100 TB path. A Delta backend would slot into the same Warehouse seam
for file-level deletes.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.merge import delete_by_keys, merge_insert_only, semi_join_keys
from ..operators.panels import attribute_panels, panel_windows
from ..operators.union_events import raw_viewing_events
from ..operators.weighting import weighted_events
from .backfill import Warehouse, build_viewing_sessions
from .dag import TaskDag

EPOCH_DEFAULT = dt.date(1900, 1, 1)
AFFECTED_KEYS = ["hh_id", "title", "content_id"]
RAW_EVENTS_KEY = ["smba_id", "exposure_start_ts"]


def read_watermark(wh: Warehouse, task_name: str) -> dt.date:
    """Scalar pull of ``last_successful_run_date`` (reference
    ``etl-dag.sql:22`` et al; SURVEY §2.2-P11)."""
    if not wh.exists("task_control"):
        return EPOCH_DEFAULT
    rows = (
        wh.read("task_control")
        .filter(F.col("task_name") == task_name)
        .select("last_successful_run_date")
        .collect()
    )
    return rows[0][0] if rows else EPOCH_DEFAULT


def _max_date(df: DataFrame, col: str = "metadata_date") -> dt.date | None:
    return df.agg(F.max(col)).collect()[0][0]


def update_panel_windows(wh: Warehouse, geo_weights: DataFrame) -> int:
    """Task 1 (``etl-dag.sql:8-26``): MERGE new panel Mondays."""
    wm = read_watermark(wh, "panel_windows_update")
    src = panel_windows(
        geo_weights.filter(F.col("metadata_date") > F.lit(wm))
    )
    target = wh.read("panel_windows") if wh.exists("panel_windows") else None
    # INCREMENTAL runs: the count and the append otherwise each
    # evaluate the full merge chain (source scan + anti-join); the
    # delta is batch-bounded by the watermark contract, so
    # materialize once and let both read blocks (also freezes
    # created_at across the two consumers). BOOTSTRAP runs (no
    # target) are exempt: the "delta" is the entire history, whose
    # materialization at fleet scale costs more than re-running the
    # plain scan+transform chain (no anti-join on this path) twice.
    delta = merge_insert_only(src, target, ["panel_monday"]).withColumn(
        "created_at", F.current_timestamp()
    )
    if target is not None:
        delta = delta.localCheckpoint(eager=True)
    n = delta.count()
    if n:
        wh.append(delta, "panel_windows")
    return n


def update_raw_events(wh: Warehouse, acr: DataFrame, stb: DataFrame) -> int:
    """Task 2 (``etl-dag.sql:29-46``): MERGE new ACR ∪ STB events on
    the weak ``(smba_id, exposure_start_ts)`` key."""
    wm = read_watermark(wh, "raw_events_update")
    new = raw_viewing_events(
        acr.filter(F.col("metadata_date") > F.lit(wm)),
        stb.filter(F.col("metadata_date") > F.lit(wm)),
    )
    target = (
        wh.read("raw_viewing_events")
        if wh.exists("raw_viewing_events")
        else None
    )
    # batch-bounded delta: one evaluation for count + append;
    # bootstrap exempt (see update_panel_windows)
    delta = merge_insert_only(new, target, RAW_EVENTS_KEY).withColumn(
        "created_at", F.current_timestamp()
    )
    if target is not None:
        delta = delta.localCheckpoint(eager=True)
    n = delta.count()
    if n:
        wh.append(delta, "raw_viewing_events")
    return n


def update_weighted_events(wh: Warehouse, geo_weights: DataFrame) -> int:
    """Task 3 (``etl-dag.sql:49-83``): panel-attribute + weight the new
    raw slice, MERGE on the same weak key. Reads the merged
    ``raw_viewing_events`` (not the feeds) and the merged
    ``panel_windows``, like the reference."""
    wm = read_watermark(wh, "raw_events_update")
    if not wh.exists("raw_viewing_events"):
        return 0
    new_raw = (
        wh.read("raw_viewing_events")
        .drop("created_at")
        .filter(F.col("metadata_date") > F.lit(wm))
    )
    if wh.exists("panel_windows"):
        pw = wh.read("panel_windows")
    else:
        # tables exist from DDL in the reference; an absent parquet dir
        # means "no windows yet" -> every attribution comes back NULL
        from .. import schemas

        pw = wh.spark.createDataFrame([], schemas.PANEL_WINDOWS)
    with_panel = attribute_panels(new_raw, pw)
    src = weighted_events(with_panel, geo_weights)
    target = (
        wh.read("weighted_events") if wh.exists("weighted_events") else None
    )
    # batch-bounded delta: one evaluation for count + append;
    # bootstrap exempt (see update_panel_windows)
    delta = merge_insert_only(src, target, RAW_EVENTS_KEY).withColumn(
        "created_at", F.current_timestamp()
    )
    if target is not None:
        delta = delta.localCheckpoint(eager=True)
    n = delta.count()
    if n:
        wh.append(delta, "weighted_events")
    return n


def update_viewing_sessions(wh: Warehouse) -> int:
    """Task 4 (``etl-dag.sql:86-124``): affected-key recompute.
    Find touched (hh_id, title, content_id) groups -> DELETE their
    sessions -> re-sessionize those groups from ALL their weighted
    events -> INSERT.

    Three storage strategies, selected by the Warehouse layout:

    - default: DELETE + INSERT commit together as ONE atomic table
      swap — stronger than the reference's two statements, same
      result; but the swap rewrites the whole table every pass.
    - ``viewing_sessions`` partitioned on ``panel_monday``
      (``Warehouse.SCALE_LAYOUT``): rewrite ONLY the touched
      Mondays. A session's ``panel_monday`` is a grouping column
      carried from its group's weighted events, so every existing
      or recomputed session of an affected group lives under a
      Monday present in that group's events — the affected-partition
      set is a DISTINCT over the (already-computed) affected slice,
      no extra scan of the sessions table. At 100 TB this turns the
      daily pass from a full-table rewrite into a handful of
      directory rewrites.
    - additionally listed in ``Warehouse.manifest``
      (``MANIFEST_TABLES``): same scoped rewrite, but committed
      through ``sources/manifest.py`` — every touched Monday flips
      in ONE ``_CURRENT`` pointer swap, restoring the
      cross-partition atomicity the plain hive backend trades away.
    """
    wm = read_watermark(wh, "raw_events_update")
    if not wh.exists("weighted_events"):
        return 0
    weighted = wh.read("weighted_events").drop("created_at")
    # TEMP TABLE affected_sessions_keys — read twice, so cache (S11)
    keys = (
        weighted.filter(F.col("metadata_date") > F.lit(wm))
        .select(*AFFECTED_KEYS)
        .distinct()
        .cache()
    )
    try:
        affected_events = semi_join_keys(weighted, keys, AFFECTED_KEYS)
        new_sessions = build_viewing_sessions(affected_events).withColumn(
            "created_at", F.current_timestamp()
        )
        if not wh.exists("viewing_sessions"):
            # bootstrap: the count is only the RETURN value, never a
            # decision, so take it from the write job itself
            # (Observation) — one evaluation of the full-history
            # sessionize, and nothing history-sized is materialized
            # on executor disks the way a localCheckpoint would
            from pyspark.sql import Observation

            obs = Observation()
            wh.write(
                new_sessions.observe(
                    obs, F.count(F.lit(1)).alias("n")
                ),
                "viewing_sessions",
            )
            return int(obs.get["n"])
        # INCREMENTAL branches: the recomputed sessions are read by
        # BOTH the n_new count and the table write (union side); the
        # re-sessionize of affected groups is the expensive half of
        # this task, and its output is affected-batch-bounded —
        # materialize once (and freeze created_at across consumers).
        # The bootstrap branch above stays double-eval: there the
        # "affected" set is the entire history, whose materialization
        # at fleet scale costs more than the second evaluation.
        new_sessions = new_sessions.localCheckpoint(eager=True)
        if wh.partitioning("viewing_sessions") == ["panel_monday"]:
            return _update_sessions_partitioned(
                wh, keys, affected_events, new_sessions
            )
        survivors = delete_by_keys(
            wh.read("viewing_sessions"), keys, AFFECTED_KEYS
        )
        out = survivors.unionByName(new_sessions)
        n_new = new_sessions.count()
        wh.write(out, "viewing_sessions")
        return n_new
    finally:
        keys.unpersist()


def _update_sessions_partitioned(
    wh: Warehouse,
    keys: DataFrame,
    affected_events: DataFrame,
    new_sessions: DataFrame,
) -> int:
    """Partition-scoped DELETE+INSERT on the ``panel_monday`` hive
    layout: read only the affected Mondays (directory-pruned scan),
    anti-join out the affected groups' old sessions, union the
    recomputed ones, dynamic-partition-overwrite exactly those
    Mondays. Mondays whose every session belonged to an affected
    group and got none back are cleared explicitly
    (``expected_partitions``) — dynamic overwrite alone cannot
    delete a partition it writes no rows to.

    On the manifest backend the same plan commits through ONE
    manifest swap: all touched Mondays flip together (or not at
    all — a crash mid-commit leaves readers on the previous
    version), and because the commit writes fresh immutable
    directories, the survivors' self-read needs no
    ``localCheckpoint`` lineage cut — the files it reads are never
    replaced, only de-referenced."""
    from ..sources.writer import overwrite_partitions

    mondays = sorted(
        r[0]
        for r in affected_events.select("panel_monday").distinct().collect()
        if r[0] is not None
    )
    if not mondays:
        return 0
    existing = wh.read_partitions("viewing_sessions", mondays)
    survivors = delete_by_keys(existing, keys, AFFECTED_KEYS)
    out = survivors.unionByName(new_sessions)
    n_new = new_sessions.count()
    if wh.is_manifest("viewing_sessions"):
        wh.manifest_table("viewing_sessions").commit_dataframe(
            out, expected_partitions=mondays
        )
    else:
        overwrite_partitions(
            out,
            wh.path("viewing_sessions"),
            ["panel_monday"],
            expected_partitions=mondays,
        )
    return n_new


def update_control_table(
    wh: Warehouse, acr: DataFrame, stb: DataFrame, geo_weights: DataFrame
) -> None:
    """Task 5 (``etl-dag.sql:127-145``): advance both watermarks.
    raw_events trails the slower feed (LEAST), panel_windows follows
    geo; empty feeds default to 1900-01-01."""
    acr_max = _max_date(acr) or EPOCH_DEFAULT
    stb_max = _max_date(stb) or EPOCH_DEFAULT
    geo_max = _max_date(geo_weights) or EPOCH_DEFAULT
    rows = [
        ("raw_events_update", min(acr_max, stb_max)),
        ("panel_windows_update", geo_max),
    ]
    from .. import schemas
    from ..sources.writer import overwrite_small

    overwrite_small(wh.spark, rows, schemas.TASK_CONTROL, wh.path("task_control"))


def build_dag(
    wh: Warehouse, acr: DataFrame, stb: DataFrame, geo_weights: DataFrame
) -> TaskDag:
    """The five-task DAG with the reference's exact edges
    (``etl-dag.sql`` AFTER clauses; cron '0 5 * * *' UTC on the root)."""
    dag = TaskDag()
    dag.add("root_kickoff", lambda: "kickoff", schedule="0 5 * * * UTC")
    dag.add(
        "update_panel_windows",
        lambda: update_panel_windows(wh, geo_weights),
        after=["root_kickoff"],
    )
    dag.add(
        "update_raw_events",
        lambda: update_raw_events(wh, acr, stb),
        after=["root_kickoff"],
    )
    dag.add(
        "update_weighted_events",
        lambda: update_weighted_events(wh, geo_weights),
        after=["update_panel_windows", "update_raw_events"],
    )
    dag.add(
        "update_viewing_sessions",
        lambda: update_viewing_sessions(wh),
        after=["update_weighted_events"],
    )
    dag.add(
        "update_control_table",
        lambda: update_control_table(wh, acr, stb, geo_weights),
        after=["update_viewing_sessions"],
    )
    return dag


def run_incremental(
    wh: Warehouse, acr: DataFrame, stb: DataFrame, geo_weights: DataFrame
) -> dict[str, object]:
    """One incremental pass (the daily run)."""
    return build_dag(wh, acr, stb, geo_weights).run()
