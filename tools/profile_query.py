#!/usr/bin/env python
"""Per-query job-level profiler (optimization round instrumentation).

bench.py reports one wall-clock number per query; lifecycle queries
(index write + probe) hide a dozen Spark actions inside it. This tool
runs ONE query with the Spark event log enabled and prints every job
the run submitted — duration, callsite, description — so a round can
attribute the wall to phases before touching code (guide §1: measure
first, empirical loop).

Usage:
    python tools/profile_query.py q129_indexed_incremental_dedup \
        [--sf-dir /root/testdata/sf0.1] [--runs 1] [--cold]

The timed run repeats bench.py's discipline exactly (warm run first,
clearCache between runs, noop sink) so the job list decomposes the
same number the bench emits.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from samba_tv_ingest_etl_spark import queries as Q  # noqa: E402
from samba_tv_ingest_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument(
        "--no-warm", action="store_true",
        help="skip the warm run (profile cold-path codegen too)",
    )
    args = ap.parse_args()

    evt_dir = tempfile.mkdtemp(prefix="spark_events_")
    spark = get_spark(
        "profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{evt_dir}",
            "spark.eventLog.compress": "false",
        },
    )
    fn = Q.registry()[args.query]

    if not args.no_warm:
        fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()

    walls = []
    for _ in range(args.runs):
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        t0 = time.perf_counter()
        fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        walls.append(time.perf_counter() - t0)

    # flush the event log by stopping the session, then parse it
    app_id = spark.sparkContext.applicationId
    spark.stop()
    # Spark 4 event-log v2: a directory eventlog_v2_<appId>/ holding
    # events_N_<appId> part files (plus appstatus markers)
    parts: list[str] = []
    for root, _dirs, files in os.walk(evt_dir):
        for f in files:
            if app_id in f and f.startswith("events"):
                parts.append(os.path.join(root, f))
        for f in files:
            if f.startswith(app_id):  # single-file layout (Spark 3)
                parts.append(os.path.join(root, f))
    assert parts, f"no event log for {app_id} under {evt_dir}"

    def lines():
        for p in sorted(parts):
            with open(p) as fh:
                yield from fh

    jobs: dict[int, dict] = {}
    stage_info: dict[int, dict] = {}
    executions: dict[str, str] = {}
    if True:
        for line in lines():
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            k = ev.get("Event")
            if k and k.endswith("SparkListenerSQLExecutionStart"):
                executions[str(ev.get("executionId"))] = ev.get(
                    "description", ""
                )
            if k == "SparkListenerJobStart":
                props = ev.get("Properties") or {}
                jobs[ev["Job ID"]] = {
                    "t0": ev["Submission Time"],
                    "desc": props.get("spark.job.description", ""),
                    "callsite": props.get("callSite.short", ""),
                    "exec_id": props.get("spark.sql.execution.id", ""),
                    "stages": [
                        s["Stage ID"] for s in ev.get("Stage Infos", [])
                    ],
                }
            elif k == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
            elif k == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stage_info[si["Stage ID"]] = {
                    "name": si.get("Stage Name", ""),
                    "tasks": si.get("Number of Tasks", 0),
                }

    print(f"\n=== {args.query}  walls: {[round(w, 3) for w in walls]} s "
          f"(jobs below cover all runs incl. warm) ===")
    total_ms = 0
    for jid in sorted(jobs):
        j = jobs[jid]
        if "t1" not in j:
            continue
        dur = j["t1"] - j["t0"]
        total_ms += dur
        names = {
            stage_info[s]["name"].split(" at ")[0]
            for s in j["stages"] if s in stage_info
        }
        ntasks = sum(
            stage_info[s]["tasks"] for s in j["stages"] if s in stage_info
        )
        label = (
            j["desc"]
            or j["callsite"]
            or executions.get(j.get("exec_id", ""), "")
        )
        print(
            f"job {jid:3d}  {dur / 1000:7.3f}s  tasks={ntasks:4d} "
            f" {label[:60]:60s} stages={sorted(names)}"
        )
    print(f"sum of job times: {total_ms / 1000:.3f}s "
          f"(gaps vs wall = driver-side / planning / non-job work)")


if __name__ == "__main__":
    main()
