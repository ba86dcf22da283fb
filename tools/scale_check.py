#!/usr/bin/env python
"""Scale-proofing harness: bench + plan-audit the engine at 10x data.

VERDICT r2 asked for empirical validation of the scale playbook
(next-round item 3): run the 16-query headline at sf1 (10x the
driver's bench size), committed as BENCH_sf1.json, with per-query
scaling ratios vs a same-box sf0.1 run and a plan-audit diff — any
super-linear query or NEW warn-level plan finding at sf1 must have a
named cause.

Usage:
    python tools/scale_check.py [--sf01 DIR] [--sf1 DIR] [--report MD]

Outputs:
    BENCH_sf1.json   — driver-format one-line JSON for the sf1 run,
                       with loadavg context (bench.py discipline: a
                       contention-polluted artifact must say so)
    --report MD      — per-query ratio table + audit diff markdown
                       (e.g. SCALING_r4.md), written by this script
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from samba_tv_ingest_etl_spark import queries as Q  # noqa: E402
from samba_tv_ingest_etl_spark.plans.audit import audit_plan  # noqa: E402
from samba_tv_ingest_etl_spark.session import get_spark  # noqa: E402


def _run_set(spark, sf_dir: str, names: list[str], runs: int = 3) -> dict[str, float]:
    registry = Q.registry()
    timings: dict[str, float] = {}
    for name in names:
        fn = registry[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        print(f"    {name}: {best:.3f}s", file=sys.stderr)
    return timings


def _audit_all(spark, sf_dir: str) -> dict[str, dict[str, int]]:
    """warn/error finding counts per registered query at this size."""
    out: dict[str, dict[str, int]] = {}
    for name, fn in sorted(Q.registry().items()):
        try:
            findings = audit_plan(fn(spark, sf_dir))
        except Exception as exc:  # pragma: no cover - surfaced in report
            out[name] = {"audit_error": 1, "detail": str(exc)[:120]}
            continue
        counts: dict[str, int] = {}
        for f in findings:
            if f.level in ("warn", "error"):
                n = int(f.detail.split(" ")[0]) if f.detail[:1].isdigit() else 1
                counts[f.code] = counts.get(f.code, 0) + n
        if counts:
            out[name] = counts
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf01", default="/root/testdata/sf0.1")
    ap.add_argument("--sf1", default=".testdata/sf1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--skip-audit", action="store_true")
    ap.add_argument("--report", default=None, help="markdown report path")
    args = ap.parse_args()
    load_before = round(os.getloadavg()[0], 2)

    spark = get_spark("scale-check")
    registry = Q.registry()
    names = [n for n in HEADLINE if n in registry]

    # shared warmup (JVM, codegen, Arrow worker pool)
    registry[names[0]](spark, args.sf01).write.format("noop").mode("overwrite").save()
    spark.range(1000).mapInPandas(lambda it: it, schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()

    print("== sf0.1 bench (same-box reference)", file=sys.stderr)
    t01 = _run_set(spark, args.sf01, names, args.runs)
    print("== sf1 bench", file=sys.stderr)
    t1 = _run_set(spark, args.sf1, names, args.runs)

    audit01 = {} if args.skip_audit else _audit_all(spark, args.sf01)
    audit1 = {} if args.skip_audit else _audit_all(spark, args.sf1)

    report = {
        "sf0.1": t01,
        "sf1": t1,
        "ratio": {n: round(t1[n] / t01[n], 2) for n in names if t01.get(n)},
        "audit_sf0.1": audit01,
        "audit_sf1": audit1,
        "audit_new_at_sf1": {
            n: {
                k: v
                for k, v in audit1.get(n, {}).items()
                if v > audit01.get(n, {}).get(k, 0)
            }
            for n in audit1
            if any(
                v > audit01.get(n, {}).get(k, 0)
                for k, v in audit1.get(n, {}).items()
            )
        },
    }
    load_after = round(os.getloadavg()[0], 2)
    report["loadavg_1m_before"] = load_before
    report["loadavg_1m_after"] = load_after
    bench_sf1 = {
        "metric": "headline_queries_wall_clock",
        "value": round(sum(t1.values()), 4),
        "unit": "sec",
        "queries": t1,
        "sf": 1.0,
        "loadavg_1m_before": load_before,
        "loadavg_1m_after": load_after,
    }
    with open("BENCH_sf1.json", "w") as f:
        f.write(json.dumps(bench_sf1) + "\n")
    if args.report:
        _write_report(args.report, report, args)
    print(json.dumps(report, indent=1))


def _write_report(path: str, report: dict, args) -> None:
    lines = [
        "# Scaling check: sf0.1 -> sf1 (10x rows), same box, same session",
        "",
        f"- data: `{args.sf01}` vs `{args.sf1}` "
        "(tools/gen_testdata.py — driver-shaped distributions)",
        f"- protocol: warm + best-of-{args.runs} per query, "
        "noop sink, cache cleared between runs",
        f"- loadavg(1m) before/after: {report['loadavg_1m_before']} / "
        f"{report['loadavg_1m_after']} (32 cores; <<32 = idle box)",
        "",
        "| query | sf0.1 (s) | sf1 (s) | ratio (10x rows) |",
        "|---|---|---|---|",
    ]
    for n in report["sf1"]:
        lines.append(
            f"| {n} | {report['sf0.1'][n]:.3f} | {report['sf1'][n]:.3f} "
            f"| {report['ratio'][n]:.2f}x |"
        )
    tot01 = sum(report["sf0.1"].values())
    tot1 = sum(report["sf1"].values())
    lines += [
        f"| **total** | **{tot01:.2f}** | **{tot1:.2f}** "
        f"| **{tot1 / tot01:.2f}x** |",
        "",
        "## Plan-audit diff at sf1",
        "",
    ]
    new = report.get("audit_new_at_sf1") or {}
    if not new:
        lines.append(
            "No NEW warn/error-level plan findings at sf1 — every "
            "registered query audits the same at 10x."
        )
    else:
        for n, counts in sorted(new.items()):
            lines.append(f"- **{n}**: {counts}")
    lines.append("")
    with open(path, "w") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    main()
