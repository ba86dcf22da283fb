#!/usr/bin/env python
"""Scale-proofing harness: bench + plan-audit the engine at 10x data.

VERDICT r2 asked for empirical validation of the scale playbook
(next-round item 3): run the bench HEADLINE set (whatever bench.py
currently ships — the import below, never a copy) at a scale factor
10x the base, with per-query scaling ratios vs a same-box base run
and a plan-audit diff — any super-linear query or NEW warn-level
plan finding at the bigger size must have a named cause. r4 ran
sf0.1 -> sf1 (SCALING_r4.md); r5 pushes the curve another decade,
sf1 -> sf10 (SCALING_r5.md), so the sizes are now parameters. A
query must have a committed 10x row BEFORE joining HEADLINE (the r9
process; run it through --extra-queries first).

Usage:
    python tools/scale_check.py [--base DIR --base-label sf1]
                                [--big DIR --big-label sf10]
                                [--bench-out BENCH_sf10.json]
                                [--report MD] [--runs N]

Outputs:
    --bench-out      — driver-format one-line JSON for the big run,
                       with loadavg context (bench.py discipline: a
                       contention-polluted artifact must say so)
    --report MD      — per-query ratio table + audit diff markdown
                       (e.g. SCALING_r5.md), written by this script
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, host_speed_canary, sample_query  # noqa: E402
from samba_tv_ingest_etl_spark import queries as Q  # noqa: E402
from samba_tv_ingest_etl_spark.plans.audit import audit_plan  # noqa: E402
from samba_tv_ingest_etl_spark.session import get_spark  # noqa: E402


def _run_set(
    spark, sf_dir: str, names: list[str], runs: int = 3
) -> tuple[dict[str, float], dict[str, float], list[str]]:
    """Timings + spreads + noisy list via bench.sample_query — the
    SAME spread-disciplined sampling the headline bench emits, so a
    contended scale run cannot ship an unflagged per-query table
    (this path writes the committed BENCH_<label>.json)."""
    registry = Q.registry()
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    noisy: list[str] = []
    for name in names:
        best, spread, is_noisy = sample_query(
            spark, registry[name], sf_dir, runs=runs
        )
        timings[name] = round(best, 4)
        spreads[name] = round(spread, 2)
        if is_noisy:
            noisy.append(name)
        flag = "  NOISY" if is_noisy else ""
        print(
            f"    {name}: {best:.3f}s (spread {spread:.2f}){flag}",
            file=sys.stderr,
        )
    return timings, spreads, noisy


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
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--base-label", default="sf0.1")
    ap.add_argument("--big", default=".testdata/sf1")
    ap.add_argument("--big-label", default="sf1")
    ap.add_argument("--big-sf", type=float, default=None,
                    help="numeric sf recorded in the bench JSON "
                    "(default: parsed from --big-label)")
    ap.add_argument("--bench-out", default=None,
                    help="default: BENCH_<big-label>.json")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--extra-queries", default="",
                    help="comma-separated registry keys appended to "
                    "the HEADLINE set (e.g. a scale-path variant "
                    "under measurement)")
    ap.add_argument("--skip-audit", action="store_true")
    ap.add_argument(
        "--audit-only", action="store_true",
        help="run ONLY the full-registry plan audit at base+big — no "
        "timings, no bench-out (r11 verdict #3: the combined "
        "timings+audit sweep blew its 90-min budget and --skip-audit "
        "silently dropped audit coverage; this makes the audit a "
        "separately budgeted pass that can never decay into "
        "'stands from last round').",
    )
    ap.add_argument(
        "--only-extras", action="store_true",
        help="measure ONLY --extra-queries (candidate vetting: a "
        "query needs its 10x row BEFORE joining HEADLINE; the full "
        "set is the per-round sweep, this is the pre-join gate). "
        "The written bench-out is a candidate artifact, not a "
        "headline one — name it accordingly.",
    )
    ap.add_argument("--report", default=None, help="markdown report path")
    args = ap.parse_args()
    if args.bench_out is None:
        args.bench_out = f"BENCH_{args.big_label}.json"
    if args.big_sf is None:
        try:
            args.big_sf = float(args.big_label.lstrip("sf"))
        except ValueError:
            args.big_sf = 0.0
    if args.audit_only and (args.skip_audit or args.only_extras):
        ap.error("--audit-only conflicts with --skip-audit/--only-extras")
    load_before = round(os.getloadavg()[0], 2)

    spark = get_spark("scale-check")
    if args.audit_only:
        audit_base = _audit_all(spark, args.base)
        audit_big = _audit_all(spark, args.big)
        report = {
            f"audit_{args.base_label}": audit_base,
            f"audit_{args.big_label}": audit_big,
            "audit_new_at_big": _audit_diff(audit_base, audit_big),
            "loadavg_1m_before": load_before,
            "loadavg_1m_after": round(os.getloadavg()[0], 2),
        }
        if args.report:
            _write_audit_report(args.report, report, args)
        print(json.dumps(report, indent=1))
        return
    registry = Q.registry()
    extras = [q.strip() for q in args.extra_queries.split(",") if q.strip()]
    unknown = [q for q in extras if q not in registry]
    if unknown:
        ap.error(f"--extra-queries not in registry: {unknown}")
    if args.only_extras and not extras:
        ap.error("--only-extras needs --extra-queries")
    names = (
        extras
        if args.only_extras
        else [n for n in HEADLINE if n in registry] + extras
    )

    # shared warmup (JVM, codegen, Arrow worker pool)
    registry[names[0]](spark, args.base).write.format("noop").mode("overwrite").save()
    spark.range(1000).mapInPandas(lambda it: it, schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()

    print(f"== {args.base_label} bench (same-box reference)", file=sys.stderr)
    t_base, _, _ = _run_set(spark, args.base, names, args.runs)
    print(f"== {args.big_label} bench", file=sys.stderr)
    t_big, spread_big, noisy_big = _run_set(
        spark, args.big, names, args.runs
    )

    audit_base = {} if args.skip_audit else _audit_all(spark, args.base)
    audit_big = {} if args.skip_audit else _audit_all(spark, args.big)

    report = {
        args.base_label: t_base,
        args.big_label: t_big,
        "ratio": {
            n: round(t_big[n] / t_base[n], 2) for n in names if t_base.get(n)
        },
        f"audit_{args.base_label}": audit_base,
        f"audit_{args.big_label}": audit_big,
        "audit_new_at_big": _audit_diff(audit_base, audit_big),
    }
    load_after = round(os.getloadavg()[0], 2)
    report["loadavg_1m_before"] = load_before
    report["loadavg_1m_after"] = load_after
    bench_big = {
        "metric": "headline_queries_wall_clock",
        "value": round(sum(t_big.values()), 4),
        "unit": "sec",
        "queries": t_big,
        "sf": args.big_sf,
        "loadavg_1m_before": load_before,
        "loadavg_1m_after": load_after,
        "contended": load_before > float(
            os.environ.get("SPARK_GRAFT_LOAD_GATE", "3.0")
        ),
        # box-speed reference (bench.host_speed_canary): calibrates
        # round-over-round comparisons against host-level throttling
        # the guest loadavg cannot see
        "canary_sec": round(host_speed_canary(spark), 3),
        "spread": spread_big,
        "noisy": sorted(noisy_big),
    }
    with open(args.bench_out, "w") as f:
        f.write(json.dumps(bench_big) + "\n")
    if args.report:
        _write_report(args.report, report, args)
    print(json.dumps(report, indent=1))


def _audit_diff(
    audit_base: dict[str, dict[str, int]],
    audit_big: dict[str, dict[str, int]],
) -> dict[str, dict[str, int]]:
    """Findings whose count GREW at the big size — the super-linear
    plan-shape signal the sweep exists to catch."""
    return {
        n: {
            k: v
            for k, v in audit_big.get(n, {}).items()
            if v > audit_base.get(n, {}).get(k, 0)
        }
        for n in audit_big
        if any(
            v > audit_base.get(n, {}).get(k, 0)
            for k, v in audit_big.get(n, {}).items()
        )
    }


def _write_audit_report(path: str, report: dict, args) -> None:
    """Markdown for an --audit-only pass: full-registry audit diff,
    no timing table (timings come from a separate budget-sized
    run)."""
    base, big = args.base_label, args.big_label
    n_queries = len(Q.registry())
    lines = [
        f"# Plan audit: {base} -> {big}, full registry "
        f"({n_queries} queries), audit-only pass",
        "",
        f"- data: `{args.base}` vs `{args.big}`",
        f"- loadavg(1m) before/after: {report['loadavg_1m_before']} / "
        f"{report['loadavg_1m_after']} (audit is plan-shape only — "
        "load cannot change findings)",
        "",
        f"## New warn/error findings at {big}",
        "",
    ]
    new = report.get("audit_new_at_big") or {}
    if not new:
        lines.append(
            f"No NEW warn/error-level plan findings at {big} — every "
            "registered query audits the same at 10x."
        )
    else:
        for n, counts in sorted(new.items()):
            lines.append(f"- **{n}**: {counts}")
    lines.append("")
    with open(path, "w") as f:
        f.write("\n".join(lines))


def _write_report(path: str, report: dict, args) -> None:
    base, big = args.base_label, args.big_label
    lines = [
        f"# Scaling check: {base} -> {big} (10x rows), same box, "
        "same session",
        "",
        f"- data: `{args.base}` vs `{args.big}` "
        "(tools/gen_testdata.py — driver-shaped distributions)",
        f"- protocol: warm + best-of-{args.runs} per query, "
        "noop sink, cache cleared between runs",
        f"- loadavg(1m) before/after: {report['loadavg_1m_before']} / "
        f"{report['loadavg_1m_after']} (32 cores; <<32 = idle box)",
        "",
        f"| query | {base} (s) | {big} (s) | ratio (10x rows) |",
        "|---|---|---|---|",
    ]
    for n in report[big]:
        lines.append(
            f"| {n} | {report[base][n]:.3f} | {report[big][n]:.3f} "
            f"| {report['ratio'][n]:.2f}x |"
        )
    tot_base = sum(report[base].values())
    tot_big = sum(report[big].values())
    lines += [
        f"| **total** | **{tot_base:.2f}** | **{tot_big:.2f}** "
        f"| **{tot_big / tot_base:.2f}x** |",
        "",
        f"## Plan-audit diff at {big}",
        "",
    ]
    new = report.get("audit_new_at_big") or {}
    if args.skip_audit:
        lines.append(
            "Plan audit SKIPPED in this run (--skip-audit) — audit "
            "evidence, if any, lives outside this artifact."
        )
    elif not new:
        lines.append(
            f"No NEW warn/error-level plan findings at {big} — every "
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
