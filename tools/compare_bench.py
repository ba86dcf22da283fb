#!/usr/bin/env python
"""Canary-normalized bench comparison: `python tools/compare_bench.py A.json B.json`.

Emits per-query ratios B/A three ways: raw, CPU-canary-normalized
(divide each side by its `canary_sec`), and I/O-canary-normalized
(divide by `io_canary_sec`, present from r14 on). Motivation
(OPTIMIZATION_r13 "Measurement finding"): two same-code idle runs at
near-equal CPU canary (1.508 vs 1.459) totaled 54.6 vs 60.5 s with the
divergence concentrated in the disk-heavy lifecycle queries — the
CPU canary is blind to host I/O-window drift, so round-over-round
claims on index-writing queries need both qualifiers.

Accepts either artifact shape: the driver's `{"parsed": {...}}` wrapper
or the raw bench stdout object.
"""

from __future__ import annotations

import json
import math
import sys


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    p = d.get("parsed", d)
    if not p or "queries" not in p:
        raise SystemExit(f"{path}: no parsed bench object (rc={d.get('rc')})")
    return p


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    a, b = load(sys.argv[1]), load(sys.argv[2])
    ca, cb = a.get("canary_sec"), b.get("canary_sec")
    ia, ib = a.get("io_canary_sec"), b.get("io_canary_sec")
    cpu_k = (cb / ca) if ca and cb else None
    io_k = (ib / ia) if ia and ib else None

    print(f"A: {sys.argv[1]}  total={a['value']:.2f}s  cpu_canary={ca}  io_canary={ia}")
    print(f"B: {sys.argv[2]}  total={b['value']:.2f}s  cpu_canary={cb}  io_canary={ib}")
    if cpu_k:
        print(f"box drift B/A: cpu {cpu_k:.3f}x", end="")
        print(f", io {io_k:.3f}x" if io_k else "", end="")
        print("  (ratios below 1.0 = B faster)")
    hdr = f"{'query':<36} {'A s':>7} {'B s':>7} {'raw':>6} {'cpu-n':>6} {'io-n':>6}"
    print(hdr)
    print("-" * len(hdr))
    common = [q for q in a["queries"] if q in b["queries"]]
    logs = []
    for q in common:
        ra, rb = a["queries"][q], b["queries"][q]
        raw = rb / ra if ra else float("nan")
        cpun = raw / cpu_k if cpu_k else float("nan")
        ion = raw / io_k if io_k else float("nan")
        logs.append(math.log(raw) if ra and rb else 0.0)
        flag = " *noisy" if q in (a.get("noisy") or []) + (b.get("noisy") or []) else ""
        print(f"{q:<36} {ra:>7.3f} {rb:>7.3f} {raw:>6.2f} "
              f"{cpun:>6.2f} {ion:>6.2f}{flag}")
    only_a = sorted(set(a["queries"]) - set(b["queries"]))
    only_b = sorted(set(b["queries"]) - set(a["queries"]))
    if only_a:
        print("only in A:", ", ".join(only_a))
    if only_b:
        print("only in B:", ", ".join(only_b))
    if logs:
        gm = math.exp(sum(logs) / len(logs))
        tot = b["value"] / a["value"]
        print(f"\ntotal B/A raw {tot:.3f}  geomean raw {gm:.3f}", end="")
        if cpu_k:
            print(f"  cpu-normalized total {tot / cpu_k:.3f} geomean {gm / cpu_k:.3f}", end="")
        if io_k:
            print(f"  io-normalized total {tot / io_k:.3f} geomean {gm / io_k:.3f}", end="")
        print()


if __name__ == "__main__":
    main()
