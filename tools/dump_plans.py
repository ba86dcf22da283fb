#!/usr/bin/env python
"""Dump .explain("formatted") for named queries to plans/<tag>/.

Optimization-round evidence tool: the judge checks plan claims
(Exchange counts, join strategies, PushedFilters) against committed
files, so every touched query gets a _before and _after snapshot.

Usage:
    python tools/dump_plans.py --tag r13 --suffix before q21_... q129_...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from samba_tv_ingest_etl_spark import queries as Q  # noqa: E402
from samba_tv_ingest_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", default="r13")
    ap.add_argument("--suffix", required=True, choices=["before", "after"])
    args = ap.parse_args()

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plans")
    reg = Q.registry()
    for name in args.queries:
        df = reg[name](spark, args.sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
