"""Physical-plan audit: mechanical detection of 100 TB anti-patterns.

``.explain()`` discipline, automated: walk a DataFrame's executed
plan and report the shapes that kill jobs at scale long before they
kill them —

- **error** ``CartesianProduct``: an unkeyed join neither side of
  which is broadcastable; O(n*m) rows through one stage. Always a
  bug at fleet size (the engine's interval/asof/similarity operators
  exist precisely to avoid these).
- **error** ``BatchEvalPython``: a row-at-a-time Python UDF in the
  plan — 10-100x slower than Arrow-vectorized exchange. The engine
  permits Python only through Arrow (``ArrowEvalPython``,
  ``mapInPandas``/``FlatMapGroupsInPandas``), which audit as info.
- **warn** ``BroadcastNestedLoopJoin``: legitimate when one side is
  deliberately tiny (ANN query fan-out does this on a handful of
  probe rows); fatal when the "small" side merely *looked* small to
  the planner. Surfaced for review, not banned.
- **warn** ``Exchange SinglePartition``: a global window/limit/agg
  funneling everything through one task (the engine's two-phase
  cumsum in ``operators/packing.py`` is the standard fix).
- **info** hash-exchange count: not wrong, but the number to watch
  when a pipeline composes operators.

Usage: ``audit_plan(df)`` returns findings; ``assert_scale_clean``
raises on errors — tests run it over EVERY registered query, making
"no cartesian products, no row-Python anywhere in the engine" an
enforced invariant rather than a code-review hope.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

__all__ = ["Finding", "audit_plan", "assert_scale_clean"]


@dataclass(frozen=True)
class Finding:
    level: str  # "error" | "warn" | "info"
    code: str
    detail: str


def _plan_string(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def audit_plan(df: DataFrame) -> list[Finding]:
    plan = _plan_string(df)
    out: list[Finding] = []
    n_cart = plan.count("CartesianProduct")
    if n_cart:
        out.append(
            Finding(
                "error",
                "cartesian_product",
                f"{n_cart} CartesianProduct node(s): unkeyed join with "
                "no broadcastable side — O(n*m) at scale",
            )
        )
    n_rowpy = plan.count("BatchEvalPython")
    if n_rowpy:
        out.append(
            Finding(
                "error",
                "row_python_udf",
                f"{n_rowpy} BatchEvalPython node(s): row-at-a-time "
                "Python in the hot path — use Arrow (pandas_udf / "
                "mapInPandas) instead",
            )
        )
    n_bnlj = plan.count("BroadcastNestedLoopJoin")
    if n_bnlj:
        out.append(
            Finding(
                "warn",
                "broadcast_nested_loop",
                f"{n_bnlj} BroadcastNestedLoopJoin node(s): fine only "
                "if the broadcast side is genuinely tiny",
            )
        )
    n_single = plan.count("Exchange SinglePartition")
    if n_single:
        out.append(
            Finding(
                "warn",
                "single_partition_exchange",
                f"{n_single} Exchange SinglePartition node(s): global "
                "funnel through one task",
            )
        )
    n_hash = len(re.findall(r"Exchange hashpartitioning", plan))
    out.append(
        Finding(
            "info", "hash_exchanges", f"{n_hash} hash exchange(s)"
        )
    )
    return out


def assert_scale_clean(df: DataFrame, allow: set[str] = frozenset()) -> None:
    """Raise if the plan contains error-level anti-patterns (minus
    explicitly allowed codes, for the rare audited exception)."""
    errors = [
        f
        for f in audit_plan(df)
        if f.level == "error" and f.code not in allow
    ]
    if errors:
        raise AssertionError(
            "; ".join(f"{f.code}: {f.detail}" for f in errors)
        )
