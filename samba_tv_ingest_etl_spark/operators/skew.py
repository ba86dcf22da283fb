"""Skew-aware physical patterns: salted two-phase aggregation,
exact two-phase distinct counts, and replicate-right salted joins.

The reference never spells these out (Snowflake hides physical
distribution; cf. ``etl-dag.sql:2``'s opaque warehouse sizing), but at
100 TB a low-cardinality grouping key (a handful of event types) or a
skewed join key turns one reducer into the whole job's critical path.
These operators express the standard mitigations as reusable
DataFrame transforms. Their results are bit-identical to the naive
plans — the salt never reaches the output — so every one of them
oracle-checks against plain ANSI SQL (q35/q38).

AQE's skew-join splitting handles sort-merge spills at runtime; the
explicit salt here additionally fixes *aggregation* hotspots and
keeps the plan shape deterministic for bucketed/pre-partitioned
pipelines where a runtime re-plan would break co-location.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salt_column", "salted_sum", "distinct_count", "salted_join"]


def salt_column(source: str | Column, n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts) from a high-cardinality
    column (e.g. an event id). Deterministic — NOT ``F.rand()`` — so
    stage retries and speculative tasks reproduce the same
    partitioning (rand-salted shuffles can lose or duplicate rows
    when a map task reruns after a fetch failure)."""
    src = F.col(source) if isinstance(source, str) else source
    return F.pmod(F.xxhash64(src), F.lit(n_salts)).cast("int")


def salted_sum(
    df: DataFrame,
    keys: list[str],
    sums: dict[str, Column],
    salt_source: str,
    n_salts: int = 32,
) -> DataFrame:
    """SUM/COUNT aggregation over a skewed (low-cardinality) key set,
    shuffled in two phases: groupBy(keys + salt) spreads each hot key
    over ``n_salts`` reducers, then the tiny partial table collapses
    to groupBy(keys). ``sums`` maps output alias -> summable
    expression (sums and counts re-aggregate losslessly; pass counts
    as ``F.count(...)`` and they are summed in phase 2).

    Spark's hash aggregate already map-side-combines, which is
    usually enough; the explicit salt matters when upstream data is
    clustered by the hot key (map-side combine degenerates to one
    output row per task but ALL of them land on one reducer whose
    final-merge input is proportional to task count x key skew) or
    when the aggregation buffer is large.
    """
    phase1 = df.withColumn("_salt", salt_column(salt_source, n_salts))
    partial = phase1.groupBy(*keys, "_salt").agg(
        *[expr.alias(f"_p_{alias}") for alias, expr in sums.items()]
    )
    return partial.groupBy(*keys).agg(
        *[
            F.sum(f"_p_{alias}").alias(alias)
            for alias in sums
        ]
    )


def distinct_count(
    df: DataFrame,
    keys: list[str],
    col: str,
    alias: str = "n_distinct",
) -> DataFrame:
    """Exact COUNT(DISTINCT col) per key without a hot reducer: the
    dedup shuffle keys on (keys, col) — high cardinality, evenly
    spread — and only the deduped rows shuffle again on the skewed
    keys with map-side-combinable counts. This is the two-phase
    rewrite Catalyst itself applies to COUNT(DISTINCT) (Expand +
    double aggregate); stated as an operator so pipelines can fuse
    other aggregates onto either phase."""
    return (
        df.select(*keys, col)
        .distinct()
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).cast("long").alias(alias))
    )


def salted_join(
    big: DataFrame,
    right: DataFrame,
    on: list[str],
    salt_source: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` skews on the join key and ``right`` is
    too large to broadcast (else just ``F.broadcast``): replicate
    ``right`` ``n_salts`` times, salt ``big`` deterministically from
    ``salt_source``, and join on (key, salt) so each hot key spreads
    over ``n_salts`` reducers. Output == plain ``big.join(right, on,
    how)`` with the salt column dropped.

    Memory cost is right-side replication (n_salts x right's shuffle
    share) — choose n_salts ~ the observed skew factor, not larger.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how}")
    salted_big = big.withColumn("_salt", salt_column(salt_source, n_salts))
    replicated = right.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
    )
    return salted_big.join(
        replicated, [*on, "_salt"], how
    ).drop("_salt")
