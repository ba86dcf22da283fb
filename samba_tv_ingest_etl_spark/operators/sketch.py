"""KMV (k-minimum-values) distinct-count sketch on a portable hash.

The reference has no approximate-distinct surface at all (its
audience metrics count exact households; SURVEY §2.5), but a 100 TB
deployment needs a mergeable distinct sketch: per-partition/day
sketches that roll up to any grouping without rescanning the raw
data. Spark ships HLL++ (``approx_count_distinct``), but its binary
sketch is engine-private — it can't be oracle-checked, stored
portably, or merged by another system. KMV is the portable
alternative: keep the k smallest values of a uniform hash; the k-th
smallest estimates the distinct count as (k-1) * H / h_k (Bar-Yossef
et al. 2002); the union of two sketches' values, re-truncated to k,
IS the sketch of the union — exact, not approximate, merging.

Everything here runs on a 60-bit prefix of sha256 so DuckDB computes
bit-identical hashes (``('0x' || substr(sha256(x),1,15))::BIGINT``)
and the whole sketch — not just the estimate — is oracle-checkable.

Scale shape: the dedup ``groupBy(keys, hash)`` shuffles evenly (hash
is high-cardinality) with map-side combine; the rank-filter window
then sees only distinct hashes. For groups whose distinct count is
billions, pre-filter with ``hash < prefilter`` (any upper bound on
h_k, e.g. 4 * k * 2^60 / lower-bound-estimate) so the window input
stays tiny; the filter is exact as long as at least k hashes survive.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "HASH_SPACE",
    "portable_hash60",
    "kmv_sketch",
    "kmv_merge",
    "kmv_estimate",
    "histogram_sketch",
    "histogram_merge",
    "histogram_quantile_bins",
]

HASH_SPACE = 1 << 60  # 15 hex chars of sha256


def portable_hash60(col: Column | str) -> Column:
    """First 60 bits of sha256 of the value's string form, as a
    non-negative bigint. Bit-identical in DuckDB:
    ``('0x' || substr(sha256(CAST(x AS VARCHAR)), 1, 15))::BIGINT``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(
        F.substring(F.sha2(c.cast("string"), 256), 1, 15), 16, 10
    ).cast("long")


def kmv_sketch(
    df: DataFrame,
    keys: list[str],
    col: str,
    k: int,
    prefilter: int | None = None,
) -> DataFrame:
    """Per-``keys`` KMV sketch of ``col``: ``sketch`` (sorted array of
    the k smallest distinct hashes), ``sketch_size`` (< k means the
    group's exact distinct count is sketch_size), and ``kth_min_hash``
    (the selection threshold; null only if the group is empty)."""
    h = portable_hash60(col).alias("_h")
    hashed = df.select(*keys, h)
    if prefilter is not None:
        hashed = hashed.filter(F.col("_h") < prefilter)
    # distinct == groupBy(keys, _h): map-side partial agg, even spread
    distinct = hashed.distinct()
    w = Window.partitionBy(*keys).orderBy("_h")
    return (
        distinct.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy(*keys)
        .agg(
            F.sort_array(F.collect_list("_h")).alias("sketch"),
            F.count(F.lit(1)).cast("long").alias("sketch_size"),
            F.max("_h").alias("kth_min_hash"),
        )
    )


def kmv_merge(
    sketches: DataFrame, keys: list[str], k: int
) -> DataFrame:
    """Merge sketches to a coarser grouping (``keys`` ⊂ the sketch's
    original keys, possibly empty): the k smallest of the union of
    member sketches is EXACTLY the sketch of the unioned data, because
    any hash among the global k smallest is among its own group's k
    smallest. Output schema matches ``kmv_sketch``."""
    exploded = sketches.select(
        *keys, F.explode("sketch").alias("_h")
    )
    grouped = exploded.distinct()
    w = Window.partitionBy(*keys).orderBy("_h")
    return (
        grouped.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy(*keys)
        .agg(
            F.sort_array(F.collect_list("_h")).alias("sketch"),
            F.count(F.lit(1)).cast("long").alias("sketch_size"),
            F.max("_h").alias("kth_min_hash"),
        )
    )


def kmv_estimate(
    kth_min_hash: Column | str,
    sketch_size: Column | str,
    k: int,
) -> Column:
    """Distinct-count estimate: exact when the sketch is unsaturated,
    else the KMV estimator (k-1) / (h_k / H). Float — keep it out of
    hash-compared outputs; the sketch itself is the portable part."""
    kth = (
        F.col(kth_min_hash)
        if isinstance(kth_min_hash, str)
        else kth_min_hash
    )
    size = (
        F.col(sketch_size)
        if isinstance(sketch_size, str)
        else sketch_size
    )
    return F.when(size < k, size.cast("double")).otherwise(
        F.lit(float(k - 1)) / (kth.cast("double") / F.lit(float(HASH_SPACE)))
    )


def histogram_sketch(
    df: DataFrame, keys: list[str], cents_col: str, bin_width: int
) -> DataFrame:
    """Fixed-width histogram sketch of an integer (cents) column:
    one row per (keys, bin) with the member count. Mergeable by
    construction — histograms over disjoint slices SUM to the
    histogram of the union (``histogram_merge``), so per-partition/
    per-day sketches roll up to any grouping without rescanning raw
    data. Bin = floor division, so negative values land in the
    correct lower bin on every engine.

    Scale shape: a single map-side-combinable groupBy whose shuffle
    carries (keys, bin) — output size is O(|keys| x value_range /
    bin_width), independent of row count."""
    # floor over exact double division (|cents| << 2^53): truncating
    # integer DIV would round negatives toward zero, splitting a bin
    binned = df.withColumn(
        "_bin",
        F.floor(
            F.col(cents_col).cast("double") / F.lit(int(bin_width))
        ).cast("long"),
    )
    return binned.groupBy(*keys, F.col("_bin").alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


def histogram_merge(
    sketches: DataFrame, keys: list[str]
) -> DataFrame:
    """Roll histogram sketches up to a coarser grouping (``keys`` ⊂
    the sketch keys, possibly empty): counts add. Exact merging —
    the result IS the histogram of the unioned data."""
    return sketches.groupBy(*keys, "bin").agg(
        F.sum("n").cast("long").alias("n")
    )


def histogram_quantile_bins(
    hist: DataFrame,
    keys: list[str],
    bin_width: int,
    probs: list[tuple[str, int, int]],
) -> DataFrame:
    """Value-at-quantile estimates from a histogram sketch: for each
    ``(alias, num, den)`` in ``probs`` (p = num/den), the LOWER EDGE
    (in cents) of the first bin whose cumulative count reaches
    ``ceil(p * total)`` — the standard histogram quantile with a
    deterministic integer answer (estimate error bounded by
    bin_width). The cumulative window runs over histogram ROWS
    (O(bins) per key), not data rows."""
    w = (
        Window.partitionBy(*keys)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tw = Window.partitionBy(*keys)
    cum = hist.withColumn("cum", F.sum("n").over(w)).withColumn(
        "total", F.sum("n").over(tw)
    )
    aggs = []
    for alias, num, den in probs:
        # ceil(total * num / den) via (a + b - 1) DIV b — valid
        # because both operands are positive (Spark DIV truncates
        # toward zero, so the negate-and-floor trick would be off by
        # one here)
        target = F.expr(f"(total * {num} + {den} - 1) DIV {den}")
        aggs.append(
            F.min(
                F.when(
                    F.col("cum") >= target,
                    F.col("bin") * F.lit(int(bin_width)),
                )
            ).alias(alias)
        )
    return cum.groupBy(*keys).agg(
        F.max("total").alias("n_rows"), *aggs
    )
