"""Deterministic hash sampling: reproducible train/val/test splits
and per-stratum downsampling.

The reference pipeline processes full panels only (SURVEY §1-§2); a
training-data pipeline additionally needs splits and samples that are
(a) reproducible across runs and engines, (b) stable under
re-partitioning and retries, and (c) assignable row-at-a-time with no
shuffle. ``F.rand(seed)`` fails (a) and (b) — it seeds per PARTITION,
so any change in file splits reassigns rows. Hashing a stable key is
the standard fix: the split is a pure function of the row, computable
by any engine (DuckDB twin: ``('0x' || substr(sha256(...),1,15))
::BIGINT % n``), and adding data never reassigns existing rows.

Scale shape: both operators are narrow (filter/withColumn over a
projected hash) — no shuffle, fully pushdown-friendly, trivially
parallel at any data size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sketch import portable_hash60

__all__ = [
    "epoch_upsample",
    "group_cap",
    "hash_bucket",
    "hash_split",
    "mixture_rates",
    "mixture_sample",
    "stratified_sample",
]


def hash_bucket(col: Column | str, n_buckets: int) -> Column:
    """Uniform deterministic bucket in [0, n_buckets) from a stable
    key column. 60-bit hash -> modulo bias is < 2^-50 for any sane
    bucket count."""
    return F.pmod(portable_hash60(col), F.lit(n_buckets)).cast("int")


def hash_split(
    df: DataFrame,
    key: str,
    splits: dict[str, int],
    split_col: str = "split",
) -> DataFrame:
    """Assign each row a named split with weight proportional to the
    given integer parts (e.g. ``{"train": 90, "val": 5, "test": 5}``):
    bucket = hash(key) % sum(parts), mapped to contiguous ranges in
    the listed order. Deterministic per key value — duplicate keys
    land in the same split (leakage-safe for grouped data)."""
    total = sum(splits.values())
    b = hash_bucket(key, total)
    hi = 0
    expr: Column | None = None
    for name, part in splits.items():
        hi += part
        clause = (b < F.lit(hi), F.lit(name))
        expr = F.when(*clause) if expr is None else expr.when(*clause)
    assert expr is not None  # b < total always matches the last clause
    return df.withColumn(split_col, expr)


def stratified_sample(
    df: DataFrame,
    key: str,
    num: int,
    den: int,
) -> DataFrame:
    """Keep rows whose key hashes into the first ``num`` of ``den``
    buckets — a deterministic ~num/den sample. Stratification is
    implicit: the hash is independent of every other column, so the
    kept fraction holds within any stratum (exactly the rows whose
    key satisfies the bucket predicate, so the same sample is
    reproducible in any engine)."""
    return df.filter(hash_bucket(key, den) < F.lit(num))


def mixture_rates(
    df: DataFrame,
    source_col: str,
    weights: dict[str, int],
    token_col: str,
    den: int = 10_000,
    default_weight: int = 1,
) -> DataFrame:
    """Down-sample each source to hit a target mixture: given integer
    target ``weights`` per source, keep the LARGEST corpus whose
    per-source token shares match the weights — the binding source
    (smallest available/weight ratio) is kept whole and every other
    source is deterministically hash-sampled down.

    All arithmetic is integer (engine-exact, oracle-able): the
    binding ratio is ``m = min_s(avail_s * den DIV w_s)`` and each
    source keeps keys with ``hash_bucket(key, den) < keep_den_s``
    where ``keep_den_s = min(den, m * w_s DIV avail_s)``. Appends
    ``keep_den`` and filters. Products stay under int64 for corpora
    up to ~10^14 tokens at the default ``den`` (raise a ValueError
    beyond that rather than silently wrapping — non-ANSI mode).
    Scale shape: per-source totals are a tiny aggregate broadcast
    back onto the corpus; the sample itself is a narrow hash filter
    — no corpus shuffle anywhere.
    """
    w = F.coalesce(
        *[
            F.when(F.col(source_col) == s, F.lit(int(wt)))
            for s, wt in weights.items()
        ],
        F.lit(int(default_weight)),
    ) if weights else F.lit(int(default_weight))
    avail = df.groupBy(source_col).agg(
        F.sum(F.col(token_col).cast("long")).alias("_avail")
    ).withColumn("_w", w)
    # tiny (one row per source) but derived from a full-corpus scan —
    # materialize once; read by the overflow probe, m, and rates
    avail = avail.localCheckpoint(eager=True)
    if avail.agg(
        F.max(F.col("_avail") * F.lit(den) < 0).alias("_ovf")
    ).collect()[0][0]:
        raise ValueError("avail * den overflows int64; lower den")
    m = avail.select(
        F.min(F.expr(f"_avail * {den} DIV _w")).alias("_m")
    )
    return avail.crossJoin(F.broadcast(m)).select(
        source_col,
        F.col("_avail").alias("avail_tokens"),
        F.least(
            F.lit(den).cast("long"),
            F.expr("_m * _w DIV _avail"),
        ).alias("keep_den"),
    )


def mixture_sample(
    df: DataFrame,
    source_col: str,
    weights: dict[str, int],
    token_col: str,
    key_col: str,
    den: int = 10_000,
    default_weight: int = 1,
    rates: DataFrame | None = None,
) -> DataFrame:
    """Apply ``mixture_rates``: keep rows whose key hashes under the
    source's ``keep_den``. The appended ``keep_den`` column reports
    the rate the row survived. Pass a precomputed ``rates`` to avoid
    re-running the per-source totals scan."""
    if rates is None:
        rates = mixture_rates(
            df, source_col, weights, token_col, den, default_weight
        )
    return df.join(
        F.broadcast(rates.select(source_col, "keep_den")), source_col
    ).filter(hash_bucket(key_col, den) < F.col("keep_den"))


def group_cap(
    df: DataFrame,
    group_col: str,
    key_col: str,
    max_per_group: int,
) -> DataFrame:
    """Cap every group's contribution at ``max_per_group`` rows,
    chosen deterministically: rank rows inside each group by
    (hash(key), key) — a total order, so re-runs, repartitions, and
    other engines pick the SAME survivors — and keep the first k.
    The standard domain-capping step of a corpus pipeline ("no single
    source dominates"), done without rand() and without collecting
    group counts. One shuffle on the group key; groups smaller than
    the cap pass through whole."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        portable_hash60(F.col(key_col)), F.col(key_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= max_per_group)
        .drop("_rk")
    )


def epoch_upsample(
    df: DataFrame,
    group_col: str,
    weights: dict[str, tuple[int, int]],
    key_col: str,
    default: tuple[int, int] = (1, 1),
    epoch_col: str = "epoch",
) -> DataFrame:
    """Materialize FRACTIONAL repeat factors — "2.5 epochs of source
    A, 1.5 of B" — the upsampling half of dataset mixing (the
    downsampling half is ``mixture_sample``). Each row yields
    ``num DIV den`` full copies plus one extra copy iff
    ``hash_bucket(key, den) < num mod den``: over a source the
    realized factor converges to num/den, and the exact extra-copy
    set is a pure function of the key (portable 60-bit hash), so
    retries, repartitioning and any oracle engine reproduce it —
    unlike any rand()-thinned repeat. Adds ``epoch`` (0-based copy
    index; copy 0 is the original).

    Scale shape: narrow map + explode — no shuffle, no state; output
    rows = input rows x realized factor, which is the caller's
    declared intent. Rows whose factor floors to zero (num < den and
    the key hashes outside the extra band) drop out, making
    ``(num, den) = (1, 2)`` a deterministic 50% DOWNSAMPLE — the two
    halves of mixing share one primitive."""
    if not (len(default) == 2 and default[0] >= 0 and default[1] > 0):
        raise ValueError(f"bad default factor {default!r}")
    for s, nd in weights.items():
        if not (len(nd) == 2 and nd[0] >= 0 and nd[1] > 0):
            raise ValueError(f"bad factor for {s!r}: {nd!r}")

    def n_copies(num: int, den: int) -> Column:
        base = F.lit(num // den).cast("int")
        extra = num % den
        if extra == 0:
            return base
        return base + (
            hash_bucket(key_col, den) < F.lit(extra)
        ).cast("int")

    n = F.coalesce(
        *[
            F.when(F.col(group_col) == s, n_copies(*nd))
            for s, nd in weights.items()
        ],
        n_copies(*default),
    ) if weights else n_copies(*default)
    # sequence(0, n-1) requires n >= 1: Spark's sequence(0, -1) is a
    # DESCENDING [0, -1], not empty — filter zero-copy rows first
    return (
        df.withColumn("_n", n)
        .filter(F.col("_n") > 0)
        .withColumn(
            epoch_col,
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    (F.col("_n") - 1).cast("long"),
                )
            ),
        )
        .drop("_n")
    )
