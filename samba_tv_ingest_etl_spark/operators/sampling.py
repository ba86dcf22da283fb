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

__all__ = ["hash_bucket", "hash_split", "stratified_sample"]


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
