"""Sequence packing for LLM training: assign documents to fixed-size
token windows ("concat the corpus, chunk every ``seq_len`` tokens"),
the layout step between a curated corpus and a training dataloader.

The core primitive is a GLOBAL exclusive prefix sum over a stable
order — the naive ``SUM() OVER (ORDER BY ...)`` with no partition key
collapses onto a single reducer, so ``global_cumsum`` uses the same
two-phase shape as ``text.vocab_ranks``: range-repartition on the
order key, local window per partition, then partition TOTALS (one
long per partition to the driver) become broadcast offsets. Scales to
any corpus size; the only driver traffic is #partitions longs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..relations import local_df

__all__ = ["global_cumsum", "global_cumsum_multi", "pack_sequences"]


def global_cumsum(
    df: DataFrame,
    value_col: str,
    order_col: str,
    out_col: str = "cum_before",
    bucket_of=None,
) -> DataFrame:
    """Exclusive prefix sum of ``value_col`` in ``order_col`` order
    (first row gets 0), computed without a global single-partition
    window. ``order_col`` must be unique (it is the total order).

    ``bucket_of``: optional Column assigning each row a bucket that is
    MONOTONE non-decreasing in ``order_col`` (dense ints: ``id DIV
    B``; fixed-width uniform strings: a short prefix). With it the
    whole pass costs ONE hash exchange — the window partitions by the
    bucket value directly. Without it, the generic path range-
    partitions first and windows per physical partition, which Spark
    plans as range exchange + pid hash exchange (two data movements;
    still never a single-partition window). Prefer a bucket when the
    key's shape allows one."""
    return global_cumsum_multi(
        df, [(value_col, out_col)], [F.col(order_col)],
        bucket_of=bucket_of,
    )


def global_cumsum_multi(
    df: DataFrame,
    values: list,
    order_by: list,
    bucket_of=None,
) -> DataFrame:
    """``global_cumsum`` over several value columns in one pass, with
    a multi-column (possibly descending) total order. ``values`` is a
    list of ``(value_col, out_col)`` pairs; ``order_by`` a list of
    Columns (use ``F.col(x).desc()`` for descending keys) that
    together form a UNIQUE total order. All value columns share the
    single range exchange, per-partition window, one driver pull of
    ``#partitions`` longs per value, and one broadcast offset join —
    the marginal cost of an extra value column is one long per
    partition."""
    spark = df.sparkSession
    if bucket_of is not None:
        local = df.withColumn("_pid", bucket_of)
    else:
        # a range exchange SAMPLES its child to pick boundaries, then
        # reads it again for the real shuffle — with an expensive
        # upstream (q131's whole excise chain) that is one full extra
        # evaluation. Every caller's input is doc-grain/bounded (the
        # plan-audit contract for this operator), so one lineage cut
        # here is cheap and the sampler reads materialized blocks
        # (guide §5; measured in OPTIMIZATION_r13.md).
        df = df.localCheckpoint(eager=True)
        srt = df.repartitionByRange(*order_by)
        local = srt.withColumn("_pid", F.spark_partition_id())
    w = Window.partitionBy(F.col("_pid")).orderBy(*order_by)
    for value_col, out_col in values:
        local = local.withColumn(
            out_col,
            F.coalesce(
                F.sum(F.col(value_col).cast("long")).over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0).cast("long"),
            ),
        )
    local = local.localCheckpoint(eager=True)  # totals + result read it
    totals = local.groupBy("_pid").agg(
        *[
            F.sum(F.col(v).cast("long")).alias(f"_t{i}")
            for i, (v, _) in enumerate(values)
        ]
    )
    counts = sorted(
        (r["_pid"], tuple(r[f"_t{i}"] for i in range(len(values))))
        for r in totals.collect()
    )
    offsets, acc = [], [0] * len(values)
    for pid, ts in counts:
        offsets.append((pid, *acc))
        acc = [a + int(t or 0) for a, t in zip(acc, ts)]
    if not offsets:
        return local.drop("_pid")
    # _pid's type follows the caller's bucket_of (int partition id,
    # long/int dense bucket, or a string prefix) — declare it from the
    # frame so the offset join never coerces
    pid_type = local.schema["_pid"].dataType.simpleString()
    off = local_df(
        spark,
        offsets,
        ", ".join(
            [f"_pid {pid_type}"]
            + [f"_off{i} long" for i in range(len(values))]
        ),
    )
    out = local.join(F.broadcast(off), "_pid")
    for i, (_, out_col) in enumerate(values):
        out = out.withColumn(
            out_col, F.col(out_col) + F.col(f"_off{i}")
        )
    return out.drop("_pid", *[f"_off{i}" for i in range(len(values))])


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    token_col: str = "n_tokens",
    order_col: str = "doc_id",
    bucket_of=None,
) -> DataFrame:
    """Concat-then-chunk packing: lay documents end to end in
    ``order_col`` order and cut every ``seq_len`` tokens. Returns one
    row per (non-empty) document with its placement:
    (``order_col``, ``n_tokens``, ``start_offset``, ``seq_first``,
    ``seq_last``, ``n_seqs``) — a doc spanning a cut belongs to
    every sequence it crosses (``n_seqs`` > 1), exactly what a
    packed dataloader needs to locate it."""
    nonempty = docs.filter(F.col(token_col) > 0)
    placed = global_cumsum(
        nonempty, token_col, order_col, out_col="start_offset",
        bucket_of=bucket_of,
    )
    # integer DIV throughout: double division drifts past 2^53; all
    # input columns pass through (callers sort by derived keys and
    # still need their ids)
    placed = placed.withColumn(
        "_end", F.col("start_offset") + F.col(token_col).cast("long") - 1
    )
    return (
        placed.withColumn(
            "seq_first", F.expr(f"start_offset DIV {seq_len}")
        )
        .withColumn("seq_last", F.expr(f"_end DIV {seq_len}"))
        .withColumn(
            "n_seqs",
            (F.col("seq_last") - F.col("seq_first") + 1).cast("long"),
        )
        .drop("_end")
    )
