"""Connected components AT REST (operators/components.py): the
union-find state — bucketed nodes/, append-only remaps/ merge log,
gated fold — must equal the wholesale recompute after any increment
sequence, heal under replay, and never touch data under the fold
gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from samba_tv_ingest_etl_spark.operators.components import (
    components_increment,
    connected_components,
    fold_components_state,
    read_components_state,
    write_components_state,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _state(spark, path):
    return sorted(
        (r["node"], r["component"])
        for r in read_components_state(spark, path).collect()
    )


def _wholesale(spark, pairs):
    return sorted(
        (r["node"], r["component"])
        for r in connected_components(_edges(spark, pairs)).collect()
    )


def _bootstrap(spark, path, pairs, buckets=4):
    write_components_state(
        connected_components(_edges(spark, pairs)), path, buckets=buckets
    )


BATCH0 = [(1, 2), (3, 4), (10, 11)]
BATCH1 = [(2, 3), (20, 21)]  # merges {1,2}+{3,4}; new component
BATCH2 = [(11, 20), (4, 40)]  # merges across increments; new node 40


def test_increment_equals_wholesale(spark, tmp_path):
    p = str(tmp_path / "cc")
    _bootstrap(spark, p, BATCH0)
    components_increment(spark, p, _edges(spark, BATCH1))
    components_increment(spark, p, _edges(spark, BATCH2))
    assert _state(spark, p) == _wholesale(
        spark, BATCH0 + BATCH1 + BATCH2
    )


def test_fold_is_content_neutral_and_gated(spark, tmp_path):
    p = str(tmp_path / "cc")
    _bootstrap(spark, p, BATCH0)
    components_increment(spark, p, _edges(spark, BATCH1))
    before = _state(spark, p)
    # under the gate: no fold, remaps kept, state unchanged
    assert fold_components_state(spark, p, only_if_over=100) == 0
    assert _state(spark, p) == before
    # over the gate: folds, state unchanged, second fold is a no-op
    assert fold_components_state(spark, p, only_if_over=0) > 0
    assert _state(spark, p) == before
    assert fold_components_state(spark, p, only_if_over=0) == 0


def test_increment_after_fold_equals_wholesale(spark, tmp_path):
    p = str(tmp_path / "cc")
    _bootstrap(spark, p, BATCH0)
    components_increment(spark, p, _edges(spark, BATCH1))
    fold_components_state(spark, p)
    components_increment(spark, p, _edges(spark, BATCH2))
    assert _state(spark, p) == _wholesale(
        spark, BATCH0 + BATCH1 + BATCH2
    )


def test_replayed_increment_is_idempotent(spark, tmp_path):
    p = str(tmp_path / "cc")
    _bootstrap(spark, p, BATCH0)
    components_increment(spark, p, _edges(spark, BATCH1))
    replay = components_increment(spark, p, _edges(spark, BATCH1))
    # second pass finds labels already merged and nodes already present
    assert replay == {"merges": 0, "new_nodes": 0}
    assert _state(spark, p) == _wholesale(spark, BATCH0 + BATCH1)


def test_crash_between_remaps_and_nodes_heals_on_replay(
    spark, tmp_path
):
    # simulate the crash window the write order defines: remaps/
    # committed, node rows lost — replaying the same batch must land
    # the nodes without double-merging
    p = str(tmp_path / "cc")
    _bootstrap(spark, p, BATCH0)
    import samba_tv_ingest_etl_spark.sources.writer as W

    real_append = W.append

    def crashing_append(df, path, partition_by=None):
        if path.endswith("/nodes"):
            raise RuntimeError("simulated crash before node append")
        return real_append(df, path, partition_by)

    W.append = crashing_append
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            components_increment(spark, p, _edges(spark, BATCH1))
    finally:
        W.append = real_append
    components_increment(spark, p, _edges(spark, BATCH1))
    assert _state(spark, p) == _wholesale(spark, BATCH0 + BATCH1)


def test_meta_missing_is_named_error(spark, tmp_path):
    p = str(tmp_path / "cc")
    with pytest.raises(ValueError, match="meta/ is missing"):
        read_components_state(spark, p)
    with pytest.raises(ValueError, match="meta/ is missing"):
        components_increment(spark, p, _edges(spark, BATCH0))


def test_increment_prunes_to_endpoint_buckets(spark, tmp_path):
    # the nodes/ lookup must read ONLY the batch endpoints' buckets —
    # proven behaviorally: poison an untouched bucket's parquet file
    # with garbage bytes; an increment whose endpoints live entirely
    # in bucket 0 must succeed (it never opens the poisoned file),
    # while a full-state read must fail on it (the poison is real).
    # A regression to an unpruned O(state) lookup fails this test.
    import os

    p = str(tmp_path / "cc")
    _bootstrap(spark, p, BATCH0, buckets=4)  # nodes 2,10 -> bucket 2
    b2 = p + "/nodes/bucket=2"
    poisoned = [f for f in os.listdir(b2) if f.endswith(".parquet")]
    assert poisoned
    for f in poisoned:
        with open(os.path.join(b2, f), "wb") as fh:
            fh.write(b"not parquet at all")
    out = components_increment(spark, p, _edges(spark, [(4, 40)]))
    assert out == {"merges": 1, "new_nodes": 1}
    with pytest.raises(Exception):
        read_components_state(spark, p).collect()


def test_random_graphs_increment_equals_wholesale(spark, tmp_path):
    import random

    rnd = random.Random(13)
    for trial in range(3):
        nodes = list(range(1, 40))
        pairs = [
            (rnd.choice(nodes), rnd.choice(nodes)) for _ in range(60)
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        cut1, cut2 = len(pairs) // 3, 2 * len(pairs) // 3
        p = str(tmp_path / f"cc{trial}")
        _bootstrap(spark, p, pairs[:cut1], buckets=4)
        components_increment(spark, p, _edges(spark, pairs[cut1:cut2]))
        if trial % 2:
            fold_components_state(spark, p)
        components_increment(spark, p, _edges(spark, pairs[cut2:]))
        assert _state(spark, p) == _wholesale(spark, pairs)


def test_empty_bootstrap_and_empty_batch(spark, tmp_path):
    # an empty first day (no pairs yet) must bootstrap a readable
    # state, an empty batch must be a no-op, and a real batch must
    # then land on the empty base — the sf0.001 parity shape
    p = str(tmp_path / "cc")
    empty = _edges(spark, []).filter("src IS NOT NULL")
    write_components_state(
        connected_components(empty), p, buckets=4
    )
    assert _state(spark, p) == []
    assert components_increment(spark, p, empty) == {
        "merges": 0,
        "new_nodes": 0,
    }
    components_increment(spark, p, _edges(spark, BATCH0))
    assert _state(spark, p) == _wholesale(spark, BATCH0)
