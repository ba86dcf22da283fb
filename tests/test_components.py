"""Connected components: fixed point equals brute-force union-find,
chains collapse transitively, convergence terminates."""

from __future__ import annotations

from samba_tv_ingest_etl_spark.operators.components import (
    connected_components,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_matches_union_find_on_random_graph(spark):
    import random

    rng = random.Random(7)
    edges = [
        (rng.randrange(200), rng.randrange(200)) for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert got == _union_find(edges)


def test_long_chain_collapses(spark):
    # path graph 0-1-2-...-30: diameter 30, worst case for naive
    # propagation; must still reach component 0 everywhere
    edges = [(i, i + 1) for i in range(30)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(df, max_iter=40).collect()
    assert {r["component"] for r in out} == {0}
    assert len(out) == 31


def test_star_equivalent_to_propagation_on_random_graph(spark):
    import random

    from samba_tv_ingest_etl_spark.operators.components import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(7)
    edges = [
        (rng.randrange(200), rng.randrange(200)) for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, ["src", "dst"])
    plain = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    star = {
        r["node"]: r["component"]
        for r in connected_components_star(df).collect()
    }
    assert star == plain


def test_star_converges_on_long_chain(spark):
    """A 300-node chain has diameter 300: plain propagation at its
    default iteration budget cannot finish, star contraction
    converges in O(log n) alternating rounds."""
    import pytest as _pytest

    from samba_tv_ingest_etl_spark.operators.components import (
        connected_components,
        connected_components_star,
    )

    chain = [(i, i + 1) for i in range(300)]
    df = spark.createDataFrame(chain, ["src", "dst"])
    out = connected_components_star(df).collect()
    assert {r["component"] for r in out} == {0}
    assert len(out) == 301
    with _pytest.raises(RuntimeError, match="no fixed point"):
        connected_components(df, max_iter=10)
