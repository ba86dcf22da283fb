"""Distributed connected components by iterative min-label
propagation — the clustering step that turns near-duplicate PAIRS
(jaccard/minhash/simhash/cosine, operators/dedup.py) into dedup
CLUSTERS ("keep one doc per component"), which is what a corpus
pipeline actually executes.

Not expressible as one SQL query in Spark (no recursive CTE until the
data stops changing), so it's an iterative DataFrame loop: every node
starts labeled with itself; each round every node takes the min of
its own and its neighbors' labels; a fixed point is reached within
graph-diameter rounds. Near-dup graphs have tiny diameters (dup
clusters are dense), so 3-6 rounds is typical.

Per round: one shuffle to join labels onto edges + one groupBy-min —
both keyed on node id, so AQE coalesces them; ``localCheckpoint``
truncates the exploding lineage (iteration N's plan would otherwise
embed all N-1 predecessors — re-optimization cost grows quadratic).
Convergence is detected with sum(label), which strictly decreases
until the fixed point (labels only ever move down to the component
min), costing one tiny action per round instead of a full
old-vs-new anti-join.

At 100 TB-scale graphs (billions of edges, long chains), switch the
round body to the large-star/small-star rewrite (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — same
interface, fewer rounds on high-diameter graphs; the plain
propagation here is optimal for the low-diameter dup-cluster case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components"]


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Undirected connected components over the edge list. Returns
    (``node``, ``component``) for every node appearing in any edge,
    where ``component`` is the smallest node id in the node's
    component. Raises if not converged within ``max_iter`` rounds
    (diameter bound exceeded — switch to star rewrites)."""
    sym = (
        edges.select(F.col(src).alias("n"), F.col(dst).alias("m"))
        .unionByName(
            edges.select(
                F.col(dst).alias("n"), F.col(src).alias("m")
            )
        )
        .distinct()
    )
    sym = sym.persist()
    try:
        # seed with min(self, neighbors) — one groupBy instead of the
        # identity labeling, equivalent to running the first
        # propagation round for free (same fixed point, one less
        # join+groupBy iteration)
        labels = sym.groupBy("n").agg(
            F.min("m").alias("_mn")
        ).select("n", F.least("n", "_mn").alias("component"))
        prev_sum = None
        for _ in range(max_iter):
            labels = labels.localCheckpoint()
            cur = labels.agg(
                F.sum(F.col("component").cast("long"))
            ).collect()[0][0]
            if prev_sum is not None and cur == prev_sum:
                return labels.select(
                    F.col("n").alias("node"), "component"
                )
            prev_sum = cur
            neigh = sym.join(
                labels.withColumnRenamed("n", "m"), "m"
            ).select("n", "component")
            labels = (
                labels.unionByName(neigh)
                .groupBy("n")
                .agg(F.min("component").alias("component"))
            )
        raise RuntimeError(
            f"connected_components: no fixed point in {max_iter} rounds"
        )
    finally:
        # labels is checkpointed (RDD-owned) before every sym read, so
        # unpersisting here never strands the returned plan
        sym.unpersist()
