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

For 100 TB-scale graphs (billions of edges, long chains),
``connected_components_star`` implements the large-star/small-star
rewrite (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14) — same (node, component) contract, O(log n) rounds
regardless of diameter; the plain propagation here stays the right
choice for the low-diameter dup-cluster case (fewer, cheaper rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "connected_components",
    "connected_components_star",
    "write_components_state",
    "read_components_state",
    "components_increment",
    "fold_components_state",
]


_UNSET = object()


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
        # sentinel, not None: an EMPTY edge set sums to NULL every
        # round, and None-vs-None must count as converged (it is —
        # the fixed point of nothing is nothing), not spin to the
        # iteration cap
        prev_sum: object = _UNSET
        for _ in range(max_iter):
            # lazy: the sum action below materializes the checkpoint,
            # so each round runs ONE job (join+groupBy+sum) instead of
            # an eager-checkpoint job plus the probe job. Modest at
            # fixture scale (q48 ~4.6 -> ~4.2 s at sf1, within noise;
            # the chain is dominated by pair GENERATION, not the
            # loop) but strictly one fewer scheduling round-trip per
            # iteration at any scale.
            labels = labels.localCheckpoint(eager=False)
            # decimal(38,0) sum: planted/synthetic ids live at ~1e12
            # and fleet-scale graphs carry billions of labels, so a
            # bigint sum could overflow (ANSI mode would abort the
            # run; legacy mode would wrap and could fake convergence)
            cur = labels.agg(
                F.sum(F.col("component").cast("decimal(38,0)"))
            ).collect()[0][0]
            if prev_sum is not _UNSET and cur == prev_sum:
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


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 40,
) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) — the
    high-diameter companion to ``connected_components``: converges in
    O(log n) alternating rounds regardless of graph diameter, where
    plain min-label propagation needs diameter-many rounds (a
    10⁶-node chain would need 10⁶ of them).

    Each round rewrites the edge set:

    - large-star: every node ``u`` points its LARGER neighbors at the
      minimum of its neighborhood (incl. itself);
    - small-star: every node points its smaller-or-equal neighborhood
      at that minimum.

    The fixed point is a forest of stars: every node carries an edge
    to its component minimum. Same (node, component) contract as
    ``connected_components``."""

    def _norm(e: DataFrame) -> DataFrame:
        # undirected edge as (hi, lo): u > v, self-loops dropped
        return (
            e.select(
                F.greatest(F.col("u"), F.col("v")).alias("u"),
                F.least(F.col("u"), F.col("v")).alias("v"),
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def _large_star(e: DataFrame) -> DataFrame:
        # neighborhoods from both directions; m = min(N(u) ∪ {u});
        # emit (bigger-neighbor, m)
        nbrs = e.select(F.col("u").alias("n"), F.col("v").alias("m")).unionByName(
            e.select(F.col("v").alias("n"), F.col("u").alias("m"))
        )
        mins = nbrs.groupBy("n").agg(
            F.least(F.min("m"), F.first("n")).alias("mn")
        )
        big = nbrs.filter(F.col("m") > F.col("n"))
        return (
            big.join(mins, "n")
            .select(F.col("m").alias("u"), F.col("mn").alias("v"))
        )

    def _small_star(e: DataFrame) -> DataFrame:
        # for each u over its smaller-or-equal neighborhood N≤ ∪ {u}:
        # link every member (except the min itself) to the min
        nbrs = e.select("u", "v")  # v < u by normalization
        mins = nbrs.groupBy("u").agg(F.min("v").alias("mn"))
        relink = nbrs.join(mins, "u").filter(F.col("v") != F.col("mn")).select(
            F.col("v").alias("u"), F.col("mn").alias("v")
        )
        self_link = mins.select("u", F.col("mn").alias("v"))
        return relink.unionByName(self_link)

    cur = _norm(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        nxt = _norm(_small_star(_large_star(cur))).localCheckpoint(
            eager=True
        )
        # convergence = edge set unchanged. Exact, and ONE job per
        # round instead of two exceptAll actions (each of which
        # shuffled BOTH checkpointed sets): both sides are distinct
        # by _norm, so a symmetric-difference row is exactly a
        # (u, v) group of size 1 in the tagged union.
        changed = (
            nxt.unionByName(cur)
            .groupBy("u", "v")
            .agg(F.count(F.lit(1)).alias("_c"))
            .filter(F.col("_c") != 2)
            .limit(1)
            .count()
        )
        cur = nxt
        if changed == 0:
            # fixed point: stars — (u, v) means component(u) = v; the
            # roots themselves appear only on the v side
            members = cur.select(
                F.col("u").alias("node"), F.col("v").alias("component")
            )
            roots = (
                cur.select(F.col("v").alias("node"))
                .distinct()
                .join(
                    members.select(F.col("node")), "node", "left_anti"
                )
                .withColumn("component", F.col("node"))
            )
            return members.unionByName(roots)
    raise RuntimeError(
        f"connected_components_star: no fixed point in {max_iter} rounds"
    )


# ------------------------------------------------------------------
# Connected components AT REST — union-find over persisted state.
#
# The wholesale operators above recompute the whole graph per call; a
# corpus pipeline grows its near-dup graph DAILY (new docs bring new
# pairs), and at 100 TB "re-run CC over every pair ever found" is a
# full-graph shuffle per increment. The at-rest layout makes the
# increment O(batch):
#
#   nodes/   bucket=<b>/ (node, component)   b = pmod(node, buckets)
#   remaps/  (old_label, new_label)          append-only merge log
#   meta/    (buckets, layout)               identity row, written LAST
#
# Node-keyed bucketing is the load-bearing choice: an increment must
# LOOK UP its batch's endpoints (node -> current component), and the
# endpoint set's bucket list prunes that read at the file listing. The
# price is that a merge cannot relabel the absorbed component's rows in
# place (they are spread across node-buckets); instead the merge is
# APPENDED to remaps/ as (old_label -> new_label), and readers resolve
# labels through the log's transitive closure (one broadcast hash join
# — the closure is bounded by merges-since-last-fold). This is exactly
# disjoint-set union with lazy path compression: remaps/ is the parent
# chain, ``fold_components_state`` is the compression pass — a gated
# maintenance rewrite in the compact_index mold, amortizing the only
# O(state) step instead of paying it per increment.
#
# Replay contract (same at-least-once discipline as the MinHash/IVF
# appends): the increment writes remaps/ FIRST, then the new-node
# rows. A crash anywhere, replayed with the same batch, converges to
# the committed state — already-merged labels produce an empty merge
# set (their endpoints now resolve equal), already-appended nodes are
# anti-joined away by the pruned lookup, and duplicate remap rows are
# closure-neutral. Single-writer per state path, as on the dedup
# stage.


COMPONENTS_BUCKETS = 16
_STATE_LAYOUT = "unionfind_v1"
# explicit schemas: an EMPTY bootstrap/log writes a directory with no
# data files, which schema inference cannot read — and pinning the
# types here is the identity contract anyway (ids are stored as long)
_NODES_SCHEMA = "node long, component long, bucket int"
_REMAPS_SCHEMA = "old_label long, new_label long"


def _hfs(spark, p: str):
    sc = spark.sparkContext
    jpath = sc._jvm.org.apache.hadoop.fs.Path
    return jpath(p).getFileSystem(sc._jsc.hadoopConfiguration()), jpath


def _read_state_meta(spark, path: str) -> dict:
    p = path.rstrip("/") + "/meta"
    fs, jpath = _hfs(spark, p)
    if not fs.exists(jpath(p)):
        raise ValueError(
            f"no components state at {path}: meta/ is missing — "
            "bootstrap with write_components_state (a half-written "
            "state from a crashed bootstrap has no meta row and must "
            "be rewritten)."
        )
    meta = spark.read.parquet(p).collect()[0].asDict()
    if meta.get("layout") != _STATE_LAYOUT:
        raise ValueError(
            f"components state at {path} has layout "
            f"{meta.get('layout')!r}, this engine reads "
            f"{_STATE_LAYOUT!r}: rebuild with write_components_state."
        )
    return meta


def write_components_state(
    labels: DataFrame, path: str, buckets: int = COMPONENTS_BUCKETS
) -> None:
    """Bootstrap the at-rest state from a (``node``, ``component``)
    labeling (``connected_components`` output). ``buckets`` is part
    of the state's IDENTITY (endpoint-lookup pruning computes
    ``pmod(node, buckets)`` against the persisted value), so it lives
    in the meta row, written LAST — a crash mid-bootstrap leaves a
    meta-less directory every reader rejects by name."""
    from ..sources import writer

    spark = labels.sparkSession
    p = path.rstrip("/")
    fs, jpath = _hfs(spark, p)
    # rebuild over an existing state: invalidate the OLD meta before
    # touching anything — a crash mid-rebuild must leave a meta-less
    # directory every reader rejects by name, never a reader-accepted
    # mix of new nodes/ with a stale remaps/ log or stale buckets
    if fs.exists(jpath(f"{p}/meta")):
        fs.delete(jpath(f"{p}/meta"), True)
    out = labels.select(
        F.col("node").cast("long").alias("node"),
        F.col("component").cast("long").alias("component"),
        F.pmod(F.col("node").cast("long"), F.lit(buckets))
        .cast("int")
        .alias("bucket"),
    )
    writer.atomic_overwrite(
        out.repartition(F.col("bucket")).sortWithinPartitions(
            "bucket", "node"
        ),
        f"{p}/nodes",
        ["bucket"],
    )
    if fs.exists(jpath(f"{p}/remaps")):
        fs.delete(jpath(f"{p}/remaps"), True)
    writer.atomic_overwrite(
        spark.range(1).select(
            F.lit(int(buckets)).cast("int").alias("buckets"),
            F.lit(_STATE_LAYOUT).alias("layout"),
        ).coalesce(1),
        f"{p}/meta",
    )


def _remap_closure(spark, path: str) -> DataFrame | None:
    """(``label``, ``final``) for every label the merge log touches —
    the log's transitive closure via the min-label CC above (remap
    chains old->mid, mid->new resolve because the merge-class minimum
    IS the merged component's minimum node id). Bounded by
    merges-since-last-fold; ``fold_components_state`` keeps that
    broadcastable."""
    p = path.rstrip("/") + "/remaps"
    fs, jpath = _hfs(spark, p)
    if not fs.exists(jpath(p)):
        return None
    remaps = spark.read.schema(_REMAPS_SCHEMA).parquet(p)
    if remaps.limit(1).count() == 0:
        return None
    return connected_components(
        remaps, src="old_label", dst="new_label"
    ).select(
        F.col("node").alias("_rm_label"),
        F.col("component").alias("_rm_final"),
    )


def _apply(labels: DataFrame, closure: DataFrame | None, col: str) -> DataFrame:
    # closure columns carry a _rm_ prefix so the join never collides
    # with the caller's column names (col is "label" on one path)
    if closure is None:
        return labels
    return (
        labels.join(
            F.broadcast(closure),
            labels[col] == closure["_rm_label"],
            "left",
        )
        .withColumn(col, F.coalesce("_rm_final", col))
        .drop("_rm_label", "_rm_final")
    )


def read_components_state(spark, path: str) -> DataFrame:
    """Current (``node``, ``component``) — base labels with the merge
    log's closure applied in one broadcast hash join. The scan stays
    whatever the consumer's plan prunes it to; the closure join adds
    no shuffle."""
    _read_state_meta(spark, path)
    nodes = spark.read.schema(_NODES_SCHEMA).parquet(
        path.rstrip("/") + "/nodes"
    ).select("node", "component")
    return _apply(nodes, _remap_closure(spark, path), "component")


def components_increment(
    spark,
    path: str,
    new_edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> dict[str, int]:
    """Fold a batch of new edges into the at-rest state: look up the
    batch endpoints' current labels (nodes/ read PRUNED to the
    endpoints' buckets — ``pmod`` bucket values are collected, at
    most ``buckets`` of them regardless of batch size, and pushed as
    a partition ``IN`` filter), run CC over the LABEL graph (size <=
    |batch| edges, never the corpus), append the resulting merges to
    remaps/ and the genuinely-new endpoints to their node-buckets.
    Nothing corpus-sized moves: per-increment cost is
    O(batch + rows in the endpoints' buckets). Returns
    ``{"merges": n, "new_nodes": n}``."""
    meta = _read_state_meta(spark, path)
    buckets = int(meta["buckets"])
    p = path.rstrip("/")
    from ..sources import writer

    e = (
        new_edges.select(
            F.col(src).cast("long").alias("a"),
            F.col(dst).cast("long").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if e.limit(1).count() == 0:
        return {"merges": 0, "new_nodes": 0}
    ends = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    bks = sorted(
        r[0]
        for r in ends.select(
            F.pmod(F.col("node"), F.lit(buckets)).cast("int").alias("bk")
        )
        .distinct()
        .collect()
    )
    known = (
        spark.read.schema(_NODES_SCHEMA).parquet(f"{p}/nodes")
        .filter(F.col("bucket").isin(bks))
        .select("node", "component")
    )
    base = ends.join(known, "node", "left").select(
        "node", F.coalesce("component", "node").alias("label")
    )
    base = _apply(
        base, _remap_closure(spark, p), "label"
    ).localCheckpoint(eager=True)

    lab = (
        e.join(
            base.select(F.col("node").alias("a"), F.col("label").alias("ca")),
            "a",
        )
        .join(
            base.select(F.col("node").alias("b"), F.col("label").alias("cb")),
            "b",
        )
        .select("ca", "cb")
        .filter(F.col("ca") != F.col("cb"))
    )
    merges = None
    n_merges = 0
    if lab.limit(1).count() > 0:
        merges = (
            connected_components(lab, src="ca", dst="cb")
            .filter(F.col("node") != F.col("component"))
            .select(
                F.col("node").alias("old_label"),
                F.col("component").alias("new_label"),
            )
            .localCheckpoint(eager=True)
        )
        n_merges = merges.count()
        # remaps FIRST: a crash after this append, replayed, finds the
        # batch's labels already merged (empty label graph) and only
        # re-appends the missing node rows — the reverse order would
        # leave committed-looking nodes whose merges were lost
        writer.append(merges.coalesce(1), f"{p}/remaps")

    new_nodes = ends.join(known, "node", "left_anti").join(base, "node")
    if merges is not None:
        new_nodes = (
            new_nodes.join(
                F.broadcast(merges),
                new_nodes["label"] == merges["old_label"],
                "left",
            )
            .withColumn("label", F.coalesce("new_label", "label"))
            .drop("old_label", "new_label")
        )
    out = new_nodes.select(
        "node",
        F.col("label").alias("component"),
        F.pmod(F.col("node"), F.lit(buckets)).cast("int").alias("bucket"),
    ).localCheckpoint(eager=True)
    n_new = out.count()
    if n_new:
        writer.append(
            out.repartition(F.col("bucket")), f"{p}/nodes", ["bucket"]
        )
    return {"merges": n_merges, "new_nodes": n_new}


def fold_components_state(
    spark, path: str, only_if_over: int = 0
) -> int:
    """Path compression as gated maintenance (the compact_index
    discipline): apply the merge log's closure to every base row,
    rewrite nodes/ through the atomic-swap writer (bucket is keyed on
    ``node``, so folding never moves a row between partitions), and
    clear remaps/. The ONLY O(state) step in the family — gate it on
    log size (``only_if_over``: fold only when the log holds more
    than this many merge rows) so nightly maintenance is a
    listing-only no-op until the closure is worth compressing.
    Content-neutral by construction (readers already apply the same
    closure); a crash between the rewrite and the log delete replays
    idempotently (re-applying a folded closure maps every label to
    itself). Returns merge rows folded (0 = under the gate)."""
    meta = _read_state_meta(spark, path)
    p = path.rstrip("/")
    fs, jpath = _hfs(spark, p)
    # gate FIRST: the nightly gated pass must be one existence check
    # plus one count — computing the closure (an iterative CC, several
    # Spark jobs) belongs after the gate has decided to fold
    if not fs.exists(jpath(f"{p}/remaps")):
        return 0
    n = spark.read.schema(_REMAPS_SCHEMA).parquet(
        f"{p}/remaps"
    ).count()
    if n <= only_if_over:
        return 0
    closure = _remap_closure(spark, p)
    if closure is None:
        return 0
    from ..sources import writer

    nodes = spark.read.schema(_NODES_SCHEMA).parquet(
        f"{p}/nodes"
    ).select("node", "component", "bucket")
    folded = _apply(nodes, closure, "component")
    writer.atomic_overwrite(
        folded.repartition(F.col("bucket")).sortWithinPartitions(
            "bucket", "node"
        ),
        f"{p}/nodes",
        ["bucket"],
    )
    fs.delete(jpath(f"{p}/remaps"), True)
    return n
