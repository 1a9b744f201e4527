"""Generic distributed graph traversal: bounded-depth BFS, PageRank,
Bellman-Ford.

Complements the specialized graph operators already in the engine
(pointer-jumping connected components in dedup.py, degree-ordered
triangle counting and label propagation over the k-NN graph in
queries/vectors.py) with the classic frontier-expansion primitives.

Iteration discipline (shared by all three loops): every round ends in
``localCheckpoint(eager=True)`` — materializing the round AND
truncating the logical plan, so plan size stays CONSTANT across rounds
(a cache() alone leaves the logical tree growing; BFS/Bellman-Ford
reference the previous round 2-3×, so an uncheckpointed plan doubles
per round and analysis OOMs near depth 6). The superseded round's
checkpoint blocks are then released deterministically through the
persistent-RDD handle captured at checkpoint time — state on the
cluster is always exactly ONE round deep, the bpe.py deferred-release
discipline (never release before the new round materializes: local
checkpoints cannot recompute).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _persistent_ids(sc) -> set[int]:
    ids = set()
    it = sc._jsc.sc().getPersistentRDDs().iterator()
    while it.hasNext():
        ids.add(it.next()._1())
    return ids


def _checkpoint_round(df: DataFrame):
    """localCheckpoint(eager) + the newly-persisted RDD handles, so the
    round can be released deterministically once superseded (there is
    no public unpersist for local checkpoints)."""
    sc = df.sparkSession.sparkContext
    before = _persistent_ids(sc)
    out = df.localCheckpoint()  # eager by default
    handles = []
    it = sc._jsc.sc().getPersistentRDDs().iterator()
    while it.hasNext():
        kv = it.next()
        if kv._1() not in before:
            handles.append(kv._2())
    return out, handles


def _release(handles) -> None:
    for h in handles:
        h.unpersist(False)


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
) -> DataFrame:
    """Minimum hop count from ``sources`` to every node reachable in at
    most ``max_hops`` directed edge traversals.

    ``edges``: (src, dst) directed — symmetrize first for undirected
    semantics. ``sources``: one ``node`` column; each seed is hop 0.
    Returns (node, hops), materialized. First-visit order IS min-hop
    order (BFS invariant), so the anti-join against the visited set
    both prevents recounting and guarantees minimality — no per-node
    min-agg needed at the end.

    Scale shape per round: ONE equi-join (frontier ⋈ edges on the
    source endpoint) + a distinct + an anti-join — all keyed shuffles,
    no cross product; work is bounded by the frontier's out-edges (the
    textbook Pregel superstep). The frontier is re-derived from the
    checkpointed visited table (``hops == hop-1``) rather than held as
    a separate cached round, so per-round cluster state is exactly the
    visited table.
    """
    visited, handles = _checkpoint_round(
        sources.select(F.col(node_col)).distinct().withColumn("hops", F.lit(0))
    )
    for hop in range(1, max_hops + 1):
        frontier = visited.filter(F.col("hops") == hop - 1).select(node_col)
        nxt = (
            frontier.join(edges, frontier[node_col] == edges[src_col])
            .select(F.col(dst_col).alias(node_col))
            .distinct()
            .join(visited.select(node_col), node_col, "left_anti")
            .withColumn("hops", F.lit(hop))
        )
        new_visited, new_handles = _checkpoint_round(visited.union(nxt))
        _release(handles)
        visited, handles = new_visited, new_handles
    return visited


PR_SCALE = 1_000_000_000_000  # integer-scaling for fold-order-free sums


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """PageRank over a directed edge list (nodes = edge endpoints'
    sources; supply a symmetrized list for undirected semantics, which
    also guarantees no dangling mass — every node then has out-edges).

    p_{t+1}(v) = (1−d)/N + d·Σ_{u→v} p_t(u)/outdeg(u), fixed ``iters``
    rounds from the uniform start. Engine-parity: the rank STATE is a
    scaled integer (rank × PR_SCALE) end-to-end — contributions are
    single rounds of identical doubles (round-to-integer agrees across
    engines when the input doubles are bit-identical), sums are exact
    BIGINTs, and the only doubles ever compared are final long→double
    divisions. The previous spelling re-rounded a double rank to 12
    DECIMALS each round; multi-digit rounding is implemented
    differently across engines (BigDecimal half-up vs scaled
    nearest-int), so a rank landing on a 1e-12 boundary diverged —
    caught by the sf0.01 replica after a testdata refresh, fixed by
    never multi-digit-rounding state.

    Scale shape per round: ONE edges⋈ranks equi-join + ONE partial-agg
    groupBy(dst) — node- and edge-bounded, the textbook Pregel
    iteration; the degree table is cached once and released at the
    end, rank state is one checkpointed round deep.
    """
    deg = edges.groupBy(F.col(src_col).alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    ).cache()
    n = deg.agg(F.count(F.lit(1)).alias("n"))
    ranks, handles = _checkpoint_round(
        deg.crossJoin(F.broadcast(n)).select(
            "node",
            "deg",
            F.round(F.lit(float(PR_SCALE)) / F.col("n")).cast("long").alias("ps"),
        )
    )
    teleport = (
        F.round(F.lit(1.0 - damping) * F.lit(float(PR_SCALE)) / F.col("n"))
        .cast("long")
    )
    for _ in range(iters):
        contrib = edges.join(
            ranks, edges[src_col] == ranks["node"]
        ).select(
            F.col(dst_col).alias("node"),
            F.round(F.lit(damping) * F.col("ps") / F.col("deg"))
            .cast("long")
            .alias("_c"),
        )
        sums = contrib.groupBy("node").agg(F.sum("_c").alias("_s"))
        new_ranks, new_handles = _checkpoint_round(
            sums.join(deg, "node")
            .crossJoin(F.broadcast(n))
            .select("node", "deg", (teleport + F.col("_s")).alias("ps"))
        )
        _release(handles)
        ranks, handles = new_ranks, new_handles
    deg.unpersist()
    return ranks.select(
        "node",
        F.col("ps").alias("pr_scaled"),
        (F.col("ps").cast("double") / F.lit(float(PR_SCALE))).alias("pagerank"),
    )


def bellman_ford(
    edges: DataFrame,
    sources: DataFrame,
    rounds: int,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    node_col: str = "node",
) -> DataFrame:
    """Bounded-depth single-source shortest paths (Bellman-Ford): after
    ``rounds`` relaxations, (node, cost) holds the minimum path cost
    over all paths of at most ``rounds`` edges from ``sources``
    (cost 0). Weights must be non-negative integers/longs — the
    min-plus semiring is then EXACT and fold-order-free (min is
    commutative/associative; no float accumulation), so an unrolled
    oracle reproduces it bit-for-bit.

    Scale shape per round: one frontier⋈edges equi-join + one
    (node) min-aggregate — node/edge-bounded, the Pregel SSSP
    iteration. State is the (node, cost) table, one checkpointed
    round deep (dist feeds each round twice — relax join + union — so
    the checkpoint is what keeps the plan from doubling per round).
    """
    dist, handles = _checkpoint_round(
        sources.select(F.col(node_col), F.lit(0).cast("long").alias("cost"))
    )
    for _ in range(rounds):
        relax = (
            dist.join(edges, dist[node_col] == edges[src_col])
            .select(
                F.col(dst_col).alias(node_col),
                (F.col("cost") + F.col(weight_col)).alias("cost"),
            )
        )
        new_dist, new_handles = _checkpoint_round(
            dist.unionByName(relax)
            .groupBy(node_col)
            .agg(F.min("cost").alias("cost"))
        )
        _release(handles)
        dist, handles = new_dist, new_handles
    return dist
