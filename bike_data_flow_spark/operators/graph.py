"""Generic distributed graph traversal: bounded-depth BFS.

Complements the specialized graph operators already in the engine
(pointer-jumping connected components in dedup.py, degree-ordered
triangle counting and label propagation over the k-NN graph in
queries/vectors.py) with the classic frontier-expansion primitive —
min-hop reachability from a seed set.

Scale shape: each round is ONE equi-join (frontier ⋈ edges on the
source endpoint) plus a distinct and an anti-join against the visited
set — all keyed shuffles, no cross product. Work per round is bounded
by the out-edges of the current frontier (the textbook Pregel
superstep, expressed as DataFrame ops). Rounds are a fixed small
``max_hops`` by contract; for deep traversals swap the per-round
``cache()`` for ``localCheckpoint()`` to truncate lineage (the same
discipline as the iterative operators in dedup.py / vectors.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
    Returns (node, hops). First-visit order IS min-hop order (BFS
    invariant), so the anti-join against the visited set both prevents
    recounting and guarantees minimality — no per-node min-agg needed
    at the end.
    """
    frontier = sources.select(F.col(node_col)).distinct()
    visited = frontier.withColumn("hops", F.lit(0)).cache()
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier[node_col] == edges[src_col])
            .select(F.col(dst_col).alias(node_col))
            .distinct()
            .join(visited.select(node_col), node_col, "left_anti")
            .withColumn("hops", F.lit(hop))
            .cache()
        )
        visited = visited.union(nxt).cache()
        frontier = nxt.select(node_col)
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
    iteration; the scalar N and the degree table are the only other
    state. For deep iteration counts checkpoint-truncate the lineage
    as the other iterative operators do (fixed 3 rounds here).
    """
    deg = edges.groupBy(F.col(src_col).alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    n = deg.agg(F.count(F.lit(1)).alias("n"))
    ranks = (
        deg.crossJoin(F.broadcast(n))
        .select(
            "node",
            "deg",
            F.round(F.lit(float(PR_SCALE)) / F.col("n"))
            .cast("long")
            .alias("ps"),
        )
        .cache()
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
        ranks = (
            sums.join(deg, "node")
            .crossJoin(F.broadcast(n))
            .select("node", "deg", (teleport + F.col("_s")).alias("ps"))
            .cache()
        )
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
    iteration. State is the (node, cost) table; caching each round
    truncates the re-execution tree like the other iterative ops.
    """
    dist = sources.select(
        F.col(node_col), F.lit(0).cast("long").alias("cost")
    ).cache()
    for _ in range(rounds):
        relax = (
            dist.join(edges, dist[node_col] == edges[src_col])
            .select(
                F.col(dst_col).alias(node_col),
                (F.col("cost") + F.col(weight_col)).alias("cost"),
            )
        )
        dist = (
            dist.unionByName(relax)
            .groupBy(node_col)
            .agg(F.min("cost").alias("cost"))
            .cache()
        )
    return dist
