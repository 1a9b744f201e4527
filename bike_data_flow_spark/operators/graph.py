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
