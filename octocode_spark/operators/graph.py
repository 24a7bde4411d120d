"""Graph traversal over (nodes, edges) DataFrames — the GraphRAG analog
(reference: adjacency cache + traversals, src/store/graphrag.rs:54-180;
1-hop weighted expansion, src/indexer/search.rs:302-390).

Plain DataFrames + iterative joins; no GraphFrames needed. BFS is a loop of
(frontier ⋈ edges) with an accumulated visited set — k is small (the
reference caps expansion at 1 hop, we support k), so k shuffles total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_hop_neighbors(edges: DataFrame, seeds: DataFrame, k: int = 2,
                    src: str = "src", dst: str = "dst") -> DataFrame:
    """All nodes reachable from ``seeds`` (column `id`) within ≤ k hops,
    with the minimal hop distance: (id, hops). Seeds are hops=0."""
    visited = seeds.select(F.col("id"), F.lit(0).alias("hops"))
    frontier = visited
    for hop in range(1, k + 1):
        nxt = (
            frontier.join(edges, frontier.id == edges[src])
            .select(F.col(dst).alias("id"), F.lit(hop).alias("hops"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited


def weighted_neighbor_scores(edges: DataFrame, seeds: DataFrame,
                             src: str = "src", dst: str = "dst",
                             weight: str = "weight", confidence: str = "confidence") -> DataFrame:
    """1-hop expansion scoring: score[neighbor] += weight·confidence over
    edges from seed nodes (reference A4, src/indexer/search.rs:327-355)."""
    return (
        seeds.join(edges, seeds.id == edges[src])
        .groupBy(F.col(dst).alias("neighbor"))
        .agg(F.sum(F.col(weight) * F.col(confidence)).alias("score"))
    )
