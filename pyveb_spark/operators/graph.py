"""Iterative graph algorithms as join/agg recurrences — no graph library.

Connected components live in ``operators.dedup`` (large-star/small-star);
this module holds rank-propagation style algorithms. Everything is the
join-based formulation: node/edge DataFrames, one shuffle-keyed join plus
one aggregation per iteration, model-free — the shape that scales to
edge sets far beyond any single machine (GraphX's Pregel compiles to the
same plan; depending on it buys nothing for these recurrences).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank by ``iters`` unrolled join/agg iterations:
    ``r'(v) = (1-d)/N + d · Σ_{u→v} r(u)/deg(u)`` (Page et al. 1999).
    Dangling-node mass is dropped, not redistributed — the common
    simplification; add reverse edges upstream if every node should have
    out-degree. Returns ``(node, rank)`` for every node.

    100 TB design: each iteration is ONE join of the edge list with the
    current rank table on ``src`` plus ONE aggregation on ``dst`` — both
    shuffle-keyed on node ids, so pre-partitioning/bucketing the edge
    list by ``src`` makes the join side shuffle-free and only the k-row
    rank table moves per iteration. The lazy plan unrolls ``iters``
    joins; checkpoint every few iterations at high iteration counts
    (the q41 connected-components pattern) to cap lineage depth.

    Float contract: per-node contribution sums are double adds whose
    order is engine/layout dependent (~1e-16/term); compare ranks
    rounded (the k-means centroid treatment), not bit-exact.
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    deg = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).alias("__deg")
    )
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("__n"))
    base = (
        nodes.crossJoin(F.broadcast(n_nodes))
        .select("node", (F.lit(1.0) / F.col("__n")).alias("rank"), "__n")
    )
    ranks = base.select("node", "rank")
    for _ in range(iters):
        contribs = (
            edges.join(ranks.withColumnRenamed("node", src), src)
            .join(deg.withColumnRenamed("node", src), src)
            .select(
                F.col(dst).alias("node"),
                (F.col("rank") / F.col("__deg")).alias("__contrib"),
            )
            .groupBy("node")
            .agg(F.sum("__contrib").alias("__in"))
        )
        ranks = (
            base.select("node", "__n")
            .join(contribs, "node", "left")
            .select(
                "node",
                (
                    (F.lit(1.0) - F.lit(damping)) / F.col("__n")
                    + F.lit(damping) * F.coalesce(F.col("__in"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks
