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

__all__ = ["pagerank", "triangle_counts", "label_propagation", "k_core"]


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
    from pyveb_spark.operators.cache import cached_once

    # the edge list is read for degrees plus ONCE PER ITERATION — without
    # a cache the full upstream edge derivation recomputes iters+2 times
    edges = cached_once(edges, "graph.pagerank.edges")
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    # deg and base are likewise re-read per unrolled iteration (the final
    # plan embeds them iters times); both are node-sized. Without these
    # caches every iteration re-runs the 2|E|-row distinct (nodes) and
    # the degree aggregation over the cached edges — measured ~35% of
    # warm q109 at sf0.1.
    deg = cached_once(
        edges.groupBy(F.col(src).alias("node")).agg(
            F.count(F.lit(1)).alias("__deg")
        ),
        "graph.pagerank.deg",
    )
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("__n"))
    base = cached_once(
        nodes.crossJoin(F.broadcast(n_nodes))
        .select("node", (F.lit(1.0) / F.col("__n")).alias("rank"), "__n"),
        "graph.pagerank.base",
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


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iters: int = 4,
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan et
    al. 2007, the near-linear-time LPA): every node starts in its own
    community (label = node id); each iteration every node adopts the
    label carrying the largest (weighted) vote among its in-neighbors,
    with a DETERMINISTIC tie-break — highest vote first, then smallest
    label — so two engines replaying the same graph converge to the same
    assignment. Isolated nodes (no in-edges) keep their label. Pass both
    edge directions for an undirected graph. Returns ``(node, community)``
    for every node after ``iters`` synchronous rounds.

    100 TB design: one iteration = one join of the edge list with the
    k-row label table on ``src`` + one (node, label) vote aggregation +
    one row_number() window partitioned by node — all shuffle-keyed on
    node ids, so bucketing the edge list by ``src`` leaves only the label
    table moving per round. Synchronous (Pregel-style) updates rather
    than the paper's sequential sweep: order-free, hence distributable
    and oracle-replayable; the tie-break rule doubles as the oscillation
    damper. Lineage grows one join per round — checkpoint every few
    rounds at high ``iters`` (the q41 connected-components pattern).
    """
    from pyspark.sql import Window

    from pyveb_spark.operators.cache import cached_once

    w = F.col(weight) if weight else F.lit(1)
    # the edge list is re-read every round — cache it, not the raw input
    edges = cached_once(
        edges.select(
            F.col(src).alias("__src"),
            F.col(dst).alias("__dst"),
            w.alias("__w"),
        ),
        "graph.lpa.edges",
    )
    nodes = (
        edges.select(F.col("__src").alias("node"))
        .unionByName(edges.select(F.col("__dst").alias("node")))
        .distinct()
    )
    labels = nodes.select("node", F.col("node").alias("community"))
    rank_w = Window.partitionBy("node").orderBy(
        F.col("__vote").desc(), F.col("community").asc()
    )
    for _ in range(iters):
        votes = (
            edges.join(
                labels.withColumnRenamed("node", "__src"), "__src"
            )
            .groupBy(F.col("__dst").alias("node"), "community")
            .agg(F.sum("__w").alias("__vote"))
        )
        best = (
            votes.withColumn("__rn", F.row_number().over(rank_w))
            .where(F.col("__rn") == 1)
            .select("node", F.col("community").alias("__new"))
        )
        labels = (
            nodes.join(best, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("__new"), F.col("node")).alias("community"),
            )
        )
    return labels


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node triangle counts over an undirected graph given as an edge
    list (either or both directions, duplicates and self-loops tolerated).
    Returns ``(node, triangles)`` for every node that closes at least one
    triangle. The global count is ``Σ triangles / 3``.

    Degree-ordered node-iterator (Schank & Wagner 2005; the MapReduce
    formulation is Suri & Vassilvitskii, WWW 2011): canonicalize each edge
    to ``a < b``, then orient every edge from its LOWER-(degree, id)
    endpoint to the higher one. Wedges are enumerated by self-joining the
    oriented list on the pivot — because every node's oriented out-degree
    is O(√m) regardless of its real degree, the wedge fan-out of hub
    nodes collapses from deg² to m, which is what makes this survive
    power-law graphs at 100 TB. Each candidate wedge is closed by one
    hash join against the canonical edge set.

    Shuffle shape: one groupBy for degrees, two joins to attach them,
    the wedge self-join keyed on the pivot node, and the closing join
    keyed on the (min, max) node pair — all key-partitioned, no
    cartesian, nothing driver-side.
    """
    a, b = F.col(src), F.col(dst)
    from pyveb_spark.operators.cache import cached_once

    # canon is read three times (degrees, orientation attach, closing
    # join) — cache the canonical edge set, not the raw input
    canon = cached_once(
        edges.where(a != b)
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .distinct(),
        "graph.triangles.canon",
    )
    deg = (
        canon.select(F.col("a").alias("node"))
        .unionByName(canon.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("__deg"))
    )
    with_deg = (
        canon.join(deg.withColumnRenamed("node", "a"), "a")
        .withColumnRenamed("__deg", "__da")
        .join(deg.withColumnRenamed("node", "b"), "b")
        .withColumnRenamed("__deg", "__db")
    )
    lo_first = F.struct(F.col("__da"), F.col("a")) < F.struct(
        F.col("__db"), F.col("b")
    )
    oriented = with_deg.select(
        F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    )
    # Pin the wedge-join exchange width (layout.pin_width — the q17
    # rule): the oriented edge list descends from the CACHED canonical
    # edge set, whose tiny cached bytes are what AQE's coalescing sizes
    # consumers by (canChangeCachedPlanOutputPartitioning=true), while
    # the wedge self-join's output is Σ outdeg² — CPU-quadratic. The pin
    # IS the pivot-key distribution the join needs; no extra exchange.
    from pyveb_spark.operators.layout import pin_width

    oriented = pin_width(oriented, "u")
    e1 = oriented.alias("e1")
    e2 = oriented.alias("e2")
    wedges = e1.join(
        e2,
        (F.col("e1.u") == F.col("e2.u")) & (F.col("e1.v") < F.col("e2.v")),
    ).select(
        F.col("e1.u").alias("pivot"),
        F.col("e1.v").alias("x"),
        F.col("e2.v").alias("y"),
    )
    tri = wedges.join(
        canon,
        (F.least(F.col("x"), F.col("y")) == F.col("a"))
        & (F.greatest(F.col("x"), F.col("y")) == F.col("b")),
    ).select("pivot", "x", "y")
    return (
        tri.select(
            F.explode(F.array(F.col("pivot"), F.col("x"), F.col("y"))).alias(
                "node"
            )
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
) -> DataFrame:
    """The k-core of an undirected graph: the maximal subgraph where
    every node keeps degree ≥ k — computed by distributed peeling
    (Batagelj–Zaveršnik): repeatedly drop every node whose CURRENT
    degree is < k until a fixpoint. Returns ``(node, core_degree)`` with
    degrees measured INSIDE the core. The standard structural screen for
    web/link graphs in training-data curation — low-core pages are the
    isolated/spam-farm periphery, the dense core is where organic link
    structure lives (and the seed for community detection).

    Shuffle shape per round: ONE degree aggregation (map-side partials
    over the exploded endpoints) + two semi-joins filtering the edge
    list; rounds = peeling depth (typically ≪ node count; NOT the
    graph diameter). The survivor set is monotone decreasing, so an
    unchanged keep-count IS the fixpoint. Per round the driver sees one
    scalar count and the lineage is truncated with a lazy
    ``localCheckpoint`` — the connected-components discipline
    (``dedup.duplicate_clusters``); no node data ever reaches the
    driver. Raises after ``max_rounds`` instead of silently returning a
    non-core."""
    a, b = F.col(src), F.col(dst)
    cur = (
        edges.where(a != b)
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    prev_nodes = None
    prev_keep = None
    for _ in range(max_rounds):
        deg = (
            cur.select(F.col("a").alias("node"))
            .unionByName(cur.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("core_degree"))
        )
        # persist the survivor table: the convergence count AND the two
        # semi-joins below consume it, so the degree aggregation runs
        # once per round regardless of when the lazy checkpoint on cur
        # materializes (wall-clock here is job-latency-bound — ~2 jobs
        # per round — which amortizes at real scale exactly like k-means)
        keep = deg.where(F.col("core_degree") >= int(k)).persist()
        n_keep = keep.count()
        if prev_keep is not None:
            prev_keep.unpersist(blocking=False)
        prev_keep = keep
        if (prev_nodes is not None and n_keep == prev_nodes) or n_keep == 0:
            out = keep.select("node", "core_degree").localCheckpoint()
            keep.unpersist(blocking=False)
            return out
        prev_nodes = n_keep
        kn = keep.select("node")
        cur = (
            cur.join(kn.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(kn.withColumnRenamed("node", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=False)
        )
    raise ValueError(
        f"k_core did not converge within {max_rounds} peeling rounds"
    )
