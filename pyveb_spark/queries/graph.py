"""Iterative graph: PageRank, triangles, label propagation.

Split from the round-4 queries.py monolith; float determinism contract
in ``pyveb_spark.queries.__doc__``. Registry/gate-window order lives in
``pyveb_spark/queries/__init__.py`` only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyveb_spark.operators.cleaning import clean_old_dates
from pyveb_spark.operators.joins import asof_join
from pyveb_spark.queries._helpers import _dec, _query_vec
from pyveb_spark.sources.readers import read_table



def q109_trade_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the bidirected customer↔supplier trade graph (edges
    from distinct (o_custkey, l_suppkey) pairs of high-value orders,
    o_totalprice > 150000, both directions so no node dangles), 3
    iterations, d=0.85, top 20 nodes. Each iteration is one edge⋈rank
    join + one aggregation (``operators/graph.py``); the oracle unrolls
    all three iterations as CTEs (the q57 treatment). Ranks compared at
    round(6) — contribution sums are order-dependent doubles (~1e-16 per
    term); the (rank, node) order is made total by the node tiebreak."""
    from pyveb_spark.operators.graph import pagerank

    o = read_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > 150000
    )
    l = read_table(spark, sf_dir, "lineitem")
    cs = (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    edges = cs.unionByName(
        cs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    ranks = pagerank(edges, iters=3, damping=0.85)
    return (
        ranks.select("node", F.round("rank", 6).alias("rank"))
        .orderBy(F.col("rank").desc(), F.col("node"))
        .limit(20)
    )


_Q109_SQL = """
WITH cs AS (SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            WHERE o_totalprice > 150000),
edges AS (SELECT src, dst FROM cs UNION ALL SELECT dst, src FROM cs),
nodes AS (SELECT DISTINCT node FROM
            (SELECT src AS node FROM edges
             UNION ALL SELECT dst FROM edges)),
nn AS (SELECT COUNT(*) AS n FROM nodes),
deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY src),
r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes),
i1 AS (SELECT e.dst AS node, SUM(r.rank / d.deg) AS s
       FROM edges e JOIN r0 r ON e.src = r.node JOIN deg d ON e.src = d.node
       GROUP BY e.dst),
r1 AS (SELECT nodes.node,
              0.15 / (SELECT n FROM nn)
              + 0.85 * COALESCE(i1.s, 0.0) AS rank
       FROM nodes LEFT JOIN i1 ON nodes.node = i1.node),
i2 AS (SELECT e.dst AS node, SUM(r.rank / d.deg) AS s
       FROM edges e JOIN r1 r ON e.src = r.node JOIN deg d ON e.src = d.node
       GROUP BY e.dst),
r2 AS (SELECT nodes.node,
              0.15 / (SELECT n FROM nn)
              + 0.85 * COALESCE(i2.s, 0.0) AS rank
       FROM nodes LEFT JOIN i2 ON nodes.node = i2.node),
i3 AS (SELECT e.dst AS node, SUM(r.rank / d.deg) AS s
       FROM edges e JOIN r2 r ON e.src = r.node JOIN deg d ON e.src = d.node
       GROUP BY e.dst),
r3 AS (SELECT nodes.node,
              0.15 / (SELECT n FROM nn)
              + 0.85 * COALESCE(i3.s, 0.0) AS rank
       FROM nodes LEFT JOIN i3 ON nodes.node = i3.node)
SELECT node, ROUND(rank, 6) AS rank
FROM r3 ORDER BY rank DESC, node LIMIT 20
"""


def q110_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counts over the part co-purchase graph (edges = part pairs
    sharing an URGENT order): the community-density primitive behind
    co-occurrence clustering and link-spam screens. Edges come from a
    bounded per-order pair fan-out (≤ lines²/order) + distinct; counting
    is the degree-ordered node-iterator in ``operators/graph.py`` —
    oriented out-degree is O(√m), so hub wedges can't explode. Top 20
    nodes by (triangles, partkey) total order."""
    from pyveb_spark.operators.graph import triangle_counts

    o = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    l = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    l2 = l.select(
        F.col("l_orderkey").alias("okey2"), F.col("l_partkey").alias("pkey2")
    )
    edges = (
        l.join(o.select("o_orderkey"), l["l_orderkey"] == F.col("o_orderkey"))
        .join(
            l2,
            (F.col("l_orderkey") == F.col("okey2"))
            & (F.col("l_partkey") < F.col("pkey2")),
        )
        .select(F.col("l_partkey").alias("src"), F.col("pkey2").alias("dst"))
        .distinct()
    )
    return (
        triangle_counts(edges)
        .orderBy(F.col("triangles").desc(), F.col("node"))
        .limit(20)
    )


_Q110_SQL = """
WITH u AS (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'),
e AS (SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
      FROM lineitem l1
      JOIN u ON l1.l_orderkey = u.o_orderkey
      JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey),
t AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e e1
      JOIN e e2 ON e1.b = e2.a
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
SELECT node, COUNT(*) AS triangles
FROM (SELECT x AS node FROM t
      UNION ALL SELECT y FROM t
      UNION ALL SELECT z FROM t)
GROUP BY node
ORDER BY triangles DESC, node
LIMIT 20
"""


def q139_nation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection over the nation-level trade graph
    (``graph.py::label_propagation``, Raghavan et al. 2007): edges are
    (customer nation ↔ supplier nation) weighted by lineitem count —
    aggregated FIRST so the iterative rounds run over a ≤|nations|²-row
    weighted edge list, not the fact table — then three synchronous LPA
    rounds with the deterministic (vote desc, label asc) tie-break. The
    oracle unrolls all three rounds as CTEs (the q109 treatment); exact
    integer votes, so the assignment is hash-certified."""
    from pyveb_spark.operators.graph import label_propagation

    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem")
    cn = c.join(n, c["c_nationkey"] == n["n_nationkey"]).select(
        "c_custkey", F.col("n_name").alias("cnation")
    )
    sn = s.join(n, s["s_nationkey"] == n["n_nationkey"]).select(
        "s_suppkey", F.col("n_name").alias("snation")
    )
    ce = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(cn, o["o_custkey"] == cn["c_custkey"])
        .join(sn, l["l_suppkey"] == sn["s_suppkey"])
        .groupBy("cnation", "snation")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    edges = ce.select(
        F.col("cnation").alias("src"), F.col("snation").alias("dst"), "w"
    ).unionByName(
        ce.select(
            F.col("snation").alias("src"),
            F.col("cnation").alias("dst"),
            "w",
        )
    )
    return label_propagation(
        edges, "src", "dst", weight="w", iters=3
    ).orderBy("node")


def _q139_sql(iters: int = 3) -> str:
    blocks = [
        """
WITH ce AS (
  SELECT cn.n_name AS cnation, sn.n_name AS snation,
         COUNT(*)::BIGINT AS w
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  GROUP BY 1, 2),
edges AS (SELECT cnation AS src, snation AS dst, w FROM ce
          UNION ALL
          SELECT snation, cnation, w FROM ce),
nodes AS (SELECT DISTINCT node FROM
            (SELECT src AS node FROM edges
             UNION ALL SELECT dst FROM edges)),
l0 AS (SELECT node, node AS community FROM nodes)"""
    ]
    for i in range(1, iters + 1):
        p = i - 1
        blocks.append(
            f""",
v{i} AS (SELECT e.dst AS node, l.community, SUM(e.w)::BIGINT AS vote
        FROM edges e JOIN l{p} l ON l.node = e.src
        GROUP BY 1, 2),
b{i} AS (SELECT node, community FROM
          (SELECT node, community,
                  ROW_NUMBER() OVER (PARTITION BY node
                                     ORDER BY vote DESC, community) AS rn
           FROM v{i})
        WHERE rn = 1),
l{i} AS (SELECT n.node, COALESCE(b.community, n.node) AS community
        FROM nodes n LEFT JOIN b{i} b ON b.node = n.node)"""
        )
    return (
        "".join(blocks)
        + f"\nSELECT node, community FROM l{iters} ORDER BY node"
    )


# ---------------------------------------------------------------------------
# LLM ops: k-core decomposition of the co-purchase graph
# ---------------------------------------------------------------------------

def q171_copurchase_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-core of the part co-purchase graph (the q110 edge set): the
    dense organic center after peeling away the long low-degree
    periphery — the structural screen link-graph curation applies before
    trusting connectivity signals (spam farms and isolated tails live
    below the core). ``operators/graph.py::k_core`` peels to the TRUE
    fixpoint (driver sees one scalar per round; lineage checkpointed);
    the oracle replays 12 unrolled peel rounds — strictly more than any
    committed fixture needs (sf0.1 converges in 8) — so the fixpoint and
    the unrolled form provably agree, and a peeling bug that converged
    to a different subgraph hash-mismatches. Output: every core member
    with its IN-CORE degree."""
    from pyveb_spark.operators.graph import k_core

    o = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    l = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    l2 = l.select(
        F.col("l_orderkey").alias("okey2"), F.col("l_partkey").alias("pkey2")
    )
    edges = (
        l.join(o.select("o_orderkey"), l["l_orderkey"] == F.col("o_orderkey"))
        .join(
            l2,
            (F.col("l_orderkey") == F.col("okey2"))
            & (F.col("l_partkey") < F.col("pkey2")),
        )
        .select(F.col("l_partkey").alias("src"), F.col("pkey2").alias("dst"))
        .distinct()
    )
    return k_core(edges, k=14).orderBy("node")


def _q171_sql(k: int = 14, rounds: int = 12) -> str:
    # every round MATERIALIZED: DuckDB inlines plain CTEs, so a 12-deep
    # self-referencing chain would otherwise expand exponentially (first
    # symptom: "Too many open files" on the parquet view)
    blocks = [
        """
WITH u AS (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'),
e0 AS MATERIALIZED (SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
       FROM lineitem l1
       JOIN u ON l1.l_orderkey = u.o_orderkey
       JOIN lineitem l2
         ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey)"""
    ]
    for i in range(rounds):
        blocks.append(
            f""",
k{i} AS MATERIALIZED (SELECT node FROM
          (SELECT node, COUNT(*) AS deg FROM
            (SELECT a AS node FROM e{i} UNION ALL SELECT b FROM e{i})
           GROUP BY node)
        WHERE deg >= {k}),
e{i + 1} AS MATERIALIZED (SELECT e.a, e.b FROM e{i} e
        JOIN k{i} x ON e.a = x.node
        JOIN k{i} y ON e.b = y.node)"""
        )
    return (
        "".join(blocks)
        + f""",
df AS (SELECT node, COUNT(*)::BIGINT AS core_degree FROM
        (SELECT a AS node FROM e{rounds} UNION ALL SELECT b FROM e{rounds})
       GROUP BY node)
SELECT node, core_degree FROM df WHERE core_degree >= {k} ORDER BY node"""
    )
