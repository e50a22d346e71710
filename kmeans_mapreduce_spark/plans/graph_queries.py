"""Graph analytics over the corpus k-NN graph: PageRank and
fixed-depth BFS reachability.

The edge set is the knn_graph_cells output (pipeline_queries3) — the
standard "curation graph" built from embedding neighborhoods.  Both
queries are genuinely ITERATIVE Spark driver loops (operators/graph.py,
same loop shape as the reference's Lloyd iteration, master.go:123-236)
yet still exactly SQL-expressible because the round count is fixed:
PageRank unrolls its 3 power-iteration steps into chained CTEs, BFS is
a recursive CTE with a hop bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.plans.pipeline_queries import _embs
from kmeans_mapreduce_spark.plans.pipeline_queries3 import (
    KNN_GRAPH_SQL,
    knn_graph_cells,
)

_PR_ITERS = 3
_PR_DAMPING = 0.85
_BFS_SOURCES = 3      # vec_id < 3
_BFS_MAX_HOPS = 4


def _knn_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pinned 4-cell fixture: these queries' DuckDB oracles re-derive the
    # edge set from 4 cells; the operator's own default is ceil(sqrt(N))
    g = knn_graph_cells(spark, sf_dir, k_cells=4)
    return g.select(F.col("node_id").alias("src"), F.col("neighbor_id").alias("dst"))


def graph_pagerank_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the corpus k-NN graph (3 power iterations, d=0.85,
    uniform init + dangling redistribution): which vectors sit in the
    densest neighborhoods — the centrality signal curation uses to pick
    prototypes / flag outliers.

    Scale shape: per round ONE contribution shuffle keyed by dst plus a
    scalar dangling agg; state is O(nodes) and localCheckpoint keeps
    the plan O(1) per round.  The edge frame would be bucketed by src
    at 100 TB so every round's join is co-located (no re-shuffle of the
    big side).  Fixed rounds -> deterministic -> the oracle unrolls the
    same three steps as chained CTEs."""
    from kmeans_mapreduce_spark.operators.graph import pagerank

    nodes = _embs(spark, sf_dir).select(F.col("vec_id").alias("node"))
    pr = pagerank(
        nodes, _knn_edges(spark, sf_dir),
        iterations=_PR_ITERS, damping=_PR_DAMPING,
    )
    return (
        pr.select(
            F.col("node").alias("vec_id"), F.round("pr", 6).alias("pagerank")
        )
        .orderBy("vec_id")
    )


def _pagerank_sql() -> str:
    """Unrolled power iteration: pr{i} -> d{i} (dangling mass) +
    c{i} (in-edge contributions) -> pr{i+1}."""
    d = repr(_PR_DAMPING)
    base = repr(1.0 - _PR_DAMPING)
    parts = [
        f"WITH knn AS ({KNN_GRAPH_SQL}),",
        "edges AS (SELECT node_id AS src, neighbor_id AS dst FROM knn),",
        "deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),",
        "nodes AS (SELECT vec_id AS node FROM embeddings),",
        "nn AS (SELECT COUNT(*)::DOUBLE AS n FROM nodes),",
        "pr0 AS (SELECT node, 1.0 / nn.n AS pr FROM nodes CROSS JOIN nn),",
    ]
    # Sums run as DECIMAL(38,18) in BOTH engines (see operators/
    # graph.pagerank): double summation follows each engine's runtime
    # aggregation order (Spark shuffle-fetch order, DuckDB thread
    # interleaving), which once flipped a rank across a rounding
    # boundary.  With exact commutative decimal sums over identical
    # terms, both engines produce bit-identical doubles every round,
    # so the final ROUND agrees no matter where boundaries fall.
    for i in range(_PR_ITERS):
        parts.append(
            f"d{i} AS (SELECT COALESCE(CAST(SUM(CAST(pr AS DECIMAL(38,18)))"
            f" AS DOUBLE), 0.0) AS m FROM pr{i} "
            f"LEFT JOIN deg ON pr{i}.node = deg.src WHERE deg.src IS NULL),"
        )
        parts.append(
            f"c{i} AS (SELECT e.dst AS node, "
            f"CAST(SUM(CAST(p.pr / deg.outdeg AS DECIMAL(38,18))) AS DOUBLE)"
            f" AS c "
            f"FROM pr{i} p JOIN deg ON p.node = deg.src "
            f"JOIN edges e ON e.src = p.node GROUP BY e.dst),"
        )
        parts.append(
            f"pr{i + 1} AS (SELECT nodes.node, "
            f"{base} / nn.n + {d} * (COALESCE(c.c, 0.0) + d{i}.m / nn.n) AS pr "
            f"FROM nodes CROSS JOIN nn CROSS JOIN d{i} "
            f"LEFT JOIN c{i} c ON nodes.node = c.node),"
        )
    last = f"pr{_PR_ITERS}"
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT node AS vec_id, ROUND(pr, 6) AS pagerank FROM {last} "
        "ORDER BY vec_id"
    )
    return "\n".join(parts)


PAGERANK_SQL = _pagerank_sql()


def graph_bfs_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed BFS from seed vectors (vec_id < 3) over the k-NN graph,
    4 hops max: per-hop reached-set size + id checksum — the
    "neighborhood expansion" primitive behind contamination spread and
    seed-based corpus selection.

    Iterative frontier loop (one equi-join + anti-join merge per hop);
    the oracle is the equivalent bounded recursive CTE with a min-hop
    collapse.  Fixed depth makes reached set and hop values
    partitioning-independent."""
    from kmeans_mapreduce_spark.operators.graph import bfs_hops

    sources = (
        _embs(spark, sf_dir)
        .where(F.col("vec_id") < _BFS_SOURCES)
        .select(F.col("vec_id").alias("node"))
    )
    dist = bfs_hops(sources, _knn_edges(spark, sf_dir), max_hops=_BFS_MAX_HOPS)
    return (
        dist.groupBy("hop")
        .agg(
            F.count("*").alias("n_nodes"),
            F.sum("node").alias("id_checksum"),
        )
        .orderBy("hop")
    )


def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the undirected k-NN graph (top 20
    by count) plus the global triangle total — the local-density signal
    behind clustering-coefficient curation and community seeding.

    Plan: canonicalize edges to a<b once (symmetrize + distinct, one
    shuffle), then the standard two-join triangle enumeration
    (a<b<c) — because every join keys on a node id and k-NN degree is
    bounded by k, intermediate wedge counts are O(N·k²), not O(N²).
    At 100 TB the edge frame would be bucketed by src so both joins
    co-locate; node-degree skew is capped by construction (k<=3 here).
    """
    from kmeans_mapreduce_spark.operators.graph import triangle_counts

    per_node = triangle_counts(_knn_edges(spark, sf_dir))
    # every node's count is 3x its triangle membership, so the global
    # total is sum/3 — one tiny agg over the per-node frame
    total = per_node.agg(
        F.expr("sum(triangles) div 3").alias("total_triangles")
    )
    return (
        per_node.crossJoin(F.broadcast(total))
        .orderBy(F.desc("triangles"), "vec_id")
        .limit(20)
    )


TRIANGLE_SQL = f"""
WITH knn AS ({KNN_GRAPH_SQL}),
und AS (
  SELECT DISTINCT LEAST(node_id, neighbor_id) AS a,
                  GREATEST(node_id, neighbor_id) AS b
  FROM knn WHERE node_id != neighbor_id),
tris AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
total AS (SELECT COUNT(*) AS total_triangles FROM tris),
nodes AS (
  SELECT vec_id, COUNT(*) AS triangles FROM (
    SELECT x AS vec_id FROM tris
    UNION ALL SELECT y FROM tris
    UNION ALL SELECT z FROM tris)
  GROUP BY vec_id)
SELECT vec_id, triangles, total_triangles
FROM nodes CROSS JOIN total
ORDER BY triangles DESC, vec_id LIMIT 20
"""


BFS_REACH_SQL = f"""
WITH RECURSIVE knn AS ({KNN_GRAPH_SQL}),
edges AS (SELECT node_id AS src, neighbor_id AS dst FROM knn),
reach AS (
  SELECT vec_id AS node, 0 AS hop FROM embeddings WHERE vec_id < {_BFS_SOURCES}
  UNION
  SELECT e.dst AS node, r.hop + 1 AS hop
  FROM reach r JOIN edges e ON e.src = r.node
  WHERE r.hop < {_BFS_MAX_HOPS}),
minhop AS (SELECT node, MIN(hop) AS hop FROM reach GROUP BY node)
SELECT hop, COUNT(*) AS n_nodes, CAST(SUM(node) AS BIGINT) AS id_checksum
FROM minhop GROUP BY hop ORDER BY hop
"""
