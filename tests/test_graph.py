"""Iterative graph operators: PageRank power iteration and bounded BFS."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "node long")


def test_pagerank_cycle_uniform(spark):
    """A directed 3-cycle is perfectly symmetric: PageRank stays uniform
    at every iteration."""
    from kmeans_mapreduce_spark.operators.graph import pagerank

    pr = pagerank(
        _nodes(spark, [0, 1, 2]),
        _edges(spark, [(0, 1), (1, 2), (2, 0)]),
        iterations=5,
    ).collect()
    for r in pr:
        assert r["pr"] == pytest.approx(1 / 3, abs=1e-12)


def test_pagerank_star_hand_computed(spark):
    """Star 1->0, 2->0, 3->0 (0 dangling), one iteration, d=0.85, N=4:
      dangling mass m = pr(0) = 0.25
      pr'(0)   = 0.15/4 + 0.85*(3*0.25 + 0.25/4) = 0.7296875
      pr'(leaf)= 0.15/4 + 0.85*(0 + 0.25/4)      = 0.0906250"""
    from kmeans_mapreduce_spark.operators.graph import pagerank

    pr = {
        r["node"]: r["pr"]
        for r in pagerank(
            _nodes(spark, [0, 1, 2, 3]),
            _edges(spark, [(1, 0), (2, 0), (3, 0)]),
            iterations=1,
        ).collect()
    }
    assert pr[0] == pytest.approx(0.0375 + 0.85 * (0.75 + 0.0625), abs=1e-12)
    for leaf in (1, 2, 3):
        assert pr[leaf] == pytest.approx(0.0375 + 0.85 * 0.0625, abs=1e-12)


def test_pagerank_mass_conserved(spark, sf_dir):
    """With dangling redistribution, total PageRank mass stays 1."""
    from kmeans_mapreduce_spark.plans.graph_queries import (
        graph_pagerank_vectors,
    )

    rows = graph_pagerank_vectors(spark, sf_dir).collect()
    assert len(rows) == 500
    total = sum(r["pagerank"] for r in rows)
    assert total == pytest.approx(1.0, abs=1e-3)  # 500 x round(6) slack
    assert all(r["pagerank"] > 0 for r in rows)


def test_bfs_chain(spark):
    """Chain 0->1->2->3->4 from source 0: hop == node id, and node 4
    stays unreached with max_hops=3."""
    from kmeans_mapreduce_spark.operators.graph import bfs_hops

    edges = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    got = {
        r["node"]: r["hop"]
        for r in bfs_hops(_nodes(spark, [0]), edges, max_hops=3).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_bfs_min_hop_on_diamond(spark):
    """Diamond 0->1->3, 0->2->3 plus the long way 1->2: node 3 keeps
    its MIN hop (2), node 2 keeps hop 1 (not 2 via node 1)."""
    from kmeans_mapreduce_spark.operators.graph import bfs_hops

    edges = _edges(spark, [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)])
    got = {
        r["node"]: r["hop"]
        for r in bfs_hops(_nodes(spark, [0]), edges, max_hops=4).collect()
    }
    assert got == {0: 0, 1: 1, 2: 1, 3: 2}


def test_bfs_reach_invariants(spark, sf_dir):
    from kmeans_mapreduce_spark.plans.graph_queries import (
        _BFS_MAX_HOPS,
        _BFS_SOURCES,
        graph_bfs_reach,
    )

    rows = graph_bfs_reach(spark, sf_dir).collect()
    by_hop = {r["hop"]: r for r in rows}
    assert by_hop[0]["n_nodes"] == _BFS_SOURCES
    assert by_hop[0]["id_checksum"] == sum(range(_BFS_SOURCES))
    assert set(by_hop) <= set(range(_BFS_MAX_HOPS + 1))
    assert sum(r["n_nodes"] for r in rows) <= 500
