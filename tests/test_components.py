"""Connected components: equality with a pure-Python union-find."""

import pytest
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.operators.components import (
    connected_components,
    dedup_keep_canonical,
)


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress to the true minimum root
    return {v: find(v) for v in parent}


CASES = [
    # chain: min label must travel the whole diameter
    [(1, 2), (2, 3), (3, 4), (4, 5)],
    # two separate components + a triangle
    [(10, 11), (11, 12), (10, 12), (20, 21)],
    # star
    [(7, 1), (7, 2), (7, 3)],
    # single edge, reversed order
    [(9, 4)],
]


@pytest.mark.parametrize("pairs", CASES)
def test_components_match_union_find(spark, pairs):
    edges = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {
        r["id"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert got == _union_find(pairs)


def test_deep_chain_truncates_lineage(spark):
    """A diameter-13 path needs 14 propagation rounds; the self-loop
    single-reference formulation adds ONE join per round (the naive
    two-reference form doubles the plan every round) and the periodic
    localCheckpoint truncates the rest — at most _CHECKPOINT_EVERY-1
    rounds of lineage can survive past the last checkpoint."""
    from kmeans_mapreduce_spark.operators.components import _CHECKPOINT_EVERY

    n = 13
    pairs = [(i, i + 1) for i in range(n)]
    edges = spark.createDataFrame(pairs, "id_a long, id_b long")
    result = connected_components(edges)
    got = {r["id"]: r["component"] for r in result.collect()}
    assert got == {i: 0 for i in range(n + 1)}
    plan = result._jdf.queryExecution().analyzed().toString()
    n_joins = plan.count("Join")
    assert n_joins < _CHECKPOINT_EVERY, (
        f"lineage not truncated: {n_joins} joins in plan"
    )


def test_keep_canonical_drops_non_minimums(spark):
    docs = spark.createDataFrame(
        [(i, f"doc{i}") for i in range(8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 5), (6, 7)], "id_a long, id_b long"
    )
    kept = sorted(
        r["doc_id"] for r in dedup_keep_canonical(docs, pairs).collect()
    )
    # clusters {1,2,5} -> keep 1; {6,7} -> keep 6; singletons pass through
    assert kept == [0, 1, 3, 4, 6]


def test_reliable_checkpoint_path(spark, tmp_path):
    """checkpoint_dir engages the reliable checkpoint (files appear
    under the dir) and the result is unchanged."""
    import glob

    from kmeans_mapreduce_spark.operators.components import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    ckpt = str(tmp_path / "ckpt")
    got = {
        (r["id"], r["component"])
        for r in connected_components(
            edges, max_iter=50, checkpoint_dir=ckpt
        ).collect()
    }
    assert got == {(i, 0) for i in range(13)}
    assert glob.glob(f"{ckpt}/**/rdd-*", recursive=True), "no reliable checkpoint written"
