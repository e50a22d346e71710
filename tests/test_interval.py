"""operators/interval.overlap_join: exactness vs brute force, single
emission per pair, and the equi-join (never nested-loop) plan shape."""

from __future__ import annotations

import itertools

from kmeans_mapreduce_spark.operators.interval import overlap_join


def _brute(rows_l, rows_r):
    out = set()
    for a, b in itertools.product(rows_l, rows_r):
        if a[2] <= b[3] and b[2] <= a[3]:
            out.add((a[0], b[0]))
    return out


def test_overlap_join_matches_brute_force(spark):
    # intervals engineered to span 1..4 buckets (width 10), touch at
    # endpoints, nest, and be disjoint
    lrows = [
        ("l1", "k", 0, 5),
        ("l2", "k", 8, 32),   # spans 4 buckets
        ("l3", "k", 40, 41),
        ("l4", "k", 55, 55),  # point interval
    ]
    rrows = [
        ("r1", "k", 5, 7),    # touches l1 at 5 (closed interval => overlap)
        ("r2", "k", 30, 45),  # overlaps l2 and l3
        ("r3", "k", 46, 54),  # disjoint from everything
        ("r4", "k", 9, 10),   # nested inside l2
    ]
    schema = "id string, grp string, s long, e long"
    left = spark.createDataFrame(lrows, schema)
    right = spark.createDataFrame(rrows, schema)
    got = overlap_join(
        left, right, start="s", end="e", bucket_seconds=10, keys=["grp"]
    ).collect()
    pairs = [(r["id_l"], r["id_r"]) for r in got]
    assert len(pairs) == len(set(pairs)), "pair emitted more than once"
    assert set(pairs) == _brute(lrows, rrows)


def test_overlap_join_respects_keys(spark):
    schema = "id string, grp string, s long, e long"
    left = spark.createDataFrame([("l1", "a", 0, 100)], schema)
    right = spark.createDataFrame(
        [("r1", "a", 50, 60), ("r2", "b", 50, 60)], schema
    )
    got = overlap_join(
        left, right, start="s", end="e", bucket_seconds=10, keys=["grp"]
    ).collect()
    assert [(r["id_l"], r["id_r"]) for r in got] == [("l1", "r1")]


def test_overlap_join_single_emission_across_many_shared_buckets(spark):
    # both intervals span 10+ shared buckets; still exactly one row out
    schema = "id string, s long, e long"
    left = spark.createDataFrame([("l1", 0, 1000)], schema)
    right = spark.createDataFrame([("r1", 5, 995)], schema)
    got = overlap_join(
        left, right, start="s", end="e", bucket_seconds=10
    ).collect()
    assert len(got) == 1


def test_overlap_join_random_property(spark):
    """Randomized cross-check vs brute force: interval endpoints drawn
    to produce heavy overlap, nesting, touching, and bucket-boundary
    cases (seeded — deterministic across runs)."""
    import random

    rng = random.Random(42)
    for trial in range(3):
        lrows = []
        rrows = []
        for i in range(40):
            s = rng.randint(0, 200)
            lrows.append((f"l{i}", "k", s, s + rng.randint(0, 60)))
            s = rng.randint(0, 200)
            rrows.append((f"r{i}", "k", s, s + rng.randint(0, 60)))
        schema = "id string, grp string, s long, e long"
        got = overlap_join(
            spark.createDataFrame(lrows, schema),
            spark.createDataFrame(rrows, schema),
            start="s",
            end="e",
            bucket_seconds=rng.choice([7, 10, 50]),
            keys=["grp"],
        ).collect()
        pairs = [(r["id_l"], r["id_r"]) for r in got]
        assert len(pairs) == len(set(pairs)), f"trial {trial}: duplicate pair"
        assert set(pairs) == _brute(lrows, rrows), f"trial {trial}"


def test_overlap_join_plan_is_equi_join(spark):
    schema = "id string, s long, e long"
    left = spark.createDataFrame([("l1", 0, 10)], schema)
    right = spark.createDataFrame([("r1", 5, 15)], schema)
    df = overlap_join(left, right, start="s", end="e", bucket_seconds=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
