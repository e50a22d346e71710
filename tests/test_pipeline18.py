"""Round-12 batch 36: the boosted stump trainer.

The catalog queries are hash-checked against DuckDB by the driver and
compare.py; these tests pin the BOOSTING SEMANTICS on hand-built
fixtures — weighted error counts, the weights-of-1 reduction to the
round-11 search, the round-by-round weight doubling — plus the
textbook OR-rule decomposition on a planted frame and the
beats-the-single-stump contract on real data."""

from __future__ import annotations

from pyspark.sql import functions as F

from kmeans_mapreduce_spark.plans.pipeline_queries17 import _stump_search
from kmeans_mapreduce_spark.plans.pipeline_queries18 import (
    _boost_rounds,
    _weighted_stump_search,
)


def _fx(spark, rows):
    """rows: (doc_id, y, j, v) — a tiny dense frame."""
    return spark.createDataFrame(rows, "doc_id long, y int, j int, v long")


def test_weighted_search_with_unit_weights_is_the_plain_search(spark):
    """w=1 everywhere must reproduce pipeline_queries17._stump_search
    exactly — same candidates, same errors, same ranking."""
    rows = [
        (1, -1, 0, 1),
        (2, -1, 0, 2),
        (3, 1, 0, 3),
        (1, 1, 1, 9),
        (2, -1, 1, 4),
        (3, -1, 1, 5),
    ]
    fx = _fx(spark, rows)
    plain = {
        (r["j"], r["theta"]): (r["n_err"], r["ge_is_pos"], r["rank"])
        for r in _stump_search(fx).collect()
    }
    weighted = {
        (r["j"], r["theta"]): (r["w_err"], r["ge_is_pos"], r["rank"])
        for r in _weighted_stump_search(fx.withColumn("w", F.lit(1))).collect()
    }
    assert plain == weighted


def test_weighted_errors_counted_by_hand(spark):
    """One feature, values 1/2/3 labeled -,-,+ with doc 2 carrying
    weight 3.  theta=3/ge still splits perfectly (0 weighted errors);
    at theta=2 the weight FLIPS the orientation choice: unweighted,
    ge errs only on doc 2 (1 < lt's 2), but with w(doc2)=3 the ge
    error count triples to 3 and the search picks lt at 2 instead."""
    rows = [(1, -1, 0, 1, 1), (2, -1, 0, 2, 3), (3, 1, 0, 3, 1)]
    schema = "doc_id long, y int, j int, v long, w int"
    got = {
        (r["theta"], r["ge_is_pos"]): r["w_err"]
        for r in _weighted_stump_search(
            spark.createDataFrame(rows, schema)
        ).collect()
    }
    assert got[(3, True)] == 0
    assert got[(2, False)] == 2  # lt: doc1 (w1) + doc3 (w1) wrong
    assert got[(1, False)] == 1  # all-minus stump: only doc 3 (+) wrong
    unit = [(d, y, j, v, 1) for d, y, j, v, _ in rows]
    got1 = {
        (r["theta"], r["ge_is_pos"]): r["w_err"]
        for r in _weighted_stump_search(
            spark.createDataFrame(unit, schema)
        ).collect()
    }
    assert got1[(2, True)] == 1  # unweighted: ge wins at theta=2


def test_boost_decomposes_planted_or_rule(spark):
    """The textbook boosting story on a planted two-feature OR label
    (y=+1 iff f0>=5 OR f1>=5) with region sizes A=3 (f0 only), B=3
    (f1 only), C=4 (neither), D=2 (both): round 1 learns the f0
    clause (tie with f1 broken by feature id), round 2 the f1 clause
    (round-1's mistakes doubled), round 3 the always-positive
    tiebreaker (cheapest fix for the two doubled disagreement
    regions), and the majority vote reaches ZERO training errors
    where every single stump leaves >= 3."""
    rows = []
    doc = 0

    def add(n, f0, f1, y):
        nonlocal doc
        for _ in range(n):
            rows.append((doc, y, 0, f0))
            rows.append((doc, y, 1, f1))
            doc += 1

    add(3, 6, 2, 1)   # A: f0 clause only
    add(3, 2, 6, 1)   # B: f1 clause only
    add(4, 2, 2, -1)  # C: neither
    add(2, 6, 6, 1)   # D: both
    fx = _fx(spark, rows)
    rounds = _boost_rounds(fx, n_rounds=3)
    assert (rounds[0]["j"], rounds[0]["theta"], rounds[0]["ge_is_pos"]) == (
        0,
        6,
        True,
    )
    assert rounds[0]["w_err"] == 3  # misses all of B
    assert (rounds[1]["j"], rounds[1]["theta"], rounds[1]["ge_is_pos"]) == (
        1,
        6,
        True,
    )
    assert rounds[1]["w_err"] == 3  # misses all of A (weight still 1)
    # round 3: the constant + stump (theta at the feature minimum) —
    # errs only on C (weight 1 each) = 4 < either clause's doubled 6
    assert rounds[2]["theta"] == 2 and rounds[2]["ge_is_pos"]
    assert rounds[2]["w_err"] == 4
    # majority vote: A (+,-,+), B (-,+,+), C (-,-,+), D (+,+,+) — all
    # correct; every single stump leaves >= 3 errors
    votes = {}
    for r in rounds:
        for row in fx.where(F.col("j") == r["j"]).collect():
            hit = (
                row["v"] >= r["theta"]
                if r["ge_is_pos"]
                else row["v"] < r["theta"]
            )
            votes.setdefault(row["doc_id"], [row["y"], 0])
            votes[row["doc_id"]][1] += 1 if hit else -1
    assert all((s > 0) == (y == 1) for y, s in votes.values())


def test_boost_holdout_beats_single_stump_on_real_docs(spark, sf_dir):
    """The catalog holdout row's own contract at test scale: the
    3-vote ensemble's held-out errors are strictly below the best
    single stump's (measured sf0.001: 28 vs 51 of 250)."""
    from kmeans_mapreduce_spark.plans.pipeline_queries18 import (
        quality_boost_holdout,
    )

    row = quality_boost_holdout(spark, sf_dir).collect()[0]
    assert row["n_test"] > 0
    assert row["ens_n_err"] < row["stump_n_err"]
    assert row["ens_acc_ppm"] > row["stump_acc_ppm"]


def test_weighted_search_matches_brute_enumeration(spark):
    """Property pin: on small random dense frames, every candidate row
    the distributed weighted search emits — weighted error, orientation
    choice, AND the (w_err, j, theta) rank order — equals a pure-Python
    brute enumeration of all (feature, theta, orientation) pairs.
    Deterministic seed batch (a hypothesis-style sweep without per-
    example Spark-job cost: 6 generated frames in one session)."""
    import random

    rng = random.Random(20260816)
    for case in range(6):
        n_docs = rng.randint(2, 7)
        n_feat = rng.randint(1, 3)
        rows = []
        for d in range(n_docs):
            y = rng.choice([1, -1])
            w = rng.randint(1, 3)
            for j in range(n_feat):
                rows.append((d, y, j, rng.randint(0, 4), w))
        # brute: for each (j, theta) candidate, weighted errors of both
        # orientations; chosen = min, ge wins ties
        docs = {}
        for d, y, j, v, w in rows:
            docs.setdefault(d, {"y": y, "w": w, "v": {}})["v"][j] = v
        expect = []
        for j in range(n_feat):
            for theta in sorted({r[3] for r in rows if r[2] == j}):
                err_ge = sum(
                    i["w"]
                    for i in docs.values()
                    if (1 if i["v"][j] >= theta else -1) != i["y"]
                )
                err_lt = sum(
                    i["w"]
                    for i in docs.values()
                    if (1 if i["v"][j] < theta else -1) != i["y"]
                )
                expect.append(
                    (min(err_ge, err_lt), j, theta, err_ge <= err_lt)
                )
        expect.sort()
        fx = spark.createDataFrame(
            rows, "doc_id long, y int, j int, v long, w int"
        )
        got = [
            (r["w_err"], r["j"], r["theta"], r["ge_is_pos"])
            for r in _weighted_stump_search(fx).orderBy("rank").collect()
        ]
        assert got == expect, f"case {case}: {got} != {expect}"
