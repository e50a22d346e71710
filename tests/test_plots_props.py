"""Plot sink output checks + hypothesis property tests for text exprs."""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F


# --- plot sinks (reference plotter.go parity) -----------------------------

@pytest.fixture(scope="module")
def assigned_small(spark, points):
    from kmeans_mapreduce_spark.operators.kmeans import assign_clusters, farthest_point_init

    cents = farthest_point_init(points, k=3, seed=42)
    return assign_clusters(points, cents).cache(), cents


def test_scatter_svg_bounded_and_deterministic(spark, assigned_small, tmp_path):
    from kmeans_mapreduce_spark.sources.plots import write_cluster_plots

    assigned, cents = assigned_small
    write_cluster_plots(assigned, cents, dim=64, out_dir=str(tmp_path))
    svg = (tmp_path / "scatter.svg").read_text()
    assert svg.startswith("<svg")
    # every point is a circle; centroids add k ringed circles
    n_circles = svg.count("<circle")
    assert n_circles == assigned.count() + 3 or n_circles == 2000 + 3
    # deterministic rerun
    write_cluster_plots(assigned, cents, dim=64, out_dir=str(tmp_path / "b"))
    assert (tmp_path / "b" / "scatter.svg").read_text() == svg


def test_bar_chart_svg_sizes(spark, assigned_small, tmp_path):
    from kmeans_mapreduce_spark.sources.plots import bar_chart_svg

    assigned, _ = assigned_small
    sizes = assigned.groupBy("cluster_id").agg(F.count("*").alias("size"))
    svg = bar_chart_svg(sizes)
    assert svg.count("<rect") == 1 + 3  # background + one bar per cluster
    # bar labels carry the true sizes
    labels = set(map(int, re.findall(r">(\d+)</text>", svg)))
    true = {r["size"] for r in sizes.collect()} | {r["cluster_id"] for r in sizes.collect()}
    assert labels <= true


# --- hypothesis property tests (expr vs python reference) -----------------

WS = r"[ \t\n\f\r]"  # the engine's portable whitespace class


def _py_tokens(text: str) -> list[str]:
    t = re.sub(f"^{WS}+|{WS}+$", "", text.lower())
    return re.split(f"{WS}+", t) if t else []


def _py_shingles(text: str, n: int = 2) -> list[str]:
    toks = _py_tokens(text)
    if len(toks) < n:
        return []
    seen, out = set(), []
    for i in range(len(toks) - n + 1):
        s = " ".join(toks[i : i + n])
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


texts = st.text(
    alphabet=st.characters(
        codec="utf-8",
        exclude_characters="\x00",
        exclude_categories=("Cs",),
    ),
    max_size=80,
)


@settings(max_examples=30, deadline=None)
@pytest.mark.slow
@given(st.lists(texts, min_size=1, max_size=8))
def test_tokens_and_shingles_match_python(spark_global, samples):
    """Spark token/shingle exprs == the plain-Python definition for
    arbitrary unicode (the SQL-oracle contract depends on this)."""
    from kmeans_mapreduce_spark.functions.text import tokens, token_count, word_shingles

    df = spark_global.createDataFrame([(s,) for s in samples], "text string")
    rows = df.select(
        "text",
        tokens("text").alias("toks"),
        token_count("text").alias("n"),
        word_shingles("text", 2).alias("sh"),
    ).collect()
    for r in rows:
        want_toks = _py_tokens(r["text"])
        assert list(r["toks"]) == want_toks, repr(r["text"])
        assert r["n"] == len(want_toks)
        assert list(r["sh"]) == _py_shingles(r["text"]), repr(r["text"])


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=4, max_size=4),
        min_size=2,
        max_size=6,
    )
)
def test_euclidean_matches_python(spark_global, vecs):
    import math

    from kmeans_mapreduce_spark.functions.distance import euclidean

    df = spark_global.createDataFrame(
        [(vecs[0], v) for v in vecs[1:]], "a array<double>, b array<double>"
    )
    rows = df.select(euclidean("a", "b").alias("d"), "a", "b").collect()
    for r in rows:
        want = math.sqrt(sum((x - y) ** 2 for x, y in zip(r["a"], r["b"])))
        assert r["d"] == pytest.approx(want, rel=1e-12, abs=1e-12)


@settings(max_examples=25, deadline=None)
@given(st.lists(texts, min_size=1, max_size=8))
def test_lang_id_domain_and_fingerprint_stability(spark_global, samples):
    """lang_id stays in its closed codomain for arbitrary unicode, and
    fingerprint is a pure function (same text -> same 128-bit hex)."""
    from kmeans_mapreduce_spark.functions.text import fingerprint, lang_id

    df = spark_global.createDataFrame([(s,) for s in samples], "text string")
    out = df.select(
        "text", lang_id("text").alias("lg"), fingerprint("text").alias("fp")
    ).collect()
    allowed = {"en", "es", "de", "fr", "und"}
    by_text = {}
    for r in out:
        assert r["lg"] in allowed, repr(r["text"])
        assert re.fullmatch(r"[0-9a-f]{32}", r["fp"]), r["fp"]
        if r["text"] in by_text:
            assert by_text[r["text"]] == r["fp"]
        by_text[r["text"]] = r["fp"]


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.floats(-1e3, 1e3, allow_nan=False)),
        min_size=1,
        max_size=40,
    )
)
def test_salted_agg_equals_plain_groupby(spark_global, rows):
    """salted_agg is bit-equal to the plain groupBy for any input —
    the invariant the skew mitigation must never trade away."""
    from kmeans_mapreduce_spark.operators.skew import salted_agg

    df = spark_global.createDataFrame(rows, "k int, v double")
    got = {
        r["k"]: (r["n"], r["s"], r["mx"])
        for r in salted_agg(
            df, "k", {"n": ("count", None), "s": ("sum", "v"), "mx": ("max", "v")},
            salt_buckets=4,
        ).collect()
    }
    want = {
        r["k"]: (r["n"], r["s"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx"))
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], rel=1e-12, abs=1e-9)
        assert got[k][2] == want[k][2]


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark
