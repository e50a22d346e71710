"""Operator-level invariants for snapshot diff, blocked fuzzy linkage,
and RAG chunking (plans/pipeline_queries5.py surfaces)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_snapshot_diff_statuses(spark):
    from kmeans_mapreduce_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "id bigint, s string, v double",
    )
    new = spark.createDataFrame(
        # 1 unchanged, 2 value-changed, 3 NULL->value (changed, null-safe),
        # 4 missing (removed), 5 fresh (added)
        [(1, "a", 10.0), (2, "b", 21.0), (3, "c", 3.0), (5, "e", 50.0)],
        "id bigint, s string, v double",
    )
    rows = {
        r["id"]: r["diff_status"]
        for r in snapshot_diff(old, new, keys=["id"]).collect()
    }
    assert rows == {
        1: "unchanged",
        2: "changed",
        3: "changed",
        4: "removed",
        5: "added",
    }


def test_snapshot_diff_single_shuffle_join(spark, sf_dir):
    """The diff is ONE full-outer join — no nested loop, no extra scan
    of either snapshot."""
    from kmeans_mapreduce_spark.plans.pipeline_queries5 import (
        snapshot_diff_orders,
    )

    plan = (
        snapshot_diff_orders(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "FullOuter" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_fuzzy_join_is_blocked_equi_join(spark, sf_dir):
    """Candidate generation must be an equi-join on the block key —
    the levenshtein verify runs on candidates only, never all-pairs."""
    from kmeans_mapreduce_spark.plans.pipeline_queries5 import (
        linkage_fuzzy_parts,
    )

    df = linkage_fuzzy_parts(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    rows = df.collect()
    # each unordered pair exactly once, ordered lexicographically
    assert all(r["name_a"] < r["name_b"] for r in rows)
    assert len({(r["name_a"], r["name_b"]) for r in rows}) == len(rows)
    # blocking is sound for this metric here: every returned pair really
    # is within the distance bound (verify step ran)
    assert all(r["dist"] <= 3 for r in rows)


def test_doc_chunks_cover_text_with_overlap(spark, sf_dir):
    from kmeans_mapreduce_spark.plans.pipeline_queries5 import (
        CHUNK_LEN,
        CHUNK_STRIDE,
        pipeline_doc_chunks,
    )
    from kmeans_mapreduce_spark.plans.pipeline_queries import _docs

    chunks = pipeline_doc_chunks(spark, sf_dir)
    # no empty chunks; none longer than CHUNK_LEN
    bad = chunks.where(
        (F.col("chunk_len") < 1) | (F.col("chunk_len") > CHUNK_LEN)
    ).count()
    assert bad == 0
    # per-doc: chunk count == ceil(n_chars / stride), and total covered
    # length reconstructs the document (stride coverage, no gaps)
    per_doc = chunks.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"), F.max("start").alias("last_start")
    )
    docs = _docs(spark, sf_dir).select("doc_id", "n_chars")
    joined = per_doc.join(docs, "doc_id").collect()
    for r in joined:
        expected = (r["n_chars"] + CHUNK_STRIDE - 1) // CHUNK_STRIDE
        assert r["n_chunks"] == expected, (r["doc_id"], r["n_chunks"], expected)
        # the last chunk starts before the text ends (non-empty tail)
        assert r["last_start"] < r["n_chars"]
    # overlap property: consecutive chunks of one doc share
    # CHUNK_LEN - CHUNK_STRIDE characters
    sample = (
        chunks.where(F.col("doc_id") == 0)
        .orderBy("chunk_idx")
        .collect()
    )
    for a, b in zip(sample, sample[1:]):
        if len(a["chunk"]) == CHUNK_LEN:
            assert a["chunk"][CHUNK_STRIDE:] == b["chunk"][: CHUNK_LEN - CHUNK_STRIDE]
