"""Streaming apply of the trained boosted filter: the serving face.

Train a 3-round ensemble offline (the exact `_boost_rounds` output —
explicit n_rounds: serving is rounds-agnostic, so the test pins the
cheapest odd depth rather than tracking the trainer's shipped
`_BQ_ROUNDS`), then drain a document stream through
`stream_boost_filter` — kept set must equal the batch apply
doc-for-doc, and an appended second file must fold ONLY its delta
through the same checkpoint (exactly-once)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from kmeans_mapreduce_spark.plans.pipeline_queries18 import (
    _boost_features,
    _boost_rounds,
)
from kmeans_mapreduce_spark.streaming.boost_stream import (
    apply_boost_filter,
    stream_boost_filter,
)

DOCS_SCHEMA = "doc_id long, text string"


def _doc_rows(n0: int, n1: int):
    # texts spanning the label's two clauses: stopword-free short docs,
    # stopword-heavy docs, and long docs (token count >= 60)
    rows = []
    for i in range(n0, n1):
        if i % 3 == 0:
            text = " ".join(f"tok{i}w{k}" for k in range(i % 9 + 2))
        elif i % 3 == 1:
            text = ("the and of to a " * (i % 7 + 1)).strip()
        else:
            text = " ".join(f"the x{i} is y{k}" for k in range(20 + i % 30))
        rows.append((i, text))
    return rows


@pytest.mark.slow
def test_stream_filter_equals_batch_and_folds_delta(spark, sf_dir, tmp_path):
    src = str(tmp_path / "docs")
    kept = str(tmp_path / "kept")
    ckpt = str(tmp_path / "ckpt")
    # train the real ensemble on the real corpus — serving uses the
    # exact triples training produced
    fx = _boost_features(spark, sf_dir).localCheckpoint(eager=True)
    rounds = _boost_rounds(fx, n_rounds=3)
    assert len(rounds) == 3

    spark.createDataFrame(_doc_rows(0, 60), DOCS_SCHEMA).write.parquet(src)
    batch = spark.read.schema(DOCS_SCHEMA).parquet(src)
    want = {
        r["doc_id"] for r in apply_boost_filter(batch, rounds).collect()
    }
    # sanity: the fixture must exercise BOTH branches of the filter
    assert 0 < len(want) < 60

    stream_boost_filter(
        spark, src, kept, ckpt, rounds, max_files_per_trigger=1
    )
    got = {r["doc_id"] for r in spark.read.parquet(kept).collect()}
    assert got == want

    # delta: append a second file, rerun with the SAME checkpoint —
    # only the new docs fold in, nothing re-processed or duplicated
    spark.createDataFrame(_doc_rows(100, 140), DOCS_SCHEMA).write.mode(
        "append"
    ).parquet(src)
    stream_boost_filter(
        spark, src, kept, ckpt, rounds, max_files_per_trigger=1
    )
    batch2 = spark.read.schema(DOCS_SCHEMA).parquet(src)
    want2 = {
        r["doc_id"] for r in apply_boost_filter(batch2, rounds).collect()
    }
    rows2 = [r["doc_id"] for r in spark.read.parquet(kept).collect()]
    assert set(rows2) == want2
    assert len(rows2) == len(set(rows2))  # exactly-once: no duplicates
    assert want2 > want  # the delta actually added keepers


def test_blank_docs_drop_and_columns_survive(spark, sf_dir):
    fx = _boost_features(spark, sf_dir).localCheckpoint(eager=True)
    rounds = _boost_rounds(fx, n_rounds=3)
    df = spark.createDataFrame(
        [(1, "the and of to the and of to", 7.5), (2, "   ", 8.5)],
        "doc_id long, text string, extra double",
    )
    out = apply_boost_filter(df, rounds)
    assert out.columns == ["doc_id", "text", "extra"]
    rows = out.collect()
    # the all-stopword doc is KEPT (not vacuously empty) with its
    # extra column intact; the blank doc dropped
    assert [(r["doc_id"], r["extra"]) for r in rows] == [(1, 7.5)]


def test_feature_derivation_refuses_column_collisions(spark, sf_dir):
    """with_doc_features derives x/y and temp columns; an input frame
    already carrying one of those names must be refused, not silently
    overwritten (found by the round-12 third review)."""
    import pytest

    from kmeans_mapreduce_spark.plans.pipeline_queries17 import (
        with_doc_features,
    )

    df = spark.createDataFrame(
        [(1, "some text", 3.0)], "doc_id long, text string, y double"
    )
    with pytest.raises(ValueError, match="rename them first"):
        with_doc_features(df)


def test_ensemble_vote_requires_odd_nonempty_rounds(spark):
    import pytest

    from kmeans_mapreduce_spark.streaming.boost_stream import (
        ensemble_vote_expr,
    )

    for bad in ([], [{"j": 0, "theta": 1, "ge_is_pos": True}] * 2):
        with pytest.raises(ValueError, match="ODD"):
            ensemble_vote_expr(bad)
