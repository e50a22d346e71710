"""Round-10 surface: P4 histogram binning, tri-mime dispatch, the
IVF-PQ cell-assignment strategy cutoff, and the trained-recall query's
shape contracts."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.operators import multimodal as MM


def _media_df(spark, rows):
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA)


def test_histogram_bins_p4_bits_as_gray_levels(spark):
    """A P4 bitmap's pixels land ONLY in buckets 0 (set = black) and 15
    (clear = white), padding bits excluded: 5x2 grid, rows 0b10101_000
    and 0b01010_111 — the padding tail (0b111) must NOT count as black."""
    payload = MM.encode_pbm(5, 2, bytes([0b10101000, 0b01010111]))
    out = {
        r["bucket"]: r["n_px"]
        for r in MM.ppm_pixel_histogram(
            _media_df(spark, [(1, payload, MM.PBM_MIME)]), n_buckets=16
        ).collect()
    }
    assert out == {0: 5, 15: 5}  # 3 + 2 set bits in-width, rest white


def test_histogram_mixes_bytes_and_bits(spark):
    """P5 bytes and P4 bits aggregate into one histogram: gray bytes
    [0, 16, 255] bin to buckets {0, 1, 15}; an all-set 8x1 bitmap adds
    8 black pixels to bucket 0."""
    pgm = MM.encode_pgm(3, 1, bytes([0, 16, 255]))
    pbm = MM.encode_pbm(8, 1, bytes([0xFF]))
    out = {
        r["bucket"]: r["n_px"]
        for r in MM.ppm_pixel_histogram(
            _media_df(
                spark, [(1, pgm, MM.PGM_MIME), (2, pbm, MM.PBM_MIME)]
            ),
            n_buckets=16,
        ).collect()
    }
    assert out == {0: 9, 1: 1, 15: 1}


def test_tri_attach_cycles_all_three_arms(spark, sf_dir):
    """attach_pnm_tri_payload dispatches media_id % 3 -> P6/P5/P4 and
    every payload survives its REAL decoder arm with the formula dims."""
    from kmeans_mapreduce_spark.plans.pipeline_queries import _docs

    media = MM.attach_pnm_tri_payload(
        _docs(spark, sf_dir).limit(9), "doc_id", "text"
    )
    dec = MM.decode_media(media).collect()
    assert len(dec) == 9
    want = {0: MM.PPM_MIME, 1: MM.PGM_MIME, 2: MM.PBM_MIME}
    for r in dec:
        assert r["mime"] == want[r["media_id"] % 3]
        assert 4 <= r["width"] <= 16 and 4 <= r["height"] <= 14
        # feature slot 5 is n_pixels for every arm
        assert r["feature"][5] == r["width"] * r["height"]


def test_ivf_pq_cell_strategy_cutoff_is_result_invariant(spark):
    """The >8-cell broadcast-relation assignment returns the IDENTICAL
    result as the <=8-cell literal path: 8 centroids vs the same 8 plus
    one unreachable outlier — assignments, probes, codes and ranks must
    all agree, so any first-min/tie-break divergence between the two
    strategies surfaces as a row diff."""
    from kmeans_mapreduce_spark.operators import similarity as SIM

    rng = np.random.RandomState(7)
    vecs = [(i, [float(x) for x in rng.randint(0, 50, 16)]) for i in range(40)]
    e = spark.createDataFrame(vecs, "id long, v array<double>")
    cents8 = [list(v) for _, v in vecs[:8]]
    cents9 = cents8 + [[1e9] * 16]  # unreachable: no vector assigns here
    books = [
        [[float(x) for x in rng.randint(0, 50, 8)] for _ in range(4)]
        for _ in range(2)
    ]
    qs = vecs[:3]
    lit = SIM.ivf_pq_topk(e, cents8, books, qs, k=4, n_probe=2)
    rel = SIM.ivf_pq_topk(e, cents9, books, qs, k=4, n_probe=2)
    assert sorted(map(tuple, lit.collect())) == sorted(
        map(tuple, rel.collect())
    )


@pytest.mark.slow
def test_recall_query_contract(spark, sf_dir):
    """ann_ivf_pq_recall: one row per evaluation query, recall in
    [0, 1] with hits consistent, and dist_ratio >= 1 (the retrieved
    set's true cost can never beat the brute optimum)."""
    from kmeans_mapreduce_spark.plans.pipeline_queries14 import (
        _RQ_NQUERY,
        ann_ivf_pq_recall,
    )

    rows = ann_ivf_pq_recall(spark, sf_dir).collect()
    assert len(rows) == _RQ_NQUERY
    for r in rows:
        assert 0 <= r["hits"] <= 10
        assert r["recall"] == pytest.approx(r["hits"] / 10.0)
        assert r["dist_ratio"] is None or r["dist_ratio"] >= 1.0


def test_knn_graph_cells_asserts_on_centroid_shortfall(spark, sf_dir):
    """A sparse/non-dense id space must fail loudly, not silently build
    a coarser graph: with k_cells above the max id count the predicate
    recipe comes up short and the guard trips."""
    from kmeans_mapreduce_spark.plans import pipeline_queries3 as PQ3

    with pytest.raises(AssertionError, match="centroid shortfall"):
        PQ3.knn_graph_cells(spark, sf_dir, k_cells=10**9)


def test_rerank_dominates_adc_per_query(spark, sf_dir):
    """Exact re-ranking can only surface MORE true neighbors: the
    true-top members of the shortlist are exactly its smallest true
    distances, so hits_rerank >= hits_adc must hold for EVERY query,
    not just on average."""
    from kmeans_mapreduce_spark.plans.pipeline_queries14 import (
        ann_ivf_pq_rerank_recall,
    )

    rows = ann_ivf_pq_rerank_recall(spark, sf_dir).collect()
    assert rows
    assert all(r["hits_rerank"] >= r["hits_adc"] for r in rows)
    # and the refine stage actually earns its cost on this corpus
    assert sum(r["hits_rerank"] for r in rows) > sum(
        r["hits_adc"] for r in rows
    )


def test_ivf_pq_rerank_operator_matches_query_path(spark):
    """The public ivf_pq_topk_rerank operator and the query's inline
    composition implement the same semantics: on a small corpus the
    operator's top-k equals a brute re-rank of its own shortlist."""
    import numpy as np

    from kmeans_mapreduce_spark.operators import similarity as SIM

    rng = np.random.RandomState(11)
    vecs = [(i, [float(x) for x in rng.randint(0, 40, 16)]) for i in range(30)]
    e = spark.createDataFrame(vecs, "id long, v array<double>")
    cents = [list(v) for _, v in vecs[:4]]
    books = [
        [[float(x) for x in rng.randint(0, 40, 8)] for _ in range(4)]
        for _ in range(2)
    ]
    qs = vecs[:2]
    out = SIM.ivf_pq_topk_rerank(
        e, cents, books, qs, k=3, n_probe=2, shortlist=8
    ).collect()
    shortlist = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.ivf_pq_topk(
            e, cents, books, qs, k=8, n_probe=2
        ).collect()
    }
    by_id = dict(vecs)
    for r in out:
        assert (r["query_id"], r["neighbor_id"]) in shortlist
        qv, nv = by_id[r["query_id"]], by_id[r["neighbor_id"]]
        want = sum((a - b) * (a - b) for a, b in zip(qv, nv))
        assert r["exact_d2"] == want
    for qid in {r["query_id"] for r in out}:
        ranks = sorted(r["rank"] for r in out if r["query_id"] == qid)
        assert ranks == [1, 2, 3]
