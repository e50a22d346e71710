"""As-of join semantics + IVF ANN quality tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.operators.asof import asof_join
from kmeans_mapreduce_spark.operators import similarity as SIM


@pytest.fixture(scope="module")
def tiny_asof(spark):
    left = spark.createDataFrame(
        [
            (1, 100, 10),   # matches r@10 (exact-time inclusive would be r@100 if present)
            (2, 100, 50),   # matches r@50
            (3, 100, 5),    # matches r@5
            (4, 100, 1),    # before any right row -> unmatched
            (5, 200, 10),   # key with no right rows at all -> unmatched
        ],
        "event_id long, k long, t long",
    ).selectExpr("event_id", "k", "t")
    right = spark.createDataFrame(
        [(100, 5, 1.0), (100, 10, 2.0), (100, 50, 3.0)],
        "k long, rt long, payload double",
    )
    return left, right


def test_asof_backward_inclusive(spark, tiny_asof):
    left, right = tiny_asof
    out = asof_join(
        left, right, key="k", left_time="t", right_time="rt",
        payload_cols=["payload"], how="inner",
    )
    got = {r["event_id"]: (r["matched_time"], r["payload"]) for r in out.collect()}
    # t=10 matches rt=10 exactly (inclusive), not rt=5
    assert got == {1: (10, 2.0), 2: (50, 3.0), 3: (5, 1.0)}


def test_asof_left_keeps_unmatched(spark, tiny_asof):
    left, right = tiny_asof
    out = asof_join(
        left, right, key="k", left_time="t", right_time="rt",
        payload_cols=["payload"], how="left",
    )
    rows = {r["event_id"]: r["matched_time"] for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4, 5}
    assert rows[4] is None and rows[5] is None


def test_asof_preserves_left_columns(tiny_asof):
    left, right = tiny_asof
    out = asof_join(
        left, right, key="k", left_time="t", right_time="rt",
        payload_cols=["payload"], how="inner",
    )
    assert set(out.columns) == {"event_id", "k", "t", "matched_time", "payload"}


def test_ivf_recall_vs_brute(spark, embs_mod):
    """IVF with kmeans centroids + 2 probes of 8 cells should recover a
    large fraction of the exact top-5 neighborhood."""
    from kmeans_mapreduce_spark.operators.kmeans import fit_kmeans_native

    pts = embs_mod.select(
        F.col("vec_id").alias("id"), F.col("embedding").cast("array<double>").alias("features")
    )
    res = fit_kmeans_native(pts, k=8, dim=64, initial_centroids=None, seed=7, max_iter=5)
    queries = embs_mod.where(F.col("vec_id") < 20)
    ivf = SIM.ivf_topk(
        embs_mod, queries, res.centroids, k=5, n_probe=2, id_col="vec_id", vec_col="embedding"
    )
    brute = SIM.brute_force_topk(
        embs_mod, queries, k=5, id_col="vec_id", vec_col="embedding"
    )
    got = {(r["query_id"], r["neighbor_id"]) for r in ivf.collect()}
    want = {(r["query_id"], r["neighbor_id"]) for r in brute.collect()}
    recall = len(got & want) / len(want)
    assert recall >= 0.5, f"IVF recall too low: {recall:.2f}"


@pytest.fixture(scope="module")
def embs_mod(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def test_ivf_index_prunes_and_matches(spark, embs_mod, tmp_path):
    """The written IVF index must (a) give the same answer as the
    in-memory ivf_topk and (b) prune unprobed cells at the scan."""
    import io
    from contextlib import redirect_stdout

    from kmeans_mapreduce_spark.operators.kmeans import fit_kmeans_native

    pts = embs_mod.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("features"),
    )
    res = fit_kmeans_native(pts, k=8, dim=64, initial_centroids=None, seed=7, max_iter=5)
    idx = str(tmp_path / "ivf_index")
    SIM.write_ivf_index(
        embs_mod, res.centroids, idx, id_col="vec_id", vec_col="embedding"
    )
    queries = embs_mod.where(F.col("vec_id") < 20)
    from_index = SIM.ivf_topk_from_index(
        spark, idx, queries, res.centroids, k=5, n_probe=2,
        id_col="vec_id", vec_col="embedding",
    )
    in_memory = SIM.ivf_topk(
        embs_mod, queries, res.centroids, k=5, n_probe=2,
        id_col="vec_id", vec_col="embedding",
    )
    assert sorted(map(tuple, from_index.collect())) == sorted(
        map(tuple, in_memory.collect())
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        from_index.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters", 1)[1][:200]


def test_pandas_udf_cosine_matches_expr(spark, embs_mod):
    """Arrow-batched pandas cosine must equal the codegen expr path to
    1e-9 (numpy pairwise summation may differ in the last ulp)."""
    from kmeans_mapreduce_spark.functions.udfs import brute_force_topk_pandas

    queries = embs_mod.where(F.col("vec_id") < 5)
    pd_out = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["score"])
        for r in brute_force_topk_pandas(
            embs_mod, queries, k=5, id_col="vec_id", vec_col="embedding"
        ).collect()
    }
    ex_out = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["score"])
        for r in SIM.brute_force_topk(
            embs_mod, queries, k=5, id_col="vec_id", vec_col="embedding"
        ).collect()
    }
    assert set(pd_out) == set(ex_out)
    for key, (nid, score) in ex_out.items():
        pnid, pscore = pd_out[key]
        assert pnid == nid and abs(pscore - score) <= 1e-6, (key, nid, pnid)


def test_asof_tolerance_semantics(spark):
    """Staleness bound: inner drops stale matches, left nullifies them;
    fresh matches are identical to the unbounded join."""
    from kmeans_mapreduce_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "u", 100), (2, "u", 250), (3, "v", 50)],
        "id long, k string, t long",
    ).withColumn("t", F.timestamp_seconds("t"))
    right = spark.createDataFrame(
        [("u", 90, "a"), ("u", 95, "b"), ("v", 49, "c")],
        "k string, rt long, tag string",
    ).withColumn("rt", F.timestamp_seconds("rt"))

    inner = asof_join(
        left, right, key="k", left_time="t", right_time="rt",
        payload_cols=["tag"], how="inner", tolerance="10 seconds",
    )
    got = {r["id"]: r["tag"] for r in inner.collect()}
    # id=1: latest rt=95, 5s stale -> 'b'; id=2: 155s stale -> dropped;
    # id=3: 1s stale -> 'c'
    assert got == {1: "b", 3: "c"}

    left_out = asof_join(
        left, right, key="k", left_time="t", right_time="rt",
        payload_cols=["tag"], how="left", tolerance="10 seconds",
    )
    rows = {r["id"]: (r["tag"], r["matched_time"]) for r in left_out.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[2] == (None, None), "stale match must nullify under left"
    assert rows[1][0] == "b" and rows[3][0] == "c"


def test_compact_ivf_index_collapses_files_probe_identical(
    spark, embs_mod, tmp_path
):
    """Compacting a streamed batch-major IVF tree (batch=<b>/cell=<i>/)
    into the cell-major batch layout must collapse the file count while
    leaving every probe result and per-cell checksum identical, with
    cell-partition pruning intact on the compacted artifact."""
    import io
    from contextlib import redirect_stdout

    from kmeans_mapreduce_spark.operators.kmeans import fit_kmeans_native

    pts = embs_mod.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("features"),
    )
    res = fit_kmeans_native(
        pts, k=8, dim=64, initial_centroids=None, seed=7, max_iter=5
    )
    stream_tree = str(tmp_path / "ivf_stream")
    for b in range(3):
        SIM.assign_ivf_cells(
            embs_mod.where(F.col("vec_id") % 3 == b),
            res.centroids,
            id_col="vec_id",
            vec_col="embedding",
        ).write.mode("overwrite").partitionBy("cell").parquet(
            f"{stream_tree}/batch={b}"
        )
    dest = str(tmp_path / "ivf_base")
    out = SIM.compact_ivf_index(spark, stream_tree, dest)
    assert out["rows"] == embs_mod.count()
    assert out["files_after"] < out["files_before"]
    # one task per cell, no rows_per_file cap -> one file per cell
    assert out["files_after"] == out["cells"]

    def chk(path):
        return sorted(
            tuple(r)
            for r in spark.read.parquet(path)
            .groupBy("cell")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("neighbor_id").alias("id_chk"),
                F.sum(F.hash("cv")).alias("cv_chk"),
            )
            .collect()
        )

    assert chk(dest) == chk(stream_tree)

    queries = embs_mod.where(F.col("vec_id") < 20)
    before = SIM.ivf_topk_from_index(
        spark, stream_tree, queries, res.centroids, k=5, n_probe=2,
        id_col="vec_id", vec_col="embedding",
    )
    after = SIM.ivf_topk_from_index(
        spark, dest, queries, res.centroids, k=5, n_probe=2,
        id_col="vec_id", vec_col="embedding",
    )
    assert sorted(map(tuple, before.collect())) == sorted(
        map(tuple, after.collect())
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        after.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters", 1)[1][:200]

    # re-compaction over an existing dest swaps cleanly (retry path)
    out2 = SIM.compact_ivf_index(spark, stream_tree, dest)
    assert out2["rows"] == out["rows"]
    assert chk(dest) == chk(stream_tree)

    # a hot-cell cap splits files without breaking pruning or checksums
    dest2 = str(tmp_path / "ivf_base_split")
    cap = max(1, out["rows"] // (out["cells"] * 2))
    out3 = SIM.compact_ivf_index(spark, stream_tree, dest2, rows_per_file=cap)
    assert out3["files_after"] > out3["cells"]
    assert chk(dest2) == chk(stream_tree)


def test_ivf_base_plus_delta_probe_handoff(spark, embs_mod, tmp_path):
    """The post-compaction continuation must be EXECUTABLE, not a
    docstring: compact mid-stream at watermark w, keep appending
    batches > w, and probing base ∪ delta must equal probing the full
    uncompacted tree — with the watermark read back from the marker the
    swap promoted, both scans pruned, and the crashed-swap window
    refused with the recovery instruction."""
    import io
    from contextlib import redirect_stdout

    from kmeans_mapreduce_spark.operators.kmeans import fit_kmeans_native
    from kmeans_mapreduce_spark.sources.maintenance import _fs_path

    pts = embs_mod.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("features"),
    )
    res = fit_kmeans_native(
        pts, k=8, dim=64, initial_centroids=None, seed=7, max_iter=5
    )

    def land(tree, b):
        SIM.assign_ivf_cells(
            embs_mod.where(F.col("vec_id") % 5 == b),
            res.centroids,
            id_col="vec_id",
            vec_col="embedding",
        ).write.mode("overwrite").partitionBy("cell").parquet(
            f"{tree}/batch={b}"
        )

    stream_tree = str(tmp_path / "ivf_stream")
    for b in range(3):
        land(stream_tree, b)
    dest = str(tmp_path / "ivf_base")
    out = SIM.compact_ivf_index(spark, stream_tree, dest)
    assert out["watermark_batch"] == 2

    # the stream keeps folding past the compaction point
    for b in (3, 4):
        land(stream_tree, b)

    queries = embs_mod.where(F.col("vec_id") < 20)
    full = sorted(
        map(
            tuple,
            SIM.ivf_topk_from_index(
                spark, stream_tree, queries, res.centroids, k=5, n_probe=2,
                id_col="vec_id", vec_col="embedding",
            ).collect(),
        )
    )
    bpd = SIM.ivf_topk_base_plus_delta(
        spark, dest, stream_tree, queries, res.centroids, k=5, n_probe=2,
        id_col="vec_id", vec_col="embedding",
    )
    assert sorted(map(tuple, bpd.collect())) == full
    # both sides prune at the scan: cell partitions on the base, the
    # batch watermark on the delta
    buf = io.StringIO()
    with redirect_stdout(buf):
        bpd.explain("formatted")
    plan = buf.getvalue()
    assert plan.count("PartitionFilters") >= 2
    assert "batch" in plan and "cell" in plan

    # explicit watermark override: an over-high watermark excludes the
    # delta rows, so the probe sees only the compacted base
    base_only = SIM.ivf_topk_base_plus_delta(
        spark, dest, stream_tree, queries, res.centroids, k=5, n_probe=2,
        id_col="vec_id", vec_col="embedding", watermark_batch=99,
    )
    base_probe = SIM.ivf_topk_from_index(
        spark, dest, queries, res.centroids, k=5, n_probe=2,
        id_col="vec_id", vec_col="embedding",
    )
    assert sorted(map(tuple, base_only.collect())) == sorted(
        map(tuple, base_probe.collect())
    )

    # re-compacting the longer tree advances the watermark; the delta
    # side is then empty and base-plus-delta still equals the full tree
    out2 = SIM.compact_ivf_index(spark, stream_tree, dest)
    assert out2["watermark_batch"] == 4
    bpd2 = SIM.ivf_topk_base_plus_delta(
        spark, dest, stream_tree, queries, res.centroids, k=5, n_probe=2,
        id_col="vec_id", vec_col="embedding",
    )
    assert sorted(map(tuple, bpd2.collect())) == full

    # a base with no marker (e.g. built by write_ivf_index) demands an
    # explicit watermark
    import pytest

    plain = str(tmp_path / "plain_base")
    SIM.write_ivf_index(
        embs_mod, res.centroids, plain, id_col="vec_id", vec_col="embedding"
    )
    with pytest.raises(ValueError, match="_compacted_watermark"):
        SIM.ivf_topk_base_plus_delta(
            spark, plain, stream_tree, queries, res.centroids,
            id_col="vec_id", vec_col="embedding",
        )

    # crashed-swap window: dest absent, __old parked -> refuse with the
    # recovery instruction, then verify compact's recovery preamble
    # actually restores and the probe works again
    fs, jdest = _fs_path(spark, dest)
    _, jold = _fs_path(spark, dest + "__old")
    assert fs.rename(jdest, jold)
    with pytest.raises(RuntimeError, match="recovery preamble"):
        SIM.ivf_topk_base_plus_delta(
            spark, dest, stream_tree, queries, res.centroids,
            id_col="vec_id", vec_col="embedding",
        )
    out3 = SIM.compact_ivf_index(spark, stream_tree, dest)
    assert out3["watermark_batch"] == 4
    bpd3 = SIM.ivf_topk_base_plus_delta(
        spark, dest, stream_tree, queries, res.centroids, k=5, n_probe=2,
        id_col="vec_id", vec_col="embedding",
    )
    assert sorted(map(tuple, bpd3.collect())) == full


def test_ivf_retire_and_merge_recompaction_cycle(spark, embs_mod, tmp_path):
    """The full streamed-IVF lifecycle: compact -> retire the absorbed
    batches -> keep folding -> probe base+delta -> RE-compact with
    merge_base (the tree alone no longer holds the history) -> retire
    again.  Equality is judged against a parallel never-retired tree
    at every step, so nothing silently vanishes or double-counts."""
    import pytest

    from kmeans_mapreduce_spark.operators.kmeans import fit_kmeans_native

    pts = embs_mod.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("features"),
    )
    res = fit_kmeans_native(
        pts, k=8, dim=64, initial_centroids=None, seed=7, max_iter=5
    )

    def land(tree, b):
        SIM.assign_ivf_cells(
            embs_mod.where(F.col("vec_id") % 6 == b),
            res.centroids,
            id_col="vec_id",
            vec_col="embedding",
        ).write.mode("overwrite").partitionBy("cell").parquet(
            f"{tree}/batch={b}"
        )

    tree = str(tmp_path / "ivf_stream")
    shadow = str(tmp_path / "ivf_shadow")  # never retired, ground truth
    dest = str(tmp_path / "ivf_base")
    for b in range(3):
        land(tree, b)
        land(shadow, b)
    out = SIM.compact_ivf_index(spark, tree, dest)
    assert out["watermark_batch"] == 2
    import shutil

    stale = str(tmp_path / "ivf_stale_base")
    shutil.copytree(dest, stale)  # a base frozen at watermark 2

    # retirement refusals: past the watermark, and no marker
    with pytest.raises(ValueError, match="only covers"):
        SIM.retire_compacted_batches(spark, tree, dest, up_to=5)
    plain = str(tmp_path / "plain_base")
    SIM.write_ivf_index(
        embs_mod, res.centroids, plain, id_col="vec_id", vec_col="embedding"
    )
    with pytest.raises(ValueError, match="_compacted_watermark"):
        SIM.retire_compacted_batches(spark, tree, plain)

    ret = SIM.retire_compacted_batches(spark, tree, dest)
    assert ret == {
        "watermark_batch": 2,
        "retired_batches": [0, 1, 2],
        "remaining_batches": [],
    }

    queries = embs_mod.where(F.col("vec_id") < 20)

    # a fully-retired tree (no post-watermark batches) must degrade to
    # a base-only probe, not crash on schema inference over zero files
    empty_delta = SIM.ivf_topk_base_plus_delta(
        spark, dest, tree, queries, res.centroids, k=5, n_probe=2,
        id_col="vec_id", vec_col="embedding",
    )
    base_probe = SIM.ivf_topk_from_index(
        spark, dest, queries, res.centroids, k=5, n_probe=2,
        id_col="vec_id", vec_col="embedding",
    )
    assert sorted(map(tuple, empty_delta.collect())) == sorted(
        map(tuple, base_probe.collect())
    )

    # the stream keeps folding past the retirement
    for b in (3, 4):
        land(tree, b)
        land(shadow, b)

    def probe_full(path):
        return sorted(
            map(
                tuple,
                SIM.ivf_topk_from_index(
                    spark, path, queries, res.centroids, k=5, n_probe=2,
                    id_col="vec_id", vec_col="embedding",
                ).collect(),
            )
        )

    want = probe_full(shadow)
    bpd = SIM.ivf_topk_base_plus_delta(
        spark, dest, tree, queries, res.centroids, k=5, n_probe=2,
        id_col="vec_id", vec_col="embedding",
    )
    assert sorted(map(tuple, bpd.collect())) == want

    # re-compaction MUST merge the base — the tree alone lost 0..2,
    # and the _retired_through marker makes the plain call REFUSE
    # instead of silently building a partial base and deleting the
    # only remaining copy of the retired rows in the swap
    with pytest.raises(ValueError, match="retired batches"):
        SIM.compact_ivf_index(spark, tree, str(tmp_path / "ivf_wrong"))
    out2 = SIM.compact_ivf_index(spark, tree, dest, merge_base=dest)
    assert out2["watermark_batch"] == 4
    assert out2["rows"] == spark.read.parquet(shadow).count()
    assert probe_full(dest) == want

    # a replay-recreated retired batch is ignored, never double-counted
    ret2 = SIM.retire_compacted_batches(spark, tree, dest)
    assert ret2["retired_batches"] == [3, 4]

    # merge re-compaction over a fully-retired tree with nothing new
    # is a clean base-only rewrite, not a schema-inference crash
    out_noop = SIM.compact_ivf_index(spark, tree, dest, merge_base=dest)
    assert out_noop["watermark_batch"] == 4
    assert out_noop["rows"] == spark.read.parquet(shadow).count()
    assert probe_full(dest) == want

    land(tree, 1)  # replayed micro-batch recreates its dir
    land(tree, 5)  # and the stream moves on
    land(shadow, 5)
    want3 = probe_full(shadow)
    bpd3 = SIM.ivf_topk_base_plus_delta(
        spark, dest, tree, queries, res.centroids, k=5, n_probe=2,
        id_col="vec_id", vec_col="embedding",
    )
    assert sorted(map(tuple, bpd3.collect())) == want3
    out3 = SIM.compact_ivf_index(spark, tree, dest, merge_base=dest)
    assert out3["watermark_batch"] == 5
    assert out3["rows"] == spark.read.parquet(shadow).count()
    assert probe_full(dest) == want3

    # merging a base older than the retirement horizon would lose the
    # rows in between permanently — refused
    with pytest.raises(ValueError, match="STALE"):
        SIM.compact_ivf_index(
            spark, tree, str(tmp_path / "z"), merge_base=stale
        )

    # the probe is strict about everything except the legitimately
    # empty tree: a cell-major dir (data, no batch level) and a
    # missing path both raise instead of serving quietly stale
    # base-only answers
    with pytest.raises(ValueError, match="not a batch-major"):
        SIM.ivf_topk_base_plus_delta(
            spark, dest, plain, queries, res.centroids,
            id_col="vec_id", vec_col="embedding",
        )
    with pytest.raises(FileNotFoundError):
        SIM.ivf_topk_base_plus_delta(
            spark, dest, str(tmp_path / "no_such_tree"), queries,
            res.centroids, id_col="vec_id", vec_col="embedding",
        )

    # merge_base demands a batch-major tree and a marked base
    with pytest.raises(ValueError, match="no batch level"):
        SIM.compact_ivf_index(
            spark, plain, str(tmp_path / "x"), merge_base=dest
        )
    with pytest.raises(ValueError, match="_compacted_watermark"):
        SIM.compact_ivf_index(
            spark, tree, str(tmp_path / "y"), merge_base=plain
        )


def test_ivf_retirement_misuse_guards(spark, embs_mod, tmp_path):
    """The two silent-data-loss holes the r15 review closed: (a) a base
    compacted from a DIFFERENT tree must not authorize retirement (its
    watermark proves nothing about this tree's rows — a swapped
    argument used to pass every guard and delete unabsorbed batches);
    (b) probing a base OLDER than the tree's retirement horizon must
    refuse (the rows between base watermark and retired_through are in
    neither side) exactly like compact_ivf_index refuses the same
    staleness for merge_base."""
    import os
    import shutil

    cents = [
        list(r["embedding"])
        for r in embs_mod.orderBy("vec_id").limit(4).collect()
    ]

    def land(tree: str, b: int) -> None:
        SIM.assign_ivf_cells(
            embs_mod.where(F.col("vec_id") % 3 == b % 3),
            cents,
            id_col="vec_id",
            vec_col="embedding",
        ).write.mode("overwrite").partitionBy("cell").parquet(
            f"{tree}/batch={b}"
        )

    t1, t2 = str(tmp_path / "t1"), str(tmp_path / "t2")
    b1, b2 = str(tmp_path / "b1"), str(tmp_path / "b2")
    for b in range(2):
        land(t1, b)
        land(t2, b)
    assert SIM.compact_ivf_index(spark, t1, b1)["watermark_batch"] == 1
    assert SIM.compact_ivf_index(spark, t2, b2)["watermark_batch"] == 1

    # (a) cross-tree: b1 absorbed t1's rows, not t2's — refuse before
    # touching anything (t2's batch dirs must survive untouched)
    with pytest.raises(ValueError, match="_compacted_source"):
        SIM.retire_compacted_batches(spark, t2, b1)
    assert os.path.isdir(f"{t2}/batch=0") and os.path.isdir(f"{t2}/batch=1")
    # the matching base still authorizes exactly as before
    ret = SIM.retire_compacted_batches(spark, t2, b2)
    assert ret["retired_batches"] == [0, 1]

    # (b) stale-base probe: freeze a copy of b1 at watermark 1, then
    # advance t1 and retire through 2 — the frozen copy's probe must
    # refuse, while the anchored base keeps probing fine
    stale = str(tmp_path / "b1_stale")
    shutil.copytree(b1, stale)
    land(t1, 2)
    assert (
        SIM.compact_ivf_index(spark, t1, b1, merge_base=b1)[
            "watermark_batch"
        ]
        == 2
    )
    SIM.retire_compacted_batches(spark, t1, b1)  # retired through 2
    q = embs_mod.where(F.col("vec_id") < 8)
    with pytest.raises(ValueError, match="retired batches <="):
        SIM.ivf_topk_base_plus_delta(
            spark, stale, t1, q, cents, id_col="vec_id", vec_col="embedding"
        )
    # anchored base: watermark == retired_through — allowed, and the
    # fully-retired tree degrades to a base-only probe
    got = SIM.ivf_topk_base_plus_delta(
        spark, b1, t1, q, cents, id_col="vec_id", vec_col="embedding"
    )
    want = SIM.ivf_topk_from_index(
        spark, b1, q, cents, id_col="vec_id", vec_col="embedding"
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )

    # (c) cross-tree merge_base (ADVICE r16): compacting t2 against
    # the OTHER tree's base would drop t2's batches <= b1's watermark
    # from the rewrite AND stamp a fresh source token naming t2 on the
    # laundered result — which the retirement guard would then trust.
    # Refuse before writing anything (t3 keeps its batches; no base
    # dir appears).
    t3, b3 = str(tmp_path / "t3"), str(tmp_path / "b3")
    for b in range(2):
        land(t3, b)
    with pytest.raises(ValueError, match="_compacted_source"):
        SIM.compact_ivf_index(spark, t3, b3, merge_base=b1)
    assert not os.path.exists(b3)
    assert os.path.isdir(f"{t3}/batch=0") and os.path.isdir(f"{t3}/batch=1")
    # the tree's OWN base merges exactly as before
    assert SIM.compact_ivf_index(spark, t3, b3)["watermark_batch"] == 1
    land(t3, 2)
    assert (
        SIM.compact_ivf_index(spark, t3, b3, merge_base=b3)[
            "watermark_batch"
        ]
        == 2
    )
