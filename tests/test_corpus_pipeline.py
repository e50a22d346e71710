"""The composed end-to-end streaming corpus pipeline: triage ->
frozen-ensemble quality filter -> incremental exact+near dedup ->
content-addressed shard export, as ONE foreachBatch topology.

The ground-truth face is `replay_corpus_pipeline` — the SAME
`fold_corpus_batch` code object driven by a plain driver loop over the
lexicographic file groups the FileStreamSource forms — so the
stream-vs-replay equality below tests Spark's streaming delivery
(listing order, checkpointing, redelivery), not a second
implementation of the semantics.

Fixture agreements were measured (fixed xxhash64 families, so they are
deterministic): BASE~NEAR 0.812, BASE~NEAR2 0.875, OTHER~OTHER_NEAR
0.844, TEA~TEA_NEAR 0.875 — all >= the 0.8 threshold; all cross-family
pairs 0.0.  Every quality doc votes +1 under FROZEN_QUALITY_ENSEMBLE;
REJECT votes -5."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from kmeans_mapreduce_spark.streaming.corpus_pipeline import (
    _BAND_KEY_COL,
    FROZEN_QUALITY_ENSEMBLE,
    _observed,
    fold_corpus_batch,
    replay_corpus_pipeline,
    stream_batch_file_groups,
    stream_corpus_pipeline,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while twelve zebras "
    "quietly graze beside the winding river under a pale autumn sky today"
)
NEAR = BASE.replace("autumn", "winter")     # near-dup of BASE (0.812)
NEAR2 = BASE.replace("pale", "dark")        # near-dup of BASE (0.875)
OTHER = (
    "completely different subject matter entirely about compilers and "
    "the registers allocation spilling tricks with all the joys of static "
    "single assignment in a modern optimizing backend pipeline today"
)
OTHER_NEAR = OTHER.replace("joys", "perks")  # near-dup of OTHER (0.844)
TEA = (
    "a short unrelated note on the tea brewing temperatures and timing "
    "where the water should rest a little while before it ever touches "
    "the delicate green leaves"
)
TEA_NEAR = TEA.replace("delicate", "fragrant")  # near-dup of TEA (0.875)
COFFEE = (
    "the coffee grinder hums in the early morning while a patient "
    "hand measures beans and water for the slow ritual of a careful "
    "pour over brew at dawn"
)
REJECT = "alpha beta gamma delta epsilon zeta eta theta"

SCHEMA = "doc_id long, text string, source string"

# file -> rows; files are staged with lexicographic names so the
# FileStreamSource's listing order IS this order
FILES = [
    # batch 0: quality reject, blank -> quarantine, in-batch exact dup
    [(1, BASE, "s0"), (2, REJECT, "s0"), (3, BASE, "s0"), (4, "   ", "s0")],
    # batch 1: cross-batch exact dup (11), cross-batch near-dup (12),
    # fresh accept (13)
    [(11, BASE, "s1"), (12, NEAR, "s1"), (13, OTHER, "s1")],
    # batch 2: another cross-batch near of BASE (21), near of OTHER
    # (22), fresh accept (23) with its IN-BATCH near-dup (24)
    [
        (21, NEAR2, "s2"),
        (22, OTHER_NEAR, "s2"),
        (23, TEA, "s2"),
        (24, TEA_NEAR, "s2"),
    ],
    # batch 3: cross-batch exact dup of 23, fresh accept (32)
    [(31, TEA, "s3"), (32, COFFEE, "s3")],
]

EXPECT_ACCEPTED = {1, 13, 23, 32}
EXPECT_QUARANTINED = {4}


def _stage_files(spark, tmp_path, files=FILES, sub="flat"):
    import glob
    import os

    flat = tmp_path / sub
    flat.mkdir(exist_ok=True)
    for i, rows in enumerate(files):
        d = tmp_path / f"_stage_{sub}_{i}"
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(str(d))
        f = glob.glob(str(d / "part-*.parquet"))[0]
        os.link(f, flat / f"{i:03d}.parquet")
    return flat


def _state(spark, out, with_ivf=False):
    """Comparable terminal state of a pipeline output tree."""
    ivf = []
    if with_ivf:
        ivf = sorted(
            (r["batch"], r["cell"], r["neighbor_id"])
            for r in spark.read.parquet(f"{out}/ivf").collect()
        )
    acc = spark.read.parquet(f"{out}/accepted")
    accepted = sorted(
        (r["batch"], r["doc_id"], r["text"], r["source"])
        for r in acc.collect()
    )
    q = spark.read.parquet(f"{out}/quarantine")
    quarantined = sorted(
        (r["batch"], r["doc_id"], r["reason"]) for r in q.collect()
    )
    idx = spark.read.parquet(f"{out}/index")
    index = sorted((r["batch"], r["id"], r["fp"]) for r in idx.collect())
    bnd = spark.read.parquet(f"{out}/index_bands")
    index_bands = sorted(
        (r["batch"], r["id"], r["band"], r[_BAND_KEY_COL])
        for r in bnd.collect()
    )
    met = spark.read.parquet(f"{out}/metrics")
    metrics = sorted(tuple(r) for r in met.collect())
    sh = spark.read.json(f"{out}/shards")
    shards = sorted(
        (r["batch"], r["shard"], r["doc_id"]) for r in sh.collect()
    )
    return {
        "accepted": accepted,
        "quarantined": quarantined,
        "index": index,
        "index_bands": index_bands,
        "metrics": metrics,
        "shards": shards,
        "ivf": ivf,
    }


@pytest.mark.slow
def test_stream_equals_driver_loop_replay_end_to_end(spark, tmp_path):
    flat = _stage_files(spark, tmp_path)
    out_s = str(tmp_path / "out_stream")
    out_r = str(tmp_path / "out_replay")

    # the optional IVF stage: embeddings cover a SUBSET of the corpus
    # (no vector for 32 — partial coverage is the realistic shape);
    # two centroids so cell assignment exercises a real argmin
    embs = spark.createDataFrame(
        [
            (1, [0.0, 0.0]),
            (13, [10.0, 10.0]),
            (23, [1.0, 0.0]),
            (24, [9.0, 9.0]),  # dedup-dropped doc: must NOT be indexed
            (41, [2.0, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    centroids = [[0.0, 0.0], [10.0, 10.0]]

    ckpt = str(tmp_path / "ckpt")
    stream_corpus_pipeline(
        spark, str(flat), out_s, checkpoint=ckpt, max_files_per_trigger=1,
        ivf_vectors=embs, ivf_centroids=centroids,
    )
    # replay the stream's own recorded batches (the source log is the
    # ground truth for grouping — files list in modified order)
    groups = stream_batch_file_groups(ckpt)
    assert [
        [g.rsplit("/", 1)[-1] for g in grp] for grp in groups
    ] == [[f"{i:03d}.parquet"] for i in range(len(FILES))]
    metrics = replay_corpus_pipeline(
        spark, groups, out_r, ivf_vectors=embs, ivf_centroids=centroids
    )

    s = _state(spark, out_s, with_ivf=True)
    r = _state(spark, out_r, with_ivf=True)
    assert s == r  # the whole chain, every output, bit-for-bit

    # the IVF stage indexed exactly the ACCEPTED-with-embedding docs,
    # each in its nearest coarse cell (32 has no vector; 24 was
    # dedup-dropped before the index stage)
    assert s["ivf"] == [(0, 0, 1), (1, 1, 13), (2, 0, 23)]

    # and the chain did what the fixture plants, batch by batch
    assert {d for _, d, _, _ in s["accepted"]} == EXPECT_ACCEPTED
    assert {d for _, d, _ in s["quarantined"]} == EXPECT_QUARANTINED
    by_batch = {m["batch"]: m for m in metrics}
    assert by_batch[0] == {
        "batch": 0, "n_in": 4, "n_blank": 1, "n_rejected": 1,
        "n_exact_inbatch": 1, "n_near_inbatch": 0, "n_exact_index": 0,
        "n_near_index": 0, "n_accepted": 1, "n_indexed": 1,
        "n_index_rows": 0,
    }
    # n_index_rows = the signature-index rows each batch probed against
    # (one per previously ACCEPTED doc)
    assert [by_batch[i]["n_index_rows"] for i in range(4)] == [0, 1, 2, 3]
    # 12 dies IN-batch: its near anchor 11 (exact dup of indexed 1) is
    # still present when in-batch near-dedup runs, which precedes the
    # index stages; 11 then dies against the index
    assert by_batch[1]["n_near_inbatch"] == 1  # 12 ~ 11 (= BASE)
    assert by_batch[1]["n_exact_index"] == 1   # 11 = exact dup of 1
    assert by_batch[1]["n_near_index"] == 0
    assert by_batch[1]["n_accepted"] == 1      # 13
    assert by_batch[2]["n_near_inbatch"] == 1  # 24 ~ 23 in-batch
    assert by_batch[2]["n_near_index"] == 2    # 21 ~ 1, 22 ~ 13
    assert by_batch[2]["n_accepted"] == 1      # 23
    assert by_batch[3]["n_exact_index"] == 1   # 31 = exact dup of 23
    assert by_batch[3]["n_accepted"] == 1      # 32

    # shard export is content-addressed: recompute md5-of-text prefix
    # mod 8 per accepted doc and compare membership
    import hashlib

    batch_text_of = {d: (b, t) for b, d, t, _ in s["accepted"]}
    want = sorted(
        (b, int(hashlib.md5(t.encode()).hexdigest()[:4], 16) % 8, d)
        for d, (b, t) in batch_text_of.items()
    )
    assert s["shards"] == want


@pytest.mark.slow
def test_rerun_folds_only_the_delta(spark, tmp_path):
    flat = _stage_files(spark, tmp_path)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream_corpus_pipeline(spark, str(flat), out, ckpt)
    first = _state(spark, out)

    # land one more file: an exact dup of an accepted doc + a fresh one
    fresh = (
        "meanwhile the lighthouse keeper climbs the spiral stair at dusk "
        "and counts the distant sails before the fog swallows a horizon "
        "that no chart has ever fixed in place"
    )
    extra = [(41, COFFEE, "s4"), (42, fresh, "s4")]
    _stage_files(spark, tmp_path, files=[extra], sub="flat2")
    import os

    os.link(tmp_path / "flat2" / "000.parquet", flat / "900.parquet")
    stream_corpus_pipeline(spark, str(flat), out, ckpt)

    second = _state(spark, out)
    # committed batches 0-3 are untouched — the delta landed as batch 4
    for key in first:
        assert [x for x in second[key] if x[0] <= 3] == first[key], key
    new_accepted = {d for b, d, _, _ in second["accepted"] if b == 4}
    assert new_accepted == {42}  # 41 died as a cross-batch exact dup


@pytest.mark.slow
def test_replayed_batch_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-folding the same batch id must
    overwrite its own outputs into the identical state (the index read
    excludes the batch's own partition, so a replay never dedups a
    batch against its own partial writes)."""
    out = str(tmp_path / "out")
    b0 = spark.createDataFrame(FILES[0], SCHEMA)
    b1 = spark.createDataFrame(FILES[1], SCHEMA)
    fold_corpus_batch(spark, b0, 0, out, FROZEN_QUALITY_ENSEMBLE)
    m_first = fold_corpus_batch(spark, b1, 1, out, FROZEN_QUALITY_ENSEMBLE)
    state_first = _state(spark, out)
    m_replay = fold_corpus_batch(spark, b1, 1, out, FROZEN_QUALITY_ENSEMBLE)
    assert m_replay == m_first
    assert _state(spark, out) == state_first


def test_missing_index_bands_fails_loudly(spark, tmp_path):
    """A tree whose signature index holds signatures but whose
    pre-banded sibling is gone (pre-sibling layout, manual deletion)
    must FAIL the batch, not silently skip cross-batch near-dedup."""
    import shutil

    import pytest

    out = str(tmp_path / "out")
    fold_corpus_batch(
        spark, spark.createDataFrame(FILES[0], SCHEMA), 0, out,
        FROZEN_QUALITY_ENSEMBLE,
    )
    shutil.rmtree(tmp_path / "out" / "index_bands")
    with pytest.raises(ValueError, match="index_bands"):
        fold_corpus_batch(
            spark, spark.createDataFrame(FILES[1], SCHEMA), 1, out,
            FROZEN_QUALITY_ENSEMBLE,
        )


def test_partial_index_bands_loss_fails(spark, tmp_path):
    """Losing ONE batch's sibling dir while others survive must fail
    the next fold — a readable-but-incomplete sibling would silently
    skip near-dedup against exactly the lost batch's docs."""
    import shutil

    import pytest

    out = str(tmp_path / "out")
    for bid in (0, 1):
        fold_corpus_batch(
            spark, spark.createDataFrame(FILES[bid], SCHEMA), bid, out,
            FROZEN_QUALITY_ENSEMBLE,
        )
    shutil.rmtree(tmp_path / "out" / "index_bands" / "batch=0")
    with pytest.raises(ValueError, match=r"missing batches \[0\]"):
        fold_corpus_batch(
            spark, spark.createDataFrame(FILES[2], SCHEMA), 2, out,
            FROZEN_QUALITY_ENSEMBLE,
        )


def test_banding_param_drift_refused(spark, tmp_path):
    """A sibling written under different MinHash banding constants
    carries a differently-named key column; the probe must refuse it
    (an equi-join on incompatibly-derived keys matches nothing and
    waves near-duplicates through silently)."""
    import pytest

    out = str(tmp_path / "out")
    fold_corpus_batch(
        spark, spark.createDataFrame(FILES[0], SCHEMA), 0, out,
        FROZEN_QUALITY_ENSEMBLE,
    )
    p = f"{out}/index_bands/batch=0"
    old = spark.createDataFrame(spark.read.parquet(p).collect())
    old.withColumnRenamed(_BAND_KEY_COL, "key_b16r2").write.mode(
        "overwrite"
    ).parquet(p)
    with pytest.raises(ValueError, match="banding parameters"):
        fold_corpus_batch(
            spark, spark.createDataFrame(FILES[1], SCHEMA), 1, out,
            FROZEN_QUALITY_ENSEMBLE,
        )


def test_observed_bounded_wait(spark):
    """_observed must time out (instead of blocking forever) when the
    observed plan has not run, and return the stock values once it
    has."""
    import pytest
    from pyspark.sql import Observation

    obs = Observation()
    df = spark.range(5).observe(obs, F.count(F.lit(1)).alias("n"))
    with pytest.raises(TimeoutError):
        _observed(obs, timeout_sec=0.3)
    df.count()
    assert _observed(obs, timeout_sec=30)["n"] == 5


def test_schema_preconditions(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="cannot infer a schema"):
        stream_corpus_pipeline(
            spark, str(tmp_path / "nope"), str(tmp_path / "o"),
            str(tmp_path / "c"),
        )
    d = tmp_path / "noid"
    spark.createDataFrame([("x",)], "text string").write.parquet(str(d))
    with pytest.raises(ValueError, match="doc_id"):
        stream_corpus_pipeline(
            spark, str(d), str(tmp_path / "o2"), str(tmp_path / "c2")
        )


def test_frozen_ensemble_is_the_trainers_exact_output(spark):
    """FROZEN_QUALITY_ENSEMBLE claims to be 'the exact triples
    quality_boost_fit's certified 5-round run produces' at sf0.01 —
    pin that, or the serving/export faces could silently drift from
    the trainer while agreeing with each other (they all consume the
    same frozen literals)."""
    from kmeans_mapreduce_spark.plans.pipeline_queries18 import (
        _BQ_ROUNDS,
        _boost_features,
        _boost_rounds,
    )

    assert len(FROZEN_QUALITY_ENSEMBLE) == _BQ_ROUNDS
    fx = _boost_features(spark, "/root/testdata/sf0.01").localCheckpoint(
        eager=True
    )
    got = [
        (r["round"], r["j"], r["theta"], r["ge_is_pos"])
        for r in _boost_rounds(fx)
    ]
    want = [
        (r["round"], r["j"], r["theta"], r["ge_is_pos"])
        for r in FROZEN_QUALITY_ENSEMBLE
    ]
    assert got == want


def test_observed_public_fallback_path(spark, monkeypatch):
    """A PySpark upgrade that moves the private JVM handles must
    degrade `observed` to the PUBLIC Observation.get under a deadline
    (ADVICE r14), not raise on every batch: force the feature-detect
    probe to fail and check (a) values still come back, (b) the
    verdict is cached as fallback, (c) the deadline still fires."""
    import pytest
    from pyspark.sql import Observation

    from kmeans_mapreduce_spark.functions import observe as OBS

    # simulate the handles vanishing: the probe call raises the way a
    # removed py4j method does (resolution happens at CALL time)
    def _gone(obs, timeout_sec):
        raise AttributeError("getRowOrEmpty moved in this Spark")

    monkeypatch.setattr(OBS, "_FAST_PATH_OK", None)
    monkeypatch.setattr(OBS, "_fast_poll", _gone)
    obs = Observation()
    df = spark.range(7).observe(obs, F.count(F.lit(1)).alias("n"))
    df.count()
    assert OBS.observed(obs, timeout_sec=30)["n"] == 7
    assert OBS._FAST_PATH_OK is False

    # deadline semantics survive on the fallback path: an observation
    # whose plan never ran times out instead of blocking forever
    obs2 = Observation()
    spark.range(3).observe(obs2, F.count(F.lit(1)).alias("n"))
    with pytest.raises(TimeoutError):
        OBS.observed(obs2, timeout_sec=0.3)

    # an upgrade that removes the _jo attribute entirely must ALSO
    # take the public path (not a misleading "never attached" error) —
    # only "present and None" means genuinely unattached
    class _NoPrivates:
        def __init__(self, inner):
            self._inner = inner

        @property
        def get(self):
            return self._inner.get

    monkeypatch.setattr(OBS, "_FAST_PATH_OK", None)
    obs3 = Observation()
    df3 = spark.range(11).observe(obs3, F.count(F.lit(1)).alias("n"))
    df3.count()
    assert OBS.observed(_NoPrivates(obs3), timeout_sec=30)["n"] == 11
    # one object without the attribute must NOT lock the process-wide
    # verdict (r15 review fix: it used to demote None -> False, parking
    # every later REAL Observation on the daemon-thread fallback
    # forever on a healthy PySpark) — the probe stays pending...
    assert OBS._FAST_PATH_OK is None
    # ...and the next real Observation runs it (here the probe fails —
    # _fast_poll is still monkeypatched away — so the verdict resolves
    # False via the genuine feature-detect, not via the duck-type)
    obs4 = Observation()
    df4 = spark.range(13).observe(obs4, F.count(F.lit(1)).alias("n"))
    df4.count()
    assert OBS.observed(obs4, timeout_sec=30)["n"] == 13
    assert OBS._FAST_PATH_OK is False


def test_empty_index_error_fallback_is_fs_verified(spark, tmp_path):
    """The substring fallback (no structured error class attached) must
    NOT classify a real failure as an empty index when the dir in fact
    holds data files (ADVICE r14): a torn-file error whose cause chain
    merely mentions PATH_NOT_FOUND would otherwise silently skip
    cross-batch dedup."""
    from kmeans_mapreduce_spark.streaming.corpus_pipeline import (
        _is_empty_index_error,
    )

    exc = RuntimeError(
        "An error occurred while calling o1.parquet.\n: shaded cause "
        "mentions [PATH_NOT_FOUND] somewhere in a torn-read stack"
    )
    live = tmp_path / "live_index"
    spark.range(3).write.parquet(str(live))
    # data-bearing dir -> the mention is NOT a benign empty read
    assert _is_empty_index_error(exc, spark, str(live)) is False
    # genuinely absent dir -> benign
    assert _is_empty_index_error(exc, spark, str(tmp_path / "nope")) is True
    # dir with only non-data files (_SUCCESS-style) -> benign
    marker = tmp_path / "markers_only"
    marker.mkdir()
    (marker / "_SUCCESS").touch()
    assert _is_empty_index_error(exc, spark, str(marker)) is True
    # structured class wins regardless of the filesystem
    class Classy(Exception):
        def getCondition(self):
            return "PATH_NOT_FOUND"

    assert _is_empty_index_error(Classy("x"), spark, str(live)) is True
    # no mention at all -> never benign
    assert _is_empty_index_error(RuntimeError("boom"), spark, None) is False
