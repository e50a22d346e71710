"""ONE end-to-end streaming corpus-curation topology: the composition
of every stage this engine serves individually, run as a single
micro-batch fold the way a production 100 TB ingest pipeline actually
runs them —

  1. TRIAGE      blank docs route to a quarantine output with a reason
                 column (the text face of the codec quarantine
                 operator) instead of silently vanishing;
  2. QUALITY     the frozen boosted ensemble keeps vote > 0 — the
                 trainer's own feature derivation and stump semantics
                 via ensemble_vote_expr (streaming/boost_stream.py):
                 stateless per-row expressions, zero train/serve drift;
  3. DEDUP       in-batch exact (lowest id per md5 fingerprint), then
                 exact vs the persisted signature index (anti join on
                 fingerprint), then near-dup as a banded MinHash
                 signature join.  Near similarity is decided by
                 SIGNATURE AGREEMENT everywhere — in-batch AND
                 vs-index — one decision function, so the fold's drops
                 depend only on (batch contents, prior index), never on
                 which side of a batch boundary a pair straddles.  The
                 vs-index candidate join reads a PRE-BANDED sibling
                 (``index_bands/batch=<b>/`` rows (id, band, key),
                 written once per batch) instead of re-deriving the
                 band keys of the whole index every micro-batch — the
                 banding cost is paid once per accepted doc at write
                 time, not once per doc per subsequent batch.  The
                 standalone stream (dedup_corpus.py) keeps its
                 exact-Jaccard in-batch verify; the composed pipeline
                 trades that sliver of in-batch precision for a fold
                 that a driver-loop replay can reproduce bit-for-bit;
  4. EXPORT      accepted rows land as JSONL shards addressed by
                 CONTENT (shard = md5(fingerprint) prefix mod n): the
                 same text lands in the same shard no matter which
                 duplicate's id survived or which batch carried it —
                 arrival-invariant where the id-keyed batch exporter
                 (sources/sinks.write_jsonl_shards) is not;
  5. INDEX (optional)  accepted docs that have an embedding are
                 assigned their nearest coarse centroid and appended
                 to the hive-partitioned IVF inverted file the ANN
                 probes read — the curated corpus becomes searchable
                 as it lands;
  plus a one-row METRICS frame per batch (in/blank/rejected/dropped/
  indexed counts, and the index size the batch probed against) — the
  observability face a long-lived pipeline is operated from.  The
  pure row-count metrics of frames the fold writes anyway (n_in,
  n_blank, n_accepted, n_indexed) ride ``df.observe`` on those writes
  instead of separate ``count()`` actions, so they cost zero extra
  Spark jobs per batch.

EXACTLY-ONCE BY CONSTRUCTION, not by sink log: every stage's output
for micro-batch b lands under ``<stage>/batch=<b>/`` with
mode=overwrite, and the fold reads the signature index FILTERED TO
``batch < b``.  foreachBatch is at-least-once — a batch that crashed
mid-write replays — but a replay recomputes against exactly the
pre-batch index state (its own partial writes are excluded by the
filter) and OVERWRITES its own batch directories, so the committed
output is identical whether the batch ran once or five times.  This is
strictly stronger than the append-mode standalone stream, whose
crash-between-appends window is documented there.

Scale shape per batch: stages 1-2 are per-row expressions (scan
speed); stage 3 is one narrow shuffle on fingerprint plus a banded
candidate join whose index side is the pre-banded (id, band, key)
sibling — scanned, never shuffled (AQE broadcasts the micro-batch
probe side), with signature verification joining the CANDIDATE PAIRS
(tiny) back to the already-cached flat index; stage 4 is a projection
+ file commit.  Driver state: one metrics row per batch.  The growing
state is the signature index plus its banded sibling — sub-KB per
ACCEPTED doc, text never re-read.  Per-batch probe cost is linear in
the index size with a small constant (a columnar scan of short rows);
the measured per-batch cost curve at stream length lives in
SCALE_RUN.md.  A deployment whose batches outgrow the broadcast
threshold registers the sibling as a table BUCKETED BY (band, key) so
the candidate join co-locates without shuffling the index — EXECUTED,
not modeled: the stress harness's band_bucketed_ab row measures the
same candidate join at 2 exchanges plain vs 0 bucketed with equal
checksums (tools/stress_run.py, SCALE_RUN.md round 14).

No reference analog (the reference has no streaming at all);
composes the mandated beyond-reference streaming surface end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.functions.text import fingerprint, tokens
from kmeans_mapreduce_spark.operators.dedup import (
    MINHASH_BANDS,
    MINHASH_ROWS_PER_BAND,
    minhash_signature,
    sig_agreement,
)
from kmeans_mapreduce_spark.operators.dedup import (
    banded_signatures as _banded,
)
from kmeans_mapreduce_spark.streaming.boost_stream import ensemble_vote_expr

# The frozen production model: the 5-round ensemble quality_boost_fit
# learns at sf0.01 (plans/pipeline_queries18.py — round 1 "contains
# 'the'", rounds 2-5 the label's two clauses under doubled weights).
# A serving pipeline ships trained literals, not a trainer; these are
# the exact triples the oracle-certified fit produces.
FROZEN_QUALITY_ENSEMBLE: list[dict] = [
    {"round": 1, "j": 4, "theta": 1, "ge_is_pos": True},
    {"round": 2, "j": 33, "theta": 59, "ge_is_pos": True},
    {"round": 3, "j": 32, "theta": 63, "ge_is_pos": True},
    {"round": 4, "j": 32, "theta": 13, "ge_is_pos": True},
    {"round": 5, "j": 33, "theta": 60, "ge_is_pos": True},
]


# metrics output contract — ONE definition for the writer and the
# schema-compatibility precondition (a pre-n_indexed output tree read
# back without mergeSchema would be schema-nondeterministic; the
# stream face refuses to extend such a tree instead)
METRICS_SCHEMA = (
    "batch int, n_in long, n_blank long, n_rejected long, "
    "n_exact_inbatch long, n_near_inbatch long, "
    "n_exact_index long, n_near_index long, n_accepted long, "
    "n_indexed long, n_index_rows long"
)
_METRICS_FIELDS = [c.split()[0] for c in METRICS_SCHEMA.split(", ")]


_EMPTY_INDEX_CLASSES = ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA")


def _dir_absent_or_datafree(spark: SparkSession, path: str) -> bool:
    """Driver-side ground truth for the empty-index shapes: the dir
    does not exist, or holds no data files (files whose names don't
    start with ``_``/``.`` — Spark's own visibility rule).  One
    recursive listing, no Spark job."""
    from kmeans_mapreduce_spark.sources.maintenance import _fs_path

    fs, jp = _fs_path(spark, path)
    if not fs.exists(jp):
        return True
    it = fs.listFiles(jp, True)
    while it.hasNext():
        name = it.next().getPath().getName()
        if not name.startswith(("_", ".")):
            return False
    return True


def _is_empty_index_error(
    exc: Exception, spark: SparkSession | None = None, path: str | None = None
) -> bool:
    """True iff ``exc`` is one of the two legitimate empty-index reads:
    the index dir does not exist yet, or exists with no data files (no
    schema to infer).  Checks the structured error class first
    (``getCondition``/``getErrorClass`` on PySpark's exceptions — the
    stable contract across Spark upgrades).  The substring fallback
    (raw Py4JJavaError, no class attached) alone could misclassify a
    REAL failure whose stringified cause chain merely mentions
    PATH_NOT_FOUND (ADVICE r14) — so when the caller supplies
    ``(spark, path)``, a substring match must additionally be confirmed
    by a driver-side listing showing the dir genuinely absent or
    data-file-free before the error is treated as benign."""
    for attr in ("getCondition", "getErrorClass"):
        get = getattr(exc, attr, None)
        if get is None:
            continue
        try:
            cls = get()
        except Exception:
            continue
        if cls is not None:
            return any(c in cls for c in _EMPTY_INDEX_CLASSES)
    msg = str(exc)
    if not any(c in msg for c in _EMPTY_INDEX_CLASSES):
        return False
    if spark is not None and path is not None:
        return _dir_absent_or_datafree(spark, path)
    return True


def _ivf_centroid_dim(centroids) -> int:
    """Validate the frozen coarse quantizer (non-empty, uniform
    dimension) and return its dimension — a malformed quantizer is a
    configuration error worth failing loudly on, not a per-row NULL."""
    if not centroids:
        raise ValueError("ivf_centroids is empty — nothing to assign to")
    dims = {len(c) for c in centroids}
    if len(dims) != 1 or 0 in dims:
        raise ValueError(
            f"ivf_centroids have inconsistent/zero dimensions: {sorted(dims)}"
        )
    return dims.pop()


# The persisted banded sibling's key column carries the banding
# parameters IN ITS NAME: a build whose MinHash banding constants
# changed reads an old sibling, fails to find its expected column, and
# refuses loudly — instead of an equi-join on incompatibly-derived keys
# silently matching nothing and waving near-duplicates through.
_BAND_KEY_COL = f"key_b{MINHASH_BANDS}r{MINHASH_ROWS_PER_BAND}"


def _batch_ids(spark: SparkSession, path: str) -> set[int]:
    """The batch=<b> partition ids present under ``path`` — one
    driver-side directory listing, no Spark job; empty set if the dir
    does not exist."""
    from kmeans_mapreduce_spark.sources.maintenance import _fs_path

    fs, jp = _fs_path(spark, path)
    if not fs.exists(jp):
        return set()
    out: set[int] = set()
    for st in fs.listStatus(jp):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("batch="):
            try:
                out.add(int(name.split("=", 1)[1]))
            except ValueError:
                continue
    return out


# ``Observation.get`` with a deadline — a lost listener event fails the
# (replayable-by-construction) batch instead of wedging the stream.
# ONE definition in functions/observe.py, shared with the IVF
# compactor: fast path polls the JVM's bounded getRowOrEmpty; a PySpark
# upgrade that moves those private handles degrades to the PUBLIC
# Observation.get under a daemon-thread deadline (ADVICE r14), not an
# AttributeError on every batch.
from kmeans_mapreduce_spark.functions.observe import observed as _observed


def content_shard(fp_col, n_shards: int):
    """Content-addressed shard id: first 4 hex chars of the text
    fingerprint mod n — identical text lands in the same shard no
    matter which duplicate id survived dedup or when it arrived."""
    return (F.conv(F.substring(fp_col, 1, 4), 16, 10).cast("int") % n_shards)


def fold_corpus_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    out_dir: str,
    rounds: list[dict],
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    n_shards: int = 8,
    ivf_vectors: DataFrame | None = None,
    ivf_centroids: list[list[float]] | None = None,
    ivf_id_col: str = "vec_id",
    ivf_vec_col: str = "embedding",
) -> dict:
    """The whole chain for ONE micro-batch; deterministic given
    (batch contents, index state at batches < batch_id).  Called by
    the streaming topology (foreachBatch) and by the driver-loop
    replay face — the same code object, so stream-vs-replay equality
    tests the STREAMING MACHINERY (file listing, checkpointing,
    redelivery), not two implementations of the semantics.

    ``ivf_vectors`` + ``ivf_centroids`` enable the OPTIONAL fifth
    stage: each accepted doc that has an embedding (inner join on id —
    embeddings typically cover a subset of the corpus) is assigned its
    nearest coarse centroid and appended to the hive-partitioned IVF
    inverted file `ivf/batch=<b>/cell=<i>/` that ivf_topk_from_index
    probes — the accepted corpus becomes SEARCHABLE as it lands, under
    the same batch-dir idempotence discipline as every other stage.
    Centroids stay fixed between index rebuilds (the standard IVF
    regime, operators/similarity.stream_append_ivf_index)."""
    from kmeans_mapreduce_spark.plans.pipeline_queries17 import (
        with_doc_features,
    )

    orig = batch_df.columns
    caches: list[DataFrame] = []

    def cached(df: DataFrame) -> DataFrame:
        caches.append(df.cache())
        return df

    from pyspark.sql import Observation

    staged = cached(batch_df.withColumn("_ntok", F.size(tokens(text_col))))
    try:
        # n_in / n_blank ride an observation on the quarantine write
        # (observe() is a pushdown barrier, so the blank filter below
        # cannot reach past it and shrink n_in) — zero extra jobs
        obs_triage = Observation()
        quarantine = (
            staged.observe(
                obs_triage,
                F.count(F.lit(1)).alias("n_in"),
                F.sum((F.col("_ntok") == 0).cast("long")).alias("n_blank"),
            )
            .where(F.col("_ntok") == 0)
            .select(*orig, F.lit("blank_text").alias("reason"))
        )

        live = staged.where(F.col("_ntok") > 0).select(*orig)
        # quality: append features in place, vote, keep originals —
        # apply_boost_filter's exact semantics, inlined so fp/sig ride
        # the same projection (one pass over text)
        cur = cached(
            with_doc_features(live, text_col=text_col)
            .where(ensemble_vote_expr(rounds) > 0)
            .select(
                *orig,
                fingerprint(text_col).alias("fp"),
                minhash_signature(text_col).alias("sig"),
            )
        )
        n_kept = cur.count()

        # in-batch exact: lowest id per fingerprint survives
        w = Window.partitionBy("fp").orderBy(id_col)
        uniq = cached(
            cur.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        n_uniq = uniq.count()
        n_exact_inbatch = n_kept - n_uniq

        # in-batch near-dup: banded self-join, SIGNATURE agreement (the
        # same estimator the index probe uses), higher id drops
        ub = _banded(
            uniq.select(F.col(id_col).alias("id"), "sig").where(
                F.col("sig").isNotNull()
            )
        )
        near_in = (
            ub.alias("a")
            .join(
                ub.alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.key") == F.col("b.key"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .where(sig_agreement(F.col("a.sig"), F.col("b.sig")) >= threshold)
            .select(F.col("b.id").alias(id_col))
            .distinct()
        )
        survivors = cached(uniq.join(near_in, id_col, "left_anti"))

        # vs-index: exact then near — the index holds batches < b only,
        # so a REPLAY of batch b never sees its own partial writes
        idx = None
        n_idx = 0
        if batch_id > 0:
            try:
                idx = cached(
                    spark.read.parquet(f"{out_dir}/index").where(
                        F.col("batch") < F.lit(batch_id)
                    )
                )
                n_idx = idx.count()
            except Exception as exc:
                # ONLY the two legitimate empty-index shapes pass: the
                # dir doesn't exist yet, or every prior batch accepted
                # zero docs (dirs with no data files -> no schema).  A
                # torn file, permission error, etc. must FAIL the batch
                # — swallowing it would silently skip cross-batch dedup
                # and commit duplicates with clean-looking metrics.
                if not _is_empty_index_error(exc, spark, f"{out_dir}/index"):
                    raise
                idx, n_idx = None, 0
        # counts the observation on the accepted write cannot derive;
        # None in the no-index branch (there n_after_inbatch IS
        # n_accepted, read from the observation after the write)
        n_after_inbatch = n_after_exact_idx = None
        if n_idx > 0:
            n_after_inbatch = survivors.count()
            # cached: referenced by a count and the next anti-join
            survivors = cached(
                survivors.join(idx.select("fp").distinct(), "fp", "left_anti")
            )
            n_after_exact_idx = survivors.count()
            # near vs index: candidates from the PRE-BANDED sibling
            # (id, band, key — banding paid once per doc at write time,
            # not once per doc per batch), then signature verification
            # joins the candidate pairs (tiny, broadcast) back to the
            # already-cached flat index for the stored signatures.
            # Every fold writes BOTH index/batch=<b> and
            # index_bands/batch=<b>, so any index batch dir without its
            # sibling (pre-sibling tree, partial restore, manual
            # deletion) means near-dedup state is GONE for those docs —
            # fail the batch rather than silently waving their
            # near-duplicates through.  One driver-side listing per
            # tree, no Spark job.
            missing = {
                p for p in _batch_ids(spark, f"{out_dir}/index")
                if p < batch_id
            } - _batch_ids(spark, f"{out_dir}/index_bands")
            if missing:
                raise ValueError(
                    f"{out_dir!r}: index_bands is missing batches "
                    f"{sorted(missing)} that the signature index holds "
                    f"— this tree predates the banded-sibling layout "
                    f"or lost part of it; rebuild or start a new "
                    f"out_dir instead of silently skipping near-dedup"
                )
            try:
                bands = spark.read.parquet(f"{out_dir}/index_bands").where(
                    F.col("batch") < F.lit(batch_id)
                )
            except Exception as exc:
                if not _is_empty_index_error(
                    exc, spark, f"{out_dir}/index_bands"
                ):
                    raise
                bands = None
            if bands is not None and _BAND_KEY_COL not in bands.columns:
                raise ValueError(
                    f"{out_dir!r}: index_bands was written with "
                    f"different MinHash banding parameters (expected "
                    f"column {_BAND_KEY_COL!r}, found "
                    f"{bands.columns}) — joining incompatibly-derived "
                    f"keys would silently match nothing; rebuild the "
                    f"index or start a new out_dir"
                )
            if bands is None:
                # the dir guard above passed, so an unreadable sibling
                # here is the all-batches-empty shape — provably
                # nothing band-joinable iff the index holds no
                # signatures; otherwise fail.
                if idx.where(F.col("sig").isNotNull()).limit(1).count() > 0:
                    raise ValueError(
                        f"{out_dir!r}: the signature index holds "
                        f"MinHash signatures but index_bands is "
                        f"unreadable — rebuild or start a new out_dir "
                        f"instead of silently skipping near-dedup"
                    )
                near_ids = None
            else:
                # the sibling's batch rides along so verification joins
                # back to the SAME index row that produced the band key:
                # exact dedup is by fingerprint, not id, so one doc id
                # can hold different text (different sigs) in two
                # batches — an id-only join would verify a band match
                # from one row against both rows' signatures (ADVICE
                # r14), slightly broadening drops.
                bands = bands.select(
                    "id", "batch", "band", F.col(_BAND_KEY_COL).alias("key")
                )
                sb = _banded(
                    survivors.select(F.col(id_col).alias("id"), "sig").where(
                        F.col("sig").isNotNull()
                    )
                )
                cand = (
                    sb.alias("a")
                    .join(
                        bands.alias("b"),
                        (F.col("a.band") == F.col("b.band"))
                        & (F.col("a.key") == F.col("b.key")),
                    )
                    .select(
                        F.col("a.id").alias("id"),
                        F.col("a.sig").alias("sig"),
                        F.col("b.id").alias("_iid"),
                        F.col("b.batch").alias("_ibatch"),
                    )
                    .dropDuplicates(["id", "_iid", "_ibatch"])
                )
                near_ids = (
                    cand.join(
                        idx.select(
                            F.col("id").alias("_iid"),
                            F.col("batch").alias("_ibatch"),
                            F.col("sig").alias("_isig"),
                        ),
                        ["_iid", "_ibatch"],
                    )
                    .where(
                        sig_agreement(F.col("sig"), F.col("_isig"))
                        >= threshold
                    )
                    .select(F.col("id").alias(id_col))
                    .distinct()
                )
            if near_ids is not None:
                survivors = cached(
                    survivors.join(near_ids, id_col, "left_anti")
                )

        # optional stage 5: IVF index append for accepted docs that
        # have an embedding — ONE shared cell-assignment implementation
        # (operators/similarity.assign_ivf_cells: lowest-cell tie-break,
        # distance array bound once), the same plan
        # ivf_topk_from_index probes through
        ivf_entries = None
        obs_ivf = None
        if (ivf_vectors is None) != (ivf_centroids is None):
            raise ValueError(
                "ivf_vectors and ivf_centroids must be given together — "
                "the IVF stage needs both the vector table and the "
                "frozen coarse quantizer"
            )
        if ivf_vectors is not None:
            dim = _ivf_centroid_dim(ivf_centroids)
            from kmeans_mapreduce_spark.operators.similarity import (
                assign_ivf_cells,
            )

            # broadcast the tiny survivors side so the (at scale, huge)
            # vector table is only scanned, never shuffled, per batch
            vecs = F.broadcast(
                survivors.select(F.col(id_col).alias("_aid"))
            ).join(
                ivf_vectors.select(
                    F.col(ivf_id_col).alias("_aid"),
                    F.col(ivf_vec_col).cast("array<double>").alias("_cv"),
                ),
                "_aid",
            )
            # a null or dimension-mismatched embedding would assign a
            # NULL cell — written to __HIVE_DEFAULT_PARTITION__, counted
            # but never probeable.  Such rows stay ACCEPTED docs but are
            # excluded from the index (n_indexed counts only searchable
            # entries).
            valid = vecs.where(
                F.col("_cv").isNotNull() & (F.size("_cv") == dim)
            )
            ivf_entries = assign_ivf_cells(
                valid, ivf_centroids, id_col="_aid", vec_col="_cv"
            )
            obs_ivf = Observation()

        # ---- commits: everything under batch=<b>, overwrite ----------
        # the pure row-count metrics (n_in/n_blank, n_accepted,
        # n_indexed) ride observations on these writes — the write IS
        # the action that computes them, no separate count() jobs
        b = f"batch={batch_id}"
        if ivf_entries is not None:
            ivf_entries.observe(
                obs_ivf, F.count(F.lit(1)).alias("n_indexed")
            ).write.mode("overwrite").partitionBy("cell").parquet(
                f"{out_dir}/ivf/{b}"
            )
        quarantine.write.mode("overwrite").parquet(
            f"{out_dir}/quarantine/{b}"
        )
        obs_accept = Observation()
        survivors.observe(
            obs_accept, F.count(F.lit(1)).alias("n_accepted")
        ).drop("fp", "sig").write.mode("overwrite").parquet(
            f"{out_dir}/accepted/{b}"
        )
        survivors.select(
            F.col(id_col).alias("id"), "fp", "sig"
        ).write.mode("overwrite").parquet(f"{out_dir}/index/{b}")
        # the pre-banded sibling the NEXT batches' near probes read —
        # FLAT parquet, not partitionBy("band"): an empty partitioned
        # write leaves no schema-bearing file, and the sibling must stay
        # readable even when a batch accepts nothing.  The key column's
        # NAME carries the banding parameters (_BAND_KEY_COL) so a
        # build with different constants refuses the tree.
        _banded(
            survivors.select(F.col(id_col).alias("id"), "sig").where(
                F.col("sig").isNotNull()
            )
        ).select(
            "id", "band", F.col("key").alias(_BAND_KEY_COL)
        ).write.mode("overwrite").parquet(f"{out_dir}/index_bands/{b}")
        (
            survivors.withColumn("shard", content_shard(F.col("fp"), n_shards))
            .drop("fp", "sig")
            .write.mode("overwrite")
            .partitionBy("shard")
            .json(f"{out_dir}/shards/{b}")
        )

        # ---- metrics: observations + the counts no write computes ----
        # (_observed = .get with a deadline; a lost listener event
        # fails the batch instead of wedging the stream)
        triage = _observed(obs_triage)
        # sum() over an empty frame observes NULL, not 0
        n_in = triage["n_in"]
        n_blank = triage["n_blank"] or 0
        n_accepted = _observed(obs_accept)["n_accepted"]
        n_indexed = (
            _observed(obs_ivf)["n_indexed"] if obs_ivf is not None else 0
        )
        if n_after_inbatch is None:
            n_after_inbatch = n_accepted
            n_exact_index = n_near_index = 0
        else:
            n_exact_index = n_after_inbatch - n_after_exact_idx
            n_near_index = n_after_exact_idx - n_accepted
        metrics = {
            "batch": batch_id,
            "n_in": n_in,
            "n_blank": n_blank,
            "n_rejected": (n_in - n_blank) - n_kept,
            "n_exact_inbatch": n_exact_inbatch,
            "n_near_inbatch": n_uniq - n_after_inbatch,
            "n_exact_index": n_exact_index,
            "n_near_index": n_near_index,
            "n_accepted": n_accepted,
            "n_indexed": n_indexed,
            "n_index_rows": n_idx,
        }
        # row built from the schema-derived field list, not dict order —
        # a key/schema mismatch raises KeyError instead of silently
        # writing values under the wrong column names
        spark.createDataFrame(
            [tuple(metrics[f] for f in _METRICS_FIELDS)], METRICS_SCHEMA
        ).write.mode("overwrite").parquet(f"{out_dir}/metrics/{b}")
        return metrics
    finally:
        # release every per-batch cache (including reassigned names) —
        # a long-lived stream must not accumulate executor storage
        for df in caches:
            df.unpersist()


def stream_corpus_pipeline(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint: str,
    rounds: list[dict] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    n_shards: int = 8,
    max_files_per_trigger: int = 1,
    schema=None,
    ivf_vectors: DataFrame | None = None,
    ivf_centroids: list[list[float]] | None = None,
    ivf_id_col: str = "vec_id",
    ivf_vec_col: str = "embedding",
) -> None:
    """Drain ``docs_dir`` (availableNow) through the whole chain.
    Re-running after new files land folds ONLY the delta (checkpoint
    offsets); each delta batch gets the next batch id and its own
    output dirs, so committed batches are never rewritten.
    ``ivf_vectors``/``ivf_centroids`` (+ their column names) switch on
    the optional IVF index-append stage (see fold_corpus_batch).

    Preconditions checked up front (driver-side, once per run): the
    stream schema carries a string ``text_col``; the IVF inputs come
    as a pair with a well-formed quantizer; and if ``out_dir`` already
    holds a metrics tree, its schema must match METRICS_SCHEMA — a
    tree written before a metrics column existed would otherwise read
    back schema-nondeterministically (parquet infers from one
    arbitrary file without mergeSchema), so extending it is refused
    with a start-a-new-out_dir error instead."""
    if rounds is None:
        rounds = FROZEN_QUALITY_ENSEMBLE
    if schema is None:
        try:
            schema = spark.read.parquet(docs_dir).schema
        except Exception as exc:
            raise ValueError(
                f"stream_corpus_pipeline: cannot infer a schema from "
                f"{docs_dir!r} (empty or not yet populated?) — pass "
                f"schema= explicitly"
            ) from exc
    for c in (id_col, text_col):
        if c not in schema.fieldNames():
            raise ValueError(
                f"stream_corpus_pipeline: column {c!r} not in the "
                f"stream schema {schema.fieldNames()}"
            )
    from pyspark.sql.types import StringType

    if not isinstance(schema[text_col].dataType, StringType):
        raise ValueError(
            f"stream_corpus_pipeline: text column {text_col!r} must be "
            f"string, got {schema[text_col].dataType.simpleString()}"
        )
    if (ivf_vectors is None) != (ivf_centroids is None):
        raise ValueError(
            "ivf_vectors and ivf_centroids must be given together"
        )
    if ivf_centroids is not None:
        _ivf_centroid_dim(ivf_centroids)
    try:
        existing = spark.read.parquet(f"{out_dir}/metrics").schema.fieldNames()
    except Exception:
        existing = None
    # set-compare: `batch` rides both as a data column and the
    # partition dir, and partition discovery can reorder fields
    if existing is not None and set(existing) != set(_METRICS_FIELDS):
        raise ValueError(
            f"stream_corpus_pipeline: {out_dir!r} holds a metrics tree "
            f"with schema {existing}, but this build writes "
            f"{_METRICS_FIELDS} — mixed-schema parquet reads are "
            f"nondeterministic, so start a new out_dir (and checkpoint) "
            f"instead of extending this one"
        )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        fold_corpus_batch(
            spark,
            batch_df,
            batch_id,
            out_dir,
            rounds,
            id_col=id_col,
            text_col=text_col,
            threshold=threshold,
            n_shards=n_shards,
            ivf_vectors=ivf_vectors,
            ivf_centroids=ivf_centroids,
            ivf_id_col=ivf_id_col,
            ivf_vec_col=ivf_vec_col,
        )

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_batch_file_groups(checkpoint: str) -> list[list[str]]:
    """The exact per-batch input file lists a completed streaming run
    recorded in its FileStreamSource log (``<ckpt>/sources/0/<batch>``)
    — the ground truth for a replay.  The source lists files in
    last-modified order, NOT lexicographic path order, so a replay
    that guesses the grouping from sorted paths diverges on any
    corpus whose files were written concurrently; reading the log
    removes the guess.  Every v1 log entry carries its ``batchId``,
    so grouping is by that field — immune to the log's ``.compact``
    rollups (which repeat earlier entries WITH their original ids).
    Raises if log cleanup has already deleted the history of the
    earliest batches (nothing left to replay them from)."""
    import json
    from pathlib import Path

    src = Path(checkpoint) / "sources" / "0"
    if not src.is_dir():
        raise ValueError(
            f"no FileStreamSource log under {checkpoint!r} — has the "
            f"stream run to completion?"
        )
    logs = sorted(
        (
            (int(p.name.split(".")[0]), p)
            for p in src.iterdir()
            if p.name.split(".")[0].isdigit() and not p.name.endswith(".crc")
        ),
    )
    by_batch: dict[int, dict[str, None]] = {}
    for _, p in logs:
        for line in p.read_text().splitlines():
            if not line.startswith("{"):
                continue
            e = json.loads(line)
            # dict-as-ordered-set: compact files repeat entries; keep
            # first occurrence order within each batch
            by_batch.setdefault(int(e["batchId"]), {})[e["path"]] = None
    ids = sorted(by_batch)
    if ids != list(range(len(ids))):
        raise ValueError(
            f"FileStreamSource log under {checkpoint!r} is no longer "
            f"contiguous from batch 0 (retained ids {ids[:3]}...) — "
            f"log cleanup has dropped early batches, so a full replay "
            f"is impossible from this checkpoint"
        )
    return [list(by_batch[i]) for i in ids]


def replay_corpus_pipeline(
    spark: SparkSession,
    file_groups: list[list[str]],
    out_dir: str,
    rounds: list[dict] | None = None,
    **kwargs,
) -> list[dict]:
    """The ground-truth face: drive the SAME fold over explicit file
    groups with a plain driver loop — no streaming engine, no
    checkpoint.  Feeding it the lexicographic file chunks the
    FileStreamSource forms (sorted paths, ``max_files_per_trigger``
    per batch) must reproduce the stream's every output directory
    bit-for-bit; the equality test is therefore a test of Spark's
    streaming delivery, not of a second semantics implementation."""
    if rounds is None:
        rounds = FROZEN_QUALITY_ENSEMBLE
    return [
        fold_corpus_batch(
            spark,
            spark.read.parquet(*files),
            bid,
            out_dir,
            rounds,
            **kwargs,
        )
        for bid, files in enumerate(file_groups)
    ]
