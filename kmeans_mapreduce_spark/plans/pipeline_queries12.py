"""Round-8 pipeline queries: the REAL-codec multimodal family.

The multimodal operators' decode boundary was a documented stub through
round 7 — the Arrow plumbing was tested but no query ever turned bytes
into pixels.  These queries close that: a dependency-free pure-Python
binary-PPM (P6) decoder (operators/multimodal._decode_ppm) runs inside
the mapInPandas stages, over payloads that are genuine P6 files whose
CONTENT follows a generative formula both engines can recompute (dims
from the text byte length, pixel i = (media_id*7 + i) % 256).  The
oracles therefore re-derive every output — dims, byte counts, pixel
sums, nearest-neighbor thumb sums, tile counts — from the formula,
while the Spark side actually parses headers and walks rasters: an
off-by-one anywhere in the decoder breaks the driver hash.

Scale shape (all three): synth -> decode -> (resize|tiles) compose
inside ONE mapInPandas/Catalyst pipeline per task — no shuffle until
the final (bounded or per-media) aggregate; at 100 TB this is the
canonical "decode near the data, never collect pixels" layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.operators import multimodal as MM
from kmeans_mapreduce_spark.plans.pipeline_queries import _docs, _embs

# dims formula shared with operators/multimodal.attach_ppm_payload
_DIMS_CTE = """
WITH m AS (
  SELECT CAST(doc_id AS BIGINT) AS media_id,
         octet_length(encode(text)) AS n
  FROM documents),
d AS (
  SELECT media_id, 4 + n % 13 AS w, 4 + (n // 13) % 11 AS h FROM m)
"""


def mm_decode_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end: synthesize genuine P6 PPM payloads
    from the documents table, parse them with the pure-Python decoder,
    and report per image the parsed dims, total byte count (header +
    raster — sensitive to header serialization), the exact pixel sum
    and the first/last raster bytes (sensitive to the raster offset:
    any header-scan off-by-one shifts them)."""
    media = MM.attach_ppm_payload(_docs(spark, sf_dir), "doc_id", "text")
    dec = MM.decode_media(media)
    return dec.select(
        "media_id",
        "width",
        "height",
        "n_bytes",
        (F.col("feature")[0] + F.col("feature")[1] + F.col("feature")[2])
        .cast("bigint")
        .alias("pix_sum"),
        F.col("feature")[3].cast("int").alias("first_px"),
        F.col("feature")[4].cast("int").alias("last_px"),
    )


MM_DECODE_PPM_SQL = (
    _DIMS_CTE
    + """
SELECT media_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       -- 'P6\\n' + 'w h\\n' + '255\\n' + raster
       CAST(9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR))
            + 3 * w * h AS BIGINT) AS n_bytes,
       CAST(list_sum(list_transform(range(0, 3 * w * h),
            i -> (media_id * 7 + i) % 256)) AS BIGINT) AS pix_sum,
       CAST((media_id * 7) % 256 AS INT) AS first_px,
       CAST((media_id * 7 + 3 * w * h - 1) % 256 AS INT) AS last_px
FROM d
"""
)


def mm_resize_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode -> nearest-neighbor downscale (max side 8) -> exact
    thumb pixel sum, all inside one mapInPandas stage over genuine P6
    bytes.  Thumb dims use integer math (w*8 // max(w,h), floored at 1)
    and the NN source index is i*h // th — deterministic on both
    engines, no float scale anywhere."""
    media = MM.attach_ppm_payload(_docs(spark, sf_dir), "doc_id", "text")
    res = MM.resize_media(media, max_side=8)
    return res.select(
        "media_id",
        "width",
        "height",
        "thumb_width",
        "thumb_height",
        F.col("thumb_feature")[3].cast("bigint").alias("thumb_sum"),
    )


MM_RESIZE_PPM_SQL = (
    _DIMS_CTE
    + """,
t AS (
  SELECT media_id, w, h,
         greatest(1, (w * 8) // greatest(w, h)) AS tw,
         greatest(1, (h * 8) // greatest(w, h)) AS th
  FROM d)
SELECT media_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(tw AS INT) AS thumb_width,
       CAST(th AS INT) AS thumb_height,
       -- NN thumb byte k: pixel p = k//3, channel c = k%3,
       -- ty = p//tw, tx = p%tw, sy = ty*h//th, sx = tx*w//tw
       CAST(list_sum(list_transform(range(0, 3 * tw * th),
            k -> (media_id * 7
                  + 3 * ((((k // 3) // tw) * h // th) * w
                         + (((k // 3) % tw) * w // tw))
                  + k % 3) % 256)) AS BIGINT) AS thumb_sum
FROM t
"""
)


def mm_tiles_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT patch grid over GENUINELY decoded dims: decode real P6
    headers, tile at patch=4 with edge clipping, and report per image
    the tile count and the summed tile area — which must reconstruct
    the exact decoded w*h (the clipping bookkeeping check), while
    n_tiles pins the ceil-grid fan-out."""
    media = MM.attach_ppm_payload(_docs(spark, sf_dir), "doc_id", "text")
    dec = MM.decode_media(media)
    tiles = MM.image_tiles(dec.select("media_id", "width", "height"), patch=4)
    return (
        tiles.groupBy("media_id")
        .agg(
            F.count("*").alias("n_tiles"),
            F.sum(F.col("tile_w").cast("bigint") * F.col("tile_h"))
            .cast("bigint")
            .alias("tile_area"),
        )
        .orderBy("media_id")
    )


MM_TILES_PPM_SQL = (
    _DIMS_CTE
    + """
SELECT media_id,
       CAST(((w + 3) // 4) * ((h + 3) // 4) AS BIGINT) AS n_tiles,
       CAST(w * h AS BIGINT) AS tile_area
FROM d
ORDER BY media_id
"""
)


# --- PQ training contract as driver-visible data -----------------------------
#
# Same pattern as kmeans_queries.kmeans_fit_invariants: the trained PQ
# path (ann_pq_topk) is rows-only in the driver gate because float
# Lloyd training is seed/iteration sensitive, but its CONTRACTS are
# deterministic booleans — per-subspace monotone descent, codebook
# shape, code range.  Compute the checks IN the engine, return
# (check_name, ok) rows, oracle = the trivial all-true VALUES table.

_PQ_CHECKS = (
    "pq_codebook_shape",
    "pq_codes_in_range",
    "pq_distortion_improves_on_init",
    "pq_one_more_step_non_increasing",
)
_PQ_M, _PQ_K, _PQ_DIM = 8, 16, 64


def pq_train_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certify the joint-Lloyd PQ trainer's contract end-to-end:

    - pq_codebook_shape: m x k_codes x (dim/m) books come back
    - pq_codes_in_range: every emitted code is in [0, k_codes)
    - pq_distortion_improves_on_init: total reconstruction distortion
      of the trained books <= the first-k init books' (monotone descent
      transitively, computed from scratch on the corpus both times)
    - pq_one_more_step_non_increasing: one extra recenter step composed
      from the PUBLIC ops (encode -> per-(j,code) means) does not
      increase distortion — Lloyd's guarantee holds across the
      train/encode operator boundary, per subspace jointly

    Scale shape: distortion is one exploded map + a scalar agg (the
    m-fold row fan-out carries dim/m-sized slices — same bytes as the
    input); the recenter is a (j, code)-keyed partial agg; driver state
    is the m x k x (dim/m) codebook."""
    from kmeans_mapreduce_spark.operators import similarity as SIM

    embs = (
        _embs(spark, sf_dir)
        .select(
            F.col("vec_id").alias("id"),
            F.col("embedding").cast("array<double>").alias("v"),
        )
        .cache()
    )
    sub = _PQ_DIM // _PQ_M
    try:
        first_rows = [
            list(r["v"]) for r in embs.orderBy("id").limit(_PQ_K).collect()
        ]
        init_books = [
            [first_rows[c][j * sub : (j + 1) * sub] for c in range(_PQ_K)]
            for j in range(_PQ_M)
        ]
        books = SIM.pq_train(
            embs, dim=_PQ_DIM, m=_PQ_M, k_codes=_PQ_K, max_iter=3, init="first"
        )

        # SHARED codebook plumbing (SIM.pq_books_df / pq_assign_expr /
        # pq_min_d2_expr): the verifier uses the trainer's own argmin
        # and broadcast layout definitions, so a tie-break or layout
        # change cannot silently certify a different rule
        exp = embs.select(
            "id",
            F.posexplode(
                F.array(
                    *[F.slice("v", j * sub + 1, sub) for j in range(_PQ_M)]
                )
            ).alias("j", "features"),
        ).cache()
        try:

            def _distortion(bks: list[list[list[float]]]) -> float:
                cent_df = SIM.pq_books_df(spark, bks)
                return float(
                    exp.crossJoin(F.broadcast(cent_df))
                    .agg(F.sum(SIM.pq_min_d2_expr()))
                    .collect()[0][0]
                )

            codes = SIM.pq_encode(embs, books).select(
                "id", F.explode(F.col("codes")).alias("code")
            )
            code_bounds = codes.agg(
                F.min("code").alias("lo"), F.max("code").alias("hi")
            ).collect()[0]

            # one extra recenter composed from public ops: re-assign via
            # encode semantics, then per-(j, code) means (empty keeps old)
            stats = (
                exp.crossJoin(F.broadcast(SIM.pq_books_df(spark, books)))
                .withColumn("code", SIM.pq_assign_expr())
                .groupBy("j", "code")
                .agg(
                    F.count("*").alias("n"),
                    *[
                        F.sum(F.col("features")[i]).alias(f"s{i}")
                        for i in range(sub)
                    ],
                )
                .collect()
            )
            nxt = [[list(c) for c in bk] for bk in books]
            for r in stats:
                nxt[r["j"]][r["code"]] = [
                    r[f"s{i}"] / r["n"] for i in range(sub)
                ]

            d_init, d_fit, d_next = (
                _distortion(init_books),
                _distortion(books),
                _distortion(nxt),
            )
        finally:
            exp.unpersist()

        ok = {
            "pq_codebook_shape": (
                len(books) == _PQ_M
                and all(len(bk) == _PQ_K for bk in books)
                and all(len(c) == sub for bk in books for c in bk)
            ),
            "pq_codes_in_range": (
                code_bounds["lo"] >= 0 and code_bounds["hi"] < _PQ_K
            ),
            "pq_distortion_improves_on_init": d_fit <= d_init * (1 + 1e-9),
            "pq_one_more_step_non_increasing": d_next <= d_fit * (1 + 1e-9),
        }
    finally:
        embs.unpersist()
    assert set(ok) == set(_PQ_CHECKS)
    return spark.createDataFrame(
        [(name, bool(ok[name])) for name in sorted(ok)],
        "check_name string, ok boolean",
    )


PQ_TRAIN_INVARIANTS_SQL = (
    "SELECT check_name, ok FROM (VALUES "
    + ", ".join(f"('{c}', true)" for c in sorted(_PQ_CHECKS))
    + ") t(check_name, ok) ORDER BY check_name"
)


# --- BPE training contract as driver-visible data ----------------------------

_BPE_CHECKS = (
    "bpe_encode_matches_train_fold",
    "bpe_freqs_non_increasing",
    "bpe_n_merges_trained",
    "bpe_selected_is_argmax",
    "bpe_token_count_strictly_decreases",
)
_BPE_N_MERGES = 8


def bpe_train_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certify the distributed BPE trainer's contract end-to-end — the
    last rows-only family (pipeline_bpe_train) gets its driver-visible
    contract query, completing the invariants trio with
    kmeans_fit_invariants and pq_train_invariants:

    - bpe_n_merges_trained: the corpus yields the full merge budget
    - bpe_selected_is_argmax: REPLAY the vocab fold from scratch and,
      at every round, independently recompute the top pair (freq desc,
      left asc, right asc) — it must equal the trained merge exactly
      (pair AND weighted frequency); this is the greedy-BPE selection
      rule certified per round, not just the final table's shape
    - bpe_freqs_non_increasing: merge frequencies never increase with
      rank (a theorem for BPE: a merge only lowers old pair counts and
      creates new pairs bounded by its own frequency)
    - bpe_encode_matches_train_fold: bpe_encode applied to the distinct
      words with the trained table reproduces the training loop's final
      symbol state word-for-word (the train/apply operator boundary)
    - bpe_token_count_strictly_decreases: the weighted symbol count
      drops every round (every selected merge fires at least once)

    Scale shape: every check runs on the DISTINCT-WORD frame (the
    corpus collapses once, same as training); each replay round is one
    pair-count partial agg + one fold projection with the training
    loop's own lineage truncation."""
    from kmeans_mapreduce_spark.operators import bpe as BPE

    merges, final_vocab = BPE.bpe_train(_docs(spark, sf_dir), n_merges=_BPE_N_MERGES)

    vocab = BPE.word_counts(_docs(spark, sf_dir), "text").withColumn(
        "symbols", BPE._chars(F.col("word"))
    )
    vocab = vocab.localCheckpoint(eager=True)
    argmax_ok, decrease_ok = True, True
    prev_tokens = vocab.agg(
        F.sum(F.col("wc") * F.size("symbols"))
    ).collect()[0][0]
    for m in merges:
        top = (
            BPE._pair_counts(vocab)
            .orderBy(F.desc("freq"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if (
            not top
            or (top[0]["left"], top[0]["right"], top[0]["freq"])
            != (m.left, m.right, m.freq)
        ):
            argmax_ok = False
            break
        vocab = vocab.withColumn(
            "symbols", BPE._apply_merge(F.col("symbols"), m.left, m.right)
        ).localCheckpoint(eager=True)
        cur_tokens = vocab.agg(
            F.sum(F.col("wc") * F.size("symbols"))
        ).collect()[0][0]
        if cur_tokens >= prev_tokens:
            decrease_ok = False
        prev_tokens = cur_tokens

    # default chunked checkpointing: nesting all 8 folds in one
    # projection costs super-linear Catalyst analysis (bpe.py docstring:
    # 13.5s -> 0.3s at sf0.1 when chunked every 4)
    enc = BPE.bpe_encode(final_vocab.select("word", "wc"), merges).select(
        "word", "pieces"
    )
    mismatches = (
        final_vocab.select("word", "symbols")
        .join(enc, "word")
        .where(F.col("symbols") != F.col("pieces"))
        .count()
    )

    ok = {
        "bpe_encode_matches_train_fold": mismatches == 0,
        "bpe_freqs_non_increasing": all(
            merges[i].freq >= merges[i + 1].freq
            for i in range(len(merges) - 1)
        ),
        "bpe_n_merges_trained": len(merges) == _BPE_N_MERGES,
        "bpe_selected_is_argmax": argmax_ok,
        "bpe_token_count_strictly_decreases": decrease_ok,
    }
    assert set(ok) == set(_BPE_CHECKS)
    return spark.createDataFrame(
        [(name, bool(ok[name])) for name in sorted(ok)],
        "check_name string, ok boolean",
    )


BPE_TRAIN_INVARIANTS_SQL = (
    "SELECT check_name, ok FROM (VALUES "
    + ", ".join(f"('{c}', true)" for c in sorted(_BPE_CHECKS))
    + ") t(check_name, ok) ORDER BY check_name"
)


# --- batch 26: hubness, session sensitivity, real-decode histogram ----------


def graph_knn_indegree_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubness audit of the corpus k-NN graph: the in-degree
    distribution (how many vectors chose each vector as a top-3
    neighbor), INCLUDING never-chosen vectors at in-degree 0.  High-
    hubness nodes distort ANN recall and embedding-based curation
    (hub docs get over-selected as "representatives"); anti-hubs are
    the candidates no dedup/selection pass ever sees — this histogram
    is the standard readout before trusting a k-NN graph downstream.

    Scale shape: one count-by-neighbor aggregate over the (bounded,
    N*k-row) edge frame, a left join back to the node set (both sides
    keyed on vec_id), and a |distinct-degrees|-row rollup."""
    from kmeans_mapreduce_spark.plans.pipeline_queries3 import (
        knn_graph_cells,
    )

    # pinned 4-cell fixture — the oracle re-derives the edge set from 4
    # cells (the operator's own default is ceil(sqrt(N)))
    g = knn_graph_cells(spark, sf_dir, k_cells=4)
    deg = g.groupBy(F.col("neighbor_id").alias("vec_id")).agg(
        F.count("*").alias("d")
    )
    nodes = _embs(spark, sf_dir).select("vec_id")
    prof = nodes.join(deg, "vec_id", "left").select(
        F.coalesce(F.col("d"), F.lit(0)).cast("int").alias("indegree")
    )
    return (
        prof.groupBy("indegree")
        .agg(F.count("*").cast("bigint").alias("n_nodes"))
        .orderBy("indegree")
    )


def _indegree_sql() -> str:
    from kmeans_mapreduce_spark.plans.pipeline_queries3 import KNN_GRAPH_SQL

    return f"""
WITH knn AS ({KNN_GRAPH_SQL}),
deg AS (SELECT neighbor_id AS vec_id, COUNT(*) AS d FROM knn GROUP BY neighbor_id),
prof AS (
  SELECT CAST(COALESCE(deg.d, 0) AS INT) AS indegree
  FROM embeddings e LEFT JOIN deg ON e.vec_id = deg.vec_id)
SELECT indegree, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM prof GROUP BY indegree ORDER BY indegree
"""


KNN_INDEGREE_SQL = _indegree_sql()

_SESSION_GAPS_S = (900, 1800, 3600)  # 15 min / 30 min / 60 min


def events_session_gap_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization sensitivity sweep: session counts under three
    inactivity-gap thresholds, from ONE window pass (the yield-curve
    pattern applied to sessionize).  Picking the gap is the perennial
    product-analytics knob; this emits the whole curve — sessions,
    events/session — so the choice is data-driven instead of folklore.

    Scale shape: the lag window is computed once (one user-keyed
    shuffle + sort); the threshold fan-out is a 3x explode over the
    already-tiny (user, gap) projection and the rollup is 3 rows.
    Integer microsecond arithmetic end-to-end — exact on both engines."""
    from kmeans_mapreduce_spark.plans.relational import _events
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    us = F.unix_micros("ts")
    gap = (us - F.lag(us).over(w)).alias("gap")
    fanned = ev.select(gap).select(
        "gap",
        F.explode(
            F.array(*[F.lit(s) for s in _SESSION_GAPS_S])
        ).alias("gap_s"),
    )
    # bigint before the scale-up: 3600 * 1_000_000 overflows int32
    # under ANSI mode
    new_session = F.when(
        F.col("gap").isNull()
        | (F.col("gap") > F.col("gap_s").cast("bigint") * F.lit(1_000_000)),
        1,
    ).otherwise(0)
    return (
        fanned.select("gap_s", new_session.alias("ns"))
        .groupBy("gap_s")
        .agg(
            F.sum("ns").cast("bigint").alias("n_sessions"),
            F.count("*").cast("bigint").alias("n_events"),
        )
        .select(
            (F.col("gap_s") / 60).cast("int").alias("gap_minutes"),
            "n_sessions",
            "n_events",
            F.round(
                F.col("n_events").cast("double") / F.col("n_sessions"), 6
            ).alias("events_per_session"),
        )
        .orderBy("gap_minutes")
    )


SESSION_GAP_SENSITIVITY_SQL = f"""
WITH lagged AS (
  SELECT user_id, ts, event_id,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS gap
  FROM events),
fanned AS (
  SELECT gap, g.gap_s
  FROM lagged CROSS JOIN (VALUES {", ".join(f"({s})" for s in _SESSION_GAPS_S)}) g(gap_s)),
rolled AS (
  SELECT gap_s,
         SUM(CASE WHEN gap IS NULL
                  OR gap > CAST(gap_s AS BIGINT) * 1000000
             THEN 1 ELSE 0 END) AS n_sessions,
         COUNT(*) AS n_events
  FROM fanned GROUP BY gap_s)
SELECT CAST(gap_s // 60 AS INT) AS gap_minutes,
       CAST(n_sessions AS BIGINT) AS n_sessions,
       CAST(n_events AS BIGINT) AS n_events,
       ROUND(CAST(n_events AS DOUBLE) / n_sessions, 6) AS events_per_session
FROM rolled
ORDER BY gap_minutes
"""


def mm_ppm_pixel_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide pixel-value histogram (16 buckets) over REAL decoded
    rasters — the aggregate face of the PPM codec: every payload's
    raster is parsed and binned inside the tasks (map-side combine:
    each Arrow batch ships 16 partial rows however many pixels it
    decoded), so the shuffle is 16 rows x partitions at ANY corpus
    size.  The oracle re-derives every bucket count from the
    generative pixel formula — a decode that dropped, duplicated or
    shifted one byte anywhere in the corpus moves a bucket count."""
    media = MM.attach_ppm_payload(_docs(spark, sf_dir), "doc_id", "text")
    return MM.ppm_pixel_histogram(media, n_buckets=16)


MM_PIXEL_HISTOGRAM_SQL = (
    _DIMS_CTE
    + """
SELECT CAST(((media_id * 7 + u.i) % 256) // 16 AS INT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_px
FROM d, UNNEST(range(0, 3 * w * h)) AS u(i)
GROUP BY 1
HAVING COUNT(*) > 0
ORDER BY bucket
"""
)


def mm_decode_pnm_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-format REAL decode: odd doc_ids carry grayscale P5 (PGM)
    payloads, even ones RGB P6 (PPM) — one frame drives BOTH real
    decoder arms of decode_media's per-row mime dispatch
    (operators/multimodal._REAL_STATS), so the dispatch itself is
    oracle-verified, not just each codec in isolation.  Reported
    per image: dispatched mime, parsed dims, total byte count
    (header + channel-dependent raster length), exact pixel sum and
    the first/last raster bytes — any arm decoding with the wrong
    channel count or header offset shifts these and breaks the hash."""
    media = MM.attach_pnm_mixed_payload(_docs(spark, sf_dir), "doc_id", "text")
    dec = MM.decode_media(media)
    return dec.select(
        "media_id",
        "mime",
        "width",
        "height",
        "n_bytes",
        (F.col("feature")[0] + F.col("feature")[1] + F.col("feature")[2])
        .cast("bigint")
        .alias("pix_sum"),
        F.col("feature")[3].cast("int").alias("first_px"),
        F.col("feature")[4].cast("int").alias("last_px"),
    )


MM_DECODE_PNM_MIXED_SQL = (
    _DIMS_CTE
    + """
, c AS (
  SELECT media_id, w, h,
         CASE WHEN media_id % 2 = 1 THEN 1 ELSE 3 END AS ch
  FROM d)
SELECT media_id,
       CASE WHEN ch = 1 THEN 'image/x-portable-graymap'
            ELSE 'image/x-portable-pixmap' END AS mime,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       -- 'P5\\n'/'P6\\n' + 'w h\\n' + '255\\n' + ch*w*h raster bytes
       CAST(9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR))
            + ch * w * h AS BIGINT) AS n_bytes,
       CAST(list_sum(list_transform(range(0, ch * w * h),
            i -> (media_id * 7 + i) % 256)) AS BIGINT) AS pix_sum,
       CAST((media_id * 7) % 256 AS INT) AS first_px,
       CAST((media_id * 7 + ch * w * h - 1) % 256 AS INT) AS last_px
FROM c
"""
)
