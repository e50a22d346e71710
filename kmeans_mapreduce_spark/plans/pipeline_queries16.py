"""Round-11 pipeline queries (batch 32): two more REAL codec arms
(PNG — the first COMPRESSED format, stdlib-zlib inflate + all five
scanline filters; AVI — the real VIDEO container, a nested RIFF LIST
walk), and the codebook axis of the ANN tuning-curve family.

- mm_png_decode_stats / mm_png_pixel_histogram: genuine PNG payloads
  (CRC-checked chunks, multi-IDAT, ancillary tEXt, per-row filter
  cycling) decoded by `operators/multimodal._decode_png`, under
  formula oracles — a filter-reconstruction or chunk-walk bug anywhere
  breaks the hash.
- mm_avi_frame_sample: real AVI 1.0 files (hdrl/strl headers, movi
  '00db' frames with genuine pad bytes, idx1) frame-sampled by the
  nested walk — the keyframe-extraction shape of video curation.
- ann_ivf_pq_codebook_sweep: recall@10 vs m (PQ subquantizer count)
  over the SHARED coarse quantizer — the axis the probe sweep's
  falling curve and the shortlist sweep's flattening tail both point
  at: once the probed cells are fixed, the next recall point must come
  from finer quantization, and this measures how much each doubling of
  m buys.

No analog in the reference (beyond-reference mandated surface); the
trained-IVF-PQ machinery reuses `pipeline_queries14._trained_ivfpq`'s
quantized one-step-Lloyd recipe (reference recenter contract,
master.go:579-600) so the DuckDB oracle replays training per m exactly.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.operators import multimodal as MM
from kmeans_mapreduce_spark.plans.pipeline_queries import _docs
from kmeans_mapreduce_spark.plans.pipeline_queries14 import (
    _IVFPQ_TRAINED_CTES,
    _RQ_CODES,
    _RQ_K,
    _RQ_NPROBE,
    _RQ_NQUERY,
    _brute_topk,
    _floor_means,
    _sub_d2_sql,
    _trained_ivfpq,
)

# --- the PNG real-codec arm ---------------------------------------------------

# shared synthesis-parameter CTE: dims reuse the netpbm grammar
# (_DIMS_CTE) with the PNG channel rule (odd media -> gray, even -> RGB)
_PNG_CTE = """
WITH m AS (
  SELECT CAST(doc_id AS BIGINT) AS media_id,
         octet_length(encode(text)) AS n
  FROM documents),
d AS (
  SELECT media_id, 4 + n % 13 AS w, 4 + (n // 13) % 11 AS h,
         CASE WHEN media_id % 2 = 1 THEN 1 ELSE 3 END AS ch
  FROM m)
"""


def mm_png_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-image decode end-to-end: synthesize genuine PNG
    payloads from the documents table (CRC'd chunks, a tEXt ancillary
    chunk the walk must skip, the DEFLATE stream split across 2 IDAT
    chunks for every third file, row r filtered with type r % 5), parse
    them with the pure-Python `_decode_png`, and report per file the
    parsed dims/channels (IHDR), the IDAT chunk count (concatenation is
    observed, not assumed), the sum of filter bytes read from the
    inflated stream (stride-sensitive), and the exact reconstructed
    pixel sum + first/last byte (filter-reconstruction-sensitive).  The
    oracle re-derives every column from the generative formula — the
    compressed bytes never need to match, the RECONSTRUCTION does,
    which is precisely what certifies inflate + unfilter.

    Scale shape: synthesis and decode+stats are chained mapInPandas
    stages in one task pipeline (no shuffle) — the fetch -> decode ->
    per-file-stats pattern with a genuinely compressed codec at the
    decode boundary."""
    media = MM.attach_png_payload(_docs(spark, sf_dir), "doc_id", "text")
    return MM.png_decode_stats(media).orderBy("media_id")


MM_PNG_DECODE_STATS_SQL = (
    _PNG_CTE
    + """
SELECT media_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(ch AS INT) AS channels,
       CAST(CASE WHEN media_id % 3 = 0 THEN 2 ELSE 1 END AS INT) AS n_idat,
       CAST(list_sum(list_transform(range(0, h), r -> r % 5))
         AS BIGINT) AS filter_sum,
       CAST(list_sum(list_transform(range(0, ch * w * h),
                                    i -> (media_id * 7 + i) % 256))
         AS BIGINT) AS px_sum,
       CAST((media_id * 7) % 256 AS INT) AS first_px,
       CAST((media_id * 7 + ch * w * h - 1) % 256 AS INT) AS last_px
FROM d
ORDER BY media_id
"""
)


def mm_png_pixel_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide 16-bucket pixel histogram over RECONSTRUCTED PNG
    rasters — the aggregate face of the compressed arm: every payload
    is inflated and unfiltered inside the tasks, and the per-batch
    partial histograms keep the shuffle at 16 rows per batch at ANY
    corpus size (the same map-side-combine contract as the netpbm
    histograms, now downstream of a real decompressor)."""
    media = MM.attach_png_payload(_docs(spark, sf_dir), "doc_id", "text")
    return MM.ppm_pixel_histogram(media, n_buckets=16)


MM_PNG_PIXEL_HISTOGRAM_SQL = (
    _PNG_CTE
    + """
SELECT CAST(((media_id * 7 + u.i) % 256) // 16 AS INT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_px
FROM d, UNNEST(range(0, ch * w * h)) AS u(i)
GROUP BY 1
HAVING COUNT(*) > 0
ORDER BY bucket
"""
)


# --- the AVI real-video-container arm ----------------------------------------

_AVI_CTE = """
WITH m AS (
  SELECT CAST(doc_id AS BIGINT) AS media_id,
         octet_length(encode(text)) AS n
  FROM documents),
d AS (
  SELECT media_id, 3 + n % 6 AS w, 3 + (n // 6) % 5 AS h,
         4 + media_id % 5 AS nf
  FROM m)
"""

# frame f's pixel j of media m — the generative formula both engines
# recompute
_AVI_PX = "(({m}) * 5 + ({f}) * 17 + ({j}) * 3) % 256"


def mm_avi_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container decode + keyframe sampling: synthesize
    spec-shaped AVI 1.0 files (nested hdrl/strl/movi LISTs, odd-sized
    '00db' frames exercising the pad rule between frames, idx1
    cross-checked against the frame count), parse them with the nested
    RIFF walk, keep every 2nd frame, and report exact per-frame stats.
    The oracle replays the per-frame pixel formula — a walk
    misalignment in ANY of the three nesting levels either trips a
    decoder validation or shifts a frame boundary and breaks the hash.

    Scale shape: decode + sampling + stats in ONE mapInPandas stage;
    fan-out bounded by n_frames/stride per file, parallelizing
    per-frame work downstream — the video sibling of
    `wav_window_energy`'s decode -> frame -> feature pipeline."""
    media = MM.attach_avi_payload(_docs(spark, sf_dir), "doc_id", "text")
    return MM.avi_frame_sample(media, stride=2).orderBy(
        "media_id", "frame_idx"
    )


MM_AVI_FRAME_SAMPLE_SQL = (
    _AVI_CTE
    + f"""
SELECT media_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(nf AS INT) AS n_frames,
       CAST(u.f AS INT) AS frame_idx,
       CAST(list_sum(list_transform(range(0, w * h),
            j -> {_AVI_PX.format(m='media_id', f='u.f', j='j')}))
         AS BIGINT) AS f_sum,
       CAST(list_min(list_transform(range(0, w * h),
            j -> {_AVI_PX.format(m='media_id', f='u.f', j='j')}))
         AS INT) AS f_min,
       CAST(list_max(list_transform(range(0, w * h),
            j -> {_AVI_PX.format(m='media_id', f='u.f', j='j')}))
         AS INT) AS f_max
FROM d, UNNEST(range(0, nf)) AS u(f)
WHERE u.f % 2 = 0
ORDER BY media_id, frame_idx
"""
)


# --- the codebook axis of the ANN tuning-curve family -------------------------

# subquantizer counts the sweep traces; 8 is the production knob
# (_RQ_M), so the calibrated point stays on the curve.  All divide the
# 64-dim vectors evenly.
_CB_LEVELS = (2, 4, 8, 16)

# per-(corpus, m) trained codebooks — the sweep's non-default m's train
# once per process, same rationale as pipeline_queries14._TRAIN_MEMO
_CB_MEMO: dict[tuple[str, int], list] = {}

# The trained-calibration family is FROZEN AT FIVE queries (round-11
# VERDICT watch item: "five is the right place to stop: the four axes
# are complete").  Each member retrains the IVF-PQ index AND the brute
# ground truth inside a vanilla oracle session — that rebuild is BY
# DESIGN (DuckDB must replay training), and _TRAIN_MEMO/_CB_MEMO
# already share it within a process, but the cost is real: ~100 s
# combined build at sf0.001 (PLAN_INVENTORY.md records the measured
# per-round total; budget for the family is ~120 s).  Before ANY sixth
# trained-index query joins this family, land a shared-prefix plan
# first: one `_trained_ivfpq` product (coarse centroids + probe lists
# + codebooks + brute top-k) built once per gate run and consumed by
# every sweep.  tests/test_contract.py pins the membership — a new
# ann_* calibration query fails there until this comment's plan exists.
TRAINED_CALIBRATION_FAMILY = frozenset(
    {
        "ann_ivf_pq_recall",          # the headline recall@10 readout
        "ann_ivf_pq_probe_sweep",     # n_probe axis
        "ann_ivf_pq_rerank_recall",   # exact-rerank axis
        "ann_rerank_shortlist_sweep", # shortlist-size axis
        "ann_ivf_pq_codebook_sweep",  # codebook-count (m) axis
    }
)


def _train_books_m(e: DataFrame, sf_dir: str, m: int) -> list:
    """Codebook training for an arbitrary subquantizer count — the
    codebook step of `pipeline_queries14._train_on` with sub = 64/m:
    seeds are the first-16 vectors' slices, one quantized Lloyd step
    (floor(mean) recenter over the integer-scaled vectors, empty
    (j, code) keeps its seed slice — the reference keep-old rule,
    master.go:594-599).  Deterministic per (corpus, m), so memoized."""
    key = (sf_dir, m)
    if key in _CB_MEMO:
        return _CB_MEMO[key]
    from kmeans_mapreduce_spark.operators import similarity as SIM

    sub = 64 // m
    head = [
        list(r["v"])
        for r in e.where(F.col("vec_id") < _RQ_CODES)
        .orderBy("vec_id")
        .collect()
    ]
    assert len(head) == _RQ_CODES
    books0 = [
        [head[c][j * sub : (j + 1) * sub] for c in range(_RQ_CODES)]
        for j in range(m)
    ]
    enc0 = e.select(
        "v", F.posexplode(SIM._pq_codes_expr("v", books0)).alias("j", "code")
    ).select(
        "j",
        "code",
        F.posexplode(
            F.slice(F.col("v"), F.col("j") * sub + 1, sub)
        ).alias("i", "x"),
    )
    books = [[list(cw) for cw in bj] for bj in books0]
    for r in _floor_means(enc0, ["j", "code"], "i", "x").collect():
        books[r["j"]][r["code"]][r["i"]] = r["c"]
    _CB_MEMO[key] = books
    return books


def ann_ivf_pq_codebook_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The codebook tuning curve — the fourth axis of the ANN
    calibration family (n_probe / banding / shortlist / CODEBOOKS):
    recall@10 at the fixed production probes (n_probe=4) for
    m in 2/4/8/16 subquantizers, every leg sharing the SAME trained
    coarse quantizer, probe lists and brute ground truth; only the
    codebooks retrain per m (16 codewords over 64/m-dim slices, the
    quantized one-step Lloyd).  This measures the axis the other two
    curves point at: the probe sweep's falling recall and the shortlist
    sweep's flattening tail both say this corpus is QUANTIZATION
    limited at m=8 — the curve prices what each doubling of m (2x code
    bytes, 2x LUT work) actually buys in recall.

    Reading the curve on this corpus (sf0.01): recall@10 climbs
    0.244 (m=2) -> 0.264 (4) -> 0.312 (8) -> 0.390 (16), the gain per
    doubling itself GROWING (+0.02/+0.05/+0.08) with no knee yet —
    confirming the quantization-limited diagnosis: at fixed probes,
    spend on codebooks keeps paying past the production knob.  But
    even m=16 (0.390) buys barely half of what exact re-ranking the
    m=8 shortlist buys (0.638 at shortlist 50) for ~2x the code bytes
    and LUT work — which is why the production stack pairs m=8 with
    rerank instead of growing m, and this curve is the number that
    justifies it.

    Scale shape: one corpus encode pass + one codes-only ADC scan per
    level (both code tables and LUTs are m x 16 driver broadcasts); the
    brute leg is the family's shared bounded O(Q*N) ground truth.  All
    arithmetic integer-exact, so the oracle replays every leg including
    its training."""
    e, cents, books8, qs = _trained_ivfpq(spark, sf_dir)
    try:
        from kmeans_mapreduce_spark.operators import similarity as SIM

        qdf = spark.createDataFrame(qs, "query_id long, qv array<double>")
        brute = _brute_topk(e, qdf).select("query_id", "neighbor_id")
        legs = []
        for m in _CB_LEVELS:
            books = books8 if m == 8 else _train_books_m(e, sf_dir, m)
            top = SIM.ivf_pq_topk(
                e, cents, books, qs,
                k=_RQ_K, n_probe=_RQ_NPROBE,
                id_col="vec_id", vec_col="v",
            )
            legs.append(
                top.join(brute, ["query_id", "neighbor_id"])
                .agg(F.count("*").alias("hits"))
                .select(F.lit(m).alias("m"), "hits")
            )
        allh = reduce(DataFrame.unionByName, legs)
        levels = spark.createDataFrame([(m,) for m in _CB_LEVELS], "m int")
        out = (
            levels.join(allh, "m", "left")
            .select(
                "m",
                (F.lit(64) / F.col("m")).cast("int").alias("sub_dim"),
                F.round(
                    F.coalesce(F.col("hits"), F.lit(0)).cast("double")
                    / F.lit(float(_RQ_NQUERY * _RQ_K)),
                    6,
                ).alias("mean_recall"),
            )
            .orderBy("m")
            .localCheckpoint(eager=True)
        )
        return out
    finally:
        e.unpersist()


def _cb_slice_d2(a: str, b: str, j: str, sub: int) -> str:
    """d2 between the j-th sub-dim slices of two full vectors — the
    per-m generalization of pipeline_queries13._ipq_sub_d2_sql."""
    return " + ".join(
        f"({a}[{j}*{sub}+{i}] - {b}[{j}*{sub}+{i}])"
        f" * ({a}[{j}*{sub}+{i}] - {b}[{j}*{sub}+{i}])"
        for i in range(1, sub + 1)
    )


def _cb_leg_sql(m: int) -> str:
    """Per-m oracle leg: codebook training (for m != 8 — the m=8 leg IS
    the shared prefix's books/codes/lut), corpus codes, per-query LUTs,
    ADC scan over the shared candidate set, top-k, hit count."""
    if m == 8:
        codes_n, lut_n = "codes", "lut"
        train = ""
    else:
        sub = 64 // m
        codes_n, lut_n = f"codes_m{m}", f"lut_m{m}"
        train = f""",
sub_m{m} AS (SELECT unnest(range({m})) AS j),
enc0_m{m} AS (
  SELECT e.id, sb.j, p.code, {_cb_slice_d2('e.v', 'p.v', 'sb.j', sub)} AS d2
  FROM e CROSS JOIN sub_m{m} sb CROSS JOIN pseeds p),
code0_m{m} AS (
  SELECT id, j, code FROM (
    SELECT id, j, code,
           ROW_NUMBER() OVER (PARTITION BY id, j
                              ORDER BY d2 ASC, code ASC) AS rn
    FROM enc0_m{m}) WHERE rn = 1),
brec_m{m} AS (
  SELECT c.j, c.code, u.i, FLOOR(SUM(e.v[c.j*{sub} + u.i]) / COUNT(*)) AS cw
  FROM code0_m{m} c JOIN e ON e.id = c.id, UNNEST(range(1, {sub + 1})) AS u(i)
  GROUP BY c.j, c.code, u.i),
bagg_m{m} AS (SELECT j, code, list(cw ORDER BY i) AS cw FROM brec_m{m}
              GROUP BY j, code),
books_m{m} AS MATERIALIZED (
  SELECT sb.j, p.code,
         COALESCE(g.cw, list_transform(range(1, {sub + 1}),
                                       i -> p.v[sb.j*{sub} + i])) AS cw
  FROM sub_m{m} sb CROSS JOIN pseeds p
  LEFT JOIN bagg_m{m} g ON g.j = sb.j AND g.code = p.code),
enc_m{m} AS (
  SELECT e.id, b.j, b.code, {_sub_d2_sql('e.v', 'b.cw', sub=sub)} AS d2
  FROM e CROSS JOIN books_m{m} b),
codes_m{m} AS MATERIALIZED (
  SELECT id, j, code FROM (
    SELECT id, j, code,
           ROW_NUMBER() OVER (PARTITION BY id, j
                              ORDER BY d2 ASC, code ASC) AS rn
    FROM enc_m{m}) WHERE rn = 1),
lut_m{m} AS (
  SELECT q.id AS query_id, b.j, b.code, {_sub_d2_sql('q.v', 'b.cw', sub=sub)} AS d2
  FROM e q CROSS JOIN books_m{m} b WHERE q.id < {_RQ_NQUERY})"""
    return train + f""",
adc_m{m} AS (
  SELECT cand.query_id, cand.neighbor_id, SUM(l.d2) AS approx_d2
  FROM cand
  JOIN {codes_n} c ON c.id = cand.neighbor_id
  JOIN {lut_n} l ON l.query_id = cand.query_id
                AND l.j = c.j AND l.code = c.code
  GROUP BY cand.query_id, cand.neighbor_id),
top_m{m} AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY approx_d2 ASC, neighbor_id ASC) AS rank
    FROM adc_m{m}) WHERE rank <= {_RQ_K}),
hits_m{m} AS (
  SELECT {m} AS m, COUNT(*) AS hits
  FROM top_m{m} t JOIN brute b
    ON b.query_id = t.query_id AND b.neighbor_id = t.neighbor_id)"""


ANN_IVF_PQ_CODEBOOK_SWEEP_SQL = (
    _IVFPQ_TRAINED_CTES
    + f""",
qcell AS (SELECT id, cell FROM qcellr WHERE probe_rank <= {_RQ_NPROBE}),
cand AS MATERIALIZED (
  SELECT q.id AS query_id, c.id AS neighbor_id
  FROM qcell q JOIN cell c ON q.cell = c.cell AND q.id != c.id)"""
    + "".join(_cb_leg_sql(m) for m in _CB_LEVELS)
    + f"""
SELECT CAST(l.m AS INT) AS m,
       CAST(64 // l.m AS INT) AS sub_dim,
       ROUND(CAST(COALESCE(h.hits, 0) AS DOUBLE)
             / {_RQ_NQUERY * _RQ_K}, 6) AS mean_recall
FROM (VALUES {", ".join(f"({m})" for m in _CB_LEVELS)}) l(m)
LEFT JOIN ({" UNION ALL ".join(f"SELECT * FROM hits_m{m}" for m in _CB_LEVELS)}) h
  ON h.m = l.m
ORDER BY m
"""
)


# --- the GIF real-codec arm (hand-rolled LZW) ---------------------------------


def mm_gif_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The second compressed codec arm, with the decompressor itself
    HAND-ROLLED: genuine GIF89a payloads (16-color grayscale palette,
    a Comment Extension the block walk must skip, LZW data in
    sub-block chains) decoded end-to-end by `_decode_gif` — variable
    width codes read LSB-first, width growing at each table-capacity
    boundary (GIF's rule, not TIFF's early-change), the KwKwK case,
    and the 4096-entry freeze.  PNG outsources DEFLATE to stdlib zlib;
    here every bit of the entropy coding is our own, pinned to the
    spec by hand-packed fixtures in tests/test_pipeline16.py.

    Reported per file: parsed dims, the decoded palette-index sum
    (pure LZW output), the palette-MAPPED gray sum (a GIF pixel IS a
    lookup), first/last mapped pixel.  The oracle replays the
    generative index formula (index i = (media_id*7 + i) % 16, gray =
    17 * index) — one wrong code width anywhere shifts every later
    code and breaks the hash.

    Scale shape: synthesis and decode+stats are chained mapInPandas
    stages in one task pipeline, no shuffle."""
    media = MM.attach_gif_payload(_docs(spark, sf_dir), "doc_id", "text")
    return MM.gif_decode_stats(media).orderBy("media_id")


MM_GIF_DECODE_STATS_SQL = (
    _PNG_CTE  # same dims grammar; the ch column is simply unused here
    + """
SELECT media_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(list_sum(list_transform(range(0, w * h),
                                    i -> (media_id * 7 + i) % 16))
         AS BIGINT) AS idx_sum,
       CAST(17 * list_sum(list_transform(range(0, w * h),
                                         i -> (media_id * 7 + i) % 16))
         AS BIGINT) AS px_sum,
       CAST(17 * ((media_id * 7) % 16) AS INT) AS first_px,
       CAST(17 * ((media_id * 7 + w * h - 1) % 16) AS INT) AS last_px
FROM d
ORDER BY media_id
"""
)


def mm_resize_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decode -> nearest-neighbor resize over the COMPRESSED arm: the
    thumb is cut from the RECONSTRUCTED raster (inflate + all five
    filters undone), channel-dispatched exactly like the netpbm path.
    The payload formula (dims grammar, odd=gray/even=RGB, pixel byte
    (media_id*7 + i) % 256) matches attach_pnm_mixed_payload's, so the
    ORACLE IS THE SAME SQL as mm_resize_pnm_mixed — the same expected
    thumbs must emerge through a completely different real decoder,
    which is precisely the cross-codec certificate."""
    media = MM.attach_png_payload(_docs(spark, sf_dir), "doc_id", "text")
    res = MM.resize_media(media, max_side=8)
    return res.select(
        "media_id",
        "width",
        "height",
        "thumb_width",
        "thumb_height",
        F.col("thumb_feature")[0].cast("bigint").alias("thumb_c0"),
        F.col("thumb_feature")[3].cast("bigint").alias("thumb_sum"),
    )


# same generative formula and channel rule as the PNM-mixed resize —
# only the decoder differs, which is the point
from kmeans_mapreduce_spark.plans.pipeline_queries14 import (  # noqa: E402
    MM_RESIZE_PNM_MIXED_SQL as MM_RESIZE_PNG_SQL,
)
