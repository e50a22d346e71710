"""Round-9 pipeline queries (batch 27): composed ANN indexing and
estimator-quality audits.

- ann_ivf_pq_topk: IVF cell pruning COMPOSED with PQ ADC scoring — the
  FAISS IndexIVFPQ production layout over fixed (SQL-expressible)
  parameters, so the full composed path carries an exact oracle where
  ann_ivf_topk and ann_pq_fixed_topk each pinned only one half.
- dedup_minhash_calibration: how good is the MinHash Jaccard ESTIMATE
  that LSH banding acts on?  Per matching-component count, the mean
  true Jaccard and mean absolute estimator error over banded candidate
  pairs — the calibration readout a production dedup pipeline checks
  before trusting a threshold.  Uses the md5-derived portable hash
  family (operators/dedup.portable_hash60) so BOTH engines compute the
  identical signatures.
- mm_pnm_mixed_histogram: the corpus pixel histogram over MIXED P5/P6
  payloads — the aggregate face of the real-codec dispatch (both
  decoder arms contribute partial histograms inside one mapInPandas).

No analog in the reference (beyond-reference mandated surface); the
IVF machinery deliberately reuses the reference's K-Means assignment
semantics (worker.go:288-304) as index infrastructure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.operators import dedup as DD
from kmeans_mapreduce_spark.operators import multimodal as MM
from kmeans_mapreduce_spark.plans.pipeline_queries import (
    _JACCARD_CTE,
    _docs,
    _embs,
    _ivf_d2_sql,
)
from kmeans_mapreduce_spark.plans.pipeline_queries12 import _DIMS_CTE


# --- IVF-PQ composed ANN ---------------------------------------------------

def ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ top-k with an exact DuckDB oracle: 4 coarse cells
    (first-4 vectors), n_probe=2, PQ codes from fixed codebooks (first
    16 vectors' 8-dim slices), ADC scoring inside the probed cells
    only, top-5 per query by approximate distance.

    Exactness: vectors are integer-scaled (floor(x*1000)) first — the
    ann_pq_fixed_topk trick — so cell argmins, code argmins, LUT sums
    and rank ties are bit-identical across engines.  This certifies the
    COMPOSITION (prune -> compressed scan -> rank): a correct IVF with
    a correct PQ can still disagree with ground truth here if the
    pruning is applied after scoring, the self-exclusion happens in the
    wrong layer, or the LUT join drops candidates in unprobed bands."""
    from kmeans_mapreduce_spark.operators import similarity as SIM

    e = _embs(spark, sf_dir).select(
        F.col("vec_id").alias("id"),
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.floor(x * 1000).cast("double"),
        ).alias("v"),
    )
    head = e.where(F.col("id") < 16).orderBy("id").collect()
    assert len(head) == 16, "need >= 16 corpus vectors for codewords"
    cents = [list(r["v"]) for r in head[:4]]
    books = [
        [list(r["v"])[j * 8 : (j + 1) * 8] for r in head] for j in range(8)
    ]
    qs = [(r["id"], list(r["v"])) for r in head[:5]]
    return SIM.ivf_pq_topk(e, cents, books, qs, k=5, n_probe=2)


def _ipq_sub_d2_sql(a: str, b: str, j: str = "sub.j") -> str:
    return " + ".join(
        f"({a}[{j}*8+{i}] - {b}[{j}*8+{i}]) * ({a}[{j}*8+{i}] - {b}[{j}*8+{i}])"
        for i in range(1, 9)
    )


ANN_IVF_PQ_SQL = f"""
WITH e AS (
  SELECT vec_id AS id,
         list_transform(embedding::DOUBLE[], x -> FLOOR(x*1000)) AS v
  FROM embeddings),
coarse AS (SELECT id AS ccid, v AS cv FROM e WHERE id < 4),
celld AS (SELECT e.id, coarse.ccid, {_ivf_d2_sql('e.v', 'coarse.cv')} AS d2
          FROM e CROSS JOIN coarse),
cell AS (  -- corpus rows: nearest cell, lowest id on ties
  SELECT id, ccid AS cell FROM (
    SELECT id, ccid,
           ROW_NUMBER() OVER (PARTITION BY id ORDER BY d2 ASC, ccid ASC) AS rn
    FROM celld) WHERE rn = 1),
qcell AS (  -- query rows: 2 nearest cells
  SELECT id, ccid AS cell FROM (
    SELECT id, ccid,
           ROW_NUMBER() OVER (PARTITION BY id ORDER BY d2 ASC, ccid ASC) AS rn
    FROM celld WHERE id < 5) WHERE rn <= 2),
cents AS (SELECT id AS cid, v FROM e WHERE id < 16),
sub AS (SELECT unnest(range(8)) AS j),
enc AS (
  SELECT e.id, sub.j, c.cid, {_ipq_sub_d2_sql('e.v', 'c.v')} AS d2
  FROM e CROSS JOIN sub CROSS JOIN cents c),
codes AS (  -- argmin codeword, lowest cid on ties (= Spark first-min)
  SELECT id, j, cid AS code FROM (
    SELECT id, j, cid,
           ROW_NUMBER() OVER (PARTITION BY id, j ORDER BY d2 ASC, cid ASC) AS rn
    FROM enc) WHERE rn = 1),
lut AS (
  SELECT q.id AS query_id, sub.j, c.cid AS code,
         {_ipq_sub_d2_sql('q.v', 'c.v')} AS d2
  FROM e q CROSS JOIN sub CROSS JOIN cents c
  WHERE q.id < 5),
cand AS (
  SELECT q.id AS query_id, c.id AS neighbor_id
  FROM qcell q JOIN cell c ON q.cell = c.cell AND q.id != c.id),
scored AS (
  SELECT cand.query_id, cand.neighbor_id, ROUND(SUM(lut.d2), 6) AS approx_d2
  FROM cand
  JOIN codes ON codes.id = cand.neighbor_id
  JOIN lut ON lut.query_id = cand.query_id
          AND lut.j = codes.j AND lut.code = codes.code
  GROUP BY cand.query_id, cand.neighbor_id)
SELECT query_id, rank, neighbor_id, approx_d2 FROM (
  SELECT query_id, neighbor_id, approx_d2,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY approx_d2 ASC, neighbor_id ASC) AS rank
  FROM scored)
WHERE rank <= 5
"""


# --- MinHash estimator calibration ----------------------------------------

_CAL_PERMS = 16
# 2-row bands are the AUDIT's sensitivity knob, not a production dedup
# setting: shallow bands admit moderate-similarity candidates on
# purpose (1,455 pairs vs 25 at the production 4-row depth on the
# sf0.01 corpus), so the error curve is traced across the est range
# instead of only at the near-duplicate end.  Production banding for
# DEDUP stays >= 4 rows (operators/dedup.MINHASH_BANDS).
_CAL_BANDS = 8  # 2 rows/band


def portable_minhash_sigs(sh: DataFrame, n_perms: int = _CAL_PERMS) -> DataFrame:
    """[id, sig: array<bigint>] — MinHash signatures from the portable
    md5-derived hash family (DD.portable_hash60), so DuckDB recomputes
    IDENTICAL components.  Shared by the calibration and band-sweep
    audits; one narrow pass over stored shingle arrays."""

    def _component(p: int):
        # single-arg closure, NOT `lambda s, p=p`: F.transform treats a
        # two-parameter lambda as (element, index) and would bind p to
        # the array-index Column, silently hashing a stringified Column
        prefix = f"{p}:"
        return lambda s: DD.portable_hash60(F.concat(F.lit(prefix), s))

    sig_expr = F.array(
        *[
            F.array_min(F.transform(F.col("sh"), _component(p)))
            for p in range(n_perms)
        ]
    )
    return sh.select("id", sig_expr.alias("sig"))


def dedup_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash Jaccard-estimator calibration over banded candidates:
    for every LSH candidate pair (shallow 8x2 banding — see _CAL_BANDS:
    the audit deliberately admits moderate-similarity pairs), est =
    (matching signature components) / 16 vs the EXACT bigram-shingle
    Jaccard; reported per matching-component count: pair count, mean
    true Jaccard, and mean |est - true| — the estimator-variance
    readout that justifies (or indicts) a production dedup threshold.

    Portable hash family: component p of a doc's signature is
    min over shingles s of portable_hash60(p || ':' || s), so DuckDB
    recomputes the IDENTICAL signatures (xxhash64, Spark's usual
    MinHash hash, has no DuckDB twin — the md5-derived family is the
    cross-engine contract, same as SimHash).

    Scale shape: signatures are one narrow pass over stored shingle
    arrays (two cache barriers, same as minhash_lsh_candidates);
    candidates come from the banded equi self-join (never all-pairs);
    the exact-Jaccard verification touches candidates only; the output
    is a <=17-row rollup.  Decimal-summed means: double addition is
    shuffle-order dependent, decimal is exact and commutative."""
    sh = DD._shingle_frame(_docs(spark, sf_dir), "doc_id", "text", n=2)
    rows = _CAL_PERMS // _CAL_BANDS
    sig = portable_minhash_sigs(sh).cache()
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.col("sig")[b * rows + r].cast("string")
                                for r in range(rows)
                            ],
                        ).alias("key"),
                    )
                    for b in range(_CAL_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("id", "bk.band", "bk.key")
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    n_match = F.size(
        F.filter(
            F.zip_with(F.col("siga"), F.col("sigb"), lambda x, y: x == y),
            lambda m: m,
        )
    )
    jac = F.round(
        F.size(F.array_intersect(F.col("sa"), F.col("sb"))).cast("double")
        / F.size(F.array_union(F.col("sa"), F.col("sb"))).cast("double"),
        6,
    )
    scored = (
        cands.join(sig.withColumnsRenamed({"id": "id_a", "sig": "siga"}), "id_a")
        .join(sig.withColumnsRenamed({"id": "id_b", "sig": "sigb"}), "id_b")
        .join(sh.withColumnsRenamed({"id": "id_a", "sh": "sa"}), "id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "sh": "sb"}), "id_b")
        .select(n_match.alias("n_match"), jac.alias("jaccard"))
    )
    dec = "decimal(38,18)"
    return (
        scored.groupBy("n_match")
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(
                F.sum(F.col("jaccard").cast(dec)).cast("double")
                / F.count("*"),
                6,
            ).alias("mean_jaccard"),
            F.round(
                F.sum(
                    F.abs(
                        F.col("n_match") / F.lit(16.0) - F.col("jaccard")
                    ).cast(dec)
                ).cast("double")
                / F.count("*"),
                6,
            ).alias("mean_abs_err"),
        )
        .orderBy("n_match")
    )


# shared portable-signature CTEs (need `s` from _JACCARD_CTE in scope);
# sigs is MATERIALIZED — it is referenced several times downstream and
# DuckDB would otherwise inline (recompute) it per reference
PORTABLE_SIGS_CTE = """,
h AS (
  SELECT s.doc_id, pp.p,
         MIN(('0x' || substr(md5(CAST(pp.p AS VARCHAR) || ':' || u.tok), 1, 15))::BIGINT) AS mh
  FROM s, UNNEST(s.sh) AS u(tok), UNNEST(range(16)) AS pp(p)
  GROUP BY s.doc_id, pp.p),
sigs AS MATERIALIZED (
  SELECT doc_id, list(mh ORDER BY p) AS sig FROM h GROUP BY doc_id)"""


MINHASH_CALIBRATION_SQL = (
    _JACCARD_CTE
    + PORTABLE_SIGS_CTE
    + """,
bands AS (
  SELECT doc_id, bb.b,
         CAST(sig[bb.b*2+1] AS VARCHAR) || ',' || CAST(sig[bb.b*2+2] AS VARCHAR) AS key
  FROM sigs, UNNEST(range(8)) AS bb(b)),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id),
est AS (
  SELECT c.id_a, c.id_b,
         len(list_filter(range(16), p -> sa.sig[p+1] = sb.sig[p+1])) AS n_match
  FROM cand c
  JOIN sigs sa ON sa.doc_id = c.id_a
  JOIN sigs sb ON sb.doc_id = c.id_b),
joined AS (
  SELECT est.n_match, pairs.jaccard
  FROM est JOIN pairs ON pairs.id_a = est.id_a AND pairs.id_b = est.id_b)
SELECT CAST(n_match AS INT) AS n_match,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(CAST(SUM(CAST(jaccard AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*), 6) AS mean_jaccard,
       ROUND(CAST(SUM(CAST(ABS(n_match/16.0 - jaccard) AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*), 6) AS mean_abs_err
FROM joined
GROUP BY n_match
ORDER BY n_match
"""
)


# --- mixed-mime pixel histogram -------------------------------------------

def mm_pnm_mixed_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus pixel histogram over MIXED P5/P6 payloads: both real
    decoder arms contribute raster bytes to the same 16-bucket partial
    histograms inside one mapInPandas pass (map-side combine — the
    shuffle stays 16 rows x partitions at any corpus size).  The
    oracle re-derives every bucket from the generative formula with the
    channel factor switching on media_id parity — a dispatch bug that
    sent P5 payloads through the 3-channel path (or vice versa) moves
    bucket counts."""
    media = MM.attach_pnm_mixed_payload(_docs(spark, sf_dir), "doc_id", "text")
    return MM.ppm_pixel_histogram(media, n_buckets=16)


MM_PNM_MIXED_HISTOGRAM_SQL = (
    _DIMS_CTE
    + """
, c AS (
  SELECT media_id, w, h,
         CASE WHEN media_id % 2 = 1 THEN 1 ELSE 3 END AS ch
  FROM d)
SELECT CAST(((media_id * 7 + u.i) % 256) // 16 AS INT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_px
FROM c, UNNEST(range(0, ch * w * h)) AS u(i)
GROUP BY 1
HAVING COUNT(*) > 0
ORDER BY bucket
"""
)


# --- P4 bitmap decode -------------------------------------------------------

def mm_decode_pbm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL 1-bit bitmap decode: genuine P4 payloads (packed rows,
    byte-aligned padding) parsed by the shared netpbm scanner, with the
    set-bit count taken over the TRUE w x h grid — the oracle
    recomputes it with an explicit per-byte row-tail mask, so counting
    the padding bits (the classic P4 bug) or mis-sizing ceil(w/8) rows
    breaks the hash.  Byte-level probes (first/last raster byte) pin
    the raster offset exactly like the P5/P6 queries."""
    media = MM.attach_pbm_payload(_docs(spark, sf_dir), "doc_id", "text")
    dec = MM.decode_media(media)
    return dec.select(
        "media_id",
        "width",
        "height",
        "n_bytes",
        F.col("feature")[0].cast("bigint").alias("set_bits"),
        F.col("feature")[3].cast("int").alias("first_byte"),
        F.col("feature")[4].cast("int").alias("last_byte"),
    )


_POPCOUNT = " + ".join(f"((m >> {b}) & 1)" for b in range(8))

MM_DECODE_PBM_SQL = (
    _DIMS_CTE
    + """
, p AS (
  SELECT media_id, w, h, (w + 7) // 8 AS bpr, w % 8 AS rem FROM d),
bts AS (  -- one row per packed raster byte, row-tail padding masked
  SELECT p.media_id,
         ((p.media_id * 7 + u.i) % 256)
         & (CASE WHEN (u.i % p.bpr) = p.bpr - 1 AND p.rem > 0
                 THEN 256 - CAST(POW(2, 8 - p.rem) AS INT)
                 ELSE 255 END) AS m
  FROM p, UNNEST(range(0, p.bpr * p.h)) AS u(i)),
cnt AS (SELECT media_id, SUM({pop}) AS set_bits FROM bts GROUP BY media_id)
SELECT p.media_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       -- 'P4\\n' + 'w h\\n' + ceil(w/8)*h packed raster (NO maxval)
       CAST(5 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR))
            + bpr * h AS BIGINT) AS n_bytes,
       CAST(cnt.set_bits AS BIGINT) AS set_bits,
       CAST((p.media_id * 7) % 256 AS INT) AS first_byte,
       CAST((p.media_id * 7 + bpr * h - 1) % 256 AS INT) AS last_byte
FROM p JOIN cnt ON cnt.media_id = p.media_id
""".replace("{pop}", _POPCOUNT)
)
