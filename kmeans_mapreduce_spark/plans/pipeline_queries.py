"""Training-data-pipeline queries: text analysis, dedup, similarity,
multimodal — over the harness documents/embeddings tables, each with a
DuckDB oracle where SQL can express the semantics.

Tokenization in every oracle matches functions/text.py exactly:
lower → regexp-trim → split on the explicit whitespace class
[ \\t\\n\\f\\r] (empty string -> empty list); see functions/text.py WS_CLASS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.functions import text as TXT
from kmeans_mapreduce_spark.operators import dedup as DD
from kmeans_mapreduce_spark.operators import multimodal as MM
from kmeans_mapreduce_spark.operators import similarity as SIM

# Whitespace policy shared with functions/text.py WS_CLASS: explicit
# [ \t\n\f\r] — portable across Java regex / RE2 / Python re ('\s'
# is not: Java includes \x0B, RE2 doesn't; SQL trim() strips ' ' only).
_WS = "[ \\t\\n\\f\\r]"
_TRIMMED = f"regexp_replace(lower(text), '^{_WS}+|{_WS}+$', '', 'g')"
_BLANK = f"length({_TRIMMED}) = 0"
_TOKS = f"list_distinct(regexp_split_to_array({_TRIMMED}, '{_WS}+'))"
_TOKS_ALL = f"regexp_split_to_array({_TRIMMED}, '{_WS}+')"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# --- text analysis --------------------------------------------------------

def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token/char counting per doc — the unit-economics columns every
    corpus pipeline materializes first.  Pure per-row exprs, no shuffle."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        TXT.token_count("text").alias("n_tokens"),
        TXT.char_count("text").alias("n_chars_actual"),
        F.size(F.array_distinct(TXT.tokens("text"))).alias("n_unique_tokens"),
    )


TEXT_TOKEN_SQL = f"""
SELECT doc_id,
       CASE WHEN {_BLANK} THEN 0 ELSE len({_TOKS_ALL}) END AS n_tokens,
       length(text) AS n_chars_actual,
       CASE WHEN {_BLANK} THEN 0 ELSE len({_TOKS}) END AS n_unique_tokens
FROM documents
"""


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/punct/stopword heuristic (functions/text.py)."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.round(TXT.punct_ratio("text"), 6).alias("punct_ratio"),
        F.round(TXT.stopword_ratio("text"), 6).alias("stopword_ratio"),
        F.round(TXT.quality_score("text"), 6).alias("quality"),
    )


_SW = "[" + ", ".join(f"'{w}'" for w in TXT.STOPWORDS_EN) + "]"
_PUNCT_N = "len(regexp_extract_all(text, '[.,;:!?]'))"
_NTOK = f"CASE WHEN {_BLANK} THEN 0 ELSE len({_TOKS_ALL}) END"
_NSW = f"len(list_filter({_TOKS_ALL}, t -> list_contains({_SW}, t)))"
_PUNCT_RATIO = f"CASE WHEN length(text) = 0 THEN 0.0 ELSE CAST({_PUNCT_N} AS DOUBLE) / CAST(length(text) AS DOUBLE) END"
_SW_RATIO = f"CASE WHEN {_NTOK} = 0 THEN 0.0 ELSE CAST({_NSW} AS DOUBLE) / CAST({_NTOK} AS DOUBLE) END"
TEXT_QUALITY_SQL = f"""
SELECT doc_id,
       ROUND({_PUNCT_RATIO}, 6) AS punct_ratio,
       ROUND({_SW_RATIO}, 6) AS stopword_ratio,
       ROUND(0.4 * (LEAST(CAST({_NTOK} AS DOUBLE), 100.0) / 100.0)
           + 0.3 * (1.0 - {_PUNCT_RATIO})
           + 0.3 * LEAST({_SW_RATIO} * 4.0, 1.0), 6) AS quality
FROM documents
"""


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID -> docs per detected language."""
    d = _docs(spark, sf_dir)
    return (
        d.select(TXT.lang_id("text").alias("detected_lang"))
        .groupBy("detected_lang")
        .agg(F.count("*").alias("n_docs"))
    )


def _marker_sql(lang: str) -> str:
    words = "[" + ", ".join(f"'{w}'" for w in TXT.LANG_MARKERS[lang]) + "]"
    return f"len(list_filter({_TOKS_ALL}, t -> list_contains({words}, t)))"


_BEST = "GREATEST(" + ", ".join(f"s_{lg}" for lg in TXT.LANG_MARKERS) + ")"
_LANG_CASE = "CASE WHEN " + _BEST + " = 0 THEN 'und' " + " ".join(
    f"WHEN s_{lg} = {_BEST} THEN '{lg}'" for lg in TXT.LANG_MARKERS
) + " END"
TEXT_LANG_SQL = f"""
SELECT detected_lang, COUNT(*) AS n_docs FROM (
  SELECT {_LANG_CASE} AS detected_lang FROM (
    SELECT {", ".join(f"{_marker_sql(lg)} AS s_{lg}" for lg in TXT.LANG_MARKERS)}
    FROM documents))
GROUP BY detected_lang
"""


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint (md5 hex) per doc — engine-portable digest."""
    d = _docs(spark, sf_dir)
    return d.select("doc_id", TXT.fingerprint("text").alias("fp"))


FINGERPRINT_SQL = "SELECT doc_id, md5(text) AS fp FROM documents"


# --- dedup ----------------------------------------------------------------

def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash; lowest doc_id survives."""
    return DD.exact_dedup(_docs(spark, sf_dir), "doc_id", "text")


DEDUP_EXACT_SQL = """
SELECT MIN(doc_id) AS keep_id, COUNT(*) AS dup_count
FROM documents GROUP BY md5(text)
"""

_SHINGLES = (
    "list_distinct(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]))"
)
_JACCARD_CTE = f"""
WITH t AS (SELECT doc_id, {_TOKS_ALL} AS toks FROM documents WHERE NOT ({_BLANK})),
s AS (SELECT doc_id, {_SHINGLES} AS sh FROM t WHERE len(toks) >= 2),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 6) AS jaccard
  FROM s a JOIN s b ON a.doc_id < b.doc_id)
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs bigram-shingle Jaccard >= 0.8 (ground truth)."""
    return DD.ngram_jaccard_pairs(_docs(spark, sf_dir), "doc_id", "text", threshold=0.8, n=2)


DEDUP_JACCARD_SQL = _JACCARD_CTE + "SELECT id_a, id_b, jaccard FROM pairs WHERE jaccard >= 0.8"


def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidates verified by exact Jaccard >= 0.8.

    The oracle is the exact all-pairs result: at J>=0.8 with 8 bands x 4
    rows the per-pair miss probability is (1-J^4)^8 < 1e-6, so LSH output
    must equal ground truth on this corpus — and the test suite asserts
    recall separately.  At 100 TB only this path runs (no N^2)."""
    return DD.minhash_dedup_pairs(_docs(spark, sf_dir), "doc_id", "text", threshold=0.8)


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup, cosine >= 0.45: LSH-bucketed candidates +
    exact-cosine verify (equi-joins only — no all-pairs comparison).
    The DuckDB oracle is the all-pairs ground truth, so a hash-match
    here IS a measured recall-1.0 run at this threshold."""
    return DD.embedding_cosine_pairs_lsh(
        _embs(spark, sf_dir), "vec_id", "embedding", threshold=0.45
    )


def _dot_sql(a: str, b: str, dim: int = 64) -> str:
    return " + ".join(f"{a}[{i}]*{b}[{i}]" for i in range(1, dim + 1))


DEDUP_COSINE_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT id_a, id_b, cosine FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         ROUND(({_dot_sql('a.v', 'b.v')})
               / (SQRT({_dot_sql('a.v', 'a.v')}) * SQRT({_dot_sql('b.v', 'b.v')})), 6) AS cosine
  FROM e a JOIN e b ON a.vec_id < b.vec_id)
WHERE cosine >= 0.45
"""


# --- similarity search ----------------------------------------------------

def ann_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for the first 5 vectors (brute force
    baseline; ranks deterministic via (rounded score desc, id))."""
    e = _embs(spark, sf_dir)
    queries = e.where(F.col("vec_id") < 5)
    return SIM.brute_force_topk(e, queries, k=5, id_col="vec_id", vec_col="embedding")


ANN_BRUTE_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id, v FROM e WHERE vec_id < 5),
scored AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         ROUND(({_dot_sql('q.v', 'e.v')})
               / (SQRT({_dot_sql('q.v', 'q.v')}) * SQRT({_dot_sql('e.v', 'e.v')})), 6) AS score
  FROM q CROSS JOIN e WHERE q.vec_id != e.vec_id)
SELECT query_id, rank, neighbor_id, score FROM (
  SELECT query_id, neighbor_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM scored)
WHERE rank <= 5
"""


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via multi-table random-hyperplane LSH — the
    scale path (equi-join on buckets, no N^2).  The hyperplanes are
    driver-side literals (fixed seed), so the bucket function is plain
    arithmetic and the WHOLE query is SQL-expressible — ANN_LSH_SQL
    spells the same planes as literals, the way ANN_IVF_SQL spells its
    fixed centroids."""
    e = _embs(spark, sf_dir)
    queries = e.where(F.col("vec_id") < 5)
    return SIM.lsh_topk(e, queries, k=5, id_col="vec_id", vec_col="embedding", dim=64)


def _lsh_bucket_sql_duck(v: str, planes: list[list[float]]) -> str:
    """DuckDB bucket id for sign-LSH: bit i = (v . plane_i >= 0).

    Term order matches the Spark fold (v[1]*p1 + v[2]*p2 + ...) so both
    engines evaluate the identical IEEE addition sequence — the sign
    comparison then agrees bit-for-bit."""
    bits = []
    for i, p in enumerate(planes):
        dot = " + ".join(f"{v}[{j + 1}]*{float(x)!r}" for j, x in enumerate(p))
        bits.append(f"(CASE WHEN ({dot}) >= 0 THEN {1 << i} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


def _lsh_buckets_union() -> str:
    from kmeans_mapreduce_spark.operators.similarity import _hyperplanes

    return " UNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl, "
        f"{_lsh_bucket_sql_duck('v', _hyperplanes(64, 4, 42 + 1000 * t))} AS bucket FROM e"
        for t in range(4)
    )


ANN_LSH_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
b AS ({_lsh_buckets_union()}),
qb AS (SELECT * FROM b WHERE vec_id < 5),
pairs AS (
  SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
  FROM qb JOIN b cb ON qb.tbl = cb.tbl AND qb.bucket = cb.bucket
  WHERE qb.vec_id <> cb.vec_id),
scored AS (
  SELECT query_id, neighbor_id,
         ROUND(({_dot_sql('a.v', 'c.v')})
               / (SQRT({_dot_sql('a.v', 'a.v')}) * SQRT({_dot_sql('c.v', 'c.v')})), 6) AS score
  FROM pairs JOIN e a ON a.vec_id = query_id JOIN e c ON c.vec_id = neighbor_id)
SELECT query_id, rank, neighbor_id, score FROM (
  SELECT query_id, neighbor_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM scored)
WHERE rank <= 5
"""


# --- multimodal -----------------------------------------------------------

def mm_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque binary payloads (documents' UTF-8 bytes
    standing in for media): the cheap pre-decode filter stage."""
    media = MM.attach_payload(_docs(spark, sf_dir), "doc_id", "text")
    return MM.media_metadata(media)


MM_METADATA_SQL = """
SELECT doc_id AS media_id, 'image/fake' AS mime,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM documents
"""


def mm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode plumbing (deterministic fake codec): returns
    media_id, dims and the first byte-statistic feature.  The Python
    stage is Arrow-batched.  The fake codec's outputs are pure integer
    arithmetic over the payload bytes (length-derived dims, first-chunk
    byte sum mod 1000), so the whole thing IS SQL-expressible —
    MM_DECODE_SQL recomputes them over hex(encode(text)) in DuckDB."""
    media = MM.attach_payload(_docs(spark, sf_dir), "doc_id", "text")
    dec = MM.decode_media(media)
    return dec.select("media_id", "n_bytes", "width", "height", F.round(F.col("feature")[0], 2).alias("f0"))


MM_DECODE_SQL = """
WITH m AS (
  SELECT doc_id AS media_id, hex(encode(text)) AS h,
         octet_length(encode(text)) AS n
  FROM documents
), c AS (
  SELECT media_id, n, greatest(1, n // 8) AS chunk, h FROM m
)
SELECT media_id,
       CAST(n AS BIGINT) AS n_bytes,
       CAST(64 + n % 64 AS INT) AS width,
       CAST(64 + (n // 64) % 64 AS INT) AS height,
       ROUND(CAST(COALESCE(list_sum(list_transform(range(1, chunk + 1),
             i -> TRY_CAST('0x' || substr(h, CAST(2*i-1 AS INT), 2) AS INT))),
             0) % 1000 AS DOUBLE), 2) AS f0
FROM c
"""


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming <= 6 over 60-bit signatures).
    The md5-derived hash family (operators/dedup.portable_hash60) is
    computable in DuckDB, so the full pipeline — votes, signature,
    banding, popcount — has an exact oracle (pipeline_queries2
    SIMHASH_SQL); recall-vs-Jaccard invariants stay in tests."""
    return DD.simhash_dedup_pairs(_docs(spark, sf_dir), "doc_id", "text", max_hamming=6)


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with the first-4-vectors as coarse centroids, n_probe=2:
    per-query top-5 among corpus rows in the query's 2 nearest cells.
    Fixed centroids make this fully SQL-expressible — the one ANN path
    with an exact oracle (K-Means-as-index, reference algorithm reused
    as ANN infrastructure)."""
    from kmeans_mapreduce_spark.plans.kmeans_queries import _fixed_centroids

    e = _embs(spark, sf_dir)
    cents = _fixed_centroids(spark, sf_dir, k=4)
    queries = e.where(F.col("vec_id") < 5)
    return SIM.ivf_topk(
        e, queries, cents, k=5, n_probe=2, id_col="vec_id", vec_col="embedding"
    )


def _ivf_d2_sql(v: str, c: str, dim: int = 64) -> str:
    return " + ".join(f"({v}[{i}]-{c}[{i}])*({v}[{i}]-{c}[{i}])" for i in range(1, dim + 1))


ANN_IVF_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS c FROM embeddings WHERE vec_id < 4),
cd AS (SELECT e.vec_id, cent.cid, {_ivf_d2_sql('e.v', 'cent.c')} AS d2 FROM e CROSS JOIN cent),
cell AS (  -- corpus rows: nearest cell, lowest cid on ties
  SELECT vec_id, cid AS cell FROM (
    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) AS rn
    FROM cd) WHERE rn = 1),
qcell AS (  -- query rows: 2 nearest cells
  SELECT vec_id, cid AS cell FROM (
    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) AS rn
    FROM cd WHERE vec_id < 5) WHERE rn <= 2),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROUND(({_dot_sql('qe.v', 'ce.v')})
               / (SQRT({_dot_sql('qe.v', 'qe.v')}) * SQRT({_dot_sql('ce.v', 'ce.v')})), 6) AS score
  FROM qcell q
  JOIN cell c ON q.cell = c.cell AND q.vec_id != c.vec_id
  JOIN e qe ON qe.vec_id = q.vec_id
  JOIN e ce ON ce.vec_id = c.vec_id)
SELECT query_id, rank, neighbor_id, score FROM (
  SELECT query_id, neighbor_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM pairs)
WHERE rank <= 5
"""


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: one row per 1024-byte offset of each
    payload (as a video decoder would emit per sampled frame).  Pure
    Catalyst sequence+explode — linear fan-out, no Python."""
    media = MM.attach_payload(_docs(spark, sf_dir), "doc_id", "text")
    return MM.frame_sample(media, every_n_bytes=1024)


MM_FRAME_SQL = """
SELECT doc_id AS media_id,
       unnest(range(0, GREATEST(octet_length(encode(text)) - 1, 0) + 1, 1024)) AS offset
FROM documents
"""


def mm_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio framing plumbing: each payload as a PCM16 stream, one row
    per overlapping 32-sample analysis window (hop 25) with start
    sample/byte/time — operators/multimodal.audio_pcm_windows.  Pure
    Catalyst byte arithmetic; the decode boundary starts after this."""
    media = MM.attach_payload(_docs(spark, sf_dir), "doc_id", "text", mime="audio/pcm16")
    return MM.audio_pcm_windows(
        media, sample_rate=16000, bytes_per_sample=2,
        window_samples=32, hop_samples=25,
    )


MM_AUDIO_SQL = """
WITH s AS (
  SELECT doc_id, CAST(FLOOR(octet_length(encode(text)) / 2) AS BIGINT)
           AS n_samples
  FROM documents),
w AS (
  SELECT doc_id,
         CAST(FLOOR((n_samples - 32) / 25) + 1 AS BIGINT) AS n_w
  FROM s WHERE n_samples >= 32)
SELECT doc_id AS media_id,
       g.widx AS window_idx,
       g.widx * 25 AS start_sample,
       g.widx * 25 * 2 AS start_byte,
       ROUND(g.widx * 25 * 1000.0 / 16000, 4) AS t_start_ms
FROM w, UNNEST(range(0, n_w)) AS g(widx)
"""


def ann_brute_topk_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ann_brute_topk with the cosine computed in an Arrow-batched pandas
    UDF (functions/udfs.py) — the template for Python-side scoring.
    Scores rounded to 4 decimals: numpy's pairwise summation differs
    from a sequential SQL fold only in the last ulp, invisible at 4dp,
    so the catalog entry carries an exact SQL oracle (ranks tie-break on
    neighbor_id identically in both engines)."""
    from kmeans_mapreduce_spark.functions.udfs import brute_force_topk_pandas

    e = _embs(spark, sf_dir)
    queries = e.where(F.col("vec_id") < 5)
    return brute_force_topk_pandas(
        e, queries, k=5, id_col="vec_id", vec_col="embedding", round_dp=4
    )


ANN_BRUTE4_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id, v FROM e WHERE vec_id < 5),
scored AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         ROUND(({_dot_sql('q.v', 'e.v')})
               / (SQRT({_dot_sql('q.v', 'q.v')}) * SQRT({_dot_sql('e.v', 'e.v')})), 4) AS score
  FROM q CROSS JOIN e WHERE q.vec_id != e.vec_id)
SELECT query_id, rank, neighbor_id, score FROM (
  SELECT query_id, neighbor_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM scored)
WHERE rank <= 5
"""


def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish piece counting beside whitespace token counting — the two
    unit-economics numbers a training-data pipeline tracks per doc.
    Pure regexp_count per row; no shuffle."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        TXT.token_count("text").alias("n_ws_tokens"),
        TXT.bpe_token_count("text").alias("n_bpe_tokens"),
    )


_BPE = TXT.BPE_PATTERN.replace("\\", "\\\\")
TEXT_BPE_SQL = f"""
SELECT doc_id,
       CASE WHEN {_BLANK} THEN 0 ELSE len({_TOKS_ALL}) END AS n_ws_tokens,
       len(regexp_extract_all(lower(text), '{_BPE}')) AS n_bpe_tokens
FROM documents
"""


def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: top-3 highest-scoring terms per document (doc_id < 50).

    The canonical retrieval/feature-selection stack in three grouped
    passes: term frequency per (doc, term), document frequency per term
    (distinct-doc count over the WHOLE corpus — the filter applies only
    to the output docs, not the statistics), smoothed idf
    ln((N+1)/(df+1)), then a per-doc top-3 window with (score desc,
    term asc) tiebreak.

    Scale shape: tf and df are partial-aggregated token shuffles; the
    df side joins back by term (hash join, term-key); N is one scalar.
    At 100 TB the df frame is the hot-key risk (stopword terms) —
    count-distinct partial aggregation bounds it to one row per term
    per upstream partition."""
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", F.explode(TXT.tokens("text")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = d.count()
    from pyspark.sql import Window

    score = F.col("tf") * F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0))
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        tf.join(df, "term")
        .select("doc_id", "term", "tf", "df", F.round(score, 6).alias("score"))
        .where(F.col("doc_id") < 50)
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("doc_id", "rnk", "term", "tf", "df", "score")
    )


TFIDF_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS_ALL}) AS term FROM documents WHERE NOT ({_BLANK})
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         ROUND(tf.tf * LN((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS score
  FROM tf JOIN df USING (term) CROSS JOIN n
  WHERE tf.doc_id < 50)
SELECT doc_id, rnk, term, tf, df, score FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, term ASC) AS rnk
  FROM scored)
WHERE rnk <= 3
"""


def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components over the verified
    MinHash pair graph (J >= 0.8), labels = min doc_id per component.

    This is the stage that turns pairs into droppable groups; the
    oracle recomputes the same components with a recursive-CTE
    transitive closure over the exact all-pairs graph (safe at oracle
    scale; the Spark side is the iterative O(diameter)-round
    label-propagation that works at corpus scale)."""
    from kmeans_mapreduce_spark.operators.components import connected_components

    pairs = DD.minhash_dedup_pairs(_docs(spark, sf_dir), "doc_id", "text", threshold=0.8)
    return connected_components(pairs).select(
        F.col("id").alias("doc_id"), "component"
    )


_COMPONENTS_RECURSIVE = _JACCARD_CTE.replace("WITH t AS", "WITH RECURSIVE t AS", 1) + """
, edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs WHERE jaccard >= 0.8
  UNION
  SELECT id_b AS a, id_a AS b FROM pairs WHERE jaccard >= 0.8),
reach AS (
  SELECT a AS src, b AS dst FROM edges
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a)
SELECT src AS doc_id, LEAST(src, MIN(dst)) AS component
FROM reach GROUP BY src
"""
DEDUP_COMPONENTS_SQL = _COMPONENTS_RECURSIVE


BM25_TERMS = ("spark", "table", "merge")
_BM25_K1, _BM25_B = 1.2, 0.75


def text_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval: top-15 documents for a fixed 3-term query.

    Okapi BM25 with k1=1.2, b=0.75: per query term,
        idf = ln(1 + (N - df + 0.5)/(df + 0.5))
        score += idf * tf*(k1+1) / (tf + k1*(1 - b + b*len/avglen))
    summed over matching terms, top-15 by (score desc, doc_id asc).

    Same distributed shape as TF-IDF (tf pass, df pass, one scalar
    pair N/avglen) plus a 3-row broadcast of query terms; the ranking
    is TakeOrderedAndProject.  The arithmetic is spelled identically in
    the oracle so doubles match to the 6dp rounding."""
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", F.explode(TXT.tokens("text")).alias("term"))
    doclen = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = doclen.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = float(stats["n_docs"]), float(stats["avgdl"])
    qterms = [F.lit(t) for t in BM25_TERMS]
    tf = (
        toks.where(F.col("term").isin(list(BM25_TERMS)))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log(
        1.0 + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + _BM25_K1 * (
        1.0 - _BM25_B + _BM25_B * F.col("dl") / F.lit(avgdl)
    )
    contrib = idf * F.col("tf") * (_BM25_K1 + 1.0) / denom
    return (
        tf.join(df, "term")
        .join(doclen, "doc_id")
        .groupBy("doc_id")
        .agg(F.round(F.sum(contrib), 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(15)
    )


_BM25_TERMS_SQL = ", ".join(f"('{t}')" for t in BM25_TERMS)
BM25_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS_ALL}) AS term FROM documents WHERE NOT ({_BLANK})
),
doclen AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM doclen),
q(term) AS (VALUES {_BM25_TERMS_SQL}),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
       WHERE term IN (SELECT term FROM q) GROUP BY 1, 2),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY 1)
SELECT doc_id,
       ROUND(SUM(LN(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
                 * tf.tf * ({_BM25_K1} + 1.0)
                 / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * doclen.dl / stats.avgdl))), 6) AS bm25
FROM tf
JOIN df USING (term)
JOIN doclen USING (doc_id)
CROSS JOIN stats
GROUP BY doc_id
ORDER BY bm25 DESC, doc_id ASC
LIMIT 15
"""


# --- deterministic stratified sampling (train/eval splits) ------------------

def sample_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based stratified sampling — the training-data
    split primitive: ~20% of documents per language bucket, selected by
    content-independent hash of the doc id, NOT by rand().

    Why hash, not rand(): reproducible across runs/engines/partitionings
    (rand(seed) is partition-dependent in Spark, so a repartition
    silently changes the split — poison for train/eval hygiene).  The
    bucket is the first 4 hex digits of md5(id), uniform on [0, 65536);
    both Spark and DuckDB compute identical md5, so the oracle checks
    the SPLIT itself, not just its size.

    Scale shape: pure per-row projection + filter, no shuffle at all
    except the output count agg; sampling 100 TB is a map-only scan."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast("int")
    return (
        docs.withColumn("bucket", bucket)
        .where(F.col("bucket") < int(0.2 * 65536))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.min("doc_id").alias("first_id"),
            F.max("doc_id").alias("last_id"),
            F.sum("doc_id").alias("id_checksum"),
        )
        .orderBy("lang")
    )


SAMPLE_SPLIT_SQL = f"""
SELECT lang,
       COUNT(*) AS n_sampled,
       MIN(doc_id) AS first_id,
       MAX(doc_id) AS last_id,
       CAST(SUM(doc_id) AS BIGINT) AS id_checksum
FROM (
  SELECT *,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT AS INT) AS bucket
  FROM documents
)
WHERE bucket < {int(0.2 * 65536)}
GROUP BY lang
ORDER BY lang
"""


# --- end-to-end corpus curation (operator composition) ----------------------

def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole training-data pipeline as ONE lazy plan: quality-filter
    -> exact dedup (keep lowest doc_id per content hash) -> 50%
    deterministic md5-bucket sample -> per-language corpus stats.

    Composability is the point: every stage is a primitive that is
    individually oracle-checked elsewhere (text_quality, dedup_exact,
    sample_train_split, text_token_stats); chaining them stays a single
    declarative plan, so Catalyst prunes columns through all four
    stages and the only shuffles are the dedup window's hash partition
    and the final per-lang aggregation.  At 100 TB: one pass over the
    corpus, no intermediate materialization."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    scored = d.select(
        "doc_id",
        "text",
        "lang",
        F.round(TXT.quality_score("text"), 6).alias("q"),
        TXT.token_count("text").alias("ntok"),
    ).where(F.col("q") >= 0.5)
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
    )
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("int")
    sampled = deduped.where(bucket < 32768)  # 50% split
    return (
        sampled.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ntok").alias("total_tokens"),
            F.round(F.avg("q"), 4).alias("avg_quality"),
        )
        .orderBy("lang")
    )


_QUALITY6 = f"""ROUND(0.4 * (LEAST(CAST({_NTOK} AS DOUBLE), 100.0) / 100.0)
           + 0.3 * (1.0 - {_PUNCT_RATIO})
           + 0.3 * LEAST({_SW_RATIO} * 4.0, 1.0), 6)"""

CURATION_SQL = f"""
WITH scored AS (
  SELECT doc_id, text, lang, {_QUALITY6} AS q, {_NTOK} AS ntok
  FROM documents
),
filtered AS (SELECT * FROM scored WHERE q >= 0.5),
deduped AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM filtered
),
sampled AS (
  SELECT * FROM deduped
  WHERE rn = 1
    AND CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT AS INT) < 32768
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(ntok) AS BIGINT) AS total_tokens,
       ROUND(AVG(q), 4) AS avg_quality
FROM sampled GROUP BY lang ORDER BY lang
"""


# --- PQ ANN ------------------------------------------------------------------

def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with exact re-ranking: train 8x16
    codebooks (deterministic first-k init + 3 Lloyd steps per
    subspace), compress the corpus to 8 codes/vector, ADC-shortlist 30
    candidates per query, exact-rerank to top-5.

    Iterative K-Means training inside -> no SQL oracle (rows-only);
    recall and determinism are pinned in tests/test_pq.py.  At 100 TB
    the candidate scan touches 8-byte codes, not 512-byte vectors —
    see operators/similarity.py pq_* docstrings for the plan shape."""
    from kmeans_mapreduce_spark.operators import similarity as SIM

    embs = _embs(spark, sf_dir).select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("v"),
    ).cache()
    try:
        books = SIM.pq_train(
            embs, dim=64, m=8, k_codes=16, seed=3, max_iter=3, init="first"
        )
        codes = SIM.pq_encode(embs, books)
        qs = [
            (r["id"], list(r["v"]))
            for r in embs.where(F.col("id") < 5).collect()
        ]
        out = SIM.pq_topk_rerank(codes, books, embs, qs, k=5, shortlist=30)
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        embs.unpersist()


def ann_pq_fixed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ADC with FIXED codebooks and an exact DuckDB oracle: the
    first 16 corpus vectors' subspace slices ARE the codewords (8
    subspaces x 16 codes), so no iterative training stands between the
    query and a SQL ground truth — the same fixed-parameter trick
    ann_ivf_topk uses for IVF.

    Exactness across engines: vectors are scaled to integers first
    (floor(x*1000)), making every distance an exact integer in double
    arithmetic — encode argmins, ADC lookup sums, and rank ties are
    bit-identical in Spark and DuckDB regardless of summation order.
    This pins the ADC arithmetic itself (encode -> broadcast-lut join
    -> per-query top-k), which ann_pq_topk (trained codebooks,
    rows-only) cannot."""
    from kmeans_mapreduce_spark.operators import similarity as SIM

    e = _embs(spark, sf_dir).select(
        F.col("vec_id").alias("id"),
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.floor(x * 1000).cast("double"),
        ).alias("v"),
    )
    book_rows = e.where(F.col("id") < 16).orderBy("id").collect()
    assert len(book_rows) == 16, "need >= 16 corpus vectors for codewords"
    books = [
        [list(r["v"])[j * 8 : (j + 1) * 8] for r in book_rows]
        for j in range(8)
    ]
    codes = SIM.pq_encode(e, books)
    qs = [
        (r["id"], list(r["v"]))
        for r in e.where(F.col("id") < 5).orderBy("id").collect()
    ]
    return SIM.pq_topk(codes, books, qs, k=5)


def _pq_d2_sql(a: str, b: str, j: str = "sub.j") -> str:
    """Sum of squares over one 8-dim subspace, 1-based list indexing."""
    return " + ".join(
        f"({a}[{j}*8+{i}] - {b}[{j}*8+{i}]) * ({a}[{j}*8+{i}] - {b}[{j}*8+{i}])"
        for i in range(1, 9)
    )


ANN_PQ_FIXED_SQL = f"""
WITH e AS (
  SELECT vec_id AS id, list_transform(embedding::DOUBLE[], x -> FLOOR(x*1000)) AS v
  FROM embeddings),
cents AS (SELECT id AS cid, v FROM e WHERE id < 16),
sub AS (SELECT unnest(range(8)) AS j),
enc AS (  -- per (vector, subspace): distance to each of the 16 codewords
  SELECT e.id, sub.j, c.cid, {_pq_d2_sql('e.v', 'c.v')} AS d2
  FROM e CROSS JOIN sub CROSS JOIN cents c),
codes AS (  -- argmin codeword, lowest cid on ties (= Spark first-min)
  SELECT id, j, cid AS code FROM (
    SELECT id, j, cid,
           ROW_NUMBER() OVER (PARTITION BY id, j ORDER BY d2 ASC, cid ASC) AS rn
    FROM enc) WHERE rn = 1),
lut AS (  -- ADC lookup table for the 5 query vectors
  SELECT q.id AS query_id, sub.j, c.cid AS code, {_pq_d2_sql('q.v', 'c.v')} AS d2
  FROM e q CROSS JOIN sub CROSS JOIN cents c
  WHERE q.id < 5),
scored AS (
  SELECT lut.query_id, codes.id AS neighbor_id, ROUND(SUM(lut.d2), 6) AS approx_d2
  FROM codes JOIN lut ON codes.j = lut.j AND codes.code = lut.code
  GROUP BY lut.query_id, codes.id
  HAVING lut.query_id != codes.id)
SELECT query_id, rank, neighbor_id, approx_d2 FROM (
  SELECT query_id, neighbor_id, approx_d2,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY approx_d2 ASC, neighbor_id ASC) AS rank
  FROM scored)
WHERE rank <= 5
"""
