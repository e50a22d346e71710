"""Training-data-pipeline queries, round 4: contamination checking,
sequence packing, domain mixing, repetition scoring.

These are the corpus-hygiene operations a large-scale LLM training
pipeline runs between raw ingest and tokenizer sharding (no analog in
the reference — its only data surface is the K-Means CSV ingest,
utils.go:12-50; this module is part of the mandated beyond-reference
pipeline surface).  Tokenization/fingerprint/bucket conventions are
shared with pipeline_queries (functions/text.py WS_CLASS, md5 hex).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.functions import text as TXT
from kmeans_mapreduce_spark.plans.pipeline_queries import (
    _BLANK,
    _SHINGLES,
    _TOKS_ALL,
    _docs,
)

# Same hash-bucket split as sample_train_split: first 4 md5 hex digits
# of the id, uniform on [0, 65536).  80/20 train/eval.
_TRAIN_CUT = int(0.8 * 65536)


def _bucket(col):
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 4), 16, 10).cast(
        "int"
    )


def pipeline_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination report: how many EVAL documents share an
    exact content fingerprint with any TRAIN document, per language.

    The check every training pipeline must run before an eval score is
    believable: a deterministic hash split (reproducible across engines
    and partitionings — rand() is not) can still be contaminated by
    exact duplicates straddling the cut.  Output per lang: eval count,
    contaminated count, and an id checksum of the contaminated docs so
    the oracle verifies WHICH docs leak, not just how many.

    Scale shape: fingerprints are a map-side projection; the only
    shuffle is the fp equi-join of eval against the distinct train
    fingerprints (at 100 TB: both sides hash-partition on a 16-byte
    key; the train-fp side shrinks by distinct before the join).  No
    all-pairs anything."""
    d = _docs(spark, sf_dir)
    base = d.select(
        "doc_id",
        "lang",
        _bucket(F.col("doc_id")).alias("bucket"),
        TXT.fingerprint("text").alias("fp"),
    )
    train_fps = (
        base.where(F.col("bucket") < _TRAIN_CUT)
        .select("fp")
        .distinct()
        .withColumn("in_train", F.lit(1))
    )
    ev = base.where(F.col("bucket") >= _TRAIN_CUT).join(
        train_fps, "fp", "left"
    )
    return (
        ev.groupBy("lang")
        .agg(
            F.count("*").alias("n_eval"),
            F.count("in_train").alias("n_contaminated"),
            F.coalesce(
                F.sum(F.when(F.col("in_train").isNotNull(), F.col("doc_id"))),
                F.lit(0),
            ).alias("contaminated_id_sum"),
        )
        .orderBy("lang")
    )


CONTAMINATION_SQL = f"""
WITH base AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT AS INT) AS bucket,
         md5(text) AS fp
  FROM documents
),
train_fps AS (
  SELECT DISTINCT fp, 1 AS in_train FROM base WHERE bucket < {_TRAIN_CUT}
),
ev AS (
  SELECT b.lang, b.doc_id, t.in_train
  FROM base b LEFT JOIN train_fps t ON b.fp = t.fp
  WHERE b.bucket >= {_TRAIN_CUT}
)
SELECT lang,
       COUNT(*) AS n_eval,
       COUNT(in_train) AS n_contaminated,
       CAST(COALESCE(SUM(CASE WHEN in_train IS NOT NULL THEN doc_id END), 0)
            AS BIGINT) AS contaminated_id_sum
FROM ev GROUP BY lang ORDER BY lang
"""


_PACK_BUDGET = 2048  # tokens per pack


def pipeline_seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing plan: assign documents to fixed token-budget
    packs (contiguous-prefix packing in deterministic doc_id order,
    per language), then report per-pack occupancy.

    This is the batch-shaping step before tokenizer sharding: training
    wants ~budget-sized concatenations, and the pack assignment must be
    a pure function of the corpus (job reruns and the oracle must agree
    on every pack id).  pack_id = floor((running_tokens - 1) / budget)
    over doc_id order — not bin-packing-optimal, but deterministic,
    one-pass, and within one doc of budget occupancy.

    Scale shape: one hash shuffle on lang + per-partition sort for the
    running sum (at 100 TB: range-partition by (lang, doc_id) so each
    task owns a contiguous id span; the cumsum is then per-partition
    with a tiny per-lang offset exchange — the classic distributed
    prefix-sum layout).  The final per-pack rollup is map-side
    combinable."""
    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id", "lang", TXT.token_count("text").alias("n_tokens")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.withColumn(
        "pack_id",
        F.floor((F.sum("n_tokens").over(w) - 1) / F.lit(_PACK_BUDGET)).cast(
            "bigint"
        ),
    )
    return (
        packed.groupBy("lang", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("lang", "pack_id")
    )


SEQ_PACKING_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang,
         CASE WHEN {_BLANK} THEN 0 ELSE len({_TOKS_ALL}) END AS n_tokens
  FROM documents
),
packed AS (
  SELECT doc_id, lang, n_tokens,
         CAST(floor((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)
               / {_PACK_BUDGET}) AS BIGINT) AS pack_id
  FROM toks
)
SELECT lang, pack_id, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM packed GROUP BY lang, pack_id ORDER BY lang, pack_id
"""


def pipeline_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mix report: per (lang, source) cell — document count,
    token volume, the cell's share of its language, and the sampling
    rate that would equalize sources within the language.

    The mixing table a pretraining data recipe is built from: token
    shares decide upsampling weights, and the equalize rate is the
    deterministic downsample fraction for the naive balanced mix.

    Scale shape: one partial+final agg to (lang, source) cells —
    thousands of rows at any corpus size — then window math on the tiny
    aggregate; the 100 TB scan never shuffles more than its partial
    states."""
    d = _docs(spark, sf_dir)
    cells = (
        d.select("lang", "source", TXT.token_count("text").alias("n_tokens"))
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )
    wl = Window.partitionBy("lang")
    return (
        cells.withColumn(
            "lang_share",
            F.round(
                F.col("n_tokens") / F.sum("n_tokens").over(wl), 6
            ),
        )
        .withColumn(
            "equalize_rate",
            F.round(F.min("n_docs").over(wl) / F.col("n_docs"), 6),
        )
        .orderBy("lang", "source")
    )


DOMAIN_MIX_SQL = f"""
WITH cells AS (
  SELECT lang, source, COUNT(*) AS n_docs,
         SUM(CASE WHEN {_BLANK} THEN 0 ELSE len({_TOKS_ALL}) END) AS n_tokens
  FROM documents GROUP BY lang, source
)
SELECT lang, source, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
       ROUND(n_tokens / SUM(n_tokens) OVER (PARTITION BY lang), 6) AS lang_share,
       ROUND(MIN(n_docs) OVER (PARTITION BY lang) * 1.0 / n_docs, 6) AS equalize_rate
FROM cells ORDER BY lang, source
"""


def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition score: the highest bigram frequency as a
    fraction of all bigram occurrences (docs with >= 1 bigram).

    Boilerplate/spam/degenerate-generation detector — the quality
    filter that length and stopword ratios miss.  top_bigram tie-breaks
    (count desc, bigram asc) so the winning bigram is deterministic.

    Scale shape: explode to (doc, bigram) -> one partial+final count
    agg -> per-doc rollup.  Both shuffles key on doc_id (the second
    reuses the first's partitioning); bigram explosion is bounded by
    corpus token count, the same O(tokens) as every text pass here."""
    d = _docs(spark, sf_dir)
    toks = TXT.tokens("text")
    # non-distinct bigrams (word_shingles is distinct by design — for
    # repetition we need every occurrence)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    bc = (
        d.select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        bc.groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_bigrams"),
            F.max("cnt").alias("top_count"),
            F.min_by(
                "bigram", F.struct((-F.col("cnt")).alias("nc"), F.col("bigram"))
            ).alias("top_bigram"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "top_count",
            F.round(F.col("top_count") / F.col("n_bigrams"), 6).alias(
                "rep_ratio"
            ),
            "top_bigram",
        )
        .orderBy("doc_id")
    )


REPETITION_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_ALL} AS t FROM documents WHERE NOT ({_BLANK})
),
bg AS (
  SELECT doc_id, unnest(list_transform(range(1, len(t)),
                                       i -> t[i] || ' ' || t[i+1])) AS bigram
  FROM toks WHERE len(t) >= 2
),
bc AS (
  SELECT doc_id, bigram, COUNT(*) AS cnt FROM bg GROUP BY doc_id, bigram
),
agg AS (
  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
         CAST(MAX(cnt) AS BIGINT) AS top_count
  FROM bc GROUP BY doc_id
)
SELECT a.doc_id, a.n_bigrams, a.top_count,
       ROUND(a.top_count * 1.0 / a.n_bigrams, 6) AS rep_ratio,
       (SELECT MIN(b.bigram) FROM bc b
        WHERE b.doc_id = a.doc_id AND b.cnt = a.top_count) AS top_bigram
FROM agg a ORDER BY a.doc_id
"""


# --- SimHash oracle ---------------------------------------------------------
# The md5-derived 60-bit hash family (operators/dedup.portable_hash60)
# makes the WHOLE SimHash pipeline — shingles, bit votes, signature,
# 4x15-bit banding, popcount — reproducible in DuckDB, so the
# previously rows-only dedup_simhash carries an exact oracle.

def _simhash_bit_terms(hv: str, bits: int, per_bit_width: int = 1) -> str:
    terms = []
    for b in range(bits):
        terms.append(
            f"(CASE WHEN SUM(CASE WHEN (({hv} >> {b}) & 1) = 1 "
            f"THEN 1 ELSE -1 END) > 0 THEN CAST({1 << b} AS BIGINT) "
            f"ELSE 0 END)"
        )
    return " + ".join(terms)


def _simhash_sql() -> str:
    from kmeans_mapreduce_spark.operators.dedup import (
        SIMHASH_BITS,
        SIMHASH_BLOCKS,
    )

    band_bits = SIMHASH_BITS // SIMHASH_BLOCKS
    mask = (1 << band_bits) - 1
    bands = ",".join(str(b) for b in range(SIMHASH_BLOCKS))
    return f"""
WITH t AS (SELECT doc_id, {_TOKS_ALL} AS toks FROM documents WHERE NOT ({_BLANK})),
sh AS (
  SELECT doc_id, unnest({_SHINGLES}) AS s
  FROM t WHERE len(toks) >= 2),
h AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS hv FROM sh),
sig AS (SELECT doc_id, {_simhash_bit_terms('hv', SIMHASH_BITS)} AS sig
        FROM h GROUP BY doc_id),
blocks AS (
  SELECT doc_id, sig, b, (sig >> (b * {band_bits})) & {mask} AS key
  FROM sig CROSS JOIN (SELECT unnest([{bands}]) AS b)),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
         CAST(bit_count(xor(a.sig, c.sig)) AS INT) AS hamming
  FROM blocks a JOIN blocks c
    ON a.b = c.b AND a.key = c.key AND a.doc_id < c.doc_id)
SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 6
"""


SIMHASH_SQL = _simhash_sql()
