"""Pipeline queries, round-5 batch 17: n-gram window decontamination
and canonicalized exact dedup.

Two more LLM-training-data operators with no analog in the reference
engine (numeric K-Means MapReduce, SURVEY §1):

  * pipeline_ngram_contamination — the industry-standard eval
    decontamination check: an eval document is contaminated if it
    shares ANY n-token window with any train document (the GPT-3/PaLM
    style n-gram overlap test), which catches partial/quoted leakage
    the exact-fingerprint check (pipeline_contamination_check) cannot.
  * dedup_canonical_exact — exact dedup AFTER text canonicalization
    (lowercase, strip non-alphanumerics, collapse whitespace): the
    first dedup pass real corpora need, where trivial formatting
    variants (case, punctuation, spacing) hide byte-level duplicates
    from a raw-content hash.

Both pure Catalyst; both with exact DuckDB oracles.  All aggregates
emitted as exact integers (counts / id sums), so cross-engine hashes
cannot drift on float summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.functions import text as TXT
from kmeans_mapreduce_spark.plans.pipeline_queries import (
    _BLANK,
    _TOKS_ALL,
    _WS,
    _docs,
)
from kmeans_mapreduce_spark.plans.pipeline_queries2 import _TRAIN_CUT, _bucket

_N = 5  # contamination window, in tokens


def pipeline_ngram_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language n-gram window contamination of the eval split.

    An eval doc is contaminated when >=1 of its distinct 5-token
    windows appears anywhere in the train split.  Output per lang:
    eval doc count, contaminated doc count, total/hit distinct eval
    grams, and an id-sum checksum of the contaminated docs (so the
    oracle verifies WHICH docs, not just how many).

    Scale shape: gram generation is a map-side fan-out bounded by
    token count; the only shuffles are the distinct on train grams and
    the gram equi-join — both hash-partitioned on the gram string.  At
    100 TB you'd hash the gram to 8 bytes first to shrink the shuffle
    key (the oracle joins on the string so both engines agree without
    sharing a hash function); candidate volume stays linear in gram
    count either way — no all-pairs."""
    toks = TXT.tokens("text")
    base = _docs(spark, sf_dir).select(
        "doc_id",
        "lang",
        _bucket(F.col("doc_id")).alias("bucket"),
        toks.alias("toks"),
    )
    # sequence(1, n) DESCENDS when n < 1 — guard short docs before the
    # fan-out (the empty-sequence trap).
    grams = base.select(
        "doc_id",
        "lang",
        "bucket",
        F.explode(
            F.when(
                F.size("toks") >= _N,
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - (_N - 1)),
                    lambda i: F.concat_ws(" ", F.slice("toks", i, _N)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("g"),
    ).distinct()  # distinct per (doc, gram): fractions well-defined
    train_grams = (
        grams.where(F.col("bucket") < _TRAIN_CUT)
        .select("g")
        .distinct()
        .withColumn("in_train", F.lit(1))
    )
    ev = grams.where(F.col("bucket") >= _TRAIN_CUT).join(
        train_grams, "g", "left"
    )
    per_doc = ev.groupBy("doc_id", "lang").agg(
        F.count("*").alias("n_grams"),
        F.count("in_train").alias("n_hit"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("n_eval_docs"),
            F.sum((F.col("n_hit") > 0).cast("bigint")).alias("n_contaminated_docs"),
            F.sum("n_grams").alias("eval_grams"),
            F.sum("n_hit").alias("hit_grams"),
            F.coalesce(
                F.sum(F.when(F.col("n_hit") > 0, F.col("doc_id"))), F.lit(0)
            ).alias("contaminated_id_sum"),
        )
        .orderBy("lang")
    )


NGRAM_CONTAMINATION_SQL = f"""
WITH base AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT AS INT) AS bucket,
         {_TOKS_ALL} AS toks
  FROM documents),
grams AS (
  SELECT DISTINCT doc_id, lang, bucket, g FROM (
    SELECT doc_id, lang, bucket, unnest(gs) AS g FROM (
      SELECT doc_id, lang, bucket,
             [array_to_string(list_slice(toks, i, i + {_N - 1}), ' ')
              for i in range(1, greatest(len(toks) - {_N - 2}, 1))] AS gs
      FROM base))),
train_grams AS (
  SELECT DISTINCT g, 1 AS in_train FROM grams WHERE bucket < {_TRAIN_CUT}),
per_doc AS (
  SELECT e.doc_id, e.lang,
         COUNT(*) AS n_grams,
         COUNT(t.in_train) AS n_hit
  FROM grams e LEFT JOIN train_grams t USING (g)
  WHERE e.bucket >= {_TRAIN_CUT}
  GROUP BY e.doc_id, e.lang)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_eval_docs,
       CAST(SUM(CASE WHEN n_hit > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated_docs,
       CAST(SUM(n_grams) AS BIGINT) AS eval_grams,
       CAST(SUM(n_hit) AS BIGINT) AS hit_grams,
       CAST(COALESCE(SUM(CASE WHEN n_hit > 0 THEN doc_id END), 0) AS BIGINT)
         AS contaminated_id_sum
FROM per_doc
GROUP BY lang
ORDER BY lang
"""

# canonicalization: lowercase -> drop everything outside [a-z0-9 + ws]
# -> collapse whitespace runs to one space -> trim.  Explicit character
# classes (not \\W / \\s) so Java regex and DuckDB RE2 agree.
_CANON_SPARK_STEPS = (
    (f"[^a-z0-9{_WS[1:-1]}]", ""),
    (f"{_WS}+", " "),
    ("^ +| +$", ""),
)


def _canon(col):
    out = F.lower(col)
    for pat, rep in _CANON_SPARK_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return out


def dedup_canonical_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalized exact dedup, reported per source: how many docs
    collapse when trivial formatting variants (case, punctuation,
    whitespace) are normalized away before hashing.  Output per
    source: doc count, distinct raw fingerprints, distinct canonical
    fingerprints, dup counts under each, and an id-sum checksum of
    canonical-duplicate members (docs sharing their canonical key with
    another doc) — so the oracle verifies WHICH docs collapse.

    Scale shape: canonicalization is per-row codegen; the shuffles
    group by 16-byte digests (never the document body — the same
    digest-not-payload rule exact_dedup follows,
    operators/dedup.py:39)."""
    d = _docs(spark, sf_dir)
    keyed = d.select(
        "doc_id",
        "source",
        F.md5("text").alias("raw_k"),
        F.md5(_canon(F.col("text"))).alias("canon_k"),
    )
    group_sizes = keyed.groupBy("canon_k").agg(
        F.count("*").alias("members")
    )
    return (
        keyed.join(group_sizes, "canon_k")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("raw_k").alias("distinct_raw"),
            F.countDistinct("canon_k").alias("distinct_canon"),
            F.coalesce(
                F.sum(F.when(F.col("members") >= 2, F.col("doc_id"))), F.lit(0)
            ).alias("canon_dup_id_sum"),
        )
        .select(
            "source",
            "n_docs",
            "distinct_raw",
            "distinct_canon",
            (F.col("n_docs") - F.col("distinct_raw")).alias("raw_dups"),
            (F.col("n_docs") - F.col("distinct_canon")).alias("canon_dups"),
            "canon_dup_id_sum",
        )
        .orderBy("source")
    )


_CANON_SQL = (
    "trim(regexp_replace(regexp_replace(lower(text), "
    f"'[^a-z0-9{_WS[1:-1]}]', '', 'g'), '{_WS}+', ' ', 'g'))"
)

DEDUP_CANONICAL_SQL = f"""
WITH keyed AS (
  SELECT doc_id, source, md5(text) AS raw_k, md5({_CANON_SQL}) AS canon_k
  FROM documents),
sizes AS (SELECT canon_k, COUNT(*) AS members FROM keyed GROUP BY canon_k)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT raw_k) AS BIGINT) AS distinct_raw,
       CAST(COUNT(DISTINCT canon_k) AS BIGINT) AS distinct_canon,
       CAST(COUNT(*) - COUNT(DISTINCT raw_k) AS BIGINT) AS raw_dups,
       CAST(COUNT(*) - COUNT(DISTINCT canon_k) AS BIGINT) AS canon_dups,
       CAST(COALESCE(SUM(CASE WHEN s.members >= 2 THEN doc_id END), 0) AS BIGINT)
         AS canon_dup_id_sum
FROM keyed JOIN sizes s USING (canon_k)
GROUP BY source
ORDER BY source
"""


def pipeline_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (operators/bpe.py): learn the
    first 8 merges over the corpus vocabulary and return the merge
    table [rank, left, right, merged, freq].

    Iterative with a data-dependent argmax per round -> no SQL oracle
    (rows-only, like the K-Means fits); tests/test_bpe.py pins the
    exact merge sequence against a pure-Python reference BPE on the
    same word counts, plus encode parity and determinism.

    Scale shape: one corpus pass collapses to distinct words; each
    merge round is one partial-aggregated pair count over the vocab
    (top-1 to the driver) + one fold projection, lineage truncated per
    round — the corpus is never rescanned after round 0."""
    from kmeans_mapreduce_spark.operators import bpe as BPE

    merges, _ = BPE.bpe_train(_docs(spark, sf_dir), n_merges=8)
    return spark.createDataFrame(
        [(m.rank, m.left, m.right, m.merged, m.freq) for m in merges],
        "rank int, left string, right string, merged string, freq bigint",
    )


def mm_image_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT-style 2-D patch grid (operators/multimodal.image_tiles):
    decode (Arrow mapInPandas, deterministic fake codec) then fan out
    one row per 16x16 tile with edge clipping, for a 200-image slice.
    The fake codec's dims are pure integer functions of payload length,
    so the full decode->grid pipeline has an exact SQL oracle — the
    2-D analog of mm_frame_sample's 1-D offsets."""
    from kmeans_mapreduce_spark.operators import multimodal as MM

    media = MM.attach_payload(
        _docs(spark, sf_dir).where(F.col("doc_id") < 200), "doc_id", "text"
    )
    dec = MM.decode_media(media)
    return MM.image_tiles(dec, patch=16)


MM_TILES_SQL = """
WITH m AS (
  SELECT doc_id AS media_id, octet_length(encode(text)) AS n
  FROM documents WHERE doc_id < 200),
d AS (
  SELECT media_id,
         CAST(64 + (n % 64) AS INT) AS w,
         CAST(64 + ((n // 64) % 64) AS INT) AS h
  FROM m),
g AS (
  SELECT media_id, w, h,
         CAST(ceil(w / 16.0) AS INT) AS cols,
         CAST(ceil(h / 16.0) AS INT) AS rows_
  FROM d),
x AS (
  SELECT media_id, w, h, cols, unnest(range(0, rows_ * cols)) AS i FROM g)
SELECT media_id,
       CAST(i // cols AS INT) AS tile_row,
       CAST(i % cols AS INT) AS tile_col,
       CAST(LEAST(16, w - (i % cols) * 16) AS INT) AS tile_w,
       CAST(LEAST(16, h - (i // cols) * 16) AS INT) AS tile_h
FROM x
"""


def pipeline_mixture_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted-interleave training order (stride
    scheduling): sources tagged weight 3 ('web'-like), 2 ('books'-like)
    or 1 (rest) emit documents at virtual time r * (6 / w) where r is
    the doc's rank within its source — so a weight-3 source supplies 3x
    the documents of a weight-1 source in any schedule prefix.  Output:
    the first 500 schedule positions.

    This is the step AFTER pipeline_domain_mix's rate table: turning
    weights into the actual global training order, reproducibly (no
    rand()).  All arithmetic integer -> exact cross-engine.

    Scale shape: one window shuffle for within-source ranks, then a
    distributed TakeOrdered for the 500-row prefix; the single-
    partition position numbering runs on the 500 survivors only, never
    the corpus.  At 100 TB you'd emit shard-sized prefixes per worker
    the same way (rank ranges partition cleanly by virtual time)."""
    d = _docs(spark, sf_dir)
    w = (
        F.when(F.col("source").like("%0"), F.lit(3))
        .when(F.col("source").like("%1"), F.lit(2))
        .otherwise(F.lit(1))
    )
    from pyspark.sql import Window

    r = F.row_number().over(
        Window.partitionBy("source").orderBy(F.asc("doc_id"))
    )
    scheduled = d.select(
        "doc_id",
        "source",
        w.alias("weight"),
        r.alias("rank_in_source"),
    ).withColumn("vtime", F.col("rank_in_source") * (6 / F.col("weight")).cast("int"))
    prefix = scheduled.orderBy(
        F.asc("vtime"), F.asc("source"), F.asc("doc_id")
    ).limit(500)
    pos = F.row_number().over(
        Window.orderBy(F.asc("vtime"), F.asc("source"), F.asc("doc_id"))
    )
    return prefix.select(
        pos.alias("position"), "doc_id", "source", "weight", "vtime"
    )


MIXTURE_SCHEDULE_SQL = """
WITH s AS (
  SELECT doc_id, source,
         CASE WHEN source LIKE '%0' THEN 3
              WHEN source LIKE '%1' THEN 2 ELSE 1 END AS weight,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rank_in_source
  FROM documents),
v AS (
  SELECT doc_id, source, weight, rank_in_source,
         CAST(rank_in_source * (6 // weight) AS BIGINT) AS vtime
  FROM s)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY vtime, source, doc_id) AS INT) AS position,
       doc_id, CAST(weight AS INT) AS weight, source, vtime
FROM v
ORDER BY vtime, source, doc_id
LIMIT 500
"""


# --- fixed-merge-table BPE application (exact oracle) ----------------------
#
# pipeline_bpe_train is rows-only (its per-round argmax is genuinely
# iterative); the APPLY side is not: a literal merge table folded over
# the vocabulary by the same Catalyst `aggregate` greedy fold is
# deterministic SQL — the ann_pq_topk / ann_pq_fixed_topk split applied
# to the tokenizer.  All merges have left != right ON PURPOSE: the
# oracle simulates the greedy leftmost fold with space-anchored
# REPLACE passes, which is exactly equivalent for non-self-overlapping
# merges (two passes: pass 1 can skip an occurrence only when the
# immediately preceding occurrence consumed their shared boundary; by
# pass 2 that predecessor is already merged, so nothing is skipped).
# For left == right (runs >= 4) REPLACE picks different occurrences
# than the fold, so self-merges stay on the train/test side only
# (tests/test_bpe.py pins them against the pure-Python reference).
_FIXED_MERGES = [
    ("t", "h"),
    ("th", "e"),
    ("i", "n"),
    ("a", "n"),
    ("o", "n"),
    ("e", "r"),
    ("an", "d"),
    ("o", "r"),
]


def pipeline_bpe_apply_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a FIXED 8-entry BPE merge table (rank order) to the corpus
    vocabulary via the production Catalyst greedy fold
    (operators/bpe._apply_merge), then report the segmentation
    histogram: per piece-count bucket, distinct words, corpus word
    mass, and character mass.  This is the query that pins the
    merge-fold arithmetic itself under the driver's hash gate.

    Scale shape: one corpus-collapse shuffle to distinct words (the
    only full-corpus pass, same as training), then the 8 folds through
    bpe_encode's chunked projection (lazy localCheckpoint every 4
    merges — unchunked, Catalyst's nested-fold analysis cost measured
    13.5 s vs 0.3 s at sf0.1), then one small agg."""
    from kmeans_mapreduce_spark.operators import bpe as BPE

    vocab = BPE.word_counts(_docs(spark, sf_dir))
    merges = [
        BPE.BpeMerge(i, left, right, left + right, 0)
        for i, (left, right) in enumerate(_FIXED_MERGES)
    ]
    out = BPE.bpe_encode(vocab, merges)
    return (
        out.select(
            "wc",
            F.size("pieces").alias("n_pieces"),
            F.length("word").alias("n_chars"),
        )
        .groupBy("n_pieces")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("wc").alias("wc_sum"),
            F.sum("n_chars").cast("bigint").alias("chars_sum"),
        )
        .orderBy("n_pieces")
    )


def _bpe_apply_sql() -> str:
    # ' t h e ' spaced-symbol form: leading space + each char followed
    # by one space — symbols never contain spaces (whitespace tokens).
    s = "' ' || regexp_replace(word, '(.)', '\\1 ', 'g')"
    for left, right in _FIXED_MERGES:
        pat, rep = f"' {left} {right} '", f"' {left}{right} '"
        for _ in range(2):  # two passes == greedy fold for left != right
            s = f"replace({s}, {pat}, {rep})"
    return f"""
WITH w AS (
  SELECT unnest({_TOKS_ALL}) AS word FROM documents
  WHERE NOT ({_BLANK})),
vocab AS (SELECT word, COUNT(*) AS wc FROM w GROUP BY word),
seg AS (
  SELECT word, wc,
         len(string_split(trim({s}), ' ')) AS n_pieces,
         length(word) AS n_chars
  FROM vocab)
SELECT CAST(n_pieces AS INT) AS n_pieces,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(wc) AS BIGINT) AS wc_sum,
       CAST(SUM(n_chars) AS BIGINT) AS chars_sum
FROM seg
GROUP BY n_pieces
ORDER BY n_pieces
"""


BPE_APPLY_FIXED_SQL = _bpe_apply_sql()
