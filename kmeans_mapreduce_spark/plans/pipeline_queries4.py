"""Training-data-pipeline queries, round 4 (third batch): training-export
sharding, exact stratified sampling, dataset-card summaries, BPE vocab
induction, near-dup cluster representatives, character-entropy quality,
and sweep-line event concurrency.

No analog in the reference (its only data surface is the K-Means CSV
ingest, utils.go:12-50); this module extends the mandated
beyond-reference pipeline surface.  Every query here has an exact
DuckDB oracle — determinism comes from md5 (engine-portable), explicit
tiebreaks, and ROUND() on float aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.functions import text as TXT
from kmeans_mapreduce_spark.plans.pipeline_queries import (
    _BLANK,
    _TOKS_ALL,
    _docs,
)

# ---------------------------------------------------------------------------
# pipeline_shuffle_shards — deterministic global shuffle + shard export
# ---------------------------------------------------------------------------

_N_SHARDS = 8


def shard_expr():
    """(shard, sort_key) Spark expressions for the md5 shard layout —
    THE single definition (pipeline_shard_balance audits the same
    layout; a drifted copy would audit a layout nothing exports)."""
    h = F.md5(F.col("doc_id").cast("string"))
    return (
        (F.conv(F.substring(h, 1, 4), 16, 10).cast("int") % _N_SHARDS),
        h,
    )


# the same assignment as a SQL fragment (yields the shard id)
SHARD_ID_SQL = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT"
    f" % {_N_SHARDS} AS INT)"
)


def pipeline_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffling + shard assignment — the step that
    turns a curated corpus into N training shards with a reproducible,
    content-independent order (what a dataloader consumes).

    Shard id and intra-shard order both derive from md5(doc_id): the
    shard is the hash mod N_SHARDS, the order is the full hex digest.
    Hash-ordering IS the shuffle — adjacent source docs land in
    unrelated shard positions, which is exactly the decorrelation a
    training run needs, and unlike rand(seed) it is stable across
    engines, partitionings, and reruns.

    Output: per-shard manifest row (count, byte budget, order
    checksums) — what an export job writes next to each shard file.

    Scale shape: one map-side projection, one shuffle on shard_id (8
    buckets at any corpus size — at 100 TB you'd set N_SHARDS to a few
    thousand; the agg stays one row per shard).  `repartition(shard)`
    + sortWithinPartitions(sort_key) would stream the same order to
    parquet writers without any further shuffle."""
    d = _docs(spark, sf_dir)
    shard, h = shard_expr()
    ranked = d.select(
        "doc_id",
        F.col("n_chars"),
        shard.alias("shard"),
        h.alias("sort_key"),
    )
    w = Window.partitionBy("shard").orderBy("sort_key", "doc_id")
    return (
        ranked.withColumn("pos", F.row_number().over(w))
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min_by("doc_id", F.struct("sort_key", "doc_id")).alias("first_doc"),
            F.max_by("doc_id", F.struct("sort_key", "doc_id")).alias("last_doc"),
            F.sum(F.col("pos") * F.col("doc_id")).alias("order_checksum"),
        )
        .orderBy("shard")
    )


_MD5_ID = "md5(CAST(doc_id AS VARCHAR))"
SHUFFLE_SHARDS_SQL = f"""
WITH ranked AS (
  SELECT doc_id, n_chars,
         {SHARD_ID_SQL} AS shard,
         {_MD5_ID} AS sort_key
  FROM documents
), pos AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY shard
                               ORDER BY sort_key, doc_id) AS pos
  FROM ranked)
SELECT shard,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       first(doc_id ORDER BY sort_key, doc_id) AS first_doc,
       last(doc_id ORDER BY sort_key, doc_id) AS last_doc,
       CAST(SUM(pos * doc_id) AS BIGINT) AS order_checksum
FROM pos GROUP BY shard ORDER BY shard
"""


# ---------------------------------------------------------------------------
# pipeline_stratified_sample — exact per-stratum quotas
# ---------------------------------------------------------------------------

_STRAT_FRAC = 0.25


def pipeline_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact stratified sampling: ceil(frac * |stratum|) docs per
    language, chosen by md5(doc_id) rank inside the stratum.

    Complements sample_train_split (hash-THRESHOLD sampling: map-only,
    but per-stratum counts are only ~frac in expectation).  Here the
    quota is exact per stratum — what you want when balancing a
    fine-tune mix — at the cost of one window shuffle on lang.

    Scale shape: one hash partition by lang + in-partition sort by the
    digest.  Strata are languages (few, possibly huge): at 100 TB the
    win is that rank only needs a per-stratum sort, which Spark runs
    as spillable TimSort; for pathological single-stratum corpora use
    sample_train_split instead (documented tradeoff).

    Output: per-lang audit (population, quota, selected-id checksum) so
    the oracle verifies WHICH docs are sampled, not just how many."""
    d = _docs(spark, sf_dir)
    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang").orderBy("h", "doc_id")
    cnt = Window.partitionBy("lang")
    ranked = (
        d.select("doc_id", "lang", h.alias("h"))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_total", F.count("*").over(cnt))
    )
    return (
        ranked.where(F.col("rn") <= F.ceil(F.lit(_STRAT_FRAC) * F.col("n_total")))
        .groupBy("lang")
        .agg(
            F.max("n_total").alias("n_total"),
            F.count("*").alias("n_sampled"),
            F.sum("doc_id").alias("id_checksum"),
        )
        .orderBy("lang")
    )


STRATIFIED_SAMPLE_SQL = f"""
WITH ranked AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY {_MD5_ID}, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n_total
  FROM documents)
SELECT lang,
       MAX(n_total) AS n_total,
       COUNT(*) AS n_sampled,
       CAST(SUM(doc_id) AS BIGINT) AS id_checksum
FROM ranked
WHERE rn <= CEIL({_STRAT_FRAC} * n_total)
GROUP BY lang ORDER BY lang
"""


# ---------------------------------------------------------------------------
# pipeline_dataset_card — per-source corpus summary
# ---------------------------------------------------------------------------

def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card statistics per source: the summary table a corpus
    release ships (docs, chars, token budget, language spread, exact-dup
    rate, mean quality).

    Exact-dup rate reuses the dedup_exact winner rule (md5(text)
    groups, min-id keeps): dup_docs = docs whose digest has a smaller
    doc_id twin IN THE SAME SOURCE.

    Scale shape: two aggregations — one on (source, digest) for the dup
    counts, one on source for the card — both partial-agg friendly;
    every other column is a per-row expression folded into the scan.
    No joins, no window.  This is the cheapest full-corpus report in
    the catalog and the one you run after every curation change."""
    d = _docs(spark, sf_dir)
    per_digest = (
        d.select("source", F.md5("text").alias("digest"), "doc_id")
        .groupBy("source", "digest")
        .agg(F.count("*").alias("copies"))
    )
    dups = per_digest.groupBy("source").agg(
        (F.sum("copies") - F.count("*")).alias("n_dup_docs")
    )
    card = (
        d.select(
            "source",
            "lang",
            "n_chars",
            TXT.token_count("text").alias("ntok"),
            TXT.quality_score("text").alias("q"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("ntok").alias("total_tokens"),
            F.countDistinct("lang").alias("n_langs"),
            F.round(F.avg("q"), 6).alias("mean_quality"),
        )
    )
    return (
        card.join(dups, "source")
        .select(
            "source", "n_docs", "total_chars", "total_tokens",
            "n_langs", "mean_quality", "n_dup_docs",
        )
        .orderBy("source")
    )


_NTOK = f"CASE WHEN {_BLANK} THEN 0 ELSE len({_TOKS_ALL}) END"
from kmeans_mapreduce_spark.plans.pipeline_queries import (  # noqa: E402
    _PUNCT_RATIO,
    _SW_RATIO,
)

_QUALITY = (
    f"(0.4 * (LEAST(CAST({_NTOK} AS DOUBLE), 100.0) / 100.0)"
    f" + 0.3 * (1.0 - {_PUNCT_RATIO})"
    f" + 0.3 * LEAST({_SW_RATIO} * 4.0, 1.0))"
)
DATASET_CARD_SQL = f"""
WITH dups AS (
  SELECT source, CAST(SUM(copies) - COUNT(*) AS BIGINT) AS n_dup_docs FROM (
    SELECT source, md5(text) AS digest, COUNT(*) AS copies
    FROM documents GROUP BY 1, 2)
  GROUP BY source),
card AS (
  SELECT source,
         COUNT(*) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         CAST(SUM({_NTOK}) AS BIGINT) AS total_tokens,
         CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
         ROUND(AVG({_QUALITY}), 6) AS mean_quality
  FROM documents GROUP BY source)
SELECT card.source, n_docs, total_chars, total_tokens, n_langs,
       mean_quality, n_dup_docs
FROM card JOIN dups ON card.source = dups.source
ORDER BY card.source
"""


# ---------------------------------------------------------------------------
# pipeline_bpe_pair_counts — BPE vocabulary induction (first merge round)
# ---------------------------------------------------------------------------

_TOP_PAIRS = 20


def pipeline_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE vocabulary induction, round one: corpus-wide adjacent
    token-pair frequencies, top-20 (the pair a BPE trainer would merge
    first, then re-tokenize and repeat).

    Pairs come from zip_with over two slices of the whitespace token
    array — per-row array work folded into the scan, then ONE partial-
    aggregated count shuffle on the pair string.

    Scale shape: identical to word-count: explode → partial count →
    final count → top-k via TakeOrderedAndProject (no global sort).
    Pair keys are Zipfian — partial aggregation absorbs the head key
    before the shuffle, the same argument as text_tfidf_topterms' df
    side.  Tiebreak (n DESC, pair ASC) pins the top-20 boundary."""
    d = _docs(spark, sf_dir)
    toks = TXT.tokens("text")
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        d.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(_TOP_PAIRS)
    )


BPE_PAIRS_SQL = f"""
SELECT p[1] || ' ' || p[2] AS pair, COUNT(*) AS n FROM (
  SELECT unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS p FROM (
    SELECT {_TOKS_ALL} AS t FROM documents WHERE NOT ({_BLANK})))
GROUP BY 1 ORDER BY n DESC, pair ASC LIMIT {_TOP_PAIRS}
"""


# ---------------------------------------------------------------------------
# dedup_cluster_representatives — best-quality doc per near-dup cluster
# ---------------------------------------------------------------------------

def dedup_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representative selection: inside every near-dup cluster
    (connected components over the verified MinHash pair graph, J>=0.8)
    keep the highest-quality doc (tiebreak min doc_id), drop the rest.

    This composes three catalog stages into the decision a curation
    pipeline actually ships: pairs → components → winner per component.
    Output: one audit row per cluster (size, representative, dropped-id
    checksum) so the oracle verifies the exact drop set.

    Scale shape: the pair graph is the MinHash-banded candidate set
    (linear-ish, operators/dedup.py), components is the iterative
    min-label loop (O(diameter) rounds), and winner-per-cluster is one
    max_by aggregation on the component key.  Nothing here is
    all-pairs; cluster count << corpus size so the final agg is small."""
    from kmeans_mapreduce_spark.operators import dedup as DD
    from kmeans_mapreduce_spark.operators.components import connected_components

    d = _docs(spark, sf_dir)
    pairs = DD.minhash_dedup_pairs(d, "doc_id", "text", threshold=0.8)
    comp = connected_components(pairs).select(
        F.col("id").alias("doc_id"), "component"
    )
    scored = comp.join(
        d.select("doc_id", F.round(TXT.quality_score("text"), 6).alias("q")),
        "doc_id",
    )
    return (
        scored.groupBy("component")
        .agg(
            F.count("*").alias("n_members"),
            F.max_by("doc_id", F.struct("q", -F.col("doc_id"))).alias("representative"),
            F.round(F.max("q"), 6).alias("rep_quality"),
            F.sum("doc_id").alias("member_checksum"),
        )
        .orderBy("component")
    )


from kmeans_mapreduce_spark.plans.pipeline_queries import (  # noqa: E402
    DEDUP_COMPONENTS_SQL,
)

CLUSTER_REPS_SQL = f"""
WITH comp AS ({DEDUP_COMPONENTS_SQL}),
scored AS (
  SELECT comp.doc_id, comp.component, ROUND({_QUALITY}, 6) AS q
  FROM comp JOIN documents ON comp.doc_id = documents.doc_id)
SELECT component,
       COUNT(*) AS n_members,
       first(doc_id ORDER BY q DESC, doc_id ASC) AS representative,
       ROUND(MAX(q), 6) AS rep_quality,
       CAST(SUM(doc_id) AS BIGINT) AS member_checksum
FROM scored GROUP BY component ORDER BY component
"""


# ---------------------------------------------------------------------------
# text_char_entropy — character-level Shannon entropy quality signal
# ---------------------------------------------------------------------------

def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document, reported as a
    5-bucket corpus histogram (entropy floor(bits), docs, mean length).

    Low char entropy flags boilerplate/repetition (keyboard mash, token
    floods); it complements text_repetition_score's n-gram view with a
    distributional one.  Empty docs get entropy 0.

    Scale shape: explode-to-chars is the expensive step (|text| rows
    per doc) — it stays a single partial-aggregated (doc, char) count
    shuffle keyed by doc_id, then a tiny per-doc combine.  At 100 TB
    you'd switch the explode to aggregate() over a per-row char map to
    keep it map-only; at catalog scale the grouped form is clearer and
    the oracle (unnest in DuckDB) matches it exactly.  ROUND(4) absorbs
    float summation-order differences (<= 1e-12 over <= 96 symbols)."""
    d = _docs(spark, sf_dir)
    chars = d.select(
        "doc_id", F.explode(F.split(F.col("text"), "")).alias("ch")
    ).where(F.length("ch") > 0)
    cnt = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("c"))
    per_doc = (
        cnt.withColumn("tot", F.sum("c").over(Window.partitionBy("doc_id")))
        .groupBy("doc_id")
        .agg(
            F.round(
                -F.sum((F.col("c") / F.col("tot")) * F.log2(F.col("c") / F.col("tot"))),
                4,
            ).alias("entropy"),
            F.max("tot").alias("n_chars"),
        )
    )
    all_docs = d.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("entropy", F.lit(0.0)).alias("entropy"),
        F.coalesce("n_chars", F.lit(0)).alias("n_chars"),
    )
    return (
        all_docs.groupBy(F.floor("entropy").cast("int").alias("entropy_bits"))
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 2).alias("mean_chars"),
        )
        .orderBy("entropy_bits")
    )


CHAR_ENTROPY_SQL = """
WITH chars AS (
  SELECT doc_id, unnest(string_split(text, '')) AS ch
  FROM documents WHERE length(text) > 0),
cnt AS (SELECT doc_id, ch, COUNT(*)::DOUBLE AS c FROM chars GROUP BY 1, 2),
per_doc0 AS (
  SELECT doc_id,
         ROUND(-SUM((c / t) * log2(c / t)), 4) AS entropy,
         CAST(MAX(t) AS BIGINT) AS n_chars
  FROM (SELECT *, SUM(c) OVER (PARTITION BY doc_id) AS t FROM cnt)
  GROUP BY doc_id),
per_doc AS (
  SELECT d.doc_id,
         COALESCE(p.entropy, 0.0) AS entropy,
         COALESCE(p.n_chars, 0) AS n_chars
  FROM documents d LEFT JOIN per_doc0 p ON d.doc_id = p.doc_id)
SELECT CAST(FLOOR(entropy) AS INT) AS entropy_bits,
       COUNT(*) AS n_docs,
       ROUND(AVG(n_chars), 2) AS mean_chars
FROM per_doc GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# events_concurrency_sweep — sweep-line max concurrency
# ---------------------------------------------------------------------------

_SESSION_S = 300


def events_concurrency_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per event_type: how many 5-minute activity
    intervals [ts, ts+300s) overlap at the busiest instant.

    Sweep-line, NOT an interval self-join: emit +1 at each start and -1
    at each end, order by (time, delta) inside the event_type — ends
    sort before starts at the same instant, so back-to-back intervals
    do not count as concurrent — and take the max running sum.  The
    running maximum is permutation-independent within ties (+1 runs
    peak at their last element, -1 runs only descend), so the result is
    deterministic without an event_id tiebreak.

    Scale shape: O(n log n) — one window sort per event_type partition
    vs the O(n^2)-per-bucket interval self-join it replaces.  At 100 TB
    with few event_types, pre-aggregate identical (t, delta) rows
    (sum deltas per instant) to shrink the sorted stream; the per-type
    partition is the skew unit, salting by day bounds it."""
    from kmeans_mapreduce_spark.plans.relational import _events

    ev = _events(spark, sf_dir)
    starts = ev.select("event_type", F.col("ts").alias("t"), F.lit(1).alias("delta"))
    ends = ev.select(
        "event_type",
        (F.col("ts") + F.expr(f"INTERVAL {_SESSION_S} SECONDS")).alias("t"),
        F.lit(-1).alias("delta"),
    )
    sweep = starts.unionAll(ends)
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        sweep.withColumn("load", F.sum("delta").over(w))
        .groupBy("event_type")
        .agg(F.max("load").alias("peak_concurrency"))
        .orderBy("event_type")
    )


CONCURRENCY_SQL = f"""
WITH sweep AS (
  SELECT event_type, ts AS t, 1 AS delta FROM events
  UNION ALL
  SELECT event_type, ts + INTERVAL {_SESSION_S} SECOND, -1 FROM events)
SELECT event_type, CAST(MAX(load) AS BIGINT) AS peak_concurrency FROM (
  SELECT event_type,
         SUM(delta) OVER (PARTITION BY event_type ORDER BY t, delta
                          ROWS UNBOUNDED PRECEDING) AS load
  FROM sweep)
GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# dedup_substring_pairs — content-defined substring-level dedup
# ---------------------------------------------------------------------------

_SUB_W = 32       # window chars
_SUB_P = 16       # MOD-p selection: keep ~1/16 of windows
_SUB_MIN = 2      # pairs must share >= 2 selected shingles


def dedup_substring_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level dup pairs over the corpus: docs sharing >= 2
    content-selected 32-char windows (operators/dedup.py
    substring_shingle_pairs — MOD-p fingerprinting; catches verbatim
    span reuse whole-doc MinHash dilutes away)."""
    from kmeans_mapreduce_spark.operators.dedup import substring_shingle_pairs

    return substring_shingle_pairs(
        _docs(spark, sf_dir), "doc_id", "text",
        window=_SUB_W, mod_p=_SUB_P, min_shared=_SUB_MIN,
    ).orderBy("doc_a", "doc_b")


SUBSTRING_PAIRS_SQL = f"""
WITH sel AS (
  SELECT DISTINCT doc_id, h FROM (
    SELECT doc_id, md5(substr(text, s, {_SUB_W})) AS h FROM (
      SELECT doc_id, text,
             unnest(generate_series(1, length(text) - {_SUB_W - 1}, 1)) AS s
      FROM documents WHERE length(text) >= {_SUB_W}))
  WHERE ('0x' || substr(h, 1, 4))::BIGINT % {_SUB_P} = 0)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
FROM sel a JOIN sel b ON a.h = b.h AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING COUNT(*) >= {_SUB_MIN}
ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# hybrid_search_rrf — lexical BM25 + vector cosine, reciprocal-rank fusion
# ---------------------------------------------------------------------------

_RRF_K = 60          # standard RRF damping constant
_RRF_DEPTH = 15      # per-leg candidate depth
_RRF_TOP = 10


def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical leg + cosine vector leg, fused by
    reciprocal-rank fusion  rrf = Σ 1/(60 + rank_leg)  over the union
    of both top-15 lists (docs missing from a leg contribute nothing
    for it) — the standard fusion rule behind production RAG stacks.

    The lexical leg IS text_bm25_rank (fixed 3-term query); the vector
    leg is exact cosine against doc 0's embedding (doc_id == vec_id in
    the harness corpus), self excluded.  Rank ties broken by doc_id in
    both legs so fusion input is engine-stable.

    Scale shape: each leg is its own already-audited plan (BM25: two
    token aggs + TakeOrdered; cosine: broadcast one query vector,
    TakeOrdered); fusion joins two 15-row frames — driver-negligible.
    Swap the brute vector leg for ann_ivf/pq at corpus scale; fusion
    is depth-bounded either way."""
    from kmeans_mapreduce_spark.functions.distance import cosine_similarity
    from kmeans_mapreduce_spark.plans.pipeline_queries import (
        _embs,
        text_bm25_rank,
    )

    w_lex = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    lex = (
        text_bm25_rank(spark, sf_dir)
        .withColumn("rank_lex", F.row_number().over(w_lex))
        .select("doc_id", "rank_lex")
    )

    e = _embs(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.where(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    w_vec = Window.orderBy(F.desc("score"), F.asc("vec_id"))
    vec = (
        e.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine_similarity(F.col("v"), F.col("qv")), 6).alias("score"),
        )
        .withColumn("rank_vec", F.row_number().over(w_vec))
        .where(F.col("rank_vec") <= _RRF_DEPTH)
        .select(F.col("vec_id").alias("doc_id"), "rank_vec")
    )

    fused = lex.join(vec, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce("rank_lex", F.lit(0)).alias("rank_lex"),
        F.coalesce("rank_vec", F.lit(0)).alias("rank_vec"),
        F.round(
            F.coalesce(1.0 / (_RRF_K + F.col("rank_lex")), F.lit(0.0))
            + F.coalesce(1.0 / (_RRF_K + F.col("rank_vec")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    return fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(_RRF_TOP)


from kmeans_mapreduce_spark.plans.pipeline_queries import (  # noqa: E402
    BM25_SQL,
    _dot_sql,
)

HYBRID_RRF_SQL = f"""
WITH lex AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rank_lex
  FROM ({BM25_SQL})),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
qv AS (SELECT v AS q FROM e WHERE vec_id = 0),
vec AS (
  SELECT doc_id, rank_vec FROM (
    SELECT e.vec_id AS doc_id,
           ROW_NUMBER() OVER (
             ORDER BY ROUND(({_dot_sql('e.v', 'qv.q')})
               / (SQRT({_dot_sql('e.v', 'e.v')}) * SQRT({_dot_sql('qv.q', 'qv.q')})), 6) DESC,
             e.vec_id ASC) AS rank_vec
    FROM e CROSS JOIN qv WHERE e.vec_id != 0)
  WHERE rank_vec <= {_RRF_DEPTH})
SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
       COALESCE(rank_lex, 0) AS rank_lex,
       COALESCE(rank_vec, 0) AS rank_vec,
       ROUND(COALESCE(1.0 / ({_RRF_K} + rank_lex), 0.0)
           + COALESCE(1.0 / ({_RRF_K} + rank_vec), 0.0), 6) AS rrf
FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
ORDER BY rrf DESC, doc_id ASC LIMIT {_RRF_TOP}
"""


# ---------------------------------------------------------------------------
# corpus_drift_psi — population stability index vs a reference source
# ---------------------------------------------------------------------------

_PSI_REF = "src0"
_PSI_BUCKETS = 5
_PSI_SMOOTH = 0.5


def corpus_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: population stability index of every
    source's quality-score distribution against the reference source —
    the check a continuously-ingesting corpus runs to catch a crawler
    or filter change shifting the data.

        psi = Σ_buckets (p_i - q_i) · ln(p_i / q_i)

    over 5 fixed quality buckets with +0.5 Laplace smoothing (so empty
    buckets stay finite and the expression is engine-exact).

    Scale shape: one pass scores + buckets every doc (map-only exprs),
    one (source, bucket) count agg, then the tiny grid math: buckets ×
    sources rows.  The dense grid is built by cross-joining the
    source list with a literal bucket range so missing buckets
    contribute their smoothed mass — no data-dependent shape."""
    d = _docs(spark, sf_dir)
    bucket = F.least(
        F.floor(TXT.quality_score("text") * _PSI_BUCKETS).cast("int"),
        F.lit(_PSI_BUCKETS - 1),
    )
    counts = (
        d.select("source", bucket.alias("bucket"))
        .groupBy("source", "bucket")
        .agg(F.count("*").alias("n"))
    )
    sources = d.select("source").distinct()
    grid = sources.crossJoin(
        spark.range(_PSI_BUCKETS).select(F.col("id").cast("int").alias("bucket"))
    )
    dense = (
        grid.join(counts, ["source", "bucket"], "left")
        .select("source", "bucket", F.coalesce("n", F.lit(0)).alias("n"))
        .withColumn("tot", F.sum("n").over(Window.partitionBy("source")))
        .withColumn(
            "p",
            (F.col("n") + _PSI_SMOOTH)
            / (F.col("tot") + _PSI_SMOOTH * _PSI_BUCKETS),
        )
    )
    ref = dense.where(F.col("source") == _PSI_REF).select(
        "bucket", F.col("p").alias("q")
    )
    return (
        dense.where(F.col("source") != _PSI_REF)
        .join(ref, "bucket")
        .groupBy("source")
        .agg(
            F.round(
                F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))),
                6,
            ).alias("psi")
        )
        .select(
            "source",
            "psi",
            F.when(F.col("psi") < 0.1, "stable")
            .when(F.col("psi") < 0.25, "moderate")
            .otherwise("shifted")
            .alias("drift"),
        )
        .orderBy("source")
    )


CORPUS_PSI_SQL = f"""
WITH bucketed AS (
  SELECT source,
         LEAST(CAST(FLOOR({_QUALITY} * {_PSI_BUCKETS}) AS INT), {_PSI_BUCKETS - 1}) AS bucket
  FROM documents),
counts AS (SELECT source, bucket, COUNT(*) AS n FROM bucketed GROUP BY 1, 2),
grid AS (
  SELECT s.source, b.bucket
  FROM (SELECT DISTINCT source FROM documents) s
  CROSS JOIN (SELECT unnest(range({_PSI_BUCKETS}))::INT AS bucket) b),
dense AS (
  SELECT grid.source, grid.bucket, COALESCE(counts.n, 0) AS n
  FROM grid LEFT JOIN counts USING (source, bucket)),
probs AS (
  SELECT source, bucket,
         (n + {_PSI_SMOOTH})
           / (SUM(n) OVER (PARTITION BY source) + {_PSI_SMOOTH} * {_PSI_BUCKETS}) AS p
  FROM dense),
ref AS (SELECT bucket, p AS q FROM probs WHERE source = '{_PSI_REF}')
SELECT source, psi,
       CASE WHEN psi < 0.1 THEN 'stable'
            WHEN psi < 0.25 THEN 'moderate'
            ELSE 'shifted' END AS drift
FROM (
  SELECT probs.source,
         ROUND(SUM((p - q) * LN(p / q)), 6) AS psi
  FROM probs JOIN ref USING (bucket)
  WHERE probs.source != '{_PSI_REF}'
  GROUP BY probs.source)
ORDER BY source
"""
