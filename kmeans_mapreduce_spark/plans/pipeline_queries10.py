"""Pipeline queries, round-5 batch 20: pipeline-evaluation and
release-governance operators.

  * events_watermark_audit — late-data accounting for a streaming
    deployment: per hourly window, how many events a 10-minute
    watermark would have delivered vs dropped, under a deterministic
    per-event arrival delay.  The batch-computable audit you run
    BEFORE picking a production watermark.
  * dp_noisy_counts — differentially-private release counts: Laplace
    noise via the inverse-CDF of a hash-derived uniform (deterministic
    here so the oracle can verify the mechanism's arithmetic exactly;
    a production release would draw real randomness through the same
    plan shape).
  * ann_lsh_recall — retrieval-quality evaluation as a first-class
    query: recall@5 of the multi-table hyperplane LSH path against the
    exact brute-force top-5, per query vector.  Turns the test-suite
    recall pin into a driver-visible, oracle-checked artifact.

Exactness notes: watermark arithmetic is pure integer epoch-micros;
the DP uniform is an exactly-representable dyadic rational so ln() of
it matches bit-for-bit across engines (the lm_bigram precedent); the
recall join inherits the shared (rounded score, id) tiebreak both
ANN queries already use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.operators import similarity as SIM
from kmeans_mapreduce_spark.plans.pipeline_queries import (
    _embs,
    _dot_sql,
    _lsh_buckets_union,
)
from kmeans_mapreduce_spark.plans.pipeline_queries2 import _bucket
from kmeans_mapreduce_spark.plans.relational import _events

_WM_DELAY_US = 600 * 1_000_000  # 10-minute watermark
_ARRIVAL_MOD_S = 900  # deterministic transport delay in [0, 900) s
_HOUR_US = 3_600 * 1_000_000


def events_watermark_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark lateness audit: replay the events table as if each
    event arrived `md5(event_id) % 900` seconds after its event time,
    and report — per hourly event-time window — what a 10-minute
    watermark would deliver vs drop (arrival after window_end +
    watermark misses the window's final emission).  This is the
    planning query behind `withWatermark("ts", "10 minutes")` in
    streaming/windows.py: the drop column IS the data-loss cost of
    that watermark choice at the observed delay distribution.

    All lateness arithmetic in integer epoch-micros (exact
    cross-engine); the dropped-id checksum verifies WHICH events a
    streaming run would lose, not just how many.

    Scale shape: one partial-agg shuffle keyed by the hour window;
    delay/lateness are per-row codegen.  At 100 TB this is the same
    single-pass shape as any windowed count."""
    ev = _events(spark, sf_dir).select(
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "hour"
        ),
    )
    arrival = F.col("us") + (
        (_bucket(F.col("event_id")) % _ARRIVAL_MOD_S).cast("bigint")
        * 1_000_000
    )
    # integer mod, not floor(us / HOUR): the double division's quotient
    # sits ~5 ulp from integer boundaries at 2024-epoch micros — legal
    # but needlessly tight; us - us % HOUR is exact bigint arithmetic.
    wend = F.col("us") - F.col("us") % _HOUR_US + _HOUR_US
    flagged = ev.withColumn(
        "dropped", arrival > wend + _WM_DELAY_US
    )
    return (
        flagged.groupBy("hour")
        .agg(
            F.count("*").alias("n_events"),
            F.sum((~F.col("dropped")).cast("bigint")).alias("delivered"),
            F.sum(F.col("dropped").cast("bigint")).alias("dropped"),
            F.coalesce(
                F.sum(F.when(F.col("dropped"), F.col("event_id"))), F.lit(0)
            ).alias("dropped_id_sum"),
        )
        .withColumn(
            "drop_rate",
            F.round(F.col("dropped") / F.col("n_events").cast("double"), 6),
        )
        .orderBy("hour")
    )


WATERMARK_AUDIT_SQL = f"""
WITH ev AS (
  SELECT event_id,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
         epoch_us(ts) AS us,
         epoch_us(ts)
           + (('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 4))::BIGINT
              % {_ARRIVAL_MOD_S}) * 1000000 AS arrival_us
  FROM events),
flagged AS (
  SELECT event_id, hour,
         arrival_us > us - (us % {_HOUR_US}) + {_HOUR_US} + {_WM_DELAY_US}
           AS dropped
  FROM ev)
SELECT hour,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN dropped THEN 0 ELSE 1 END) AS BIGINT) AS delivered,
       CAST(SUM(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT) AS dropped,
       CAST(COALESCE(SUM(CASE WHEN dropped THEN event_id END), 0) AS BIGINT)
         AS dropped_id_sum,
       ROUND(CAST(SUM(CASE WHEN dropped THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS drop_rate
FROM flagged
GROUP BY hour
ORDER BY hour
"""


# --- differentially-private release counts --------------------------------

_DP_EPS_INV = 2  # 1/epsilon (epsilon = 0.5), Laplace scale for sensitivity 1


def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private event-type counts: true count plus
    Laplace(2) noise (epsilon = 0.5, count sensitivity 1) through the
    inverse-CDF transform  noise = -(1/eps) * sign(u) * ln(1 - 2|u|),
    u uniform on (-1/2, 1/2).

    u here is hash-derived (md5 of the group key -> dyadic rational),
    which makes the release DETERMINISTIC — the right property for an
    oracle-checked test harness, and explicitly NOT a private release
    (a fixed seed leaks the true count; swap u for real randomness in
    production — the plan shape is identical).  What the oracle
    verifies is the mechanism's arithmetic: inverse-CDF, scale, and
    the count plumbing around it.

    Scale shape: one partial-agg count per group plus per-row codegen
    on the |groups|-row result."""
    ev = _events(spark, sf_dir)
    counts = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    # u = (2h + 1 - 65536) / 131072 with h = 16-bit md5 bucket: an odd
    # dyadic numerator, so u is exact, never 0, never +-1/2.
    m = (2 * _bucket(F.col("event_type")) + 1 - 65536).cast("double")
    u = m / 131072
    noise = (
        -_DP_EPS_INV
        * F.signum(u)
        * F.log(1 - 2 * F.abs(u))
    )
    return (
        counts.select(
            "event_type",
            "n",
            F.lit(0.5).alias("epsilon"),
            F.round(F.col("n") + noise, 4).alias("noisy_count"),
        )
        .orderBy("event_type")
    )


DP_NOISY_SQL = f"""
WITH counts AS (
  SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type),
mech AS (
  SELECT event_type, n,
         CAST(2 * (('0x' || substr(md5(event_type), 1, 4))::BIGINT)
              + 1 - 65536 AS DOUBLE) / 131072 AS u
  FROM counts)
SELECT event_type, CAST(n AS BIGINT) AS n,
       CAST(0.5 AS DOUBLE) AS epsilon,
       ROUND(n + (-{_DP_EPS_INV} * sign(u) * LN(1 - 2 * abs(u))), 4)
         AS noisy_count
FROM mech
ORDER BY event_type
"""


# --- LSH retrieval-quality evaluation ------------------------------------

_RECALL_Q = 50  # evaluation sample: first 50 vectors as queries
_RECALL_K = 5


def ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval evaluation: per-query recall@5 of the hyperplane-LSH
    ANN path against the exact brute-force top-5, over a 50-query
    sample.  The eval harness every ANN deployment runs after
    parameter changes (the 4-plane/4-table degradation curve in
    tests/test_dedup_similarity.py becomes a driver-visible artifact).

    Both sides rank by the shared (rounded score DESC, id) tiebreak,
    so the two top-k sets are deterministic and the recall join is
    exact.

    Scale shape: the brute side is O(Q*N) BY DESIGN and Q is a
    50-vector evaluation sample — recall eval always pays one bounded
    brute-force pass for ground truth; the LSH side is the production
    bucket equi-join.  At 100 TB you'd sample Q the same way and
    the brute side stays Q*N with Q constant."""
    e = _embs(spark, sf_dir)
    queries = e.where(F.col("vec_id") < _RECALL_Q)
    brute = SIM.brute_force_topk(
        e, queries, k=_RECALL_K, id_col="vec_id", vec_col="embedding"
    ).select("query_id", "neighbor_id")
    lsh = SIM.lsh_topk(
        e, queries, k=_RECALL_K, id_col="vec_id", vec_col="embedding", dim=64
    ).select("query_id", F.col("neighbor_id").alias("lsh_neighbor"))
    hits = brute.join(
        lsh,
        (brute.query_id == lsh.query_id)
        & (brute.neighbor_id == lsh.lsh_neighbor),
        "left",
    ).groupBy(brute.query_id.alias("query_id"))
    return (
        hits.agg(
            F.count("*").alias("k"),
            F.count("lsh_neighbor").alias("hits"),
        )
        .withColumn(
            "recall", F.round(F.col("hits") / F.col("k").cast("double"), 6)
        )
        .orderBy("query_id")
    )


ANN_RECALL_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id, v FROM e WHERE vec_id < {_RECALL_Q}),
brute_scored AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         ROUND(({_dot_sql('q.v', 'e.v')})
               / (SQRT({_dot_sql('q.v', 'q.v')}) * SQRT({_dot_sql('e.v', 'e.v')})), 6) AS score
  FROM q CROSS JOIN e WHERE q.vec_id != e.vec_id),
brute AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
    FROM brute_scored)
  WHERE rank <= {_RECALL_K}),
b AS ({_lsh_buckets_union()}),
qb AS (SELECT * FROM b WHERE vec_id < {_RECALL_Q}),
pairs AS (
  SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
  FROM qb JOIN b cb ON qb.tbl = cb.tbl AND qb.bucket = cb.bucket
  WHERE qb.vec_id <> cb.vec_id),
lsh_scored AS (
  SELECT query_id, neighbor_id,
         ROUND(({_dot_sql('a.v', 'c.v')})
               / (SQRT({_dot_sql('a.v', 'a.v')}) * SQRT({_dot_sql('c.v', 'c.v')})), 6) AS score
  FROM pairs JOIN e a ON a.vec_id = query_id JOIN e c ON c.vec_id = neighbor_id),
lsh AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
    FROM lsh_scored)
  WHERE rank <= {_RECALL_K})
SELECT b.query_id,
       CAST(COUNT(*) AS BIGINT) AS k,
       CAST(COUNT(l.neighbor_id) AS BIGINT) AS hits,
       ROUND(CAST(COUNT(l.neighbor_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         AS recall
FROM brute b
LEFT JOIN lsh l ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
GROUP BY b.query_id
ORDER BY b.query_id
"""


# --- preference-pair mining ----------------------------------------------

_PREF_GROUPS = 16  # md5 prompt-group proxy buckets per language


def pipeline_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair mining for DPO/RLHF data prep: within each
    (lang, prompt-group) bucket, pair the highest-scoring document
    (chosen) with the lowest-scoring one (rejected) under the
    pipeline_quality_classifier's integer logit, keeping groups where
    the margin is positive.  This is the comparison-data construction
    step of a preference pipeline — the grouping key stands in for the
    shared prompt, the linear score for the reward model.

    All-integer scores with (score, doc_id) window tiebreaks -> the
    chosen/rejected picks are exact cross-engine.

    Scale shape: per-row codegen for the score, ONE shuffle on the
    group key serving both rank windows (same partition key), then a
    |groups|-row projection.  At 100 TB this is the canonical
    grouped-top-1 shape — no joins, no blowup."""
    from kmeans_mapreduce_spark.functions import text as TXT
    from kmeans_mapreduce_spark.plans.pipeline_queries import _docs
    from kmeans_mapreduce_spark.plans.pipeline_queries8 import _QC_W
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    toks = TXT.tokens("text")
    sw = F.array(*[F.lit(w) for w in TXT.STOPWORDS_EN])
    z = (
        F.lit(_QC_W["bias"])
        + F.size(toks) * _QC_W["n_tokens"]
        + F.length(F.regexp_replace("text", "[^.,;:!?]", "")) * _QC_W["punct"]
        + F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        * _QC_W["stopwords"]
        + F.length(F.regexp_replace("text", "[^0-9]", "")) * _QC_W["digits"]
    ).cast("bigint")
    scored = d.select(
        "doc_id",
        "lang",
        (_bucket(F.col("doc_id")) % _PREF_GROUPS).alias("grp"),
        z.alias("score"),
    )
    w = Window.partitionBy("lang", "grp")
    best = F.row_number().over(w.orderBy(F.desc("score"), F.asc("doc_id")))
    worst = F.row_number().over(w.orderBy(F.asc("score"), F.desc("doc_id")))
    ranked = scored.select(
        "lang",
        "grp",
        "doc_id",
        "score",
        best.alias("rb"),
        worst.alias("rw"),
        F.count("*").over(w).alias("n_docs"),
    )
    chosen = ranked.where(F.col("rb") == 1).select(
        "lang",
        "grp",
        "n_docs",
        F.col("doc_id").alias("chosen_id"),
        F.col("score").alias("chosen_score"),
    )
    rejected = ranked.where(F.col("rw") == 1).select(
        "lang", "grp", F.col("doc_id").alias("rejected_id"),
        F.col("score").alias("rejected_score"),
    )
    return (
        chosen.join(rejected, ["lang", "grp"])
        .withColumn("margin", F.col("chosen_score") - F.col("rejected_score"))
        .where((F.col("n_docs") >= 2) & (F.col("margin") >= 1))
        .select(
            "lang", "grp", "n_docs", "chosen_id", "chosen_score",
            "rejected_id", "rejected_score", "margin",
        )
        .orderBy("lang", "grp")
    )


def _pref_sql() -> str:
    from kmeans_mapreduce_spark.plans.pipeline_queries import _TOKS_ALL, _BLANK
    from kmeans_mapreduce_spark.plans.pipeline_queries8 import _QC_W, _SW_LIST

    ntok = f"CASE WHEN {_BLANK} THEN 0 ELSE len({_TOKS_ALL}) END"
    return f"""
WITH scored AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
           % {_PREF_GROUPS} AS grp,
         CAST({_QC_W["bias"]}
              + ({ntok}) * {_QC_W["n_tokens"]}
              + length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * {_QC_W["punct"]}
              + len(list_filter({_TOKS_ALL}, t -> list_contains({_SW_LIST}, t)))
                * {_QC_W["stopwords"]}
              + length(regexp_replace(text, '[^0-9]', '', 'g')) * {_QC_W["digits"]}
           AS BIGINT) AS score
  FROM documents),
ranked AS (
  SELECT lang, grp, doc_id, score,
         ROW_NUMBER() OVER (PARTITION BY lang, grp ORDER BY score DESC, doc_id ASC) AS rb,
         ROW_NUMBER() OVER (PARTITION BY lang, grp ORDER BY score ASC, doc_id DESC) AS rw,
         COUNT(*) OVER (PARTITION BY lang, grp) AS n_docs
  FROM scored)
SELECT c.lang, CAST(c.grp AS BIGINT) AS grp, CAST(c.n_docs AS BIGINT) AS n_docs,
       c.doc_id AS chosen_id, CAST(c.score AS BIGINT) AS chosen_score,
       r.doc_id AS rejected_id, CAST(r.score AS BIGINT) AS rejected_score,
       CAST(c.score - r.score AS BIGINT) AS margin
FROM ranked c JOIN ranked r ON c.lang = r.lang AND c.grp = r.grp
WHERE c.rb = 1 AND r.rw = 1 AND c.n_docs >= 2 AND c.score - r.score >= 1
ORDER BY c.lang, c.grp
"""


PREFERENCE_PAIRS_SQL = _pref_sql()


# --- tokenizer fertility --------------------------------------------------


def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: BPE-ish pieces per whitespace
    word (`functions/text.bpe_token_count` over `token_count`) — the
    standard multilingual tokenizer-equity metric (fertility >> 1 for a
    language means its documents burn disproportionate sequence length,
    the signal behind vocabulary rebalancing).

    Integer piece/word sums per language; the ratio is one
    exact-integer division rounded at the end.  Per lang also: docs,
    mean pieces per doc (from the same integer sums), and the max
    single-doc fertility in integer milli-units (max over exact
    per-doc integer arithmetic — no float accumulation anywhere).

    Scale shape: per-row regexp_count codegen, one partial-agg shuffle
    on lang.  The same single-pass shape as text_token_stats."""
    from kmeans_mapreduce_spark.functions import text as TXT
    from kmeans_mapreduce_spark.plans.pipeline_queries import _docs

    d = _docs(spark, sf_dir)
    per_doc = d.select(
        "lang",
        TXT.token_count("text").alias("w"),
        TXT.bpe_token_count("text").alias("p"),
    ).withColumn(
        "fert_milli",
        F.when(F.col("w") == 0, F.lit(0)).otherwise(
            (F.col("p") * 1000 / F.col("w")).cast("bigint")
        ),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("w").alias("ws_tokens"),
            F.sum("p").alias("bpe_pieces"),
            F.max("fert_milli").alias("max_doc_fert_milli"),
        )
        .withColumn(
            "fertility",
            F.round(F.col("bpe_pieces") / F.col("ws_tokens").cast("double"), 6),
        )
        .orderBy("lang")
    )


def _fertility_sql() -> str:
    from kmeans_mapreduce_spark.functions import text as TXT
    from kmeans_mapreduce_spark.plans.pipeline_queries import _BLANK, _TOKS_ALL

    bpe = TXT.BPE_PATTERN.replace("\\", "\\\\")
    ntok = f"CASE WHEN {_BLANK} THEN 0 ELSE len({_TOKS_ALL}) END"
    return f"""
WITH per_doc AS (
  SELECT lang,
         {ntok} AS w,
         len(regexp_extract_all(lower(text), '{bpe}')) AS p
  FROM documents),
m AS (
  SELECT lang, w, p,
         CASE WHEN w = 0 THEN 0 ELSE (p * 1000) // w END AS fert_milli
  FROM per_doc)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(w) AS BIGINT) AS ws_tokens,
       CAST(SUM(p) AS BIGINT) AS bpe_pieces,
       CAST(MAX(fert_milli) AS BIGINT) AS max_doc_fert_milli,
       ROUND(CAST(SUM(p) AS DOUBLE) / CAST(SUM(w) AS DOUBLE), 6) AS fertility
FROM m
GROUP BY lang
ORDER BY lang
"""


TOKENIZER_FERTILITY_SQL = _fertility_sql()


# --- span-corruption mask planning ---------------------------------------

_SPAN_EVERY = 20  # a span starts at ~5% of positions ...
_SPAN_LEN = 3  # ... and masks 3 tokens -> ~15% corruption rate


def pipeline_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5/UL2-style span-corruption mask planning: deterministically
    select ~5% of token positions as span starts (md5 of (doc_id,
    position)), mask 3 tokens from each start (clipped at the doc end,
    overlaps unioned), and report the realized corruption statistics
    per language — the denoising-objective data-prep pass that turns a
    raw corpus into (inputs, targets) pretraining pairs.

    Hash-seeded span starts make the masks reproducible across runs,
    partitionings, and engines (the same property sample_train_split
    leans on); the oracle recomputes the identical mask union, so
    span accounting — including edge clipping and overlap merging — is
    verified exactly.

    Output per lang: docs, tokens, span starts, masked tokens (union),
    realized mask rate, and a doc_id-weighted masked-count checksum.

    Scale shape: two bounded fan-outs (positions, then 3 offsets per
    start) and one partial-agg shuffle on lang; everything is map-side
    integer/hash codegen — the canonical corpus-pass shape."""
    from kmeans_mapreduce_spark.functions import text as TXT
    from kmeans_mapreduce_spark.plans.pipeline_queries import _docs

    d = _docs(spark, sf_dir)
    base = d.select(
        "doc_id", "lang", F.size(TXT.tokens("text")).alias("n")
    )
    pos = base.where(F.col("n") >= 1).select(
        "doc_id",
        "lang",
        "n",
        F.explode(F.sequence(F.lit(1), F.col("n"))).alias("p"),
    )
    starts = pos.where(
        _bucket(F.concat_ws(":", F.col("doc_id"), F.col("p"))) % _SPAN_EVERY
        == 0
    )
    masked = (
        starts.select(
            "doc_id",
            "lang",
            "n",
            F.explode(
                F.sequence(F.col("p"), F.least(F.col("p") + (_SPAN_LEN - 1), F.col("n")))
            ).alias("mp"),
        )
        .select("doc_id", "lang", "mp")
        .distinct()
    )
    per_doc = (
        base.join(
            masked.groupBy("doc_id").agg(F.count("*").alias("masked")),
            "doc_id",
            "left",
        )
        .join(
            starts.groupBy("doc_id").agg(F.count("*").alias("spans")),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            "lang",
            "n",
            F.coalesce("masked", F.lit(0)).alias("masked"),
            F.coalesce("spans", F.lit(0)).alias("spans"),
        )
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n").alias("tokens"),
            F.sum("spans").alias("span_starts"),
            F.sum("masked").alias("masked_tokens"),
            F.sum(F.col("doc_id") * F.col("masked")).alias("mask_checksum"),
        )
        .withColumn(
            "mask_rate",
            F.round(
                F.col("masked_tokens") / F.col("tokens").cast("double"), 6
            ),
        )
        .orderBy("lang")
    )


def _span_sql() -> str:
    from kmeans_mapreduce_spark.plans.pipeline_queries import _BLANK, _TOKS_ALL

    ntok = f"CASE WHEN {_BLANK} THEN 0 ELSE len({_TOKS_ALL}) END"
    return f"""
WITH base AS (
  SELECT doc_id, lang, {ntok} AS n FROM documents),
pos AS (
  SELECT doc_id, lang, n, unnest(range(1, n + 1)) AS p
  FROM base WHERE n >= 1),
starts AS (
  SELECT doc_id, lang, n, p FROM pos
  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(p AS VARCHAR)), 1, 4))::BIGINT
        % {_SPAN_EVERY} = 0),
masked AS (
  SELECT DISTINCT doc_id, lang, mp FROM (
    SELECT doc_id, lang, unnest(range(p, LEAST(p + {_SPAN_LEN - 1}, n) + 1)) AS mp
    FROM starts)),
per_doc AS (
  SELECT b.doc_id, b.lang, b.n,
         COALESCE(m.masked, 0) AS masked,
         COALESCE(s.spans, 0) AS spans
  FROM base b
  LEFT JOIN (SELECT doc_id, COUNT(*) AS masked FROM masked GROUP BY doc_id) m
    USING (doc_id)
  LEFT JOIN (SELECT doc_id, COUNT(*) AS spans FROM starts GROUP BY doc_id) s
    USING (doc_id))
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n) AS BIGINT) AS tokens,
       CAST(SUM(spans) AS BIGINT) AS span_starts,
       CAST(SUM(masked) AS BIGINT) AS masked_tokens,
       CAST(SUM(doc_id * masked) AS BIGINT) AS mask_checksum,
       ROUND(CAST(SUM(masked) AS DOUBLE) / CAST(SUM(n) AS DOUBLE), 6) AS mask_rate
FROM per_doc
GROUP BY lang
ORDER BY lang
"""


SPAN_CORRUPTION_SQL = _span_sql()


# --- MinHash candidate-recall evaluation -----------------------------------

_MH_SETTINGS = [(32, 8), (64, 16)]  # (num_perm, bands): default + 100x scale


def dedup_minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-set recall of banded MinHash LSH vs the exact
    all-pairs shingle-Jaccard ground truth (J >= 0.8), per band
    setting — the retuning contract from the minhash_dedup_pairs
    parameter-guidance table as a driver-visible artifact (what
    ann_lsh_recall is for the ANN family).

    The oracle encodes the CONTRACT, not a re-simulation: at t=0.8 both
    the default 32-perm/8-band and the documented 100x-scale 64/16
    settings have per-pair miss probability (1-0.8^4)^b < 1e-6, and
    tests/test_dedup_similarity.py pins recall 1.0 at two corpus scales
    — so the oracle computes the ground-truth pair count in SQL and
    asserts hits == truth (recall 1.0).  If a signature/banding change
    ever drops a qualifying pair, THIS row goes red at the driver.

    Scale shape: ground truth is the O(N^2) oracle baseline (bounded
    eval corpus by design — recall eval always pays a ground-truth
    pass); each candidate side is the production banded equi-join,
    O(N * num_perm) map-side + one shuffle on (band, key)."""
    from kmeans_mapreduce_spark.operators import dedup as DD
    from kmeans_mapreduce_spark.plans.pipeline_queries import _docs

    d = _docs(spark, sf_dir)
    gt = (
        DD.ngram_jaccard_pairs(d, "doc_id", "text", threshold=0.8, n=2)
        .select("id_a", "id_b")
        .cache()
    )
    rows = []
    try:
        n_truth = gt.count()
        for num_perm, bands in _MH_SETTINGS:
            cand = DD.minhash_lsh_candidates(
                d, "doc_id", "text", num_perm=num_perm, bands=bands
            )
            hits = gt.join(cand, ["id_a", "id_b"], "left_semi").count()
            rows.append(
                (
                    num_perm,
                    bands,
                    n_truth,
                    hits,
                    round(hits / n_truth, 6) if n_truth else 1.0,
                )
            )
    finally:
        gt.unpersist()
    return spark.createDataFrame(
        rows,
        "num_perm int, bands int, n_truth bigint, n_hits bigint, recall double",
    )


def _mh_recall_sql() -> str:
    from kmeans_mapreduce_spark.plans.pipeline_queries import _JACCARD_CTE

    settings = ", ".join(f"({p}, {b})" for p, b in _MH_SETTINGS)
    return (
        _JACCARD_CTE
        + f""",
truth AS (SELECT COUNT(*) AS n_truth FROM pairs WHERE jaccard >= 0.8),
settings(num_perm, bands) AS (VALUES {settings})
SELECT CAST(num_perm AS INT) AS num_perm, CAST(bands AS INT) AS bands,
       CAST(n_truth AS BIGINT) AS n_truth,
       CAST(n_truth AS BIGINT) AS n_hits,
       1.0::DOUBLE AS recall
FROM settings CROSS JOIN truth
ORDER BY num_perm
"""
    )


MINHASH_RECALL_SQL = _mh_recall_sql()
