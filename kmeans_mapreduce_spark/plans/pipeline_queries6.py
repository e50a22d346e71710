"""Pipeline queries, round-4 batch 6: bigram-LM quality scoring,
count-min sketches, weighted sampling, PMI co-occurrence, and PCA.

Five more operator families a 100 TB training-data platform runs that
the reference engine (numeric K-Means MapReduce, SURVEY §1) has no
analog for:

  * lm_bigram_logprob — a smoothed bigram language model trained on
    the corpus itself, scoring each document's mean token log-prob:
    the CCNet/Gopher-style "perplexity filter" that separates fluent
    text from boilerplate/noise.
  * sketch_countmin_tokens — mergeable count-min sketches of token
    frequencies built per source and merged, with point estimates vs
    exact counts: the fixed-size frequency structure used when exact
    per-token counts no longer fit (companion to the HLL rollup in
    plans/analytics.py).
  * sample_weighted_bychars — Efraimidis–Spirakis weighted sampling
    without replacement (k per source, weight = n_chars): the
    deterministic "sample proportional to token mass" primitive behind
    mixture construction.
  * docs_pmi_pairs — pointwise mutual information over token
    co-occurrence (doc-level), vocabulary-bounded: the association
    miner for tokenizer/phrase induction.
  * embedding_pca_power — top principal component of the embedding
    covariance via an unrolled 3-step power iteration: the projection
    axis for drift monitors and 2-D corpus maps (feeds the scatter
    sink, sources/plots.py).

All pure Catalyst (no Python in any hot path); every query has an
exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.functions import text as TXT
from kmeans_mapreduce_spark.plans.pipeline_queries import (
    _BLANK,
    _TOKS_ALL,
    _docs,
    _embs,
)

# DuckDB-side tokens-with-position source (the lateral_pos_tokens
# convention, relational_ext2.py): generate_subscripts + unnest stay
# aligned on the same list.
_TOK_POS_SRC = f"""
SELECT doc_id,
       generate_subscripts(toks, 1) AS pos,
       unnest(toks) AS tok
FROM (SELECT doc_id, CASE WHEN {_BLANK} THEN [] ELSE {_TOKS_ALL} END AS toks
      FROM documents)
"""


# --- bigram language-model scoring ------------------------------------------

def lm_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Add-one-smoothed bigram LM trained on the whole corpus, then
    every doc scored by its mean bigram log-probability; the 15
    lowest-scoring (most "surprising") docs are reported — the
    perplexity-style quality filter of CCNet-family pipelines.

    Plan: bigrams come from zip_with over adjacent slices of the token
    array (scan-local, no positional self-join); the LM is two
    vocabulary-sized count tables (bigram + unigram-head), so at 100 TB
    the model tables broadcast into the scoring join while the corpus
    stays put — scoring is map-side after two bounded shuffles.
    """
    d = _docs(spark, sf_dir)
    toks = TXT.tokens("text")
    bigrams = d.select(
        "doc_id",
        F.explode(
            F.when(
                F.size(toks) >= 2,
                F.zip_with(
                    F.slice(toks, 1, F.size(toks) - 1),
                    F.slice(toks, 2, F.size(toks) - 1),
                    lambda a, b: F.struct(a.alias("head"), b.alias("tail")),
                ),
            )
        ).alias("bg"),
    ).select("doc_id", F.col("bg.head").alias("head"), F.col("bg.tail").alias("tail"))

    c2 = bigrams.groupBy("head", "tail").agg(F.count("*").alias("c2"))
    c1 = bigrams.groupBy("head").agg(F.count("*").alias("c1"))
    v = (
        d.select(F.explode(toks).alias("tok"))
        .agg(F.countDistinct("tok").alias("v"))
    )
    scored = (
        bigrams.join(F.broadcast(c2), ["head", "tail"])
        .join(F.broadcast(c1), "head")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(
                F.avg(F.log((F.col("c2") + 1) / (F.col("c1") + F.col("v")))), 6
            ).alias("avg_logprob"),
        )
    )
    return scored.orderBy("avg_logprob", "doc_id").limit(15)


LM_BIGRAM_SQL = f"""
WITH tp AS ({_TOK_POS_SRC}),
bigrams AS (
  SELECT a.doc_id, a.tok AS head, b.tok AS tail
  FROM tp a JOIN tp b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
c2 AS (SELECT head, tail, COUNT(*) AS c2 FROM bigrams GROUP BY 1, 2),
c1 AS (SELECT head, COUNT(*) AS c1 FROM bigrams GROUP BY 1),
v AS (SELECT COUNT(DISTINCT tok) AS v FROM tp)
SELECT doc_id, COUNT(*) AS n_bigrams,
       ROUND(AVG(LN((c2.c2 + 1) / (c1.c1 + v.v))), 6) AS avg_logprob
FROM bigrams
JOIN c2 USING (head, tail)
JOIN c1 USING (head)
CROSS JOIN v
GROUP BY doc_id
ORDER BY avg_logprob, doc_id LIMIT 15
"""


# --- count-min sketch -------------------------------------------------------

_CMS_W = 64          # buckets per hash row
_CMS_SEEDS = (0, 1, 2)   # d = 3 independent hash rows
_CMS_PROBES = ("join", "hash", "vector", "stream", "quantum")


def _cms_bucket(tok: F.Column, seed: int) -> F.Column:
    """Portable bucket: first 4 md5 hex digits of 'seed:token' mod W —
    identical arithmetic in Spark and DuckDB (the sample_train_split
    convention)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), tok)), 1, 4), 16, 10
    ).cast("int")
    return (h % _CMS_W).alias(f"b{seed}")


def sketch_countmin_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch of token frequencies: each source builds its
    own (3 x 64) sketch, the sketches merge by elementwise sum (the
    mergeability that makes CMS a distributed-rollup structure), and a
    fixed probe list is estimated from the merged sketch next to the
    exact count — est >= exact is the CMS guarantee the test pins.

    Plan: sketch build is ONE shuffle of at most sources*3*64 rows
    (the agg key is (seed, bucket) — fixed fan-in regardless of corpus
    size); the merge is a second agg over that bounded table; probes
    are a broadcast lookup.  Exact counts exist here only as the
    audit column.
    """
    d = _docs(spark, sf_dir)
    toks = d.select("source", F.explode(TXT.tokens("text")).alias("tok"))
    per_seed = [
        toks.select(
            "source",
            F.lit(s).alias("seed"),
            _cms_bucket(F.col("tok"), s).alias("bucket"),
        )
        for s in _CMS_SEEDS
    ]
    rows = per_seed[0]
    for p in per_seed[1:]:
        rows = rows.unionAll(p)
    # Stage 1: one fixed-size sketch per source; stage 2: elementwise
    # merge (sum) — the same two-level rollup shape as the HLL weekly
    # union, demonstrating CMS mergeability rather than collapsing the
    # two aggs algebraically.
    per_source = rows.groupBy("source", "seed", "bucket").agg(
        F.count("*").alias("cnt")
    )
    merged = per_source.groupBy("seed", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )

    probes = spark.createDataFrame(
        [(t,) for t in _CMS_PROBES], ["token"]
    ).select(
        "token",
        *[_cms_bucket(F.col("token"), s) for s in _CMS_SEEDS],
    )
    est = probes
    for s in _CMS_SEEDS:
        m = merged.where(F.col("seed") == s).select(
            F.col("bucket").alias(f"b{s}"), F.col("cnt").alias(f"c{s}")
        )
        est = est.join(F.broadcast(m), f"b{s}", "left")
    exact = toks.groupBy(F.col("tok").alias("token")).agg(
        F.count("*").alias("exact")
    )
    return (
        est.select(
            "token",
            F.least(
                *[F.coalesce(F.col(f"c{s}"), F.lit(0)) for s in _CMS_SEEDS]
            ).alias("est"),
        )
        .join(F.broadcast(exact), "token", "left")
        .select(
            "token",
            "est",
            F.coalesce("exact", F.lit(0)).alias("exact"),
            (F.col("est") - F.coalesce("exact", F.lit(0))).alias("overcount"),
        )
        .orderBy("token")
    )


_CMS_BUCKET_SQL = (
    "(('0x' || substr(md5('{seed}:' || {tok}), 1, 4))::BIGINT % " + str(_CMS_W) + ")"
)
_CMS_PROBE_VALUES = ", ".join(f"('{t}')" for t in _CMS_PROBES)


def _cms_sql() -> str:
    seeds_union = "\nUNION ALL\n".join(
        f"SELECT {s} AS seed, {_CMS_BUCKET_SQL.format(seed=s, tok='tok')} AS bucket"
        " FROM toks" for s in _CMS_SEEDS
    )
    probe_cols = ", ".join(
        f"{_CMS_BUCKET_SQL.format(seed=s, tok='token')} AS b{s}"
        for s in _CMS_SEEDS
    )
    est_joins = "\n".join(
        f"LEFT JOIN merged m{s} ON m{s}.seed = {s} AND m{s}.bucket = p.b{s}"
        for s in _CMS_SEEDS
    )
    least = ", ".join(f"COALESCE(m{s}.cnt, 0)" for s in _CMS_SEEDS)
    return f"""
WITH toks AS (
  SELECT unnest(CASE WHEN {_BLANK} THEN [] ELSE {_TOKS_ALL} END) AS tok
  FROM documents),
rows_ AS ({seeds_union}),
merged AS (SELECT seed, bucket, COUNT(*) AS cnt FROM rows_ GROUP BY 1, 2),
probes AS (SELECT token, {probe_cols} FROM (VALUES {_CMS_PROBE_VALUES}) t(token)),
exact AS (SELECT tok AS token, COUNT(*) AS exact FROM toks GROUP BY 1)
SELECT p.token,
       LEAST({least}) AS est,
       COALESCE(e.exact, 0) AS exact,
       LEAST({least}) - COALESCE(e.exact, 0) AS overcount
FROM probes p
{est_joins}
LEFT JOIN exact e ON e.token = p.token
ORDER BY p.token
"""


CMS_SQL = _cms_sql()


# --- weighted sampling without replacement ----------------------------------

_WS_K = 3  # samples per source


def sample_weighted_bychars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis–Spirakis weighted sampling without replacement: per
    source, keep the k=3 docs with the smallest key = -ln(u)/w, where
    w = n_chars and u is a deterministic md5-derived uniform — "sample
    proportional to size" for mixture construction, reproducible on
    any engine/partitioning (rand(seed) is not: it is
    partition-dependent).

    Plan: key is a per-row expression; per-source top-k is one window
    shuffle on source.  No data-dependent state."""
    d = _docs(spark, sf_dir)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("double")
        + 1.0
    ) / 65537.0
    key = -F.log(u) / F.col("n_chars")
    w = Window.partitionBy("source").orderBy("key", "doc_id")
    return (
        d.select("source", "doc_id", "n_chars", key.alias("key"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _WS_K)
        .select(
            "source",
            "rank",
            "doc_id",
            "n_chars",
            F.round("key", 8).alias("key"),
        )
        .orderBy("source", "rank")
    )


WEIGHTED_SAMPLE_SQL = f"""
WITH keyed AS (
  SELECT source, doc_id, n_chars,
         -LN((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
              + 1.0) / 65537.0) / n_chars AS key
  FROM documents),
ranked AS (
  SELECT source, doc_id, n_chars, key,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY key, doc_id) AS rank
  FROM keyed)
SELECT source, rank, doc_id, n_chars, ROUND(key, 8) AS key
FROM ranked WHERE rank <= {_WS_K}
ORDER BY source, rank
"""


# --- PMI co-occurrence ------------------------------------------------------

_PMI_VOCAB = 30   # pair mining restricted to the top-30 tokens
_PMI_TOP = 20


def docs_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-level PMI: restrict to the 30 globally most frequent tokens,
    count in how many docs each ordered pair (a < b) co-occurs, and
    rank pairs by co-occurrence with their PMI — the phrase/association
    miner behind tokenizer merges and topic seeds.

    Plan: vocabulary selection is a bounded top-k (30 rows broadcast);
    the pair join then runs on per-doc DISTINCT vocab hits (<= 30 rows
    per doc), so the quadratic step is bounded by vocab size per doc,
    never by doc length — the same blocking idea as
    linkage_fuzzy_parts.  Two shuffles total (doc tokens agg, pair
    agg)."""
    d = _docs(spark, sf_dir)
    n_docs = d.count()  # scalar dimension, computed once (tiny scan)
    toks = d.select("doc_id", F.explode(TXT.tokens("text")).alias("tok"))
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "tok")
        .limit(_PMI_VOCAB)
    )
    hits = toks.join(F.broadcast(vocab.select("tok")), "tok").distinct()
    df_tok = hits.groupBy("tok").agg(F.count("*").alias("df"))
    a = hits.select("doc_id", F.col("tok").alias("a"))
    b = hits.select("doc_id", F.col("tok").alias("b"))
    pairs = (
        a.join(b, "doc_id")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("co_docs"))
    )
    return (
        pairs.join(
            F.broadcast(df_tok.select(F.col("tok").alias("a"), F.col("df").alias("df_a"))),
            "a",
        )
        .join(
            F.broadcast(df_tok.select(F.col("tok").alias("b"), F.col("df").alias("df_b"))),
            "b",
        )
        .select(
            "a",
            "b",
            "co_docs",
            F.round(
                F.log(
                    F.lit(float(n_docs))
                    * F.col("co_docs")
                    / (F.col("df_a") * F.col("df_b"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("co_docs"), "a", "b")
        .limit(_PMI_TOP)
    )


PMI_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(CASE WHEN {_BLANK} THEN [] ELSE {_TOKS_ALL} END) AS tok
  FROM documents),
vocab AS (
  SELECT tok FROM (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY 1)
  ORDER BY cnt DESC, tok LIMIT {_PMI_VOCAB}),
hits AS (SELECT DISTINCT doc_id, tok FROM toks JOIN vocab USING (tok)),
df_tok AS (SELECT tok, COUNT(*) AS df FROM hits GROUP BY 1),
n AS (SELECT COUNT(*)::DOUBLE AS n_docs FROM documents),
pairs AS (
  SELECT a.tok AS a, b.tok AS b, COUNT(*) AS co_docs
  FROM hits a JOIN hits b ON a.doc_id = b.doc_id AND a.tok < b.tok
  GROUP BY 1, 2)
SELECT a, b, co_docs,
       ROUND(LN(n.n_docs * co_docs / (da.df * db.df)), 6) AS pmi
FROM pairs
JOIN df_tok da ON da.tok = a
JOIN df_tok db ON db.tok = b
CROSS JOIN n
ORDER BY co_docs DESC, a, b LIMIT {_PMI_TOP}
"""


# --- PCA via power iteration ------------------------------------------------

_PCA_ITERS = 3
_PCA_DIM = 64
_PCA_REPORT_DIMS = 8


def embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding covariance matrix via a
    fixed 3-step power iteration from the uniform unit vector — the
    projection axis drift monitors and 2-D corpus maps use.  Output:
    the first 8 loadings plus the Rayleigh-quotient eigenvalue
    estimate.

    Plan: the covariance is accumulated as outer products — posexplode
    twice, ONE shuffle onto 64x64=4096 keys (at 100 TB this is the
    textbook tree-aggregation: partial sums per partition, fixed-size
    merge; the d x d result is model-sized, so every later matvec join
    broadcasts).  Fixed iteration count + fixed init keep the result
    engine-reproducible; the oracle unrolls the same three matvecs as
    CTEs, like PAGERANK_SQL."""
    e = _embs(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    n = e.count()  # model-shape scalar (row count), one cheap scan
    long = e.select(
        "vec_id", F.posexplode("v").alias("i", "xi")
    )
    mean = long.groupBy("i").agg(F.avg("xi").alias("m"))
    prod = (
        long.alias("a")
        .join(long.alias("b"), "vec_id")
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(F.sum(F.col("a.xi") * F.col("b.xi")).alias("s"))
    )
    cov = (
        prod.join(F.broadcast(mean.select(F.col("i"), F.col("m").alias("mi"))), "i")
        .join(
            F.broadcast(
                mean.select(F.col("i").alias("j"), F.col("m").alias("mj"))
            ),
            "j",
        )
        .select(
            "i",
            "j",
            ((F.col("s") - F.lit(float(n)) * F.col("mi") * F.col("mj")) / n).alias(
                "c"
            ),
        )
    )
    vec = _spark_range_vec(spark)  # v0: uniform unit vector
    for _ in range(_PCA_ITERS):
        mv = (
            cov.join(F.broadcast(vec.select(F.col("idx").alias("j"), "x")), "j")
            .groupBy("i")
            .agg(F.sum(F.col("c") * F.col("x")).alias("y"))
        )
        norm = mv.agg(F.sqrt(F.sum(F.col("y") * F.col("y"))).alias("nrm"))
        vec = mv.crossJoin(F.broadcast(norm)).select(
            F.col("i").alias("idx"), (F.col("y") / F.col("nrm")).alias("x")
        )
    cv = (
        cov.join(F.broadcast(vec.select(F.col("idx").alias("j"), "x")), "j")
        .groupBy("i")
        .agg(F.sum(F.col("c") * F.col("x")).alias("cv"))
    )
    eig = (
        cv.join(F.broadcast(vec.select(F.col("idx").alias("i"), "x")), "i")
        .agg(F.sum(F.col("cv") * F.col("x")).alias("eig"))
    )
    return (
        vec.crossJoin(F.broadcast(eig))
        .where(F.col("idx") < _PCA_REPORT_DIMS)
        .select(
            F.col("idx").alias("dim_idx"),
            F.round("x", 5).alias("loading"),
            F.round("eig", 4).alias("eigenvalue"),
        )
        .orderBy("dim_idx")
    )


def _spark_range_vec(spark: SparkSession) -> DataFrame:
    import math

    x0 = 1.0 / math.sqrt(_PCA_DIM)
    return spark.range(_PCA_DIM).select(
        F.col("id").cast("int").alias("idx"), F.lit(x0).alias("x")
    )


def _pca_sql() -> str:
    import math

    x0 = repr(1.0 / math.sqrt(_PCA_DIM))
    parts = [
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),",
        "n AS (SELECT COUNT(*)::DOUBLE AS n FROM e),",
        "long AS (SELECT vec_id, generate_subscripts(v, 1) - 1 AS i,"
        " unnest(v) AS xi FROM e),",
        "mean AS (SELECT i, AVG(xi) AS m FROM long GROUP BY i),",
        "prod AS (SELECT a.i AS i, b.i AS j, SUM(a.xi * b.xi) AS s"
        " FROM long a JOIN long b ON a.vec_id = b.vec_id GROUP BY 1, 2),",
        "cov AS (SELECT p.i, p.j, (p.s - n.n * ma.m * mb.m) / n.n AS c"
        " FROM prod p JOIN mean ma ON ma.i = p.i"
        " JOIN mean mb ON mb.i = p.j CROSS JOIN n),",
        f"v0 AS (SELECT i AS idx, {x0} AS x FROM mean),",
    ]
    for it in range(_PCA_ITERS):
        parts.append(
            f"mv{it} AS (SELECT cov.i, SUM(cov.c * v{it}.x) AS y"
            f" FROM cov JOIN v{it} ON v{it}.idx = cov.j GROUP BY cov.i),"
        )
        parts.append(
            f"nrm{it} AS (SELECT SQRT(SUM(y * y)) AS nrm FROM mv{it}),"
        )
        parts.append(
            f"v{it + 1} AS (SELECT i AS idx, y / nrm AS x FROM mv{it}"
            f" CROSS JOIN nrm{it}),"
        )
    last = f"v{_PCA_ITERS}"
    parts.append(
        f"cv AS (SELECT cov.i, SUM(cov.c * {last}.x) AS cv"
        f" FROM cov JOIN {last} ON {last}.idx = cov.j GROUP BY cov.i),"
    )
    parts.append(
        f"eig AS (SELECT SUM(cv.cv * {last}.x) AS eig"
        f" FROM cv JOIN {last} ON {last}.idx = cv.i)"
    )
    parts.append(
        f"SELECT idx AS dim_idx, ROUND(x, 5) AS loading,"
        f" ROUND(eig.eig, 4) AS eigenvalue"
        f" FROM {last} CROSS JOIN eig"
        f" WHERE idx < {_PCA_REPORT_DIMS} ORDER BY dim_idx"
    )
    return "\n".join(parts)


PCA_SQL = _pca_sql()
