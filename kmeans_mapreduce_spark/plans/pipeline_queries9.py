"""Pipeline queries, round-5 batch 19: corpus-statistics operators for
training-data planning.

Three more LLM-pipeline stages with no analog in the reference engine
(numeric K-Means MapReduce, SURVEY §1):

  * docs_ngram_novelty       — first-occurrence novelty accounting: what
    fraction of each source's 3-gram stream is globally novel (first
    seen there) vs repeated from earlier documents — the corpus-level
    memorization-pressure metric behind dedup ROI estimates.
  * pipeline_token_budget_epochs — data-constrained mixing plan
    (Muennighoff et al. 2023 shape): given a total token budget and
    per-source weights, compute each source's target allocation and
    the repetition factor (epochs) it implies over the available
    unique tokens.
  * text_zipf_fit            — per-language Zipf's-law fit: OLS slope of
    ln(freq) on ln(rank) over the top-100 token frequencies (healthy
    natural-language corpora sit near slope -1; templated/boilerplate
    slices flatten).

Exactness: counts/ranks are integers; ln() arguments are integers so
both engines see identical doubles; every sum of doubles is
accumulated as DECIMAL(38,18) (the shuffle-order rule); divisions that
feed ROUND happen on the decimal-exact sums.
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

_NOV_N = 3  # novelty n-gram width


def docs_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source n-gram novelty: of each source's distinct-per-doc
    3-gram occurrences, how many are the gram's GLOBAL first
    occurrence (owner = min doc_id across the corpus)?  Sources full
    of already-seen grams are where dedup/decontamination budgets pay
    off; novel-heavy sources add entropy.

    Output per source: docs, gram occurrences, novel occurrences,
    novelty ratio, and an id-sum checksum over each gram's owning doc
    (so the oracle verifies WHICH docs own their grams' first sight).

    Scale shape: gram fan-out is map-side; ownership is one partial
    agg (min doc_id) keyed by the gram, which re-joins the occurrence
    stream on the same key — two shuffles total, both hash-partitioned
    on the gram.  At 100 TB you'd hash grams to 8 bytes to shrink the
    shuffle (the oracle keeps strings so both engines agree for free);
    volume stays linear in gram count."""
    toks = TXT.tokens("text")
    base = _docs(spark, sf_dir).select(
        "doc_id", "source", toks.alias("toks")
    )
    grams = base.select(
        "doc_id",
        "source",
        F.explode(
            F.when(
                F.size("toks") >= _NOV_N,
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - (_NOV_N - 1)),
                    lambda i: F.concat_ws(" ", F.slice("toks", i, _NOV_N)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("g"),
    ).distinct()
    owners = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    occ = grams.join(owners, "g").withColumn(
        "novel", F.col("doc_id") == F.col("first_doc")
    )
    return (
        occ.groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("gram_occurrences"),
            F.sum(F.col("novel").cast("bigint")).alias("novel_occurrences"),
            F.round(
                F.sum(F.col("novel").cast("bigint"))
                / F.count("*").cast("double"),
                6,
            ).alias("novelty_ratio"),
            F.coalesce(
                F.sum(F.when(F.col("novel"), F.col("doc_id"))), F.lit(0)
            ).alias("novel_owner_id_sum"),
        )
        .orderBy("source")
    )


NGRAM_NOVELTY_SQL = f"""
WITH base AS (
  SELECT doc_id, source, {_TOKS_ALL} AS toks FROM documents),
grams AS (
  SELECT DISTINCT doc_id, source, g FROM (
    SELECT doc_id, source, unnest(gs) AS g FROM (
      SELECT doc_id, source,
             [array_to_string(list_slice(toks, i, i + {_NOV_N - 1}), ' ')
              for i in range(1, greatest(len(toks) - {_NOV_N - 2}, 1))] AS gs
      FROM base))),
owners AS (SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY g),
occ AS (
  SELECT gr.doc_id, gr.source, (gr.doc_id = o.first_doc) AS novel
  FROM grams gr JOIN owners o USING (g))
SELECT source,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS gram_occurrences,
       CAST(SUM(CASE WHEN novel THEN 1 ELSE 0 END) AS BIGINT)
         AS novel_occurrences,
       ROUND(CAST(SUM(CASE WHEN novel THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS novelty_ratio,
       CAST(COALESCE(SUM(CASE WHEN novel THEN doc_id END), 0) AS BIGINT)
         AS novel_owner_id_sum
FROM occ
GROUP BY source
ORDER BY source
"""


# --- data-constrained token-budget plan ----------------------------------

_BUDGET_X = 4  # total budget = 4x the corpus's available token mass


def pipeline_token_budget_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-constrained mixing plan: share a total token budget of
    4x the corpus across sources proportionally to their mixture
    weights (the pipeline_mixture_schedule 3/2/1 scheme), then report
    the repetition factor — epochs, in integer milli-epochs — each
    source must run over its available unique tokens to meet its
    allocation (the Muennighoff et al. 2023 "repeat or dilute"
    decision table).

    epochs_milli = ceil(target * 1000 / available): >1000 means the
    source repeats (diminishing returns territory), <1000 means it is
    under-sampled relative to what it could supply.

    All-integer arithmetic -> exact cross-engine; the global budget
    scalar rides an unpartitioned window over the 20-row source
    aggregate (never the corpus), so there is no data-sized global
    sort and no nested-loop join.

    Scale shape: one partial-agg shuffle on source; everything after
    runs on |sources| rows."""
    toks_n = TXT.token_count("text")
    per_source = (
        _docs(spark, sf_dir)
        .select(
            "source",
            toks_n.alias("n_tok"),
            F.when(F.col("source").like("%0"), F.lit(3))
            .when(F.col("source").like("%1"), F.lit(2))
            .otherwise(F.lit(1))
            .alias("weight"),
        )
        .groupBy("source", "weight")
        .agg(F.sum("n_tok").cast("bigint").alias("available"))
    )
    w_all = Window.partitionBy()
    planned = (
        # available=0 (a source whose every doc is blank) would make the
        # oracle's integer division error and Spark yield NULL — exclude
        # those rows identically on both sides before dividing.
        per_source.where(F.col("available") > 0)
        .withColumn("total_avail", F.sum("available").over(w_all))
        .withColumn("w_total", F.sum("weight").over(w_all))
        # exact integer `div` on both terms (not double `/` + bigint
        # cast, which diverges from the oracle's `//` once the product
        # exceeds 2^53)
        .withColumn(
            "target",
            F.expr(
                f"(cast({_BUDGET_X} as bigint) * total_avail * weight)"
                " div w_total"
            ),
        )
        .withColumn(
            "epochs_milli",
            F.expr("(target * 1000 + available - 1) div available"),
        )
    )
    return planned.select(
        "source",
        "weight",
        "available",
        "target",
        "epochs_milli",
        (F.col("target") > F.col("available")).alias("repeats"),
    ).orderBy("source")


_NTOK_SQL = f"CASE WHEN {_BLANK} THEN 0 ELSE len({_TOKS_ALL}) END"

TOKEN_BUDGET_SQL = f"""
WITH per_source AS (
  SELECT source,
         CASE WHEN source LIKE '%0' THEN 3
              WHEN source LIKE '%1' THEN 2 ELSE 1 END AS weight,
         SUM({_NTOK_SQL}) AS available
  FROM documents GROUP BY 1, 2),
planned AS (
  SELECT source, weight, available,
         ({_BUDGET_X} * SUM(available) OVER () * weight)
           // SUM(weight) OVER () AS target
  FROM per_source WHERE available > 0)
SELECT source, CAST(weight AS INT) AS weight,
       CAST(available AS BIGINT) AS available,
       CAST(target AS BIGINT) AS target,
       CAST((target * 1000 + available - 1) // available AS BIGINT)
         AS epochs_milli,
       target > available AS repeats
FROM planned
ORDER BY source
"""


# --- Zipf's-law fit -------------------------------------------------------

_ZIPF_TOP = 100


def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Zipf's-law fit: OLS of ln(freq) on ln(rank) over
    the top-100 token frequencies.  Natural language sits near slope
    -1; machine-generated/templated text flattens toward 0 — a
    corpus-health metric next to text_char_entropy and
    text_repetition_score.

    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2), intercept = (Sy -
    slope*Sx)/n, fitted on DECIMAL-exact sums of ln() terms whose
    arguments are exact integers (rank, count) — so both engines fit
    the identical regression bit-for-bit before the final ROUND.

    Scale shape: one word-count shuffle per (lang, token), a per-lang
    top-100 rank window (top-k per group, not a global sort), then the
    regression collapses each language to one row of sufficient
    statistics via a partial agg.  At 100 TB the only heavy stage is
    the word count, which is the canonical partial-agg shape."""
    toks = TXT.tokens("text")
    counts = (
        _docs(spark, sf_dir)
        .select("lang", F.explode(toks).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count("*").alias("c"))
    )
    ranked = counts.withColumn(
        "r",
        F.row_number().over(
            Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("tok"))
        ),
    ).where(F.col("r") <= _ZIPF_TOP)
    terms = ranked.select(
        "lang",
        F.log(F.col("r").cast("double")).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    )
    sums = terms.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("x").cast("decimal(38,18)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,18)")).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,18)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,18)")).alias("sxx"),
    )
    slope = (
        F.col("n").cast("double") * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    ) / (
        F.col("n").cast("double") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    return (
        sums.withColumn("slope", slope)
        .select(
            "lang",
            "n",
            F.round("slope", 6).alias("zipf_slope"),
            F.round(
                (
                    F.col("sy").cast("double")
                    - F.col("slope") * F.col("sx").cast("double")
                )
                / F.col("n").cast("double"),
                6,
            ).alias("zipf_intercept"),
        )
        .orderBy("lang")
    )


ZIPF_SQL = f"""
WITH counts AS (
  SELECT lang, tok, COUNT(*) AS c FROM (
    SELECT lang, unnest({_TOKS_ALL}) AS tok FROM documents)
  GROUP BY lang, tok),
ranked AS (
  SELECT lang, c,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY c DESC, tok) AS r
  FROM counts QUALIFY r <= {_ZIPF_TOP}),
terms AS (
  SELECT lang,
         LN(CAST(r AS DOUBLE)) AS x,
         LN(CAST(c AS DOUBLE)) AS y
  FROM ranked),
sums AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(x AS DECIMAL(38,18))) AS sx,
         SUM(CAST(y AS DECIMAL(38,18))) AS sy,
         SUM(CAST(x * y AS DECIMAL(38,18))) AS sxy,
         SUM(CAST(x * x AS DECIMAL(38,18))) AS sxx
  FROM terms GROUP BY lang),
fit AS (
  SELECT lang, n, sx, sy,
         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope
  FROM sums)
SELECT lang, n,
       ROUND(slope, 6) AS zipf_slope,
       ROUND((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE), 6) AS zipf_intercept
FROM fit
ORDER BY lang
"""
