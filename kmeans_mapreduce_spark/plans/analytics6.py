"""Analytics pack 6: distribution-comparison statistics — exact
two-sample Kolmogorov–Smirnov and Benford first-digit analysis.

Scale posture (shared): both queries collapse the fact table to a
value-grain aggregate in their first shuffle (distinct values for KS,
9 digit cells for Benford); every ECDF/expectation comparison runs
over those reduced frames.  The KS statistic needs a global ordering
of DISTINCT values only — O(distinct) rows through one window, never
the raw samples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.plans.relational import _events, _t

_KS_A = "click"
_KS_B = "purchase"
# asymptotic two-sample critical coefficient at alpha = 0.05
_KS_C05 = 1.3581015157406195


def events_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample KS test: does `value` follow the same
    distribution for click vs purchase events?  D = max |ECDF_a -
    ECDF_b| evaluated at every distinct observed value — the standard
    drift/equality screen when a parametric test is unjustified.

    Plan: one aggregation to (value, n_a, n_b) — the ECDF only changes
    at observed points, so distinct-value grain is exact, not an
    approximation — then cumulative window sums and a 1-row max.  Ties
    between samples are handled by grouping BEFORE accumulating, so
    both ECDFs step together at a shared value (the textbook
    treatment)."""
    ev = _events(spark, sf_dir).where(
        F.col("event_type").isin(_KS_A, _KS_B)
    )
    per_value = ev.groupBy("value").agg(
        F.count(F.when(F.col("event_type") == _KS_A, 1)).alias("na"),
        F.count(F.when(F.col("event_type") == _KS_B, 1)).alias("nb"),
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    ecdf = per_value.select(
        (F.sum("na").over(w) / F.sum("na").over(tot)).alias("fa"),
        (F.sum("nb").over(w) / F.sum("nb").over(tot)).alias("fb"),
        F.sum("na").over(tot).alias("n_a"),
        F.sum("nb").over(tot).alias("n_b"),
    )
    crit = _KS_C05 * F.sqrt(
        (F.col("n_a") + F.col("n_b")) / (F.col("n_a") * F.col("n_b"))
    )
    return ecdf.groupBy("n_a", "n_b").agg(
        F.round(F.max(F.abs(F.col("fa") - F.col("fb"))), 6).alias("ks_stat"),
        F.round(F.max(crit), 6).alias("crit_05"),
        (F.max(F.abs(F.col("fa") - F.col("fb"))) > F.max(crit)).alias(
            "reject_same_dist"
        ),
    )


KS_SQL = f"""
WITH per_value AS (
  SELECT value,
         COUNT(*) FILTER (WHERE event_type = '{_KS_A}') AS na,
         COUNT(*) FILTER (WHERE event_type = '{_KS_B}') AS nb
  FROM events
  WHERE event_type IN ('{_KS_A}', '{_KS_B}')
  GROUP BY 1),
ecdf AS (
  SELECT SUM(na) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING)
           * 1.0 / SUM(na) OVER () AS fa,
         SUM(nb) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING)
           * 1.0 / SUM(nb) OVER () AS fb,
         SUM(na) OVER () AS n_a,
         SUM(nb) OVER () AS n_b
  FROM per_value)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       ROUND(MAX(ABS(fa - fb)), 6) AS ks_stat,
       ROUND(MAX({_KS_C05!r} * SQRT((n_a + n_b) * 1.0 / (n_a * n_b))), 6)
         AS crit_05,
       MAX(ABS(fa - fb))
         > MAX({_KS_C05!r} * SQRT((n_a + n_b) * 1.0 / (n_a * n_b)))
         AS reject_same_dist
FROM ecdf GROUP BY 1, 2
"""


def orders_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit analysis of order totals: the
    observed share of each leading digit 1..9 vs the Benford
    expectation log10(1 + 1/d) — the forensic screen for fabricated or
    constrained numeric data.

    Plan: digit extraction is a map expression, the aggregation lands
    on exactly 9 cells, and the expectation is a literal formula — one
    shuffle of 9×partitions partial rows.  (TPC-H prices are sums of
    uniform components, so they deviate from Benford — the query
    reports the deviation; it does not assert conformance.)"""
    o = _t(spark, sf_dir, "orders")
    digit = F.floor(
        F.col("o_totalprice")
        / F.pow(F.lit(10.0), F.floor(F.log10("o_totalprice")))
    ).cast("int")
    cells = o.where(F.col("o_totalprice") > 0).groupBy(
        digit.alias("digit")
    ).agg(F.count("*").alias("n"))
    tot = Window.partitionBy()
    exp_share = F.log10(1 + 1 / F.col("digit"))
    return (
        cells.select(
            "digit",
            "n",
            F.round(F.col("n") / F.sum("n").over(tot), 6).alias("obs_share"),
            F.round(exp_share, 6).alias("benford_share"),
            F.round(
                F.abs(F.col("n") / F.sum("n").over(tot) - exp_share), 6
            ).alias("abs_dev"),
        )
        .orderBy("digit")
    )


_OOV_VOCAB_K = 50


def docs_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per language against a top-K corpus
    vocabulary — the first number a tokenizer/vocab budget gets judged
    on, split by language to expose coverage skew.

    Plan: token counts (one shuffle), top-K vocab via one ordered
    limit (rank ties broken on token), BROADCAST to the per-(lang,
    token) frame for a null-checked left join, final O(langs) agg.
    The fact-grain explode is scanned once; the vocabulary never
    shuffles anything."""
    docs = _t(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "lang",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
        )
        .where(F.col("tok") != "")
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(_OOV_VOCAB_K)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    per_lang = (
        toks.groupBy("lang", "tok")
        .agg(F.count("*").alias("n"))
        .join(F.broadcast(vocab), "tok", "left")
        .groupBy("lang")
        .agg(
            F.sum("n").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), F.col("n")).otherwise(0)).alias(
                "n_oov"
            ),
        )
    )
    return per_lang.select(
        "lang",
        "n_tokens",
        "n_oov",
        F.round(F.col("n_oov") / F.col("n_tokens"), 6).alias("oov_rate"),
    ).orderBy("lang")


OOV_SQL = f"""
WITH toks AS (
  SELECT d.lang, t.tok
  FROM documents d,
       UNNEST(string_split_regex(TRIM(d.text), '\\s+')) AS t(tok)
  WHERE t.tok != ''),
vocab AS (
  SELECT tok FROM (
    SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY 1)
  ORDER BY cnt DESC, tok ASC LIMIT {_OOV_VOCAB_K}),
per_lang AS (
  SELECT lang, tok, COUNT(*) AS n FROM toks GROUP BY 1, 2)
SELECT p.lang,
       CAST(SUM(p.n) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.tok IS NULL THEN p.n ELSE 0 END) AS BIGINT)
         AS n_oov,
       ROUND(SUM(CASE WHEN v.tok IS NULL THEN p.n ELSE 0 END) * 1.0
             / SUM(p.n), 6) AS oov_rate
FROM per_lang p LEFT JOIN vocab v ON p.tok = v.tok
GROUP BY 1 ORDER BY 1
"""


BENFORD_SQL = """
WITH cells AS (
  SELECT CAST(FLOOR(o_totalprice
               / POWER(10, FLOOR(LOG10(o_totalprice)))) AS INT) AS digit,
         COUNT(*) AS n
  FROM orders WHERE o_totalprice > 0
  GROUP BY 1)
SELECT digit, n,
       ROUND(n * 1.0 / SUM(n) OVER (), 6) AS obs_share,
       ROUND(LOG10(1 + 1.0 / digit), 6) AS benford_share,
       ROUND(ABS(n * 1.0 / SUM(n) OVER () - LOG10(1 + 1.0 / digit)), 6)
         AS abs_dev
FROM cells ORDER BY digit
"""
