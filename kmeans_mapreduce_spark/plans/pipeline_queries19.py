"""Round-13 pipeline queries (batch 37): the BATCH FACE of the
composed corpus-curation pipeline as one oracle-certified catalog row.

streaming/corpus_pipeline.py composes triage -> frozen boosted quality
filter -> incremental dedup -> content-addressed shard export into one
micro-batch topology; its stream-vs-replay equality is gated by tests
and the 100x stress harness.  This module certifies the chain's
SQL-expressible core against DuckDB: the SAME frozen ensemble literals
(FROZEN_QUALITY_ENSEMBLE — the triples quality_boost_fit's certified
5-round run produces), the same vote semantics (ensemble_vote_expr,
i.e. the serving path's own code), exact canonical dedup
(lowest doc_id per md5 fingerprint), and the same content-addressed
shard assignment, read out per shard.  The near-dup stage is
deliberately OUT of this row — online near-dedup is arrival-order
state (certified by the stream==replay gates and the
dedup_minhash_recall family), not a batch SQL program.

No analog in the reference (beyond-reference mandated surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.functions.text import fingerprint
from kmeans_mapreduce_spark.plans.pipeline_queries import (
    _BLANK,
    _TOKS_ALL,
    _docs,
)
from kmeans_mapreduce_spark.plans.pipeline_queries17 import (
    _ST_HB,
    _SW_SQL,
    with_doc_features,
)
from kmeans_mapreduce_spark.streaming.boost_stream import ensemble_vote_expr
from kmeans_mapreduce_spark.streaming.corpus_pipeline import (
    FROZEN_QUALITY_ENSEMBLE,
    content_shard,
)

_CC_SHARDS = 8


def corpus_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter -> exact-canonical-dedup -> content-shard the documents
    table with the production pipeline's own building blocks, and read
    the result out per shard: doc count, token volume, and two
    checksums (id sum and a fingerprint-prefix sum) that pin WHICH
    docs landed in WHICH shard, not just how many.

    Every stage is the pipeline's shared code — the feature derivation
    is the trainer's `with_doc_features`, the vote the serving path's
    `ensemble_vote_expr` over the frozen 5-round triples, the shard the
    exporter's `content_shard` — so this row drifts iff the deployed
    pipeline drifts.

    Scale shape: per-row expressions into ONE hash shuffle on the
    fingerprint (the canonical-dedup window, key space = distinct
    texts) and a second on the 8-value shard key for the readout agg;
    no join, nothing driver-sized.  At 100 TB both shuffles are the
    minimum the semantics admit (dedup must co-locate equal texts)."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    kept = (
        with_doc_features(docs)
        .where(ensemble_vote_expr(FROZEN_QUALITY_ENSEMBLE) > 0)
        .select(
            "doc_id",
            # x[33] IS the token count, by the trainer's certified
            # feature layout (pipeline_queries17: _ST_LEN_J = 33)
            F.col("x")[33].cast("long").alias("ntok"),
            fingerprint("text").alias("fp"),
        )
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    canon = (
        kept.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    return (
        canon.withColumn("shard", content_shard(F.col("fp"), _CC_SHARDS))
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ntok").alias("n_tokens"),
            F.sum("doc_id").alias("id_chk"),
            F.sum(
                F.conv(F.substring("fp", 1, 8), 16, 10).cast("long")
            ).alias("txt_chk"),
        )
        .orderBy("shard")
    )


def _vote_sql() -> str:
    """The frozen ensemble's vote as SQL, generated FROM the same
    literal triples the Spark face serves — feature j maps to the
    trainer's derivation (h4 = hashed-bucket-4 token count, 32 = the
    per-1024 stopword ratio, 33 = the token count)."""
    expr = {4: "h4", 32: "1024 * nsw // nt", 33: "nt"}
    legs = []
    for r in FROZEN_QUALITY_ENSEMBLE:
        e, t = expr[r["j"]], r["theta"]
        op = ">=" if r["ge_is_pos"] else "<"
        legs.append(f"CASE WHEN {e} {op} {t} THEN 1 ELSE -1 END")
    return "\n        + ".join(legs)


CORPUS_CURATION_SQL = f"""
WITH toks AS (
  SELECT doc_id, text, {_TOKS_ALL} AS tk
  FROM documents WHERE NOT ({_BLANK})),
feats AS (
  SELECT doc_id, text, len(tk) AS nt,
         len(list_filter(tk, t -> list_contains({_SW_SQL}, t))) AS nsw,
         len(list_filter(list_transform(tk,
               t -> CAST(('0x' || substr(md5(t), 1, 4))::BIGINT % {_ST_HB}
                         AS INT)),
             h -> h = 4)) AS h4
  FROM toks),
kept AS (
  SELECT doc_id, nt AS ntok, md5(text) AS fp
  FROM feats
  WHERE ({_vote_sql()}) > 0),
canon AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
    FROM kept)
  WHERE rn = 1)
SELECT CAST(('0x' || substr(fp, 1, 4))::BIGINT % {_CC_SHARDS} AS INT)
         AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(ntok) AS BIGINT) AS n_tokens,
       CAST(SUM(doc_id) AS BIGINT) AS id_chk,
       CAST(SUM(('0x' || substr(fp, 1, 8))::BIGINT) AS BIGINT) AS txt_chk
FROM canon
GROUP BY 1
ORDER BY shard
"""
