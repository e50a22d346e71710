"""Pipeline queries, round-4 batch 5: RAG document chunking, blocked
fuzzy record linkage, and snapshot diff.

Each is a distinct operator family a 100 TB training-data platform
needs and the reference engine (a K-Means MapReduce, SURVEY §1) lacks
entirely: chunking feeds retrieval indexes, linkage resolves entity
duplicates that exact dedup misses, snapshot diff audits table
versions.  All three are pure Catalyst (no Python in the hot path)
with DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.plans.pipeline_queries import _docs


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- RAG chunking: overlapping character windows ----------------------------

CHUNK_LEN = 120
CHUNK_STRIDE = 80  # 40-char overlap between consecutive chunks


def pipeline_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split every document into overlapping character windows
    (len=120, stride=80), keeping (doc_id, chunk_idx, start) provenance
    — the standard retrieval-index prep step.

    Pure Catalyst map stage: sequence() builds the start offsets from
    n_chars (no second pass over text), explode fans out, substring
    slices.  Zero shuffles — at 100 TB this pipelines into whatever
    sink or embedding stage follows at full scan speed.  Chunk count
    per doc is ceil(n_chars/stride), data-dependent, never collected.
    """
    d = _docs(spark, sf_dir)
    return (
        d.select(
            "doc_id",
            "text",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("n_chars") - 1, F.lit(0)),
                    F.lit(CHUNK_STRIDE),
                )
            ).alias("start"),
        )
        .select(
            "doc_id",
            (F.col("start") / CHUNK_STRIDE).cast("bigint").alias("chunk_idx"),
            F.col("start").cast("bigint").alias("start"),
            F.expr(f"substring(text, start + 1, {CHUNK_LEN})").alias("chunk"),
        )
        .withColumn("chunk_len", F.length("chunk").cast("bigint"))
    )


DOC_CHUNKS_SQL = f"""
SELECT doc_id,
       CAST(start / {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
       CAST(start AS BIGINT) AS start,
       substring(text, start + 1, {CHUNK_LEN}) AS chunk,
       CAST(length(substring(text, start + 1, {CHUNK_LEN})) AS BIGINT)
         AS chunk_len
FROM (SELECT doc_id, text,
             unnest(generate_series(0, GREATEST(n_chars - 1, 0),
                                    {CHUNK_STRIDE})) AS start
      FROM documents)
"""


# --- Blocked fuzzy record linkage -------------------------------------------

def linkage_fuzzy_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate part-name pairs: block on the name's noun token,
    verify with levenshtein <= 3 (operators/linkage.py pattern —
    candidates from an equi-join on the block key, never all-pairs).

    The distinct-name collapse shrinks 2k part rows to the 64-name
    vocabulary BEFORE pairing, so the quadratic step runs on vocabulary
    size, not record count — the property that keeps this alive at
    100 TB (entity vocabularies grow sublinearly in records)."""
    from kmeans_mapreduce_spark.operators.linkage import fuzzy_join_blocked

    p = _t(spark, sf_dir, "part")
    pairs = fuzzy_join_blocked(
        p, "p_name", F.element_at(F.split("p_name", " "), 2), max_dist=3
    )
    return pairs.orderBy("name_a", "name_b")


LINKAGE_SQL = """
WITH vocab AS (
  SELECT p_name AS name, split_part(p_name, ' ', 2) AS blk,
         COUNT(*) AS n
  FROM part GROUP BY 1, 2
)
SELECT a.name AS name_a, b.name AS name_b,
       levenshtein(a.name, b.name) AS dist,
       a.n AS n_a, b.n AS n_b
FROM vocab a JOIN vocab b ON a.blk = b.blk AND a.name < b.name
WHERE levenshtein(a.name, b.name) <= 3
ORDER BY name_a, name_b
"""


# --- Snapshot diff ----------------------------------------------------------

def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit report between two versions of the orders table: the 'new'
    snapshot is a deterministic mutation of the shipped one (drop keys
    %97==0, reprice keys %31==0, append %113==0 clones under fresh
    keys), so both engines derive identical inputs from the same
    parquet.  Output: per-status row counts from
    operators/diff.snapshot_diff — one full-outer shuffle on the key,
    4-row result."""
    from kmeans_mapreduce_spark.operators.diff import diff_summary

    old = _t(spark, sf_dir, "orders")
    base = old.where(F.col("o_orderkey") % 97 != 0)
    repriced = base.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 31 == 0, F.round(F.col("o_totalprice") * 1.1, 2)
        ).otherwise(F.col("o_totalprice")),
    )
    appended = old.where(F.col("o_orderkey") % 113 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + 10_000_000
    )
    new = repriced.unionByName(appended)
    return diff_summary(
        old, new, keys=["o_orderkey"], compare_cols=["o_totalprice", "o_orderstatus"]
    )


SNAPSHOT_DIFF_SQL = """
WITH new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 31 = 0 THEN ROUND(o_totalprice * 1.1, 2)
              ELSE o_totalprice END AS o_totalprice,
         o_orderstatus
  FROM orders WHERE o_orderkey % 97 <> 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 113 = 0
), old AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
)
SELECT CASE WHEN old.o_orderkey IS NULL THEN 'added'
            WHEN new.o_orderkey IS NULL THEN 'removed'
            WHEN old.o_totalprice IS NOT DISTINCT FROM new.o_totalprice
             AND old.o_orderstatus IS NOT DISTINCT FROM new.o_orderstatus
            THEN 'unchanged' ELSE 'changed' END AS diff_status,
       COUNT(*) AS n
FROM old FULL OUTER JOIN new USING (o_orderkey)
GROUP BY 1 ORDER BY 1
"""
