"""Blocked fuzzy record linkage: approximate string join without the
all-pairs cartesian.

The classic entity-resolution pattern: (1) collapse records to their
distinct entity strings with counts, (2) generate candidate pairs only
WITHIN a cheap blocking key (an equi-join, never a nested loop), (3)
verify candidates with an exact edit-distance predicate.  Same
candidates-then-verify scheme as dedup_minhash / dedup_simhash
(operators/dedup.py), specialized to short entity strings where
Levenshtein is the right metric and a blocking key is available.

The reference engine has no string surface at all; this is mandated
beyond-reference scope.  Scale posture: the distinct-entity collapse is
one agg shuffle that shrinks N records to V vocabulary rows (V << N for
entity columns); the candidate join shuffles V rows on the block key;
skew = the largest block squared, so pick a block with bounded
frequency (or salt it).  Verification is JVM levenshtein — codegen, no
Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fuzzy_join_blocked(
    records: DataFrame,
    text_col: str,
    block_expr: Column,
    max_dist: int = 3,
) -> DataFrame:
    """Candidate pairs of distinct ``text_col`` values sharing a block,
    verified by ``levenshtein <= max_dist``.

    Returns [name_a, name_b, dist, n_a, n_b] with name_a < name_b
    (each unordered pair once), n_* = record counts behind each entity
    string.  ``block_expr`` is evaluated against ``records`` columns
    (e.g. a token, a phonetic code, a prefix)."""
    vocab = (
        records.groupBy(F.col(text_col).alias("name"), block_expr.alias("blk"))
        .agg(F.count("*").alias("n"))
    )
    a = vocab.select(
        F.col("name").alias("name_a"), F.col("blk"), F.col("n").alias("n_a")
    )
    b = vocab.select(
        F.col("name").alias("name_b"),
        F.col("blk").alias("blk_b"),
        F.col("n").alias("n_b"),
    )
    return (
        a.join(b, (a.blk == b.blk_b) & (a.name_a < b.name_b))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .where(F.col("dist") <= max_dist)
        .select("name_a", "name_b", "dist", "n_a", "n_b")
    )
