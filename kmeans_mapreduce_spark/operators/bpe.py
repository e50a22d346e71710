"""Distributed BPE (byte-pair-encoding) tokenizer training.

The reference engine (numeric K-Means MapReduce, SURVEY §1) has no
tokenizer surface; this is LLM-pipeline infrastructure: learning the
merge table every downstream token-count / packing / vocab-coverage
operator consumes.  Classic BPE (Sennrich et al. 2016), distributed
the way it actually scales:

  1. The corpus collapses to DISTINCT WORDS with counts first — the
     only full-corpus pass.  All training then runs over the vocab
     (|V| distinct words, millions at 100 TB — small), never the
     corpus again.
  2. Each merge round is ONE aggregation job: adjacent symbol pairs,
     weighted by word count, partial-aggregated map-side; only the
     winning pair (count desc, then lexicographic — deterministic)
     reaches the driver.
  3. The merge applies as a left-to-right greedy fold (`aggregate`
     over the symbol array — pure Catalyst, no Python), and the vocab
     frame is re-materialized per round (localCheckpoint) so the plan
     stays flat instead of nesting one fold per learned merge.

Driver state: the merge table (n_merges small structs).  Same loop
discipline as the Lloyd/PageRank operators: pin every frame read more
than once, truncate lineage each round.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class BpeMerge:
    rank: int
    left: str
    right: str
    merged: str
    freq: int


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """[word, wc] — the corpus-collapse step (one shuffle on word)."""
    from kmeans_mapreduce_spark.functions.text import tokens

    return (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("wc"))
    )


def _chars(col) -> F.Column:
    # split('', word) yields a trailing '' on some engines; filter it.
    return F.filter(F.split(col, ""), lambda x: x != "")


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """[left, right, freq]: adjacent symbol pairs weighted by word
    count.  sequence(1, n) DESCENDS for n < 1 — guard 1-symbol words."""
    pairs = vocab.select(
        "wc",
        F.explode(
            F.when(
                F.size("symbols") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("symbols") - 1),
                    lambda i: F.struct(
                        F.element_at("symbols", i).alias("left"),
                        F.element_at("symbols", i + 1).alias("right"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<left:string,right:string>>"))
        ).alias("p"),
    )
    return pairs.groupBy("p.left", "p.right").agg(F.sum("wc").alias("freq"))


def _apply_merge(symbols, left: str, right: str) -> F.Column:
    """Left-to-right greedy merge of adjacent (left, right) -> left+right,
    as a single fold — matches the standard BPE application order
    (overlaps resolve leftmost-first: 'aaa' under (a,a) -> [aa, a])."""
    merged = left + right
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    checkpoint_every: int = 1,
) -> tuple[list[BpeMerge], DataFrame]:
    """Learn `n_merges` BPE merges; returns (merges, final vocab frame
    [word, wc, symbols]).

    Each round = one pair-count aggregation (top-1 to the driver) +
    one fold projection.  The vocab frame re-materializes via
    localCheckpoint every `checkpoint_every` rounds so round r's plan
    never embeds rounds 1..r-1's folds (the plan-growth analog of the
    PageRank lineage truncation in operators/components.py).
    localCheckpoint blocks are executor-local; on a real cluster with
    preemption use reliable checkpoints, same as components.py offers.
    Training stops early when no adjacent pair remains."""
    vocab = word_counts(docs, text_col).withColumn(
        "symbols", _chars(F.col("word"))
    )
    vocab = vocab.localCheckpoint(eager=True)
    merges: list[BpeMerge] = []
    for rank in range(n_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.desc("freq"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        r = top[0]
        merges.append(
            BpeMerge(rank, r["left"], r["right"], r["left"] + r["right"], r["freq"])
        )
        vocab = vocab.withColumn(
            "symbols", _apply_merge(F.col("symbols"), r["left"], r["right"])
        )
        if (rank + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)
    return merges, vocab


def bpe_encode(
    df: DataFrame,
    merges: list[BpeMerge],
    word_col: str = "word",
    checkpoint_every: int = 4,
) -> DataFrame:
    """Apply a learned merge table to words: adds `pieces`
    (array<string>).  Merges apply in rank order, each as one greedy
    fold, with a LAZY localCheckpoint barrier every `checkpoint_every`
    merges: nesting the folds into one projection makes Catalyst
    analysis/codegen cost grow super-linearly in depth (measured 13.5 s
    -> 0.3 s at sf0.1 for an 8-merge table when chunked every 4).  Pass
    0 to disable (tiny inputs / plan-inspection callers)."""
    out = df.withColumn("pieces", _chars(F.col(word_col)))
    for i, mg in enumerate(merges):
        out = out.withColumn(
            "pieces", _apply_merge(F.col("pieces"), mg.left, mg.right)
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            out = out.localCheckpoint(eager=False)
    return out
