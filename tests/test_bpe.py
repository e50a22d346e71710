"""Distributed BPE training: exact merge-sequence parity with a pure
Python reference, encode parity, determinism."""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.operators import bpe as BPE


def ref_bpe(words: list[tuple[str, int]], n: int):
    """Reference BPE: same tie-break (freq desc, then pair asc)."""
    vocab: dict[tuple, int] = collections.defaultdict(int)
    for w, c in words:
        vocab[tuple(w)] += c
    merges = []
    for _ in range(n):
        pc: collections.Counter = collections.Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (a, b), freq = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, freq))
        new: dict[tuple, int] = collections.defaultdict(int)
        for syms, c in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            new[tuple(out)] += c
        vocab = new
    return merges, vocab


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


def test_bpe_matches_reference(docs):
    words = [(r["word"], r["wc"]) for r in BPE.word_counts(docs).collect()]
    expect, _ = ref_bpe(words, 8)
    merges, vocab = BPE.bpe_train(docs, n_merges=8)
    got = [(m.left, m.right, m.freq) for m in merges]
    assert got == expect
    # ranks are sequential and merged = left + right
    assert [m.rank for m in merges] == list(range(len(merges)))
    assert all(m.merged == m.left + m.right for m in merges)


def test_bpe_encode_matches_reference_application(docs):
    words = [(r["word"], r["wc"]) for r in BPE.word_counts(docs).collect()]
    merges, _ = BPE.bpe_train(docs, n_merges=6)

    def ref_apply(word: str) -> list[str]:
        out = list(word)
        for m in merges:
            nxt: list[str] = []
            for s in out:
                if nxt and nxt[-1] == m.left and s == m.right:
                    nxt[-1] = m.merged
                else:
                    nxt.append(s)
            out = nxt
        return out

    sample = [w for w, _ in sorted(words)[:50] if w]
    df = docs.sparkSession.createDataFrame([(w,) for w in sample], "word string")
    enc = {r["word"]: list(r["pieces"]) for r in BPE.bpe_encode(df, merges).collect()}
    for w in sample:
        assert enc[w] == ref_apply(w), w


def test_bpe_deterministic(docs):
    a, _ = BPE.bpe_train(docs, n_merges=4)
    b, _ = BPE.bpe_train(docs, n_merges=4)
    assert [(m.left, m.right, m.freq) for m in a] == [
        (m.left, m.right, m.freq) for m in b
    ]


def test_bpe_symbol_count_shrinks_like_reference(docs):
    """Each merge round shrinks the weighted corpus by exactly what the
    pure-Python reference application removes.  (NOT `sum(m.freq)`: for
    a self-overlapping merge — left==right inside a run of >=3 — pair
    counting counts overlaps ('aaa' contributes 2 to (a,a)) while greedy
    application merges non-overlapping occurrences only, so raw freq
    over-states the reduction on such corpora.)"""
    words = [(r["word"], r["wc"]) for r in BPE.word_counts(docs).collect()]
    total0 = sum(len(w) * c for w, c in words)
    _, ref_vocab = ref_bpe(words, 5)
    ref_total1 = sum(len(syms) * c for syms, c in ref_vocab.items())
    merges, vocab = BPE.bpe_train(docs, n_merges=5)
    total1 = vocab.select(
        F.sum(F.size("symbols") * F.col("wc")).alias("t")
    ).collect()[0]["t"]
    assert total0 - total1 == total0 - ref_total1
    # for merges with left != right the raw-freq identity DOES hold
    assert total0 - total1 >= sum(
        m.freq for m in merges if m.left != m.right
    )


def test_bpe_pieces_concat_to_word(docs):
    """Encoding never loses characters: concat(pieces) == word."""
    merges, vocab = BPE.bpe_train(docs, n_merges=8)
    bad = vocab.where(
        F.concat_ws("", F.col("symbols")) != F.col("word")
    ).count()
    assert bad == 0
