"""Text-analysis column builders: tokenization, quality, lang-id,
fingerprints.  Pure Catalyst expressions (no UDFs) so they run in
whole-stage codegen and have exact DuckDB-SQL oracles.

Beyond-reference surface (the reference engine is numeric-only); these
are the text ops a training-data pipeline runs over billions of docs,
so every one of them is a per-row expression — embarrassingly parallel,
no shuffle, scales linearly with input splits.

Tokenization policy (shared with the SQL oracles): lowercase, trim,
split on runs of whitespace.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language function-word sets for the n-gram/stopword heuristic
# language identifier.  Deliberately small + frozen: the point is a
# deterministic, SQL-reproducible heuristic, not linguistic accuracy.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "with"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "de": ("der", "die", "und", "das", "ist", "ein", "mit", "von"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est"),
}

STOPWORDS_EN = LANG_MARKERS["en"] + ("for", "on", "it", "this", "that")

PUNCT_CLASS = "[.,;:!?]"


# The tokenization whitespace class, chosen to mean the SAME thing in
# Java regex (Spark), RE2 (DuckDB oracles) and Python re (tests): the
# ASCII set minus vertical tab (Java \s includes \x0B, RE2's doesn't —
# so \s is NOT portable and is never used here).
WS_CLASS = "[ \\t\\n\\f\\r]"


def tokens(text: Column | str) -> Column:
    """array<string> of lowercase whitespace tokens; [] for blank text.

    trim is regexp-based: SQL trim() strips only ' ' (a '\\r' document
    would otherwise split into two empty tokens — found by hypothesis)."""
    c = F.col(text) if isinstance(text, str) else text
    t = F.regexp_replace(F.lower(c), f"^{WS_CLASS}+|{WS_CLASS}+$", "")
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, f"{WS_CLASS}+")
    )


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def char_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.length(c)


def punct_ratio(text: Column | str) -> Column:
    """punctuation chars / total chars (0 for empty text)."""
    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c)
    p = F.regexp_count(c, F.lit(PUNCT_CLASS))
    return F.when(n == 0, F.lit(0.0)).otherwise(p.cast("double") / n.cast("double"))


def stopword_ratio(text: Column | str, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    """fraction of tokens that are (English) stopwords; 0 if no tokens."""
    toks = tokens(text)
    sw = F.array(*[F.lit(w) for w in stopwords])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    n = F.size(toks)
    return F.when(n == 0, F.lit(0.0)).otherwise(hits.cast("double") / n.cast("double"))


def lang_marker_score(text: Column | str, lang: str) -> Column:
    """# tokens that are function words of `lang`."""
    toks = tokens(text)
    sw = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def lang_id(text: Column | str) -> Column:
    """Heuristic language id: argmax of marker-word hits, first-listed
    language wins ties, 'und' (undetermined) when no marker hits at all.

    The CASE order is fixed (en, es, de, fr) so the SQL oracle can
    reproduce the tie-break exactly.
    """
    scores = {lg: lang_marker_score(text, lg) for lg in LANG_MARKERS}
    best = F.greatest(*scores.values())
    expr = F.when(best == 0, F.lit("und"))
    for lg in LANG_MARKERS:  # dict order == declaration order == tie-break
        expr = expr.when(scores[lg] == best, F.lit(lg))
    return expr


def quality_score(text: Column | str) -> Column:
    """Deterministic doc-quality heuristic in [0,1]:
    0.4 * min(tokens,100)/100  +  0.3 * (1 - punct_ratio)
    + 0.3 * min(stopword_ratio * 4, 1).

    Length rewards substance, low punctuation density rewards prose
    (vs markup/tables), a floor of stopwords rewards natural language
    (pure keyword lists score low).  All double arithmetic, identical
    term order in the SQL oracle.
    """
    len_term = F.least(token_count(text).cast("double"), F.lit(100.0)) / F.lit(100.0)
    punct_term = F.lit(1.0) - punct_ratio(text)
    sw_term = F.least(stopword_ratio(text) * F.lit(4.0), F.lit(1.0))
    return F.lit(0.4) * len_term + F.lit(0.3) * punct_term + F.lit(0.3) * sw_term


def fingerprint(text: Column | str) -> Column:
    """128-bit content fingerprint as lowercase hex (md5 of raw bytes).

    Exact-dedup key that is stable across engines — DuckDB's md5() hex
    output matches byte-for-byte.
    """
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(c.cast("binary"))


def word_shingles(text: Column | str, n: int = 2) -> Column:
    """distinct n-token shingles (space-joined), [] when < n tokens.

    Same set as the DuckDB oracle's list_transform(range(...), i ->
    toks[i] || ' ' || toks[i+1]) construction (all consumers are
    order-insensitive: hashing, intersect/union sizes).

    Construction detail that matters: the token array is bound ONCE per
    row via transform-over-a-singleton (the Catalyst "let" idiom), and
    shingles come from zip_with over shifted slices.  The naive
    element_at(toks, i+j) lambda re-inlines the whole tokenization
    expression per shingle element — measured ~2x-per-shingle wall-clock
    on corpus-wide passes.
    """
    toks = tokens(text)

    def build(t: Column) -> Column:
        length = F.greatest(F.size(t) - F.lit(n - 1), F.lit(0))
        sh = F.slice(t, 1, length)
        for j in range(1, n):
            sh = F.zip_with(
                sh, F.slice(t, 1 + j, length), lambda a, b: F.concat(a, F.lit(" "), b)
            )
        return F.array_distinct(sh)

    return F.element_at(F.transform(F.array(toks), build), 1)


# BPE-ish subword-boundary pattern: letter runs, digit runs, single
# punctuation/symbol chars.  Deliberately lookahead-free (RE2, used by
# the DuckDB oracles, has no lookahead) and ASCII-classed so Java regex
# and RE2 agree.  Approximates a GPT-2-style pre-tokenizer's piece count
# closely enough for corpus unit-economics.
BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\f\\r]"


def bpe_token_count(text: Column | str) -> Column:
    """# of BPE-ish pieces in lowercased text (see BPE_PATTERN)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(F.lower(c), F.lit(BPE_PATTERN))


# PII patterns: Java-regex ∩ RE2 common subset (no backrefs, no
# lookaround) so Spark and the DuckDB oracles compile the identical
# automaton.  Replace order is pinned (email -> ipv4 -> phone): emails
# contain dots/digits and IPv4s contain digit-dash-adjacent runs, so a
# different order could corrupt later matches.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b\d{3}-\d{4}\b"
_PII_ORDERED = (
    (PII_EMAIL, "<EMAIL>"),
    (PII_IPV4, "<IP>"),
    (PII_PHONE, "<PHONE>"),
)


def pii_counts(text: Column | str) -> Column:
    """struct(n_email, n_ip, n_phone): per-kind PII match counts."""
    c = F.col(text) if isinstance(text, str) else text
    return F.struct(
        F.regexp_count(c, F.lit(PII_EMAIL)).alias("n_email"),
        F.regexp_count(c, F.lit(PII_IPV4)).alias("n_ip"),
        F.regexp_count(c, F.lit(PII_PHONE)).alias("n_phone"),
    )


def pii_scrub(text: Column | str) -> Column:
    """Text with every PII match replaced by its typed placeholder."""
    c = F.col(text) if isinstance(text, str) else text
    for pat, rep in _PII_ORDERED:
        c = F.regexp_replace(c, pat, rep)
    return c
