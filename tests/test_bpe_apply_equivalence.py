"""Property test for the pipeline_bpe_apply_fixed oracle's core claim:

two space-anchored leftmost REPLACE passes over the spaced-symbol
string are EXACTLY the greedy left-to-right merge fold, for any merge
with left != right — and the documented counterexample class
(left == right in runs >= 4) really does diverge, which is why
self-merges are excluded from the fixed merge table.

Pure Python on both sides (no Spark): the Catalyst fold and the DuckDB
REPLACE are each pinned against these references elsewhere
(tests/test_bpe.py pins the fold; the driver hash gate pins the SQL),
so this test closes the remaining edge: the EQUIVALENCE argument
itself, over adversarial symbol sequences hypothesis generates.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st


def greedy_fold(syms: list[str], left: str, right: str) -> list[str]:
    """The Catalyst _apply_merge semantics (operators/bpe.py:81)."""
    out: list[str] = []
    for s in syms:
        if out and out[-1] == left and s == right:
            out[-1] = left + right
        else:
            out.append(s)
    return out


def two_pass_replace(syms: list[str], left: str, right: str) -> list[str]:
    """The oracle's simulation (plans/pipeline_queries7._bpe_apply_sql):
    spaced-symbol string, two leftmost non-overlapping REPLACE passes
    of ' l r ' -> ' lr '."""
    s = " " + "".join(sym + " " for sym in syms)
    pat, rep = f" {left} {right} ", f" {left}{right} "
    s = s.replace(pat, rep).replace(pat, rep)
    return s.split()


# symbols drawn the way BPE produces them: single chars plus merged
# concatenations of a tiny alphabet, so cross-boundary false-match
# shapes (e.g. ['x t', 'h'] vs pattern 't h') actually occur
_SYM = st.sampled_from(["a", "b", "c", "ab", "ba", "aa", "abc", "bc"])


@given(
    syms=st.lists(_SYM, min_size=0, max_size=12),
    pair=st.tuples(_SYM, _SYM),
)
@settings(max_examples=500, deadline=None)
def test_replace_equals_fold_for_nonself_merges(syms, pair):
    left, right = pair
    if left == right:
        return  # self-merges are excluded from the fixed table by design
    assert two_pass_replace(syms, left, right) == greedy_fold(
        syms, left, right
    ), (syms, left, right)


def test_self_merge_divergence_is_real():
    """The documented counterexample: left == right over a run of >= 4
    — REPLACE pass 1 consumes a boundary and then matches the WRONG
    occurrence, so the exclusion in _FIXED_MERGES is load-bearing."""
    syms = ["a"] * 6
    assert greedy_fold(syms, "a", "a") == ["aa", "aa", "aa"]
    assert two_pass_replace(syms, "a", "a") != greedy_fold(syms, "a", "a")


def test_fixed_table_has_no_self_merges():
    from kmeans_mapreduce_spark.plans.pipeline_queries7 import _FIXED_MERGES

    assert all(left != right for left, right in _FIXED_MERGES)
