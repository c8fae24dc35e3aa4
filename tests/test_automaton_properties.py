"""Hypothesis property suite for the Aho-Corasick automaton (r13 —
7th target of the property-suite pattern).  Over a tiny alphabet
(overlaps and nestings abound) the one-pass automaton count must equal
the brute-force all-positions count for EVERY pattern, including
duplicate patterns, patterns that are proper suffixes/prefixes of each
other, and single-char patterns.  Pure-Python target — no Spark."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from starryskyqueryengine_spark.functions.automaton import (
    ac_count,
    build_aho_corasick,
)

_AL = "abc"
_pattern = st.text(alphabet=_AL, min_size=1, max_size=5)


def _brute(text: str, patterns: list[str]) -> list[int]:
    return [
        sum(1 for i in range(len(text)) if text.startswith(p, i))
        for p in patterns
    ]


@settings(max_examples=300, deadline=None)
@given(
    patterns=st.lists(_pattern, min_size=1, max_size=6),
    text=st.text(alphabet=_AL, max_size=60),
)
def test_ac_counts_match_brute_force(patterns, text):
    goto, fail, out = build_aho_corasick(patterns)
    assert ac_count(text, goto, fail, out, len(patterns)) == _brute(
        text, patterns
    )


def test_ac_nested_suffix_and_duplicate_patterns():
    pats = ["ab", "b", "ab", "aab", "a"]
    goto, fail, out = build_aho_corasick(pats)
    text = "aababab"
    assert ac_count(text, goto, fail, out, len(pats)) == _brute(text, pats)
