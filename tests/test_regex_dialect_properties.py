"""Property + curated-corpus tests for the JS->Java regex dialect
translator, against LIVE java.util.regex (the executing engine).

The hand-written dialect table produced four rounds of edge-case fixes
(\\s width r8, unflagged $ r9, [^]/[] idioms r10, . vs NEL + multiline
anchors r11 — the last found by drafting THIS suite); the generator
exists to find the fifth before a user does.

Two layers:

1. A curated corpus of (flags, pattern, subject, expected) rows whose
   expected values are derived by hand from ECMA-262 (LineTerminator is
   exactly [\\n \\r U+2028 U+2029]; WhiteSpace is TAB VT FF SP NBSP
   ZWNBSP + Zs; ``.`` excludes only LineTerminator; unflagged ``$`` is
   end-of-input; ``m`` anchors sit at every LineTerminator, \\r\\n being
   TWO terminators).  Run through js_to_java and matched by
   java.util.regex — this is the JS-semantics ground truth.
2. Hypothesis over a JS-valid-by-construction pattern grammar:
   (a) the translation always compiles under java.util.regex, and
   (b) Python ``re`` and java.util.regex agree on find() over the
       translated form — any disagreement means the translator emitted
       a dialect-ambiguous construct (the exact failure class of the
       r9 ``$``-anchor and r10 s6 ``\\z`` bugs).
"""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from starryskyqueryengine_spark.regex_dialect import js_to_java

NEL, LS, PS = chr(0x85), chr(0x2028), chr(0x2029)
NBSP, ZWNBSP, VT = chr(0xA0), chr(0xFEFF), "\x0b"


@pytest.fixture(scope="module")
def jfind(spark):
    P = spark.sparkContext._jvm.java.util.regex.Pattern

    def find(pattern: str, subject: str) -> bool:
        return bool(P.compile(pattern).matcher(subject).find())

    return find


# (flags, js_pattern, subject, expected-under-JS-semantics)
CORPUS = [
    # --- '.' excludes exactly LineTerminator; NEL/VT/FF/NBSP match ---
    ("", "a.b", "a" + NEL + "b", True),
    ("", "a.b", "a\nb", False),
    ("", "a.b", "a\rb", False),
    ("", "a.b", "a" + LS + "b", False),
    ("", "a.b", "a" + PS + "b", False),
    ("", "a.b", "a" + VT + "b", True),
    ("", "a.b", "a\fb", True),
    ("", "a.b", "a" + NBSP + "b", True),
    ("", "a.*b", "a" + NEL + NEL + "b", True),
    ("", "a.*b", "a\nb", False),
    # class-literal '.' stays literal
    ("", "a[.]b", "a.b", True),
    ("", "a[.]b", "axb", False),
    # --- dotAll: both dialects' dots match everything ---
    ("s", "a.b", "a\nb", True),
    ("s", "a.b", "a" + LS + "b", True),
    ("s", "a.b", "a" + NEL + "b", True),
    # --- unflagged $ is end-of-input only ---
    ("", "keyword$", "keyword\n", False),
    ("", "keyword$", "see keyword", True),
    ("", "^a", "a", True),
    ("", "^a", "ba", False),
    # --- m-flag anchors: JS terminator set, \r\n is TWO terminators ---
    ("m", "a$", "a\nb", True),
    ("m", "a$", "a" + LS + "b", True),
    ("m", "a$", "a" + PS + "b", True),
    ("m", "a$", "a" + NEL + "b", False),  # NEL is NOT a JS terminator
    ("m", "a$", "ab", False),
    ("m", "a$", "a\r\nb", True),  # before the \r
    ("m", "^b", "a\r\nb", True),
    ("m", "^b", "a" + NEL + "b", False),
    ("m", "^\\n", "a\r\n", True),  # JS: position between \r and \n IS a line start
    # --- \s is ECMA WhiteSpace ∪ LineTerminator ---
    ("", "a\\sb", "a" + NBSP + "b", True),
    ("", "a\\sb", "a" + ZWNBSP + "b", True),
    ("", "a\\sb", "a" + LS + "b", True),
    ("", "a\\sb", "a" + NEL + "b", False),  # NEL is Cc, not Zs
    ("", "a\\Sb", "a" + NEL + "b", True),
    # --- JS empty-class idioms ---
    ("", "x[^]y", "x\ny", True),
    ("", "x[^]y", "x" + LS + "y", True),
    ("", "a[]b", "ab", False),
    ("", "a[]*b", "ab", True),
    # --- Unicode case-insensitivity ---
    ("i", "ÄRGER", "ärger", True),
    # --- $ stays literal in class / escaped ---
    ("", "price[$]x", "price$x", True),
    ("", "cost\\$", "cost$ extra", True),
    # --- in-class '[' is a JS ClassAtom (Java: nested-class opener that
    #     rejected the pattern at validation before r14) ---
    ("", "x[a[b]y", "x[y", True),
    ("", "x[a[b]y", "xay", True),
    ("", "x[a[b]y", "xcy", False),
    ("", "v[[]w", "v[w", True),
    # --- in-class '&' / '&&' are JS literals (Java: '&&' is class
    #     INTERSECTION — untranslated, [a&&b] silently matches nothing) ---
    ("", "x[a&&b]y", "xay", True),
    ("", "x[a&&b]y", "x&y", True),
    ("", "x[a&&b]y", "xby", True),
    ("", "x[a&&b]y", "xcy", False),
    ("", "a[&]b", "a&b", True),
]


def test_curated_js_semantics_corpus(jfind):
    failures = []
    for flags, pat, subject, expected in CORPUS:
        got = jfind(js_to_java(pat, flags), subject)
        if got != expected:
            failures.append((flags, pat, subject.encode("unicode_escape"), expected, got))
    assert not failures, failures


# --- Hypothesis grammar: JS-valid patterns by construction -----------------

_LITERAL = st.text(alphabet="abcXY01 ,-", min_size=1, max_size=3).map(
    lambda s: s.replace("-", "x")  # '-' only safe outside classes; keep simple
)
_ESCAPE = st.sampled_from(
    ["\\s", "\\S", "\\d", "\\D", "\\w", "\\W", "\\.", "\\$", "\\\\", "\\n", "\\t"]
)
_CLASS = st.tuples(
    st.booleans(),
    st.lists(
        st.sampled_from(
            ["a", "b", "c", "0", "1", "x-z", "0-5", "\\s", "\\n", ",", ".",
             "[", "&"]  # JS ClassAtoms that are Java metacharacters (r14)
        ),
        min_size=1,
        max_size=3,
    ),
).map(lambda t: "[" + ("^" if t[0] else "") + "".join(t[1]) + "]")
_ATOM = st.one_of(
    _LITERAL, _ESCAPE, st.just("."), _CLASS, st.just("[^]"), st.just("[]")
)
_QUANT = st.sampled_from(["", "", "", "*", "+", "?", "{1,2}", "*?"])
_PIECE = st.tuples(_ATOM, _QUANT).map(lambda t: t[0] + t[1])


def _concat(pieces):
    return "".join(pieces)


_CONCAT = st.lists(_PIECE, min_size=1, max_size=3).map(_concat)
_ALT = st.tuples(_CONCAT, st.one_of(st.none(), _CONCAT)).map(
    lambda t: t[0] if t[1] is None else t[0] + "|" + t[1]
)
_GROUPED = st.one_of(
    _ALT,
    _ALT.map(lambda p: "(" + p + ")"),
    _ALT.map(lambda p: "(?:" + p + ")?"),
)
PATTERNS = st.tuples(st.booleans(), _GROUPED, st.booleans()).map(
    lambda t: ("^" if t[0] else "") + t[1] + ("$" if t[2] else "")
)
FLAGS = st.sampled_from(["", "i", "s", "m", "g", "ig", "im", "is", "sm", "ism"])

# Subjects: ASCII text plus every character whose classification differs
# across the dialects (terminators, NEL, the wide-whitespace family).
SUBJECTS = st.text(
    alphabet="abcXY01 ,x.$\n\r\t\f" + VT + NEL + LS + PS + NBSP + ZWNBSP,
    max_size=8,
)


@given(pat=PATTERNS, flags=FLAGS)
@settings(max_examples=150, deadline=None)
def test_translated_pattern_always_java_compilable(jfind, pat, flags):
    """Any JS-valid pattern from the grammar must translate to a
    java.util.regex-compilable pattern — compile failure at query time
    would blow up every executor task after validation already passed."""
    translated = js_to_java(pat, flags)
    jfind(translated, "probe")  # raises through py4j on a bad pattern


@given(pat=PATTERNS, flags=FLAGS, subject=SUBJECTS)
@settings(max_examples=150, deadline=None)
def test_python_and_java_agree_on_translated_pattern(jfind, pat, flags, subject):
    """Cross-dialect execution agreement on the TRANSLATED form: Python
    re (the validation proxy, \\z swapped for its \\Z spelling) and
    java.util.regex (the executor) must see the same matches — a
    disagreement means the translator emitted a construct the two
    dialects read differently (the r9 '$' failure class)."""
    translated = js_to_java(pat, flags)
    try:
        py = re.compile(translated.replace("\\z", "\\Z"))
    except re.error:
        # Python-proxy-incompilable forms (e.g. quantified (?!)) are
        # validate_pattern rejections, not execution surface
        return
    assert (py.search(subject) is not None) == jfind(translated, subject), (
        translated,
        subject.encode("unicode_escape"),
    )
