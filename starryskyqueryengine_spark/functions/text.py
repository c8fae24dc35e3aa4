"""Text-analysis operators for training-data pipelines.

All pure built-in Column expressions (whole-stage codegen, no Python in
the hot path): token counting, quality scoring, n-gram-heuristic language
ID, document fingerprinting. Each has an exactly-matching DuckDB SQL
formulation in catalog_text.py so results hash-match the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# stopword sets per language for the n-gram-heuristic language ID; fixed
# and mirrored verbatim into the oracle SQL.
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in"],
    "es": ["el", "la", "de", "y", "que", "los"],
    "de": ["der", "die", "das", "und", "ist", "von"],
    "fr": ["le", "la", "et", "les", "des", "un"],
}

QUALITY_STOPWORDS = ["the", "a", "an", "of", "to", "in", "and", "is"]


def ws_token_count(text: Column) -> Column:
    """Whitespace tokenization count (bigint). Empty, whitespace-only,
    and NULL text count 0 tokens — ``split(trim(''), '\\s+')`` yields
    ``['']``, which silently reported 1 token for empty documents
    (inflating token stats and giving empty docs a nonzero length
    signal in quality_score). The DuckDB oracles carry the identical
    CASE guard."""
    n = F.size(F.split(F.trim(text), r"\s+")).cast("bigint")
    return F.when(
        F.coalesce(F.trim(text), F.lit("")) == "", F.lit(0).cast("bigint")
    ).otherwise(n)


def word_token_count(text: Column) -> Column:
    """BPE-ish regex token count: runs of lowercase alnum (bigint)."""
    return F.regexp_count(F.lower(text), F.lit("[a-z0-9]+")).cast("bigint")


def _boundary_count(text: Column, words: list[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.lower(text), F.lit(pat)).cast("bigint")


def stopword_count(text: Column) -> Column:
    return _boundary_count(text, QUALITY_STOPWORDS)


def punct_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(r"[.,!?;:]")).cast("bigint")


def quality_score(text: Column) -> Column:
    """Composite quality in [0,1]: stopword ratio + length signal +
    punctuation cleanliness. Deterministic double math, rounded to 4."""
    n_tok = ws_token_count(text)
    n_chars = F.length(text).cast("bigint")
    # clamp: \b-bounded stopword MATCHES can outnumber whitespace tokens
    # ("the,the" = 1 ws token, 2 matches), which pushed the score past
    # the documented [0,1] range for punctuation-joined stopword runs
    stop_ratio = F.least(
        F.lit(1.0), stopword_count(text) / F.greatest(n_tok, F.lit(1))
    )
    len_signal = F.least(F.lit(1.0), n_tok / F.lit(50.0))
    punct_ratio = punct_count(text) / F.greatest(n_chars, F.lit(1))
    return F.round(
        stop_ratio * 0.4 + len_signal * 0.3 + (F.lit(1.0) - punct_ratio) * 0.3, 4
    )


def lang_scores(text: Column) -> dict[str, Column]:
    return {lang: _boundary_count(text, words) for lang, words in LANG_STOPWORDS.items()}


def predicted_lang(text: Column) -> Column:
    """Argmax over per-language stopword hit counts, fixed priority order
    en > es > de > fr on ties, 'und' when all zero."""
    s = lang_scores(text)
    best = F.greatest(*s.values())
    expr = F.lit("und")
    # build the CASE chain in reverse priority so earlier langs win ties
    for lang in reversed(list(LANG_STOPWORDS)):
        expr = F.when((s[lang] > 0) & (s[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(text: Column) -> Column:
    """Whitespace-normalized lowercase md5 — a deterministic document
    fingerprint, identical across engines."""
    return F.md5(F.regexp_replace(F.lower(text), r"\s+", " "))
