"""Text-analysis catalog queries + DuckDB oracles (north-star extensions:
language ID, quality scoring, token counting, fingerprinting — over the
documents fixture). SQL mirrors the Column expressions in functions/text.py
constant-for-constant."""

from __future__ import annotations

from pyspark.sql import functions as F

from .catalog import register
from .functions import text as tx
from .sources.fixtures import load_table

_QUALITY_PAT = r"\b(" + "|".join(tx.QUALITY_STOPWORDS) + r")\b"


@register(
    "text_token_count",
    r"""
    SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_word_tokens
    FROM documents
    """,
)
def text_token_count(spark, sf_dir):
    """Token counting: whitespace split + regex word runs."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        tx.ws_token_count(t).alias("n_ws_tokens"),
        tx.word_token_count(t).alias("n_word_tokens"),
    )


@register(
    "text_quality_score",
    rf"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '{_QUALITY_PAT}')) AS BIGINT) AS n_stopwords,
           CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS n_punct,
           ROUND(
             (len(regexp_extract_all(lower(text), '{_QUALITY_PAT}'))
                / GREATEST(len(regexp_split_to_array(trim(text), '\s+')), 1)) * 0.4
             + LEAST(1.0, len(regexp_split_to_array(trim(text), '\s+')) / 50.0) * 0.3
             + (1.0 - len(regexp_extract_all(text, '[.,!?;:]'))
                  / GREATEST(length(text), 1)) * 0.3, 4) AS quality
    FROM documents
    """,
)
def text_quality_score(spark, sf_dir):
    """Quality scoring: stopword ratio, length signal, punctuation."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        tx.stopword_count(t).alias("n_stopwords"),
        tx.punct_count(t).alias("n_punct"),
        tx.quality_score(t).alias("quality"),
    )


def _duck_lang_sql() -> str:
    score = {
        lang: rf"len(regexp_extract_all(lower(text), '\b({'|'.join(ws)})\b'))"
        for lang, ws in tx.LANG_STOPWORDS.items()
    }
    greatest = f"GREATEST({', '.join(score.values())})"
    case = "'und'"
    for lang in reversed(list(tx.LANG_STOPWORDS)):
        case = (
            f"CASE WHEN {score[lang]} > 0 AND {score[lang]} = {greatest} "
            f"THEN '{lang}' ELSE {case} END"
        )
    return f"SELECT doc_id, lang, {case} AS predicted_lang FROM documents"


@register("text_lang_id", _duck_lang_sql())
def text_lang_id(spark, sf_dir):
    """n-gram-heuristic language ID: stopword-hit argmax per language."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "lang", tx.predicted_lang(F.col("text")).alias("predicted_lang")
    )


@register(
    "text_fingerprint",
    r"""
    SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
    FROM documents
    """,
)
def text_fingerprint(spark, sf_dir):
    """Deterministic whitespace-normalized md5 document fingerprint."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", tx.fingerprint(F.col("text")).alias("fp"))
