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


@register(
    "pipeline_clean_corpus",
    rf"""
    WITH scored AS (
      SELECT doc_id, text, lang,
             ROUND(
               (len(regexp_extract_all(lower(text), '{_QUALITY_PAT}'))
                  / GREATEST(len(regexp_split_to_array(trim(text), '\s+')), 1)) * 0.4
               + LEAST(1.0, len(regexp_split_to_array(trim(text), '\s+')) / 50.0) * 0.3
               + (1.0 - len(regexp_extract_all(text, '[.,!?;:]'))
                    / GREATEST(length(text), 1)) * 0.3, 4) AS quality,
             md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
      FROM documents
    ),
    kept AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      FROM scored
      WHERE quality >= 0.35 AND lang IN ('en', 'de')
    )
    SELECT doc_id, lang, quality,
           CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_tokens
    FROM kept WHERE rn = 1
    """,
)
def pipeline_clean_corpus(spark, sf_dir):
    """Composed training-corpus cleaning pipeline: quality gate ->
    language allowlist -> exact dedup on the normalized fingerprint
    (keep lowest id) -> token accounting. One declarative plan: the
    filters fuse into the scan, the dedup is a single window over the
    fingerprint shuffle — the shape a 100 TB pre-training prep job
    actually runs."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    scored = docs.select(
        "doc_id", "lang", t.alias("text"),
        tx.quality_score(t).alias("quality"),
        tx.fingerprint(t).alias("fp"),
    )
    kept = scored.filter((F.col("quality") >= 0.35) & F.col("lang").isin("en", "de"))
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        kept.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id", "lang", "quality",
            tx.word_token_count(F.col("text")).alias("n_tokens"),
        )
    )


@register(
    "split_train_val",
    """
    SELECT doc_id,
           CASE WHEN CAST(list_sum(list_transform(range(8), i ->
                  (strpos('0123456789abcdef',
                          substr(md5('split:' || CAST(doc_id AS VARCHAR)), i+1, 1)) - 1)
                  * power(16, 7-i))) AS BIGINT) % 100 < 90
                THEN 'train' ELSE 'val' END AS split
    FROM documents
    """,
)
def split_train_val(spark, sf_dir):
    """Deterministic 90/10 train/val split by content-independent hash
    of the id (md5-prefix bucket) — reproducible across runs, engines
    and partitionings; never rand(). The standard leakage-safe split for
    training pipelines (hash the ID, not the row position)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 8),
            16, 10,
        ).cast("bigint") % 100
    )
    return docs.select(
        "doc_id",
        F.when(bucket < 90, "train").otherwise("val").alias("split"),
    )


@register("sketch_distinct_users")  # rows-only: HLL sketches differ per engine
def sketch_distinct_users(spark, sf_dir):
    """Sketch aggregation: approx_count_distinct (HyperLogLog++) per
    event type — the O(1)-memory distinct count a 100 TB pipeline uses
    where exact distinct would shuffle every value. Accuracy vs exact is
    asserted in tests (engine sketches differ, so no value oracle)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users")
    )
