"""Corpus-curation catalog queries + DuckDB oracles: PII redaction,
benchmark decontamination, URL/domain stats, quality-filter funnel.

The fixtures' synthetic ``documents.text`` carries no natural PII or URLs,
so the PII and domain queries first append a deterministic, doc_id-derived
suffix (identically in Spark and in the oracle SQL) and then run the real
extraction/redaction expressions over the combined text — the regex paths
are genuinely exercised with nonzero match counts while staying
value-reproducible across engines.

All expressions live in the Java-regex ∩ RE2 common dialect (no
lookaround/backrefs) so the oracle mirrors the Spark pattern verbatim.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .catalog import register
from .catalog_dedup import _SQL_WORDS, _sql_shingles
from .functions import curation as cu
from .functions import dedup as dd
from .functions import text as tx
from .sources.fixtures import load_table

_QUALITY_PAT = r"\b(" + "|".join(tx.QUALITY_STOPWORDS) + r")\b"

# doc_id-derived PII suffix, byte-identical across engines.
_SQL_PII_AUG = (
    "text || ' Contact user' || CAST(doc_id AS VARCHAR)"
    " || '@mail.example.com from 10.' || CAST(doc_id % 200 AS VARCHAR)"
    " || '.0.' || CAST(doc_id % 250 AS VARCHAR)"
    " || ' tel +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)


def _pii_aug_col():
    return F.concat(
        F.col("text"),
        F.lit(" Contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com from 10."),
        (F.col("doc_id") % 200).cast("string"),
        F.lit(".0."),
        (F.col("doc_id") % 250).cast("string"),
        F.lit(" tel +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )


@register(
    "text_pii_redact",
    rf"""
    WITH aug AS (SELECT doc_id, {_SQL_PII_AUG} AS t FROM documents)
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(t,
             '{cu.EMAIL_PAT}', '<EMAIL>', 'g'),
             '{cu.IPV4_PAT}', '<IP>', 'g'),
             '{cu.PHONE_PAT}', '<PHONE>', 'g') AS redacted,
           CAST(len(regexp_extract_all(t, '{cu.EMAIL_PAT}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{cu.IPV4_PAT}')) AS BIGINT) AS n_ips,
           CAST(len(regexp_extract_all(t, '{cu.PHONE_PAT}')) AS BIGINT) AS n_phones
    FROM aug
    """,
)
def text_pii_redact(spark, sf_dir):
    """PII redaction: email -> IPv4 -> phone tag replacement + per-class
    counts. Pure per-row projection — no shuffle, scales linearly."""
    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select("doc_id", _pii_aug_col().alias("t"))
    counts = cu.pii_counts(F.col("t"))
    return aug.select(
        "doc_id",
        cu.redact_pii(F.col("t")).alias("redacted"),
        counts["n_emails"].alias("n_emails"),
        counts["n_ips"].alias("n_ips"),
        counts["n_phones"].alias("n_phones"),
    )


@register(
    "decontaminate_overlap",
    rf"""
    WITH sh AS (
      SELECT doc_id, {_sql_shingles('w')} AS shingles
      FROM (SELECT doc_id, {_SQL_WORDS} AS w FROM documents)
    ),
    bench AS (
      SELECT DISTINCT unnest(shingles) AS sh FROM sh WHERE doc_id % 29 = 0
    ),
    corp AS (
      SELECT doc_id, CAST(len(shingles) AS BIGINT) AS n_shingles,
             unnest(shingles) AS sh
      FROM sh WHERE doc_id % 29 <> 0 AND len(shingles) > 0
    )
    SELECT c.doc_id, c.n_shingles, CAST(count(*) AS BIGINT) AS n_overlap,
           ROUND(count(*) * 1.0 / c.n_shingles, 6) AS contamination
    FROM corp c JOIN bench b ON c.sh = b.sh
    GROUP BY c.doc_id, c.n_shingles
    HAVING count(*) * 1.0 / c.n_shingles >= 0.3
    """,
)
def decontaminate_overlap(spark, sf_dir):
    """Eval-set decontamination: docs sharing >=30% of their 3-word
    shingles with the 'benchmark' slice (doc_id % 29 == 0 stands in for a
    held-out eval set). Benchmark shingle set broadcast; corpus side one
    shuffle. See functions/curation.py for the 100 TB shape."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sh = dd.with_shingles(docs)
    bench = sh.filter(F.col("doc_id") % 29 == 0).select("doc_id", "shingles")
    corp = sh.filter(F.col("doc_id") % 29 != 0).select("doc_id", "shingles")
    return cu.decontaminate(corp, bench, min_fraction=0.3)


@register(
    "domain_stats",
    rf"""
    WITH aug AS (
      SELECT doc_id, n_chars,
             text || ' see https://' || lower(source)
                  || CAST(doc_id % 7 AS VARCHAR) || '.example.com/p/'
                  || CAST(doc_id AS VARCHAR) AS t
      FROM documents
    )
    SELECT regexp_extract(t, '{cu.URL_DOMAIN_PAT}', 1) AS domain,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM aug
    GROUP BY 1
    """,
)
def domain_stats(spark, sf_dir):
    """URL/domain extraction + per-domain corpus stats (the curation view
    behind per-domain sampling caps). Single scan, one small-key shuffle;
    domain cardinality is bounded, so the agg is map-side combinable."""
    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        "n_chars",
        F.concat(
            F.col("text"),
            F.lit(" see https://"),
            F.lower(F.col("source")),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.com/p/"),
            F.col("doc_id").cast("string"),
        ).alias("t"),
    )
    return aug.select(cu.url_domain(F.col("t")).alias("domain"), "n_chars").groupBy(
        "domain"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@register(
    "quality_filter_funnel",
    rf"""
    SELECT
      CAST(count(*) AS BIGINT) AS n_total,
      CAST(count(*) FILTER (lang = 'en') AS BIGINT) AS n_lang,
      CAST(count(*) FILTER (lang = 'en' AND n_chars BETWEEN 100 AND 20000)
           AS BIGINT) AS n_len,
      CAST(count(*) FILTER (lang = 'en' AND n_chars BETWEEN 100 AND 20000
             AND len(regexp_extract_all(lower(text), '[a-z0-9]+')) >= 10)
           AS BIGINT) AS n_tok,
      CAST(count(*) FILTER (lang = 'en' AND n_chars BETWEEN 100 AND 20000
             AND len(regexp_extract_all(lower(text), '[a-z0-9]+')) >= 10
             AND len(regexp_extract_all(lower(text), '{_QUALITY_PAT}')) >= 1)
           AS BIGINT) AS n_pass
    FROM documents
    """,
)
def quality_filter_funnel(spark, sf_dir):
    """Curation funnel: cumulative survivor counts per filter stage
    (language -> length -> token floor -> stopword signal) in ONE scan via
    conditional aggregation — the standard curation-report shape; fully
    map-side combinable, O(1) result."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    lang_ok = F.col("lang") == "en"
    len_ok = lang_ok & F.col("n_chars").between(100, 20000)
    tok_ok = len_ok & (tx.word_token_count(t) >= 10)
    pass_ok = tok_ok & (tx.stopword_count(t) >= 1)

    def cnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")

    return docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        cnt(lang_ok).alias("n_lang"),
        cnt(len_ok).alias("n_len"),
        cnt(tok_ok).alias("n_tok"),
        cnt(pass_ok).alias("n_pass"),
    )


@register(
    "corpus_overview",
    r"""
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM((CASE WHEN coalesce(trim(text), '') = '' THEN 0 ELSE len(regexp_split_to_array(trim(text), '\s+')) END)) AS BIGINT) AS n_tok,
           CAST(GROUPING(lang) * 2 + GROUPING(source) AS BIGINT) AS gid
    FROM documents
    GROUP BY CUBE (lang, source)
    """,
)
def corpus_overview(spark, sf_dir):
    """One-scan corpus dashboard: doc and token counts by language,
    by source, by (language, source), and the grand total — a single
    CUBE aggregation (one Expand pass, one shuffle), the first thing a
    pipeline run reports before any curation decision.  GROUPING() ids
    disambiguate rollup NULLs from (hypothetical) real NULL keys."""
    from .functions.text import ws_token_count

    docs = load_table(spark, sf_dir, "documents")
    # ws_token_count carries the empty-text guard the oracle's CASE
    # mirrors (split('') yields [''] = a phantom token on both engines)
    d = docs.select(
        "lang",
        "source",
        ws_token_count(F.col("text")).cast("bigint").alias("tok"),
    )
    return d.cube("lang", "source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("tok").cast("bigint").alias("n_tok"),
        (F.grouping("lang") * 2 + F.grouping("source")).cast("bigint").alias("gid"),
    )


# -- per-source distribution drift (KL divergence) --------------------------

KL_BUCKETS = 4096


def _kl_oracle() -> str:
    from .catalog_dedup import _sql_md5int

    feat = _sql_md5int("tok")
    return f"""
    WITH tok AS (
      SELECT source,
             ({feat}) % {KL_BUCKETS} AS f
      FROM (SELECT source,
                   unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
            FROM documents)
    ),
    src_cnt AS (SELECT source, f, count(*) AS c FROM tok GROUP BY source, f),
    src_tot AS (SELECT source, count(*) AS n_s FROM tok GROUP BY source),
    cor_cnt AS (SELECT f, count(*) AS c FROM tok GROUP BY f),
    cor_tot AS (SELECT count(*) AS n FROM tok),
    grid AS (SELECT s.source, s.n_s, g.range AS f
             FROM src_tot s CROSS JOIN range({KL_BUCKETS}) g)
    SELECT grid.source,
           CAST(max(grid.n_s) AS BIGINT) AS n_tokens,
           CAST(ROUND(sum(CAST(
             ((COALESCE(sc.c, 0) + 1.0) / (grid.n_s + {KL_BUCKETS}))
             * ln(((COALESCE(sc.c, 0) + 1.0) / (grid.n_s + {KL_BUCKETS}))
                  / ((COALESCE(cc.c, 0) + 1.0) / (ct.n + {KL_BUCKETS})))
           AS DECIMAL(38,18))), 6) AS DOUBLE) AS kl_divergence
    FROM grid
    LEFT JOIN src_cnt sc ON grid.source = sc.source AND grid.f = sc.f
    LEFT JOIN cor_cnt cc ON grid.f = cc.f
    CROSS JOIN cor_tot ct
    GROUP BY grid.source
    """


@register("source_kl_divergence", _kl_oracle())
def source_kl_divergence(spark, sf_dir):
    """Per-source distribution drift: KL(source ‖ corpus) over hashed
    unigram buckets with add-1 smoothing — the mixture-health diagnostic
    a pretraining pipeline tracks to catch a source drifting away from
    (or collapsing into) the corpus distribution.

    Scale shape: corpus-sized work is exactly two hash aggregates (per
    (source, bucket) and per bucket); the KL sum then runs on the
    |sources| x 4096 dense grid — a few hundred thousand rows regardless
    of corpus size — built from a broadcast spark.range cross join, with
    both count tables broadcast onto it. Nothing quadratic, no window,
    no UDF; exact same smoothing/rounding as the DuckDB oracle."""
    from .catalog_mixture import _md5int

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0)
        ).alias("tok"),
    ).select("source", (_md5int(F.col("tok")) % KL_BUCKETS).alias("f"))
    src_cnt = tok.groupBy("source", "f").agg(F.count("*").alias("sc"))
    src_tot = tok.groupBy("source").agg(F.count("*").alias("n_s"))
    cor_cnt = tok.groupBy("f").agg(F.count("*").alias("cc"))
    cor_tot = tok.agg(F.count("*").alias("n"))
    grid = src_tot.crossJoin(F.broadcast(spark.range(KL_BUCKETS).select(
        F.col("id").cast("bigint").alias("f")
    )))
    p = (
        grid.join(F.broadcast(src_cnt), ["source", "f"], "left")
        .join(F.broadcast(cor_cnt), "f", "left")
        .join(F.broadcast(cor_tot))
        .select(
            "source", "n_s",
            (
                ((F.coalesce(F.col("sc"), F.lit(0)) + F.lit(1.0))
                 / (F.col("n_s") + F.lit(KL_BUCKETS)))
                * F.log(
                    ((F.coalesce(F.col("sc"), F.lit(0)) + F.lit(1.0))
                     / (F.col("n_s") + F.lit(KL_BUCKETS)))
                    / ((F.coalesce(F.col("cc"), F.lit(0)) + F.lit(1.0))
                       / (F.col("n") + F.lit(KL_BUCKETS)))
                )
            ).alias("term"),
        )
    )
    # sum the per-bucket terms in DECIMAL: a plain double sum over the
    # ~4096-term grid is partition/fold-order dependent, so a source
    # whose true KL sits within an ulp of a 1e-6 rounding boundary
    # would flake between engines (and between Spark runs).  Each term
    # is deterministic per engine; casting it to DECIMAL(38,18) before
    # the sum makes the ACCUMULATION exact and order-free on both
    # sides (the oracle carries the identical cast).
    return p.groupBy("source").agg(
        F.max("n_s").cast("bigint").alias("n_tokens"),
        F.round(F.sum(F.col("term").cast("decimal(38,18)")), 6)
        .cast("double")
        .alias("kl_divergence"),
    )


# --------------------------------------------------------------------------
# Round 5: HTML boilerplate extraction (the WET/CC-style first stage of a
# web-scraped training corpus). The raw corpus is synthesized by wrapping
# each document's text in a deterministic HTML shell (script + style +
# title + nav boilerplate + entity-escaped body) so the extractor runs on
# REAL markup; the oracle replays the identical construction and the
# identical extraction pipeline in DuckDB, so the whole path — escape,
# wrap, strip, unescape, collapse — is value-checked end to end.
# --------------------------------------------------------------------------

# extraction passes, applied in this order on both engines. Patterns stay
# in the Java∩RE2∩PCRE common dialect (no backrefs, no lookaround) — the
# same constraint regex_dialect.py enforces for feed conditions.
_HTML_STRIP_PASSES = [
    (r"(?s)<script\b[^>]*>.*?</script>", " "),
    (r"(?s)<style\b[^>]*>.*?</style>", " "),
    (r"<[^>]+>", " "),
]
_HTML_UNESCAPES = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"),
    ("&amp;", "&"),  # LAST: &amp;lt; must become &lt;, not <
]


@register(
    "html_extract_text",
    r"""
    WITH raw AS (
      SELECT doc_id,
             '<html><head><script type="text/javascript">var nav = ' || doc_id
             || ';</script><style>.m{color:red}</style><title>Doc '
             || doc_id || '</title></head><body><div class="nav">Home | About'
             || '</div><p>'
             || replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')
             || '</p><div class="footer">(c) example</div></body></html>'
               AS html
      FROM documents
    ),
    stripped AS (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(html, '(?s)<script\b[^>]*>.*?</script>', ' ', 'g'),
                 '(?s)<style\b[^>]*>.*?</style>', ' ', 'g'),
               '<[^>]+>', ' ', 'g') AS t1
      FROM raw
    ),
    unescaped AS (
      SELECT doc_id,
             replace(replace(replace(replace(replace(t1,
               '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
               '&amp;', '&') AS t2
      FROM stripped
    ),
    clean AS (
      SELECT doc_id,
             trim(regexp_replace(t2, '\s+', ' ', 'g')) AS content
      FROM unescaped
    )
    SELECT doc_id,
           md5(content) AS content_md5,
           CAST(length(content) AS BIGINT) AS n_chars,
           CAST(len(regexp_extract_all(content, '[^ ]+')) AS BIGINT) AS n_words
    FROM clean
    """,
)
def html_extract_text(spark, sf_dir):
    """HTML -> text extraction (the first stage of every web-scraped
    pretraining corpus; CommonCrawl WET-style): drop script/style
    blocks, strip remaining tags, unescape entities (amp LAST so
    double-escaped sequences survive correctly), collapse whitespace.
    Every pass is a codegen regexp_replace — zero shuffle, zero UDF;
    the DuckDB oracle replays the identical pass sequence, value-
    checking the extracted content byte-for-byte via md5. At 100 TB
    this is a pure map stage: it chains onto the scan of the raw HTML
    column and costs no exchange."""
    docs = load_table(spark, sf_dir, "documents")
    esc = F.col("text")
    for a, b in [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")]:
        esc = F.replace(esc, F.lit(a), F.lit(b))
    html = F.concat(
        F.lit('<html><head><script type="text/javascript">var nav = '),
        F.col("doc_id").cast("string"),
        F.lit(";</script><style>.m{color:red}</style><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit('</title></head><body><div class="nav">Home | About</div><p>'),
        esc,
        F.lit('</p><div class="footer">(c) example</div></body></html>'),
    )
    t = html
    for pat, rep in _HTML_STRIP_PASSES:
        t = F.regexp_replace(t, pat, rep)
    for a, b in _HTML_UNESCAPES:
        t = F.replace(t, F.lit(a), F.lit(b))
    content = F.trim(F.regexp_replace(t, r"\s+", " "))
    return docs.select(
        "doc_id",
        F.md5(content).alias("content_md5"),
        F.length(content).cast("bigint").alias("n_chars"),
        F.size(F.regexp_extract_all(content, F.lit("[^ ]+"), 0))
        .cast("bigint")
        .alias("n_words"),
    )


# --------------------------------------------------------------------------
# Round 5: domain blocklist filtering — the other half of domain curation
# (domain_stats measures; this enforces). Blocklists in practice are
# suffix-matched (blocking example.com blocks www.example.com), so the
# join key is the registrable 2-label suffix of the extracted domain.
# --------------------------------------------------------------------------

BLOCKED_DOMAIN_SUFFIXES = ["src40.example.com", "p1.src51.example.com"]


@register(
    "domain_blocklist_filter",
    rf"""
    WITH aug AS (
      SELECT doc_id, lang,
             text || ' see https://p' || CAST(doc_id % 3 AS VARCHAR) || '.'
                  || lower(source) || CAST(doc_id % 7 AS VARCHAR)
                  || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS t
      FROM documents
    ),
    dom AS (
      SELECT doc_id, lang, regexp_extract(t, '{cu.URL_DOMAIN_PAT}', 1) AS domain
      FROM aug
    )
    SELECT doc_id, lang, domain
    FROM dom
    WHERE NOT (domain = 'src40.example.com'
               OR domain LIKE '%.src40.example.com'
               OR domain = 'p1.src51.example.com'
               OR domain LIKE '%.p1.src51.example.com')
    """,
)
def domain_blocklist_filter(spark, sf_dir):
    """Domain blocklist enforcement (the curation step after
    domain_stats's measurement): extract each doc's source domain
    (4-label hosts: p<k>.<source><j>.example.com) and drop docs whose
    domain equals OR is a subdomain of a blocked entry — suffix
    semantics, the way real blocklists (UT1-style) are applied, so
    blocking src40.example.com also removes p0/p1/p2.src40.example.com
    while the exact entry p1.src51.example.com removes only that host.
    The blocklist is a broadcast left-anti join on the suffix
    condition: one corpus scan, no shuffle; at 100 TB a million-entry
    blocklist is still broadcast-sized. Oracle replays the same
    extraction and suffix test in SQL; both match classes are non-empty
    on the fixtures (test-pinned)."""
    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        "lang",
        F.concat(
            F.col("text"),
            F.lit(" see https://p"),
            (F.col("doc_id") % 3).cast("string"),
            F.lit("."),
            F.lower(F.col("source")),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.com/p/"),
            F.col("doc_id").cast("string"),
        ).alias("t"),
    )
    dom = aug.select("doc_id", "lang", cu.url_domain(F.col("t")).alias("domain"))
    block = spark.createDataFrame(
        [(b,) for b in BLOCKED_DOMAIN_SUFFIXES], "blocked string"
    )
    hit = (
        (F.col("domain") == F.col("blocked"))
        | F.col("domain").endswith(F.concat(F.lit("."), F.col("blocked")))
    )
    return dom.join(F.broadcast(block), hit, "left_anti")


# --------------------------------------------------------------------------
# One-pass column profiler (round 6)
# --------------------------------------------------------------------------

_PROFILE_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def _profile_col_sql(col: str) -> str:
    s = f"CAST({col} AS VARCHAR)"
    return f"""
    SELECT '{col}' AS column_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count({col}) AS BIGINT) AS n_null,
           CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct,
           min({s}) AS min_repr,
           max({s}) AS max_repr,
           CAST(round(CAST(sum(length({s})) AS DOUBLE)
                      / CAST(count({col}) AS DOUBLE), 6) AS DOUBLE) AS avg_repr_len
    FROM documents
    """


@register(
    "profile_documents",
    " UNION ALL ".join(_profile_col_sql(c) for c in _PROFILE_COLS),
)
def profile_documents(spark, sf_dir, exact: bool = True):
    """ONE-pass dataset profiler: per-column row/null/exact-distinct
    counts, lexicographic min/max of the string repr, and mean repr
    length — the first thing a data engineer runs on an unfamiliar 100 TB
    drop.  The whole profile is a single aggregation over a single scan
    (Catalyst turns the N exact count(DISTINCT) into one Expand pass:
    rows replicate xN pre-shuffle but each expanded row carries ONE
    column, so shuffle bytes stay ~ table width, not width x N); the
    per-column report rows are then exploded from the 1-row aggregate —
    no second scan, no per-column job loop (the anti-pattern the z-order
    manifest build had).  ``exact=False`` IS the 100 TB path: it swaps
    count(DISTINCT) for approx_count_distinct (HLL++, rsd 1%) and the
    Expand pass disappears — one plain single-pass aggregate.  The
    exact form is what the oracle verifies; the approx form's distinct
    counts are pinned within HLL tolerance of it in
    tests/test_approx_modes.py.  min/max compare the STRING repr
    on both sides (min(CAST(c AS VARCHAR)), not CAST(min(c) AS VARCHAR))
    so engine-native orderings never diverge.  All stats are exact
    integers or one double division of exact integers — deterministic
    across partition layouts.  No reference counterpart (the reference
    has no profiling surface; closest is the stats endpoint noted in
    SURVEY §2.8)."""
    d = load_table(spark, sf_dir, "documents")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in _PROFILE_COLS:
        s = F.col(c).cast("string")
        nd = (
            F.countDistinct(F.col(c))
            if exact
            else F.approx_count_distinct(F.col(c), rsd=0.01)
        )
        aggs += [
            F.count(F.col(c)).alias(f"{c}__cnt"),
            nd.alias(f"{c}__nd"),
            F.min(s).alias(f"{c}__mn"),
            F.max(s).alias(f"{c}__mx"),
            F.sum(F.length(s).cast("bigint")).alias(f"{c}__len"),
        ]
    row = d.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col("__n").cast("bigint").alias("n_rows"),
            (F.col("__n") - F.col(f"{c}__cnt")).cast("bigint").alias("n_null"),
            F.col(f"{c}__nd").cast("bigint").alias("n_distinct"),
            F.col(f"{c}__mn").alias("min_repr"),
            F.col(f"{c}__mx").alias("max_repr"),
            F.round(
                F.col(f"{c}__len").cast("double")
                / F.col(f"{c}__cnt").cast("double"),
                6,
            ).alias("avg_repr_len"),
        )
        for c in _PROFILE_COLS
    ]
    return row.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


# --------------------------------------------------------------------------
# Declarative data-expectations validator (round 6)
# --------------------------------------------------------------------------

EXPECT_ALLOWED_LANGS = ("en", "de", "fr")  # es/zh fixtures violate: non-vacuous
EXPECT_MAX_CHARS = 400  # fixture median ~306: both outcomes populated


@register(
    "expectations_documents",
    f"""
    WITH agg AS (
      SELECT count(*) AS n,
             count(*) - count(text) AS null_text,
             count(*) - count(DISTINCT doc_id) AS dup_ids,
             sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END)
               AS len_mismatch,
             sum(CASE WHEN lang NOT IN ('en','de','fr') THEN 1 ELSE 0 END)
               AS bad_lang,
             sum(CASE WHEN n_chars > {EXPECT_MAX_CHARS} THEN 1 ELSE 0 END)
               AS too_long
      FROM documents
    )
    SELECT rule, CAST(n_violations AS BIGINT) AS n_violations,
           n_violations = 0 AS passed
    FROM (
      SELECT 'text_not_null' AS rule, null_text AS n_violations FROM agg
      UNION ALL SELECT 'doc_id_unique', dup_ids FROM agg
      UNION ALL SELECT 'n_chars_consistent', len_mismatch FROM agg
      UNION ALL SELECT 'lang_allowed', bad_lang FROM agg
      UNION ALL SELECT 'n_chars_max', too_long FROM agg
    )
    """,
)
def expectations_documents(spark, sf_dir):
    """Declarative data-expectations check (the Great-Expectations /
    Deequ pattern, public designs — Schelter et al., VLDB 2018): a rule
    set (not-null, uniqueness, cross-column consistency, value domain,
    range) evaluated as ONE aggregation over ONE scan — every rule is a
    conditional sum sharing the pass, and uniqueness folds into the same
    aggregate via count(DISTINCT) (one Expand, same mechanics as the
    profiler).  Emits (rule, n_violations, passed): the fixture rule set
    is deliberately mixed — not-null/uniqueness/consistency pass, the
    lang allowlist and length cap fire — so both verdict branches are
    value-checked, never vacuous.  At 100 TB this is the pre-ingest
    quality gate: one pass, map-side combinable, no shuffle beyond the
    1-row aggregate (+ Expand for the distinct rule; drop uniqueness to
    approx_count_distinct and even that goes away)."""
    d = load_table(spark, sf_dir, "documents")
    agg = d.agg(
        (F.count(F.lit(1)) - F.count("text")).alias("null_text"),
        (F.count(F.lit(1)) - F.countDistinct("doc_id")).alias("dup_ids"),
        F.sum(
            F.when(F.col("n_chars") != F.length("text"), 1).otherwise(0)
        ).alias("len_mismatch"),
        F.sum(
            F.when(~F.col("lang").isin(*EXPECT_ALLOWED_LANGS), 1).otherwise(0)
        ).alias("bad_lang"),
        F.sum(
            F.when(F.col("n_chars") > EXPECT_MAX_CHARS, 1).otherwise(0)
        ).alias("too_long"),
    )
    rules = [
        ("text_not_null", "null_text"),
        ("doc_id_unique", "dup_ids"),
        ("n_chars_consistent", "len_mismatch"),
        ("lang_allowed", "bad_lang"),
        ("n_chars_max", "too_long"),
    ]
    structs = [
        F.struct(
            F.lit(name).alias("rule"),
            F.col(col).cast("bigint").alias("n_violations"),
            (F.col(col) == 0).alias("passed"),
        )
        for name, col in rules
    ]
    return agg.select(F.explode(F.array(*structs)).alias("r")).select("r.*")


# --------------------------------------------------------------------------
# URL canonicalization + dedup: the CommonCrawl-style first-pass dedup
# key.  Crawls see the same page under many raw URLs (host case, default
# port, tracking params, trailing slash, fragments); canonicalizing
# before content dedup removes the bulk of exact re-fetches without
# touching document bytes.  Fixtures carry no URLs, so a deterministic
# messy variant is synthesized per doc (identically in both engines) and
# the REAL canonicalization algebra — component extraction, host
# lowercasing, default-port strip, utm_* filter, trailing-slash and
# fragment strip — is what the value check exercises.
# --------------------------------------------------------------------------

_URL_PARTS_RE = r"^([a-z]+)://([^/:?#]+)(?::(\d+))?([^?#]*)(?:\?([^#]*))?(?:#.*)?$"


def _canon_sql(url: str) -> str:
    """DuckDB canonicalization of a URL expression (5-group regex)."""
    host = f"lower(regexp_extract({url}, '{_URL_PARTS_RE}', 2))"
    port = f"regexp_extract({url}, '{_URL_PARTS_RE}', 3)"
    path = f"rtrim(regexp_extract({url}, '{_URL_PARTS_RE}', 4), '/')"
    q = f"regexp_extract({url}, '{_URL_PARTS_RE}', 5)"
    kept_q = (
        f"array_to_string(list_filter(str_split({q}, '&'), "
        "p -> NOT starts_with(p, 'utm_')), '&')"
    )
    return (
        f"'https://' || {host} || "
        f"CASE WHEN {port} NOT IN ('', '443') THEN ':' || {port} ELSE '' END || "
        f"{path} || "
        f"CASE WHEN {kept_q} <> '' THEN '?' || {kept_q} ELSE '' END"
    )


def canonical_url_col(url_col: str):
    """The canonicalization algebra as a reusable Column (shared by the
    url_canonical_dedup query and its property tests — one definition,
    no drift). Python-API regexp functions only: the pattern contains
    backslash-d, which a SQL string literal inside F.expr would
    escape-mangle."""
    pat = _URL_PARTS_RE
    host = F.lower(F.regexp_extract(url_col, pat, 2))
    port = F.regexp_extract(url_col, pat, 3)
    path = F.regexp_replace(F.regexp_extract(url_col, pat, 4), "/+$", "")
    q = F.regexp_extract(url_col, pat, 5)
    kept_q = F.array_join(
        F.filter(F.split(q, "&"), lambda p: ~p.startswith("utm_")), "&"
    )
    return F.concat(
        F.lit("https://"),
        host,
        F.when(~port.isin("", "443"), F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(kept_q != "", F.concat(F.lit("?"), kept_q)).otherwise(F.lit("")),
    )


_MESSY_URL_SQL = """
    'https://'
    || CASE WHEN doc_id % 2 = 0 THEN 'CDN.Example.COM' ELSE 'cdn.example.com' END
    || CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END
    || '/page/' || CAST(doc_id % 97 AS VARCHAR)
    || CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END
    || '?' || CASE WHEN doc_id % 2 = 1 THEN 'utm_source=feed&' ELSE '' END
    || 'id=' || CAST(doc_id % 97 AS VARCHAR)
    || CASE WHEN doc_id % 7 = 0 THEN '#section' ELSE '' END
"""


@register(
    "url_canonical_dedup",
    f"""
    WITH raw AS (
      SELECT doc_id, {_MESSY_URL_SQL} AS url FROM documents
    ),
    canon AS (
      SELECT doc_id, url, {_canon_sql('url')} AS canonical_url FROM raw
    )
    SELECT canonical_url,
           COUNT(*) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS survivor_id,
           CAST(COUNT(DISTINCT url) AS BIGINT) AS n_raw_variants
    FROM canon GROUP BY canonical_url
    """,
)
def url_canonical_dedup(spark, sf_dir):
    """URL canonicalization + URL-level dedup: canonicalize (lowercase
    host, strip :443, drop utm_* params, strip trailing slash and
    fragment), then group — survivor = lowest doc_id, variant count
    shows how many raw spellings collapsed.

    Scale shape: canonicalization is a zero-shuffle codegen projection
    (regexp_extract + array filter); the dedup is ONE hash aggregate on
    the canonical key with map-side partials — the same single-shuffle
    shape as dedup_exact, applied to the URL key instead of the content
    hash. At 100 TB this runs before content dedup so the expensive
    shingle/MinHash machinery never sees exact re-fetches."""
    docs = load_table(spark, sf_dir, "documents")
    messy = (
        F.concat(
            F.lit("https://"),
            F.when(F.col("doc_id") % 2 == 0, F.lit("CDN.Example.COM"))
            .otherwise(F.lit("cdn.example.com")),
            F.when(F.col("doc_id") % 3 == 0, F.lit(":443")).otherwise(F.lit("")),
            F.lit("/page/"), (F.col("doc_id") % 97).cast("string"),
            F.when(F.col("doc_id") % 5 == 0, F.lit("/")).otherwise(F.lit("")),
            F.lit("?"),
            F.when(F.col("doc_id") % 2 == 1, F.lit("utm_source=feed&"))
            .otherwise(F.lit("")),
            F.lit("id="), (F.col("doc_id") % 97).cast("string"),
            F.when(F.col("doc_id") % 7 == 0, F.lit("#section")).otherwise(F.lit("")),
        )
    )
    raw = docs.select("doc_id", messy.alias("url"))
    return (
        raw.select("doc_id", "url", canonical_url_col("url").alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("survivor_id"),
            F.countDistinct("url").cast("bigint").alias("n_raw_variants"),
        )
    )


# --------------------------------------------------------------------------
# Unicode NFC normalization: the first pass of any multilingual corpus
# pipeline (decomposed vs precomposed spellings of the same word must
# dedup/tokenize identically).  The fixtures are pure ASCII, so — as
# with the PII/URL queries — a deterministic doc_id-derived suffix
# (decomposed NFD sequences for some residues, the precomposed NFC
# twin for others) is appended identically in both engines; NFC must
# fold the decomposed and precomposed spellings to the SAME bytes,
# which the md5 fingerprint value-check proves across engines (Python
# unicodedata on the Spark side, DuckDB's nfc_normalize in the oracle).
# --------------------------------------------------------------------------

# residue 0: NFD 'cafe' + combining acute; residue 1: precomposed NFC
# twin — after NFC both are byte-identical; residue 2: NFD 'noel' with
# combining diaeresis
_NFC_SUFFIXES = [" cafe\u0301 test", " caf\u00e9 test", " noe\u0308l"]
assert _NFC_SUFFIXES[0] != _NFC_SUFFIXES[1]  # decomposed vs precomposed: raw bytes differ pre-NFC


@register(
    "text_nfc_normalize",
    f"""
    WITH aug AS (
      SELECT doc_id,
             text || CASE doc_id % 3
               WHEN 0 THEN '{_NFC_SUFFIXES[0]}'
               WHEN 1 THEN '{_NFC_SUFFIXES[1]}'
               ELSE '{_NFC_SUFFIXES[2]}' END AS t
      FROM documents
    )
    SELECT doc_id,
           md5(nfc_normalize(t)) AS norm_fp,
           nfc_normalize(t) <> t AS changed
    FROM aug
    """,
)
def text_nfc_normalize(spark, sf_dir):
    """Unicode NFC normalization over the corpus: canonical composition
    via an Arrow-batched pandas UDF (Python ``unicodedata`` — Spark has
    no built-in normalizer; the batch transfer is the standard shape
    for a per-row text transform the JVM lacks).  Emits the md5
    fingerprint of the normalized text plus a changed flag; documents
    whose residues got the decomposed vs precomposed suffix twins
    (doc_id % 3 in {{0, 1}}) must land on IDENTICAL fingerprints after
    normalization — that collision is what the oracle value-checks.

    Scale shape: zero shuffle — one projection with a vectorized UDF;
    at 100 TB it rides the scan like the codec kernels."""
    import unicodedata

    # lambda form: the module's `from __future__ import annotations`
    # stringifies signature annotations, which pandas_udf can't resolve
    nfc = F.pandas_udf(
        lambda s: s.map(lambda x: unicodedata.normalize("NFC", x)), "string"
    )

    docs = load_table(spark, sf_dir, "documents")
    suffix = (
        F.when(F.col("doc_id") % 3 == 0, F.lit(_NFC_SUFFIXES[0]))
        .when(F.col("doc_id") % 3 == 1, F.lit(_NFC_SUFFIXES[1]))
        .otherwise(F.lit(_NFC_SUFFIXES[2]))
    )
    aug = docs.select("doc_id", F.concat(F.col("text"), suffix).alias("t"))
    # bind the UDF column ONCE: two separate nfc(F.col("t")) calls are
    # distinct PythonUDF expressions (distinct resultIds), and the
    # extractor evaluates each — doubling the query's only Python hop;
    # one shared Column object is evaluated once and reused
    norm = nfc(F.col("t"))
    return aug.select(
        "doc_id",
        F.md5(norm).alias("norm_fp"),
        (norm != F.col("t")).alias("changed"),
    )


# Blocklist phrases for the multi-pattern scan: chosen to exercise every
# Aho-Corasick mechanism on the fixture vocabulary — nested patterns
# ("tab" inside "table", "sca" inside "scan"), cross-word patterns with
# spaces ("a t"), and shared prefixes ("st"/"stream"). None is
# self-overlapping (no proper border), so DuckDB's non-overlapping
# replace-count equals the automaton's all-positions count exactly.
_AC_PATTERNS = ["scan", "sca", "table", "tab", "stream", "windo", "value", "a t"]


@register(
    "text_multi_pattern_scan",
    f"""
    WITH pats AS (
      SELECT * FROM (VALUES {", ".join(f"('{p}')" for p in _AC_PATTERNS)}) t(pat)
    ),
    per AS (
      SELECT d.doc_id,
             (length(d.text) - length(replace(d.text, p.pat, '')))
               / length(p.pat) AS c
      FROM documents d CROSS JOIN pats p
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_hits,
           CAST(sum(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_patterns
    FROM per GROUP BY doc_id
    """,
)
def text_multi_pattern_scan(spark, sf_dir):
    """Blocklist-phrase scan via a broadcast Aho-Corasick automaton
    (functions/automaton.py): N literal patterns matched in ONE pass
    over each document — occurrences of every pattern, overlapping and
    nested included — versus the oracle's N-pass replace-count (which
    agrees exactly because no chosen pattern self-overlaps). The pattern
    set deliberately exercises failure links (shared prefixes), output
    links (patterns nested in longer patterns), and cross-token matches
    (patterns containing spaces).

    Reference tie-in: the per-feed regex loop
    (src/subscription.ts:203-204, :291-299) is the 1-pattern special
    case; this is the N-pattern shared-scan form of the multi-feed
    rewrite.

    100 TB shape: automaton built once on the driver — O(pattern chars)
    — and broadcast (KBs per thousand phrases); matching is one
    streaming O(len + matches) pass per row inside Arrow-batched
    mapInPandas, cost independent of pattern count; the alternative N
    regexp_count columns re-scan the corpus N times. Per-char inner
    loop documented as the compiled-kernel swap point."""
    from .functions.automaton import multi_pattern_counts

    docs = load_table(spark, sf_dir, "documents")
    from .session import ensure_parallelism

    return multi_pattern_counts(ensure_parallelism(docs), _AC_PATTERNS)


# ---------------------------------------------------------------------------
# Model-based quality filtering (round 8): distributed logistic-regression
# training as Catalyst aggregates (DCLM / FineWeb-Edu style classifier)
# ---------------------------------------------------------------------------

_LR_QUANT_SQL = "1000000000.0"  # functions/classifier.WEIGHT_QUANT
_LR_GRAD_SQL = "1000000000000.0"  # functions/classifier.GRAD_SCALE
_LR_FEATS_SQL = [
    "1.0",
    "ln(1.0 + length(text))",
    "CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)"
    " / CAST(greatest(length(text), 1) AS DOUBLE)",
    "CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)"
    " / CAST(greatest(length(text), 1) AS DOUBLE)",
]


def _logreg_oracle(iters: int = 2, lr: float = 0.5) -> str:
    """Unrolled batch-GD replay: one EXACT-integer gradient CTE + one
    floor-quantized weight CTE per iteration, then the scoring
    projection — the same IEEE-double operations, in the same
    association order, as functions/classifier.py.  Per-row gradient
    terms are floor-scaled to integers and summed exactly (DuckDB
    promotes SUM(BIGINT) to HUGEINT; Spark sums DECIMAL(38,0)), so
    both engines derive the weights from identical integers — a plain
    double AVG would be partition-order dependent on the Spark side."""
    d = len(_LR_FEATS_SQL)
    q = _LR_QUANT_SQL
    gs = _LR_GRAD_SQL
    feats = ", ".join(f"{e} AS x{j}" for j, e in enumerate(_LR_FEATS_SQL))
    sql = (
        f"WITH f AS (SELECT doc_id, {feats}, "
        "CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y FROM documents)"
    )
    prev_w = ["0.0"] * d  # iteration 0 weights (all zero)
    for t in range(1, iters + 1):
        z = " + ".join(f"{prev_w[j]}*x{j}" for j in range(d))
        # COALESCE mirrors the trainer's `row[f"k{j}"] or 0`: a feature
        # NULL on every row sums to NULL in both engines and must read
        # as a zero gradient here too, or the oracle's weights (and
        # every score) would go NULL where Spark's stay finite
        grads = ", ".join(
            f"COALESCE(sum(CAST(floor((1.0/(1.0+exp(-({z}))) - y) * x{j} "
            f"* {gs}) AS BIGINT)), 0) AS k{j}"
            for j in range(d)
        )
        prev_tables = "f" if t == 1 else f"f, w{t-1}"
        sql += f", g{t} AS (SELECT {grads}, count(*) AS n FROM {prev_tables})"
        ws = ", ".join(
            f"floor(({prev_w[j]} - {lr} * ((CAST(g{t}.k{j} AS DOUBLE) / g{t}.n)"
            f" / {gs})) * {q}) / {q} AS w{j}"
            for j in range(d)
        )
        w_tables = f"g{t}" if t == 1 else f"w{t-1}, g{t}"
        sql += f", w{t} AS (SELECT {ws} FROM {w_tables})"
        prev_w = [f"w{t}.w{j}" for j in range(d)]
    zf = " + ".join(f"{prev_w[j]}*x{j}" for j in range(d))
    score = f"round(1.0/(1.0+exp(-({zf}))), 4)"
    return (
        sql
        + f" SELECT doc_id, score FROM ("
        f"SELECT doc_id, {score} AS score, "
        f"row_number() OVER (ORDER BY {score} DESC, doc_id) AS rn "
        f"FROM f, w{iters}) WHERE rn <= 20"
    )


@register("quality_classifier_scores", _logreg_oracle())
def quality_classifier_scores(spark, sf_dir):
    """Model-based quality filtering (DCLM / FineWeb-Edu style): train a
    logistic-regression doc classifier DISTRIBUTED — each batch-GD
    iteration is ONE map-side-combined aggregate over the corpus
    (avg((sigmoid(x·w) - y) * x_j) per feature), the d+1-double model
    lives on the driver and re-enters the next iteration as literals —
    then score every document as a pure per-row projection and return
    the top 20.  Features: log length, punctuation ratio, digit ratio;
    label: lang = 'en' (a deterministic stand-in for human quality
    labels — the machinery, not the labels, is the operator).

    ENGINE-EXACT: weights are floor-quantized to 1e-9 after every
    update (identical IEEE-double computation driver-side and in the
    oracle's unrolled CTE chain), so the full train-then-score run
    value-checks against DuckDB (see functions/classifier.py).

    100 TB shape: the cached feature table is 4 doubles/doc (tiny next
    to text); each GD iteration = one scan + scalar aggregate (no
    shuffle of rows, no Python UDF, no broadcast); scoring is
    scan-parallel.  The hashing-trick high-dimensional variant swaps
    the per-feature avg for a vector aggregate — same cost envelope."""
    from .functions.classifier import logreg_score, logreg_train

    docs = load_table(spark, sf_dir, "documents")
    L = F.length("text")
    ratio = lambda pat: (  # noqa: E731 - local expression builder
        F.regexp_count(F.col("text"), F.lit(pat)).cast("double")
        / F.greatest(L, F.lit(1)).cast("double")
    )
    feats = docs.select(
        "doc_id",
        F.log(F.lit(1.0) + L).alias("x1"),
        ratio(r"[.,!?;:]").alias("x2"),
        ratio(r"[0-9]").alias("x3"),
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
    ).cache()
    w = logreg_train(feats, ["x1", "x2", "x3"], "y", iters=2, lr=0.5)
    score = F.round(logreg_score(w, ["x1", "x2", "x3"]), 4)
    out = (
        feats.select("doc_id", score.alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(20)
    )
    # lazy return so the plan linter sees the scoring plan; the feature
    # cache (already materialized by the GD iterations) is session-pinned
    # until the bench's between-query CacheManager clear reclaims it
    return out
