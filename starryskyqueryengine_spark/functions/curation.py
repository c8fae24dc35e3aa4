"""Corpus-curation primitives: PII redaction, benchmark decontamination,
URL/domain extraction, and a quality-filter funnel.

North-star extensions for a training-data pipeline (no reference analog —
the reference's text processing stops at regex include/exclude,
``src/subscription.ts:281-307``). Everything here is pure built-in
``pyspark.sql.functions`` (JVM, whole-stage codegen); no Python UDFs.

Scale notes (100 TB):
- Redaction/extraction are per-row ``regexp_replace``/``regexp_extract``
  projections — embarrassingly parallel, no shuffle.
- Decontamination joins the corpus' exploded shingles against the
  benchmark's distinct shingle set. Eval benchmarks are tiny (thousands of
  docs) so the benchmark side is broadcast; the corpus side aggregates per
  doc on one shuffle. At 100 TB, the corpus explode is the dominant cost
  and is linear; no all-pairs comparison anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Patterns restricted to the Java-regex ∩ RE2 (DuckDB) common dialect so the
# DuckDB oracles can mirror them verbatim: no backrefs, no lookaround.
EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# Octet-exact (0-255 per component, zero-padding allowed: 010.001.2.3
# is a real log-format address) — a bare 1-3-digit quad would also
# redact impossible addresses (999.999.999.999), corrupting non-PII
# text.  Version-like strings that ARE valid dotted quads (1.2.3.4)
# remain shape-indistinguishable from addresses; excluding a 5th octet
# would need lookahead, which RE2 lacks, so dialect parity wins.
_OCTET = r"(25[0-5]|2[0-4][0-9]|[01][0-9][0-9]|[0-9][0-9]?)"
IPV4_PAT = rf"\b{_OCTET}(\.{_OCTET}){{3}}\b"
PHONE_PAT = r"\+[0-9][0-9-]{6,}[0-9]"
URL_DOMAIN_PAT = r"https?://([A-Za-z0-9.-]+)"

# Redaction order matters (an IPv4 can be a substring of a phone-shaped
# token, an email's domain can look like a host): emails first, then IPs,
# then phones — applied identically in the SQL oracles.
REDACTIONS = [(EMAIL_PAT, "<EMAIL>"), (IPV4_PAT, "<IP>"), (PHONE_PAT, "<PHONE>")]


def redact_pii(text: Column) -> Column:
    """Replace emails, IPv4 addresses, and phone numbers with typed tags."""
    out = text
    for pat, tag in REDACTIONS:
        out = F.regexp_replace(out, pat, tag)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Match counts per PII class (regexp_count; bigint to match oracles)."""
    return {
        "n_emails": F.regexp_count(text, F.lit(EMAIL_PAT)).cast("bigint"),
        "n_ips": F.regexp_count(text, F.lit(IPV4_PAT)).cast("bigint"),
        "n_phones": F.regexp_count(text, F.lit(PHONE_PAT)).cast("bigint"),
    }


def url_domain(text: Column) -> Column:
    """First URL's host ('' when the row carries no URL)."""
    return F.regexp_extract(text, URL_DOMAIN_PAT, 1)


def decontaminate(
    corpus_shingled: DataFrame,
    benchmark_shingled: DataFrame,
    min_fraction: float = 0.3,
) -> DataFrame:
    """Flag corpus docs sharing >= ``min_fraction`` of their shingles with
    any benchmark doc (eval-set decontamination).

    Inputs carry ``(doc_id, shingles: array<string>)`` with per-doc distinct
    shingles (see ``functions.dedup.with_shingles``). The benchmark side is
    collapsed to its distinct shingle set and broadcast; the corpus side is
    exploded and aggregated per doc — one shuffle, never doc × doc.
    """
    bench = (
        benchmark_shingled.select(F.explode("shingles").alias("sh"))
        .distinct()
    )
    corp = corpus_shingled.filter(F.size("shingles") > 0).select(
        "doc_id",
        F.size("shingles").cast("bigint").alias("n_shingles"),
        F.explode("shingles").alias("sh"),
    )
    hits = corp.join(F.broadcast(bench), "sh")
    agg = hits.groupBy("doc_id", "n_shingles").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_overlap")
    )
    frac = F.col("n_overlap") / F.col("n_shingles")
    return agg.select(
        "doc_id",
        "n_shingles",
        "n_overlap",
        F.round(frac, 6).alias("contamination"),
    ).filter(frac >= min_fraction)
