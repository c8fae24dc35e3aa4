"""Catalog queries that drive the REAL predicate compiler (predicate.py)
end-to-end for the P6-P10 operators, with post-shaped inputs derived
deterministically from the documents fixture so a DuckDB oracle can
replicate them exactly.

P6 alt-text concat   reference src/subscription.ts:284-288
P7 image-only        reference src/subscription.ts:302-307
P8 label filter      reference src/subscription.ts:310-312
P9 reply filter      reference src/subscription.ts:315-317
P10 profile match    reference src/subscription.ts:319-350
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .catalog import register
from .config import FeedCondition
from .predicate import compile_all_conditions, compile_condition
from .sources.fixtures import load_table


def _post_shaped(docs):
    """documents -> post-shaped rows: images embed (with alt) on every
    5th doc, moderation label on every 7th, reply parent on every 3rd."""
    return docs.select(
        "doc_id",
        "text",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.array(F.struct(F.concat(F.lit("ALTTOKEN_"), F.col("lang")).alias("alt"))),
        ).alias("images"),
        F.when(F.col("doc_id") % 7 == 0, F.array(F.lit("spam"))).alias("labels"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("at://parent")).alias("replyParent"),
        F.array(F.col("lang")).alias("langs"),
    )


@register(
    "p6_p9_condition_chain",
    """
    SELECT doc_id
    FROM documents
    WHERE doc_id % 5 = 0  -- P7 imageOnly: images embed present
      AND len(regexp_extract_all(coalesce(text, '') || chr(10)
                                   || 'ALTTOKEN_' || coalesce(lang, ''),
                                 '(?i)alttoken_(de|fr)')) > 0  -- P6+P4
      -- coalesce mirrors the compiler (predicate.search_text coalesces
      -- NULL text/alt to ''); a bare || chain would NULL out and DROP
      -- rows the compiled filter keeps
      AND NOT (doc_id % 7 = 0)  -- P8 labelDisable
      AND NOT (doc_id % 3 = 0)  -- P9 replyDisable
    """,
)
def p6_p9_condition_chain(spark, sf_dir):
    """P6+P7+P8+P9+P4 as ONE compiled Column over post-shaped rows —
    the alt text is only reachable through includeAltText, so a match
    proves the concat ran; the whole chain is a single codegen'd
    filter (no Python, one scan)."""
    posts = _post_shaped(load_table(spark, sf_dir, "documents"))
    cond = FeedCondition(
        key="chain",
        recordName="chain",
        inputRegex="alttoken_(de|fr)",
        includeAltText=True,
        imageOnly="imageOnly",
        labelDisable=True,
        replyDisable=True,
    ).validate()
    return posts.filter(compile_condition(cond)).select("doc_id")


@register(
    "p10_profile_match",
    """
    WITH posts AS (
      SELECT d.doc_id, d.text, c.c_mktsegment AS profile
      FROM documents d
      JOIN customer c
        ON c.c_custkey = d.doc_id % (SELECT count(*) FROM customer)
    )
    SELECT doc_id
    FROM posts
    WHERE len(regexp_extract_all(text, '(?i)data|stream')) > 0
      AND NOT (
        len(regexp_extract_all(text, '(?i)stream')) > 0
        AND len(regexp_extract_all(text, '(?i)data|stream'))
            - len(regexp_extract_all(text, '(?i)stream')) = 0
        AND NOT regexp_matches(profile, '(?i)build|mach')
      )
    """,
)
def p10_profile_match(spark, sf_dir):
    """P10 via the real compiler: posts whose text matches ONLY the
    profile term ('stream' but never 'data') additionally require the
    author's profile to match the profile regex. The profile lookup is
    the J1 broadcast hash join (reference's 25-row batched Map cache,
    src/subscription.ts:241-268)."""
    docs = load_table(spark, sf_dir, "documents")
    customer = load_table(spark, sf_dir, "customer")
    n_cust = customer.count()  # dim-table scalar, driver-side by design
    profiles = customer.select(
        F.col("c_custkey").alias("author_key"),
        F.col("c_mktsegment").alias("author_profile_text"),
    )
    posts = docs.select("doc_id", "text", (F.col("doc_id") % n_cust).alias("author_key"))
    # the broadcast is justified by the reference's contract, not by
    # bench size: profileMatch resolves author profiles through paged
    # getProfiles calls (<= 25 handles per page), so the build side is
    # protocol-bounded — see j1_broadcast_lookup for the same note
    joined = posts.join(F.broadcast(profiles), "author_key")
    cond = FeedCondition(
        key="pm",
        recordName="pm",
        inputRegex="data|stream",
        profileMatch="stream::build|mach",
    ).validate()
    return joined.filter(compile_condition(cond)).select("doc_id")


# 32 feeds, one word-regex each (vocabulary of the documents fixture);
# the same list generates the Spark conditions AND the oracle UNION ALL.
_MULTIFEED_WORDS = [
    "key", "agg", "row", "scan", "slow", "fast", "table", "value",
    "part", "hash", "merge", "batch", "spark", "line", "sort", "window",
    "customer", "query", "big", "order", "data", "column", "join", "small",
    "group", "stream", "filter", "vector", "the", "grid", "cloud", "index",
]

_MULTIFEED_ORACLE = " UNION ALL ".join(
    f"SELECT doc_id, 'feed_{w}' AS key FROM documents "
    f"WHERE len(regexp_extract_all(text, '(?i)\\b{w}\\b')) > 0"
    for w in _MULTIFEED_WORDS
)


@register("flagship_multifeed", _MULTIFEED_ORACLE)
def flagship_multifeed(spark, sf_dir):
    """The core scale claim, checkable: 32 feed conditions evaluated in
    ONE scan via compile_all_conditions (array of CASE WHEN -> explode),
    vs the reference's one-loop-per-condition rescan
    (src/subscription.ts:140). The oracle is the equivalent 32-way UNION
    ALL; identical (doc_id, key) pairs prove the shared-scan evaluator.
    At 100 TB this is the difference between 1 pass and N passes."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    conds = [
        FeedCondition(key=f"feed_{w}", recordName=f"feed-{w}"[:15],
                      inputRegex=rf"\b{w}\b").validate()
        for w in _MULTIFEED_WORDS
    ]
    tagged = docs.withColumn("matched_keys", compile_all_conditions(conds))
    # non-outer explode drops empty arrays; Catalyst infers the size() > 0
    # pruning filter itself (InferFiltersFromGenerate)
    return tagged.select("doc_id", F.explode("matched_keys").alias("key"))


@register("multifeed_datadriven", _MULTIFEED_ORACLE)
def multifeed_datadriven(spark, sf_dir):
    """The same 32-feed evaluation with conditions kept as DATA
    (posts x broadcast(conditions), column-valued regex) — the
    plan-size-bounded path for very large feed counts: the physical plan
    is identical whether 10 or 100k conditions are registered, where the
    compiled form (flagship_multifeed) inlines one expression per feed.
    Same oracle as the compiled form: both must produce identical
    (doc_id, key) pairs."""
    from .predicate import evaluate_conditions_datadriven

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    conds = [
        FeedCondition(key=f"feed_{w}", recordName=f"feed-{w}"[:15],
                      inputRegex=rf"\b{w}\b").validate()
        for w in _MULTIFEED_WORDS
    ]
    return evaluate_conditions_datadriven(docs, conds).select("doc_id", "key")
