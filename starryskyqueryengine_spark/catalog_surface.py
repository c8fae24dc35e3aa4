"""Reference-surface catalog queries for the operators that previously
had only unit-test coverage: S1/T7 paged scan, S6 record validation,
P11 private-feed ACL, S10 JSON response shaping, T6 init-count limit,
U3 delete-then-insert upsert, U4 cascading delete.

The stateful implementations live in sources/paged.py, streaming/
pipeline.py, serving.py, ingest.py, config.py and store.py; each query
here either calls the real operator directly (S1, S6) or is the
relational twin of the stateful semantics (P11/S10/T6/U3/U4 — same
pattern as j2_anti_join_dedup modeling the S8 upsert), with a DuckDB
oracle so the driver's correctness gate covers the operator.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .catalog import register
from .sources.fixtures import load_table
from .sources.paged import MAX_PAGES, PAGE_SIZE, fetcher_from_rows, paged_scan
from .streaming.pipeline import validated_json

# --------------------------------------------------------------------------
# S1 + T7: cursor-paginated source scan with the reference's hard caps
# --------------------------------------------------------------------------

_S1_CAP = PAGE_SIZE * MAX_PAGES  # 100 pages x 100 rows, src/subscription.ts:227-231
_S1_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


@register(
    "s1_paged_scan",
    f"""
    SELECT doc_id, lang, source
    FROM documents
    ORDER BY doc_id
    LIMIT {_S1_CAP}
    """,
)
def s1_paged_scan(spark, sf_dir):
    """S1/T7: drive the real cursor-page loop (sources/paged.py) over a
    search-API stand-in and return the union of pages as one relation.
    The driver-side buffer is bounded by the reference's own
    100-page x 100-row cap (src/subscription.ts:227-239) — the loop is
    inherently sequential (each call needs the previous cursor), which
    is exactly why the reference caps it; everything downstream of the
    union is distributed."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
        .limit(_S1_CAP)
    )
    api_rows = [tuple(r) for r in docs.collect()]  # the "remote API" corpus
    return paged_scan(spark, fetcher_from_rows(api_rows), _S1_SCHEMA)


# --------------------------------------------------------------------------
# S6: record validation filter (the batch twin of the streaming validator)
# --------------------------------------------------------------------------

_S6_REC_SCHEMA = T.StructType(
    [T.StructField("t", T.StringType()), T.StructField("k", T.LongType())]
)

# canonical JSON integer that also fits a BIGINT: optional sign, no
# leading zeros, <= 18 digits — shared verbatim by the Spark producer
# guard and the DuckDB oracle so keep/drop decisions cannot diverge.
# Anchored with \z, not $: java.util.regex's $ matches BEFORE a trailing
# newline while RE2's $ is true end-of-text, so a props value like
# "123\n" would be kept by Spark and dropped by the oracle; \z means
# end-of-input in BOTH dialects (same $-vs-\z divergence config.py's
# recordName gate fixed in r9).
_S6_INT_RE = "^-?(0|[1-9][0-9]{0,17})\\z"


@register(
    "s6_validation_filter",
    f"""
    SELECT event_id, event_type AS rec_type,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    WHERE event_type <> 'error'
      AND NOT regexp_matches(event_type, '[\\x00-\\x1f]')
      AND (json_extract_string(props, '$.k') IS NULL
           OR regexp_matches(json_extract_string(props, '$.k'),
                             '{_S6_INT_RE}'))
    """,
)
def s6_validation_filter(spark, sf_dir):
    """S6/W5: per-record validation via the REAL validator
    (streaming/pipeline.py:48 validated_json — PERMISSIVE parse + corrupt
    filter; reference src/util/subscription.ts:42-46,147-170). The
    producer stage serializes each event to a record JSON, emitting a
    truncated (poison-pill) payload for 'error' events; the validator
    must drop exactly those and parse the rest.

    Producer hardening (review r9): a NULL event_type and a
    non-canonical k both serialize as the poison pill (the raw
    interpolation would otherwise emit the literal text 'null' /
    corrupt JSON, silently diverging from the oracle's NULL-dropping
    WHERE), as does a control character in the type (it would corrupt
    the JSON Spark-side only); a quote or backslash in event_type is
    JSON-escaped so an exotic type name round-trips.  _S6_INT_RE is the
    SINGLE canonical-integer gate both engines apply: no leading zeros
    ('007' is invalid JSON when interpolated bare but TRY_CASTs to 7)
    and at most 18 digits (a 20-digit k overflows from_json's LongType
    Spark-side but TRY_CASTs to NULL).  The fixture contains none of
    these — the guards keep the query honest off-fixture."""
    ev = load_table(spark, sf_dir, "events")
    k_str = F.get_json_object("props", "$.k")
    poison = (
        F.col("event_type").isNull()
        | (F.col("event_type") == "error")
        | F.col("event_type").rlike("[\\x00-\\x1f]")
        | (k_str.isNotNull() & ~k_str.rlike(_S6_INT_RE))
    )
    t_esc = F.regexp_replace(
        F.regexp_replace(F.col("event_type"), r"\\", r"\\\\"), '"', r'\\"'
    )
    raw = ev.select(
        "event_id",
        F.when(poison, F.lit('{"t":"error","k":'))
        .otherwise(
            F.format_string(
                '{"t":"%s","k":%s}', t_esc, F.coalesce(k_str, F.lit("null"))
            )
        )
        .alias("raw"),
    )
    # barrier=True: this producer is a regex+JSON expression, and
    # without the exchange the validator's ~6 references to the json
    # column would each recompute it (measured 2x the whole query at
    # bench scale); the shuffle also spreads the parse across cores on
    # a single-split input.
    valid = validated_json(raw, "raw", _S6_REC_SCHEMA, barrier=True)
    return valid.select(
        "event_id",
        F.col("_rec.t").alias("rec_type"),
        F.col("_rec.k").alias("k"),
    )


# --------------------------------------------------------------------------
# Shared page derivation for P11 / S10: top-3 posts per feed (event_type)
# --------------------------------------------------------------------------

_PAGE_SQL = """
    ev AS (
      SELECT event_type AS feed,
             'at://did:plc:' || CAST(user_id AS VARCHAR)
               || '/app.bsky.feed.post/rk' || CAST(event_id AS VARCHAR) AS uri,
             'rk' || CAST(event_id AS VARCHAR) AS rkey,
             epoch_us(ts) AS us,
             CAST(row_number() OVER (PARTITION BY event_type
                  ORDER BY epoch_us(ts) DESC, event_id) AS BIGINT) AS rn
      FROM events
    ),
    page AS (SELECT * FROM ev WHERE rn <= 3)
"""


def _page_df(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.col("ts_us").desc(), "event_id")
    return (
        ev.select(
            F.col("event_type").alias("feed"),
            F.concat(
                F.lit("at://did:plc:"),
                F.col("user_id").cast("string"),
                F.lit("/app.bsky.feed.post/rk"),
                F.col("event_id").cast("string"),
            ).alias("uri"),
            F.concat(F.lit("rk"), F.col("event_id").cast("string")).alias("rkey"),
            F.col("ts_us").alias("us"),
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# --------------------------------------------------------------------------
# P11: private-feed ACL
# --------------------------------------------------------------------------

_ACL = [
    ("click", "did:ex:alice"),
    ("click", "did:ex:bob"),
    ("purchase", "did:ex:alice"),
]
_REQUESTS = [
    ("click", "did:ex:alice"),      # allowed: on the click allowlist
    ("click", "did:ex:carol"),      # denied: click is private, not listed
    ("view", "did:ex:carol"),       # allowed: view is public (no ACL rows)
    ("purchase", "did:ex:bob"),     # denied: purchase allowlist is alice-only
    ("signup", "did:ex:dana"),      # allowed: public
]

_ACL_VALUES = ", ".join(f"('{f}', '{d}')" for f, d in _ACL)
_REQ_VALUES = ", ".join(f"('{f}', '{d}')" for f, d in _REQUESTS)


@register(
    "p11_acl_filter",
    f"""
    WITH {_PAGE_SQL},
    acl(feed, did) AS (VALUES {_ACL_VALUES}),
    req(feed, requester) AS (VALUES {_REQ_VALUES}),
    allowed AS (
      SELECT r.feed, r.requester FROM req r
      WHERE r.feed NOT IN (SELECT feed FROM acl)
      UNION ALL
      SELECT r.feed, r.requester FROM req r
      JOIN acl a ON a.feed = r.feed AND a.did = r.requester
    )
    SELECT al.feed, al.requester, p.uri, p.rn
    FROM allowed al JOIN page p ON p.feed = al.feed
    """,
)
def p11_acl_filter(spark, sf_dir):
    """P11 private-feed ACL as a relational twin of serving.py:58
    (reference src/algos/starrysky.ts:26-40): a feed with ACL rows is
    private — a request passes only when (feed, requester) is
    allowlisted; feeds with no ACL rows are public. The gate multiplies
    the whole page, not per-row — same semantics as the driver-side
    check, expressed as broadcast joins."""
    acl = spark.createDataFrame(_ACL, "feed string, did string")
    req = spark.createDataFrame(_REQUESTS, "feed string, requester string")
    public_req = req.join(F.broadcast(acl.select("feed").distinct()), "feed", "left_anti")
    private_ok = (
        req.join(
            F.broadcast(acl),
            (req["feed"] == acl["feed"]) & (req["requester"] == acl["did"]),
        )
        .select(req["feed"], req["requester"])
    )
    allowed = public_req.unionByName(private_ok)
    page = _page_df(spark, sf_dir)
    return page.join(F.broadcast(allowed), "feed").select(
        "feed", "requester", "uri", "rn"
    )


# --------------------------------------------------------------------------
# S10: JSON feed-skeleton response shaping
# --------------------------------------------------------------------------

@register(
    "s10_feed_response",
    f"""
    WITH {_PAGE_SQL}
    SELECT feed,
           '{{"feed":[' ||
           string_agg('{{"post":"' || uri || '"}}', ',' ORDER BY rn) ||
           '],"cursor":"' || arg_max(CAST(us AS VARCHAR) || '::' || rkey, rn) ||
           '"}}' AS response
    FROM page
    GROUP BY feed
    """,
)
def s10_feed_response(spark, sf_dir):
    """S10 JSON response sink (serving.py:43 get_feed_skeleton;
    reference src/algos/starrysky.ts:69-80): shape each feed's page into
    the skeleton body {"feed":[{"post":uri}...],"cursor":"us::cid"} with
    the cursor taken from the page's last row. Built with deterministic
    string aggregation on both sides (no JSON-library formatting
    divergence); one hash aggregate per feed."""
    page = _page_df(spark, sf_dir)
    # collect only non-NULL uris: the oracle's string_agg silently skips
    # a NULL element, while an unguarded collect_list kept the struct
    # and format_string printed {"post":"null"} (review r9; latent —
    # the fixture's user_id has no NULLs)
    items = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("uri").isNotNull(), F.struct("rn", "uri"))
                )
            ),
            lambda x: F.format_string('{"post":"%s"}', x["uri"]),
        ),
        ",",
    )
    cursor = F.max_by(
        F.format_string("%s::%s", F.col("us").cast("string"), F.col("rkey")),
        F.col("rn"),
    )
    return page.groupBy("feed").agg(
        F.format_string('{"feed":[%s],"cursor":"%s"}', items, cursor).alias("response")
    )


# --------------------------------------------------------------------------
# T6: init-count limit with truncation watermark
# --------------------------------------------------------------------------

_T6_INIT = 5


@register(
    "t6_init_limit",
    f"""
    WITH ranked AS (
      SELECT event_type AS feed, event_id, epoch_us(ts) AS ts_us,
             CAST(row_number() OVER (PARTITION BY event_type
                  ORDER BY epoch_us(ts) DESC, event_id DESC) AS BIGINT) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n_feed
      FROM events
    ),
    kept AS (SELECT * FROM ranked WHERE rn <= {_T6_INIT})
    SELECT feed, event_id, rn,
           n_feed > {_T6_INIT} AS truncated,
           MIN(ts_us) OVER (PARTITION BY feed) AS floor_us
    FROM kept
    """,
)
def t6_init_limit(spark, sf_dir):
    """T6 init-count limit as the relational twin of ingest.py:127-166
    (reference src/subscription.ts:179-200): a feed's first
    materialization keeps only the newest initPost rows; feeds that
    actually truncated carry the low watermark (oldest kept timestamp)
    that later incremental runs filter against."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("ts_us").desc(), F.col("event_id").desc()
    )
    wc = Window.partitionBy("event_type")
    kept = (
        ev.select(
            F.col("event_type").alias("feed"),
            "event_id",
            "ts_us",
            F.row_number().over(w).cast("bigint").alias("rn"),
            F.count(F.lit(1)).over(wc).alias("n_feed"),
        )
        .filter(F.col("rn") <= _T6_INIT)
    )
    wf = Window.partitionBy("feed")
    return kept.select(
        "feed",
        "event_id",
        "rn",
        (F.col("n_feed") > _T6_INIT).alias("truncated"),
        F.min("ts_us").over(wf).alias("floor_us"),
    )


# --------------------------------------------------------------------------
# U3: delete-then-insert upsert
# --------------------------------------------------------------------------

@register(
    "u3_delete_insert_upsert",
    """
    WITH incoming AS (
      SELECT n_nationkey, 'upd_' || n_name AS name, n_regionkey, 'incoming' AS origin
      FROM nation WHERE n_nationkey % 5 = 0
    ),
    kept AS (
      SELECT n_nationkey, n_name AS name, n_regionkey, 'stored' AS origin
      FROM nation
      WHERE n_nationkey NOT IN (SELECT n_nationkey FROM incoming)
    )
    SELECT * FROM incoming UNION ALL SELECT * FROM kept
    """,
)
def u3_delete_insert_upsert(spark, sf_dir):
    """U3 delete-then-insert full replace (config.py ConditionsRegistry
    .upsert; reference src/databaseUtil.ts:77-108): the incoming batch
    replaces stored rows with the same key wholesale — final state is
    incoming ∪ (stored ANTI-JOIN incoming). One broadcast anti join; no
    read-modify-write per key."""
    nation = load_table(spark, sf_dir, "nation")
    incoming = nation.filter(F.col("n_nationkey") % 5 == 0).select(
        "n_nationkey",
        F.concat(F.lit("upd_"), F.col("n_name")).alias("name"),
        "n_regionkey",
        F.lit("incoming").alias("origin"),
    )
    kept = nation.join(
        F.broadcast(incoming.select("n_nationkey")), "n_nationkey", "left_anti"
    ).select(
        "n_nationkey",
        F.col("n_name").alias("name"),
        "n_regionkey",
        F.lit("stored").alias("origin"),
    )
    return incoming.unionByName(kept)


# --------------------------------------------------------------------------
# U4: cascading delete
# --------------------------------------------------------------------------

@register(
    "u4_cascading_delete",
    """
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS surviving_orders
    FROM orders o
    WHERE o.o_custkey NOT IN (
      SELECT c_custkey FROM customer WHERE c_acctbal < 0
    )
    GROUP BY o.o_orderpriority
    """,
)
def u4_cascading_delete(spark, sf_dir):
    """U4 cascading delete as the relational twin of store.py:223
    delete_key (reference src/databaseUtil.ts:177-186): deleting a
    parent (customers closing with negative balance) cascades to every
    child row — surviving orders are the anti join against the deleted
    key set, aggregated per priority. The deleted-key side is small and
    broadcast; the child table is never rewritten row-by-row."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    deleted = cust.filter(F.col("c_acctbal") < 0).select("c_custkey")
    return (
        orders.join(
            F.broadcast(deleted),
            orders["o_custkey"] == deleted["c_custkey"],
            "left_anti",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("surviving_orders"))
    )
