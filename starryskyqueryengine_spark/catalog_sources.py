"""Source-layer catalog queries: the S5 firehose block-decode/op-routing
pattern and the remaining scalar-function family (F1-F8), oracle-checked.

S5 (reference ``src/util/subscription.ts:76-122``) decodes each commit's
CAR/CBOR blocks, derives ``uri = at://{repo}/{path}``, and routes ops by
collection into posts/reposts/likes/follows x create/delete. Here the
events fixture stands in for the commit stream: the payload is an opaque
binary column (multimodal pattern), the routing is pure columnar
expressions — exactly how the real CBOR path plugs in (decode UDF
upstream, everything after stays JVM-side).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from .catalog import register
from .functions import cbor
from .sources.fixtures import load_table

# event_type -> AT-proto-ish collection (deterministic, mirrored in SQL)
_COLLECTION_CASE_SQL = """
    CASE event_type
      WHEN 'click' THEN 'app.bsky.feed.like'
      WHEN 'view' THEN 'app.bsky.feed.post'
      WHEN 'purchase' THEN 'app.bsky.feed.repost'
      WHEN 'signup' THEN 'app.bsky.graph.follow'
      ELSE 'unknown'
    END
"""


# JS collection map mirrored by the block PRODUCER (firehose stand-in);
# the routing side below never sees it — it reads the decoded block.
_COLLECTION_MAP = {
    "click": "app.bsky.feed.like",
    "view": "app.bsky.feed.post",
    "purchase": "app.bsky.feed.repost",
    "signup": "app.bsky.graph.follow",
}


# explicit DataType return types: DDL-string returnType would be parsed
# through the JVM at import time and require a live SparkContext
@F.pandas_udf(T.BinaryType())
def _encode_op_block(user_id, event_type, event_id, props):
    """Producer seam: serialize each commit op into a genuine CBOR block
    (RFC 8949 subset codec, functions/cbor.py), shaped like the
    reference's firehose commit payload — repo, collection path, action,
    record body, and a tag-42 CID link."""
    import hashlib

    import pandas as pd

    out = []
    for uid, et, eid, pr in zip(user_id, event_type, event_id, props):
        rkey = f"rk{eid}"
        out.append(
            cbor.encode(
                {
                    "repo": f"did:plc:{uid}",
                    "collection": _COLLECTION_MAP.get(et, "unknown"),
                    "rkey": rkey,
                    "action": "delete" if eid % 10 == 0 else "create",
                    # NULL props ride through as CBOR null: a NULL body
                    # is ordinary for an opaque payload column, and the
                    # oracle's octet_length(encode(NULL)) is NULL — a
                    # 0-byte substitute would diverge the two engines
                    "record": pr,
                    "cid": cbor.CidLink(hashlib.md5(rkey.encode()).digest()),
                }
            )
        )
    return pd.Series(out)


_OP_STRUCT = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("collection", T.StringType()),
        T.StructField("rkey", T.StringType()),
        T.StructField("action", T.StringType()),
        T.StructField("record_bytes", T.LongType()),
    ]
)


@F.pandas_udf(_OP_STRUCT)
def _decode_op_block(block):
    """Consumer seam: decode the CBOR block and surface the op fields.
    Everything downstream routes on THESE columns — the decode is
    load-bearing, not a byte-length stub."""
    import pandas as pd

    rows = []
    for raw in block:
        op = cbor.decode(raw)
        rows.append(
            {
                "repo": op["repo"],
                "collection": op["collection"],
                "rkey": op["rkey"],
                "action": op["action"],
                "record_bytes": (
                    len(op["record"].encode("utf-8"))
                    if op["record"] is not None
                    else None
                ),
            }
        )
    return pd.DataFrame(rows)


@register(
    "s5_op_routing",
    f"""
    WITH ops AS (
      SELECT 'did:plc:' || CAST(user_id AS VARCHAR) AS repo,
             {_COLLECTION_CASE_SQL} AS collection,
             'rk' || CAST(event_id AS VARCHAR) AS rkey,
             CASE WHEN event_id % 10 = 0 THEN 'delete' ELSE 'create' END AS action,
             CAST(octet_length(encode(props)) AS BIGINT) AS record_bytes
      FROM events
      WHERE event_type <> 'error'
    )
    SELECT 'at://' || repo || '/' || collection || '/' || rkey AS uri,
           collection, action, record_bytes
    FROM ops
    """,
)
def s5_op_routing(spark, sf_dir):
    """S5: block decode + op routing (reference
    ``src/util/subscription.ts:76-122``). The events fixture stands in
    for the commit stream: each op is serialized into a real CBOR block
    (binary column), then decoded by an Arrow-batched UDF, and the uri
    derivation / collection split / create-delete routing run over the
    DECODED fields only — the oracle recomputes the same answer from the
    source columns, proving the encode→decode round trip is faithful.
    At scale both seams are Arrow-batched (no row-at-a-time Python) and
    everything after the decode stays JVM-side codegen."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") != "error")
    blocks = ev.select(
        _encode_op_block("user_id", "event_type", "event_id", "props").alias("block")
    )
    ops = blocks.select(_decode_op_block("block").alias("op")).select("op.*")
    return ops.select(
        F.concat_ws(
            "/", F.concat(F.lit("at://"), F.col("repo")), "collection", "rkey"
        ).alias("uri"),
        "collection",
        "action",
        "record_bytes",
    )


@register(
    "f_scalar_family",
    """
    SELECT doc_id,
           str_split(lang || ',' || source, ',')[1] AS first_item,            -- F3 split
           CAST(len(str_split(trim(text), ' ')) AS BIGINT) AS n_words,        -- F4 size
           list_contains(str_split(lang || ',' || source, ','), 'en') AS has_en, -- F4 membership
           lang || '::' || source AS packed,                                  -- F2 concat
           CAST(doc_id % 7 AS BIGINT) AS bucket,                              -- F8 modulo
           CAST(TRY_CAST(substr(text, 1, 2) AS INTEGER) AS INTEGER) AS maybe_int -- F6 try_cast
    FROM documents
    """,
)
def f_scalar_family(spark, sf_dir):
    """F2/F3/F4/F6/F8 in one projection: split, concat, array size and
    membership, modulo bucketing, fallible int parse (try_cast) — the
    scalar vocabulary the reference uses row-at-a-time
    (src/algos/starrysky.ts:34,44,59; src/subscription.ts:274,291;
    src/databaseUtil.ts:43-61)."""
    docs = load_table(spark, sf_dir, "documents")
    packed_list = F.split(F.concat_ws(",", "lang", "source"), ",")
    return docs.select(
        "doc_id",
        packed_list.getItem(0).alias("first_item"),
        F.size(F.split(F.trim(F.col("text")), " ")).cast("bigint").alias("n_words"),
        F.array_contains(packed_list, "en").alias("has_en"),
        F.concat_ws("::", "lang", "source").alias("packed"),
        (F.col("doc_id") % 7).cast("bigint").alias("bucket"),
        F.substring("text", 1, 2).try_cast("int").alias("maybe_int"),
    )


@register(
    "sessionize_events",
    """
    WITH ordered AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                  OR LAG(epoch_us(ts)) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ),
    tagged AS (
      -- event_id tie-break matches BOTH the lag window above and the
      -- Spark side: without it, (user_id, ts) ties make the running
      -- sum's row order (and thus session assignment) engine-dependent
      SELECT user_id, ts_us,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts_us, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM ordered
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           COUNT(*) AS n_events,
           MAX(ts_us) - MIN(ts_us) AS dur_us
    FROM tagged GROUP BY user_id, session_seq
    """,
)
def sessionize_events(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity): lag -> new-session
    flag -> running sum = session id -> per-session aggregates. Two
    window passes over one shuffle on user_id, then a hash aggregate —
    the canonical behavioral-analytics op the reference lacks. In
    Structured Streaming the same semantics come from
    session_window(ts, '30 minutes')."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    # load_table always materializes ts_us for events (the loader's
    # invariant; sources/fixtures.py)
    ev = ev.select("user_id", "event_id", "ts_us")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    tagged = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0),
    ).withColumn(
        "session_seq",
        F.sum("new_session").over(
            Window.partitionBy("user_id").orderBy("ts_us", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return tagged.groupBy("user_id", F.col("session_seq").cast("bigint").alias("session_seq")).agg(
        F.count("*").alias("n_events"),
        (F.max("ts_us") - F.min("ts_us")).alias("dur_us"),
    )


@register(
    "asof_purchase_attribution",
    """
    WITH clicks AS (
      SELECT user_id, epoch_us(ts) AS ts_us, MAX(event_id) AS click_id
      FROM events WHERE event_type = 'click' GROUP BY 1, 2
    ),
    purchases AS (
      SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.purchase_id, p.user_id,
           c.click_id AS asof_click_id,
           p.ts_us - c.ts_us AS lag_us
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts_us >= c.ts_us
    """,
)
def asof_purchase_attribution(spark, sf_dir):
    """As-of join: attribute each purchase to the user's most recent
    prior click. Spark has no native ASOF JOIN; operators/asof.py
    composes it from a union + carry-forward window (one shuffle on
    user_id, no range explosion). DuckDB's native ASOF JOIN is the
    independent oracle."""
    from .operators.asof import as_of_join

    ev = load_table(spark, sf_dir, "events")
    # load_table always materializes ts_us for events (loader invariant)
    ev = ev.select("event_id", "user_id", "event_type", "ts_us")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts_us")
        .agg(F.max("event_id").alias("click_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts_us"
    )
    clicks = clicks.withColumn("click_ts_us", F.col("ts_us"))
    joined = as_of_join(
        purchases, clicks, key_col="user_id", ts_col="ts_us",
        right_payload=["click_id", "click_ts_us"],
    )
    return joined.select(
        "purchase_id",
        "user_id",
        "asof_click_id",
        (F.col("ts_us") - F.col("asof_click_ts_us")).cast("bigint").alias("lag_us"),
    )


@register(
    "s1_datasource_scan",
    """
    SELECT doc_id, lang FROM documents
    """,
)
def s1_datasource_scan(spark, sf_dir):
    """S1 as a first-class Spark Python DataSource (the Spark-4-native
    successor to s1_paged_scan's driver loop): the cursor-API page
    windows split across 4 input partitions and decode on EXECUTORS —
    the driver never holds a row, unlike paged_scan. Same reference
    protocol (100-row pages, short-page stop, page cap), same data, so
    the oracle is the plain relation. The streaming twin
    (starrysky_paged_stream, cursor-as-offset with checkpoint resume)
    is exercised in tests/test_paged_datasource.py."""
    import os

    from .sources.paged_datasource import register_paged_sources

    register_paged_sources(spark)
    return (
        spark.read.format("starrysky_paged")
        .option("path", os.path.join(str(sf_dir), "documents.parquet"))
        .option("page_size", "100")
        .option("num_partitions", "4")
        .load()
        .select("doc_id", "lang")
    )


@register(
    "bloom_prefilter_upsert",
    """
    WITH stored AS (
      SELECT 'uri' || o_orderkey AS uri FROM orders WHERE o_orderkey % 7 < 5
    ),
    inc AS (
      SELECT 'uri' || o_orderkey AS uri, o_orderkey FROM orders
      WHERE o_orderkey % 3 = 0
    )
    SELECT i.uri, i.o_orderkey AS orderkey
    FROM inc i
    WHERE NOT EXISTS (SELECT 1 FROM stored s WHERE s.uri = i.uri)
    """,
)
def bloom_prefilter_upsert(spark, sf_dir):
    """S8/J3 at 100 TB: the Bloom pre-probe in front of the exact PK
    anti-join (operators/bloom.py, the same filter PostStore.upsert
    uses). The incoming batch splits against a Bloom filter of the
    stored URIs: rows the filter rejects are PROVABLY new (no false
    negatives) and skip the join entirely; only the maybe-duplicate
    remainder (true dups + ~fpp false positives) takes the exact
    anti-join. definitely_new UNION exact(maybe_dup) is row-for-row the
    plain anti-join the oracle runs, at ANY false-positive rate — so
    the result is deterministic even though which rows shortcut the
    join is not.

    Reference tie-in: INSERT .. ON CONFLICT DO NOTHING
    (src/subscription.ts:362-366) pre-probed the way Delta/Iceberg use
    file-level bloom indexes.

    100 TB shape: bit positions are computed by codegen'd xxhash64 on
    both sides (Kirsch-Mitzenmacher double hashing); the build
    aggregates to at most m distinct positions regardless of store
    size; the probe broadcasts a packed bitset and does one vectorized
    numpy gather per Arrow batch. The exact join — the expensive part —
    runs over only the maybe-dup slice; on the dominant mostly-new
    ingest shape that is a small fraction of the batch."""
    from .operators.bloom import bloom_split_new

    orders = load_table(spark, sf_dir, "orders")
    uri = F.concat(F.lit("uri"), F.col("o_orderkey")).alias("uri")
    stored = orders.filter(F.col("o_orderkey") % 7 < 5).select(uri)
    incoming = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        uri, F.col("o_orderkey").alias("orderkey")
    )
    definitely_new, maybe_dup = bloom_split_new(incoming, stored, key_col="uri")
    exact_new = maybe_dup.join(stored, "uri", "left_anti")
    return definitely_new.unionByName(exact_new).select("uri", "orderkey")
