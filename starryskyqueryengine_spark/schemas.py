"""Typed schemas for the engine's tables and in-flight records.

Mirrors the reference data model (SURVEY.md §1): fixed-schema at rest,
validated-at-ingest in flight.

- ``post`` table: reference ``src/db/schema.ts:7-14`` /
  ``src/db/migrations.ts:13-22`` — PK(uri, key) becomes dedup-by-key logic
  plus ``key``-partitioned storage.
- ``conditions`` table: reference ``src/db/schema.ts:22-44`` — the
  data-driven per-feed "query plan". String booleans and CSV/``::`` packed
  lists are normalized to proper types at the edge.
- nested post record: reference ``src/lexicon/types/app/bsky/feed/post.ts``
  projection actually consumed by the ingester
  (``src/subscription.ts:13-31``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- at-rest tables -------------------------------------------------------

POST_SCHEMA = T.StructType(
    [
        T.StructField("uri", T.StringType(), False),
        T.StructField("key", T.StringType(), False),
        T.StructField("cid", T.StringType(), False),
        T.StructField("replyParent", T.StringType(), True),
        T.StructField("replyRoot", T.StringType(), True),
        # Stored as TimestampType; the reference stores ISO-8601 strings and
        # compares lexicographically, which is order-equivalent for UTC
        # ISO-8601 (src/subscription.ts:360, src/algos/starrysky.ts:63-67).
        T.StructField("indexedAt", T.TimestampType(), False),
    ]
)

# NOTE: the reference's sub_state cursor table (service, cursor) has no
# schema here on purpose — its job (crash-safe consumer position) is
# done by Structured Streaming checkpoints (W3) and the txnAppId/
# txnVersion watermarks in table_format.py; a declared-but-unconsumed
# StructType only drifts from the code that actually owns the contract.

CONDITIONS_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("recordName", T.StringType(), False),
        T.StructField("query", T.StringType(), True),
        T.StructField("inputRegex", T.StringType(), True),
        T.StructField("invertRegex", T.StringType(), True),
        T.StructField("refresh", T.IntegerType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("labelDisable", T.BooleanType(), True),
        T.StructField("replyDisable", T.BooleanType(), True),
        T.StructField("imageOnly", T.StringType(), True),  # ''|imageOnly|textOnly
        T.StructField("includeAltText", T.BooleanType(), True),
        T.StructField("initPost", T.IntegerType(), True),
        T.StructField("pinnedPost", T.ArrayType(T.StringType()), True),
        T.StructField("lastExecTime", T.LongType(), True),  # ms
        T.StructField("feedName", T.StringType(), True),
        T.StructField("feedDescription", T.StringType(), True),
        T.StructField("limitCount", T.IntegerType(), True),
        T.StructField("privateFeed", T.ArrayType(T.StringType()), True),
        T.StructField("feedAvatar", T.StringType(), True),
        T.StructField("profileMatch", T.StringType(), True),  # 'term::profileRegex'
        T.StructField("recordCount", T.LongType(), True),
        # low-watermark flag: set when the key's first run was T6-truncated
        T.StructField("initTruncated", T.BooleanType(), True),
    ]
)

# --- in-flight records ----------------------------------------------------

IMAGE_EMBED_SCHEMA = T.StructType(
    [
        T.StructField("alt", T.StringType(), True),
        T.StructField(
            "aspectRatio",
            T.StructType(
                [
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("width", T.IntegerType(), True),
                ]
            ),
            True,
        ),
        T.StructField("fullsize", T.StringType(), True),
        T.StructField("thumb", T.StringType(), True),
    ]
)

# Projection of the nested post record the ingest pipeline consumes
# (reference src/subscription.ts:13-31; full lexicon has an open tail, kept
# as raw JSON in `props` and accessed via get_json_object/from_json).
INGEST_POST_SCHEMA = T.StructType(
    [
        T.StructField("uri", T.StringType(), False),
        T.StructField("cid", T.StringType(), False),
        T.StructField("author_did", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("langs", T.ArrayType(T.StringType()), True),
        T.StructField("tags", T.ArrayType(T.StringType()), True),
        T.StructField("replyParent", T.StringType(), True),
        T.StructField("replyRoot", T.StringType(), True),
        T.StructField("images", T.ArrayType(IMAGE_EMBED_SCHEMA), True),
        T.StructField("labels", T.ArrayType(T.StringType()), True),
        T.StructField("createdAt", T.TimestampType(), True),
        T.StructField("props", T.StringType(), True),  # open-map tail as JSON
    ]
)

# NOTE: the firehose commit event (reference
# src/lexicon/types/com/atproto/sync/subscribeRepos.ts:35-52) likewise
# has no declared schema here — the live shape is owned by the code
# that decodes it: catalog_sources._OP_STRUCT (CBOR op routing, S5) and
# streaming/pipeline.py's validated record schema (S6/W5).

PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("did", T.StringType(), False),
        T.StructField("displayName", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
    ]
)
