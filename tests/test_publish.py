"""Feed-generator publish/delete ops flow (reference
scripts/publishFeedGen.ts + scripts/deleteFeedGenerator.ts) against a
fake transport — the engine-side logic is record shape, validation,
encoding rules, DID defaulting, and op routing; only the network hop is
injected."""

from __future__ import annotations

import pytest

from starryskyqueryengine_spark.codecs import png_encode
from starryskyqueryengine_spark.config import FeedCondition
from starryskyqueryengine_spark.publish import (
    FEED_GENERATOR_COLLECTION,
    PublishError,
    avatar_encoding,
    build_feed_generator_record,
    delete_feed_generator,
    publish_feed_generator,
    publish_feed_generator_from_condition,
    resolve_service_did,
)

JPEG_STUB = b"\xff\xd8\xff\xe0" + b"\x00" * 16  # magic-valid JPEG prefix


class FakeTransport:
    def __init__(self, did="did:plc:publisher"):
        self.did = did
        self.calls = []

    def login(self, identifier, password):
        self.calls.append(("login", identifier, password))
        return self.did

    def upload_blob(self, data, encoding):
        self.calls.append(("upload_blob", bytes(data), encoding))
        return {"$type": "blob", "mimeType": encoding, "size": len(data)}

    def put_record(self, repo, collection, rkey, record):
        self.calls.append(("put_record", repo, collection, rkey, record))
        return {"uri": f"at://{repo}/{collection}/{rkey}", "cid": "fakecid"}

    def delete_record(self, repo, collection, rkey):
        self.calls.append(("delete_record", repo, collection, rkey))
        return {"commit": {"rev": "r1"}}


def test_publish_minimal_record_shape():
    t = FakeTransport()
    out = publish_feed_generator(
        t, "user.example", "app-pass", "whats-hot", "What's Hot",
        description="Top¥ntrending",
        hostname="feeds.example.com",
        created_at="2024-01-01T00:00:00.000Z",
    )
    op, repo, coll, rkey, record = t.calls[-1]
    assert (op, repo, coll, rkey) == (
        "put_record", "did:plc:publisher", FEED_GENERATOR_COLLECTION, "whats-hot"
    )
    # publishFeedGen.ts:70-76 record body; ¥n normalizes (:27); no
    # avatar key at all without an avatar (undefined serializes away)
    assert record == {
        "did": "did:web:feeds.example.com",
        "displayName": "What's Hot",
        "description": "Top\ntrending",
        "createdAt": "2024-01-01T00:00:00.000Z",
    }
    assert out["uri"] == (
        "at://did:plc:publisher/app.bsky.feed.generator/whats-hot"
    )


def test_publish_with_avatar_uploads_blob_first():
    t = FakeTransport()
    png = png_encode([[0, 1], [2, 3]])
    out = publish_feed_generator(
        t, "u", "p", "pics", "Pics", avatar_path="icon.png",
        avatar_bytes=png, service_did="did:web:svc.example",
    )
    kinds = [c[0] for c in t.calls]
    assert kinds == ["login", "upload_blob", "put_record"]
    _, data, encoding = t.calls[1]
    assert data == png and encoding == "image/png"
    assert out["record"]["avatar"]["mimeType"] == "image/png"
    # explicit service DID wins over hostname defaulting
    assert out["record"]["did"] == "did:web:svc.example"


def test_avatar_encoding_rules_match_reference():
    # publishFeedGen.ts:52-60: png / jpg / jpeg only
    assert avatar_encoding("a.png") == "image/png"
    assert avatar_encoding("a.JPG") == "image/jpeg"
    assert avatar_encoding("b.jpeg") == "image/jpeg"
    with pytest.raises(PublishError, match="png or jpeg"):
        avatar_encoding("c.gif")


def test_avatar_magic_mismatch_fails_before_upload():
    """Engine-side extra: a JPEG payload named .png must refuse before
    any transport call touches the wire (the reference would silently
    publish a broken avatar)."""
    t = FakeTransport()
    with pytest.raises(PublishError, match="magic"):
        publish_feed_generator(
            t, "u", "p", "r", "R", avatar_path="icon.png",
            avatar_bytes=JPEG_STUB, hostname="h.example",
        )
    # ADVICE r13: input validation precedes EVERY transport call — a
    # malformed avatar must not perform a live login
    assert t.calls == []


def test_did_defaulting_and_missing_hostname_error():
    # publishFeedGen.ts:40-44
    assert resolve_service_did("did:web:x", "ignored") == "did:web:x"
    assert resolve_service_did(None, "h.example") == "did:web:h.example"
    with pytest.raises(PublishError, match="hostname"):
        resolve_service_did(None, None)


def test_rkey_grammar_enforced():
    t = FakeTransport()
    for bad in ("", "has space", "ünïcode", "a/b", ".", ".."):
        with pytest.raises(PublishError, match="record name"):
            publish_feed_generator(t, "u", "p", bad, "D", hostname="h")
    assert t.calls == []  # validation precedes login


def test_publish_from_condition_uses_conditions_table_identity():
    t = FakeTransport()
    cond = FeedCondition(
        key="k1", recordName="cats", feedName="Cat Pics",
        feedDescription="all cats", feedAvatar="",
    )
    out = publish_feed_generator_from_condition(
        t, "u", "p", cond, hostname="h.example",
        created_at="2024-06-01T00:00:00.000Z",
    )
    rec = out["record"]
    assert rec["displayName"] == "Cat Pics"
    assert rec["description"] == "all cats"
    assert "avatar" not in rec
    assert out["uri"].endswith("/app.bsky.feed.generator/cats")


def test_delete_routes_the_same_triple():
    # deleteFeedGenerator.ts:33-39
    t = FakeTransport()
    out = delete_feed_generator(t, "u", "p", "whats-hot")
    assert t.calls == [
        ("login", "u", "p"),
        ("delete_record", "did:plc:publisher",
         FEED_GENERATOR_COLLECTION, "whats-hot"),
    ]
    assert out["uri"] == (
        "at://did:plc:publisher/app.bsky.feed.generator/whats-hot"
    )


def test_record_builder_is_deterministic():
    a = build_feed_generator_record("did:web:x", "D", "d", None, "T")
    b = build_feed_generator_record("did:web:x", "D", "d", None, "T")
    assert a == b and "avatar" not in a


def test_avatar_bytes_without_path_refuses():
    """Review r12: a supplied payload with no path (no encoding source)
    must not be silently dropped — that would publish WITHOUT the
    avatar the caller intended to attach."""
    t = FakeTransport()
    with pytest.raises(PublishError, match="without avatar_path"):
        publish_feed_generator(
            t, "u", "p", "feed", "Feed", avatar_bytes=JPEG_STUB,
            hostname="h.example",
        )
    # ADVICE r13: fails fast BEFORE any transport call, login included
    assert t.calls == []


def test_avatar_path_without_bytes_refuses_before_login():
    """ADVICE r13: the sibling consistency check (path supplied, payload
    missing) shares the fail-fast contract — no transport call."""
    t = FakeTransport()
    with pytest.raises(PublishError, match="without avatar_bytes"):
        publish_feed_generator(
            t, "u", "p", "feed", "Feed", avatar_path="icon.png",
            hostname="h.example",
        )
    assert t.calls == []
