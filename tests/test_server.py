"""HTTP/XRPC service shell tests: real sockets on 127.0.0.1.

Covers the runnable twin of the reference's Express app
(src/server.ts:33-80): skeleton serving with paging + auth, the feed
catalog, the well-known DID document, and the databaseUtil admin routes
(passkey gate, validation result codes, cascade delete).
"""

from __future__ import annotations

import datetime as dt
import json
import urllib.error
import urllib.request

import pytest

from starryskyqueryengine_spark.auth import sign_jwt_hs256
from starryskyqueryengine_spark.config import ConditionsRegistry, FeedCondition
from starryskyqueryengine_spark.ingest import IngestJob
from starryskyqueryengine_spark.server import (
    FeedGeneratorServer,
    ServerConfig,
    parse_at_uri,
    validate_set_query,
)
from starryskyqueryengine_spark.serving import FeedServer
from starryskyqueryengine_spark.store import PostStore
from tests.conftest import make_posts

SERVICE_DID = "did:web:feed.test"
JWT_KEY = b"server-test-key"


def _req(port, path, body=None, headers=None, method=None):
    """Returns (status, parsed-json-or-None)."""
    url = f"http://127.0.0.1:{port}{path}"
    data = None
    hdrs = dict(headers or {})
    if body is not None:
        data = json.dumps(body).encode()
        hdrs["Content-Type"] = "application/json"
    r = urllib.request.Request(url, data=data, headers=hdrs, method=method)
    try:
        with urllib.request.urlopen(r, timeout=10) as resp:
            raw = resp.read()
            return resp.status, (json.loads(raw) if raw else None)
    except urllib.error.HTTPError as e:
        raw = e.read()
        return e.code, (json.loads(raw) if raw else None)


@pytest.fixture()
def world(spark, tmp_path):
    reg = ConditionsRegistry()
    reg.upsert(FeedCondition(key="sparkfeed", recordName="sparkfeed",
                             inputRegex="spark", pinnedPost=["at://pin/1"]))
    reg.upsert(FeedCondition(key="secretfeed", recordName="secretfeed",
                             inputRegex="data", privateFeed=["did:plc:friend"]))
    store = PostStore(spark, str(tmp_path / "posts"))
    rows = []
    for i in range(12):
        text = "spark rocks" if i % 2 == 0 else "data rocks"
        rows.append({"uri": f"at://u/p/{i}", "cid": f"c{i:03d}", "text": text,
                     "createdAt": dt.datetime(2024, 1, 1, 0, 0, i)})
    IngestJob(spark, reg, store).run_once(make_posts(spark, rows))
    feeds = FeedServer(spark, reg, store)
    return reg, store, feeds


@pytest.fixture()
def server(world):
    reg, store, feeds = world
    cfg = ServerConfig(hostname="feed.test", service_did=SERVICE_DID,
                       publisher_did="did:example:pub", passkey="sesame")
    srv = FeedGeneratorServer(feeds, cfg, key_lookup=lambda iss: JWT_KEY)
    srv.start()
    yield srv
    srv.stop()


def _skeleton_uri(record_name):
    return f"at://did:example:pub/app.bsky.feed.generator/{record_name}"


def test_parse_at_uri():
    assert parse_at_uri("at://did:x/app.bsky.feed.generator/abc") == (
        "did:x", "app.bsky.feed.generator", "abc")
    for bad in ("http://x/y/z", "at://only/two", "at://a/b/c/d", "at://a//c"):
        with pytest.raises(ValueError):
            parse_at_uri(bad)


def test_get_feed_skeleton_pages_without_overlap(server):
    port = server.port
    status, body = _req(
        port, "/xrpc/app.bsky.feed.getFeedSkeleton"
        f"?feed={_skeleton_uri('sparkfeed')}&limit=3")
    assert status == 200
    # pinned prepend on the first page only (T5)
    assert body["feed"][0] == {"post": "at://pin/1"}
    page1 = [f["post"] for f in body["feed"][1:]]
    assert len(page1) == 3 and "cursor" in body

    status, body2 = _req(
        port, "/xrpc/app.bsky.feed.getFeedSkeleton"
        f"?feed={_skeleton_uri('sparkfeed')}&limit=3&cursor={body['cursor']}")
    assert status == 200
    page2 = [f["post"] for f in body2["feed"]]
    assert page2 and not (set(page1) & set(page2))  # keyset: no overlap
    assert page2[0] != "at://pin/1"  # pinned only on page 1
    # newest-first ordering across the page boundary
    ids = [int(u.rsplit("/", 1)[1]) for u in page1 + page2]
    assert ids == sorted(ids, reverse=True)


def test_get_feed_skeleton_unknown_feed_400(server):
    status, body = _req(
        server.port,
        f"/xrpc/app.bsky.feed.getFeedSkeleton?feed={_skeleton_uri('nope')}")
    assert status == 400
    assert body["error"] == "UnsupportedAlgorithm"


def test_get_feed_skeleton_bad_uri_400(server):
    status, body = _req(
        server.port, "/xrpc/app.bsky.feed.getFeedSkeleton?feed=junk")
    assert status == 400
    assert body["error"] == "InvalidRequest"


def test_private_feed_requires_jwt(server):
    path = (f"/xrpc/app.bsky.feed.getFeedSkeleton"
            f"?feed={_skeleton_uri('secretfeed')}&limit=5")
    status, body = _req(server.port, path)
    assert status == 401 and body["error"] == "AuthRequired"

    tok = sign_jwt_hs256({"iss": "did:plc:friend", "aud": SERVICE_DID}, JWT_KEY)
    status, body = _req(server.port, path,
                        headers={"Authorization": f"Bearer {tok}"})
    assert status == 200
    assert len(body["feed"]) == 5

    # valid JWT but a DID outside the allowlist -> empty page, not an error
    # (src/algos/starrysky.ts:26-40 ACL semantics)
    tok2 = sign_jwt_hs256({"iss": "did:plc:stranger", "aud": SERVICE_DID}, JWT_KEY)
    status, body = _req(server.port, path,
                        headers={"Authorization": f"Bearer {tok2}"})
    assert status == 200 and body["feed"] == []


def test_describe_feed_generator(server):
    status, body = _req(server.port, "/xrpc/app.bsky.feed.describeFeedGenerator")
    assert status == 200
    assert body["did"] == SERVICE_DID
    uris = {f["uri"] for f in body["feeds"]}
    assert _skeleton_uri("sparkfeed") in uris
    assert _skeleton_uri("secretfeed") in uris


def test_well_known_did_json(server):
    status, body = _req(server.port, "/.well-known/did.json")
    assert status == 200
    assert body["id"] == SERVICE_DID
    assert body["service"][0]["serviceEndpoint"] == "https://feed.test"


def test_well_known_hostname_mismatch_404(world):
    _, _, feeds = world
    cfg = ServerConfig(hostname="other.example", service_did=SERVICE_DID)
    with FeedGeneratorServer(feeds, cfg) as srv:
        status, _ = _req(srv.port, "/.well-known/did.json")
        assert status == 404


def test_admin_passkey_gate(server):
    # wrong passkey -> 401 (databaseUtil.ts:13-15)
    status, _ = _req(server.port, "/setQuery",
                     body={"key": "x", "recordName": "x"},
                     headers={"x-starrtsky-webpasskey": "wrong"})
    assert status == 401
    status, _ = _req(server.port, "/getQuery", body={"key": "sparkfeed"})
    assert status == 401


def test_admin_set_get_delete_roundtrip(server):
    hdr = {"x-starrtsky-webpasskey": "sesame"}
    newfeed = {
        "key": "newfeed", "recordName": "newfeed", "inputRegex": "rocks",
        "refresh": "0", "initPost": "100", "limitCount": "500",
        "feedName": "New Feed", "lang": "en",
    }
    status, body = _req(server.port, "/setQuery", body=newfeed, headers=hdr)
    assert status == 200 and body["result"] == "OK"

    status, body = _req(server.port, "/getQuery",
                        body={"key": "newfeed"}, headers=hdr)
    assert status == 200 and body["result"] == "OK"
    assert body["recordName"] == "newfeed"
    assert body["limitCount"] == 500 and body["recordCount"] == 0
    assert body["queryEngineVersion"].startswith("starryskyqueryengine-spark/")

    # the new condition is immediately visible in the catalog
    status, body = _req(server.port, "/xrpc/app.bsky.feed.describeFeedGenerator")
    assert _skeleton_uri("newfeed") in {f["uri"] for f in body["feeds"]}

    status, body = _req(server.port, "/deleteCondition",
                        body={"key": "newfeed"}, headers=hdr)
    assert status == 200 and body["result"] == "OK"
    status, body = _req(server.port, "/getQuery",
                        body={"key": "newfeed"}, headers=hdr)
    assert body["result"] == "NOT_FOUND"


def test_admin_delete_cascades_to_store(server, world):
    reg, store, _ = world
    hdr = {"x-starrtsky-webpasskey": "sesame"}
    assert store.read().filter("key = 'sparkfeed'").count() > 0
    status, body = _req(server.port, "/deleteCondition",
                        body={"key": "sparkfeed"}, headers=hdr)
    assert status == 200 and body["result"] == "OK"
    # U4 cascade: condition gone AND its posts gone
    assert reg.get("sparkfeed") is None
    assert store.read().filter("key = 'sparkfeed'").count() == 0


def test_set_query_validation_result_codes(server):
    hdr = {"x-starrtsky-webpasskey": "sesame"}
    cases = [
        ({"recordName": "ok", "inputRegex": "("}, "INPUT_REGEX_ERROR"),
        ({"recordName": "ok", "invertRegex": "(?<bad"}, "INVERT_REGEX_ERROR"),
        ({"recordName": "Bad_Name"}, "RECORDNAME_NOTALPHA"),
        ({"recordName": "ok", "refresh": "1.5"}, "NOT_NUMBER_REFRESH"),
        ({"recordName": "ok", "initPost": "ten"}, "NOT_NUMBER_INITPOST"),
        ({"recordName": "ok", "limitCount": "many"}, "NOT_NUMBER_LIMITCOUNT"),
        ({"recordName": "ok", "profileMatch": "oops"}, "PROFILE_MATCH_REGEX_ERROR"),
        ({"recordName": "ok", "profileMatch": "a::("}, "PROFILE_MATCH_REGEX_ERROR"),
    ]
    for body, code in cases:
        body = {"key": "k", **body}
        status, resp = _req(server.port, "/setQuery", body=body, headers=hdr)
        assert (status, resp["result"]) == (500, code), body


def test_validate_set_query_order_matches_reference():
    # databaseUtil.ts checks inputRegex before recordName: a row failing
    # both must report the regex error (order parity)
    err = validate_set_query({"recordName": "BAD", "inputRegex": "("})
    assert err[0] == "INPUT_REGEX_ERROR"


def test_admin_open_when_no_passkey(world):
    _, _, feeds = world
    cfg = ServerConfig(service_did=SERVICE_DID)  # passkey None -> gate off
    with FeedGeneratorServer(feeds, cfg) as srv:
        status, body = _req(srv.port, "/getQuery", body={"key": "sparkfeed"})
        assert status == 200 and body["result"] == "OK"


def test_concurrent_requests(server):
    """ThreadingHTTPServer: concurrent skeleton fetches all succeed."""
    import concurrent.futures as cf

    path = (f"/xrpc/app.bsky.feed.getFeedSkeleton"
            f"?feed={_skeleton_uri('sparkfeed')}&limit=2")
    with cf.ThreadPoolExecutor(max_workers=4) as ex:
        results = list(ex.map(lambda _: _req(server.port, path), range(8)))
    assert all(status == 200 for status, _ in results)
    bodies = [b["feed"] for _, b in results]
    assert all(b == bodies[0] for b in bodies)


def test_malformed_cursor_is_400_not_500(server):
    status, resp = _req(
        server.port,
        "/xrpc/app.bsky.feed.getFeedSkeleton"
        f"?feed={_skeleton_uri('sparkfeed')}&cursor=garbage",
    )
    assert status == 400
    assert resp["error"] == "InvalidRequest"


def test_set_query_bad_imageonly_gets_result_code_not_500(server):
    """Fields the reference gauntlet does not cover still fail with the
    documented {'result': ...} shape, not an opaque InternalServerError."""
    hdr = {"x-starrtsky-webpasskey": "sesame"}
    status, resp = _req(
        server.port, "/setQuery",
        body={"key": "k9", "recordName": "ok", "imageOnly": "both"},
        headers=hdr,
    )
    assert status == 500
    assert resp["result"] == "INVALID_PARAMETER"
    assert "imageOnly" in resp["message"]


def test_set_query_preserves_init_truncation_watermark(server, world):
    """A cosmetic admin edit must not erase the engine's initTruncated
    low-watermark: the full-replace upsert carries it forward, or
    already-truncated old posts would re-enter on the next replay."""
    reg, _store, _feeds = world
    cond = reg.get("sparkfeed")
    cond.initTruncated = True
    cond.lastExecTime = 12345
    hdr = {"x-starrtsky-webpasskey": "sesame"}
    status, resp = _req(
        server.port, "/setQuery",
        body={"key": "sparkfeed", "recordName": "sparkfeed",
              "inputRegex": "spark", "feedDescription": "new words"},
        headers=hdr,
    )
    assert (status, resp["result"]) == (200, "OK")
    after = reg.get("sparkfeed")
    assert after.feedDescription == "new words"
    assert after.initTruncated is True
    assert after.lastExecTime == 12345


def test_config_falsy_int_defaults_and_negative_caps():
    """from_raw mirrors the reference's `initPost || 100` falsy
    coalescing (explicit 0 takes the default — 0 used to make ingest
    drop every post for the key forever); float strings truncate like
    JS Number; negative caps are validation errors."""
    from starryskyqueryengine_spark.config import (
        ConditionValidationError,
        FeedCondition,
    )

    c = FeedCondition.from_raw(
        {"key": "k", "recordName": "ok", "initPost": 0, "limitCount": "0"}
    )
    assert (c.initPost, c.limitCount) == (100, 2000)
    c2 = FeedCondition.from_raw(
        {"key": "k", "recordName": "ok", "initPost": "12.5"}
    )
    assert c2.initPost == 12
    # non-numeric mirrors the reference too: Number('ten') is NaN and
    # NaN || 100 takes the default (keeps S7 restore total)
    assert FeedCondition.from_raw(
        {"key": "k", "recordName": "ok", "initPost": "ten"}
    ).initPost == 100
    with pytest.raises(ConditionValidationError, match=">= 0"):
        FeedCondition(key="k", recordName="ok", limitCount=-1).validate()


def test_oversized_body_rejected_413(server):
    """Reference parity (src/server.ts:48-50): json bodies are capped at
    100 KB — an oversized setQuery gets 413 PayloadTooLarge, a normal
    one still lands."""
    from starryskyqueryengine_spark.server import JSON_BODY_LIMIT

    hdr = {"x-starrtsky-webpasskey": "sesame"}
    big = {"key": "bigfeed", "recordName": "bigfeed",
           "inputRegex": "x" * (JSON_BODY_LIMIT + 1)}
    status, resp = _req(server.port, "/setQuery", body=big, headers=hdr)
    assert status == 413
    assert resp["error"] == "PayloadTooLarge"
    # the feed must NOT have been registered by the rejected request
    status, resp = _req(server.port, "/getQuery", body={"key": "bigfeed"},
                        headers=hdr)
    assert resp.get("result") != "OK" or not resp.get("query")
    # a normal-sized body on the same server still works
    ok = {"key": "smallfeed", "recordName": "smallfeed", "inputRegex": "spark"}
    status, resp = _req(server.port, "/setQuery", body=ok, headers=hdr)
    assert status == 200 and resp["result"] == "OK"


def test_negative_content_length_does_not_hang(server):
    """Review r10: a crafted negative Content-Length passed the body cap
    (not > limit) and reached rfile.read(n < 0), which reads until EOF —
    the request thread hung for as long as the client stayed silent.
    The server must answer promptly without the client closing first."""
    import http.client

    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=5)
    try:
        conn.putrequest("POST", "/getQuery")
        conn.putheader("Content-Type", "application/json")
        conn.putheader("x-starrtsky-webpasskey", "sesame")
        conn.putheader("Content-Length", "-7")
        conn.endheaders()
        # no body sent, connection held open: a hang would raise
        # socket.timeout here instead of returning a response
        resp = conn.getresponse()
        assert resp.status == 200  # empty body -> NOT_FOUND envelope
        import json as _json

        assert _json.loads(resp.read())["result"] == "NOT_FOUND"
    finally:
        conn.close()
