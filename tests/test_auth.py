"""S12 DID document + P11 JWT auth path (reference src/auth.ts, src/well-known.ts)."""

import time

import pytest

from starryskyqueryengine_spark.auth import (
    AuthRequiredError,
    decode_jwt,
    did_document,
    sign_jwt_hs256,
    validate_auth,
    verify_jwt,
)

SERVICE_DID = "did:web:feeds.example.com"
HOST = "feeds.example.com"
KEY = b"test-signing-key"


def lookup(did):
    return KEY if did == "did:plc:alice" else None


def token(**over):
    payload = {
        "iss": "did:plc:alice",
        "aud": SERVICE_DID,
        "exp": time.time() + 600,
    }
    payload.update(over)
    return sign_jwt_hs256(payload, KEY)


# -- did document (S12, src/well-known.ts:7-23) -----------------------------

def test_did_document_shape():
    doc = did_document(SERVICE_DID, HOST)
    assert doc["id"] == SERVICE_DID
    assert doc["@context"] == ["https://www.w3.org/ns/did/v1"]
    svc = doc["service"][0]
    assert svc == {
        "id": "#bsky_fg",
        "type": "BskyFeedGenerator",
        "serviceEndpoint": f"https://{HOST}",
    }


def test_did_document_hostname_mismatch_is_404():
    assert did_document("did:web:other.example.net", HOST) is None


# -- jwt verify (P11 auth, src/auth.ts:5-18) --------------------------------

def test_happy_path_returns_iss_did():
    assert verify_jwt(token(), SERVICE_DID, lookup) == "did:plc:alice"


def test_bearer_extraction():
    hdrs = {"authorization": f"Bearer {token()}"}
    assert validate_auth(hdrs, SERVICE_DID, lookup) == "did:plc:alice"


def test_missing_bearer_raises():
    with pytest.raises(AuthRequiredError):
        validate_auth({}, SERVICE_DID, lookup)
    with pytest.raises(AuthRequiredError):
        validate_auth({"authorization": "Basic xyz"}, SERVICE_DID, lookup)


def test_bad_signature_rejected():
    tampered = sign_jwt_hs256({"iss": "did:plc:alice", "aud": SERVICE_DID}, b"wrong")
    with pytest.raises(AuthRequiredError, match="signature"):
        verify_jwt(tampered, SERVICE_DID, lookup)


def test_aud_mismatch_rejected():
    with pytest.raises(AuthRequiredError, match="aud"):
        verify_jwt(token(aud="did:web:evil.example"), SERVICE_DID, lookup)


def test_expired_rejected():
    with pytest.raises(AuthRequiredError, match="expired"):
        verify_jwt(token(exp=time.time() - 10), SERVICE_DID, lookup)


def test_unknown_issuer_key_rejected():
    with pytest.raises(AuthRequiredError, match="no signing key"):
        verify_jwt(token(iss="did:plc:nobody"), SERVICE_DID, lookup)


def test_malformed_token_rejected():
    for bad in ["", "a.b", "not-a-jwt", "a.b.c.d"]:
        with pytest.raises(AuthRequiredError):
            verify_jwt(bad, SERVICE_DID, lookup)


def test_unsupported_alg_needs_injected_verifier():
    import base64
    import json

    def b64(d):
        return base64.urlsafe_b64encode(json.dumps(d).encode()).rstrip(b"=").decode()

    rs_token = (
        b64({"alg": "RS256", "typ": "JWT"})
        + "."
        + b64({"iss": "did:plc:alice", "aud": SERVICE_DID})
        + ".AAAA"
    )
    # Unknown algs are refused loudly without an injected verifier...
    with pytest.raises(AuthRequiredError, match="RS256"):
        verify_jwt(rs_token, SERVICE_DID, lookup)

    calls = []

    def verifier(alg, key, signing_input, signature):
        calls.append(alg)
        return True

    # ...and with one, the seam receives (alg, key, input, sig) and decides.
    assert verify_jwt(rs_token, SERVICE_DID, lookup, verifier=verifier) == "did:plc:alice"
    assert calls == ["RS256"]


# -- ES256K (secp256k1) built-in verification -------------------------------

ES_PRIV = 0x18E14A7B6A307F426A94F8114701E7C8E774E7F9A47E2C2035DB29A206321725


def test_secp256k1_matches_published_rfc6979_vector():
    """Pin the signer+verifier to the widely published secp256k1
    RFC 6979 test vector (privkey=1, message "Satoshi Nakamoto"):
    implementation and vector confirm each other independently."""
    import hashlib

    from starryskyqueryengine_spark.secp256k1 import GX, GY, ecdsa_sign, ecdsa_verify

    h = hashlib.sha256(b"Satoshi Nakamoto").digest()
    r, s = ecdsa_sign(1, h)
    assert r == 0x934B1EA10A4B3C1757E2B0C017D0B6143CE3C9A7E6A4A49860D7A6AB210EE3D8
    assert s == 0x2442CE9D2B916064108014783E923EC36B49743E2FFA1C4496F01A512AAFD9E5
    assert ecdsa_verify((GX, GY), h, r, s)  # pubkey of d=1 is G
    assert not ecdsa_verify((GX, GY), h, r, s ^ 1)
    assert not ecdsa_verify((GX, GY), hashlib.sha256(b"tampered").digest(), r, s)


def test_es256k_jwt_roundtrip_and_rejections():
    from starryskyqueryengine_spark.auth import sign_jwt_es256k
    from starryskyqueryengine_spark.secp256k1 import pubkey_sec1

    pub_compressed = pubkey_sec1(ES_PRIV, compressed=True)
    pub_raw = pubkey_sec1(ES_PRIV, compressed=False)

    def es_lookup(did):
        return pub_compressed if did == "did:plc:alice" else None

    payload = {"iss": "did:plc:alice", "aud": SERVICE_DID, "exp": time.time() + 600}
    tok = sign_jwt_es256k(payload, ES_PRIV)
    assert verify_jwt(tok, SERVICE_DID, es_lookup) == "did:plc:alice"

    # uncompressed SEC1 key resolves identically
    assert verify_jwt(tok, SERVICE_DID, lambda d: pub_raw) == "did:plc:alice"

    # signature from a different key is rejected
    bad = sign_jwt_es256k(payload, ES_PRIV + 1)
    with pytest.raises(AuthRequiredError, match="signature"):
        verify_jwt(bad, SERVICE_DID, es_lookup)

    # tampered payload is rejected
    h, b, s = tok.split(".")
    tampered = ".".join([h, b[:-2] + ("AA" if b[-2:] != "AA" else "BB"), s])
    with pytest.raises(AuthRequiredError):
        verify_jwt(tampered, SERVICE_DID, es_lookup)

    # truncated / non-64-byte signature is rejected, not crashed on
    with pytest.raises(AuthRequiredError, match="signature"):
        verify_jwt(".".join([h, b, s[:10]]), SERVICE_DID, es_lookup)


def test_hs256_with_public_key_bytes_rejected_alg_confusion():
    """THE algorithm-confusion attack: the attacker fetches the issuer's
    PUBLIC secp256k1 key, mints an HS256 token HMAC'd with those public
    bytes as the 'secret', and relies on the verifier trusting the
    attacker-controlled alg header.  The acceptable algorithm is bound
    to the KEY TYPE: a public EC key must only ever verify ES256K."""
    from starryskyqueryengine_spark.secp256k1 import pubkey_sec1

    for compressed in (True, False):
        pub = pubkey_sec1(ES_PRIV, compressed=compressed)
        forged = sign_jwt_hs256(
            {"iss": "did:plc:alice", "aud": SERVICE_DID,
             "exp": time.time() + 600},
            bytes(pub),
        )
        with pytest.raises(AuthRequiredError, match="ES256K required"):
            verify_jwt(forged, SERVICE_DID, lambda d: pub)
    # (x, y) pair form is also recognized as a public key
    raw = pubkey_sec1(ES_PRIV, compressed=False)
    xy = (int.from_bytes(raw[1:33], "big"), int.from_bytes(raw[33:65], "big"))
    forged = sign_jwt_hs256(
        {"iss": "did:plc:alice", "aud": SERVICE_DID, "exp": time.time() + 600},
        b"whatever",
    )
    with pytest.raises(AuthRequiredError, match="ES256K required"):
        verify_jwt(forged, SERVICE_DID, lambda d: xy)
    # genuine shared-secret HS256 still works (str and non-SEC1 bytes)
    ok = sign_jwt_hs256(
        {"iss": "did:plc:bob", "aud": SERVICE_DID, "exp": time.time() + 600},
        KEY,
    )
    assert verify_jwt(ok, SERVICE_DID, lambda d: KEY) == "did:plc:bob"


def test_non_numeric_exp_is_auth_error_not_crash():
    tok = sign_jwt_hs256(
        {"iss": "did:plc:alice", "aud": SERVICE_DID, "exp": "abc"}, KEY
    )
    with pytest.raises(AuthRequiredError, match="exp"):
        verify_jwt(tok, SERVICE_DID, lambda d: KEY)
    tok2 = sign_jwt_hs256(
        {"iss": "did:plc:alice", "aud": SERVICE_DID, "exp": {}}, KEY
    )
    with pytest.raises(AuthRequiredError, match="exp"):
        verify_jwt(tok2, SERVICE_DID, lambda d: KEY)


def test_nonfinite_exp_rejected_not_eternal():
    """Review r10: exp was validated by float() coercion, and json.loads
    accepts the non-standard NaN/Infinity literals — float("nan") < now
    is False, so a crafted {"exp": NaN} (or the STRING "NaN"/"inf") was
    a never-expiring token.  Non-finite and non-numeric exp must 401."""
    for bad in (float("nan"), float("inf"), "NaN", "inf", "1e9999", True):
        tok = sign_jwt_hs256(
            {"iss": "did:plc:alice", "aud": SERVICE_DID, "exp": bad}, KEY
        )
        with pytest.raises(AuthRequiredError, match="exp"):
            verify_jwt(tok, SERVICE_DID, lambda d: KEY)
    # a plain numeric exp in the future still verifies
    ok = sign_jwt_hs256(
        {"iss": "did:plc:alice", "aud": SERVICE_DID,
         "exp": time.time() + 60}, KEY
    )
    assert verify_jwt(ok, SERVICE_DID, lambda d: KEY) == "did:plc:alice"


def test_huge_int_exp_stays_in_the_401_contract():
    """ADVICE r10: math.isfinite(10**400) raises OverflowError ('int too
    large to convert to float'), escaping the AuthRequiredError contract
    — the server's generic handler turned the crafted token into a 500
    instead of the 401 the finiteness check exists to guarantee.  A huge
    int exp is a VALID far-future NumericDate: it must verify, not crash;
    a huge NEGATIVE int must read as expired."""
    far_future = sign_jwt_hs256(
        {"iss": "did:plc:alice", "aud": SERVICE_DID, "exp": 10 ** 400}, KEY
    )
    assert verify_jwt(far_future, SERVICE_DID, lambda d: KEY) == "did:plc:alice"
    long_expired = sign_jwt_hs256(
        {"iss": "did:plc:alice", "aud": SERVICE_DID, "exp": -(10 ** 400)}, KEY
    )
    with pytest.raises(AuthRequiredError, match="expired"):
        verify_jwt(long_expired, SERVICE_DID, lambda d: KEY)


def test_es256k_via_validate_auth_header():
    from starryskyqueryengine_spark.auth import sign_jwt_es256k
    from starryskyqueryengine_spark.secp256k1 import pubkey_sec1

    pub = pubkey_sec1(ES_PRIV)
    tok = sign_jwt_es256k(
        {"iss": "did:plc:alice", "aud": SERVICE_DID, "exp": time.time() + 60},
        ES_PRIV,
    )
    did = validate_auth(
        {"authorization": f"Bearer {tok}"}, SERVICE_DID, lambda d: pub
    )
    assert did == "did:plc:alice"


# -- integration with FeedServer (private feed gate) ------------------------

def test_private_feed_via_authed_endpoint(spark, tmp_path):
    from starryskyqueryengine_spark.config import ConditionsRegistry, FeedCondition
    from starryskyqueryengine_spark.serving import FeedServer
    from starryskyqueryengine_spark.store import PostStore

    reg = ConditionsRegistry()
    reg.upsert(FeedCondition(key="k1", recordName="priv", query="x",
                             privateFeed=["did:plc:alice"]))
    store = PostStore(spark, str(tmp_path / "store"))
    server = FeedServer(spark, reg, store)

    hdrs = {"authorization": f"Bearer {token()}"}
    page = server.get_feed_skeleton_authed("priv", hdrs, SERVICE_DID, lookup)
    assert page.feed == [] and page.cursor is None  # empty store, but authorized

    # Wrong DID in allowlist -> empty page, not an error (starrysky.ts:35-39)
    reg.upsert(FeedCondition(key="k1", recordName="priv", query="x",
                             privateFeed=["did:plc:bob"]))
    page = server.get_feed_skeleton_authed("priv", hdrs, SERVICE_DID, lookup)
    assert page.feed == []

    # No/invalid token on a private feed -> AuthRequiredError
    with pytest.raises(AuthRequiredError):
        server.get_feed_skeleton_authed("priv", {}, SERVICE_DID, lookup)

    # Public feed: no auth demanded (reference only authenticates private feeds)
    reg.upsert(FeedCondition(key="k2", recordName="pub", query="x"))
    page = server.get_feed_skeleton_authed("pub", {}, SERVICE_DID, lookup)
    assert page.feed == []


def test_es256k_malformed_key_types_verify_false_not_crash():
    """Review r9: decode_point raises TypeError (not ValueError) for a
    str key or a None coordinate — e.g. an HS256 shared secret routed
    into the ES256K path by an attacker-chosen alg header.  That must
    read as 'verification failed' (the 401 path), never an escaping
    TypeError that the HTTP shell converts into a 500."""
    from starryskyqueryengine_spark.secp256k1 import ecdsa_verify, es256k_verify

    for bad_key in ["shared-hmac-secret", (None, 5), [3, None], object()]:
        assert es256k_verify(bad_key, b"header.payload", b"\x01" * 64) is False
        assert ecdsa_verify(bad_key, b"\x02" * 32, 5, 7) is False


def test_rfc6979_candidate_stream_advances():
    """Review r9: the r==0/s==0 retry in ecdsa_sign re-derived the SAME
    deterministic k forever.  The nonce source is now a generator whose
    successive draws follow RFC 6979 step h3 (K/V chain update): the
    candidates must be distinct and the first one unchanged."""
    from starryskyqueryengine_spark.secp256k1 import (
        N,
        _rfc6979_k,
        _rfc6979_k_stream,
    )

    d, h = 0x1234, b"\x42" * 32
    stream = _rfc6979_k_stream(d, h)
    k1, k2, k3 = next(stream), next(stream), next(stream)
    assert len({k1, k2, k3}) == 3
    assert all(0 < k < N for k in (k1, k2, k3))
    assert _rfc6979_k(d, h) == k1  # first draw is the published derivation
