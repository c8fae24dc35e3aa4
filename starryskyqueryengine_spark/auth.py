"""Request authentication: JWT verification for the private-feed ACL (P11)
and the service DID document (S12).

Reference behavior:

- ``src/auth.ts:5-18`` — ``validateAuth`` pulls the ``Bearer`` token from the
  ``Authorization`` header and calls ``verifyJwt(jwt, serviceDid,
  resolveAtprotoKey)``; the verified ``iss`` DID is returned and used as the
  requester identity for the private-feed allowlist check
  (``src/algos/starrysky.ts:26-40``).
- ``src/well-known.ts:7-23`` — ``GET /.well-known/did.json`` returns a static
  DID document for the service, 404 unless ``serviceDid`` ends with the
  configured hostname.

This module is deliberately driver-side, pure-Python, and dependency-free:
auth happens once per serving request (it gates the whole Spark plan, it is
never a per-row predicate), so there is nothing to distribute.

Signature verification: AT Protocol service JWTs are signed with ES256K
(secp256k1); :mod:`.secp256k1` implements the public algorithm in pure
Python, so both HS256 (HMAC) and ES256K verify in-process with zero
external dependencies — mirroring the reference's delegation to
``@atproto/xrpc-server``'s ``verifyJwt`` (``src/auth.ts:5-18``).
``verify_jwt`` still accepts a ``verifier`` callable
``(alg, key, signing_input, signature) -> bool`` for embedders that want
to substitute a hardware/HSM or libsecp256k1-backed provider.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import math
import time
from typing import Callable, Mapping, Optional


class AuthRequiredError(Exception):
    """Missing/invalid Authorization header or failed JWT verification.

    Mirrors ``AuthRequiredError`` from ``@atproto/xrpc-server``
    (raised at ``src/auth.ts:13``).
    """


def _b64url_decode(part: str) -> bytes:
    pad = "=" * (-len(part) % 4)
    return base64.urlsafe_b64decode(part + pad)


def _b64url_encode(raw: bytes) -> str:
    return base64.urlsafe_b64encode(raw).rstrip(b"=").decode("ascii")


def decode_jwt(token: str) -> tuple[dict, dict, bytes, bytes]:
    """Split and decode a compact JWS: (header, payload, signing_input, sig).

    Structural validation only — no signature check here.
    """
    parts = token.split(".")
    if len(parts) != 3:
        raise AuthRequiredError("malformed jwt: expected 3 dot-separated parts")
    try:
        header = json.loads(_b64url_decode(parts[0]))
        payload = json.loads(_b64url_decode(parts[1]))
        signature = _b64url_decode(parts[2])
    except (ValueError, json.JSONDecodeError) as exc:
        raise AuthRequiredError(f"malformed jwt: {exc}") from exc
    if not isinstance(header, dict) or not isinstance(payload, dict):
        raise AuthRequiredError("malformed jwt: header/payload not objects")
    signing_input = f"{parts[0]}.{parts[1]}".encode("ascii")
    return header, payload, signing_input, signature


def _hs256_verify(key: bytes, signing_input: bytes, signature: bytes) -> bool:
    mac = hmac.new(key, signing_input, hashlib.sha256).digest()
    return hmac.compare_digest(mac, signature)


def _looks_like_ec_public_key(key) -> bool:
    """True when ``key`` is a secp256k1 public key in any form this
    module accepts for ES256K: an (x, y) pair, or SEC1 bytes
    (33 compressed / 65 uncompressed with the standard prefix).  A
    33/65-byte HMAC secret that happens to start with 0x02/0x03/0x04
    is misclassified — that FAILS CLOSED (auth denied), never open."""
    if isinstance(key, (tuple, list)) and len(key) == 2:
        return True
    if isinstance(key, (bytes, bytearray)):
        b = bytes(key)
        return (len(b) == 33 and b[0] in (2, 3)) or (
            len(b) == 65 and b[0] == 4
        )
    return False


Verifier = Callable[[str, object, bytes, bytes], bool]
KeyLookup = Callable[[str], object]


def verify_jwt(
    token: str,
    service_did: str,
    key_lookup: KeyLookup,
    now_s: Optional[float] = None,
    verifier: Optional[Verifier] = None,
) -> str:
    """Verify a service JWT and return the issuer DID.

    Checks (matching ``verifyJwt`` semantics the reference relies on):
    structure, ``aud`` == our service DID, ``exp`` not in the past, a
    non-empty ``iss``, and the signature — via ``verifier`` if given, else
    built-in HS256. ``key_lookup(iss_did)`` resolves the issuer's key
    (the reference's ``didResolver.resolveAtprotoKey``, ``src/auth.ts:16``).
    """
    header, payload, signing_input, signature = decode_jwt(token)

    iss = payload.get("iss")
    if not iss or not isinstance(iss, str):
        raise AuthRequiredError("jwt missing iss")
    aud = payload.get("aud")
    if aud != service_did:
        raise AuthRequiredError(f"jwt aud {aud!r} != service did {service_did!r}")
    exp = payload.get("exp")
    if exp is not None:
        now = time.time() if now_s is None else now_s
        # exp must be a REAL number (RFC 7519 NumericDate), checked by
        # type, not by float() coercion (review r10): json.loads accepts
        # the non-standard NaN/Infinity literals, and float("nan") < now
        # is False — a crafted {"exp": NaN} (or the string "NaN") was a
        # NEVER-EXPIRING token.  bool is an int subclass; exclude it too.
        # Finiteness only applies to floats: Python ints are always
        # finite, and math.isfinite(10**400) raises OverflowError ("int
        # too large to convert to float") — which would escape the
        # AuthRequiredError contract and surface as a 500 instead of the
        # 401 this check exists to guarantee (review r11).  The int/float
        # comparison below is exact in Python, no overflow.
        if (
            isinstance(exp, bool)
            or not isinstance(exp, (int, float))
            or (isinstance(exp, float) and not math.isfinite(exp))
        ):
            raise AuthRequiredError(f"jwt exp not a finite number: {exp!r}")
        if exp < now:
            raise AuthRequiredError("jwt expired")

    key = key_lookup(iss)
    if key is None:
        raise AuthRequiredError(f"no signing key for {iss}")

    alg = str(header.get("alg", ""))
    if verifier is not None:
        ok = verifier(alg, key, signing_input, signature)
    elif alg == "HS256":
        # ALGORITHM CONFUSION GUARD: the alg header is attacker-
        # controlled.  If key_lookup resolved a secp256k1 PUBLIC key
        # (the atproto form — SEC1 bytes or an (x, y) pair), an HS256
        # token HMAC'd with those PUBLIC bytes as the "secret" must
        # not verify — the acceptable algorithm is bound to the KEY
        # TYPE, never to the token's own claim.  HS256 is only for
        # explicitly configured shared secrets (str, or bytes that are
        # not a SEC1 point).
        if _looks_like_ec_public_key(key):
            raise AuthRequiredError(
                "jwt alg HS256 rejected: issuer key is a secp256k1 "
                "public key (ES256K required)"
            )
        key_bytes = key.encode("utf-8") if isinstance(key, str) else bytes(key)
        ok = _hs256_verify(key_bytes, signing_input, signature)
    elif alg == "ES256K":
        # The atproto service-JWT algorithm: secp256k1 ECDSA over the
        # SHA-256 of the signing input, signature as raw r||s. Key may
        # be SEC1 bytes (compressed or not) or an (x, y) pair.
        from .secp256k1 import es256k_verify

        ok = es256k_verify(key, signing_input, signature)
    else:
        raise AuthRequiredError(f"no verifier available for alg {alg!r}")
    if not ok:
        raise AuthRequiredError("jwt signature verification failed")
    return iss


def validate_auth(
    headers: Mapping[str, str],
    service_did: str,
    key_lookup: KeyLookup,
    now_s: Optional[float] = None,
    verifier: Optional[Verifier] = None,
) -> str:
    """``src/auth.ts:5-18``: Bearer extraction + verify; returns requester DID."""
    authorization = headers.get("authorization", headers.get("Authorization", ""))
    if not authorization.startswith("Bearer "):
        raise AuthRequiredError("missing Bearer authorization")
    token = authorization[len("Bearer "):].strip()
    return verify_jwt(token, service_did, key_lookup, now_s=now_s, verifier=verifier)


def sign_jwt_hs256(payload: dict, key: bytes | str) -> str:
    """Mint an HS256 compact JWT (test/dev helper for the verify path)."""
    key_bytes = key.encode("utf-8") if isinstance(key, str) else bytes(key)
    header = _b64url_encode(json.dumps({"alg": "HS256", "typ": "JWT"}).encode())
    body = _b64url_encode(json.dumps(payload).encode())
    signing_input = f"{header}.{body}".encode("ascii")
    sig = hmac.new(key_bytes, signing_input, hashlib.sha256).digest()
    return f"{header}.{body}.{_b64url_encode(sig)}"


def sign_jwt_es256k(payload: dict, privkey: int) -> str:
    """Mint an ES256K compact JWT (RFC 6979 deterministic; test/dev
    helper for the verify path — see :mod:`.secp256k1`'s caveats)."""
    import hashlib as _hashlib

    from .secp256k1 import ecdsa_sign

    header = _b64url_encode(json.dumps({"alg": "ES256K", "typ": "JWT"}).encode())
    body = _b64url_encode(json.dumps(payload).encode())
    signing_input = f"{header}.{body}".encode("ascii")
    r, s = ecdsa_sign(privkey, _hashlib.sha256(signing_input).digest())
    sig = r.to_bytes(32, "big") + s.to_bytes(32, "big")
    return f"{header}.{body}.{_b64url_encode(sig)}"


def did_document(service_did: str, hostname: str) -> Optional[dict]:
    """S12 ``GET /.well-known/did.json`` (``src/well-known.ts:7-23``).

    Returns the DID document dict, or ``None`` when the service DID does not
    end with the hostname (the reference sends 404).
    """
    if not service_did.endswith(hostname):
        return None
    return {
        "@context": ["https://www.w3.org/ns/did/v1"],
        "id": service_did,
        "service": [
            {
                "id": "#bsky_fg",
                "type": "BskyFeedGenerator",
                "serviceEndpoint": f"https://{hostname}",
            }
        ],
    }
