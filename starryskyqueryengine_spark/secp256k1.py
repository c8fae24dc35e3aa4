"""Pure-Python secp256k1 ECDSA verification (and a deterministic signer
for tests) — closes the ES256K seam in :mod:`.auth`.

AT Protocol service JWTs are signed with ES256K (JOSE name for ECDSA over
secp256k1 with SHA-256); the reference delegates to
``@atproto/xrpc-server``'s ``verifyJwt`` (``src/auth.ts:5-18``). This
container ships no crypto library, but the algorithm is fully public
(SEC 2 curve parameters, X9.62 ECDSA, RFC 6979 deterministic nonces), and
auth runs ONCE per serving request on the driver — it gates the whole
Spark plan and is never a per-row predicate — so a ~100-LoC big-int
implementation is plenty fast (sub-millisecond per verify under CPython's
``pow(x, -1, p)``).

NOT constant-time: fine for signature *verification* (operates only on
public values). The RFC 6979 signer exists for tests/dev-token minting;
do not use it to guard real private keys.
"""

from __future__ import annotations

import hashlib
import hmac

# SEC 2 "Recommended Elliptic Curve Domain Parameters", secp256k1:
# y^2 = x^3 + 7 over F_p.
P = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2F
N = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141
A = 0
B = 7
GX = 0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798
GY = 0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8

_INF = None  # point at infinity


def _add(p1, p2):
    """Affine point addition; one modular inverse per op via pow(x,-1,P)."""
    if p1 is _INF:
        return p2
    if p2 is _INF:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if (y1 + y2) % P == 0:
            return _INF
        lam = (3 * x1 * x1 + A) * pow(2 * y1, -1, P) % P
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, P) % P
    x3 = (lam * lam - x1 - x2) % P
    return x3, (lam * (x1 - x3) - y1) % P


def _mul(k: int, point):
    """Double-and-add scalar multiplication (not constant-time)."""
    acc, addend = _INF, point
    while k:
        if k & 1:
            acc = _add(acc, addend)
        addend = _add(addend, addend)
        k >>= 1
    return acc


def decode_point(key) -> tuple[int, int]:
    """Accept an (x, y) pair or SEC1 bytes (0x04 uncompressed 65 B,
    0x02/0x03 compressed 33 B); validate on-curve membership."""
    # tuple OR list: auth._looks_like_ec_public_key classifies both as
    # EC keys (a key loaded from JSON config arrives as a list) — a
    # tuple-only check made every list-form key fail verification
    if isinstance(key, (tuple, list)) and len(key) == 2:
        x, y = int(key[0]), int(key[1])
    else:
        raw = bytes(key)
        if len(raw) == 65 and raw[0] == 0x04:
            x, y = int.from_bytes(raw[1:33], "big"), int.from_bytes(raw[33:], "big")
        elif len(raw) == 33 and raw[0] in (0x02, 0x03):
            x = int.from_bytes(raw[1:], "big")
            # Tonelli-Shanks shortcut: p % 4 == 3 so sqrt(v) = v^((p+1)/4)
            y = pow((x * x * x + A * x + B) % P, (P + 1) // 4, P)
            if y % 2 != raw[0] % 2:
                y = P - y
        else:
            raise ValueError("bad SEC1 point encoding")
    if not (0 < x < P and 0 < y < P) or (y * y - (x * x * x + A * x + B)) % P != 0:
        raise ValueError("point not on secp256k1")
    return x, y


def ecdsa_verify(pubkey, msg_hash: bytes, r: int, s: int) -> bool:
    """X9.62 ECDSA verification. ``msg_hash`` is the already-hashed
    message (SHA-256 for ES256K: 256-bit, so no truncation step)."""
    try:
        Q = decode_point(pubkey)
    except (ValueError, TypeError):
        # TypeError too: a malformed key (a str HMAC secret routed here
        # by an attacker-chosen alg header, a None coordinate) raises
        # TypeError from bytes()/int() inside decode_point — that must
        # be "verification failed" (401), not an escaping 500
        return False
    if not (0 < r < N and 0 < s < N):
        return False
    e = int.from_bytes(msg_hash, "big") % N
    w = pow(s, -1, N)
    R = _add(_mul(e * w % N, (GX, GY)), _mul(r * w % N, Q))
    if R is _INF:
        return False
    return R[0] % N == r


def es256k_verify(key, signing_input: bytes, signature: bytes) -> bool:
    """JWS ES256K: signature is raw r||s (64 bytes, RFC 7515 style —
    NOT DER), hash is SHA-256 of the ``header.payload`` signing input."""
    if len(signature) != 64:
        return False
    r = int.from_bytes(signature[:32], "big")
    s = int.from_bytes(signature[32:], "big")
    return ecdsa_verify(key, hashlib.sha256(signing_input).digest(), r, s)


# ---------------------------------------------------------------------------
# Deterministic signer (RFC 6979) — test/dev helper
# ---------------------------------------------------------------------------


def _rfc6979_k_stream(d: int, msg_hash: bytes):
    """RFC 6979 §3.2 deterministic nonce CANDIDATES with HMAC-SHA256
    (qlen == hlen == 256 bits, so bits2octets reduces mod N and no
    bit-shifts needed).  A generator, not a single value: when the
    caller rejects a candidate (r == 0 / s == 0, step h3), the next
    draw must come from the UPDATED K/V chain — re-deriving from
    scratch returns the identical k forever and the retry loop spins."""
    h1 = int.from_bytes(msg_hash, "big") % N
    x = d.to_bytes(32, "big")
    m = h1.to_bytes(32, "big")
    v = b"\x01" * 32
    k = b"\x00" * 32
    k = hmac.new(k, v + b"\x00" + x + m, hashlib.sha256).digest()
    v = hmac.new(k, v, hashlib.sha256).digest()
    k = hmac.new(k, v + b"\x01" + x + m, hashlib.sha256).digest()
    v = hmac.new(k, v, hashlib.sha256).digest()
    while True:
        v = hmac.new(k, v, hashlib.sha256).digest()
        cand = int.from_bytes(v, "big")
        if 0 < cand < N:
            yield cand
        # step h3: out-of-range candidate OR caller rejection both
        # advance the chain before the next draw
        k = hmac.new(k, v + b"\x00", hashlib.sha256).digest()
        v = hmac.new(k, v, hashlib.sha256).digest()


def _rfc6979_k(d: int, msg_hash: bytes) -> int:
    """First RFC 6979 nonce for (d, msg_hash) — the common case."""
    return next(_rfc6979_k_stream(d, msg_hash))


def ecdsa_sign(d: int, msg_hash: bytes) -> tuple[int, int]:
    """Deterministic ECDSA (RFC 6979). Returns (r, s) with low-s
    normalization (the Bitcoin/atproto convention)."""
    e = int.from_bytes(msg_hash, "big") % N
    for k in _rfc6979_k_stream(d, msg_hash):
        R = _mul(k, (GX, GY))
        r = R[0] % N
        if r == 0:
            continue  # next candidate from the advanced K/V chain
        s = (e + r * d) * pow(k, -1, N) % N
        if s == 0:
            continue
        if s > N // 2:
            s = N - s
        return r, s
    raise AssertionError("unreachable: nonce stream is infinite")


def pubkey(d: int) -> tuple[int, int]:
    """Public key for scalar ``d`` (test helper)."""
    q = _mul(d, (GX, GY))
    assert q is not _INF
    return q


def pubkey_sec1(d: int, compressed: bool = True) -> bytes:
    x, y = pubkey(d)
    if compressed:
        return bytes([0x02 + (y & 1)]) + x.to_bytes(32, "big")
    return b"\x04" + x.to_bytes(32, "big") + y.to_bytes(32, "big")
