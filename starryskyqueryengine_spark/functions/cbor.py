"""Minimal pure-Python CBOR (RFC 8949) encode/decode.

The reference's firehose path decodes CAR/CBOR commit blocks before op
routing (reference ``src/util/subscription.ts:76-122``). This module is
the decode seam made real: a self-contained subset codec — unsigned and
negative integers, byte strings, text strings, arrays, maps, and tag 42
(IPLD CID link) — with no third-party dependency, so the Spark-side
block column can hold genuine CBOR bytes and the routing query derives
its fields from an actual decode rather than synthesized columns.

Only definite-length items are produced or accepted (the AT-proto DAG-CBOR
profile also forbids indefinite lengths), and maps decode to plain dicts
with text keys. NULL is supported (major 7, simple value 22 — DAG-CBOR
allows it, and the op-routing seam carries nullable record bodies);
floats/bools stay omitted until a caller needs them — unknown major
types and simple values raise instead of guessing.
"""

from __future__ import annotations

MAJOR_UINT = 0
MAJOR_NEGINT = 1
MAJOR_BYTES = 2
MAJOR_TEXT = 3
MAJOR_ARRAY = 4
MAJOR_MAP = 5
MAJOR_TAG = 6
MAJOR_SIMPLE = 7
SIMPLE_NULL = 22  # 0xF6

TAG_CID = 42


class CidLink:
    """An IPLD CID link (CBOR tag 42 wrapping a byte string)."""

    __slots__ = ("raw",)

    def __init__(self, raw: bytes):
        self.raw = raw

    def __eq__(self, other):
        if not isinstance(other, CidLink):
            return NotImplemented
        return self.raw == other.raw

    def __hash__(self):
        # defining __eq__ alone nulls the inherited __hash__, making
        # every CidLink unhashable — and deduplicating decoded links in
        # a set/dict is the natural consumer operation
        return hash(self.raw)

    def __repr__(self):
        return f"CidLink({self.raw!r})"


def _head(major: int, arg: int) -> bytes:
    """Encode a major type + argument with the shortest-form rule."""
    if arg < 0:
        raise ValueError("argument must be non-negative")
    mt = major << 5
    if arg < 24:
        return bytes([mt | arg])
    for ai, nbytes in ((24, 1), (25, 2), (26, 4), (27, 8)):
        if arg < 1 << (8 * nbytes):
            return bytes([mt | ai]) + arg.to_bytes(nbytes, "big")
    raise ValueError("argument too large for CBOR")


def encode(obj) -> bytes:
    if obj is None:
        return bytes([(MAJOR_SIMPLE << 5) | SIMPLE_NULL])
    if isinstance(obj, bool):
        raise TypeError("bool not in supported subset")
    if isinstance(obj, int):
        if obj >= 0:
            return _head(MAJOR_UINT, obj)
        return _head(MAJOR_NEGINT, -1 - obj)
    if isinstance(obj, bytes):
        return _head(MAJOR_BYTES, len(obj)) + obj
    if isinstance(obj, str):
        b = obj.encode("utf-8")
        return _head(MAJOR_TEXT, len(b)) + b
    if isinstance(obj, (list, tuple)):
        return _head(MAJOR_ARRAY, len(obj)) + b"".join(encode(x) for x in obj)
    if isinstance(obj, dict):
        # deterministic (DAG-CBOR-style) map ordering: length-first, then
        # bytewise — byte-identical output for equal inputs
        for k in obj:
            if not isinstance(k, str):
                # consistent unsupported-subset signal: every other
                # rejected input raises TypeError; an int key previously
                # leaked AttributeError from k.encode
                raise TypeError(
                    f"map keys must be str in this profile, got "
                    f"{type(k).__name__}"
                )
        items = sorted(
            ((k.encode("utf-8"), v) for k, v in obj.items()),
            key=lambda kv: (len(kv[0]), kv[0]),
        )
        out = [_head(MAJOR_MAP, len(items))]
        for kb, v in items:
            out.append(_head(MAJOR_TEXT, len(kb)) + kb)
            out.append(encode(v))
        return b"".join(out)
    if isinstance(obj, CidLink):
        return _head(MAJOR_TAG, TAG_CID) + encode(obj.raw)
    raise TypeError(f"unsupported type for CBOR subset: {type(obj).__name__}")


def _read_head(buf: bytes, pos: int) -> tuple[int, int, int]:
    """Return (major, argument, next_pos); rejects indefinite lengths."""
    if pos >= len(buf):
        raise ValueError("truncated CBOR: missing head byte")
    b = buf[pos]
    major, ai = b >> 5, b & 0x1F
    pos += 1
    if ai < 24:
        return major, ai, pos
    if ai in (24, 25, 26, 27):
        n = 1 << (ai - 24)
        if pos + n > len(buf):
            raise ValueError("truncated CBOR: short argument")
        return major, int.from_bytes(buf[pos : pos + n], "big"), pos + n
    raise ValueError(f"unsupported additional-info {ai} (indefinite/reserved)")


_MAX_DEPTH = 512  # malformed-input contract: nesting past this raises
# ValueError, never RecursionError (which would escape callers' except
# ValueError paths and can leave the interpreter near its limit)


def _decode_at(buf: bytes, pos: int, depth: int = 0):
    if depth > _MAX_DEPTH:
        raise ValueError(f"CBOR nesting deeper than {_MAX_DEPTH}")
    major, arg, pos = _read_head(buf, pos)
    if major == MAJOR_UINT:
        return arg, pos
    if major == MAJOR_NEGINT:
        return -1 - arg, pos
    if major in (MAJOR_BYTES, MAJOR_TEXT):
        if pos + arg > len(buf):
            raise ValueError("truncated CBOR: short string body")
        raw = buf[pos : pos + arg]
        return (raw if major == MAJOR_BYTES else raw.decode("utf-8")), pos + arg
    if major == MAJOR_ARRAY:
        out = []
        for _ in range(arg):
            v, pos = _decode_at(buf, pos, depth + 1)
            out.append(v)
        return out, pos
    if major == MAJOR_MAP:
        m = {}
        for _ in range(arg):
            k, pos = _decode_at(buf, pos, depth + 1)
            if not isinstance(k, str):
                raise ValueError("map keys must be text in this profile")
            if k in m:
                # DAG-CBOR forbids duplicate keys; last-wins would let
                # two byte-distinct payloads decode equal here but
                # differently in a spec-compliant decoder — a parser
                # differential on the op-routing seam
                raise ValueError(f"duplicate map key {k!r}")
            v, pos = _decode_at(buf, pos, depth + 1)
            m[k] = v
        return m, pos
    if major == MAJOR_TAG:
        if arg != TAG_CID:
            raise ValueError(f"unsupported tag {arg}")
        v, pos = _decode_at(buf, pos, depth + 1)
        if not isinstance(v, bytes):
            raise ValueError("tag 42 must wrap a byte string")
        return CidLink(v), pos
    if major == MAJOR_SIMPLE:
        if arg == SIMPLE_NULL:
            return None, pos
        raise ValueError(f"unsupported simple value {arg}")
    raise ValueError(f"unsupported major type {major}")


def decode(buf: bytes):
    """Decode one CBOR item; trailing bytes are an error."""
    v, pos = _decode_at(bytes(buf), 0)
    if pos != len(buf):
        raise ValueError(f"trailing bytes after CBOR item: {len(buf) - pos}")
    return v
