"""Unit tests for the minimal RFC 8949 CBOR codec (functions/cbor.py)."""

from __future__ import annotations

import pytest

from starryskyqueryengine_spark.functions import cbor


@pytest.mark.parametrize(
    "obj",
    [
        0,
        23,
        24,
        255,
        256,
        65535,
        65536,
        2**32,
        2**63 - 1,
        -1,
        -24,
        -25,
        -(2**32),
        "",
        "a",
        "x" * 23,
        "x" * 24,
        "x" * 300,
        "x" * 70000,
        "héllo ☃",
        b"",
        b"\x00\xff" * 40,
        [],
        [1, "two", b"3"],
        {},
        {"k": 1},
        {"a": [1, 2, {"deep": "yes"}], "bb": -7, "c": b"raw"},
        cbor.CidLink(b"\x01" * 16),
        {"cid": cbor.CidLink(b"\xaa" * 8), "rest": ["n", 9]},
    ],
)
def test_roundtrip(obj):
    assert cbor.decode(cbor.encode(obj)) == obj


def test_known_encodings():
    # spot-check against RFC 8949 appendix-A vectors
    assert cbor.encode(0) == bytes.fromhex("00")
    assert cbor.encode(10) == bytes.fromhex("0a")
    assert cbor.encode(100) == bytes.fromhex("1864")
    assert cbor.encode(1000) == bytes.fromhex("1903e8")
    assert cbor.encode(-10) == bytes.fromhex("29")
    assert cbor.encode("IETF") == bytes.fromhex("6449455446")
    assert cbor.encode([1, 2, 3]) == bytes.fromhex("83010203")


def test_map_key_order_deterministic():
    a = cbor.encode({"bb": 1, "a": 2, "ccc": 3})
    b = cbor.encode({"ccc": 3, "a": 2, "bb": 1})
    assert a == b
    # length-first ordering: "a" < "bb" < "ccc"
    assert list(cbor.decode(a).keys()) == ["a", "bb", "ccc"]


@pytest.mark.parametrize(
    "bad",
    [
        b"",  # empty
        bytes.fromhex("18"),  # uint8 head, missing byte
        bytes.fromhex("62 61"),  # text len 2, one byte body
        bytes.fromhex("5f"),  # indefinite bytes: rejected profile-wide
        bytes.fromhex("82 01"),  # array of 2, one element
        bytes.fromhex("0001"),  # trailing bytes
        bytes.fromhex("f5"),  # true: bools outside supported subset
        bytes.fromhex("c1 00"),  # tag 1: only tag 42 accepted
        bytes.fromhex("d8 2a 00"),  # tag 42 wrapping non-bytes
    ],
)
def test_malformed_raises(bad):
    with pytest.raises(ValueError):
        cbor.decode(bytes(bad.replace(b" ", b"")))


def test_unsupported_encode_types():
    with pytest.raises(TypeError):
        cbor.encode(1.5)
    with pytest.raises(TypeError):
        cbor.encode(True)


def test_deep_nesting_raises_valueerror_not_recursionerror():
    from starryskyqueryengine_spark.functions import cbor

    blob = b"\x81" * 4000 + b"\x00"
    with pytest.raises(ValueError, match="nesting"):
        cbor.decode(blob)


def test_non_string_map_keys_raise_typeerror_on_encode():
    from starryskyqueryengine_spark.functions import cbor

    with pytest.raises(TypeError, match="str"):
        cbor.encode({1: "x"})


def test_null_roundtrip_and_nested():
    """NULL (major 7, simple 22) round-trips standalone and inside
    containers — the op-routing seam carries nullable record bodies."""
    from starryskyqueryengine_spark.functions import cbor

    assert cbor.encode(None) == b"\xf6"
    assert cbor.decode(b"\xf6") is None
    obj = {"record": None, "xs": [1, None, "a"]}
    assert cbor.decode(cbor.encode(obj)) == obj


def test_other_simple_values_still_raise():
    import pytest

    from starryskyqueryengine_spark.functions import cbor

    with pytest.raises(ValueError, match="simple"):
        cbor.decode(b"\xf5")  # true: bools stay outside the profile


def test_cidlink_hashable_and_duplicate_keys_rejected():
    """Review r9: CidLink defined __eq__ without __hash__ (unhashable —
    deduplicating decoded links in a set crashed), and the decoder
    accepted duplicate map keys last-wins, a parser differential vs
    spec-compliant DAG-CBOR decoders on the op-routing seam."""
    import pytest

    from starryskyqueryengine_spark.functions import cbor

    a, b = cbor.CidLink(b"x"), cbor.CidLink(b"x")
    assert a == b and len({a, b}) == 1
    assert a != "x" and {a: 1}[b] == 1

    # a2 6161 01 6161 02 = {"a": 1, "a": 2}
    with pytest.raises(ValueError, match="duplicate"):
        cbor.decode(bytes.fromhex("a2616101616102"))
