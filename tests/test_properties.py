"""Property-based tests (hypothesis) for the pure driver-side pieces:
cursor codec, condition defaulting/normalization, regex dialect, salt
determinism. No SparkSession needed — these run in milliseconds."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from starryskyqueryengine_spark.config import FeedCondition
from starryskyqueryengine_spark.operators.topk import encode_cursor, parse_cursor
from starryskyqueryengine_spark.regex_dialect import (
    RegexValidationError,
    js_to_java,
    validate_pattern,
)

cids = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=24
)


@given(ms=st.integers(min_value=0, max_value=4_102_444_800_000), cid=cids)
def test_cursor_roundtrip(ms, cid):
    assert parse_cursor(encode_cursor(ms, cid)) == (ms, cid)


@given(s=st.text(max_size=30))
def test_parse_cursor_never_crashes_unexpectedly(s):
    """Any input either parses to (int, str) or raises ValueError —
    nothing else (the serving layer maps ValueError to a 400)."""
    try:
        ms, cid = parse_cursor(s)
        assert isinstance(ms, int) and isinstance(cid, str) and cid
    except ValueError:
        pass


@given(
    pinned=st.lists(cids, max_size=5).map(",".join),
    private=st.lists(cids, max_size=5).map(",".join),
)
def test_condition_csv_normalization(pinned, private):
    """CSV-string construction always normalizes to the same list a
    list-construction would produce — never character iteration."""
    c = FeedCondition(key="k", recordName="r", pinnedPost=pinned, privateFeed=private)
    assert c.pinnedPost == [p for p in pinned.split(",") if p]
    assert c.privateFeed == [p for p in private.split(",") if p]


@given(raw=st.dictionaries(st.sampled_from(
    ["key", "recordName", "refresh", "initPost", "limitCount", "pinnedPost"]),
    st.one_of(st.none(), st.text(max_size=8), st.integers(-5, 5000))))
@settings(max_examples=200)
def test_from_raw_total_on_messy_dicts(raw):
    """S7 restore accepts arbitrarily messy stringly dicts: defaults
    fill in, ints parse-or-default, never an exception."""
    c = FeedCondition.from_raw(raw)
    assert isinstance(c.refresh, int)
    assert isinstance(c.initPost, int)
    assert isinstance(c.limitCount, int)
    assert isinstance(c.pinnedPost, list)


@given(flags=st.text(alphabet="igsmu", max_size=5), pat=st.text(max_size=20))
def test_js_to_java_flag_translation_total(flags, pat):
    """Flag translation is total: prefix is exactly the mapped flags,
    body is exactly the token rewrite (\\s/\\S/$ dialect fixes), and 'g'
    never leaks into the Java pattern."""
    from starryskyqueryengine_spark.regex_dialect import (
        _FLAG_MAP,
        _rewrite_tokens,
    )

    out = js_to_java(pat, flags)
    prefix = "".join(_FLAG_MAP[f] for f in flags)
    assert out == prefix + _rewrite_tokens(pat, "m" in flags, "s" in flags)
    assert "g" not in prefix
    # patterns free of rewritten tokens pass through verbatim
    # (r11: '.' and the [] idioms are rewritten too; '^' only under m)
    if not any(t in pat for t in ("\\", "$", "[", ".")) and not (
        "m" in flags and "^" in pat
    ):
        assert out.endswith(pat)


@given(pat=st.text(max_size=20))
@settings(max_examples=200)
def test_validate_pattern_rejects_or_accepts_consistently(pat):
    """validate_pattern either returns a translation compilable under
    the Python proxy (with the Java-only \\z anchor mapped to Python's
    \\Z, as validate_pattern itself does) or raises
    RegexValidationError — matching the reference's fail-fast
    new RegExp gate."""
    try:
        out = validate_pattern(pat, "ig")
        re.compile(out.replace("\\z", "\\Z"))
    except RegexValidationError:
        pass


@given(
    # negative probes included (r13): the operator docstring claims
    # trunc-toward-zero coverage holds for ANY sign — pin it, since
    # bucket 0 is double-width under trunc-div ((-w, w)) and the
    # zero-straddling windows are where a floor/trunc mixup would bite
    pts=st.integers(min_value=-(2**62), max_value=2**62),
    w=st.integers(min_value=1, max_value=10**12),
    delta=st.integers(min_value=0, max_value=10**12),
)
def test_range_join_bucket_coverage(pts, w, delta):
    """Range-join invariant: every build timestamp inside the probe's
    half-open window (pts - w, pts] lands in one of the probe's two
    exploded buckets, under the exact trunc-toward-zero `div` both sides
    of the join use. This is the property the double-division form
    violated at large epoch values (ULP loss at bucket boundaries)."""
    from starryskyqueryengine_spark.operators.rangejoin import trunc_div

    delta = delta % w  # bts in (pts - w, pts]
    bts = pts - delta
    assert trunc_div(bts, w) in {trunc_div(pts - w, w), trunc_div(pts, w)}


# -- PPM codec (pure driver-side numpy) ------------------------------------

@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_ppm_roundtrip_any_dims(w, h, seed):
    import numpy as np
    from starryskyqueryengine_spark.multimodal import ppm_decode, ppm_encode

    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    ww, hh, back = ppm_decode(ppm_encode(a))
    assert (ww, hh) == (w, h) and np.array_equal(back, a)


@given(
    w=st.integers(min_value=1, max_value=16),
    h=st.integers(min_value=1, max_value=16),
    tw=st.integers(min_value=1, max_value=16),
    th=st.integers(min_value=1, max_value=16),
)
@settings(max_examples=40, deadline=None)
def test_ppm_resize_dims_and_range(w, h, tw, th):
    """Resize to any target dims yields exactly those dims with pixels
    drawn from the source (nearest-neighbor never invents values)."""
    import numpy as np
    from starryskyqueryengine_spark.multimodal import ppm_resize_nn

    a = (np.arange(h * w * 3, dtype=np.int64) % 256).astype(np.uint8).reshape(h, w, 3)
    out = ppm_resize_nn(a, tw, th)
    assert out.shape == (th, tw, 3)
    src_px = {tuple(p) for p in a.reshape(-1, 3)}
    assert all(tuple(p) in src_px for p in out.reshape(-1, 3))


# -- PII patterns (regex behavior, engine-independent) ---------------------

_pii_free = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz ABCDEFGHIJKLMNOPQRSTUVWXYZ,;:!?'\"()",
    max_size=60,
)


@given(t=_pii_free)
@settings(max_examples=60)
def test_redaction_patterns_leave_clean_text_alone(t):
    """Text with no digits/@ can never match any PII pattern."""
    import re
    from starryskyqueryengine_spark.functions import curation as cu

    for pat, _tag in cu.REDACTIONS:
        assert re.search(pat, t) is None


@given(t=_pii_free, n=st.integers(min_value=0, max_value=3))
@settings(max_examples=40)
def test_redaction_idempotent(t, n):
    """Applying the redaction chain twice equals applying it once: the
    tags contain no digits or '@', so they can't re-match (driver-side
    replica of the Spark expression chain)."""
    import re
    from starryskyqueryengine_spark.functions import curation as cu

    body = t + " user@h.example.org 1.2.3.4 +1-555-0000" * n

    def redact(s):
        for pat, tag in cu.REDACTIONS:
            s = re.sub(pat, tag, s)
        return s

    once = redact(body)
    assert redact(once) == once


# --------------------------------------------------------------------------
# Codec properties (round 5): arbitrary-shape round trips
# --------------------------------------------------------------------------

@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    ch=st.sampled_from([1, 3, 4]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    data=st.data(),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_any_shape_any_filters(h, w, ch, seed, data):
    """PNG encode->decode is the identity for EVERY 8-bit image shape and
    EVERY per-row filter assignment — the property the fixed-case tests
    sample, quantified."""
    import numpy as np

    from starryskyqueryengine_spark.codecs import png_decode, png_encode

    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    a = rng.integers(0, 256, size=shape, dtype=np.uint8)
    filters = data.draw(
        st.lists(st.integers(0, 4), min_size=h, max_size=h), label="filters"
    )
    W, H, C, px = png_decode(png_encode(a, filters=filters))
    assert (W, H, C) == (w, h, ch)
    assert np.array_equal(px, a if a.ndim == 3 else a[:, :, None])


@given(
    n=st.integers(min_value=0, max_value=500),
    chs=st.sampled_from([1, 2, 4]),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip_any_length(n, chs, rate, seed):
    import numpy as np

    from starryskyqueryengine_spark.codecs import wav_decode, wav_encode

    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, size=(n, chs)).astype(np.int16)
    r, c, out = wav_decode(wav_encode(s, rate, chs))
    assert (r, c) == (rate, chs)
    assert np.array_equal(out, s)


def test_morton_interleave_matches_reference_bulk(spark):
    """zvalue_expr's bit interleave == the straightforward Python ref for
    1000 seeded-random 16-bit pairs, evaluated in ONE Spark job."""
    import numpy as np
    from pyspark.sql import functions as F

    from starryskyqueryengine_spark.operators.zorder import zvalue_expr

    rng = np.random.default_rng(99)
    pairs = [(int(a), int(b)) for a, b in rng.integers(0, 1 << 16, size=(1000, 2))]
    df = spark.createDataFrame(pairs, "a long, b long")
    rows = df.select(
        "a", "b", zvalue_expr([F.col("a"), F.col("b")], bits=16).alias("z")
    ).collect()

    def ref(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    for r in rows:
        assert r["z"] == ref(r["a"], r["b"])


@given(key=st.text(min_size=1, max_size=40).filter(lambda s: "\x00" not in s))
@settings(max_examples=300, deadline=None)
def test_partition_escape_roundtrip(key):
    """escape/unescape are exact inverses for any non-NUL key, the
    escaped form never contains a path separator or control char (it is
    a single safe dir-name segment), and escaping is injective (two
    distinct raws can never collide on disk)."""
    from starryskyqueryengine_spark.table_format import (
        escape_partition_value,
        unescape_partition_value,
    )

    esc = escape_partition_value(key)
    assert unescape_partition_value(esc) == key
    assert "/" not in esc and "\\" not in esc
    assert not any(ord(c) < 0x20 or ord(c) == 0x7F for c in esc)
    # injectivity via canonical form: unescape is a function, and
    # escape(raw) always round-trips, so collisions are impossible;
    # spot-pin the classic ambiguity anyway
    assert escape_partition_value("a:b") != escape_partition_value("a%3Ab")


# -- CBOR codec (pure driver-side python, RFC 8949 DAG-CBOR subset) ---------

def _cbor_values():
    from starryskyqueryengine_spark.functions import cbor

    scalars = st.one_of(
        st.none(),
        st.integers(min_value=-(2**63), max_value=2**64 - 1),
        st.text(max_size=24),
        st.binary(max_size=24),
        st.builds(cbor.CidLink, st.binary(min_size=1, max_size=16)),
    )
    return st.recursive(
        scalars,
        lambda kids: st.one_of(
            st.lists(kids, max_size=4),
            st.dictionaries(st.text(max_size=8), kids, max_size=4),
        ),
        max_leaves=12,
    )


@given(v=_cbor_values())
@settings(max_examples=250, deadline=None)
def test_cbor_roundtrip_any_profile_value(v):
    """decode(encode(v)) == v for every value in the DAG-CBOR profile
    (ints across all width breakpoints, text/bytes, nested arrays/maps,
    CID links, null) — the generator walks the width boundaries the
    parametrized cases pin by hand."""
    from starryskyqueryengine_spark.functions import cbor

    assert cbor.decode(cbor.encode(v)) == v


@given(
    d=st.dictionaries(
        st.text(max_size=8), st.integers(-100, 100), min_size=2, max_size=6
    )
)
@settings(max_examples=150, deadline=None)
def test_cbor_map_encoding_is_insertion_order_invariant(d):
    """Canonical (len, bytes) key ordering: equal maps encode to
    byte-identical CBOR regardless of dict insertion order — the
    property that makes encoded blocks comparable/hashable."""
    from starryskyqueryengine_spark.functions import cbor

    shuffled = dict(reversed(list(d.items())))
    assert cbor.encode(d) == cbor.encode(shuffled)


@given(v=_cbor_values(), cut=st.integers(min_value=0, max_value=10**6))
@settings(max_examples=150, deadline=None)
def test_cbor_truncation_always_raises_never_misdecodes(v, cut):
    """CBOR is self-delimiting, so any STRICT prefix of one encoded item
    is incomplete: decode must raise ValueError (truncated), never
    return a value silently — the per-event error-isolation contract
    (W5) depends on corrupt blocks failing loudly."""
    import pytest as _pytest

    from starryskyqueryengine_spark.functions import cbor

    full = cbor.encode(v)
    if len(full) < 2:
        return
    prefix = full[: cut % (len(full) - 1) + 1]  # 1 .. len-1
    with _pytest.raises(ValueError):
        cbor.decode(prefix)
