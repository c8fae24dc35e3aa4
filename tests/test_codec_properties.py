"""Hypothesis property suites for the codec roundtrips (r13, verdict
ask #4 — the pattern's 6th target; it found real bugs on 5 of 5 prior
targets).  Lossless formats (PNG/PPM/GIF/WAV/Y4M-C444) must roundtrip
bit-exactly over ARBITRARY payloads and shapes, not just the fixed
shapes the unit suites pin; JPEG is bounded-error on block-constant
images (only DC coefficients survive, so quantization error is tightly
bounded); the decode budget must be monotone (if WxH passes, any
smaller frame passes).  Pure-Python targets — no SparkSession."""

from __future__ import annotations

import numpy as np

from hypothesis import given, settings
from hypothesis import strategies as st

from starryskyqueryengine_spark.codecs import (
    _check_pixel_budget,
    gif_decode,
    gif_encode,
    png_decode,
    png_encode,
    wav_decode,
    wav_encode,
    y4m_decode,
    y4m_encode,
    y4m_extract_frame,
    y4m_frame_count,
)
from starryskyqueryengine_spark.jpeg import jpeg_decode, jpeg_encode
from starryskyqueryengine_spark.multimodal import ppm_decode, ppm_encode


def _rand_bytes(data, n):
    return np.frombuffer(
        bytes(data.draw(st.binary(min_size=n, max_size=n))), dtype=np.uint8
    )


@settings(max_examples=80, deadline=None)
@given(st.data())
def test_png_roundtrip_any_shape_filters_payload(data):
    """encode→decode is the identity for every channel count, every
    per-row filter type (including mixed rows), any pixel payload."""
    h = data.draw(st.integers(1, 10))
    w = data.draw(st.integers(1, 10))
    ch = data.draw(st.sampled_from([1, 3, 4]))
    filters = data.draw(
        st.lists(st.integers(0, 4), min_size=h, max_size=h)
    )
    arr = _rand_bytes(data, h * w * ch).reshape(h, w, ch)
    payload = png_encode(arr, filters=filters)
    dw, dh, dch, out = png_decode(payload)
    assert (dw, dh, dch) == (w, h, ch)
    assert np.array_equal(out, arr)
    # encode→decode→encode→decode stability (second pass default filters)
    _, _, _, out2 = png_decode(png_encode(out))
    assert np.array_equal(out2, arr)


@settings(max_examples=80, deadline=None)
@given(st.data())
def test_ppm_roundtrip_any_payload(data):
    h = data.draw(st.integers(1, 12))
    w = data.draw(st.integers(1, 12))
    arr = _rand_bytes(data, h * w * 3).reshape(h, w, 3)
    dw, dh, out = ppm_decode(ppm_encode(arr))
    assert (dw, dh) == (w, h)
    assert np.array_equal(out, arr)


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_gif_roundtrip_any_palette_and_indices(data):
    """Index plane and used-palette prefix roundtrip exactly, and the
    returned RGB is exactly palette[index] — for any palette size
    (including non-power-of-two) and any index payload within range."""
    h = data.draw(st.integers(1, 10))
    w = data.draw(st.integers(1, 10))
    n_pal = data.draw(st.integers(1, 256))
    pal = _rand_bytes(data, n_pal * 3).reshape(n_pal, 3)
    idx = (
        _rand_bytes(data, h * w).astype(np.uint32) % n_pal
    ).astype(np.uint8).reshape(h, w)
    dw, dh, didx, dpal, rgb = gif_decode(gif_encode(idx, pal))
    assert (dw, dh) == (w, h)
    assert np.array_equal(didx, idx)
    assert np.array_equal(dpal[:n_pal], pal)
    assert np.array_equal(rgb, dpal[didx])


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_wav_roundtrip_any_samples(data):
    n = data.draw(st.integers(0, 200))
    ch = data.draw(st.integers(1, 3))
    rate = data.draw(st.sampled_from([8000, 16000, 44100]))
    raw = _rand_bytes(data, n * ch * 2).tobytes()
    samples = np.frombuffer(raw, dtype="<i2").reshape(n, ch)
    drate, dch, out = wav_decode(wav_encode(samples, rate))
    assert (drate, dch) == (rate, ch)
    assert out.shape == (n, ch)
    assert np.array_equal(out, samples)


@settings(max_examples=50, deadline=None)
@given(st.data())
def test_y4m_c444_roundtrip_and_positional_seek(data):
    n = data.draw(st.integers(0, 3))
    h = data.draw(st.integers(1, 8))
    w = data.draw(st.integers(1, 8))
    frames = _rand_bytes(data, n * h * w * 3).reshape(n, h, w, 3)
    payload = y4m_encode(frames)
    assert y4m_frame_count(payload) == n
    dw, dh, _rate, out = y4m_decode(payload)
    assert (dw, dh) == (w, h)
    assert np.array_equal(out, frames)
    for i in range(n):
        assert np.array_equal(y4m_extract_frame(payload, i), frames[i])


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_jpeg_block_constant_bounded_error(data):
    """A block-constant image (each 8-aligned 8x8 tile one color) has
    only DC energy, so quality-90 roundtrip error is bounded by DC
    quantization + color-space rounding — a tight, payload-independent
    bound.  Restart intervals must not change the decode."""
    bh = data.draw(st.integers(1, 3))
    bw = data.draw(st.integers(1, 3))
    gray = data.draw(st.booleans())
    ch = 1 if gray else 3
    blocks = _rand_bytes(data, bh * bw * ch).reshape(bh, bw, ch)
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    if gray:
        img2 = img[:, :, 0]
    else:
        img2 = img
    payload = jpeg_encode(img2, quality=90)
    dw, dh, dch, out = jpeg_decode(payload)
    assert (dw, dh, dch) == (bw * 8, bh * 8, ch)
    assert np.abs(
        out.reshape(bh * 8, bw * 8, ch).astype(int)
        - img.astype(int)
    ).max() <= 4
    # resynchronization path: DRI/RSTn markers are a pure framing
    # concern — identical pixels
    ri = data.draw(st.sampled_from([1, 2]))
    _, _, _, out_r = jpeg_decode(jpeg_encode(img2, quality=90,
                                             restart_interval=ri))
    assert np.array_equal(out_r, out)


@settings(max_examples=200, deadline=None)
@given(
    w=st.integers(1, 1 << 16),
    h=st.integers(1, 1 << 16),
    bpp=st.sampled_from([4, 6, 18, 54]),
    dw=st.integers(0, 1 << 15),
    dh=st.integers(0, 1 << 15),
)
def test_decode_budget_is_monotone(w, h, bpp, dw, dh):
    """If WxH passes the budget, any frame smaller in both dimensions
    passes too (rejection is monotone in the working set)."""
    w2, h2 = max(1, w - dw), max(1, h - dh)

    def passes(a, b):
        try:
            _check_pixel_budget(a, b, "T", bytes_per_pixel=bpp)
            return True
        except ValueError:
            return False

    if passes(w, h):
        assert passes(w2, h2)
    elif not passes(w2, h2):
        # smaller fails -> larger must fail as well
        assert not passes(w, h)


@settings(max_examples=80, deadline=None)
@given(st.data())
def test_ppm_resize_nn_identity_and_pixel_provenance(data):
    """Same-size resize is the identity, and every output pixel of any
    resize is an exact copy of some input pixel (nearest-neighbor never
    interpolates) with the pixel-center index map."""
    from starryskyqueryengine_spark.multimodal import ppm_resize_nn

    h = data.draw(st.integers(1, 10))
    w = data.draw(st.integers(1, 10))
    arr = _rand_bytes(data, h * w * 3).reshape(h, w, 3)
    assert np.array_equal(ppm_resize_nn(arr, w, h), arr)
    th = data.draw(st.integers(1, 12))
    tw = data.draw(st.integers(1, 12))
    out = ppm_resize_nn(arr, tw, th)
    assert out.shape == (th, tw, 3)
    ys = np.minimum(((np.arange(th) + 0.5) * h / th).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(tw) + 0.5) * w / tw).astype(np.int64), w - 1)
    assert np.array_equal(out, arr[ys][:, xs])
