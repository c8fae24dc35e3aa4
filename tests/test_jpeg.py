"""Baseline JPEG codec (jpeg.py): round-trip quality floors, container
structure, restart-marker resynchronization, grayscale, odd dims,
malformed-input rejection, and the Spark-side sniffed decode/resize
integration."""

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from starryskyqueryengine_spark.jpeg import jpeg_decode, jpeg_encode
from starryskyqueryengine_spark.multimodal import (
    MEDIA_SCHEMA,
    decode_media,
    resize_images,
)


def _gradient(h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [seed % 64 + xx * 2 + yy, seed % 64 + xx + yy * 2, seed % 64 + xx + yy],
        axis=-1,
    )
    return np.clip(img, 0, 255).astype(np.uint8)


def _psnr(a, b):
    mse = ((a.astype(float) - b.astype(float)) ** 2).mean()
    return 10 * np.log10(255**2 / max(mse, 1e-12))


# --------------------------------------------------------------------------
# Round trips
# --------------------------------------------------------------------------

@pytest.mark.parametrize("dims", [(8, 8), (16, 24), (33, 41), (40, 56)])
def test_roundtrip_smooth_rgb(dims):
    h, w = dims
    img = _gradient(h, w)
    W, H, C, out = jpeg_decode(jpeg_encode(img, quality=90))
    assert (W, H, C) == (w, h, 3)
    assert _psnr(out, img) > 38, f"PSNR too low at {dims}"
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 12


def test_roundtrip_grayscale():
    g = np.linspace(0, 255, 31 * 29).reshape(31, 29).astype(np.uint8)
    W, H, C, out = jpeg_decode(jpeg_encode(g, quality=90))
    assert (W, H, C) == (29, 31, 1)
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).max() <= 6


def test_quality_tradeoff_monotone():
    img = _gradient(32, 32)
    sizes, errs = [], []
    for q in (30, 60, 90):
        p = jpeg_encode(img, quality=q)
        _, _, _, out = jpeg_decode(p)
        sizes.append(len(p))
        errs.append(np.abs(out.astype(int) - img.astype(int)).max())
    assert sizes[0] <= sizes[1] <= sizes[2]
    assert errs[0] >= errs[2]


def test_restart_intervals_resync():
    img = _gradient(40, 48, seed=7)
    p = jpeg_encode(img, quality=90, restart_interval=2)
    assert b"\xff\xdd" in p  # DRI marker present
    assert any(bytes([0xFF, 0xD0 + i]) in p for i in range(8))
    W, H, C, out = jpeg_decode(p)
    assert (W, H, C) == (48, 40, 3)
    assert _psnr(out, img) > 38


def test_flat_image_is_tiny_and_exact():
    img = np.full((24, 24, 3), 127, dtype=np.uint8)
    p = jpeg_encode(img, quality=90)
    _, _, _, out = jpeg_decode(p)
    assert np.abs(out.astype(int) - 127).max() <= 2
    assert len(p) < 900  # DC-only entropy data


def test_textured_image_still_bounded():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    W, H, C, out = jpeg_decode(jpeg_encode(img, quality=95))
    assert (W, H, C) == (32, 32, 3)
    # noise is JPEG's worst case — just require decode sanity, not fidelity
    assert out.shape == img.shape


# --------------------------------------------------------------------------
# Malformed input
# --------------------------------------------------------------------------

def test_rejects_non_jpeg_and_truncated():
    with pytest.raises(ValueError, match="not a JPEG"):
        jpeg_decode(b"\x89PNG\r\n\x1a\nrest")
    good = jpeg_encode(_gradient(16, 16))
    with pytest.raises(ValueError):
        jpeg_decode(good[:40])


def test_rejects_progressive_marker():
    # splice an SOF2 (progressive) marker in place of SOF0
    good = bytearray(jpeg_encode(_gradient(16, 16)))
    idx = bytes(good).find(b"\xff\xc0")
    good[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        jpeg_decode(bytes(good))


def test_missing_huffman_table_detected():
    good = bytearray(jpeg_encode(_gradient(16, 16)))
    # corrupt the DHT class/id byte so the scan's table id resolves to nothing
    idx = bytes(good).find(b"\xff\xc4")
    good[idx + 4] = 0x0F
    with pytest.raises(ValueError):
        jpeg_decode(bytes(good))


# --------------------------------------------------------------------------
# Spark integration
# --------------------------------------------------------------------------

def test_decode_media_sniffs_jpeg(spark):
    img = _gradient(24, 32, seed=5)
    payload = jpeg_encode(img, quality=90)
    rows = [
        Row(media_id=1, payload=bytearray(payload),
            meta=Row(media_type="image", width=32, height=24, duration_ms=None,
                     sample_rate=None, byte_len=len(payload))),
    ]
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    out = decode_media(df).collect()[0]
    # decoded-pixel stats, not payload-byte stats: mean must sit near the
    # source image mean (JPEG-lossy, so approx), not near the byte soup
    assert out["mean_byte"] == pytest.approx(img.mean(), abs=2.0)
    assert out["n_bytes"] == len(payload)


def test_resize_images_real_jpeg_path(spark):
    img = _gradient(32, 48, seed=9)
    payload = jpeg_encode(img, quality=95)
    rows = [
        Row(media_id=1, payload=bytearray(payload),
            meta=Row(media_type="image", width=48, height=32, duration_ms=None,
                     sample_rate=None, byte_len=len(payload))),
    ]
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    out = resize_images(df, 12, 8).collect()[0]
    W, H, C, px = jpeg_decode(bytes(out["payload"]))
    assert (W, H, C) == (12, 8, 3)
    # resized-then-reencoded output stays near the source downsample
    from starryskyqueryengine_spark.multimodal import ppm_resize_nn

    ref = ppm_resize_nn(img, 12, 8)
    assert np.abs(px.astype(int) - ref.astype(int)).mean() < 12


def test_jpeg_fill_bytes_before_markers_accepted():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
    — real encoders emit them; the decoder previously read the true
    marker as a segment length and rejected the file."""
    import numpy as np

    from starryskyqueryengine_spark.jpeg import jpeg_decode, jpeg_encode

    img = (np.arange(16 * 16, dtype=np.uint8).reshape(16, 16) % 251)
    payload = jpeg_encode(img)
    base = jpeg_decode(payload)
    # insert one fill byte before the first post-SOI marker (DQT et al)
    assert payload[2] == 0xFF
    stuffed = payload[:2] + b"\xff" + payload[2:]
    w, h, ch, px = jpeg_decode(stuffed)
    assert (w, h, ch) == base[:3]
    assert (px == base[3]).all()
