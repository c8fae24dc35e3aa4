"""Pure-Python PNG / WAV codecs (codecs.py): round trips across every
filter type and color type, malformed-input rejection, CRC tamper
detection, and the Spark-side format-sniffed decode/resize integration."""

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import Row

from starryskyqueryengine_spark.codecs import (
    PNG_MAGIC,
    png_decode,
    png_encode,
    wav_decode,
    wav_encode,
)
from starryskyqueryengine_spark.multimodal import (
    MEDIA_SCHEMA,
    decode_media,
    ppm_resize_nn,
    resize_images,
)

RNG = np.random.default_rng(42)


# --------------------------------------------------------------------------
# PNG
# --------------------------------------------------------------------------

@pytest.mark.parametrize("channels", [1, 3, 4])
@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4, "mixed"])
def test_png_roundtrip_all_filters(channels, filt):
    h, w = 13, 17
    shape = (h, w) if channels == 1 else (h, w, channels)
    a = RNG.integers(0, 256, size=shape, dtype=np.uint8)
    filters = [(3 * y + 1) % 5 for y in range(h)] if filt == "mixed" else filt
    ww, hh, ch, px = png_decode(png_encode(a, filters=filters))
    assert (ww, hh, ch) == (w, h, channels)
    expected = a if a.ndim == 3 else a[:, :, None]
    assert np.array_equal(px, expected)


def test_png_single_pixel_and_single_column():
    for shape in [(1, 1, 3), (5, 1, 3), (1, 7, 3)]:
        a = RNG.integers(0, 256, size=shape, dtype=np.uint8)
        *_, px = png_decode(png_encode(a, filters=4))
        assert np.array_equal(px, a)


def test_png_crc_tamper_rejected():
    p = bytearray(png_encode(RNG.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)))
    p[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC|chunk"):
        png_decode(bytes(p))
    # but decodes with verification off only if the tampered byte is in a
    # region that still parses — CRC is the integrity line, so just check
    # the verified path rejects and the clean payload accepts
    png_decode(bytes(png_encode(np.zeros((2, 2, 3), dtype=np.uint8))))


def test_png_rejects_non_png_and_truncated():
    with pytest.raises(ValueError, match="not a PNG"):
        png_decode(b"P6\n1 1\n255\nabc")
    good = png_encode(np.zeros((3, 3, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        png_decode(good[: len(good) // 2])


def test_png_rejects_unsupported_depth():
    # hand-craft a 16-bit-depth IHDR; decoder must refuse, not garble
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    chunk = (
        struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError, match="unsupported"):
        png_decode(PNG_MAGIC + chunk)


def test_png_encoder_rejects_bad_filter_and_shape():
    a = np.zeros((2, 2, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="filter"):
        png_encode(a, filters=7)
    with pytest.raises(ValueError):
        png_encode(np.zeros((2, 2, 2), dtype=np.uint8))


# --------------------------------------------------------------------------
# WAV
# --------------------------------------------------------------------------

def test_wav_roundtrip_mono_and_stereo():
    mono = (RNG.integers(0, 4096, size=800) - 2048).astype(np.int16)
    rate, ch, out = wav_decode(wav_encode(mono, 16000))
    assert (rate, ch) == (16000, 1)
    assert np.array_equal(out[:, 0], mono)

    stereo = (RNG.integers(0, 4096, size=(300, 2)) - 2048).astype(np.int16)
    rate, ch, out = wav_decode(wav_encode(stereo, 44100))
    assert (rate, ch) == (44100, 2)
    assert np.array_equal(out, stereo)


def test_wav_tolerates_extra_chunks():
    base = wav_encode(np.array([1, -2, 3], dtype=np.int16), 8000)
    # splice a LIST chunk (odd-length, so padding matters) before data
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    spliced = base[:fmt_end] + extra + base[fmt_end:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    rate, ch, out = wav_decode(spliced)
    assert rate == 8000 and list(out[:, 0]) == [1, -2, 3]


def test_wav_rejects_non_pcm16():
    bad = bytearray(wav_encode(np.array([0], dtype=np.int16), 8000))
    bad[20] = 3  # format code -> IEEE float
    with pytest.raises(ValueError, match="unsupported"):
        wav_decode(bytes(bad))
    with pytest.raises(ValueError, match="not a RIFF"):
        wav_decode(b"OggS....")


# --------------------------------------------------------------------------
# Spark integration: sniffed decode + resize over real PNG payloads
# --------------------------------------------------------------------------

def _media_df(spark, rows):
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def test_decode_media_sniffs_png_and_wav(spark):
    img = RNG.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
    snd = (RNG.integers(0, 4096, size=160) - 2048).astype(np.int16)
    rows = [
        Row(media_id=1, payload=bytearray(png_encode(img, filters=2)),
            meta=Row(media_type="image", width=8, height=6, duration_ms=None,
                     sample_rate=None, byte_len=0)),
        Row(media_id=2, payload=bytearray(wav_encode(snd, 16000)),
            meta=Row(media_type="audio", width=None, height=None,
                     duration_ms=10, sample_rate=16000, byte_len=0)),
    ]
    out = {r["media_id"]: r for r in decode_media(_media_df(spark, rows)).collect()}
    img_flat = img.reshape(-1)
    assert out[1]["checksum"] == zlib.crc32(img_flat.tobytes())
    assert out[1]["mean_byte"] == pytest.approx(img_flat.mean())
    snd64 = snd.astype(np.int64)
    assert out[2]["checksum"] == zlib.crc32(np.ascontiguousarray(snd).tobytes())
    assert out[2]["mean_byte"] == pytest.approx(snd64.mean())


def test_resize_images_real_png_path(spark):
    img = RNG.integers(0, 256, size=(12, 16, 3), dtype=np.uint8)
    rows = [
        Row(media_id=1, payload=bytearray(png_encode(img, filters=1)),
            meta=Row(media_type="image", width=16, height=12, duration_ms=None,
                     sample_rate=None, byte_len=0)),
    ]
    out = resize_images(_media_df(spark, rows), 4, 3).collect()[0]
    w, h, ch, px = png_decode(bytes(out["payload"]))
    assert (w, h, ch) == (4, 3, 3)
    assert np.array_equal(px, ppm_resize_nn(img, 4, 3))


# --------------------------------------------------------------------------
# Y4M video
# --------------------------------------------------------------------------

from starryskyqueryengine_spark.codecs import (  # noqa: E402
    y4m_decode,
    y4m_encode,
    y4m_extract_frame,
    y4m_frame_count,
)


def test_y4m_c444_roundtrip_exact():
    fr = RNG.integers(0, 256, size=(5, 8, 16, 3), dtype=np.uint8)
    p = y4m_encode(fr, rate=(30, 1), colorspace="C444")
    w, h, rate, out = y4m_decode(p)
    assert (w, h, rate) == (16, 8, (30, 1))
    assert np.array_equal(out, fr)


def test_y4m_frame_seek_is_positional():
    fr = RNG.integers(0, 256, size=(7, 4, 6, 3), dtype=np.uint8)
    p = y4m_encode(fr)
    assert y4m_frame_count(p) == 7
    for i in (0, 3, 6):
        assert np.array_equal(y4m_extract_frame(p, i), fr[i])
    with pytest.raises(ValueError, match="out of range"):
        y4m_extract_frame(p, 7)


def test_y4m_c420_luma_exact_chroma_approx():
    fr = RNG.integers(0, 256, size=(2, 8, 16, 3), dtype=np.uint8)
    p = y4m_encode(fr, colorspace="C420jpeg")
    f0 = y4m_extract_frame(p, 0)
    assert np.array_equal(f0[:, :, 0], fr[0, :, :, 0])  # Y exact
    # chroma is 2x2 box-averaged then replicated: within rounding of the mean
    cb = fr[0, :, :, 1].reshape(4, 2, 8, 2).mean(axis=(1, 3))
    up = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1)
    assert np.abs(f0[:, :, 1].astype(float) - up).max() <= 2.0


def test_y4m_rejects_malformed():
    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        y4m_decode(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError, match="even"):
        y4m_encode(np.zeros((1, 3, 5, 3), dtype=np.uint8), colorspace="C420jpeg")
    good = bytearray(y4m_encode(np.zeros((2, 4, 4, 3), dtype=np.uint8)))
    # corrupt the SECOND frame's marker (skip past the first one)
    first = bytes(good).find(b"FRAME\n")
    idx = bytes(good).find(b"FRAME\n", first + 6)
    good[idx] = ord("X")
    with pytest.raises(ValueError, match="frame marker"):
        y4m_extract_frame(bytes(good), 1)


def test_extract_frames_real_y4m_path(spark):
    from starryskyqueryengine_spark.multimodal import extract_frames

    fr = RNG.integers(0, 256, size=(4, 8, 16, 3), dtype=np.uint8)
    payload = y4m_encode(fr)
    rows = [
        Row(media_id=1, payload=bytearray(payload),
            meta=Row(media_type="video", width=16, height=8,
                     duration_ms=2000, sample_rate=None, byte_len=len(payload))),
    ]
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    out = {r["frame_idx"]: bytes(r["frame_payload"])
           for r in extract_frames(df, interval_ms=500).collect()}
    assert len(out) == 4  # 2000ms / 500ms
    for i in range(4):
        assert out[i] == fr[i].tobytes()


# --------------------------------------------------------------------------
# Per-record error isolation in the decode path
# --------------------------------------------------------------------------

def test_decode_media_isolates_corrupt_payloads(spark):
    """One malformed payload in a batch must quarantine (NULL features),
    not kill the task — the decode-path analog of W5 poison-pill
    isolation. strict=True restores fail-fast for debugging."""
    good = png_encode(RNG.integers(0, 256, size=(4, 4, 3), dtype=np.uint8))
    corrupt = bytearray(good)
    corrupt[40] ^= 0xFF  # CRC now invalid
    truncated_wav = wav_encode(np.array([1, 2, 3], dtype=np.int16), 8000)[:20]

    def meta(mt):
        return Row(media_type=mt, width=None, height=None, duration_ms=None,
                   sample_rate=None, byte_len=0)

    rows = [
        Row(media_id=1, payload=bytearray(good), meta=meta("image")),
        Row(media_id=2, payload=bytes(corrupt), meta=meta("image")),
        Row(media_id=3, payload=truncated_wav, meta=meta("audio")),
    ]
    df = _media_df(spark, rows)
    out = {r["media_id"]: r for r in decode_media(df).collect()}
    assert out[1]["checksum"] is not None
    assert out[2]["checksum"] is None and out[2]["mean_byte"] is None
    assert out[3]["checksum"] is None
    # strict mode fail-fast
    with pytest.raises(Exception):
        decode_media(df, strict=True).collect()


# --------------------------------------------------------------------------
# GIF (LZW)
# --------------------------------------------------------------------------

from starryskyqueryengine_spark.codecs import gif_decode, gif_encode  # noqa: E402


@pytest.mark.parametrize("n_colors", [2, 4, 7, 16, 256])
def test_gif_roundtrip_palette_sizes(n_colors):
    pal = RNG.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    idx = RNG.integers(0, n_colors, size=(13, 9), dtype=np.uint8)
    W, H, oidx, opal, rgb = gif_decode(gif_encode(idx, pal))
    assert (W, H) == (9, 13)
    assert np.array_equal(oidx, idx)
    assert np.array_equal(rgb, pal[idx])


def test_gif_lzw_dict_growth_and_clear_reset():
    """Large random 256-color plane forces code width to 12 bits and a
    CLEAR reset; repetitive plane exercises long dictionary chains."""
    pal = RNG.integers(0, 256, size=(256, 3), dtype=np.uint8)
    noisy = RNG.integers(0, 256, size=(80, 90), dtype=np.uint8)
    W, H, oidx, _, _ = gif_decode(gif_encode(noisy, pal))
    assert np.array_equal(oidx, noisy)
    rep = np.tile(np.arange(64, dtype=np.uint8) % 8, (64, 8))
    W, H, oidx, _, _ = gif_decode(gif_encode(rep, pal[:8]))
    assert np.array_equal(oidx, rep)


def test_gif_rejects_malformed():
    with pytest.raises(ValueError, match="not a GIF"):
        gif_decode(b"\x89PNGxxxx")
    pal = np.zeros((4, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="out of palette"):
        gif_encode(np.full((2, 2), 9, dtype=np.uint8), pal)
    good = gif_encode(np.zeros((4, 4), dtype=np.uint8), pal)
    with pytest.raises(ValueError):
        gif_decode(good[:20])


def test_decode_media_sniffs_gif(spark):
    pal = RNG.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = RNG.integers(0, 16, size=(6, 8), dtype=np.uint8)
    payload = gif_encode(idx, pal)
    rows = [
        Row(media_id=1, payload=bytearray(payload),
            meta=Row(media_type="image", width=8, height=6, duration_ms=None,
                     sample_rate=None, byte_len=len(payload))),
    ]
    out = decode_media(_media_df(spark, rows)).collect()[0]
    rgb = pal[idx]
    assert out["mean_byte"] == pytest.approx(rgb.mean())


def test_gif_roundtrip_randomized_shapes_and_palettes():
    """Regression for the encoder/decoder width desync at stream end: the
    encoder must mirror the decoder's post-final-code table growth before
    emitting EOI.  Randomized shapes × palette sizes hit the boundary
    (~0.3% of random inputs before the fix)."""
    rng = np.random.default_rng(1234)
    for _ in range(400):
        h = int(rng.integers(1, 24))
        w = int(rng.integers(1, 24))
        n = int(rng.integers(2, 257))
        pal = rng.integers(0, 256, size=(n, 3), dtype=np.uint8)
        idx = rng.integers(0, n, size=(h, w)).astype(np.uint8)
        _, _, oidx, _, _ = gif_decode(gif_encode(idx, pal))
        assert np.array_equal(oidx, idx), (h, w, n)


@pytest.mark.parametrize(
    "mutate",
    [
        lambda p: p[:8],            # truncated mid logical-screen header
        lambda p: p[: len(p) // 2], # truncated mid data sub-blocks
        lambda p: p[:6] + b"\x01",  # one stray byte after magic
    ],
)
def test_decode_one_normalizes_malformed_gif(mutate):
    """struct.error / IndexError from truncated payloads must surface as
    ValueError so decode_media's per-record isolation quarantines them."""
    from starryskyqueryengine_spark.multimodal import _decode_one

    pal = RNG.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = RNG.integers(0, 16, size=(9, 7), dtype=np.uint8)
    with pytest.raises(ValueError):
        _decode_one(mutate(gif_encode(idx, pal)))


def test_decode_one_normalizes_malformed_png_wav():
    from starryskyqueryengine_spark.codecs import png_encode, wav_encode
    from starryskyqueryengine_spark.multimodal import _decode_one

    png = png_encode(np.zeros((8, 8, 3), dtype=np.uint8))
    wav = wav_encode(np.zeros(64, dtype=np.int16), 8000)
    for bad in (png[:12], png[:30], wav[:10], wav[:20]):
        with pytest.raises(ValueError):
            _decode_one(bad)


def test_decode_media_quarantines_truncated_gif(spark):
    """End-to-end: a GIF truncated mid-stream lands as NULL features, the
    task survives, and good neighbors still decode."""
    pal = RNG.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = RNG.integers(0, 16, size=(6, 8), dtype=np.uint8)
    good = gif_encode(idx, pal)
    rows = [
        Row(media_id=1, payload=bytearray(good),
            meta=Row(media_type="image", width=8, height=6, duration_ms=None,
                     sample_rate=None, byte_len=len(good))),
        Row(media_id=2, payload=bytearray(good[:9]),
            meta=Row(media_type="image", width=8, height=6, duration_ms=None,
                     sample_rate=None, byte_len=9)),
    ]
    out = {r["media_id"]: r for r in decode_media(_media_df(spark, rows)).collect()}
    assert out[1]["checksum"] is not None
    assert out[2]["checksum"] is None and out[2]["mean_byte"] is None


def test_png_truncated_crc_raises_valueerror():
    """A chunk cut inside its 4-byte CRC must surface the documented
    ValueError, not a raw struct.error."""
    import numpy as np

    from starryskyqueryengine_spark.codecs import png_decode, png_encode

    payload = png_encode(np.arange(48, dtype=np.uint8).reshape(4, 4, 3))
    with pytest.raises(ValueError):
        png_decode(payload[:-2])


def test_png_decompression_bomb_bounded():
    """A few-KB PNG declaring tiny dims but carrying a huge DEFLATE
    expansion must raise ValueError after a BOUNDED inflate, never
    materialize the expansion."""
    import struct
    import zlib

    import numpy as np

    from starryskyqueryengine_spark.codecs import (
        PNG_MAGIC, _chunk, png_decode,
    )

    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)  # 4x4 RGB
    bomb = zlib.compress(b"\x00" * (64 << 20), 9)  # 64 MB of zeros
    payload = (PNG_MAGIC + _chunk(b"IHDR", ihdr)
               + _chunk(b"IDAT", bomb) + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="IDAT size"):
        png_decode(payload)


def test_wav_zero_channels_rejected():
    import struct

    from starryskyqueryengine_spark.codecs import wav_decode, wav_encode

    import numpy as np

    good = wav_encode(np.zeros((8, 1), dtype=np.int16), sample_rate=8000)
    # corrupt the fmt chunk's channel count to 0 (offset: RIFF(12) +
    # 'fmt '+len(8) + format(2) -> channels at byte 22)
    bad = bytearray(good)
    bad[22:24] = struct.pack("<H", 0)
    with pytest.raises(ValueError, match="channels"):
        wav_decode(bytes(bad))


def test_y4m_zero_frames_decodes_empty():
    from starryskyqueryengine_spark.codecs import y4m_decode

    w, h, rate, frames = y4m_decode(b"YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C444\n")
    assert (w, h) == (4, 4)
    assert frames.shape == (0, 4, 4, 3)


def test_decompression_bomb_guard_all_compressed_formats():
    """Review r10: a few-KB payload whose header declares huge dims made
    the decoder allocate h*w-sized arrays BEFORE any data validation —
    PNG inflates ~1000x, GIF LZW ~2700x, and JPEG allocated its
    float64 coefficient planes straight from the SOF dims (a crafted
    300-byte JPEG attempted ~34 GB).  An OOM kills the task before the
    per-record quarantine's except can run, so the guard must raise
    ValueError (PIL's MAX_IMAGE_PIXELS discipline) — and FAST."""
    import struct
    import time
    import zlib as _zlib

    import pytest

    from starryskyqueryengine_spark.codecs import (
        GIF_MAGIC,
        PNG_MAGIC,
        _chunk,
        gif_decode,
        png_decode,
    )
    from starryskyqueryengine_spark.jpeg import jpeg_decode

    t0 = time.perf_counter()
    # PNG: IHDR claims 65535x65535 RGB
    ihdr = struct.pack(">IIBBBBB", 65535, 65535, 8, 2, 0, 0, 0)
    png = PNG_MAGIC + _chunk(b"IHDR", ihdr) + _chunk(
        b"IDAT", _zlib.compress(b"\x00" * 64)
    ) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="decode budget"):
        png_decode(png)

    # GIF: image descriptor claims 65535x65535
    gif = (
        GIF_MAGIC + b"9a" + struct.pack("<HHBBB", 65535, 65535, 0x80, 0, 0)
        + b"\x00" * 6  # 2-entry palette
        + b"\x2C" + struct.pack("<HHHHB", 0, 0, 65535, 65535, 0)
        + b"\x02\x01\x00\x00\x3B"
    )
    with pytest.raises(ValueError, match="decode budget"):
        gif_decode(gif)

    # JPEG: SOF0 claims 65504x65504 (multiple of 8), one component,
    # minimal DQT/DHT/SOS so parsing reaches the scan decoder
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + b"\x01" * 64
    sof = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(
        ">HH", 65504, 65504
    ) + b"\x01" + b"\x01\x11\x00"
    # DC table 0: one code of length 1, symbol 0
    dht = b"\xff\xc4" + struct.pack(">H", 19 + 1) + b"\x00" + bytes(
        [1] + [0] * 15
    ) + b"\x00"
    sos = b"\xff\xda" + struct.pack(">H", 8) + b"\x01" + b"\x01\x00" + b"\x00\x3f\x00"
    jpg = b"\xff\xd8" + dqt + sof + dht + sos + b"\x00\x00" + b"\xff\xd9"
    with pytest.raises(ValueError, match="decode budget"):
        jpeg_decode(jpg)

    # the guard must fire from header metadata alone — well under a
    # second, no giant allocation
    assert time.perf_counter() - t0 < 5.0


def test_decode_budget_counts_working_bytes_not_output_pixels():
    """ADVICE r10: the 128M-pixel cap understated transient memory —
    PNG unfiltering runs int64 scan+recon buffers (~18 B/sample) and
    JPEG float64 coefficient planes (~17 B/px/component), so a payload
    just under the pixel cap could still demand gigabytes.  The budget
    now charges each format's true working bytes/pixel: a 4000x4000
    RGBA PNG (16M px — fine under the old pixel-only cap) declares
    ~1.15 GB of unfilter working set and must be refused up front."""
    import struct

    import pytest

    from starryskyqueryengine_spark.codecs import (
        MAX_DECODE_BYTES,
        MAX_DECODE_PIXELS,
        PNG_MAGIC,
        _check_pixel_budget,
        _chunk,
        png_decode,
    )

    assert 4000 * 4000 < MAX_DECODE_PIXELS  # the old cap would have passed
    assert 4000 * 4000 * 18 * 4 > MAX_DECODE_BYTES
    ihdr = struct.pack(">IIBBBBB", 4000, 4000, 8, 6, 0, 0, 0)  # RGBA
    png = (
        PNG_MAGIC + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", b"\x00" * 16) + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="decode budget"):
        png_decode(png)

    # the helper itself: JPEG's 3-component working set trips the byte
    # budget at dims the pixel cap alone would admit
    with pytest.raises(ValueError, match="decode budget"):
        _check_pixel_budget(5000, 5000, "JPEG", bytes_per_pixel=17 * 3)
    # and realistic sizes still pass at every format's rate
    _check_pixel_budget(1920, 1080, "PNG", bytes_per_pixel=18 * 4)
    _check_pixel_budget(1920, 1080, "JPEG", bytes_per_pixel=17 * 3)
    _check_pixel_budget(1920, 1080, "GIF", bytes_per_pixel=6)
