"""Multimodal columns: opaque binary payloads + typed metadata.

North-star extension (not in the reference — its closest analog is the
firehose CAR/CBOR ``blocks: Uint8Array`` column, S5,
``src/util/subscription.ts:76-122``, which this module generalizes):
image/audio/video travel as ``binary`` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas functions over ``mapInPandas``.

Scale design:

- Payloads stay opaque bytes until the last possible operator; metadata
  (type, dims, duration) is columnar, so Catalyst prunes/filters on it
  without touching payloads (e.g. ``media_type = 'video'`` never
  deserializes an image).
- Frame *enumeration* is pure JVM (``explode(sequence(...))``) — the
  row-multiplying step stays in whole-stage codegen; only per-frame
  payload extraction crosses into Python, Arrow-batched.
- ``mapInPandas`` receives iterator-of-batches: peak memory is one Arrow
  batch per task regardless of partition size — this is what makes a
  100 TB media scan feasible (spark.sql.execution.arrow.maxRecordsPerBatch
  bounds the batch).
- The codec step is REAL for binary PPM (P6 netpbm), PNG (stdlib zlib
  DEFLATE, all five filter types — ``codecs.py``), WAV (RIFF PCM16),
  and baseline JPEG (pure-numpy DCT + Annex-K Huffman — ``jpeg.py``):
  encode/decode runs on actual pixel/sample bytes, format-sniffed per
  payload, and is oracle-checked (``mm_ppm_decode``, ``mm_png_decode``,
  ``mm_wav_features``, ``mm_jpeg_roundtrip``). Unrecognized formats
  fall through to the clearly-marked deterministic fake; everything
  around the seam — schema, batching, partitioning, UDF signatures —
  is identical for both paths.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: typed metadata carried beside every payload
MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),  # image|audio|video|text
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("byte_len", LongType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("meta", MEDIA_META_SCHEMA),
    ]
)

_TYPES = ["image", "audio", "video", "text"]


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic media table from the documents fixture: the utf-8
    text bytes act as the opaque payload; metadata derives from doc_id.
    Pure built-ins — reproducible on the DuckDB oracle side."""
    mt = F.element_at(F.array(*[F.lit(t) for t in _TYPES]), (F.col("doc_id") % 4 + 1).cast("int"))
    is_img = mt == "image"
    is_av = mt.isin("audio", "video")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            mt.alias("media_type"),
            F.when(is_img, (64 * (1 + F.col("doc_id") % 8)).cast("int")).alias("width"),
            F.when(is_img, (48 * (1 + F.col("doc_id") % 6)).cast("int")).alias("height"),
            F.when(is_av, (1000 * (1 + F.col("doc_id") % 30)).cast("long")).alias("duration_ms"),
            F.when(mt == "audio", F.lit(16000).cast("int")).alias("sample_rate"),
            F.octet_length(F.col("text")).cast("long").alias("byte_len"),
        ).alias("meta"),
    )


# --------------------------------------------------------------------------
# Real codec: binary PPM (P6 netpbm) — pure numpy, no external libs.
#
# The decode seam is REAL for this format: header parse, pixel reshape,
# nearest-neighbor resample all operate on actual image bytes. Formats
# needing external codecs (JPEG/PNG/...) still fall through to the
# clearly-marked deterministic fake below; ``decode_media`` /
# ``resize_images`` sniff the magic bytes per payload.
# --------------------------------------------------------------------------

PPM_MAGIC = b"P6"


def ppm_encode(arr) -> bytes:
    """(h, w, 3) uint8 array -> binary PPM bytes."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) array, got shape {a.shape}")
    h, w, _ = a.shape
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def ppm_decode(payload: bytes):
    """Binary PPM bytes -> (width, height, (h, w, 3) uint8 array).

    Tolerates comment lines and arbitrary whitespace in the header, per
    the netpbm spec; raises ValueError on malformed input.
    """
    import numpy as np

    if not payload.startswith(PPM_MAGIC):
        raise ValueError("not a P6 PPM payload")
    # Header = magic, width, height, maxval as whitespace-separated tokens
    # (comments '#...\n' allowed), then a single whitespace byte, then raw
    # pixel data.
    pos, tokens = 2, []
    n = len(payload)
    while len(tokens) < 3 and pos < n:
        c = payload[pos:pos + 1]
        if c.isspace():
            pos += 1
        elif c == b"#":
            nl = payload.find(b"\n", pos)
            pos = n if nl < 0 else nl + 1
        else:
            end = pos
            while end < n and not payload[end:end + 1].isspace():
                end += 1
            tokens.append(payload[pos:end])
            pos = end
    if len(tokens) < 3:
        raise ValueError("truncated PPM header")
    w, h, maxval = (int(t) for t in tokens)
    if w <= 0 or h <= 0 or maxval != 255:
        raise ValueError(f"unsupported PPM dims/maxval: {w}x{h}/{maxval}")
    pos += 1  # exactly one whitespace byte after maxval
    need = w * h * 3
    raw = payload[pos:pos + need]
    if len(raw) != need:
        raise ValueError(f"PPM pixel data truncated: {len(raw)} != {need}")
    return w, h, np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def ppm_resize_nn(arr, width: int, height: int):
    """Nearest-neighbor resample of an (h, w, 3) array to (height, width, 3).

    Index map: src = floor((dst + 0.5) * src_size / dst_size) — the
    standard pixel-center mapping, deterministic, pure index arithmetic.
    """
    import numpy as np

    a = np.asarray(arr)
    h, w = a.shape[:2]
    ys = np.minimum((((np.arange(height) + 0.5) * h / height)).astype(np.int64), h - 1)
    xs = np.minimum((((np.arange(width) + 0.5) * w / width)).astype(np.int64), w - 1)
    return a[ys][:, xs]


# --------------------------------------------------------------------------
# Decode / feature extraction (Arrow-batched Python)
# --------------------------------------------------------------------------

DECODE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("checksum", LongType()),
        StructField("mean_byte", DoubleType()),
        StructField("n_bytes", LongType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, float, int]:
    """Deterministic fake decode: crc32 + byte mean stand in for real
    pixel/sample statistics. Clearly NOT a real codec."""
    if not payload:
        return 0, 0.0, 0
    return zlib.crc32(payload), sum(payload) / len(payload), len(payload)


def _decode_one(payload: bytes) -> tuple[int, float, int]:
    """Per-payload decode, format-sniffed: REAL for P6 PPM, PNG, and WAV
    (crc32 + mean over actual pixel/sample values via the pure-Python
    codecs); deterministic fake otherwise.

    All malformed-input failures are normalized to ``ValueError`` so the
    per-record isolation in ``decode_media`` catches every corruption
    shape: a GIF truncated mid-header raises ``struct.error``, a
    truncated extension sub-block ``IndexError``, a short PNG/WAV slice
    ``struct.error``, a garbled DEFLATE stream ``zlib.error`` — one
    ``except ValueError`` upstream would miss all of those.
    """
    import struct as _struct

    try:
        return _decode_one_raw(payload)
    except (IndexError, KeyError, _struct.error, zlib.error, OverflowError) as e:
        raise ValueError(f"malformed media payload: {type(e).__name__}: {e}") from e


def _decode_one_raw(payload: bytes) -> tuple[int, float, int]:
    import numpy as np

    from .codecs import PNG_MAGIC, WAV_MAGIC, png_decode, wav_decode
    from .jpeg import JPEG_MAGIC, jpeg_decode

    if payload.startswith(PPM_MAGIC):
        _, _, px = ppm_decode(payload)
        flat = px.reshape(-1)
    elif payload.startswith(PNG_MAGIC):
        _, _, _, px = png_decode(payload)
        flat = px.reshape(-1)
    elif payload.startswith(JPEG_MAGIC[:2]):
        _, _, _, px = jpeg_decode(payload)
        flat = px.reshape(-1)
    elif payload.startswith(WAV_MAGIC):
        _, _, s = wav_decode(payload)
        flat = s.reshape(-1)
    elif payload.startswith(b"YUV4MPEG2"):
        from .codecs import y4m_decode

        _, _, _, frames = y4m_decode(payload)
        flat = frames.reshape(-1)
    elif payload.startswith(b"GIF8"):
        from .codecs import gif_decode

        _, _, _, _, rgb = gif_decode(payload)
        flat = rgb.reshape(-1)
    else:
        return _fake_decode(payload)
    if flat.size == 0:
        return 0, 0.0, len(payload)
    return (
        zlib.crc32(np.ascontiguousarray(flat).tobytes()),
        float(int(np.sum(flat, dtype=np.int64))) / flat.size,
        len(payload),
    )


def decode_media(df: DataFrame, strict: bool = False) -> DataFrame:
    """Decode payloads to per-item summary features via ``mapInPandas``.

    Iterator-of-batches signature: constant memory per task. Per-payload
    format sniffing: PPM/PNG/JPEG/WAV/Y4M go through the REAL pure-Python
    codecs (stats over actual pixel/sample values); unrecognized formats
    fall back to the deterministic fake.

    PER-RECORD ERROR ISOLATION (default): a payload whose magic matches
    but whose body is malformed — truncated IDAT, bad CRC, garbage RIFF —
    yields NULL feature columns instead of failing the task. One corrupt
    blob in a 100 TB corpus must not kill the job; this is the decode
    path's analog of the ingest pipeline's PERMISSIVE-mode poison-pill
    handling (S6/W5, ``streaming/pipeline.py::validated_json``). Pass
    ``strict=True`` to re-raise instead (debugging / data-quality runs).
    Filter ``checksum IS NULL`` downstream to quarantine bad payloads.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf["payload"]:
                # NULL payload quarantines like any corrupt blob —
                # bytes(None) raises TypeError, which the ValueError
                # handler below would NOT catch, killing the task
                if b is None:
                    if strict:
                        raise ValueError("NULL payload")
                    feats.append((None, None, None))
                    continue
                try:
                    feats.append(_decode_one(bytes(b)))
                except ValueError:
                    if strict:
                        raise
                    feats.append((None, None, None))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": [
                        m["media_type"] if m is not None else None
                        for m in pdf["meta"]
                    ],
                    # nullable dtypes: quarantined rows carry NULL, not NaN
                    "checksum": pd.array([f[0] for f in feats], dtype="Int64"),
                    "mean_byte": pd.array([f[1] for f in feats], dtype="Float64"),
                    "n_bytes": pd.array([f[2] for f in feats], dtype="Int64"),
                }
            )

    return df.mapInPandas(run, schema=DECODE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: filters to images on the *metadata* column (no
    payload touched for non-images — columnar pruning), then resamples.
    P6 PPM and PNG payloads get a REAL nearest-neighbor resample
    (output is a valid PPM/PNG of the target dims); other formats use
    the deterministic fake (payload truncated proportionally to the
    pixel-count ratio)."""
    imgs = df.filter(F.col("meta.media_type") == "image")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codecs import PNG_MAGIC, png_decode, png_encode

        from .jpeg import jpeg_decode, jpeg_encode

        def resize_one(raw: bytes, m) -> bytes:
            if raw.startswith(PPM_MAGIC):
                _, _, px = ppm_decode(raw)
                return ppm_encode(ppm_resize_nn(px, width, height))
            if raw.startswith(PNG_MAGIC):
                _, _, _, px = png_decode(raw)
                return png_encode(ppm_resize_nn(px, width, height))
            if raw.startswith(b"\xff\xd8"):
                _, _, ch, px = jpeg_decode(raw)
                small = ppm_resize_nn(px, width, height)
                return jpeg_encode(small[:, :, 0] if ch == 1 else small)
            src_px = max(1, (m["width"] or 1) * (m["height"] or 1))
            keep = max(1, int(len(raw) * min(1.0, (width * height) / src_px)))
            return raw[:keep]

        for pdf in batches:
            out_payload = []
            for b, m in zip(pdf["payload"], pdf["meta"]):
                # NULL payload/meta: quarantine inside the loop — the
                # conversion itself must not escape the per-record guard
                if b is None or m is None:
                    out_payload.append(None)
                    continue
                raw = bytes(b)
                try:
                    out_payload.append(resize_one(raw, m))
                except Exception:
                    # per-record quarantine, same contract as
                    # decode_media: a payload whose magic matches but
                    # whose body the codec rejects (progressive JPEG,
                    # palette PNG, truncated blob — including raw
                    # struct/Memory errors the codecs may leak) becomes
                    # a NULL payload instead of killing the task
                    out_payload.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": out_payload,
                }
            )

    return imgs.mapInPandas(run, schema=RESIZE_SCHEMA)


# --------------------------------------------------------------------------
# Frame sampling (row-multiplier stays JVM-side)
# --------------------------------------------------------------------------

def _frame_range(duration_col, interval_ms: int):
    """Frame indices [0, n) where n = max(1, duration // interval) for a
    nonempty duration, else empty. Two deliberate choices live here (and
    only here — both call sites share this helper):

    - a video shorter than the interval still yields its t=0 frame
      (floor alone would silently drop the whole clip from the frame
      pipeline);
    - the guard avoids the bare sequence(0, n-1) trap: with n = 0 Spark
      infers step -1 and yields [0, -1] — two bogus frames, one with a
      negative index."""
    n = F.greatest(
        (duration_col / F.lit(interval_ms)).cast("long"), F.lit(1).cast("long")
    )
    return F.when(
        duration_col > 0, F.sequence(F.lit(0).cast("long"), n - 1)
    ).otherwise(F.array().cast("array<long>"))


def sample_frames(df: DataFrame, interval_ms: int = 500) -> DataFrame:
    """Enumerate video frames every ``interval_ms``. The explode is pure
    Catalyst (``sequence`` + ``explode``) so a 100 TB video table fans
    out to frames without leaving codegen; pair with ``extract_frame``
    only on the frames you keep."""
    vids = df.filter(F.col("meta.media_type") == "video")
    return (
        vids.withColumn(
            "frame_idx", F.explode(_frame_range(F.col("meta.duration_ms"), interval_ms))
        )
        .select(
            "media_id",
            "frame_idx",
            (F.col("frame_idx") * interval_ms).alias("frame_ts_ms"),
        )
    )


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_payload", BinaryType()),
    ]
)


def extract_frames(df: DataFrame, interval_ms: int = 500) -> DataFrame:
    """Frame payload extraction for sampled frames: JVM enumerates, the
    Arrow-batched Python step slices a deterministic fake frame (a
    byte-window of the payload keyed by frame_idx) where a real build
    would call the codec."""
    vids = df.filter(F.col("meta.media_type") == "video")
    frames = vids.withColumn(
        "frame_idx", F.explode(_frame_range(F.col("meta.duration_ms"), interval_ms))
    ).select("media_id", "frame_idx", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codecs import Y4M_MAGIC, y4m_extract_frame, y4m_frame_count

        for pdf in batches:
            payloads = []
            for b, idx in zip(pdf["payload"], pdf["frame_idx"]):
                raw = bytes(b) if b is not None else b""
                if not raw:
                    payloads.append(b"")
                    continue
                if raw.startswith(Y4M_MAGIC):
                    # REAL frame extraction: O(1) seek into the planar
                    # container (codecs.y4m_extract_frame), clamped to
                    # the clip's actual frame count.  Per-record
                    # quarantine (decode_media's contract): a malformed
                    # stream behind a valid magic — missing W/H tokens,
                    # bad frame marker, truncated plane — yields an
                    # empty frame instead of killing the task
                    try:
                        n = y4m_frame_count(raw)
                        if n == 0:
                            payloads.append(b"")
                            continue
                        fi = min(int(idx), n - 1)
                        payloads.append(y4m_extract_frame(raw, fi).tobytes())
                    except Exception:
                        payloads.append(b"")
                    continue
                start = int(idx) * 16 % len(raw)
                payloads.append(raw[start : start + 16])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_idx": pdf["frame_idx"],
                    "frame_payload": payloads,
                }
            )

    return frames.mapInPandas(run, schema=FRAME_SCHEMA)
