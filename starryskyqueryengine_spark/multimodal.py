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
- The actual codec step is STUBBED: this container has no image/audio
  libs. ``decode_image`` computes a deterministic fake "pixel summary"
  from the payload bytes; the real-library path is gated behind an
  import-try and raises NotImplementedError. Everything around it —
  schema, batching, partitioning, UDF signatures — is real and tested.
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

try:  # real decoders are not shipped in this environment
    from PIL import Image as _PILImage  # type: ignore  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

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


def decode_media(df: DataFrame) -> DataFrame:
    """Decode payloads to per-item summary features via ``mapInPandas``.

    Iterator-of-batches signature: constant memory per task. With PIL et
    al. absent the decode is the deterministic fake; a real deployment
    flips ``_HAVE_PIL`` and fills in the library call.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if _HAVE_PIL:
                # real path would be: Image.open(io.BytesIO(b)) ...
                raise NotImplementedError("real image decode not wired in this build")
            feats = [_fake_decode(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": [m["media_type"] for m in pdf["meta"]],
                    "checksum": [f[0] for f in feats],
                    "mean_byte": [f[1] for f in feats],
                    "n_bytes": [f[2] for f in feats],
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
    payload touched for non-images — columnar pruning), then runs the
    stubbed resample. Fake output payload = payload truncated
    proportionally to the pixel-count ratio (deterministic)."""
    imgs = df.filter(F.col("meta.media_type") == "image")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if _HAVE_PIL:
                raise NotImplementedError("real image resize not wired in this build")
            out_payload = []
            for b, m in zip(pdf["payload"], pdf["meta"]):
                raw = bytes(b)
                src_px = max(1, (m["width"] or 1) * (m["height"] or 1))
                keep = max(1, int(len(raw) * min(1.0, (width * height) / src_px)))
                out_payload.append(raw[:keep])
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
        for pdf in batches:
            if _HAVE_PIL:
                raise NotImplementedError("real frame decode not wired in this build")
            payloads = []
            for b, idx in zip(pdf["payload"], pdf["frame_idx"]):
                raw = bytes(b)
                if not raw:
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
