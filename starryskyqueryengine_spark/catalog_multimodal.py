"""Multimodal catalog queries: binary-column plumbing checked against
SQL oracles where the semantics are SQL-expressible (metadata projection,
frame enumeration, checksum features); rows-only where they are not
(resize plumbing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .catalog import QUERIES, register
from .functions.fingerprint import banded_hamming_pairs
from .multimodal import decode_media, sample_frames, synthesize_media
from .sources.fixtures import load_table

# DuckDB mirror of synthesize_media's metadata derivation
_MT_SQL = "['image','audio','video','text'][CAST(doc_id % 4 AS INT) + 1]"


def _gen_gradient_image(d: int):
    """Deterministic doc_id-derived RGB gradient test image: shared by
    mm_jpeg_roundtrip and mm_transcode_png_jpeg, whose oracles both
    replay the SAME dims formulas (16+(d%4)*8 x 16+(d%3)*8) and whose
    error bounds are only meaningful against this one reference."""
    import numpy as np

    w, h = 16 + (d % 4) * 8, 16 + (d % 3) * 8
    yy, xx = np.mgrid[0:h, 0:w]
    base = d % 64
    img = np.stack(
        [base + xx * 2 + yy, base + xx + yy * 2, base + xx + yy], axis=-1
    )
    return np.clip(img, 0, 255).astype(np.uint8)


def _phash_hashes_cte() -> str:
    """Shared oracle CTE chain dims -> px -> boxed -> sums -> tot ->
    bands -> hashes: the closed-form image generator + 64-bit aHash,
    replayed in SQL.  ONE copy, interpolated into the three phash
    oracles (mm_image_phash_neardup, pipeline_multimodal_curation,
    phash_cluster_survivors) — the box-index and bit formulas must
    track the Python kernel exactly, and a fix applied to one inlined
    copy but not the others would silently leave an oracle checking a
    DIFFERENT hash than the Spark plan computes."""
    return """dims AS (
      SELECT doc_id,
             doc_id - doc_id % 5 AS g,
             CAST(doc_id % 5 AS BIGINT) AS r,
             8 + 8 * ((doc_id - doc_id % 5) % 3) AS w,
             8 + 8 * ((doc_id - doc_id % 5) % 2) AS h
      FROM documents
    ),
    px AS (
      SELECT doc_id, g, r, w, h, unnest(range(w * h)) AS i
      FROM dims
    ),
    boxed AS (
      SELECT doc_id,
             ((i // w) // (h // 8)) * 8 + ((i % w) // (w // 8)) AS box,
             (31 * g + 7 * i) % 240 + 2 * r
               + CASE WHEN i % 97 < r THEN 5 ELSE 0 END AS val
      FROM px
    ),
    sums AS (
      SELECT doc_id, box, sum(val) AS s FROM boxed GROUP BY doc_id, box
    ),
    tot AS (
      SELECT doc_id, sum(s) AS t FROM sums GROUP BY doc_id
    ),
    bands AS (
      SELECT s.doc_id,
             s.box // 16 AS band_idx,
             CAST(sum(CASE WHEN 64 * s.s > t.t THEN 1 << (s.box % 16)
                           ELSE 0 END) AS BIGINT) AS band_val
      FROM sums s JOIN tot t USING (doc_id)
      GROUP BY s.doc_id, s.box // 16
    ),
    hashes AS (
      SELECT doc_id,
             max(CASE WHEN band_idx = 0 THEN band_val END) AS b0,
             max(CASE WHEN band_idx = 1 THEN band_val END) AS b1,
             max(CASE WHEN band_idx = 2 THEN band_val END) AS b2,
             max(CASE WHEN band_idx = 3 THEN band_val END) AS b3
      FROM bands GROUP BY doc_id
    )"""


@register(
    "mm_metadata_project",
    f"""
    SELECT doc_id AS media_id,
           {_MT_SQL} AS media_type,
           CASE WHEN {_MT_SQL} = 'image'
                THEN CAST(64 * (1 + doc_id % 8) AS INT) END AS width,
           CASE WHEN {_MT_SQL} IN ('audio','video')
                THEN 1000 * (1 + doc_id % 30) END AS duration_ms,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
    FROM documents
    """,
)
def mm_metadata_project(spark, sf_dir):
    """Multimodal: typed-metadata projection over opaque payloads —
    filters/projections on metadata never touch payload bytes (column
    pruning; payload column absent from this plan's ReadSchema)."""
    media = synthesize_media(load_table(spark, sf_dir, "documents"))
    return media.select(
        "media_id",
        F.col("meta.media_type").alias("media_type"),
        F.col("meta.width").alias("width"),
        F.col("meta.duration_ms").alias("duration_ms"),
        F.col("meta.byte_len").alias("byte_len"),
    )


@register(
    "mm_frame_sample",
    f"""
    SELECT doc_id AS media_id,
           unnest(range(0, GREATEST((1000 * (1 + doc_id % 30)) // 500, 1))) AS frame_idx,
           unnest(range(0, GREATEST((1000 * (1 + doc_id % 30)) // 500, 1))) * 500 AS frame_ts_ms
    FROM documents
    WHERE {_MT_SQL} = 'video'
    """,
)
def mm_frame_sample(spark, sf_dir):
    """Multimodal: video frame enumeration at a 500 ms stride — the
    row-multiplying explode(sequence) stays inside whole-stage codegen
    (no Python until per-frame payload extraction)."""
    media = synthesize_media(load_table(spark, sf_dir, "documents"))
    return sample_frames(media, interval_ms=500)


@register(
    "mm_decode_features",
    """
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents
    """,
)
def mm_decode_features(spark, sf_dir):
    """Multimodal: Arrow-batched decode via mapInPandas (stub codec).
    The oracle checks the SQL-expressible slice (ids + byte length);
    checksum/mean-byte are covered by unit tests."""
    media = synthesize_media(load_table(spark, sf_dir, "documents"))
    return decode_media(media).select("media_id", "n_bytes")


# mm_resize_plumbing (rows-only) retired in round 6: the resize path is
# now value-checked end-to-end by mm_ppm_resize below (real PPM encode →
# decode → nearest-neighbor resample, oracle replays the pixel index map
# in SQL), so the weaker rows-only twin added nothing.


@register(
    "mm_ppm_resize",
    """
    WITH grid AS (
      SELECT doc_id,
             8 + doc_id % 8 AS w,
             6 + doc_id % 6 AS h,
             j, k, c
      FROM documents,
           range(9) t1(j), range(10) t2(k), range(3) t3(c)
    ),
    px AS (
      SELECT doc_id,
             (31 * doc_id
              + 7 * (3 * (LEAST(CAST(FLOOR(((j + 0.5) * h) / 9) AS BIGINT), h - 1) * w
                          + LEAST(CAST(FLOOR(((k + 0.5) * w) / 10) AS BIGINT), w - 1))
                     + c)) % 256 AS val
      FROM grid
    )
    SELECT doc_id AS media_id,
           CAST(10 AS INTEGER) AS width,
           CAST(9 AS INTEGER) AS height,
           ROUND(CAST(sum(val) AS DOUBLE) / count(*), 6) AS mean_px,
           CAST(count(*) AS BIGINT) AS n_px
    FROM px GROUP BY doc_id
    """,
)
def mm_ppm_resize(spark, sf_dir):
    """REAL image-resize round trip (closes the round-4 rows-only gap on
    the resize path): per doc, encode an actual binary PPM whose pixels
    follow a closed-form generator, decode it, nearest-neighbor resample
    to 10x9 with ``ppm_resize_nn`` (pixel-center index map,
    src = floor((dst+0.5)*src/dst)), and report exact resized pixel
    statistics. The oracle replays the SAME index map in SQL from the
    generator formula alone — a header, stride, reshape, or index-map bug
    anywhere in encode/decode/resize breaks the value match. Source dims
    (w in 8..15, h in 6..11) straddle the 10x9 target, so both up- and
    down-sampling paths are exercised. The double division (j+0.5)*h/9 is
    correctly rounded IEEE in both engines, so floors agree bit-exactly.
    100 TB shape: Arrow-batched mapInPandas over the payload column, pure
    per-row work, zero shuffle before the final hash-agg-free projection."""
    import numpy as np
    import pandas as pd

    from .multimodal import ppm_decode, ppm_encode, ppm_resize_nn
    from .session import ensure_parallelism

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents").select("doc_id"))

    def gen(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 8 + d % 8, 6 + d % 6
                n = 3 * w * h
                px = ((31 * d + 7 * np.arange(n, dtype=np.int64)) % 256).astype(
                    np.uint8
                ).reshape(h, w, 3)
                payloads.append(ppm_encode(px))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    enc = docs.mapInPandas(gen, "media_id long, payload binary")

    def dec_resize(batches):
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "px_sum": [], "n_px": []}
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                _, _, px = ppm_decode(bytes(b))
                small = ppm_resize_nn(px, 10, 9)
                flat = small.reshape(-1)
                out["media_id"].append(int(mid))
                out["width"].append(small.shape[1])
                out["height"].append(small.shape[0])
                out["px_sum"].append(int(np.sum(flat, dtype=np.int64)))
                out["n_px"].append(flat.size)
            yield pd.DataFrame(out)

    decd = enc.mapInPandas(
        dec_resize, "media_id long, width int, height int, px_sum long, n_px long"
    )
    return decd.select(
        "media_id",
        "width",
        "height",
        F.round(F.col("px_sum") / F.col("n_px"), 6).alias("mean_px"),
        F.col("n_px"),
    )


@register(
    "mm_png_decode",
    """
    WITH px AS (
      SELECT doc_id,
             unnest(range(3 * (8 + doc_id % 8) * (6 + doc_id % 6))) AS i
      FROM documents
    )
    SELECT doc_id AS media_id,
           CAST(8 + doc_id % 8 AS INTEGER) AS width,
           CAST(6 + doc_id % 6 AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS channels,
           ROUND(CAST(sum((31 * doc_id + 7 * i) % 256) AS DOUBLE) / count(*), 6)
             AS mean_px,
           CAST(count(*) AS BIGINT) AS n_px
    FROM px GROUP BY doc_id
    """,
)
def mm_png_decode(spark, sf_dir):
    """REAL PNG round trip (stdlib-zlib DEFLATE codec, ``codecs.py``):
    per doc, build an RGB image from the same closed-form generator as
    ``mm_ppm_decode``, encode it as a real PNG with the per-scanline
    filter type cycling (doc_id + row) % 5 — so every decoder unfilter
    path (None/Sub/Up/Average/Paeth) is exercised across the corpus —
    then decode (CRC-verified) and report dims + exact pixel stats.
    The oracle recomputes the stats from the generator formula alone: a
    bug in filtering, DEFLATE framing, chunk CRC, stride, or reshape
    breaks the value match.  100 TB shape: two Arrow-batched
    ``mapInPandas`` hops, per-payload memory, zero shuffle."""
    import numpy as np
    import pandas as pd

    from .codecs import png_decode, png_encode
    from .session import ensure_parallelism

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents").select("doc_id"))

    def gen(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 8 + d % 8, 6 + d % 6
                n = 3 * w * h
                px = ((31 * d + 7 * np.arange(n, dtype=np.int64)) % 256).astype(
                    np.uint8
                ).reshape(h, w, 3)
                payloads.append(
                    png_encode(px, filters=[(d + y) % 5 for y in range(h)])
                )
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    enc = docs.mapInPandas(gen, "media_id long, payload binary")

    def dec(batches):
        for pdf in batches:
            out = {
                "media_id": [], "width": [], "height": [], "channels": [],
                "px_sum": [], "n_px": [],
            }
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                w, h, ch, px = png_decode(bytes(b))
                flat = px.reshape(-1)
                out["media_id"].append(int(mid))
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(ch)
                out["px_sum"].append(int(np.sum(flat, dtype=np.int64)))
                out["n_px"].append(flat.size)
            yield pd.DataFrame(out)

    decd = enc.mapInPandas(
        dec,
        "media_id long, width int, height int, channels int, px_sum long, n_px long",
    )
    return decd.select(
        "media_id",
        "width",
        "height",
        "channels",
        F.round(F.col("px_sum") / F.col("n_px"), 6).alias("mean_px"),
        F.col("n_px"),
    )


@register(
    "mm_wav_features",
    """
    WITH s AS (
      SELECT doc_id,
             unnest(range(800 + (doc_id % 5) * 160)) AS i
      FROM documents
    )
    SELECT doc_id AS media_id,
           CAST(16000 AS INTEGER) AS sample_rate,
           CAST((800 + (doc_id % 5) * 160) * 1000 // 16000 AS BIGINT)
             AS duration_ms,
           CAST(sum((17 * doc_id + 13 * i) % 4096 - 2048) AS BIGINT)
             AS sum_samples,
           CAST(max(abs((17 * doc_id + 13 * i) % 4096 - 2048)) AS BIGINT)
             AS peak_abs,
           CAST(count(*) AS BIGINT) AS n_samples
    FROM s GROUP BY doc_id
    """,
)
def mm_wav_features(spark, sf_dir):
    """REAL audio round trip (RIFF PCM16 codec, ``codecs.py``): per doc,
    synthesize int16 samples from a closed-form generator, encode a
    canonical WAV, decode it (RIFF sub-chunk walk + fmt validation), and
    report sample-accurate features — duration, exact sample sum, peak
    amplitude.  The oracle replays the generator in SQL; a bug in the
    RIFF framing, fmt parse, byte order, or sample reshape breaks the
    value match.  Sample counts are multiples of 16 so duration_ms is
    integer-exact at 16 kHz.  100 TB shape: Arrow-batched mapInPandas,
    per-clip memory, zero shuffle."""
    import numpy as np
    import pandas as pd

    from .codecs import wav_decode, wav_encode
    from .session import ensure_parallelism

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents").select("doc_id"))

    def gen(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                n = 800 + (d % 5) * 160
                s = ((17 * d + 13 * np.arange(n, dtype=np.int64)) % 4096 - 2048
                     ).astype(np.int16)
                payloads.append(wav_encode(s, 16000))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    enc = docs.mapInPandas(gen, "media_id long, payload binary")

    def dec(batches):
        for pdf in batches:
            out = {
                "media_id": [], "sample_rate": [], "duration_ms": [],
                "sum_samples": [], "peak_abs": [], "n_samples": [],
            }
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                rate, _ch, s = wav_decode(bytes(b))
                flat = s.reshape(-1).astype(np.int64)
                out["media_id"].append(int(mid))
                out["sample_rate"].append(rate)
                out["duration_ms"].append(flat.size * 1000 // rate)
                out["sum_samples"].append(int(np.sum(flat)))
                out["peak_abs"].append(int(np.max(np.abs(flat))) if flat.size else 0)
                out["n_samples"].append(flat.size)
            yield pd.DataFrame(out)

    return enc.mapInPandas(
        dec,
        "media_id long, sample_rate int, duration_ms long, sum_samples long, "
        "peak_abs long, n_samples long",
    )


@register(
    "mm_ppm_decode",
    """
    WITH px AS (
      SELECT doc_id,
             unnest(range(3 * (8 + doc_id % 8) * (6 + doc_id % 6))) AS i
      FROM documents
    )
    SELECT doc_id AS media_id,
           CAST(8 + doc_id % 8 AS INTEGER) AS width,
           CAST(6 + doc_id % 6 AS INTEGER) AS height,
           ROUND(CAST(sum((31 * doc_id + 7 * i) % 256) AS DOUBLE) / count(*), 6)
             AS mean_px,
           CAST(count(*) AS BIGINT) AS n_px
    FROM px GROUP BY doc_id
    """,
)
def mm_ppm_decode(spark, sf_dir):
    """REAL image-codec round trip: per doc, build an actual binary PPM
    (P6) whose pixel bytes follow a closed-form generator, ship it
    through the payload column, decode it with the pure-numpy codec
    (header parse + pixel reshape), and report decoded dims + exact
    pixel statistics. The oracle recomputes the same stats from the
    generator formula alone — any header/stride/reshape bug in the codec
    breaks the match. Both hops are Arrow-batched mapInPandas; pixel
    sums are int64-exact before the one double division."""
    import numpy as np
    import pandas as pd

    from .multimodal import ppm_decode, ppm_encode
    from .session import ensure_parallelism

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents").select("doc_id"))

    def gen(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 8 + d % 8, 6 + d % 6
                n = 3 * w * h
                px = ((31 * d + 7 * np.arange(n, dtype=np.int64)) % 256).astype(
                    np.uint8
                ).reshape(h, w, 3)
                payloads.append(ppm_encode(px))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    enc = docs.mapInPandas(gen, "media_id long, payload binary")

    def dec(batches):
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "px_sum": [], "n_px": []}
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                w, h, px = ppm_decode(bytes(b))
                flat = px.reshape(-1)
                out["media_id"].append(int(mid))
                out["width"].append(w)
                out["height"].append(h)
                out["px_sum"].append(int(np.sum(flat, dtype=np.int64)))
                out["n_px"].append(flat.size)
            yield pd.DataFrame(out)

    decd = enc.mapInPandas(
        dec, "media_id long, width int, height int, px_sum long, n_px long"
    )
    return decd.select(
        "media_id",
        "width",
        "height",
        F.round(F.col("px_sum") / F.col("n_px"), 6).alias("mean_px"),
        F.col("n_px"),
    )


@register(
    "mm_jpeg_roundtrip",
    """
    SELECT doc_id AS media_id,
           CAST(16 + (doc_id % 4) * 8 AS INTEGER) AS width,
           CAST(16 + (doc_id % 3) * 8 AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS channels,
           TRUE AS within_tol
    FROM documents
    """,
)
def mm_jpeg_roundtrip(spark, sf_dir):
    """REAL baseline JPEG round trip (pure-numpy DCT + Annex-K Huffman,
    ``jpeg.py``): per doc, synthesize a smooth linear-gradient RGB image
    (low-frequency content, so quantization error is tightly bounded),
    encode at quality 90, decode, and report exact dims plus a
    reconstruction-error-bound flag (max |err| <= 12). JPEG is lossy,
    so unlike the PPM/PNG oracles the value check pins dimensions and
    the error bound, not pixel sums — a bug anywhere in DCT, zigzag,
    Huffman tables, byte stuffing, or the color transform either breaks
    the decoded dims or blows the error bound (bit-exact properties
    live in tests/test_jpeg.py). 100 TB shape: two Arrow-batched
    mapInPandas hops, per-image memory, zero shuffle."""
    import numpy as np
    import pandas as pd

    from .jpeg import jpeg_decode, jpeg_encode
    from .session import ensure_parallelism

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents").select("doc_id"))

    def gen(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                payloads.append(jpeg_encode(_gen_gradient_image(int(d)), quality=90))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    enc = docs.mapInPandas(gen, "media_id long, payload binary")

    def dec(batches):
        for pdf in batches:
            out = {
                "media_id": [], "width": [], "height": [], "channels": [],
                "within_tol": [],
            }
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                w, h, ch, px = jpeg_decode(bytes(b))
                ref = _gen_gradient_image(int(mid))
                err = int(
                    np.max(np.abs(px.astype(np.int64) - ref.astype(np.int64)))
                )
                out["media_id"].append(int(mid))
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(ch)
                out["within_tol"].append(err <= 12)
            yield pd.DataFrame(out)

    return enc.mapInPandas(
        dec,
        "media_id long, width int, height int, channels int, within_tol boolean",
    )


@register(
    "mm_wav_spectral",
    """
    SELECT doc_id AS media_id,
           CAST(4 * (1 + doc_id % 20) AS BIGINT) AS dominant_bin,
           CAST(1024 AS BIGINT) AS n_samples,
           TRUE AS tone_pure
    FROM documents
    """,
)
def mm_wav_spectral(spark, sf_dir):
    """REAL audio spectral analysis over real WAV payloads: per doc,
    synthesize a pure tone at EXACTLY bin k = 4*(1+doc_id%20) of a
    1024-point frame (an integer number of cycles, so the DFT
    concentrates all energy in bin k with no spectral leakage beyond
    int16 rounding noise), encode as RIFF PCM16, decode, run a numpy
    rFFT, and report the argmax bin plus a purity flag (>=99% of
    non-DC energy in the dominant bin). The oracle knows the dominant
    bin in closed form — an off-by-one in the codec's sample framing,
    byte order, or the FFT indexing shifts the argmax and fails the
    value check; the purity flag catches amplitude/clipping bugs.
    argmax over energy ratios ~1e6:1 is robust to float-ulp platform
    differences, which is what makes a value-exact check of a DSP op
    possible. 100 TB shape: Arrow-batched mapInPandas, one clip per
    iteration step, zero shuffle."""
    import numpy as np
    import pandas as pd

    from .codecs import wav_decode, wav_encode
    from .session import ensure_parallelism

    N, RATE, AMP = 1024, 8000, 12000.0

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents").select("doc_id"))

    def gen(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                k = 4 * (1 + d % 20)
                t = np.arange(N, dtype=np.float64)
                s = np.round(AMP * np.sin(2 * np.pi * k * t / N)).astype(np.int16)
                payloads.append(wav_encode(s, RATE))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    enc = docs.mapInPandas(gen, "media_id long, payload binary")

    def spectral(batches):
        for pdf in batches:
            out = {"media_id": [], "dominant_bin": [], "n_samples": [],
                   "tone_pure": []}
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                _rate, _ch, s = wav_decode(bytes(b))
                x = s[:, 0].astype(np.float64)
                spec = np.abs(np.fft.rfft(x)) ** 2
                spec[0] = 0.0  # ignore DC
                k = int(np.argmax(spec))
                purity = float(spec[k] / max(spec.sum(), 1e-12))
                out["media_id"].append(int(mid))
                out["dominant_bin"].append(k)
                out["n_samples"].append(x.size)
                out["tone_pure"].append(purity >= 0.99)
            yield pd.DataFrame(out)

    return enc.mapInPandas(
        spectral,
        "media_id long, dominant_bin long, n_samples long, tone_pure boolean",
    )


@register(
    "mm_y4m_frames",
    """
    WITH fidx AS (
      SELECT doc_id, unnest(range(2 + doc_id % 4)) AS f FROM documents
    ),
    grid AS (
      SELECT doc_id, f, p, i
      FROM fidx, range(3) tp(p), range(128) ti(i)
    )
    SELECT doc_id AS media_id,
           f AS frame_idx,
           CAST(16 AS INTEGER) AS width,
           CAST(8 AS INTEGER) AS height,
           CAST(sum((13 * doc_id + 31 * f + 17 * p + 7 * i) % 256) AS BIGINT)
             AS frame_sum
    FROM grid GROUP BY doc_id, f
    """,
)
def mm_y4m_frames(spark, sf_dir):
    """REAL video frame extraction (YUV4MPEG2 codec, ``codecs.py``):
    per doc, synthesize a 16x8 C444 clip of 2 + doc_id%4 frames whose
    plane bytes follow a closed-form generator, encode a real Y4M
    container, then extract EVERY frame via the O(1)-seek
    ``y4m_extract_frame`` (header parse + pointer arithmetic — the
    whole clip is never decoded) and report exact per-frame pixel sums.
    The oracle replays the generator; a header, frame-stride, plane
    order, or seek-offset bug shifts a sum and fails the value check.
    This retires the fake byte-slice path for Y4M payloads in
    extract_frames. 100 TB shape: frame enumeration stays JVM-side in
    the operator; here both hops are Arrow-batched mapInPandas with
    one clip in memory at a time, zero shuffle."""
    import numpy as np
    import pandas as pd

    from .codecs import y4m_encode, y4m_extract_frame, y4m_frame_count
    from .session import ensure_parallelism

    W, H = 16, 8

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents").select("doc_id"))

    def gen(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                n = 2 + d % 4
                i = np.arange(W * H, dtype=np.int64)
                frames = np.stack(
                    [
                        np.stack(
                            [
                                ((13 * d + 31 * f + 17 * p + 7 * i) % 256)
                                .astype(np.uint8)
                                .reshape(H, W)
                                for p in range(3)
                            ],
                            axis=-1,
                        )
                        for f in range(n)
                    ]
                )
                payloads.append(y4m_encode(frames, colorspace="C444"))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    enc = docs.mapInPandas(gen, "media_id long, payload binary")

    def extract(batches):
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "width": [], "height": [],
                   "frame_sum": []}
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(b)
                for f in range(y4m_frame_count(raw)):
                    px = y4m_extract_frame(raw, f)
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(f)
                    out["width"].append(px.shape[1])
                    out["height"].append(px.shape[0])
                    out["frame_sum"].append(
                        int(np.sum(px.astype(np.int64)))
                    )
            yield pd.DataFrame(out)

    return enc.mapInPandas(
        extract,
        "media_id long, frame_idx long, width int, height int, frame_sum long",
    )


@register(
    "mm_transcode_png_jpeg",
    """
    SELECT doc_id AS media_id,
           CAST(16 + (doc_id % 4) * 8 AS INTEGER) AS width,
           CAST(16 + (doc_id % 3) * 8 AS INTEGER) AS height,
           TRUE AS within_tol
    FROM documents
    """,
)
def mm_transcode_png_jpeg(spark, sf_dir):
    """Codec CHAINING — the transcode pipeline a media corpus actually
    runs (archival lossless -> serving lossy): per doc, build the smooth
    generator image, encode PNG (lossless), decode the PNG, re-encode as
    JPEG q90, decode the JPEG, and bound the end-to-end reconstruction
    error against the ORIGINAL generator image (<= 12, JPEG is the only
    lossy hop). Dims survive two containers exactly; a bug in either
    codec or the handoff between them (channel order, dtype, stride)
    breaks a dim or blows the bound. 100 TB shape: one Arrow-batched
    mapInPandas chain, per-image memory, zero shuffle."""
    import numpy as np
    import pandas as pd

    from .codecs import png_decode, png_encode
    from .jpeg import jpeg_decode, jpeg_encode
    from .session import ensure_parallelism

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents").select("doc_id"))

    def transcode(batches):
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "within_tol": []}
            for d in pdf["doc_id"]:
                d = int(d)
                ref = _gen_gradient_image(d)
                # archival hop: lossless PNG round trip
                _, _, _, px = png_decode(png_encode(ref, filters=2))
                # serving hop: lossy JPEG round trip
                w, h, _, out_px = jpeg_decode(jpeg_encode(px, quality=90))
                err = int(np.max(np.abs(out_px.astype(np.int64) - ref.astype(np.int64))))
                out["media_id"].append(d)
                out["width"].append(w)
                out["height"].append(h)
                out["within_tol"].append(err <= 12)
            yield pd.DataFrame(out)

    return docs.mapInPandas(
        transcode, "media_id long, width int, height int, within_tol boolean"
    )


@register(
    "mm_gif_roundtrip",
    """
    WITH px AS (
      SELECT doc_id,
             4 + doc_id % 13 AS nc,
             unnest(range((9 + doc_id % 7) * (5 + doc_id % 5))) AS i
      FROM documents
    ),
    rgb AS (
      SELECT doc_id,
             (11 * doc_id + 17 * ((7 * doc_id + 3 * i) % nc) + 29 * ch) % 256
               AS val
      FROM px, range(3) t(ch)
    )
    SELECT doc_id AS media_id,
           CAST(9 + doc_id % 7 AS INTEGER) AS width,
           CAST(5 + doc_id % 5 AS INTEGER) AS height,
           CAST(4 + doc_id % 13 AS INTEGER) AS n_colors,
           CAST(sum(val) AS BIGINT) AS rgb_sum
    FROM rgb GROUP BY doc_id
    """,
)
def mm_gif_roundtrip(spark, sf_dir):
    """REAL GIF round trip (LZW codec, ``codecs.py``): per doc, build a
    palette and an index plane from closed-form generators (palette
    sizes 4..16 cover non-power-of-two tables; planes are small enough
    that the LZW dictionary still grows and resets across the corpus),
    encode a real GIF89a, decode it, and report exact RGB pixel sums of
    palette[indices]. The oracle recomputes the sum from the generator
    formulas — a bug in LZW packing, code-width growth, CLEAR handling,
    palette padding, or index reshape breaks the value match. 100 TB
    shape: two Arrow-batched mapInPandas hops, per-image memory, zero
    shuffle."""
    import numpy as np
    import pandas as pd

    from .codecs import gif_decode, gif_encode
    from .session import ensure_parallelism

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents").select("doc_id"))

    def gen(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h, nc = 9 + d % 7, 5 + d % 5, 4 + d % 13
                c = np.arange(nc, dtype=np.int64)
                pal = (
                    (11 * d + 17 * c[:, None] + 29 * np.arange(3)[None, :]) % 256
                ).astype(np.uint8)
                i = np.arange(w * h, dtype=np.int64)
                idx = ((7 * d + 3 * i) % nc).astype(np.uint8).reshape(h, w)
                payloads.append(gif_encode(idx, pal))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    enc = docs.mapInPandas(gen, "media_id long, payload binary")

    def dec(batches):
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "n_colors": [],
                   "rgb_sum": []}
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                d = int(mid)
                W, H, _idx, _pal, rgb = gif_decode(bytes(b))
                out["media_id"].append(d)
                out["width"].append(W)
                out["height"].append(H)
                out["n_colors"].append(4 + d % 13)
                out["rgb_sum"].append(int(np.sum(rgb.astype(np.int64))))
            yield pd.DataFrame(out)

    return enc.mapInPandas(
        dec, "media_id long, width int, height int, n_colors int, rgb_sum long"
    )


@register(
    "mm_scene_detect",
    """
    WITH d AS (SELECT doc_id, 2 + doc_id % 4 AS n FROM documents),
    dd AS (SELECT doc_id, n, 1 + doc_id % (n - 1) AS cut FROM d),
    luma AS (
      SELECT dd.doc_id, s.s,
             CAST(sum((13 * dd.doc_id + 7 * i.i + 97 * s.s) % 256) AS BIGINT)
               AS luma_sum
      FROM dd, range(2) s(s), range(128) i(i)
      GROUP BY dd.doc_id, s.s
    )
    SELECT dd.doc_id AS media_id,
           CAST(dd.n AS BIGINT) AS n_frames,
           CAST(dd.cut AS BIGINT) AS cut_frame,
           l0.luma_sum AS luma_pre,
           l1.luma_sum AS luma_post
    FROM dd
    JOIN luma l0 ON l0.doc_id = dd.doc_id AND l0.s = 0
    JOIN luma l1 ON l1.doc_id = dd.doc_id AND l1.s = 1
    """,
)
def mm_scene_detect(spark, sf_dir):
    """Video scene-cut detection over REAL Y4M payloads: per doc a
    16x8 C444 clip of ``2 + doc_id % 4`` frames with ONE hard cut at
    frame ``1 + doc_id % (n-1)`` — within a scene every frame is
    byte-identical, across the cut every luma pixel shifts by +97 mod
    256 (the shifted plane sum can never equal the original: the diff
    is 97*128 - 256*wraps and 97*128 is not a multiple of 256).  The
    detector decodes each frame's luma plane via the O(1)-seek
    extractor, computes exact integer plane sums, and flags the first
    frame whose sum differs from its predecessor — a relational
    lag-window over the per-frame sums.  The oracle derives the cut
    position and both scene sums in closed form from the generator, so
    a detector that fires on the wrong frame (stride bug, plane-order
    bug, off-by-one in the lag) value-fails.

    100 TB shape: decode is Arrow-batched with one clip in memory at a
    time; the detection window partitions by media_id (per-clip frame
    counts are tiny), so state is clip-sized, never corpus-sized."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window

    from .codecs import y4m_encode, y4m_extract_frame, y4m_frame_count
    from .session import ensure_parallelism

    W, H = 16, 8

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents").select("doc_id"))

    def gen(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                n = 2 + d % 4
                cut = 1 + d % (n - 1)
                i = np.arange(W * H, dtype=np.int64)
                frames = np.stack(
                    [
                        np.stack(
                            [
                                ((13 * d + 17 * p + 7 * i + 97 * (1 if f >= cut else 0))
                                 % 256).astype(np.uint8).reshape(H, W)
                                for p in range(3)
                            ],
                            axis=-1,
                        )
                        for f in range(n)
                    ]
                )
                payloads.append(y4m_encode(frames, colorspace="C444"))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    enc = docs.mapInPandas(gen, "media_id long, payload binary")

    def luma_sums(batches):
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "luma_sum": []}
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(b)
                for f in range(y4m_frame_count(raw)):
                    px = y4m_extract_frame(raw, f)
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(f)
                    # luma = plane 0 of the (H, W, 3) pixel block
                    out["luma_sum"].append(int(px[:, :, 0].astype(np.int64).sum()))
            yield pd.DataFrame(out)

    sums = enc.mapInPandas(luma_sums, "media_id long, frame_idx long, luma_sum long")
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    diffed = sums.withColumn("prev_sum", F.lag("luma_sum").over(w)).withColumn(
        "is_cut",
        F.col("prev_sum").isNotNull() & (F.col("luma_sum") != F.col("prev_sum")),
    )
    return (
        diffed.groupBy("media_id")
        .agg(
            F.count("*").cast("bigint").alias("n_frames"),
            F.min(F.when(F.col("is_cut"), F.col("frame_idx"))).cast("bigint")
            .alias("cut_frame"),
            F.max(F.when(F.col("is_cut"), F.col("prev_sum"))).cast("bigint")
            .alias("luma_pre"),
            F.max(F.when(F.col("is_cut"), F.col("luma_sum"))).cast("bigint")
            .alias("luma_post"),
        )
    )


@register(
    "mm_image_phash_neardup",
    f"""
    WITH {_phash_hashes_cte()}
    SELECT a.doc_id AS media_a, b.doc_id AS media_b,
           CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
              + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
             AS INT) AS hamming
    FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
        + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) <= 3
    """,
)
def mm_image_phash_neardup(spark, sf_dir):
    """Image-content near-duplicate detection via a perceptual hash —
    the image-modality twin of MinHash/SimHash text dedup (closes the
    one dedup-modality gap: we deduped text, embeddings, lines, spans,
    and URLs, but not pixels).

    Per doc, synthesize a grayscale image from a closed-form generator
    in which groups of five doc_ids share a base pattern but differ by a
    uniform brightness shift (+2r) plus a sparse sparkle perturbation
    (+5 on every 97th pixel for r of them) — planted near-duplicates.
    Encode each as a REAL grayscale PNG (codecs.py color-type 0, filter
    cycling over all five unfilter paths), decode it back, and compute a
    64-bit average-hash: 8x8 grid of integer box sums, bit = 64*box_sum
    > total_sum. The compare is scale-free integer arithmetic, so aHash
    is EXACTLY invariant under the uniform brightness shift — planted
    pairs land at Hamming distance 0-3 while unrelated images sit near
    32.

    Candidate generation is banded LSH, never all-pairs: the hash is
    split into 4 x 16-bit bands; docs sharing any (band_idx, band_val)
    pair up. By pigeonhole, Hamming <= 3 over 4 bands forces at least
    one identical band, so banding + popcount verify is PROVABLY equal
    to the brute-force join the DuckDB oracle runs — an exact algorithm
    with sub-quadratic candidates, same contract as dedup_minhash_lsh's
    banding (functions/dedup.py).

    Reference tie-in: the engine's J2/J4 dedup surface
    (src/subscription.ts:414-416, :274-278) extended to binary media
    payloads per the north-star multimodal mandate.

    100 TB shape: one Arrow-batched mapInPandas encode hop and one
    decode/hash hop (per-payload memory, zero shuffle), then a tiny
    (media_id, 4 ints) hash table: band self-join shuffles ~20 bytes a
    row, the pair verify re-joins the same skinny table twice, and
    whole-stage codegen covers everything after the codec. Python never
    sees the join."""
    import numpy as np
    import pandas as pd

    from .codecs import png_decode, png_encode
    from .session import ensure_parallelism

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents").select("doc_id"))

    def gen(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                g, r = d - d % 5, d % 5
                w, h = 8 + 8 * (g % 3), 8 + 8 * (g % 2)
                i = np.arange(w * h, dtype=np.int64)
                val = (31 * g + 7 * i) % 240 + 2 * r + np.where(i % 97 < r, 5, 0)
                payloads.append(
                    png_encode(
                        val.astype(np.uint8).reshape(h, w),
                        filters=[(d + y) % 5 for y in range(h)],
                    )
                )
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    enc = docs.mapInPandas(gen, "media_id long, payload binary")

    def phash(batches):
        for pdf in batches:
            out = {"media_id": [], "b0": [], "b1": [], "b2": [], "b3": []}
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                w, h, _ch, px = png_decode(bytes(b))
                a = px.reshape(h, w).astype(np.int64)
                # integer 8x8 box sums: split rows/cols into 8 equal runs
                s = a.reshape(8, h // 8, 8, w // 8).sum(axis=(1, 3))
                bits = (64 * s > s.sum()).reshape(-1)
                out["media_id"].append(int(mid))
                for j in range(4):
                    out[f"b{j}"].append(
                        int(np.sum(bits[16 * j : 16 * j + 16] << np.arange(16)))
                    )
            yield pd.DataFrame(out)

    hashes = enc.mapInPandas(
        phash, "media_id long, b0 long, b1 long, b2 long, b3 long"
    ).cache()
    # Eagerly materialize the (tiny) hash table: the band explode and the
    # two pair-verify probes below are three plan branches over it, and
    # concurrent stages would each re-run the codec hop before the lazy
    # cache fills. One bounded action makes the expensive Python pass run
    # exactly once; everything after is JVM-side.
    hashes.count()

    # lazy return so the plan linter sees the banded-join shape (a
    # checkpointed return lints as an opaque RDD scan); the hash-cache
    # session pin is reclaimed by the bench's between-query
    # CacheManager clear (bench.py force_gc)
    return banded_hamming_pairs(hashes)


@register(
    "mm_audio_fingerprint_neardup",
    """
    WITH d AS (
      SELECT doc_id,
             doc_id - doc_id % 5 AS g,
             CAST(doc_id % 5 AS BIGINT) AS r
      FROM documents
    ),
    s AS (SELECT doc_id, g, r, unnest(range(5280)) AS i FROM d),
    v AS (
      SELECT doc_id, i // 160 AS f,
             ((17 * g + 13 * i) % 256 - 128
              + CASE WHEN i % 163 < r THEN 7 ELSE 0 END)
             * (1 + r)
             * (1 + ((g + 131) * ((i // 160) + 17) * 40503) % 65536 % 23) AS x
      FROM s
    ),
    e AS (SELECT doc_id, f, sum(x * x) AS e FROM v GROUP BY doc_id, f),
    b AS (
      SELECT doc_id, f,
             CASE WHEN lead(e) OVER (PARTITION BY doc_id ORDER BY f) > e
                  THEN 1 ELSE 0 END AS bit
      FROM e
    ),
    bands AS (
      SELECT doc_id, f // 8 AS band_idx,
             CAST(sum(bit << (f % 8)) AS BIGINT) AS band_val
      FROM b WHERE f < 32 GROUP BY doc_id, f // 8
    ),
    hashes AS (
      SELECT doc_id,
             max(CASE WHEN band_idx = 0 THEN band_val END) AS b0,
             max(CASE WHEN band_idx = 1 THEN band_val END) AS b1,
             max(CASE WHEN band_idx = 2 THEN band_val END) AS b2,
             max(CASE WHEN band_idx = 3 THEN band_val END) AS b3
      FROM bands GROUP BY doc_id
    )
    SELECT a.doc_id AS media_a, b.doc_id AS media_b,
           CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
              + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
             AS INT) AS hamming
    FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
        + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) <= 3
    """,
)
def mm_audio_fingerprint_neardup(spark, sf_dir):
    """Audio near-duplicate detection via an energy-contour fingerprint
    over REAL WAV round trips — the audio twin of
    ``mm_image_phash_neardup``, completing content-level near-dup across
    every modality this engine curates (text shingles, embeddings,
    lines, spans, URLs, pixels, now audio).

    Per doc, synthesize a 330 ms PCM16 clip (33 frames x 160 samples at
    16 kHz) from a closed-form generator where groups of five doc_ids
    share a waveform (a wide-hash per-frame gain makes each group's
    energy contour effectively unique) but differ by an integer
    amplitude scale (x(1+r)) plus a sparse click perturbation — planted
    near-duplicates. Encode a
    REAL RIFF WAV (codecs.py), decode it back, and fingerprint the
    ENERGY CONTOUR: 32 bits, bit f = energy(frame f+1) > energy(frame
    f). The compare is sign-of-delta, so the fingerprint is EXACTLY
    invariant under uniform amplitude scaling (the audio analog of
    aHash's brightness invariance); clicks flip at most the few bits
    where neighboring frame energies nearly tie.

    Same provably-exact banding as the image hash: 4 x 8-bit bands,
    Hamming <= 3 forces one identical band (pigeonhole), so the banded
    join equals the brute-force oracle. 100 TB shape: one Arrow-batched
    encode hop + one decode/fingerprint hop, then a (media_id, 4 ints)
    table through the band join — Python never sees the join."""
    import numpy as np
    import pandas as pd

    from .codecs import wav_decode, wav_encode
    from .session import ensure_parallelism

    N, FRAME = 5280, 160
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents").select("doc_id"))

    def gen(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                g, r = d - d % 5, d % 5
                i = np.arange(N, dtype=np.int64)
                # per-frame gain from a WIDE hash of (group, frame): the
                # energy contour is effectively unique per group, so
                # cross-group fingerprint collisions are negligible while
                # the in-group (1+r) scale still cancels in the compare
                # product hash, as in the video twin: an additive
                # g-offset leaves mod-23 shift classes sharing contours
                gain = 1 + ((g + 131) * ((i // FRAME) + 17) * 40503) % 65536 % 23
                x = ((17 * g + 13 * i) % 256 - 128
                     + np.where(i % 163 < r, 7, 0)) * (1 + r) * gain
                payloads.append(wav_encode(x.astype(np.int16), 16000))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    enc = docs.mapInPandas(gen, "media_id long, payload binary")

    def fingerprint(batches):
        for pdf in batches:
            out = {"media_id": [], "b0": [], "b1": [], "b2": [], "b3": []}
            for mid, buf in zip(pdf["media_id"], pdf["payload"]):
                _sr, _ch, samples = wav_decode(bytes(buf))
                s = np.asarray(samples, dtype=np.int64).reshape(-1)
                e = (s * s).reshape(N // FRAME, FRAME).sum(axis=1)
                bits = (e[1:] > e[:-1]).astype(np.int64)  # 32 contour bits
                out["media_id"].append(int(mid))
                for j in range(4):
                    out[f"b{j}"].append(
                        int(np.sum(bits[8 * j: 8 * j + 8] << np.arange(8)))
                    )
            yield pd.DataFrame(out)

    hashes = enc.mapInPandas(
        fingerprint, "media_id long, b0 long, b1 long, b2 long, b3 long"
    ).cache()
    hashes.count()  # materialize once before the three join branches

    # lazy return so the plan linter sees the banded-join shape (a
    # checkpointed return lints as an opaque RDD scan); the hash-cache
    # session pin is reclaimed by the bench's between-query
    # CacheManager clear (bench.py force_gc)
    return banded_hamming_pairs(hashes)


@register(
    "mm_video_fingerprint_neardup",
    """
    WITH d AS (
      SELECT doc_id,
             doc_id - doc_id % 5 AS g,
             CAST(doc_id % 5 AS BIGINT) AS r
      FROM documents
    ),
    grid AS (
      SELECT doc_id, g, r, f, i
      FROM d, range(33) tf(f), range(128) ti(i)
    ),
    v AS (
      SELECT doc_id, f,
             (7 * i) % 200
             + ((g + 131) * (f + 17) * 40503) % 65536 % 41
             + 2 * r
             + CASE WHEN (f * 128 + i) % 163 < r THEN 5 ELSE 0 END AS luma
      FROM grid
    ),
    e AS (SELECT doc_id, f, sum(luma) AS s FROM v GROUP BY doc_id, f),
    b AS (
      SELECT doc_id, f,
             CASE WHEN lead(s) OVER (PARTITION BY doc_id ORDER BY f) > s
                  THEN 1 ELSE 0 END AS bit
      FROM e
    ),
    bands AS (
      SELECT doc_id, f // 8 AS band_idx,
             CAST(sum(bit << (f % 8)) AS BIGINT) AS band_val
      FROM b WHERE f < 32 GROUP BY doc_id, f // 8
    ),
    hashes AS (
      SELECT doc_id,
             max(CASE WHEN band_idx = 0 THEN band_val END) AS b0,
             max(CASE WHEN band_idx = 1 THEN band_val END) AS b1,
             max(CASE WHEN band_idx = 2 THEN band_val END) AS b2,
             max(CASE WHEN band_idx = 3 THEN band_val END) AS b3
      FROM bands GROUP BY doc_id
    )
    SELECT a.doc_id AS media_a, b.doc_id AS media_b,
           CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
              + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
             AS INT) AS hamming
    FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
        + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) <= 3
    """,
)
def mm_video_fingerprint_neardup(spark, sf_dir):
    """Video near-duplicate detection via a luma-contour fingerprint
    over REAL Y4M round trips — the third modality twin (image aHash,
    audio energy contour, now video): groups of five doc_ids share a
    33-frame 16x8 C444 clip (wide-hash per-(group, frame) base level
    makes each group's luma trajectory effectively unique) and differ
    by a uniform +2r brightness shift plus sparse sparkle clicks —
    planted near-duplicates. Encode a real YUV4MPEG2 container, extract
    every frame through the O(1)-seek ``y4m_extract_frame``, and
    fingerprint the per-frame LUMA SUMS: 32 sign-of-delta bits, EXACTLY
    invariant under the uniform brightness shift (each frame's sum
    shifts by the same 2r*W*H). Banding identical to the image/audio
    hashes: 4 x 8-bit bands, Hamming <= 3 pigeonhole-forces a shared
    band, so the banded join provably equals the brute-force oracle.

    100 TB shape: one Arrow-batched encode hop, one seek/decode/
    fingerprint hop (one clip in memory at a time), then the tiny
    (media_id, 4 ints) hash table through the JVM-side band join."""
    import numpy as np
    import pandas as pd

    from .codecs import y4m_encode, y4m_extract_frame, y4m_frame_count
    from .session import ensure_parallelism

    NF, W, H = 33, 16, 8
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents").select("doc_id"))

    def gen(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                g, r = d - d % 5, d % 5
                frames = []
                for f in range(NF):
                    i = np.arange(W * H, dtype=np.int64)
                    # additive per-(group, frame) DC level: the frame's
                    # luma SUM moves by 128*level, so the contour bits are
                    # the level sequence's sign pattern — unique per group
                    # (a mod-folded offset kept sums in a ~±120 band and
                    # collided half the corpus; value-correct but useless)
                    # PRODUCT hash (g+131)(f+17): the level sequence's
                    # slope over f varies per group, so no two groups share
                    # a shifted copy of the same sequence (an additive
                    # g-offset hash left ~mod-41 shift classes colliding)
                    base = (7 * i) % 200 + (
                        (g + 131) * (f + 17) * 40503
                    ) % 65536 % 41
                    luma = (
                        base + 2 * r
                        + np.where((f * W * H + i) % 163 < r, 5, 0)
                    ).astype(np.uint8).reshape(H, W)
                    frames.append(np.stack([luma, luma, luma], axis=-1))
                payloads.append(y4m_encode(frames))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    enc = docs.mapInPandas(gen, "media_id long, payload binary")

    def fingerprint(batches):
        for pdf in batches:
            out = {"media_id": [], "b0": [], "b1": [], "b2": [], "b3": []}
            for mid, buf in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(buf)
                n = y4m_frame_count(raw)
                sums = np.empty(n, dtype=np.int64)
                for f in range(n):
                    px = y4m_extract_frame(raw, f)
                    sums[f] = int(px[:, :, 0].astype(np.int64).sum())
                bits = (sums[1:] > sums[:-1]).astype(np.int64)
                out["media_id"].append(int(mid))
                for j in range(4):
                    out[f"b{j}"].append(
                        int(np.sum(bits[8 * j: 8 * j + 8] << np.arange(8)))
                    )
            yield pd.DataFrame(out)

    hashes = enc.mapInPandas(
        fingerprint, "media_id long, b0 long, b1 long, b2 long, b3 long"
    ).cache()
    hashes.count()

    # lazy return so the plan linter sees the banded-join shape (a
    # checkpointed return lints as an opaque RDD scan); the hash-cache
    # session pin is reclaimed by the bench's between-query
    # CacheManager clear (bench.py force_gc)
    return banded_hamming_pairs(hashes)


@register(
    "pipeline_multimodal_curation",
    f"""
    WITH {_phash_hashes_cte()},
    dropped AS (
      SELECT DISTINCT b.doc_id
      FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
          + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) <= 3
    )
    SELECT CAST(d.w AS INTEGER) AS width, CAST(d.h AS INTEGER) AS height,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN dr.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_survivors,
           CAST(COALESCE(sum(CASE WHEN dr.doc_id IS NULL THEN d.doc_id END), 0)
             AS BIGINT) AS survivor_id_sum
    FROM dims d LEFT JOIN dropped dr ON d.doc_id = dr.doc_id
    GROUP BY d.w, d.h
    """,
)
def pipeline_multimodal_curation(spark, sf_dir):
    """Capstone #3 — the MULTIMODAL curation pipeline (joining the
    pretraining-prep and RAG-retrieval capstones): decode-and-hash every
    image payload (real PNG round trips, mm_image_phash_neardup's exact
    banded LSH), apply the keep-first dedup policy — a document is
    dropped iff it has a near-duplicate with a smaller id — and report
    the curated corpus layout per image geometry: total docs, survivors,
    exact survivor-id checksum. Keep-first is the deliberately simple
    policy here (deterministic, SQL-replayable); the transitive-closure
    canonical pick is the dedup_survivors operator and composes the same
    way.

    100 TB shape: everything up to the pair set is the phash query's
    plan (two Arrow codec hops, tiny hash table, banded join); the
    policy adds one DISTINCT on dropped ids and one broadcast-sized
    anti-join against the id/geometry projection — payload bytes never
    flow past the hash hop."""
    pairs = QUERIES["mm_image_phash_neardup"](spark, sf_dir)
    dropped = pairs.select(F.col("media_b").alias("doc_id")).distinct()
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    g = F.col("doc_id") - F.col("doc_id") % 5
    dims = docs.select(
        "doc_id",
        (F.lit(8) + 8 * (g % 3)).cast("int").alias("width"),
        (F.lit(8) + 8 * (g % 2)).cast("int").alias("height"),
    )
    surv = dims.join(dropped, "doc_id", "left_anti")
    return (
        dims.groupBy("width", "height")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .join(
            surv.groupBy("width", "height").agg(
                F.count("*").cast("bigint").alias("n_survivors"),
                F.sum("doc_id").cast("bigint").alias("survivor_id_sum"),
            ),
            ["width", "height"],
            "left",
        )
        .select(
            "width", "height", "n_docs",
            F.coalesce("n_survivors", F.lit(0)).cast("bigint").alias("n_survivors"),
            F.coalesce("survivor_id_sum", F.lit(0)).cast("bigint")
            .alias("survivor_id_sum"),
        )
    )


@register(
    "phash_cluster_survivors",
    f"""
    WITH RECURSIVE {_phash_hashes_cte()},
    prs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
          + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) <= 3
    ),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM prs
      UNION SELECT id_b, id_a FROM prs
    ),
    nodes AS (SELECT DISTINCT a AS id FROM edges),
    reach(id, r) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT reach.id, e.b FROM reach JOIN edges e ON e.a = reach.r
    ),
    comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
    doomed AS (SELECT id FROM comp WHERE id != component)
    SELECT CAST(d.w AS INTEGER) AS width, CAST(d.h AS INTEGER) AS height,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN dm.id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_survivors,
           CAST(COALESCE(sum(CASE WHEN dm.id IS NULL THEN d.doc_id END), 0)
             AS BIGINT) AS survivor_id_sum
    FROM dims d LEFT JOIN doomed dm ON d.doc_id = dm.id
    GROUP BY d.w, d.h
    """,
)
def phash_cluster_survivors(spark, sf_dir):
    """Image near-dup with EXACT CLUSTER semantics — the transitive-
    closure counterpart to the capstone's keep-first policy: banded
    phash pairs feed the adaptive connected-components operator
    (functions/dedup.py — driver union-find below 1M edges, distributed
    min-label propagation above), the minimum id in each component
    survives as canonical, and the result reports per-geometry
    survivor counts with exact id checksums. The oracle replays the
    closure with a recursive CTE — the same independent ground truth
    dedup_survivors uses for text clusters, now proving the MEDIA
    cluster path.

    100 TB shape: identical to the phash query up to the pair set; the
    CC input contains only actual near-dups (pair-sized, not
    corpus-sized), which is what makes the adaptive driver/distributed
    split safe."""
    from .functions.dedup import connected_components

    pairs = QUERIES["mm_image_phash_neardup"](spark, sf_dir).select(
        F.col("media_a").alias("id_a"), F.col("media_b").alias("id_b")
    )
    comp = connected_components(pairs)
    doomed = comp.filter(F.col("id") != F.col("component")).select("id")
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    g = F.col("doc_id") - F.col("doc_id") % 5
    dims = docs.select(
        "doc_id",
        (F.lit(8) + 8 * (g % 3)).cast("int").alias("width"),
        (F.lit(8) + 8 * (g % 2)).cast("int").alias("height"),
    )
    surv = dims.join(doomed.withColumnRenamed("id", "doc_id"), "doc_id", "left_anti")
    return (
        dims.groupBy("width", "height")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .join(
            surv.groupBy("width", "height").agg(
                F.count("*").cast("bigint").alias("n_survivors"),
                F.sum("doc_id").cast("bigint").alias("survivor_id_sum"),
            ),
            ["width", "height"],
            "left",
        )
        .select(
            "width", "height", "n_docs",
            F.coalesce("n_survivors", F.lit(0)).cast("bigint").alias("n_survivors"),
            F.coalesce("survivor_id_sum", F.lit(0)).cast("bigint")
            .alias("survivor_id_sum"),
        )
    )
