"""Multimodal column plumbing: schema, batching, metadata pruning,
frame fan-out, deterministic stub decode."""

import zlib

import pytest
from pyspark.sql import functions as F

from starryskyqueryengine_spark.multimodal import (
    DECODE_SCHEMA,
    decode_media,
    extract_frames,
    resize_images,
    sample_frames,
    synthesize_media,
)
from starryskyqueryengine_spark.sources.fixtures import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return synthesize_media(load_table(spark, SF_DIR, "documents")).cache()


def test_media_schema(media):
    assert dict(media.dtypes)["payload"] == "binary"
    meta_fields = {f.name for f in media.schema["meta"].dataType.fields}
    assert {"media_type", "width", "height", "duration_ms", "byte_len"} <= meta_fields


def test_metadata_consistent_with_payload(media):
    bad = media.filter(F.octet_length("payload") != F.col("meta.byte_len")).count()
    assert bad == 0


def test_decode_deterministic_checksum(spark, media):
    out = decode_media(media)
    assert out.schema == DECODE_SCHEMA
    row = out.join(media, "media_id").select("media_id", "checksum", "payload").first()
    assert row["checksum"] == zlib.crc32(bytes(row["payload"]))


def test_decode_covers_all_rows(media):
    assert decode_media(media).count() == media.count()


def test_resize_only_touches_images(media):
    n_images = media.filter(F.col("meta.media_type") == "image").count()
    out = resize_images(media, 32, 32)
    assert out.count() == n_images
    assert out.filter((F.col("width") != 32) | (F.col("height") != 32)).count() == 0
    # fake resample never grows the payload
    grown = (
        out.join(media, "media_id")
        .filter(F.octet_length(out["payload"]) > F.col("meta.byte_len"))
        .count()
    )
    assert grown == 0


def test_frame_sample_counts(media):
    frames = sample_frames(media, interval_ms=500)
    per_media = frames.groupBy("media_id").count()
    expected = media.filter(F.col("meta.media_type") == "video").select(
        "media_id", (F.col("meta.duration_ms") / 500).cast("long").alias("expected")
    )
    mismatches = per_media.join(expected, "media_id").filter(
        F.col("count") != F.col("expected")
    )
    assert mismatches.count() == 0
    # frame timestamps stride correctly
    assert frames.filter(F.col("frame_ts_ms") != F.col("frame_idx") * 500).count() == 0


def test_frame_sample_is_jvm_side(media):
    """The row-multiplier must not contain a Python evaluation node."""
    plan = sample_frames(media)._jdf.queryExecution().executedPlan().toString()
    assert "Generate explode" in plan or "explode" in plan.lower()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan


def test_extract_frames_payload_window(media):
    frames = extract_frames(media, interval_ms=500)
    assert dict(frames.dtypes)["frame_payload"] == "binary"
    too_big = frames.filter(F.octet_length("frame_payload") > 16).count()
    assert too_big == 0
    assert frames.count() == sample_frames(media, 500).count()


def test_metadata_projection_prunes_payload(spark):
    """Metadata-only projection must never materialize the payload
    column. Uses a different sf dir than the cached module fixture —
    otherwise Spark substitutes the cached InMemoryRelation (which pins
    all columns) into this plan."""
    fresh = synthesize_media(load_table(spark, "/root/testdata/sf0.01", "documents"))
    proj = fresh.select("media_id", "meta.media_type")
    plan = proj._jdf.queryExecution().executedPlan().toString()
    assert "encode(" not in plan  # payload derivation pruned away
    assert "payload" not in plan


def test_frame_sample_short_and_empty_videos(spark):
    """A video shorter than the sample interval still yields its t=0
    frame (floor alone would drop the clip entirely); a zero/absent
    duration yields nothing — and never the [0, -1] pair a bare
    sequence(0, n-1) produces at n=0."""
    from starryskyqueryengine_spark.multimodal import MEDIA_SCHEMA

    rows = [
        (1, b"x", ("video", None, None, 300, None, 1)),   # short -> frame 0
        (2, b"y", ("video", None, None, 1000, None, 1)),  # exactly 2 frames
        (3, b"z", ("video", None, None, 0, None, 1)),     # empty -> none
        (4, b"w", ("video", None, None, None, None, 1)),  # unknown -> none
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = sorted(
        (r["media_id"], r["frame_idx"]) for r in sample_frames(df, 500).collect()
    )
    assert got == [(1, 0), (2, 0), (2, 1)]


# -- real PPM codec ---------------------------------------------------------

def test_ppm_roundtrip_exact():
    import numpy as np
    from starryskyqueryengine_spark.multimodal import ppm_decode, ppm_encode

    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, size=(13, 7, 3), dtype=np.uint8)
    w, h, back = ppm_decode(ppm_encode(a))
    assert (w, h) == (7, 13)
    assert np.array_equal(back, a)


def test_ppm_decode_tolerates_comments_and_whitespace():
    import numpy as np
    from starryskyqueryengine_spark.multimodal import ppm_decode

    raw = b"P6 # a comment\n# another\n  2\t1 \n255\n" + bytes(range(6))
    w, h, px = ppm_decode(raw)
    assert (w, h) == (2, 1)
    assert px.tolist() == [[[0, 1, 2], [3, 4, 5]]]


def test_ppm_decode_rejects_malformed():
    import pytest
    from starryskyqueryengine_spark.multimodal import ppm_decode, ppm_encode
    import numpy as np

    good = ppm_encode(np.zeros((2, 2, 3), dtype=np.uint8))
    for bad in [b"JFIF....", b"P6\n2 2\n255\n" + b"\x00" * 5, b"P6\n2", good[:-1]]:
        with pytest.raises(ValueError):
            ppm_decode(bad)


def test_ppm_resize_nn_matches_reference():
    import numpy as np
    from starryskyqueryengine_spark.multimodal import ppm_resize_nn

    rng = np.random.default_rng(5)
    a = rng.integers(0, 256, size=(9, 16, 3), dtype=np.uint8)
    out = ppm_resize_nn(a, 4, 3)
    assert out.shape == (3, 4, 3)
    for y in range(3):
        for x in range(4):
            sy = min(int((y + 0.5) * 9 / 3), 8)
            sx = min(int((x + 0.5) * 16 / 4), 15)
            assert np.array_equal(out[y, x], a[sy, sx])
    # identity resize is exact
    assert np.array_equal(ppm_resize_nn(a, 16, 9), a)


def test_resize_images_real_path_for_ppm(spark):
    """A PPM payload through resize_images comes back as a VALID PPM of
    the target dims with nearest-neighbor pixels (not a truncation)."""
    import numpy as np
    from pyspark.sql import Row
    from starryskyqueryengine_spark.multimodal import (
        ppm_decode, ppm_encode, ppm_resize_nn, resize_images,
    )

    rng = np.random.default_rng(11)
    a = rng.integers(0, 256, size=(8, 12, 3), dtype=np.uint8)
    from starryskyqueryengine_spark.multimodal import MEDIA_SCHEMA
    df = spark.createDataFrame(
        [Row(media_id=1, payload=bytearray(ppm_encode(a)),
             meta=Row(media_type="image", width=12, height=8,
                      duration_ms=None, sample_rate=None, byte_len=None))],
        schema=MEDIA_SCHEMA,
    )
    out = resize_images(df, 6, 4).collect()
    assert len(out) == 1
    w, h, px = ppm_decode(bytes(out[0]["payload"]))
    assert (w, h) == (6, 4) and (out[0]["width"], out[0]["height"]) == (6, 4)
    assert np.array_equal(px, ppm_resize_nn(a, 6, 4))


def test_decode_media_sniffs_ppm(spark):
    """decode_media: PPM payloads yield pixel stats from the REAL codec;
    non-PPM payloads keep the deterministic fake path."""
    import numpy as np
    import zlib
    from pyspark.sql import Row
    from starryskyqueryengine_spark.multimodal import decode_media, ppm_encode

    a = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    rows = [
        Row(media_id=1, payload=bytearray(ppm_encode(a)),
            meta=Row(media_type="image", width=4, height=2,
                     duration_ms=None, sample_rate=None, byte_len=None)),
        Row(media_id=2, payload=bytearray(b"plain text payload"),
            meta=Row(media_type="text", width=None, height=None,
                     duration_ms=None, sample_rate=None, byte_len=18)),
    ]
    from starryskyqueryengine_spark.multimodal import MEDIA_SCHEMA
    got = {r["media_id"]: r
           for r in decode_media(spark.createDataFrame(rows, schema=MEDIA_SCHEMA)).collect()}
    assert got[1]["checksum"] == zlib.crc32(a.tobytes())
    assert got[1]["mean_byte"] == float(np.arange(24).sum()) / 24
    raw = b"plain text payload"
    assert got[2]["checksum"] == zlib.crc32(raw)
    assert got[2]["mean_byte"] == sum(raw) / len(raw)


def test_image_ahash_brightness_invariance_and_banding(spark):
    """mm_image_phash_neardup building blocks: (a) the integer aHash is
    EXACTLY invariant under a uniform brightness shift (the scale-free
    64*box_sum > total compare), (b) a sparse perturbation moves the
    hash only a few bits, and (c) banded candidates + popcount<=3 verify
    equals the brute-force pair set (pigeonhole: <=3 differing bits over
    4 bands forces one identical band)."""
    import numpy as np

    def ahash_bands(a):
        h, w = a.shape
        s = a.astype(np.int64).reshape(8, h // 8, 8, w // 8).sum(axis=(1, 3))
        bits = (64 * s > s.sum()).reshape(-1)
        return [int(np.sum(bits[16 * j: 16 * j + 16] << np.arange(16)))
                for j in range(4)]

    rng = np.random.RandomState(7)
    base = rng.randint(0, 240, size=(16, 24)).astype(np.uint8)
    shifted = (base + 9).astype(np.uint8)  # uniform brightness, no clip
    assert ahash_bands(base) == ahash_bands(shifted)

    perturbed = base.copy().reshape(-1)
    perturbed[::97] = np.minimum(perturbed[::97] + 5, 255)
    perturbed = perturbed.reshape(16, 24)
    ham = sum(bin(a ^ b).count("1")
              for a, b in zip(ahash_bands(base), ahash_bands(perturbed)))
    assert ham <= 8  # sparse sparkle: small movement, not a rehash

    # (c) banding completeness on a random corpus
    imgs = [rng.randint(0, 256, size=(16, 16)).astype(np.uint8) for _ in range(60)]
    hashes = [ahash_bands(im) for im in imgs]
    brute = {
        (i, j)
        for i in range(60) for j in range(i + 1, 60)
        if sum(bin(a ^ b).count("1") for a, b in zip(hashes[i], hashes[j])) <= 3
    }
    banded = {
        (i, j)
        for i in range(60) for j in range(i + 1, 60)
        if any(hashes[i][k] == hashes[j][k] for k in range(4))
        and sum(bin(a ^ b).count("1") for a, b in zip(hashes[i], hashes[j])) <= 3
    }
    assert banded == brute


def test_banded_hamming_pairs_guard_and_equivalence(spark):
    """functions/fingerprint.py: the helper refuses thresholds past the
    pigeonhole bound (banding would MISS pairs) and matches brute force
    on a random hash table at the bound."""
    import random

    import pytest as _pytest

    from starryskyqueryengine_spark.functions.fingerprint import (
        banded_hamming_pairs,
    )

    rng = random.Random(5)
    rows = []
    for i in range(40):
        base = [(i // 4) * 7919 % (1 << 16) for _ in range(4)]
        # perturb 0-3 random bits so planted groups of 4 sit at small
        # Hamming distances while distinct groups sit far apart
        for _ in range(rng.randrange(4)):
            k = rng.randrange(4)
            base[k] ^= 1 << rng.randrange(16)
        rows.append((i, *base))
    df = spark.createDataFrame(
        rows, "media_id long, b0 long, b1 long, b2 long, b3 long"
    ).cache()
    got = {
        (r["media_a"], r["media_b"], r["hamming"])
        for r in banded_hamming_pairs(df).collect()
    }

    def pop(x):
        return bin(x).count("1")

    brute = set()
    for i in range(40):
        for j in range(i + 1, 40):
            h = sum(pop(rows[i][k + 1] ^ rows[j][k + 1]) for k in range(4))
            if h <= 3:
                brute.add((i, j, h))
    assert got == brute and brute  # non-vacuous

    with _pytest.raises(ValueError, match="pigeonhole"):
        banded_hamming_pairs(df, max_hamming=4)


def test_banded_hamming_pairs_signed_narrow_bands(spark):
    """Review r12: bit_count sign-extends narrow integral types, so two
    SIGNED smallint bands differing only in the sign bit read 49 bits
    apart instead of 1 — and a true near-dup pair was silently excluded.
    The XOR must popcount at the band's storage width."""
    from starryskyqueryengine_spark.functions.fingerprint import (
        banded_hamming_pairs,
    )

    # ids 1/2: identical except b0's sign bit (true hamming 1, and
    # b1-b3 identical so banding surfaces the candidate);
    # ids 3/4: differ in 5 bits across bands -> beyond the bound, out.
    df = spark.createDataFrame(
        [
            (1, -32768, 7, 9, 11),   # b0 = 0x8000 as signed smallint
            (2, 0, 7, 9, 11),
            (3, 31, 7, 9, 11),
            (4, 0, 7, 9, 11),
        ],
        "media_id long, b0 smallint, b1 smallint, b2 smallint, b3 smallint",
    ).cache()
    got = {
        (r["media_a"], r["media_b"], r["hamming"])
        for r in banded_hamming_pairs(df).collect()
    }
    assert (1, 2, 1) in got, got  # was excluded under sign extension
    assert not any(a == 3 or b == 3 for a, b, _ in got)
