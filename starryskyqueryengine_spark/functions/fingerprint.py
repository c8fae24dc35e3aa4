"""Shared banded-Hamming machinery for perceptual-fingerprint dedup.

The image (aHash), audio (energy contour), and video (luma contour)
near-dup queries all reduce to the same exact algorithm once a
fixed-width integer fingerprint exists per item: split it into B bands,
equi-join items sharing any (band_idx, band_value), verify candidates
with a popcount over the XOR of all bands, and keep pairs at Hamming
distance <= B - 1. By pigeonhole, <= B-1 differing bits across B bands
force at least one identical band, so the banded candidate set provably
contains EVERY qualifying pair — the plan is exact, never approximate,
while candidates stay sub-quadratic (same contract as the MinHash/
SimHash banding in functions/dedup.py).

100 TB shape: the input is a skinny (id, B smallints) table — ~20 bytes
a row regardless of payload size; the band self-join shuffles that, the
verify re-joins it twice, and everything is whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def banded_hamming_pairs(
    hashes: DataFrame,
    id_col: str = "media_id",
    band_cols: tuple = ("b0", "b1", "b2", "b3"),
    max_hamming: int | None = None,
) -> DataFrame:
    """(id_a, id_b, hamming) for every pair within ``max_hamming``
    (default: n_bands - 1, the largest threshold the pigeonhole
    guarantee covers). ``hashes`` should already be materialized
    (cached) by the caller — it feeds three plan branches."""
    n_bands = len(band_cols)
    if max_hamming is None:
        max_hamming = n_bands - 1
    if max_hamming > n_bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the pigeonhole bound "
            f"{n_bands - 1} for {n_bands} bands: banding would MISS pairs"
        )
    # project to (id, bands) FIRST: callers may pass the hash table with
    # extra columns still attached (e.g. the binary payload the hashes
    # came from) — without this the verify joins dragged every column
    # through the shuffle twice (review r9)
    hashes = hashes.select(id_col, *band_cols)
    bands = hashes.select(
        id_col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("band_idx"),
                    F.col(c).alias("band_val"),
                )
                for j, c in enumerate(band_cols)
            ])
        ).alias("band"),
    ).select(id_col, "band.band_idx", "band.band_val")
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("media_a"),
            F.col(f"b.{id_col}").alias("media_b"),
        )
        .distinct()
    )
    ha = hashes.select(*[F.col(c).alias(f"a_{c}") for c in hashes.columns])
    hb = hashes.select(*[F.col(c).alias(f"b_{c}") for c in hashes.columns])
    # popcount at the band's STORAGE width (review r12): bit_count
    # sign-extends narrow integral types to 64 bits, so two signed
    # smallint bands whose sign bits differ would read hamming + 48
    # phantom bits and a true near-dup pair would be silently EXCLUDED
    # — breaking the exactness guarantee.  Masking the XOR to the
    # type's width restores the real bit distance; 64-bit bands (all
    # in-repo callers) pass through untouched.
    masks = {"tinyint": 0xFF, "smallint": 0xFFFF, "int": 0xFFFFFFFF}
    dtypes = dict(hashes.dtypes)

    def _band_distance(c: str):
        x = F.col(f"a_{c}").bitwiseXOR(F.col(f"b_{c}"))
        m = masks.get(dtypes[c])
        if m is not None:
            x = x.cast("long").bitwiseAND(F.lit(m))
        return F.bit_count(x)

    hamming = sum(_band_distance(c) for c in band_cols)
    return (
        cand.join(ha, cand.media_a == F.col(f"a_{id_col}"))
        .join(hb, cand.media_b == F.col(f"b_{id_col}"))
        .withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("media_a", "media_b", "hamming")
    )
