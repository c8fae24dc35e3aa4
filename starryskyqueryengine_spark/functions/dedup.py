"""Deduplication operators for training-data pipelines.

Exact dedup, n-gram Jaccard near-dup, MinHash+LSH, SimHash — all as
declarative DataFrame plans built from higher-order array functions
(transform/aggregate/array_min), no Python UDFs. Hashing is engine-
portable: base hash = first 8 hex digits of md5 as a bigint, identical in
Spark (``conv(substr(md5(x),1,8),16,10)``) and DuckDB (hex-digit
arithmetic), so every stage has an exact SQL oracle.

Scale notes (100 TB): the LSH path is the production path — candidate
generation is an equi-join on (band, signature) buckets, which shuffles
once on the bucket key and never materializes the quadratic pair space.
The exact pairwise Jaccard here exists as the oracle/baseline and for
verifying candidates, applied only to the (tiny) candidate set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- engine-portable hashing constants (mirrored into oracle SQL) --------

MERSENNE_P = 4294967291  # largest prime < 2^32
NUM_HASHES = 16
LSH_BANDS = 4
LSH_ROWS = 4  # NUM_HASHES = LSH_BANDS * LSH_ROWS
assert NUM_HASHES == LSH_BANDS * LSH_ROWS

# a_i (odd) and b_i < 2^20 so a*h + b < 2^52: exact in BIGINT and DOUBLE,
# no ANSI overflow. Deterministic formula — same list feeds the SQL oracle.
MINHASH_A = [(((i + 1) * 2654435761) % 1048573) | 1 for i in range(NUM_HASHES)]
MINHASH_B = [((i + 1) * 40503) % 1048573 for i in range(NUM_HASHES)]

SHINGLE_N = 3


def md5int(col: Column) -> Column:
    """First 32 bits of md5 as bigint — portable base hash."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def words_col(text: Column) -> Column:
    return F.split(F.trim(F.lower(text)), r"\s+")


def shingles_expr(words_field: str = "_w", n: int = SHINGLE_N) -> Column:
    """Distinct word n-gram shingles from an array column (empty when the
    doc has fewer than n words)."""
    return F.expr(
        f"CASE WHEN size({words_field}) >= {n} THEN "
        f"array_distinct(transform(sequence(0, size({words_field}) - {n}), "
        f"i -> concat_ws(' ', slice({words_field}, i + 1, {n})))) "
        f"ELSE array() END"
    )


def with_shingles(df: DataFrame, text_col: str = "text", out: str = "shingles") -> DataFrame:
    return (
        df.withColumn("_w", words_col(F.col(text_col)))
        .withColumn(out, shingles_expr("_w"))
        .drop("_w")
    )


def shingle_hashes(shingle_col: str = "shingles") -> Column:
    """array<bigint> of base hashes, one per distinct shingle."""
    return F.transform(F.col(shingle_col), lambda s: md5int(s))


def _affine_mod(a: int, b: int):
    # closure factory: pyspark's higher-order fns inspect lambda arity, so
    # default-arg captures (lambda h, a=a: ...) would be misread as 2-ary
    return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MERSENNE_P)


def minhash_signature(hash_col: str = "_sh_hash") -> Column:
    """array<bigint> MinHash signature of length NUM_HASHES."""
    sig = [
        F.array_min(F.transform(F.col(hash_col), _affine_mod(a, b)))
        for a, b in zip(MINHASH_A, MINHASH_B)
    ]
    return F.array(*sig)


def minhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, shingles, sig) for docs with at least one shingle."""
    return (
        with_shingles(df.select(id_col, text_col), text_col)
        .filter(F.size("shingles") > 0)
        .withColumn("_sh_hash", shingle_hashes())
        .withColumn("sig", minhash_signature())
        .drop("_sh_hash")
    )


def lsh_candidate_pairs(sigs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """MinHash-LSH banding: same signature in any band -> candidate pair.

    One explode (BANDS rows/doc) + one shuffle on (band, band_sig); the
    self-join happens inside buckets only. Distinct de-dups pairs caught
    by multiple bands.
    """
    bands = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "-",
                            *[
                                F.col("sig")[b * LSH_ROWS + r].cast("string")
                                for r in range(LSH_ROWS)
                            ],
                        ).alias("band_sig"),
                    )
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.band_sig")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame, shingled: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Exact Jaccard on candidate pairs (applied to candidates only —
    never the quadratic pair space)."""
    sh = shingled.select(F.col(id_col), F.col("shingles"))
    a = sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("shingles", "sh_a")
    b = sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("shingles", "sh_b")
    joined = pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("bigint")
    union = (F.size("sh_a") + F.size("sh_b")).cast("bigint") - inter
    return joined.select(
        "id_a",
        "id_b",
        F.round(inter / F.greatest(union, F.lit(1)), 6).alias("jaccard"),
    )


def simhash_from_hashes(hash_col: Column) -> Column:
    """32-bit SimHash from an array<bigint> of feature hashes: bit j is
    set when the majority of feature hashes have bit j set (ties -> 0).
    Pure array expressions — no UDF."""
    def vote(j: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bit_terms = [
        F.when(
            F.aggregate(hash_col, F.lit(0).cast("long"), vote(j)) > 0,
            F.lit(1 << j).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for j in range(32)
    ]
    sig = bit_terms[0]
    for t in bit_terms[1:]:
        sig = sig + t
    return sig


def simhash_pairs(sigs: DataFrame, max_hamming: int, id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs by Hamming distance on the 32-bit signature.

    Pairwise here (fixture-sized); the scale path buckets by signature
    bytes (4 bands of 8 bits — any identical band is a candidate),
    mirroring the MinHash LSH join shape.
    """
    a = sigs.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("h_a"))
    b = sigs.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("h_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).cast("bigint")
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
