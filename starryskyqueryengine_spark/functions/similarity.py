"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline; random-hyperplane LSH
bucketing as the approximate scale path. Dot products run as built-in
higher-order array expressions (zip_with + aggregate) on doubles — JVM
columnar, no Python UDF in the hot path.

Scale notes (100 TB): brute-force is a broadcast of the (small) query set
against the base table — linear scan, perfectly parallel, no shuffle; the
LSH variant buckets base vectors by sign-pattern so each query probes only
its bucket (candidate reduction ~2^bits), at some recall cost. An IVF
variant would replace the hash with learned centroids — same join shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import md5int


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns via zip_with+aggregate."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def as_double(col: Column) -> Column:
    return col.cast("array<double>")


def brute_force_topk(
    queries: DataFrame,
    base: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the query set, rank per query.

    Ranking uses the similarity ROUNDED to 6 decimals with the id as
    tie-break so the cut is deterministic and engine-portable.
    """
    q = queries.select(
        F.col(id_col).alias("q_id"), as_double(F.col(vec_col)).alias("q_vec")
    )
    b = base.select(
        F.col(id_col).alias("nn_id"), as_double(F.col(vec_col)).alias("b_vec")
    )
    scored = F.broadcast(q).crossJoin(b).select(
        "q_id",
        "nn_id",
        F.round(cosine(F.col("q_vec"), F.col("b_vec")), 6).alias("sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("nn_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "nn_id", "sim")
    )


def hyperplane_signs(vec: Column, table: int, n_bits: int, dim: int) -> Column:
    """Deterministic random-hyperplane sign bucket (bigint bitmask) for
    one LSH table. Hyperplane coefficients are pseudo-random in {-1,+1}
    derived from md5(table:bit:dim-index) — reproducible across engines
    and runs with no RNG state."""
    bits = []
    for j in range(n_bits):
        coeff = F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), _sign_coeff(table, j))
        proj = F.aggregate(
            F.zip_with(vec, coeff, lambda x, s: x * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(
            F.when(proj > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    out = bits[0]
    for t in bits[1:]:
        out = out + t
    return out


def _sign_coeff(table: int, j: int):
    return lambda i: F.when(
        md5int(F.concat(F.lit(f"{table}:{j}:"), i.cast("string"))) % 2 == 0, F.lit(1.0)
    ).otherwise(F.lit(-1.0))


def _with_table_buckets(
    df: DataFrame, vec_field: str, n_tables: int, n_bits: int, dim: int
) -> DataFrame:
    """Explode each vector into (table, bucket) rows — the multi-table
    amplification (OR over tables) that buys recall back from a single
    sign-hash probe."""
    buckets = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                hyperplane_signs(F.col(vec_field), t, n_bits, dim).alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )
    return df.withColumn("tb", F.explode(buckets)).select(
        *df.columns, F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket")
    )


def lsh_topk(
    queries: DataFrame,
    base: DataFrame,
    k: int,
    n_bits: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: multi-table random-hyperplane LSH.

    Each vector lands in ``n_tables`` sign-hash buckets; a pair is a
    candidate if ANY table collides (union amplification). Candidates per
    query shrink ~n_tables/2^n_bits of the base; recall measured against
    brute_force_topk in tests. At cluster scale the base side is written
    bucketed-by(tbl, bucket) so the probe join is co-located, and the
    per-query candidate scan never touches the full base table."""
    q = _with_table_buckets(
        queries.select(
            F.col(id_col).alias("q_id"), as_double(F.col(vec_col)).alias("q_vec")
        ),
        "q_vec",
        n_tables,
        n_bits,
        dim,
    )
    b = _with_table_buckets(
        base.select(
            F.col(id_col).alias("nn_id"), as_double(F.col(vec_col)).alias("b_vec")
        ),
        "b_vec",
        n_tables,
        n_bits,
        dim,
    )
    cands = (
        F.broadcast(q)
        .join(b, ["tbl", "bucket"])
        .select("q_id", "q_vec", "nn_id", "b_vec")
        .dropDuplicates(["q_id", "nn_id"])
    )
    scored = cands.select(
        "q_id",
        "nn_id",
        F.round(cosine(F.col("q_vec"), F.col("b_vec")), 6).alias("sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("nn_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "nn_id", "sim")
    )
