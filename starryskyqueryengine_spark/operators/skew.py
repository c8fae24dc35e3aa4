"""Skew mitigation: deterministic salting for hot keys.

The feed workload is skew-prone by construction — one viral feed key can
hold orders of magnitude more posts than the rest, so a plain
``groupBy('key')`` or a key-equi-join puts a whole hot key into one
reducer task. AQE's skew-join splitting handles the join read side at
runtime; these helpers handle the aggregation side and pre-AQE plans,
with *deterministic* salt (hash of a high-cardinality column, never
rand()) so results are reproducible and replay-safe in streaming.

Both helpers are semantically transparent: output equals the unsalted
formulation exactly (oracle-checkable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 16


def _check_reserved(*column_lists) -> None:
    """Helper-column collisions overwrite user data silently (a _salt
    column would be replaced by the computed salt and dropped from the
    output) — fail fast, the as_of_join contract."""
    clash = {"_salt", "_c"} & {c for cols in column_lists for c in cols}
    if clash:
        raise ValueError(
            f"column name(s) {sorted(clash)} are reserved internally by "
            f"the salting helpers; rename them first"
        )


def salted_count_by_key(
    df: DataFrame,
    key_col: str = "key",
    salt_from: str = "uri",
    n_salt: int = DEFAULT_SALT,
) -> DataFrame:
    """A1 at scale: two-phase count. Phase 1 aggregates (key, salt)
    partials — a hot key fans out over ``n_salt`` reducers; phase 2
    combines the tiny partial table. Identical result to
    ``groupBy(key).count()``."""
    _check_reserved(df.columns, ())
    salted = df.withColumn("_salt", F.pmod(F.hash(F.col(salt_from)), F.lit(n_salt)))
    partial = salted.groupBy(key_col, "_salt").agg(F.count("*").alias("_c"))
    return partial.groupBy(key_col).agg(F.sum("_c").cast("bigint").alias("n"))


def salted_join_skewed_fact(
    fact: DataFrame,
    dim: DataFrame,
    key_col: str,
    salt_from: str,
    n_salt: int = DEFAULT_SALT,
    how: str = "inner",
) -> DataFrame:
    """Skewed fact x small dim equi-join: replicate each dim row
    ``n_salt`` times (explode), salt the fact side deterministically,
    join on (key, salt) — a hot key's rows spread over ``n_salt`` tasks
    instead of one. Row-for-row identical to ``fact.join(dim, key_col)``.

    Only worth it when the dim side is small (replication cost x
    n_salt); for large-large skewed joins rely on AQE skew splitting.
    """
    if n_salt < 1:
        # n_salt=0 would be a silent wrong answer, not an error: pmod(h, 0)
        # NULLs the fact salts while sequence(0, -1) gives the dim salts
        # [0, -1], so the join returns zero rows
        raise ValueError(f"n_salt must be >= 1, got {n_salt}")
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti", "cross"):
        # dim rows are REPLICATED n_salt times: any join type that can
        # emit unmatched dim rows (right/full) would emit each of them
        # n_salt times — silently wrong cardinality, not a salted
        # equivalent of fact.join(dim, key, how)
        raise ValueError(
            f"salted_join_skewed_fact cannot preserve {how!r} semantics: "
            f"unmatched replicated dim rows would appear n_salt times; "
            f"use AQE skew handling for right/full outer joins"
        )
    _check_reserved(fact.columns, dim.columns)
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.hash(F.col(salt_from)), F.lit(n_salt))
    )
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    out = salted_fact.join(replicated_dim, [key_col, "_salt"], how)
    return out.drop("_salt")
