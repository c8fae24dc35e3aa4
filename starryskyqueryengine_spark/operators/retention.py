"""Retention eviction (T3/W7) and refresh delete (T4).

Reference: when a key's row count exceeds ``limitCount``, the oldest rows
beyond the cap are deleted (``src/subscription.ts:379-393``); a positive
``refresh`` drops the N newest rows to force re-fetch, ``-1`` drops all
(``src/subscription.ts:146-158``).

Spark-first: both are a ``row_number`` window partitioned by ``key`` —
one shuffle on the partition key, done map-side-light by Tungsten; the
store then rewrites only affected key partitions (see store.PostStore).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _ranked(df: DataFrame, key_col: str, ts_col: str, cid_col: str) -> DataFrame:
    if "_rn" in df.columns:
        # withColumn would silently overwrite (and drop("_rn") then
        # remove) a user column of the same name — the fail-fast
        # contract shared with asof/rangejoin/skew
        raise ValueError(
            "column name '_rn' is reserved internally by retention "
            "operators; rename it first"
        )
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).desc(), F.col(cid_col).desc())
    )
    return df.withColumn("_rn", F.row_number().over(w))


def retain_latest(
    df: DataFrame,
    limit_count,
    key_col: str = "key",
    ts_col: str = "indexedAt",
    cid_col: str = "cid",
) -> DataFrame:
    """T3: keep the newest ``limit_count`` rows per key, evict the rest.

    ``limit_count`` is an int applied to all keys, or a mapping-like
    small DataFrame column join can be used by passing a Column.
    """
    ranked = _ranked(df, key_col, ts_col, cid_col)
    limit_col = limit_count if not isinstance(limit_count, int) else F.lit(limit_count)
    return ranked.filter(F.col("_rn") <= limit_col).drop("_rn")


def refresh_delete(
    df: DataFrame,
    refresh: int,
    key: str,
    key_col: str = "key",
    ts_col: str = "indexedAt",
    cid_col: str = "cid",
) -> DataFrame:
    """T4: drop the ``refresh`` newest rows for ``key`` (re-fetch window);
    ``refresh == -1`` drops every row for the key."""
    # null-safe inequality: `col != key` is NULL (filtered out) for a
    # NULL key column, so plain != would delete every NULL-key row as
    # collateral of refreshing an unrelated feed
    not_target = ~F.col(key_col).eqNullSafe(F.lit(key))
    if refresh == -1:
        return df.filter(not_target)
    ranked = _ranked(df, key_col, ts_col, cid_col)
    return ranked.filter(not_target | (F.col("_rn") > refresh)).drop("_rn")
