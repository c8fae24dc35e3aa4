"""Bucketed-table layout: shuffle-free co-located joins for repeated
big-big joins on a stable key.

Scale rationale (the 100 TB story): a fact-fact join (e.g. orders x
lineitem on orderkey, or the post store x an enrichment table on uri)
shuffles BOTH sides every run. Writing the tables bucketed by the join key
with the same bucket count makes the join's children already
hash-partitioned: Catalyst plans a SortMergeJoin with NO Exchange on
either side, so re-joining costs a local sort (or nothing, with sortBy)
instead of a full network shuffle of 100 TB. The same layout serves every
later join/aggregation on that key.

No reference analog (SQLite has a rowid PK, no layout control) — this is
the Spark-native equivalent of the reference's PK(uri,key) access path
(src/db/migrations.ts:13-22) generalized to analytic joins.

Spark specifics: ``bucketBy`` requires ``saveAsTable`` (the bucketing
metadata lives in the session catalog); plain ``parquet(path)`` writes
would silently drop bucket info. Readers must come through
``spark.table``.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Optional[Sequence[str]] = None,
    path: Optional[str] = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed (and per-file sorted) by the join key.

    ``sort_cols`` defaults to ``bucket_cols``: sorted single-file buckets
    let SortMergeJoin skip its sort too, leaving a pure zip-merge.
    """
    if num_buckets <= 0:
        raise ValueError(f"num_buckets must be positive, got {num_buckets}")
    cols = list(bucket_cols)
    if not cols:
        raise ValueError("bucket_cols must be non-empty")
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, cols[0], *cols[1:])
    )
    # sort_cols=None -> default to the bucket key; an explicit empty
    # sequence -> bucketed-but-unsorted (no sortBy clause at all)
    sort = list(sort_cols) if sort_cols is not None else cols
    if sort:
        writer = writer.sortBy(sort[0], *sort[1:])
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.

    With matching bucket counts Catalyst's EnsureRequirements sees both
    children already partitioned by ``on`` and inserts no Exchange — the
    plan-shape test asserts this.
    """
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, list(on), how)
