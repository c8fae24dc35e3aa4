"""PK-dedup upsert building blocks (J2/J3/S8).

The reference deduplicates twice: a linear-scan membership test against
already-stored URIs during ingest (``src/subscription.ts:172-178,274-278``)
and ``INSERT ... ON CONFLICT DO NOTHING`` on PK(uri, key) at the sink
(``src/subscription.ts:362-366``). Spark-first this is a left-anti join on
the key columns — per-key it stays a cheap shuffle (or broadcast when the
incoming batch is small, which AQE decides at runtime).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def new_rows_anti_join(
    incoming: DataFrame,
    stored: DataFrame,
    keys: list[str] = ("uri", "key"),
) -> DataFrame:
    """Rows of ``incoming`` whose PK is not present in ``stored``.

    Select only the join keys on the build side so the scan prunes to the
    key columns (column pruning reaches the Parquet reader).
    """
    keys = list(keys)
    return incoming.join(stored.select(*keys), keys, "left_anti")


def dedup_within_batch(df: DataFrame, keys: list[str] = ("uri", "key")) -> DataFrame:
    """PK-dedup inside one batch (first occurrence wins, like ON CONFLICT
    DO NOTHING applied row-by-row)."""
    return df.dropDuplicates(list(keys))
