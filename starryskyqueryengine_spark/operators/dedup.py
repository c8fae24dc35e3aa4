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
from pyspark.sql import functions as F


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
    """PK-dedup inside one batch, DETERMINISTICALLY: the winner is the
    row with the smallest remaining-column tuple (nulls last), so two
    payload variants of one PK resolve identically on every run and
    every partitioning — dropDuplicates alone keeps an arbitrary row,
    which diverges from the reference's stable first-arrival semantics
    (a batch has no arrival order, so the total order stands in)."""
    from pyspark.sql import Window

    keys = list(keys)
    if "_pk_rn" in df.columns:
        # same fail-fast reserved-name contract as asof/rangejoin/skew:
        # withColumn would overwrite the user's column and drop it
        raise ValueError(
            "column name '_pk_rn' is reserved internally by "
            "dedup_within_batch; rename it first"
        )
    # map types are not orderable in Spark ANYWHERE in a sort key —
    # exclude columns containing one at any nesting depth (top-level,
    # array element, struct field); arrays/structs themselves order fine
    rest = [
        c
        for c, t in df.dtypes
        if c not in keys and "map<" not in t
    ]
    if not rest:
        return df.dropDuplicates(keys)
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).asc_nulls_last() for c in rest]
    )
    return (
        df.withColumn("_pk_rn", F.row_number().over(w))
        .filter(F.col("_pk_rn") == 1)
        .drop("_pk_rn")
    )
