"""Slowly-Changing-Dimension Type 2: full rebuild + incremental upsert.

SCD2 keeps a dimension attribute's full history as validity intervals
``[valid_from, valid_to)`` with an ``is_current`` flag — the standard
warehouse pattern for "what was this customer's segment when the order
shipped?".  The reference engine stores only latest-state rows
(src/db/schema.ts — single-row-per-key tables with no history); this
module is north-star warehouse surface on top of the same upsert seam.

Two forms, equivalence-tested against each other (tests/test_scd.py):

- :func:`scd2_rebuild` — collapse a complete change-event stream into
  history in one shot (the batch/backfill path; the oracle-checked
  catalog query ``scd2_priority_history`` is this form inlined).
- :func:`scd2_upsert` — apply ONE new chronologically-later event batch
  to stored history.  Work is O(affected keys' current rows + batch),
  never O(history): closed intervals are immutable and are not read,
  exactly the property that makes SCD2 cheap to maintain at 100 TB —
  each micro-batch touches the current-row slice of the keys it names
  (pair with TxnLogFormat.merge for file-granular persistence).

Both are pure DataFrame transformations: one shuffle on the dimension
key, window passes sharing that single sort, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HIST_COLS = ["attr_value", "valid_from_us", "valid_to_us", "is_current"]


def scd2_rebuild(
    events: DataFrame, key: str = "key", ts: str = "ts_us", val: str = "val"
) -> DataFrame:
    """Collapse change events (one row per (key, ts), ts strictly
    increasing per key) into SCD2 history.  lag() keeps only genuine
    value changes, lead() closes each interval at the next change; both
    windows share one (key × ts) sort."""
    w = Window.partitionBy(key).orderBy(ts)
    # NULL is a legitimate attribute value, so change detection must be
    # null-safe: `val != prev` evaluates to NULL (dropped) for any NULL
    # endpoint, which would both erase transitions INTO a NULL period
    # and rely on `_prev IS NULL` to mis-keep the row after it — history
    # like A, NULL, A would collapse to two adjacent A intervals.  The
    # first row per key therefore needs an explicit marker instead of
    # `_prev IS NULL`.
    chg = (
        events.select(key, ts, val)
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_prev", F.lag(val).over(w))
        .filter(
            (F.col("_rn") == 1) | ~F.col(val).eqNullSafe(F.col("_prev"))
        )
        .drop("_rn")
    )
    hist = chg.withColumn("valid_to_us", F.lead(ts).over(w))
    return hist.select(
        F.col(key).alias(key),
        F.col(val).alias("attr_value"),
        F.col(ts).alias("valid_from_us"),
        "valid_to_us",
        F.col("valid_to_us").isNull().alias("is_current"),
    )


def scd2_upsert(
    history: DataFrame,
    batch: DataFrame,
    key: str = "key",
    ts: str = "ts_us",
    val: str = "val",
    strict: bool = True,
) -> DataFrame:
    """Apply one event batch to stored SCD2 history.

    Assumes the batch is chronologically AFTER stored history for every
    key it touches (the incremental-ingest invariant).  With
    ``strict=True`` a late event — batch ts ≤ the key's current
    valid_from — raises ``ValueError`` (one count aggregate over the
    batch, cheap); with ``strict=False`` late events are dropped.

    Plan shape: the key's CURRENT row is re-opened as a seed, unioned
    with the batch, and the rebuild's change/close windows run over that
    seed+batch slice only.  Closed intervals pass through untouched —
    never read, never shuffled.  Folding chronological batches through
    this function is provably identical to :func:`scd2_rebuild` on the
    concatenated stream (pinned by tests/test_scd.py)."""
    bkeys = batch.select(key).distinct()
    cur = history.filter(F.col("is_current")).join(bkeys, key, "left_semi")

    late = (
        batch.join(
            cur.select(key, F.col("valid_from_us").alias("_cur_from")), key
        )
        .filter(F.col(ts) <= F.col("_cur_from"))
    )
    if strict:
        n_late = late.count()
        if n_late:
            raise ValueError(
                f"scd2_upsert: {n_late} batch event(s) not strictly after "
                "the stored current interval; rebuild instead or pass "
                "strict=False to drop them"
            )
        clean = batch
    else:
        clean = batch.join(
            cur.select(key, F.col("valid_from_us").alias("_cur_from")),
            key,
            "left",
        ).filter(
            F.col("_cur_from").isNull() | (F.col(ts) > F.col("_cur_from"))
        ).select(key, ts, val)

    seed = cur.select(
        key,
        F.col("valid_from_us").alias(ts),
        F.col("attr_value").alias(val),
        F.lit(True).alias("_seed"),
    )
    combined = seed.unionByName(
        clean.select(key, ts, val).withColumn("_seed", F.lit(False))
    )
    w = Window.partitionBy(key).orderBy(ts)
    # same null-safe change detection as scd2_rebuild: the seed (or the
    # genuinely first event for a brand-new key) is kept by marker, and
    # a transition to/from NULL is a real change
    chg = (
        combined.withColumn("_rn", F.row_number().over(w))
        .withColumn("_prev", F.lag(val).over(w))
        .filter(
            F.col("_seed")
            | (F.col("_rn") == 1)
            | ~F.col(val).eqNullSafe(F.col("_prev"))
        )
        .drop("_rn")
    )
    fresh = chg.withColumn("valid_to_us", F.lead(ts).over(w)).select(
        F.col(key),
        F.col(val).alias("attr_value"),
        F.col(ts).alias("valid_from_us"),
        "valid_to_us",
        F.col("valid_to_us").isNull().alias("is_current"),
    )
    untouched = history.join(
        cur.select(key, "valid_from_us"), [key, "valid_from_us"], "left_anti"
    )
    # name-list joins hoist the using-columns to the front; restore the
    # canonical history column order so folds compose cleanly
    order = [key, "attr_value", "valid_from_us", "valid_to_us", "is_current"]
    return untouched.select(order).unionByName(fresh.select(order))
