"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, attach the latest right row with ``right.ts <=
left.ts`` within the same partition key (e.g. attribute a purchase to the
user's most recent prior click). Implemented as a composition of existing
DataFrame ops — the union + carry-forward-window trick:

1. union both sides tagged (right rows sort before left on ts ties so an
   equal-timestamp right row matches),
2. one window over (key) ordered by (ts, side, tiebreak) carries the last
   non-null right payload forward,
3. keep left rows.

Cost: ONE shuffle on the partition key and a single sort — no range
explosion, no per-row subquery. This is the scalable shape: a naive
``left.ts >= right.ts`` range join is quadratic per key; here hot keys
cost n log n. (DuckDB's native ASOF JOIN is the oracle in
catalog_sources.py.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    right_payload: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus the latest right payload at
    or before its timestamp (nulls when no prior right row exists).

    ``right`` must be deterministic per (key, ts) — pre-aggregate if the
    source can hold duplicates, or pass ``tiebreak_col`` (a RIGHT-side
    column; the largest value wins among equal (key, ts) right rows,
    NULLs lose) to make the carry order total.
    """
    # the helper columns below would silently overwrite (or ambiguously
    # collide with) identically named user columns — fail fast instead
    reserved = {"_side", "_r", "_c"}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(
            f"as_of_join: column name(s) {sorted(clash)} are reserved "
            f"internally; rename them before joining"
        )
    lcols = [c for c in left.columns]
    rtypes = dict(right.dtypes)
    # carry ONE struct of all payload columns, not each column
    # independently: per-column last(ignorenulls) would stitch values
    # from DIFFERENT right rows whenever a payload field is NULL (a
    # NULL in the latest right row resurrecting a superseded older
    # value). The struct is non-null exactly for right rows, so
    # last(struct, ignorenulls) always carries the latest right row
    # wholesale — NULL fields stay NULL.
    # the tiebreak rides INSIDE the carried struct (appended when not
    # already a payload field): ordering by a bare right column would
    # require unioning it into the left side too, and a left column of
    # the same name would shadow it — as a struct field it is NULL on
    # left rows by construction and needs no extra union column
    struct_fields = list(right_payload)
    if tiebreak_col is not None and tiebreak_col not in struct_fields:
        struct_fields.append(tiebreak_col)
    struct_type = (
        "struct<" + ",".join(f"{p}:{rtypes[p]}" for p in struct_fields) + ">"
    )
    l = left.withColumn("_side", F.lit(1)).withColumn(
        "_r", F.lit(None).cast(struct_type)
    )
    r = (
        right
        # a NULL-ts right row has no position on the timeline: ascending
        # nulls-first would sort it to the partition FRONT, where the
        # carry window hands its payload to every left row that has no
        # genuine prior right row — it must simply not participate
        .filter(F.col(ts_col).isNotNull())
        # JOIN semantics on the key (review r13): Window.partitionBy
        # groups NULL keys into one partition (GROUP BY semantics), so a
        # NULL-key right row's payload was carried onto NULL-key LEFT
        # rows — but this operator is an as-of JOIN, where NULL never
        # equals NULL (DuckDB's native ASOF JOIN, the oracle, matches
        # nothing on NULL keys).  A NULL-key right row can match no left
        # row; NULL-key left rows then fall through with NULL payload.
        .filter(F.col(key_col).isNotNull())
        .select(
            key_col,
            ts_col,
            F.struct(*[F.col(p) for p in struct_fields]).alias("_r"),
        )
        .withColumn("_side", F.lit(0))
    )
    # left-only columns are null-filled (with the left side's types) by
    # allowMissingColumns=True
    unioned = l.unionByName(r, allowMissingColumns=True)

    order = [F.col(ts_col), F.col("_side")]
    if tiebreak_col is not None:
        # struct-field reference: non-null only on right rows, so among
        # equal (key, ts) right rows the LARGEST tiebreak sorts last and
        # wins the carry; left rows (_r NULL) are unaffected.  (The old
        # bare-column reference selected nothing from the right side —
        # every right row carried NULL there, making the "tiebreak" a
        # no-op or an unresolved-column error.)
        order.append(F.col("_r").getField(tiebreak_col).asc_nulls_first())
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*", F.last("_r", ignorenulls=True).over(w).alias("_c")
    )
    out = carried.filter(F.col("_side") == 1).select(
        *lcols,
        *[F.col(f"_c.{p}").alias(f"asof_{p}") for p in right_payload],
    )
    return out
