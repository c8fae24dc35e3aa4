"""SCD Type-2 (operators/scd.py): the incremental upsert folded over
chronological batches must equal the one-shot rebuild on the full
stream; late events are rejected (strict) or dropped (non-strict)."""

import random

import pytest
from pyspark.sql import functions as F

from starryskyqueryengine_spark.operators.scd import scd2_rebuild, scd2_upsert


def _events(spark, rows):
    return spark.createDataFrame(rows, "key string, ts_us bigint, val string")


def _norm(df):
    return sorted(tuple(r) for r in df.collect())


def _random_stream(seed, n_keys=6, n_events=120):
    rng = random.Random(seed)
    used = set()
    rows = []
    for _ in range(n_events):
        k = f"k{rng.randrange(n_keys)}"
        while True:
            t = rng.randrange(1, 10_000)
            if (k, t) not in used:
                used.add((k, t))
                break
        rows.append((k, t, rng.choice("ABC")))
    return rows


@pytest.mark.parametrize("seed", [1, 7])
def test_fold_equals_rebuild(spark, seed):
    rows = _random_stream(seed)
    full = scd2_rebuild(_events(spark, rows))

    # split into 3 chronological chunks (global ts order ⇒ per-key order)
    rows.sort(key=lambda r: r[1])
    cuts = [len(rows) // 3, 2 * len(rows) // 3]
    chunks = [rows[: cuts[0]], rows[cuts[0]: cuts[1]], rows[cuts[1]:]]

    hist = scd2_rebuild(_events(spark, chunks[0]))
    for chunk in chunks[1:]:
        hist = scd2_upsert(hist, _events(spark, chunk))
    assert _norm(hist) == _norm(full)


def test_upsert_semantics_unit(spark):
    hist = scd2_rebuild(
        _events(spark, [("a", 10, "X"), ("a", 20, "Y"), ("b", 10, "X")])
    )
    # unchanged value extends the current interval (no new row); a real
    # change closes it; a brand-new key opens history
    hist2 = scd2_upsert(
        hist,
        _events(spark, [("a", 30, "Y"), ("a", 40, "Z"), ("c", 5, "Q")]),
    )
    got = {(r["key"], r["attr_value"]): (r["valid_from_us"], r["valid_to_us"], r["is_current"])
           for r in hist2.collect()}
    assert got[("a", "X")] == (10, 20, False)
    assert got[("a", "Y")] == (20, 40, False)   # extended by ts=30, closed at 40
    assert got[("a", "Z")] == (40, None, True)
    assert got[("b", "X")] == (10, None, True)
    assert got[("c", "Q")] == (5, None, True)
    assert len(got) == 5


def test_late_event_strict_raises_nonstrict_drops(spark):
    hist = scd2_rebuild(_events(spark, [("a", 100, "X")]))
    late = _events(spark, [("a", 50, "Y")])
    with pytest.raises(ValueError, match="not strictly after"):
        scd2_upsert(hist, late)
    dropped = scd2_upsert(hist, late, strict=False)
    assert _norm(dropped) == _norm(hist)


def test_catalog_query_matches_operator(spark):
    """The oracle-checked catalog query is this operator inlined — pin
    the equivalence on the real fixture tables."""
    from starryskyqueryengine_spark.catalog import get_queries
    from starryskyqueryengine_spark.sources.fixtures import load_table

    sf = "/root/testdata/sf0.001"
    q = get_queries()["scd2_priority_history"](spark, sf)
    o = load_table(spark, sf, "orders")
    ev = (
        o.groupBy(
            F.col("o_custkey").cast("string").alias("key"),
            F.col("o_orderdate").alias("ts"),
        )
        .agg(F.min_by("o_orderpriority", "o_orderkey").alias("val"))
        .select(
            "key",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            "val",
        )
    )
    op = scd2_rebuild(ev).withColumn("key", F.col("key").cast("bigint"))
    got = sorted(
        (r["key"], r["attr_value"], r["valid_from_us"], r["valid_to_us"], r["is_current"])
        for r in op.collect()
    )
    want = sorted(
        (r["custkey"], r["attr_value"], r["valid_from_us"], r["valid_to_us"], r["is_current"])
        for r in q.collect()
    )
    assert got == want


def test_null_attribute_values_are_real_changes(spark):
    """NULL is a legitimate attribute value: A -> NULL -> A must yield
    THREE intervals (the NULL period must not vanish into two adjacent
    A intervals), in both the rebuild and the folded upsert."""
    rows = [("k", 10, "A"), ("k", 20, None), ("k", 30, "A")]
    want = sorted(
        [
            ("k", "A", 10, 20, False),
            ("k", None, 20, 30, False),
            ("k", "A", 30, None, True),
        ]
    , key=lambda t: t[2])
    got = sorted(
        (tuple(r) for r in scd2_rebuild(_events(spark, rows)).collect()),
        key=lambda t: t[2],
    )
    assert got == want

    hist = scd2_rebuild(_events(spark, rows[:1]))
    for chunk in ([rows[1]], [rows[2]]):
        hist = scd2_upsert(hist, _events(spark, chunk))
    assert sorted((tuple(r) for r in hist.collect()), key=lambda t: t[2]) == want


def test_null_first_event_and_no_change_merge(spark):
    """A key whose FIRST value is NULL still opens an interval, and a
    repeated NULL is a non-change (merged), null-safely."""
    rows = [("k", 10, None), ("k", 20, None), ("k", 30, "B")]
    got = sorted(
        (tuple(r) for r in scd2_rebuild(_events(spark, rows)).collect()),
        key=lambda t: t[2],
    )
    assert got == [
        ("k", None, 10, 30, False),
        ("k", "B", 30, None, True),
    ]
