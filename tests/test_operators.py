"""Tests for top-k, keyset pagination, retention, dedup, lookup, store
upsert (T1-T5, J1-J3, U1, A1) against in-test post tables."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from starryskyqueryengine_spark.operators import (
    encode_cursor,
    keyset_page,
    new_rows_anti_join,
    parse_cursor,
    prepend_pinned,
    refresh_delete,
    retain_latest,
    top_k,
    with_author_profiles,
)
from starryskyqueryengine_spark.schemas import POST_SCHEMA, PROFILE_SCHEMA
from starryskyqueryengine_spark.store import PostStore


def posts_df(spark, rows):
    def row(uri, key, cid, iso):
        return (uri, key, cid, None, None, dt.datetime.fromisoformat(iso))

    return spark.createDataFrame([row(*r) for r in rows], POST_SCHEMA)


BASE = [
    ("u1", "k1", "c1", "2024-01-01T00:00:01"),
    ("u2", "k1", "c2", "2024-01-01T00:00:02"),
    ("u3", "k1", "c3", "2024-01-01T00:00:03"),
    ("u4", "k1", "c4", "2024-01-01T00:00:03"),  # ts tie with u3, cid c4 > c3
    ("u5", "k2", "c5", "2024-01-01T00:00:05"),
]


def test_t1_topk_order_and_key_scope(spark):
    df = posts_df(spark, BASE)
    got = [r["uri"] for r in top_k(df, "k1", 3).collect()]
    # newest first; tie at :03 broken by cid desc (c4 before c3)
    assert got == ["u4", "u3", "u2"]


def test_t2_keyset_pagination_round_trip(spark):
    df = posts_df(spark, BASE)
    page1 = top_k(df, "k1", 2).collect()
    last = page1[-1]
    cur = encode_cursor(
        int(last["indexedAt"].replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000),
        last["cid"],
    )
    page2 = [r["uri"] for r in keyset_page(df, "k1", 2, cur).collect()]
    assert [r["uri"] for r in page1] == ["u4", "u3"]
    assert page2 == ["u2", "u1"]


def test_t2_cursor_tie_break(spark):
    df = posts_df(spark, BASE)
    # cursor at (:03, c4) must yield u3 (same ts, smaller cid) next
    us = int(dt.datetime.fromisoformat("2024-01-01T00:00:03+00:00").timestamp() * 1_000_000)
    got = [r["uri"] for r in keyset_page(df, "k1", 10, encode_cursor(us, "c4")).collect()]
    assert got == ["u3", "u2", "u1"]


def test_cursor_parse_errors():
    assert parse_cursor("123::abc") == (123, "abc")
    with pytest.raises(ValueError):
        parse_cursor("garbage")


def test_t5_pinned_prepend(spark):
    df = posts_df(spark, BASE)
    res = prepend_pinned(spark, top_k(df, "k2", 5), ["pin1"]).collect()
    # the rank column IS the order contract (pinned first, newest-first)
    # — robust to any physical reordering of the union
    out = [r["post"] for r in sorted(res, key=lambda r: r["rank"])]
    assert out == ["pin1", "u5"]
    assert [r["rank"] for r in sorted(res, key=lambda r: r["rank"])] == [0, 1]


def test_t3_retain_latest(spark):
    df = posts_df(spark, BASE)
    kept = retain_latest(df, 2)
    got = {(r["uri"], r["key"]) for r in kept.collect()}
    assert got == {("u4", "k1"), ("u3", "k1"), ("u5", "k2")}


def test_t4_refresh_delete(spark):
    df = posts_df(spark, BASE)
    remaining = {r["uri"] for r in refresh_delete(df, 2, "k1").collect()}
    assert remaining == {"u1", "u2", "u5"}
    wiped = {r["uri"] for r in refresh_delete(df, -1, "k1").collect()}
    assert wiped == {"u5"}


def test_j2_anti_join(spark):
    stored = posts_df(spark, BASE)
    incoming = posts_df(
        spark,
        [
            ("u3", "k1", "c3", "2024-01-01T00:00:03"),  # dup
            ("u9", "k1", "c9", "2024-01-01T00:00:09"),  # new
            ("u3", "k2", "c3", "2024-01-01T00:00:03"),  # same uri, other key
        ],
    )
    got = {(r["uri"], r["key"]) for r in new_rows_anti_join(incoming, stored).collect()}
    assert got == {("u9", "k1"), ("u3", "k2")}


def test_j1_broadcast_profile_join(spark):
    posts = spark.createDataFrame([("p1", "did:a"), ("p2", "did:z")], "uri string, author_did string")
    profiles = spark.createDataFrame(
        [("did:a", "Alice", "vet clinic")], PROFILE_SCHEMA
    )
    out = with_author_profiles(posts, profiles)
    m = {r["uri"]: r["author_profile_text"] for r in out.collect()}
    assert m == {"p1": "Alice vet clinic", "p2": None}
    # the join must be planned as a broadcast hash join
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_store_upsert_retention_delete(spark, tmp_path):
    store = PostStore(spark, str(tmp_path / "posts"))
    store.upsert(posts_df(spark, BASE))
    assert store.read().count() == 5
    # idempotent re-upsert (ON CONFLICT DO NOTHING)
    store.upsert(posts_df(spark, BASE))
    assert store.read().count() == 5
    # new + dup mix
    store.upsert(
        posts_df(
            spark,
            [
                ("u6", "k1", "c6", "2024-01-01T00:00:06"),
                ("u5", "k2", "c5", "2024-01-01T00:00:05"),
            ],
        )
    )
    assert store.read().count() == 6
    counts = {r["key"]: r["n"] for r in store.count_by_key().collect()}
    assert counts == {"k1": 5, "k2": 1}
    # retention: cap k1 at 2 (k2 under cap stays untouched)
    store.apply_retention({"k1": 2, "k2": 5})
    kept = {r["uri"] for r in store.read_key("k1").collect()}
    assert kept == {"u6", "u4"}
    assert store.read_key("k2").count() == 1
    # refresh: drop newest row of k1
    store.apply_refresh("k1", 1)
    assert {r["uri"] for r in store.read_key("k1").collect()} == {"u4"}
    # cascade delete
    store.delete_key("k1")
    assert store.read_key("k1").count() == 0
    assert store.read_key("k2").count() == 1


def test_topk_plan_is_take_ordered(spark):
    """T1 must plan as TakeOrderedAndProject (true top-k), not a global
    sort — the difference between O(n log k) per partition and a full
    shuffle sort at 100 TB."""
    df = posts_df(spark, BASE)
    plan = top_k(df, "k1", 3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# --- S1/T7: paginated cursor scan ------------------------------------------

def test_s1_paged_scan_caps_and_short_page(spark):
    from pyspark.sql.types import LongType, StructField, StructType

    from starryskyqueryengine_spark.sources import fetcher_from_rows, paged_scan

    schema = StructType([StructField("i", LongType())])
    rows = [(i,) for i in range(250)]

    # 3 pages of 100/100/50; short final page ends the loop (T7 quirk)
    df = paged_scan(spark, fetcher_from_rows(rows, 100), schema)
    assert df.count() == 250

    # page cap: max_pages=2 -> 200 rows
    df = paged_scan(spark, fetcher_from_rows(rows, 100), schema, max_pages=2)
    assert df.count() == 200

    # empty source -> empty DataFrame with the right schema
    df = paged_scan(spark, fetcher_from_rows([], 100), schema)
    assert df.count() == 0 and df.schema == schema


def test_s1_paged_scan_exact_multiple_no_infinite_loop(spark):
    from pyspark.sql.types import LongType, StructField, StructType

    from starryskyqueryengine_spark.sources import fetcher_from_rows, paged_scan

    schema = StructType([StructField("i", LongType())])
    rows = [(i,) for i in range(200)]  # exactly 2 full pages
    df = paged_scan(spark, fetcher_from_rows(rows, 100), schema)
    assert df.count() == 200


# --- skew mitigation --------------------------------------------------------

def test_salted_count_matches_plain(spark):
    from starryskyqueryengine_spark.operators.skew import salted_count_by_key
    from starryskyqueryengine_spark.sources import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    plain = {r["event_type"]: r["n"] for r in ev.groupBy("event_type").agg(
        __import__("pyspark.sql.functions", fromlist=["F"]).count("*").alias("n")
    ).collect()}
    salted = {r["event_type"]: r["n"] for r in salted_count_by_key(
        ev, key_col="event_type", salt_from="event_id").collect()}
    assert plain == salted


def test_salted_join_matches_plain(spark):
    from pyspark.sql import functions as F

    from starryskyqueryengine_spark.operators.skew import salted_join_skewed_fact
    from starryskyqueryengine_spark.sources import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    dim = spark.createDataFrame(
        [("click", 1.5), ("view", 1.0), ("purchase", 10.0)],
        "event_type string, weight double",
    )
    plain = ev.join(dim, "event_type").select("event_id", "weight")
    salted = salted_join_skewed_fact(
        ev, dim, key_col="event_type", salt_from="event_id"
    ).select("event_id", "weight")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # outer joins preserve unmatched fact rows exactly once
    left = salted_join_skewed_fact(
        ev, dim, key_col="event_type", salt_from="event_id", how="left"
    )
    assert left.count() == ev.count()


def test_conditions_registry_save_load_roundtrip(spark, tmp_path):
    from starryskyqueryengine_spark.config import ConditionsRegistry, FeedCondition

    reg = ConditionsRegistry()
    reg.upsert(FeedCondition(
        key="k1", recordName="feed-a", inputRegex="data", invertRegex="slow",
        labelDisable=True, includeAltText=True, imageOnly="imageOnly",
        pinnedPost=["at://p/1", "at://p/2"], privateFeed=["did:plc:x"],
        profileMatch="stream::premium", limitCount=500, refresh=3,
    ))
    reg.upsert(FeedCondition(key="k2", recordName="feed-b"))
    path = str(tmp_path / "conditions")
    reg.save(spark, path)
    back = ConditionsRegistry.load(spark, path)
    assert {c.key for c in back.all()} == {"k1", "k2"}
    a, b = back.get("k1"), reg.get("k1")
    import dataclasses
    for f in dataclasses.fields(b):
        assert getattr(a, f.name) == getattr(b, f.name), f.name


def test_store_compaction(spark, tmp_path):
    import datetime as dt

    from starryskyqueryengine_spark.schemas import POST_SCHEMA
    from starryskyqueryengine_spark.store import PostStore

    store = PostStore(spark, str(tmp_path / "store"))
    # 6 micro-batches -> 6 files in the key partition
    for b in range(6):
        rows = [
            (f"p{b}-{i}", "hot", f"c{b}{i:02d}", None, None,
             dt.datetime(2024, 1, 1, b, i))
            for i in range(10)
        ]
        store.upsert(spark.createDataFrame(rows, POST_SCHEMA))
    assert store.file_counts()["hot"] >= 6
    before = store.read().count()

    compacted = store.compact(max_files_per_key=4)
    assert compacted == ["hot"]
    assert store.file_counts()["hot"] == 1
    assert store.read().count() == before  # lossless
    assert store.compact(max_files_per_key=4) == []  # idempotent

    # compaction writes newest-first so row-group indexedAt stats are
    # selective for keyset (T2) scans
    import glob

    f = glob.glob(str(tmp_path / "store" / "key=hot" / "*.parquet"))[0]
    ts_in_file = [r["indexedAt"] for r in spark.read.parquet(f).collect()]
    assert ts_in_file == sorted(ts_in_file, reverse=True)


def test_asof_join_semantics(spark):
    from starryskyqueryengine_spark.operators.asof import as_of_join

    left = spark.createDataFrame(
        [(1, 10, "p1"), (1, 20, "p2"), (2, 15, "p3"), (3, 5, "p4")],
        "uid long, ts long, pid string",
    )
    right = spark.createDataFrame(
        [(1, 5, "c1"), (1, 18, "c2"), (1, 20, "c3"), (2, 99, "c4")],
        "uid long, ts long, cid string",
    )
    out = {r["pid"]: r["asof_cid"] for r in as_of_join(
        left, right, key_col="uid", ts_col="ts", right_payload=["cid"]
    ).collect()}
    assert out == {
        "p1": "c1",   # latest right at/before ts=10 is c1 (ts=5)
        "p2": "c3",   # equal-timestamp right row matches (ts=20)
        "p3": None,   # right exists only after the left row
        "p4": None,   # no right rows for the key at all
    }


def test_sketch_distinct_within_tolerance(spark):
    from pyspark.sql import functions as F

    from starryskyqueryengine_spark.catalog_text import sketch_distinct_users
    from starryskyqueryengine_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    approx = {r["event_type"]: r["approx_users"]
              for r in sketch_distinct_users(spark, sf).collect()}
    ev = load_table(spark, sf, "events")
    exact = {r["event_type"]: r["n"]
             for r in ev.groupBy("event_type").agg(
                 F.countDistinct("user_id").alias("n")).collect()}
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(2, 0.05 * n), (k, approx[k], n)


def test_portable_hll_within_tolerance_and_deterministic(spark):
    """The from-scratch engine-portable HyperLogLog
    (sketch_distinct_users_portable): estimate within tolerance of the
    exact distinct count, and bit-identical under repartitioning (the
    Z-sum terms are dyadic rationals — exactly summable in doubles, so
    partition order cannot change the estimate)."""
    from pyspark.sql import functions as F

    from starryskyqueryengine_spark.catalog_text import (
        sketch_distinct_users_portable,
    )
    from starryskyqueryengine_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    est = {r["event_type"]: r["est_users"]
           for r in sketch_distinct_users_portable(spark, sf).collect()}
    ev = load_table(spark, sf, "events")
    exact = {r["event_type"]: r["n"]
             for r in ev.groupBy("event_type").agg(
                 F.countDistinct("user_id").alias("n")).collect()}
    for k, n in exact.items():
        assert abs(est[k] - n) <= max(2, 0.1 * n), (k, est[k], n)
    est2 = {r["event_type"]: r["est_users"]
            for r in sketch_distinct_users_portable(spark, sf).collect()}
    assert est == est2


def test_asof_join_null_payload_not_stitched(spark):
    """A NULL payload field in the latest right row must stay NULL — not
    resurrect the value from an older right row (the per-column carry
    bug: columns stitched from different right rows)."""
    from starryskyqueryengine_spark.operators.asof import as_of_join

    left = spark.createDataFrame([(1, 10, "p1")], "uid long, ts long, pid string")
    right = spark.createDataFrame(
        [(1, 1, 5, None), (1, 2, None, 7)],
        "uid long, ts long, a long, b long",
    )
    out = as_of_join(left, right, "uid", "ts", ["a", "b"]).collect()[0]
    # latest right row at ts<=10 is (ts=2, a=NULL, b=7): both fields
    # must come from THAT row
    assert out["asof_a"] is None and out["asof_b"] == 7


def test_store_delete_to_empty_partition(spark, tmp_path):
    """Deleting ALL rows of a key must actually empty the partition —
    dynamic partition overwrite writes no files for a key with zero
    remaining rows, silently keeping the old ones without the explicit
    partition drop."""
    store = PostStore(spark, str(tmp_path / "posts"))
    store.upsert(posts_df(spark, BASE))
    # CDC-delete every row of k2
    doomed = spark.createDataFrame([("u5", "k2")], "uri string, key string")
    store.delete_rows(doomed)
    assert store.read_key("k2").count() == 0
    assert store.read_key("k1").count() == 4  # untouched
    # refresh larger than the key's row count empties it too
    store.apply_refresh("k1", 99)
    assert store.read_key("k1").count() == 0


# --------------------------------------------------------------------------
# Bloom-filter pre-probe (operators/bloom.py)
# --------------------------------------------------------------------------

def test_bloom_split_invariant_and_no_false_negatives(spark):
    """Split-by-bloom + exact join on the remainder must equal the exact
    join on everything (row for row), and every TRUE duplicate must land
    in the maybe side — the no-false-negative guarantee the joinless
    fast path rests on."""
    from pyspark.sql import functions as F

    from starryskyqueryengine_spark.operators.bloom import bloom_split_new

    stored = spark.range(2000).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("uri")
    )
    incoming = spark.range(1000, 4000).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("uri")
    )
    new, maybe = bloom_split_new(incoming, stored, "uri", fpp=0.01)

    exact_all = {r["uri"] for r in incoming.join(stored, "uri", "left_anti").collect()}
    got = {r["uri"] for r in new.collect()} | {
        r["uri"] for r in maybe.join(stored, "uri", "left_anti").collect()
    }
    assert got == exact_all

    dups = {r["uri"] for r in incoming.join(stored, "uri", "left_semi").collect()}
    maybe_set = {r["uri"] for r in maybe.collect()}
    assert dups <= maybe_set

    # the filter actually filters: most genuinely-new rows skip the join
    fp = len(maybe_set - dups)
    assert fp / 2000 < 0.05, f"false-positive rate {fp/2000} way over target"


def test_bloom_positions_are_codegen(spark):
    """Position computation must be JVM expressions on both sides — the
    only Python is the one vectorized bitset gather."""
    from pyspark.sql import functions as F

    from starryskyqueryengine_spark.operators.bloom import _positions

    df = spark.range(100).select(F.col("id").cast("string").alias("uri"))
    plan = (
        df.select(F.array(*_positions("uri", 1024, 3)).alias("p"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan
    assert "xxhash64" in plan.lower() or "pmod" in plan.lower()


def test_salted_join_rejects_outer_dim_sides(spark):
    """right/full joins cannot be salted (unmatched replicated dim rows
    would surface n_salt times) — the operator must refuse loudly, not
    return silently wrong cardinality."""
    from starryskyqueryengine_spark.operators.skew import (
        salted_join_skewed_fact,
    )

    fact = spark.createDataFrame([(1, "a")], "k int, v string")
    dim = spark.createDataFrame([(1, "x"), (2, "y")], "k int, d string")
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="cannot preserve"):
            salted_join_skewed_fact(fact, dim, "k", "v", how=how)


def test_bloom_stride_never_collapses(spark):
    """The KM stride is forced into [1, m-1]: no key's k probe positions
    can collapse onto a single bit (h2 == 0 mod m previously inflated
    that key's effective fpp to the 1-hash rate)."""
    from starryskyqueryengine_spark.operators.bloom import _positions

    df = spark.range(0, 2000).select(F.concat(F.lit("u"), F.col("id")).alias("uri"))
    m, k = 509, 7  # prime m, several hash rounds
    pos = df.select(F.array(*_positions("uri", m, k)).alias("p"))
    n_distinct = pos.select(F.size(F.array_distinct("p")).alias("n"))
    # with a nonzero stride mod a prime, all k positions are distinct
    assert n_distinct.agg(F.min("n")).collect()[0][0] == k


def test_retention_cap_zero_empties_partition(spark, tmp_path):
    """A cap that keeps ZERO rows must still rewrite (empty) that key's
    partition — without expected_keys the empty keep-set hit dynamic
    overwrite's deletion blind spot and silently evicted nothing."""
    store = PostStore(spark, str(tmp_path / "p0"))
    store.upsert(posts_df(spark, BASE))
    store.apply_retention({"k1": 0})
    assert store.read_key("k1").count() == 0
    assert store.read_key("k2").count() == 1  # untouched


def test_asof_join_ignores_null_right_timestamps(spark):
    """A right row with NULL ts has no position on the timeline: it must
    not be carried onto left rows that have no genuine prior match."""
    from starryskyqueryengine_spark.operators.asof import as_of_join

    left = spark.createDataFrame(
        [(1, 10, "p1"), (2, 10, "p2")], "uid long, ts long, pid string"
    )
    right = spark.createDataFrame(
        [(1, None, "ghost"), (2, 5, "c1"), (2, None, "ghost2")],
        "uid long, ts long, cid string",
    )
    out = {r["pid"]: r["asof_cid"] for r in as_of_join(
        left, right, key_col="uid", ts_col="ts", right_payload=["cid"]
    ).collect()}
    assert out == {"p1": None, "p2": "c1"}


def test_asof_join_null_keys_never_match(spark):
    """Review r13: the carry window partitions by key, and
    Window.partitionBy groups NULL keys together (GROUP BY semantics) —
    so a NULL-key right row's payload used to be carried onto NULL-key
    left rows.  This operator is an as-of JOIN: NULL never equals NULL
    (DuckDB's native ASOF JOIN, the oracle, matches nothing on NULL
    keys), so NULL-key left rows get NULL payload and NULL-key right
    rows match no one — while non-null keys are unaffected."""
    from starryskyqueryengine_spark.operators.asof import as_of_join

    left = spark.createDataFrame(
        [(None, 10, "p_null"), (2, 10, "p2")], "uid long, ts long, pid string"
    )
    right = spark.createDataFrame(
        [(None, 5, "ghost"), (2, 5, "c1")], "uid long, ts long, cid string"
    )
    out = {r["pid"]: r["asof_cid"] for r in as_of_join(
        left, right, key_col="uid", ts_col="ts", right_payload=["cid"]
    ).collect()}
    assert out == {"p_null": None, "p2": "c1"}


def test_refresh_delete_keeps_null_key_rows(spark):
    """Refreshing one feed must not delete rows whose key is NULL
    (three-valued `!=` would silently drop them in both branches)."""
    from starryskyqueryengine_spark.operators.retention import refresh_delete

    df = spark.createDataFrame(
        [("a", 1, "c1", "u1"), (None, 2, "c2", "u2"), ("b", 3, "c3", "u3")],
        "key string, ts long, cid string, uri string",
    )
    full = refresh_delete(df, -1, "a", ts_col="ts")
    assert sorted(r["key"] for r in full.collect() if r["key"]) == ["b"]
    assert full.filter(F.col("key").isNull()).count() == 1
    part = refresh_delete(df, 1, "a", ts_col="ts")
    assert part.filter(F.col("key").isNull()).count() == 1


def test_dedup_within_batch_deterministic_winner(spark):
    """Two payload variants of one PK must resolve to the SAME row on
    every run: smallest remaining-column tuple wins."""
    from starryskyqueryengine_spark.operators.dedup import dedup_within_batch

    rows = [("u1", "k", "c2", "late"), ("u1", "k", "c1", "early")]
    for _ in range(3):
        df = spark.createDataFrame(rows, "uri string, key string, cid string, note string")
        got = dedup_within_batch(df, ["uri", "key"]).collect()
        assert len(got) == 1
        assert (got[0]["cid"], got[0]["note"]) == ("c1", "early")


def test_upsert_rejects_null_pk_rows(spark, tmp_path):
    """NULL never equals NULL in the anti-join, so a NULL-PK row would
    re-insert on every re-delivery; upsert must drop such rows."""
    from starryskyqueryengine_spark.store import PostStore

    store = PostStore(spark, str(tmp_path / "s"))
    rows = [
        ("at://u/p/1", "k", "c1", None, None, "2026-01-01 00:00:00"),
        (None, "k", "c2", None, None, "2026-01-01 00:00:00"),
    ]
    schema = ("uri string, key string, cid string, replyParent string, "
              "replyRoot string, indexedAt string")
    batch = spark.createDataFrame(rows, schema).withColumn(
        "indexedAt", F.col("indexedAt").cast("timestamp")
    )
    assert store.upsert(batch) == {"k": 1}
    # re-delivery: nothing (especially not the NULL-uri row) re-inserts
    assert store.upsert(batch) in ({}, {"k": 0})
    assert store.read().count() == 1


def test_author_profiles_dedups_duplicate_dids(spark):
    from starryskyqueryengine_spark.operators.lookup import with_author_profiles

    posts = spark.createDataFrame([("p1", "did:a")], "uri string, author_did string")
    profiles = spark.createDataFrame(
        [("did:a", "Alice", "v1"), ("did:a", "Alice", "v2")],
        "did string, displayName string, description string",
    )
    out = with_author_profiles(posts, profiles)
    assert out.count() == 1, "duplicate profile rows multiplied posts"


def test_asof_join_tiebreak_orders_duplicate_right_rows(spark):
    """Review r9: tiebreak_col was selected from NEITHER union side, so
    every right row carried NULL there and duplicate (key, ts) right
    rows resolved by input order (or, if the left happened to lack the
    column, the query failed to analyze).  The tiebreak now rides inside
    the carried struct: the LARGEST value wins, left columns with the
    same name cannot shadow it."""
    from starryskyqueryengine_spark.operators.asof import as_of_join

    left = spark.createDataFrame([(1, 10)], "uid long, ts long")
    right = spark.createDataFrame(
        [(1, 5, 1, "low"), (1, 5, 2, "high")],
        "uid long, ts long, seq long, v string",
    )
    out = as_of_join(left, right, "uid", "ts", ["v"], tiebreak_col="seq")
    assert out.collect()[0]["asof_v"] == "high"
    # same answer when the tiebreak is ALSO a payload column
    out2 = as_of_join(left, right, "uid", "ts", ["v", "seq"],
                      tiebreak_col="seq")
    row = out2.collect()[0]
    assert (row["asof_v"], row["asof_seq"]) == ("high", 2)


def test_asof_join_rejects_reserved_column_names(spark):
    """Review r9: a user column named _r/_side/_c silently collided with
    the join's internal helpers (worst case: returned corrupted as
    all-NULL).  Reserved names now fail fast."""
    import pytest

    from starryskyqueryengine_spark.operators.asof import as_of_join

    left = spark.createDataFrame([(1, 10, "keep")], "uid long, ts long, _r string")
    right = spark.createDataFrame([(1, 5, "x")], "uid long, ts long, v string")
    with pytest.raises(ValueError, match="_r"):
        as_of_join(left, right, "uid", "ts", ["v"])


def test_paged_scan_rejects_overfull_pages(spark):
    """Review r9: page_size must be the fetcher's REAL page size — an
    over-full page (the detectable half of a mismatch) raises instead
    of silently disabling the short-page stop."""
    import pytest

    from pyspark.sql import types as T

    from starryskyqueryengine_spark.sources.paged import (
        fetcher_from_rows,
        paged_scan,
    )

    schema = T.StructType([T.StructField("x", T.LongType())])
    rows = [(i,) for i in range(30)]
    with pytest.raises(ValueError, match="page_size"):
        paged_scan(spark, fetcher_from_rows(rows, page_size=20), schema,
                   page_size=10)
    # matching sizes still work end to end
    out = paged_scan(spark, fetcher_from_rows(rows, page_size=20), schema,
                     page_size=20)
    assert out.count() == 30


def test_s6_validation_off_fixture_nulls_match_oracle(spark, tmp_path):
    """Review r9: NULL event_type and non-integer k must agree with the
    DuckDB oracle OFF-fixture too (the fixture has neither, which is the
    only reason the old raw interpolation passed: it kept a NULL type as
    rec_type='null' where the oracle's WHERE drops it, and corrupted the
    JSON for k='abc' where the oracle errored)."""
    import duckdb

    from starryskyqueryengine_spark import catalog, catalog_surface  # noqa: F401

    sf = str(tmp_path)
    rows = [
        (1, "click", '{"k": 5}', 1000),
        (2, None, '{"k": 6}', 2000),          # NULL type: both drop
        (3, "view", '{"k": "abc"}', 3000),    # non-integer k: both drop
        (4, "error", '{"k": 7}', 4000),       # poison: both drop
        (5, 'we"ird', '{"k": 8}', 5000),      # quote in type: both keep
        (6, "signup", '{"x": 1}', 6000),      # no k: both keep k NULL
        (7, "view", '{"k": "007"}', 7000),    # leading zeros: both drop
        # 20 digits: overflows LongType Spark-side, TRY_CAST NULL in
        # DuckDB — the shared regex drops it on BOTH sides instead
        (8, "view", '{"k": "99999999999999999999"}', 8000),
        (9, "ta\tb", '{"k": 9}', 9000),       # control char: both drop
        (10, "view", '{"k": -3}', 10000),     # negative: both keep
        # trailing newline (r10, ADVICE): java's $ matches BEFORE a
        # trailing \n while RE2's is end-of-text — the shared \z
        # anchor drops it on BOTH sides
        (11, "view", '{"k": "123\\n"}', 11000),
    ]
    spark.createDataFrame(
        rows, "event_id long, event_type string, props string, ts_us long"
    ).withColumn("ts", F.timestamp_micros(F.col("ts_us"))).write.mode(
        "overwrite"
    ).parquet(f"{sf}/events.parquet")

    got = {
        (r["event_id"], r["rec_type"], r["k"])
        for r in catalog.QUERIES["s6_validation_filter"](spark, sf).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf}/events.parquet/*.parquet')"
    )
    want = set(map(tuple, con.execute(
        catalog.ORACLE["s6_validation_filter"]).fetchall()))
    assert got == want
    assert {e for e, _, _ in got} == {1, 5, 6, 10}


def test_bloom_sizes_from_zero_stat_and_probes_once(spark):
    """Review r9: expected_items=0 (a first-ingest empty store's table
    stat) crashed with ZeroDivisionError in the k sizing; and the two
    split halves used to share an unmaterialized probe subtree, running
    the scan+probe twice when both are consumed — flagged is now
    checkpointed, so the split invariant holds with one probe pass."""
    from starryskyqueryengine_spark.operators.bloom import (
        bloom_split_new,
        build_bloom,
    )

    stored = spark.createDataFrame([], "uri string")
    bits, k = build_bloom(stored, expected_items=0)
    assert k >= 1 and bits.shape[0] >= 64

    incoming = spark.createDataFrame([("u1", 1), ("u2", 2)], "uri string, v int")
    new, maybe = bloom_split_new(incoming, stored, expected_items=0)
    # empty filter: nothing can be "maybe seen"
    assert new.count() == 2 and maybe.count() == 0
    # reserved helper column fails fast
    bad = incoming.withColumn("_maybe", F.lit(True))
    with pytest.raises(ValueError, match="_maybe"):
        bloom_split_new(bad, stored, expected_items=0)


def test_rangejoin_and_skew_reject_reserved_columns(spark):
    """Review r9: a probe/fact column named like an internal helper was
    silently overwritten (rangejoin's _bkt worst: duplicate output rows
    with partial counts) — all salting/bucketing operators fail fast."""
    from starryskyqueryengine_spark.operators.rangejoin import (
        interval_count_join,
    )
    from starryskyqueryengine_spark.operators.skew import (
        salted_count_by_key,
        salted_join_skewed_fact,
    )

    probe = spark.createDataFrame([(1, 10)], "_bkt long, ts long")
    build = spark.createDataFrame([(5,)], "bts long")
    with pytest.raises(ValueError, match="_bkt"):
        interval_count_join(probe, build, "ts", "bts", 100)

    fact = spark.createDataFrame([("k", "u", 1)], "key string, uri string, _salt int")
    with pytest.raises(ValueError, match="_salt"):
        salted_count_by_key(fact)
    dim = spark.createDataFrame([("k", 9)], "key string, d int")
    with pytest.raises(ValueError, match="_salt"):
        salted_join_skewed_fact(fact, dim, "key", "uri")


def test_conditions_registry_load_is_total_over_stale_rows(spark, tmp_path):
    """Review r14: load() used to route rows through the RAISING upsert
    path — a registry saved under an older regex dialect (the JS->Java
    translator has tightened across rounds) aborted the whole load on
    its first now-rejected pattern, losing every other feed's
    condition.  load() now shares restore()'s skip-and-log contract."""
    from starryskyqueryengine_spark.config import (
        ConditionsRegistry,
        FeedCondition,
        conditions_df,
    )

    good = FeedCondition(key="k1", recordName="feed-a", inputRegex="data")
    # a historically-stored row whose pattern the CURRENT dialect gate
    # rejects (unbalanced paren) — built without validate(), exactly the
    # on-disk state an older save could have produced
    stale = FeedCondition(key="k2", recordName="feed-b", inputRegex="(")
    path = str(tmp_path / "conds")
    conditions_df(spark, [good, stale]).coalesce(1).write.parquet(path)

    back = ConditionsRegistry.load(spark, path)
    assert {c.key for c in back.all()} == {"k1"}
    assert back.get("k1").inputRegex == "data"
