"""Optimization r14: the fixture schema catalog (sources/fixtures.py).

``load_table`` memoizes ONLY the inferred StructType, keyed by the
file's (path, mtime_ns, size) fingerprint — the metastore pattern that
removes per-query schema inference.  These tests pin the two contracts
that make it safe: cached reads are identical to inferred reads, and a
rewritten file (new fingerprint) is re-inferred, never served a stale
schema.
"""

from __future__ import annotations

import os
import time

from starryskyqueryengine_spark.sources import fixtures as fx

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def test_cached_read_identical_to_inferred(spark):
    fx._SCHEMA_CACHE.clear()
    first = fx.load_table(spark, SF_DIR, "documents")  # inference path
    assert fx._SCHEMA_CACHE  # populated
    second = fx.load_table(spark, SF_DIR, "documents")  # cached path
    assert first.schema == second.schema
    a = sorted(tuple(r) for r in first.collect())
    b = sorted(tuple(r) for r in second.collect())
    assert a == b


def test_events_normalization_rides_cached_schema(spark):
    fx._SCHEMA_CACHE.clear()
    e1 = fx.load_table(spark, SF_DIR, "events")
    e2 = fx.load_table(spark, SF_DIR, "events")
    assert e1.schema == e2.schema
    assert "ts_us" in e2.columns  # normalization applied on the cached path


def test_rewritten_file_reinferred_not_stale(spark, tmp_path):
    fx._SCHEMA_CACHE.clear()
    p = str(tmp_path / "t.parquet")
    spark.range(3).selectExpr("id AS a").coalesce(1).write.parquet(p)
    s1 = fx.load_table(spark, str(tmp_path), "t").schema
    assert [f.name for f in s1.fields] == ["a"]
    # rewrite with a DIFFERENT schema; ensure a distinct mtime_ns
    time.sleep(0.01)
    spark.range(3).selectExpr("id AS a", "id * 2 AS b").coalesce(1).write.mode(
        "overwrite"
    ).parquet(p)
    s2 = fx.load_table(spark, str(tmp_path), "t").schema
    assert [f.name for f in s2.fields] == ["a", "b"]


def test_fixture_schema_matches_raw_file_schema(spark):
    fx._SCHEMA_CACHE.clear()
    raw = spark.read.parquet(f"{SF_DIR}/events.parquet").schema
    assert fx.fixture_schema(spark, SF_DIR, "events") == raw
    # and the cached second call returns the same object content
    assert fx.fixture_schema(spark, SF_DIR, "events") == raw


def test_df_plan_memo_returns_same_plan_object(spark):
    """Optimization r15: load_table memoizes the lazy DataFrame plan per
    session — same immutable plan object on a memo hit, no re-resolution."""
    d1 = fx.load_table(spark, SF_DIR, "documents")
    d2 = fx.load_table(spark, SF_DIR, "documents")
    assert d1 is d2
    e1 = fx.load_table(spark, SF_DIR, "events")
    e2 = fx.load_table(spark, SF_DIR, "events")
    assert e1 is e2
    assert e1 is not d1  # events memoized under its own (normalized) key


def test_df_plan_memo_invalidated_by_rewrite(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.range(3).selectExpr("id AS a").coalesce(1).write.parquet(p)
    d1 = fx.load_table(spark, str(tmp_path), "t")
    time.sleep(0.01)
    spark.range(4).selectExpr("id AS a").coalesce(1).write.mode(
        "overwrite"
    ).parquet(p)
    d2 = fx.load_table(spark, str(tmp_path), "t")
    assert d1 is not d2  # new fingerprint -> fresh plan
    assert d2.count() == 4
