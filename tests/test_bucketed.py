"""Bucketed-layout tests: the co-located join must plan WITHOUT an
Exchange on either side (the whole point of paying for the bucketed
write), and results must match the plain shuffle join."""

import uuid

import pytest
from pyspark.sql import functions as F

from starryskyqueryengine_spark.operators.bucketed import (
    colocated_join,
    write_bucketed,
)
from starryskyqueryengine_spark.sources.fixtures import load_table

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    suffix = uuid.uuid4().hex[:8]
    t_orders = f"orders_b_{suffix}"
    t_lineitem = f"lineitem_b_{suffix}"
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    ).withColumnRenamed("l_orderkey", "o_orderkey")
    write_bucketed(orders, t_orders, ["o_orderkey"], num_buckets=8,
                   path=str(base / "orders"))
    write_bucketed(lineitem, t_lineitem, ["o_orderkey"], num_buckets=8,
                   path=str(base / "lineitem"))
    yield t_orders, t_lineitem
    spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
    spark.sql(f"DROP TABLE IF EXISTS {t_lineitem}")


def test_colocated_join_has_no_exchange(spark, bucketed_tables):
    t_orders, t_lineitem = bucketed_tables
    # Force a merge join so a broadcast can't mask a missing shuffle.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, t_orders, t_lineitem, ["o_orderkey"])
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_colocated_aggregation_reuses_bucketing(spark, bucketed_tables):
    """A groupBy on the bucket key over a bucketed table needs no shuffle
    either — partial and final aggregate collapse into one stage."""
    t_orders, _ = bucketed_tables
    agg = spark.table(t_orders).groupBy("o_orderkey").agg(
        F.sum("o_totalprice").alias("s")
    )
    assert "Exchange" not in plan_of(agg)


def test_colocated_join_matches_shuffle_join(spark, bucketed_tables):
    t_orders, t_lineitem = bucketed_tables
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    ).withColumnRenamed("l_orderkey", "o_orderkey")
    expected = orders.join(lineitem, ["o_orderkey"]).count()
    got = colocated_join(spark, t_orders, t_lineitem, ["o_orderkey"]).count()
    assert got == expected and got > 0


def test_write_bucketed_validates_args(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        write_bucketed(df, "t_bad", [], num_buckets=8)
    with pytest.raises(ValueError):
        write_bucketed(df, "t_bad", ["id"], num_buckets=0)


def test_write_bucketed_explicit_empty_sort_is_unsorted_not_crash(spark, tmp_path):
    from starryskyqueryengine_spark.operators.bucketed import write_bucketed

    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    write_bucketed(
        df, "t_unsorted_bkt", ["k"], num_buckets=4,
        sort_cols=[], path=str(tmp_path / "t"),
    )
    try:
        got = sorted(tuple(r) for r in spark.table("t_unsorted_bkt").collect())
        assert got == [(1, "a"), (2, "b")]
    finally:
        spark.sql("DROP TABLE IF EXISTS t_unsorted_bkt")
