"""Bucketed co-located joins: same-bucketed tables join with NO Exchange."""

import pyspark.sql.functions as F
import pytest

from solr_map_reduce_spark.operators.bucketing import bucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    write_bucketed(o, "t_orders_b", "o_orderkey", buckets=4)
    write_bucketed(l, "t_lineitem_b", "o_orderkey", buckets=4)
    yield "t_orders_b", "t_lineitem_b", o, l
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_bucketed_join_no_exchange(spark, bucketed_tables):
    ot, lt, _, _ = bucketed_tables
    # merge hint models the large-large case (at test scale the planner
    # would otherwise broadcast the small side)
    joined = bucketed_join(spark, ot, lt, "o_orderkey", strategy_hint="merge")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # co-located: zero shuffle
    assert "SortMergeJoin" in plan
    assert plan.count("Bucketed: true") == 2


def test_bucketed_join_correct(spark, bucketed_tables):
    ot, lt, o, l = bucketed_tables
    got = bucketed_join(spark, ot, lt, "o_orderkey").count()
    want = o.join(l, "o_orderkey").count()
    assert got == want


def test_unbucketed_join_does_shuffle(spark, sf_dir):
    """Control: the same join on raw parquet has Exchanges (so the
    no-Exchange assertion above is meaningful)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    with_broadcast_off = o.hint("merge").join(l, "o_orderkey")
    plan = with_broadcast_off._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan
