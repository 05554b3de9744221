"""Bucketed co-located join: the exchange-free fact-fact join plan that
SCALE.md prescribes for 100 TB (bucket orders/lineitem on orderkey at
ingest). The assertion is on the PHYSICAL PLAN: with both sides bucketed
on the join key, the join has zero Exchange nodes; the unbucketed twin
has at least two."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from flink_streaming_twitter_spark.operators.bucketing import bucketed_join, write_bucketed
from flink_streaming_twitter_spark.sources.files import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # managed tables land in the default warehouse dir; DROP TABLE below
    # removes the files (warehouse.dir is a static conf, unsettable here)
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "orders_b", ["o_orderkey"], 4, sort_cols=["o_orderkey"])
    write_bucketed(li, "lineitem_b", ["l_orderkey"], 4, sort_cols=["l_orderkey"])
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def _physical_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    orders_b, lineitem_b = bucketed_tables
    # disable auto-broadcast: at test SF everything is broadcast-small,
    # which hides the exchange structure this test is about (at 100 TB
    # neither fact table broadcasts — this conf simulates that regime)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(
            spark,
            orders_b,
            lineitem_b,
            spark.table(orders_b).o_orderkey == spark.table(lineitem_b).l_orderkey,
        )
        plan = _physical_plan(joined)
        assert "SortMergeJoin" in plan and "Exchange" not in plan, plan

        # the unbucketed twin of the same join must shuffle both sides
        orders = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        unbucketed = orders.join(li, orders.o_orderkey == li.l_orderkey)
        assert _physical_plan(unbucketed).count("Exchange") >= 2
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_matches_unbucketed_result(spark, sf_dir, bucketed_tables):
    orders_b, lineitem_b = bucketed_tables
    joined = bucketed_join(
        spark, orders_b, lineitem_b, spark.table(orders_b).o_orderkey == spark.table(lineitem_b).l_orderkey
    )
    n_bucketed = joined.count()
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    assert n_bucketed == orders.join(li, orders.o_orderkey == li.l_orderkey).count()
    # revenue aggregate equality, not just cardinality
    a = joined.agg(F.sum("l_extendedprice")).first()[0]
    b = orders.join(li, orders.o_orderkey == li.l_orderkey).agg(F.sum("l_extendedprice")).first()[0]
    assert abs(a - b) < 1e-6
