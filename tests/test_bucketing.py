"""Bucketed-table writes must eliminate the join shuffle: the physical
plan for a join of two tables bucketed on the join key (same bucket
count) contains no Exchange. This is the property that matters at
100 TB — correctness of the join itself is covered elsewhere."""

import pytest

from data_engineering_capstone_project_spark.sources.writers import (
    write_bucketed_table,
)


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    # Managed tables land in the session's spark-warehouse dir
    # (spark.sql.warehouse.dir is static config, unchangeable here);
    # the fixture drops them afterwards.
    orders = spark.createDataFrame(
        [(i, i % 50, float(i)) for i in range(1000)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    lines = spark.createDataFrame(
        [(i % 1000, j, float(i * j)) for i in range(2000) for j in (1, 2)],
        "l_orderkey long, l_linenumber int, l_extendedprice double",
    )
    write_bucketed_table(orders, "b_orders", ["o_orderkey"], 8)
    write_bucketed_table(
        lines, "b_lines", ["l_orderkey"], 8, sort_cols=["l_orderkey"]
    )
    yield spark.table("b_orders"), spark.table("b_lines")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    orders, lines = bucketed_pair
    # Disable auto-broadcast so the test exercises the shuffle path the
    # bucketing is supposed to remove.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = orders.join(
            lines, orders.o_orderkey == lines.l_orderkey
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_result_correct(spark, bucketed_pair):
    orders, lines = bucketed_pair
    joined = orders.join(lines, orders.o_orderkey == lines.l_orderkey)
    # every order key 0..999 appears twice in lines (i and i+1000, j=1,2)
    assert joined.count() == 4000


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    orders, _ = bucketed_pair
    agg = orders.groupBy("o_orderkey").count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
