"""Bucketed co-located join: pre-bucketing both sides of a repeated
fact-fact join on the join key removes the shuffle entirely — at 100 TB
the single biggest cost lever for recurring joins (operators/joins.py
module docstring). This test proves the plan property: a join of two
tables bucketed by the same key into the same bucket count contains NO
shuffle exchange."""

from __future__ import annotations

import pytest


@pytest.fixture()
def bucketed_pair(spark):
    # saveAsTable writes to the session warehouse dir (static conf, set at
    # session build); tables are dropped in teardown
    orders = spark.range(0, 1000).selectExpr(
        "id AS o_orderkey", "id % 7 AS o_custkey"
    )
    items = spark.range(0, 5000).selectExpr(
        "id % 1000 AS l_orderkey", "id AS l_item", "id * 1.5 AS l_price"
    )
    for name, df, key in [
        ("t_orders_b", orders, "o_orderkey"),
        ("t_items_b", items, "l_orderkey"),
    ]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .format("parquet")
            .mode("overwrite")
            .saveAsTable(name)
        )
    yield "t_orders_b", "t_items_b"
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_items_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_pair):
    t_orders, t_items = bucketed_pair
    # disable auto-broadcast: at test scale the planner would broadcast
    # (and rightly skip the bucketed path); the property under test is the
    # big-big join shape, where both sides exceed any broadcast threshold
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(t_items).join(
            spark.table(t_orders),
            spark.table(t_items)["l_orderkey"]
            == spark.table(t_orders)["o_orderkey"],
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan  # co-located: zero shuffles
        # sanity: the join actually computes
        assert joined.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
