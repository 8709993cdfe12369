"""Bucketed tables: the co-located join plans ZERO exchanges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_aws_spark.sources import bucketed


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    # warehouse dir is a static conf — tables land in the session default
    # and are dropped in the finally block
    orders = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("amount")
    )
    items = spark.range(0, 6000).select(
        (F.col("id") % 2000).alias("k"), F.col("id").alias("item_id")
    )
    bucketed.write_bucketed(orders, "t_orders_b", "k", 8, sort_col="k", owned=True)
    bucketed.write_bucketed(items, "t_items_b", "k", 8, sort_col="k", owned=True)
    # force the sort-merge path: broadcast would sidestep bucketing (tiny
    # test tables) and its BroadcastExchange confuses the assertion
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed.bucketed_join(spark, "t_orders_b", "t_items_b", "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # both sides read pre-bucketed: no shuffle in the plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan
        assert joined.count() == 6000
        # same join on unbucketed frames DOES shuffle — the layout is what
        # removes it, not the data size
        plain = orders.join(items, "k")
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in plain_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_items_b")
