"""Unit tests for CDC snapshot diff and SCD2 history operators."""

import datetime as dt

from pyspark.sql import functions as F

from etl_aws_spark.operators import changedata as cd


def test_snapshot_diff_classifies_all_change_types(spark):
    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0)], "k long, price double"
    )
    new = spark.createDataFrame(
        [(2, 20.0), (3, 35.0), (5, 50.0)], "k long, price double"
    )
    out = {r.k: r for r in cd.snapshot_diff(old, new, "k", ["price"]).collect()}
    assert set(out) == {1, 3, 4, 5}  # 2 unchanged -> dropped
    assert out[1].change == "delete" and out[1].new_price is None
    assert out[4].change == "delete"
    assert out[3].change == "update" and (out[3].old_price, out[3].new_price) == (30.0, 35.0)
    assert out[5].change == "insert" and out[5].old_price is None


def test_snapshot_diff_null_attribute_is_not_an_update(spark):
    old = spark.createDataFrame([(1, None), (2, None)], "k long, price double")
    new = spark.createDataFrame([(1, None), (2, 9.0)], "k long, price double")
    out = {r.k: r.change for r in cd.snapshot_diff(old, new, "k", ["price"]).collect()}
    # NULL <=> NULL is equal (no spurious update); NULL -> 9.0 is an update
    assert out == {2: "update"}


def test_scd2_ranges_tile_the_timeline(spark):
    t = dt.datetime(2024, 1, 1)
    rows = [
        (1, "a", t + dt.timedelta(hours=0), 0),
        (1, "a", t + dt.timedelta(hours=1), 1),  # consecutive dup -> compressed
        (1, "b", t + dt.timedelta(hours=2), 2),
        (1, "a", t + dt.timedelta(hours=3), 3),  # returns to a: NEW segment
        (2, "x", t + dt.timedelta(hours=0), 4),
    ]
    df = spark.createDataFrame(rows, "k long, attr string, ts timestamp, seq long")
    out = cd.scd2_from_log(df, "k", "attr", "ts", order_tail=["seq"])
    got = sorted(out.collect(), key=lambda r: (r.k, r.valid_from))
    k1 = [r for r in got if r.k == 1]
    assert [r.attr for r in k1] == ["a", "b", "a"]
    # each segment's valid_to equals the next segment's valid_from
    assert all(k1[i].valid_to == k1[i + 1].valid_from for i in range(len(k1) - 1))
    assert k1[-1].valid_to is None and k1[-1].is_current == 1
    assert sum(r.is_current for r in k1) == 1
    k2 = [r for r in got if r.k == 2]
    assert len(k2) == 1 and k2[0].is_current == 1


def test_scd2_plans_single_exchange(spark):
    df = spark.createDataFrame(
        [(1, "a", dt.datetime(2024, 1, 1, i), i) for i in range(5)],
        "k long, attr string, ts timestamp, seq long",
    )
    out = cd.scd2_from_log(df, "k", "attr", "ts", order_tail=["seq"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # both window passes share one (k)-hash partitioning
    assert plan.count("Exchange hashpartitioning") == 1
