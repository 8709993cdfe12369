"""Unit tests: projections/filters/joins/aggregates/dedup semantics + plan shape."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_aws_spark.operators import aggregates as agg
from etl_aws_spark.operators import relational as rel
from etl_aws_spark.operators.dedup import dedup_canonical


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_date_range_survives_year_boundary(spark):
    """Regression for glue.py:78-83: independent ano/mes ranges select
    nothing across 2024-12 -> 2025-01; the engine's BETWEEN must not."""
    rows = [(1, dt.date(2024, 12, 30)), (2, dt.date(2025, 1, 2)), (3, dt.date(2025, 3, 1))]
    df = spark.createDataFrame(rows, "id int, d date")
    out = rel.filter_date_range(df, "d", "2024-12-28", "2025-01-03")
    assert {r.id for r in out.collect()} == {1, 2}
    # the reference's buggy conjunctive form: ano in [2024,2025] AND mes in [12,1] -> mes range is empty
    buggy = df.filter((F.year("d") >= 2024) & (F.year("d") <= 2025) & (F.month("d") >= 12) & (F.month("d") <= 1))
    assert buggy.count() == 0  # documents exactly why the rewrite exists


def test_left_join_dim_is_broadcast(spark):
    fact = spark.range(100).select(F.col("id").alias("k"), (F.col("id") % 5).alias("g"))
    dim = spark.createDataFrame([(i, f"name{i}") for i in range(5)], "g long, name string")
    out = rel.left_join_dim(fact, dim, "g", "g")
    assert "BroadcastHashJoin" in plan_of(out)
    assert out.count() == 100
    assert out.filter(F.col("name").isNull()).count() == 0


def test_left_join_dim_normalized_matches_dirty_keys(spark):
    fact = spark.createDataFrame([(1, "abc"), (2, "DEF"), (3, "zzz")], "id int, k string")
    dim = spark.createDataFrame([("  ABC ", 10), ("def", 20)], "k string, v int")
    out = rel.left_join_dim(fact, dim, "k", "k", normalize=True).orderBy("id")
    assert [r.v for r in out.collect()] == [10, 20, None]


def test_filter_pushdown_reaches_parquet_scan(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.range(1000).withColumn("v", F.col("id") * 2.0).write.parquet(p)
    out = spark.read.parquet(p).filter(F.col("id") > 500).select("id")
    plan = plan_of(out)
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,500)]" in plan
    assert "ReadSchema: struct<id:bigint>" in plan  # column pruning: v not decoded


def test_dedup_canonical_deterministic_survivor(spark):
    rows = [("k1", 3, "c"), ("k1", 1, "a"), ("k1", 2, "b"), ("k2", 9, "z")]
    df = spark.createDataFrame(rows, "k string, ord int, payload string")
    out = dedup_canonical(df, ["k"], ["ord"])
    got = {r.k: r.payload for r in out.collect()}
    assert got == {"k1": "a", "k2": "z"}
    # idempotent
    assert dedup_canonical(out, ["k"], ["ord"]).count() == out.count()


def test_describe_percentiles_matches_numpy(spark):
    vals = [float(x) for x in range(1, 102)]  # 1..101 -> clean percentiles
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    row = agg.describe_percentiles(df, "x").collect()[0]
    assert row["count"] == 101
    assert row["p50"] == pytest.approx(np.percentile(vals, 50))
    assert row["p10"] == pytest.approx(np.percentile(vals, 10))
    assert row["p99"] == pytest.approx(np.percentile(vals, 99))
    assert row["std"] == pytest.approx(np.std(vals, ddof=1))


def test_regression_metrics_match_numpy(spark):
    rng = np.random.default_rng(7)
    y = rng.normal(10, 3, 500)
    yhat = y + rng.normal(0, 1, 500)
    df = spark.createDataFrame([(float(a), float(b)) for a, b in zip(y, yhat)], "y double, yhat double")
    row = agg.regression_metrics(df, "y", "yhat").collect()[0]
    e = y - yhat
    ss_res = float((e**2).sum())
    ss_tot = float(((y - y.mean()) ** 2).sum())
    assert row["mae"] == pytest.approx(float(np.abs(e).mean()), rel=1e-9)
    assert row["rmse"] == pytest.approx(float(np.sqrt((e**2).mean())), rel=1e-9)
    assert row["r2"] == pytest.approx(1 - ss_res / ss_tot, rel=1e-6)


def test_observe_checkpoint_no_extra_action(spark):
    df = spark.range(1000)
    observed, obs = agg.with_count_checkpoint(df, "chk")
    n = observed.count()  # the ONE action
    assert n == 1000
    assert obs.get["rows"] == 1000


def test_fill_with_global_mean(spark):
    df = spark.createDataFrame([(1, 2.0), (2, None), (3, 4.0)], "id int, v double")
    out = {r.id: r.v for r in agg.fill_with_global_mean(df, "v").collect()}
    assert out == {1: 2.0, 2: 3.0, 3: 4.0}


def test_union_all_aligns_by_name(spark):
    a = spark.createDataFrame([(1, "x")], "id int, s string")
    b = spark.createDataFrame([("y", 2)], "s string, id int")  # reversed column order
    out = rel.union_all([a, b]).orderBy("id").collect()
    assert [(r.id, r.s) for r in out] == [(1, "x"), (2, "y")]
