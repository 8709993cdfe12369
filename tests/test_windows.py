"""Unit tests for per-key window operators (FIXTURES.md §D micro-fixtures)."""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from etl_aws_spark.operators import windows as ow


@pytest.fixture(scope="module")
def ticks(spark):
    # 2 keys × 6 days; key 'b' has a gap and non-monotonic insert order
    rows = [
        ("a", dt.date(2024, 1, d), float(v), i)
        for i, (d, v) in enumerate([(1, 10.0), (2, 12.0), (3, 11.0), (4, 15.0), (5, 14.0), (8, 20.0)])
    ] + [
        ("b", dt.date(2024, 1, d), float(v), 100 + i)
        for i, (d, v) in enumerate([(2, 5.0), (1, 4.0), (5, 9.0), (4, 8.0)])
    ]
    return spark.createDataFrame(rows, "key string, d date, v double, rid long")


@pytest.fixture(scope="module")
def W(spark):
    # building a WindowSpec needs an active SparkContext -> fixture, not module global
    return ow.key_window("key", ["d", "rid"])


def rows_for(df, key):
    return [r.asDict() for r in df.filter(F.col("key") == key).orderBy("d").collect()]


def test_lag_diff_warmup_null(ticks, W):
    out = rows_for(ow.lag_diff(ticks, "v", W, "dv"), "a")
    assert out[0]["dv"] is None  # warm-up row
    assert out[1]["dv"] == 2.0
    assert out[2]["dv"] == -1.0


def test_lag_diff_respects_key_boundary(ticks, W):
    out = rows_for(ow.lag_diff(ticks, "v", W, "dv"), "b")
    assert out[0]["dv"] is None  # first row of 'b' must not see 'a' values
    assert out[0]["v"] == 4.0  # ordered by date, not insert order
    assert out[1]["dv"] == 1.0


def test_trailing_frame_excludes_current_row(ticks, W):
    out = rows_for(ow.trailing(ticks, "v", 2, W, stats=("mean",)), "a")
    # row 3 (v=11): mean of previous 2 rows = (10+12)/2, current row excluded
    assert out[2]["rolling_mean_2_v"] == 11.0
    # row 2: only one preceding row
    assert out[1]["rolling_mean_2_v"] == 10.0
    assert out[0]["rolling_mean_2_v"] is None


def test_pct_change(ticks, W):
    out = rows_for(ow.pct_change(ticks, "v", W, "pc"), "a")
    assert out[0]["pc"] is None
    assert out[1]["pc"] == pytest.approx(0.2)


def test_rsi_bounds_and_known_value(ticks, W):
    out = rows_for(ow.rsi(ticks, "v", W, n=3, out="rsi"), "a")
    assert out[0]["rsi"] is None  # no diff yet -> 0/0
    # strictly rising start: all gain -> 100
    assert out[1]["rsi"] == pytest.approx(100.0)
    # rows 2-3: diffs (2, -1) in frame -> up=1, down=0.5 -> 100*1/(1.5)
    assert out[2]["rsi"] == pytest.approx(100.0 * 1.0 / 1.5)
    for r in out:
        if r["rsi"] is not None:
            assert 0.0 <= r["rsi"] <= 100.0


def test_row_number_split(ticks, W):
    out = rows_for(ow.row_number_split(ticks, W, n_train=2, n_test=2), "a")
    assert [r["split"] for r in out] == ["train", "train", "test", "test", None, None]


def test_fill_directions(spark):
    rows = [("k", 1, None), ("k", 2, 5.0), ("k", 3, None), ("k", 4, 7.0), ("k", 5, None)]
    df = spark.createDataFrame(rows, "key string, t int, v double")
    w = ow.key_window("key", ["t"])
    ff = {r["t"]: r["f"] for r in ow.forward_fill(df, "v", w, "f").collect()}
    bf = {r["t"]: r["f"] for r in ow.backward_fill(df, "v", w, "f").collect()}
    assert ff == {1: None, 2: 5.0, 3: 5.0, 4: 7.0, 5: 7.0}
    assert bf == {1: 5.0, 2: 5.0, 3: 7.0, 4: 7.0, 5: None}


def test_glue_feature_block_fillna_only_touches_features(ticks):
    out = ow.glue_feature_block(ticks, "v", key="key", order=["d", "rid"], lags=(1, 2), windows=(2,))
    a = rows_for(out, "a")
    # warm-up rows zero-filled on engineered cols
    assert a[0]["v_diff"] == 0.0
    assert a[0]["lag_1_v_diff"] == 0.0
    assert a[0]["rolling_mean_2_v_diff"] == 0.0
    # source column untouched
    assert a[0]["v"] == 10.0
    # real values intact
    assert a[2]["v_diff"] == -1.0
    # volatility of single diff: stddev_samp of 1 value -> null -> 0.0
    assert a[1]["volatility_2_v_diff"] == 0.0


def test_feature_block_single_exchange(ticks):
    """All window features over one (key, order) must share one shuffle."""
    out = ow.glue_feature_block(ticks, "v", key="key", order=["d", "rid"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
