"""As-of join vs pandas merge_asof; sessionization boundaries."""

from __future__ import annotations

import datetime

import pandas as pd
import pytest

from etl_aws_spark.operators import temporal_joins as tj


def _ts(m):
    return datetime.datetime(2024, 1, 1, 0, m)


def test_asof_join_matches_pandas_merge_asof(spark):
    left_rows = [(1, _ts(m), float(m)) for m in (1, 4, 7, 9)] + [
        (2, _ts(m), float(m)) for m in (2, 8)
    ]
    right_rows = [(1, _ts(m), m * 10.0) for m in (0, 5, 9)] + [(2, _ts(9), 99.0)]
    left = spark.createDataFrame(left_rows, "k long, ts timestamp, v double")
    right = spark.createDataFrame(right_rows, "k long, ts timestamp, p double")
    got = (
        tj.asof_join_backward(left, right, "k", "ts", "ts", ["p"])
        .orderBy("k", "ts")
        .toPandas()
    )
    lp = pd.DataFrame(left_rows, columns=["k", "ts", "v"]).sort_values(["ts", "k"])
    rp = pd.DataFrame(right_rows, columns=["k", "ts", "p"]).sort_values(["ts", "k"])
    expect = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward").sort_values(
        ["k", "ts"]
    )
    assert got["right_p"].fillna(-1).tolist() == expect["p"].fillna(-1).tolist()
    # inclusive: a left row AT a right timestamp sees that right row
    at9 = got[(got.k == 1) & (got.ts == _ts(9))]
    assert at9["right_p"].iloc[0] == 90.0


@pytest.mark.parametrize("tstype", ["timestamp", "timestamp_ntz"])
def test_sessionize_boundaries(spark, tstype):
    # parquet timestamps without a tz annotation arrive as TIMESTAMP_NTZ,
    # for which cast-to-long is illegal — both flavors must analyze AND
    # agree on values (r3 driver regression: temporal_joins.py epoch cast).
    rows = [
        (1, _ts(0)), (1, _ts(10)),          # same session (gap 600 s)
        (1, datetime.datetime(2024, 1, 1, 2, 0)),  # new session
        (2, _ts(5)),
    ]
    df = spark.createDataFrame(rows, f"k long, ts {tstype}")
    out = tj.sessionize(df, "k", "ts", gap_seconds=3600).toPandas()
    sid = {(r.k, r.ts): r.session_id for r in out.itertuples()}
    assert sid[(1, _ts(0))] == sid[(1, _ts(10))] == 1
    assert sid[(1, datetime.datetime(2024, 1, 1, 2, 0))] == 2
    assert sid[(2, _ts(5))] == 1


@pytest.mark.parametrize("tstype", ["timestamp", "timestamp_ntz"])
def test_session_stats_both_timestamp_flavors(spark, tstype):
    rows = [
        (1, _ts(0), 1.0), (1, _ts(10), 2.0),
        (1, datetime.datetime(2024, 1, 1, 2, 0), 4.0),
        (2, _ts(5), 8.0),
    ]
    df = spark.createDataFrame(rows, f"k long, ts {tstype}, v double")
    out = tj.session_stats(df, "k", "ts", gap_seconds=3600, value="v").toPandas()
    got = {(r.k, r.session_id): (r.n_events, r.sum_value) for r in out.itertuples()}
    assert got[(1, 1)] == (2, 3.0)
    assert got[(1, 2)] == (1, 4.0)
    assert got[(2, 1)] == (1, 8.0)


@pytest.mark.parametrize("tstype", ["timestamp", "timestamp_ntz"])
def test_asof_join_both_timestamp_flavors(spark, tstype):
    left = spark.createDataFrame(
        [(1, _ts(4), 4.0), (1, _ts(7), 7.0)], f"k long, ts {tstype}, v double"
    )
    right = spark.createDataFrame(
        [(1, _ts(0), 10.0), (1, _ts(5), 50.0)], f"k long, ts {tstype}, p double"
    )
    got = (
        tj.asof_join_backward(left, right, "k", "ts", "ts", ["p"])
        .orderBy("ts")
        .toPandas()
    )
    assert got["right_p"].tolist() == [10.0, 50.0]


def test_timestamp_consumers_analyze_under_ntz(spark):
    """One-pass NTZ audit: every timestamp-consuming derivation used by the
    suite must at least pass analysis on a TIMESTAMP_NTZ column (the driver
    fixture's flavor can drift with parquet inference — r3 episode)."""
    from pyspark.sql import functions as F

    from etl_aws_spark import functions as fx

    df = spark.createDataFrame([(1, _ts(0), 1.0)], "k long, ts timestamp_ntz, v double")
    derived = df.select(
        F.year("ts"), F.month("ts"), F.dayofmonth("ts"), F.dayofweek("ts"),
        F.date_trunc("day", "ts").alias("d"),
        fx.business_dayofweek("ts").alias("dow"),
        tj._epoch_seconds("ts").alias("epoch"),
    )
    assert len(derived.schema) == 7  # analysis succeeded
    assert derived.collect()[0]["epoch"] == int(
        _ts(0).replace(tzinfo=datetime.timezone.utc).timestamp()
    )
