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


def test_asof_forward_matches_pandas_merge_asof(spark):
    left = pd.DataFrame({
        "k": [1, 1, 1, 2],
        "ts": pd.to_datetime(["2024-01-01 00:00", "2024-01-01 01:00",
                              "2024-01-01 05:00", "2024-01-01 00:30"]),
        "v": [1.0, 2.0, 3.0, 4.0],
    })
    right = pd.DataFrame({
        "k": [1, 1, 2],
        "ts": pd.to_datetime(["2024-01-01 01:00", "2024-01-01 03:00",
                              "2024-01-01 00:00"]),
        "rv": [10.0, 30.0, 99.0],
    })
    exp = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("ts"),
        on="ts", by="k", direction="forward",
    ).sort_values(["k", "ts"]).reset_index(drop=True)
    ldf = spark.createDataFrame(left)
    rdf = spark.createDataFrame(right)
    out = (
        tj.asof_join_forward(ldf, rdf, key="k", left_ts="ts", right_ts="ts",
                             value_cols=["rv"])
        .orderBy("k", "ts").toPandas()
    )
    # inclusive: the 01:00 left row matches the 01:00 right row
    assert list(out["right_rv"]) == [
        None if pd.isna(x) else x for x in exp["rv"]
    ] or out["right_rv"].equals(exp["rv"])
    assert out.loc[1, "right_rv"] == 10.0  # equal-ts match is inclusive
    assert pd.isna(out.loc[2, "right_rv"])  # nothing after 05:00


@pytest.mark.parametrize("tstype", ["timestamp", "timestamp_ntz"])
def test_bucketed_range_count_equals_naive(spark, tstype):
    base = datetime.datetime(2024, 1, 1)
    pts = [(1, base + datetime.timedelta(minutes=13 * i), float(i)) for i in range(60)]
    pts += [(2, base + datetime.timedelta(minutes=29 * i), 1.0) for i in range(20)]
    p = spark.createDataFrame(pts, f"k long, ts {tstype}, v double")
    wins = [
        (100, 1, base, base + datetime.timedelta(hours=2)),
        (101, 1, base + datetime.timedelta(hours=9), base + datetime.timedelta(hours=11)),
        (102, 2, base + datetime.timedelta(hours=1), base + datetime.timedelta(hours=3)),
        (103, 2, base + datetime.timedelta(days=2), base + datetime.timedelta(days=2, hours=2)),
    ]
    w = spark.createDataFrame(wins, f"win_id long, k long, s {tstype}, e {tstype}")
    out = {
        r.win_id: (r.n_in_range, r.sum_value)
        for r in tj.bucketed_range_count(
            w, p, win_id="win_id", key="k", start_col="s", end_col="e",
            ts_col="ts", value_col="v", bucket_seconds=3600,
        ).collect()
    }
    # naive reference computed in python
    for win_id, k, s, e in wins:
        match = [v for kk, ts, v in pts if kk == k and s <= ts < e]
        assert out[win_id] == (len(match), sum(match) if match else 0.0), win_id
    assert out[103] == (0, 0.0)  # empty window is kept


def test_bucketed_range_join_plans_no_nested_loop(spark):
    base = datetime.datetime(2024, 1, 1)
    p = spark.createDataFrame(
        [(1, base, 1.0)], "k long, ts timestamp, v double"
    )
    w = spark.createDataFrame(
        [(1, 1, base, base + datetime.timedelta(hours=2))],
        "win_id long, k long, s timestamp, e timestamp",
    )
    out = tj.bucketed_range_count(
        w, p, win_id="win_id", key="k", start_col="s", end_col="e",
        ts_col="ts", value_col="v",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_resample_daily_ffill_fills_gaps(spark):
    rows = [
        (1, datetime.datetime(2024, 1, 1, 10), 5.0),
        (1, datetime.datetime(2024, 1, 1, 11), 7.0),
        (1, datetime.datetime(2024, 1, 4, 9), 2.0),   # 2-day gap
        (2, datetime.datetime(2024, 2, 1, 0), 1.0),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    out = tj.resample_daily_ffill(df, key="k", ts_col="ts", value_col="v")
    got = sorted(out.collect(), key=lambda r: (r.k, r.day))
    k1 = [r for r in got if r.k == 1]
    assert [str(r.day) for r in k1] == ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"]
    assert [r.n_events for r in k1] == [2, 0, 0, 1]
    assert [r.daily_sum for r in k1] == [12.0, None, None, 2.0]
    assert [r.carried_sum for r in k1] == [12.0, 12.0, 12.0, 2.0]
    k2 = [r for r in got if r.k == 2]
    assert len(k2) == 1 and k2[0].carried_sum == 1.0


def test_asof_backward_tolerance_boundary(spark):
    # staleness exactly at the bound matches; one microsecond over is null
    import datetime

    from etl_aws_spark.operators.temporal_joins import asof_join_backward

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(1, 7, t0), (2, 8, t0)], "id long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (7, t0 - datetime.timedelta(seconds=1800), 1.0),
            (8, t0 - datetime.timedelta(seconds=1800, microseconds=1), 2.0),
        ],
        "k long, ts timestamp, v double",
    )
    out = asof_join_backward(
        left, right, key="k", left_ts="ts", right_ts="ts",
        value_cols=["v"], tolerance=1800,
    )
    got = {r.id: r.right_v for r in out.collect()}
    assert got == {1: 1.0, 2: None}


def test_asof_nearest_matches_pandas(spark):
    # cross-check against pandas merge_asof(direction='nearest') on random
    # data: same key, ties-to-backward semantics
    import numpy as np
    import pandas as pd

    from etl_aws_spark.operators.temporal_joins import asof_join_nearest

    rng = np.random.RandomState(7)
    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame({
        "id": np.arange(200),
        "k": rng.randint(0, 4, 200),
        "ts": base + pd.to_timedelta(rng.randint(0, 10**6, 200), unit="s"),
    })
    right = pd.DataFrame({
        "k": rng.randint(0, 4, 60),
        "ts": base + pd.to_timedelta(rng.randint(0, 10**6, 60), unit="s"),
        "v": rng.randn(60).round(3),
    }).drop_duplicates(["k", "ts"])
    want = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("ts"),
        on="ts", by="k", direction="nearest", suffixes=("", "_r"),
    ).set_index("id")["v"].to_dict()
    out = asof_join_nearest(
        spark.createDataFrame(left), spark.createDataFrame(right),
        key="k", left_ts="ts", right_ts="ts", value_cols=["v"],
    )
    got = {r.id: r.right_v for r in out.collect()}
    assert set(got) == set(want)
    for i in got:
        a, b = got[i], want[i]
        assert (a is None and pd.isna(b)) or a == b, (i, a, b)
