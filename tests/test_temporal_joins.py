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


def test_sessionize_boundaries(spark):
    rows = [
        (1, _ts(0)), (1, _ts(10)),          # same session (gap 600 s)
        (1, datetime.datetime(2024, 1, 1, 2, 0)),  # new session
        (2, _ts(5)),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp")
    out = tj.sessionize(df, "k", "ts", gap_seconds=3600).toPandas()
    sid = {(r.k, r.ts): r.session_id for r in out.itertuples()}
    assert sid[(1, _ts(0))] == sid[(1, _ts(10))] == 1
    assert sid[(1, datetime.datetime(2024, 1, 1, 2, 0))] == 2
    assert sid[(2, _ts(5))] == 1
