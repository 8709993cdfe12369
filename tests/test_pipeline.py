"""End-to-end raw→refined pipeline: observe() checkpoints, deterministic
dedup, write layout."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from etl_aws_spark.plans import refined


@pytest.fixture(scope="module")
def raw(spark):
    rows = []
    for day in range(1, 11):
        for key in (1, 2, 3):
            for j in range(2):  # two intraday rows -> dedup keeps first
                rows.append(
                    (
                        day * 100 + key * 10 + j,
                        datetime.datetime(2024, 1, day, 10 + j),
                        key,
                        float(day * key) + j * 0.5,
                    )
                )
    return spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, value double")


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "dim_key long, dim_name string"
    )


def test_pipeline_observations_and_dedup(spark, raw, dim):
    out, obs_raw, obs_joined = refined.refined_pipeline(
        raw,
        dim,
        ts_col="ts",
        key_col="user_id",
        value_col="value",
        order_tail=["ts", "event_id"],
        raw_join_key=F.col("user_id"),
        dim_join_key=F.col("dim_key"),
        dim_cols=["dim_name"],
        date_start="2024-01-03",
        date_end="2024-01-08",
    )
    pdf = out.toPandas()  # the single action; metrics ride along
    # dedup: one row per (key, date) over 6 days x 3 keys
    assert len(pdf) == 18
    # observation checkpoints (reference CHECKPOINT counts, zero extra jobs)
    m_raw = obs_raw.get
    assert m_raw["n_raw"] == 36  # 6 days x 3 keys x 2 intraday
    m_join = obs_joined.get
    assert m_join["n_joined"] == 36
    assert m_join["n_dim_miss"] == 12  # key 3 has no dimension row
    # survivor is the FIRST intraday row (10:00, j=0) -> integer value
    assert (pdf["value"] % 1 == 0).all()
    # warm-up rows zero-filled, never null
    assert pdf["rolling_mean_3_value_diff"].notna().all()


def test_write_refined_layout(spark, raw, dim, tmp_path):
    out, *_ = refined.refined_pipeline(
        raw,
        dim,
        ts_col="ts",
        key_col="user_id",
        value_col="value",
        order_tail=["ts", "event_id"],
        raw_join_key=F.col("user_id"),
        dim_join_key=F.col("dim_key"),
        dim_cols=["dim_name"],
        date_start="2024-01-03",
        date_end="2024-01-08",
    )
    path = str(tmp_path / "refined")
    refined.write_refined(out, path, "date", "user_id")
    back = spark.read.parquet(path)
    assert back.count() == 18
    # partitioned by date only: 6 date dirs, key is a data column
    import os

    dirs = [d for d in os.listdir(path) if d.startswith("date=")]
    assert len(dirs) == 6
    # dynamic overwrite: rewriting one day leaves the others alone
    one_day = out.filter(F.col("date") == "2024-01-05").withColumn(
        "value", F.lit(999.0)
    )
    refined.write_refined(one_day, path, "date", "user_id")
    back2 = spark.read.parquet(path)
    assert back2.count() == 18
    assert back2.filter(F.col("value") == 999.0).count() == 3
