"""End-to-end pipeline query: the full raw→refined composition
(`plans/refined.py` = glue.py re-built) with a single mirrored SQL oracle.

Role mapping: events ≡ raw quotes (user_id ≡ acao, value ≡ close),
nation ≡ ticker dimension (user_id % 25 ≡ codigo)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_aws_spark.plans import refined
from etl_aws_spark.registry import load, query
from etl_aws_spark.suite._util import rnd

_FEATS = [
    "value_diff",
    "lag_1_value_diff", "lag_2_value_diff", "lag_3_value_diff", "lag_5_value_diff",
    "rolling_mean_3_value_diff", "volatility_3_value_diff",
    "rolling_mean_5_value_diff", "volatility_5_value_diff",
]

_WIN = "PARTITION BY user_id ORDER BY date, ts, event_id"


@query(
    "pipeline_refined",
    oracle=f"""
    WITH pruned AS (
      SELECT *, CAST(ts AS DATE) AS date FROM events
      WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-05' AND DATE '2024-01-25'
    ), joined AS (
      SELECT p.*, n.n_name FROM pruned p
      LEFT JOIN nation n ON p.user_id % 25 = n.n_nationkey
    ), cal AS (
      SELECT *,
             CAST(isodow(date) - 1 AS INT) AS dayofweek,
             CAST(month(date) AS INT) AS month,
             sin(2 * pi() * ((isodow(date) - 1) % 5) / 5.0) AS day_sin,
             cos(2 * pi() * ((isodow(date) - 1) % 5) / 5.0) AS day_cos,
             sin(2 * pi() * month(date) / 12.0) AS month_sin,
             cos(2 * pi() * month(date) / 12.0) AS month_cos
      FROM joined
    ), d1 AS (
      SELECT *, value - lag(value, 1) OVER ({_WIN}) AS value_diff FROM cal
    ), d2 AS (
      SELECT *,
             lag(value_diff, 1) OVER ({_WIN}) AS lag_1_value_diff,
             lag(value_diff, 2) OVER ({_WIN}) AS lag_2_value_diff,
             lag(value_diff, 3) OVER ({_WIN}) AS lag_3_value_diff,
             lag(value_diff, 5) OVER ({_WIN}) AS lag_5_value_diff,
             avg(value_diff) OVER ({_WIN} ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
               AS rolling_mean_3_value_diff,
             stddev_samp(value_diff) OVER ({_WIN} ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
               AS volatility_3_value_diff,
             avg(value_diff) OVER ({_WIN} ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING)
               AS rolling_mean_5_value_diff,
             stddev_samp(value_diff) OVER ({_WIN} ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING)
               AS volatility_5_value_diff
      FROM d1
    ), filled AS (
      SELECT event_id, user_id, date, ts, n_name, dayofweek, month,
             day_sin, day_cos, month_sin, month_cos,
             {", ".join(f"coalesce({c}, 0.0) AS {c}" for c in _FEATS)}
      FROM d2
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY user_id, date ORDER BY ts, event_id) AS rn
      FROM filled
    )
    SELECT user_id, CAST(date AS TIMESTAMP) AS date, n_name, dayofweek, month,
           round(day_sin, 6) + 0.0 AS day_sin, round(day_cos, 6) + 0.0 AS day_cos,
           round(month_sin, 6) + 0.0 AS month_sin, round(month_cos, 6) + 0.0 AS month_cos,
           {", ".join(f"round({c}, 4) + 0.0 AS {c}" for c in _FEATS)}
    FROM ranked WHERE rn = 1
    """,
    category="pipeline",
)
def pipeline_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """glue.py end-to-end (`glue.py:28-292`), all fixes applied: derived-date
    pruning, broadcast dim join, one-exchange window block, observe()
    checkpoints, deterministic dedup. The observations are read by
    tests/test_pipeline.py; here the refined frame is the checked output."""
    raw = load(spark, sf_dir, "events")
    dim = load(spark, sf_dir, "nation")
    out, _, _ = refined.refined_pipeline(
        raw,
        dim,
        ts_col="ts",
        key_col="user_id",
        value_col="value",
        order_tail=["ts", "event_id"],
        raw_join_key=F.col("user_id") % 25,
        dim_join_key=F.col("n_nationkey").cast("bigint"),
        dim_cols=["n_name"],
        date_start="2024-01-05",
        date_end="2024-01-25",
    )
    return out.select(
        "user_id", F.col("date").cast("timestamp").alias("date"), "n_name", "dayofweek", "month",
        rnd(F.col("day_sin"), 6).alias("day_sin"),
        rnd(F.col("day_cos"), 6).alias("day_cos"),
        rnd(F.col("month_sin"), 6).alias("month_sin"),
        rnd(F.col("month_cos"), 6).alias("month_cos"),
        *[rnd(F.col(c)).alias(c) for c in _FEATS],
    )
