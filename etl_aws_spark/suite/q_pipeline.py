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


_PIT_FRAME_SQL = """
    e AS (
      SELECT event_id, user_id, ts, event_type, value,
             epoch_us(ts) AS us,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click
      FROM events
    ), f AS (
      SELECT event_id, user_id, ts, event_type, value,
             sum(is_click) OVER (PARTITION BY user_id ORDER BY us
                 RANGE BETWEEN 604800000000 PRECEDING AND 1 PRECEDING)
               AS clicks_7d,
             last_value(CASE WHEN event_type = 'view' THEN value END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_view_value
      FROM e
    ), frame AS (
      SELECT user_id, ts,
             CAST(round(CAST(value AS DOUBLE) * 100.0) AS BIGINT) AS label_c,
             coalesce(clicks_7d, 0) AS clicks_7d, last_view_value,
             CASE WHEN ts <  TIMESTAMP '2024-01-20' THEN 'train'
                  WHEN ts <  TIMESTAMP '2024-01-25' THEN 'valid'
                  ELSE 'test' END AS split
      FROM f WHERE event_type = 'purchase'
    )
"""


@query(
    "pipeline_feature_store_release",
    oracle=f"""
    WITH {_PIT_FRAME_SQL}, tr AS (
      SELECT DISTINCT user_id FROM frame WHERE split = 'train'
    ), agg AS (
      SELECT split,
             count(*) AS n_rows,
             count(DISTINCT user_id) AS n_users,
             sum(label_c) AS label_sum_c,
             sum(clicks_7d) AS clicks_sum,
             sum(CASE WHEN last_view_value IS NULL THEN 1 ELSE 0 END) AS n_cold
      FROM frame GROUP BY split
    ), ov AS (
      SELECT f.split, count(DISTINCT f.user_id) AS users_seen_in_train
      FROM frame f JOIN tr ON tr.user_id = f.user_id
      GROUP BY f.split
    )
    SELECT a.split,
           CAST(a.n_rows AS BIGINT) AS n_rows,
           CAST(a.n_users AS BIGINT) AS n_users,
           CAST(a.label_sum_c AS BIGINT) AS label_sum_cents,
           round(CAST(a.clicks_sum AS DOUBLE) / a.n_rows, 6) + 0.0
             AS mean_clicks_7d,
           round(CAST(a.n_cold AS DOUBLE) / a.n_rows, 6) + 0.0
             AS cold_start_rate,
           CAST(coalesce(ov.users_seen_in_train, 0) AS BIGINT)
             AS users_seen_in_train
    FROM agg a LEFT JOIN ov ON ov.split = a.split
    """,
    category="pipeline",
)
def pipeline_feature_store_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TABULAR-ML release pipeline END TO END — the feature-store
    sibling of `pipeline_corpus_release`: PIT training frame (the
    `join_point_in_time_features` window plan) → TIME-based train/valid/
    test split (never random: a random split of temporal labels leaks
    future context into training, the `quality_split_leakage_lsh` lesson
    in the tabular world) → per-split release audit: row/user counts,
    exact label sum, mean trailing-click feature, COLD-START rate (labels
    with no prior view — the null-feature share a serving system must
    handle), and user overlap vs train (time splits share users; the
    audit quantifies how much, which decides GroupKFold vs time CV).

    Scale shape: the frame stays on the one per-user shuffle of its
    parent; the split is a row-local CASE; the audit is one groupBy over
    |splits| cells plus a broadcast-sized distinct-user semi-join.
    Label sums fold as exact integer cents."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value",
        F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("us"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is_click"),
    )
    w_range = (
        Window.partitionBy("user_id").orderBy("us").rangeBetween(-604800000000, -1)
    )
    w_rows = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frame = (
        ev.select(
            "user_id",
            "ts",
            "event_type",
            F.round(F.col("value").cast("double") * 100.0)
            .cast("long")
            .alias("label_c"),
            F.coalesce(F.sum("is_click").over(w_range), F.lit(0)).alias(
                "clicks_7d"
            ),
            F.last(
                F.when(F.col("event_type") == "view", F.col("value")),
                ignorenulls=True,
            )
            .over(w_rows)
            .alias("last_view_value"),
        )
        .filter(F.col("event_type") == "purchase")
        .withColumn(
            "split",
            F.when(F.col("ts") < F.lit("2024-01-20").cast("timestamp"), "train")
            .when(F.col("ts") < F.lit("2024-01-25").cast("timestamp"), "valid")
            .otherwise("test"),
        )
    )
    tr = frame.filter(F.col("split") == "train").select("user_id").distinct()
    agg = frame.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum("label_c").alias("label_sum_c"),
        F.sum("clicks_7d").alias("clicks_sum"),
        F.sum(F.when(F.col("last_view_value").isNull(), 1).otherwise(0)).alias(
            "n_cold"
        ),
    )
    ov = (
        frame.join(F.broadcast(tr), "user_id")
        .groupBy("split")
        .agg(F.countDistinct("user_id").alias("users_seen_in_train"))
    )
    return agg.join(ov, "split", "left").select(
        "split",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_users").cast("long").alias("n_users"),
        F.col("label_sum_c").cast("long").alias("label_sum_cents"),
        rnd(F.col("clicks_sum").cast("double") / F.col("n_rows"), 6).alias(
            "mean_clicks_7d"
        ),
        rnd(F.col("n_cold").cast("double") / F.col("n_rows"), 6).alias(
            "cold_start_rate"
        ),
        F.coalesce(F.col("users_seen_in_train"), F.lit(0))
        .cast("long")
        .alias("users_seen_in_train"),
    )
