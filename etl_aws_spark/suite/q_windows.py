"""SURVEY §2.5 window queries on the `events` table.

Role mapping (FIXTURES.md §C): user_id ≡ ticker, ts ≡ trade date,
value ≡ close. Every window is partitionBy(user_id).orderBy(ts, event_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_aws_spark.operators import windows as ow
from etl_aws_spark.registry import load, query
from etl_aws_spark.suite._util import EVENTS_ORDER_SQL, rnd

def _w():
    # lazy: building a WindowSpec needs an active SparkContext
    return ow.key_window("user_id", ["ts", "event_id"])
_OVER = f"OVER (PARTITION BY user_id ORDER BY {EVENTS_ORDER_SQL})"
_KEYS = "event_id, user_id, ts"


@query(
    "window_lag_diff",
    oracle=f"""
    SELECT {_KEYS}, value,
           value - lag(value, 1) {_OVER} AS value_diff
    FROM events
    """,
    category="window",
)
def window_lag_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order per-key difference (`glue.py:183-184`)."""
    df = load(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    return ow.lag_diff(df, "value", _w(), "value_diff")


@query(
    "window_lag_n",
    oracle=f"""
    SELECT {_KEYS}, value,
           lag(value, 1) {_OVER} AS lag_1_value,
           lag(value, 3) {_OVER} AS lag_3_value,
           lag(value, 5) {_OVER} AS lag_5_value
    FROM events
    """,
    category="window",
)
def window_lag_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged features n ∈ {1,3,5} (`glue.py:188-191`)."""
    df = load(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    return ow.lag_features(df, "value", (1, 3, 5), _w())


@query(
    "window_rolling_mean",
    oracle=f"""
    SELECT {_KEYS},
           round(avg(value) {_OVER[:-1]} ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), 4) + 0.0
             AS rolling_mean_3_value
    FROM events
    """,
    category="window",
)
def window_rolling_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing mean over previous 3 rows excluding current (`glue.py:192-194`)."""
    df = load(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    out = ow.trailing(df, "value", 3, _w(), stats=("mean",))
    return out.select(
        "event_id", "user_id", "ts", rnd(F.col("rolling_mean_3_value")).alias("rolling_mean_3_value")
    )


@query(
    "window_rolling_stddev",
    oracle=f"""
    SELECT {_KEYS},
           round(stddev_samp(value) {_OVER[:-1]} ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING), 4) + 0.0
             AS volatility_5_value
    FROM events
    """,
    category="window",
)
def window_rolling_stddev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing sample stddev, frame (-5,-1) (`glue.py:195`)."""
    df = load(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    out = ow.trailing(df, "value", 5, _w(), stats=("stddev",))
    return out.select(
        "event_id", "user_id", "ts", rnd(F.col("volatility_5_value")).alias("volatility_5_value")
    )


@query(
    "window_rolling_sum",
    oracle=f"""
    SELECT {_KEYS},
           round(sum(value) {_OVER[:-1]} ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING), 4) + 0.0
             AS rolling_sum_5_value
    FROM events
    """,
    category="window",
)
def window_rolling_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing sum, frame (-5,-1) (`preprocessing.py:331`)."""
    df = load(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    out = ow.trailing(df, "value", 5, _w(), stats=("sum",))
    return out.select(
        "event_id", "user_id", "ts", rnd(F.col("rolling_sum_5_value")).alias("rolling_sum_5_value")
    )


@query(
    "window_pct_change",
    oracle=f"""
    SELECT {_KEYS},
           round(value / nullif(lag(value, 1) {_OVER}, 0.0) - 1.0, 6) + 0.0 AS pct_change
    FROM events
    """,
    category="window",
)
def window_pct_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x/lag(x,1) - 1 per key (`eda.ipynb` cells 37-38)."""
    df = load(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    out = ow.pct_change(df, "value", _w(), "pct_change")
    return out.select("event_id", "user_id", "ts", rnd(F.col("pct_change"), 6).alias("pct_change"))


@query(
    "window_shift_forward",
    oracle=f"""
    SELECT {_KEYS}, value,
           lag(value, 1) {_OVER} AS prev_value
    FROM events
    """,
    category="window",
)
def window_shift_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """shift(1) leakage guard (`eda.ipynb` cells 37-38)."""
    df = load(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    return df.withColumn("prev_value", F.lag("value", 1).over(_w()))


@query(
    "window_rsi",
    oracle=f"""
    WITH d AS (
      SELECT {_KEYS}, value - lag(value, 1) {_OVER} AS diff
      FROM events
    ), ud AS (
      SELECT event_id, user_id, ts,
             avg(greatest(diff, 0.0)) OVER (PARTITION BY user_id ORDER BY {EVENTS_ORDER_SQL}
                ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS up,
             avg(greatest(-diff, 0.0)) OVER (PARTITION BY user_id ORDER BY {EVENTS_ORDER_SQL}
                ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS down
      FROM d
    )
    SELECT event_id, user_id, ts,
           round(100.0 * up / nullif(up + down, 0.0), 4) + 0.0 AS rsi
    FROM ud
    """,
    category="window",
)
def window_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RSI(14) from clamped up/down moves (`preprocessing.py:337-343`)."""
    df = load(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    out = ow.rsi(df, "value", _w(), n=14, out="rsi")
    return out.select("event_id", "user_id", "ts", rnd(F.col("rsi")).alias("rsi"))


@query(
    "window_first_n_split",
    oracle=f"""
    WITH r AS (
      SELECT {_KEYS}, value,
             row_number() {_OVER} AS rn
      FROM events
    )
    SELECT event_id, user_id, ts, value,
           CASE WHEN rn <= 20 THEN 'train'
                WHEN rn <= 30 THEN 'test' END AS split
    FROM r
    """,
    category="window",
)
def window_first_n_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional per-group train/test split (`train.py:120-147`)."""
    df = load(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    return ow.row_number_split(df, _w(), n_train=20, n_test=10)


@query(
    "stat_autocorr_lag_k",
    oracle=f"""
    WITH l AS (
      SELECT user_id, value,
             lag(value, 1) {_OVER} AS l1,
             lag(value, 2) {_OVER} AS l2
      FROM events
    )
    SELECT user_id,
           round(corr(value, l1), 6) + 0.0 AS acf_1,
           round(corr(value, l2), 6) + 0.0 AS acf_2
    FROM l GROUP BY user_id
    """,
    category="window",
)
def stat_autocorr_lag_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation at lags 1,2 per key (`visualize.py:122-173` ACF data)."""
    df = load(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    lagged = df.select(
        "user_id",
        "value",
        F.lag("value", 1).over(_w()).alias("l1"),
        F.lag("value", 2).over(_w()).alias("l2"),
    )
    return lagged.groupBy("user_id").agg(
        rnd(F.corr("value", "l1"), 6).alias("acf_1"),
        rnd(F.corr("value", "l2"), 6).alias("acf_2"),
    )


@query(
    "window_rolling_minmax",
    oracle=f"""
    SELECT {_KEYS}, value,
           min(value) OVER (PARTITION BY user_id ORDER BY {EVENTS_ORDER_SQL}
               ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING) AS rolling_min_5_value,
           max(value) OVER (PARTITION BY user_id ORDER BY {EVENTS_ORDER_SQL}
               ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING) AS rolling_max_5_value
    FROM events
    """,
    category="window",
)
def window_rolling_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing min/max over the leakage-guard frame (-5,-1) — the support/
    resistance band feature; completes the `trailing` stat family."""
    df = load(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    return ow.trailing(df, "value", 5, _w(), stats=("min", "max"))


@query(
    "window_rolling_mean_minp",
    oracle=f"""
    SELECT {_KEYS},
           CASE WHEN count(value) OVER (PARTITION BY user_id ORDER BY {EVENTS_ORDER_SQL}
                    ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) = 3
                THEN round(avg(value) OVER (PARTITION BY user_id ORDER BY {EVENTS_ORDER_SQL}
                    ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), 4) + 0.0 END
             AS rolling_mean_3_strict
    FROM events
    """,
    category="window",
)
def window_rolling_mean_minp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing mean with pandas `min_periods=window` semantics: NULL until
    the frame is FULL. The reference's two rolling paths disagree here
    (SURVEY §1.2 hazard): `glue.py:192-194` emits partial-frame averages
    then zero-fills; `preprocessing.py:329` (`shift(1).rolling(n).mean()`)
    emits NaN for the first n-1 rows. `window_rolling_mean` is the glue
    semantics; this query is the pandas semantics — both explicit engine
    citizens so a pipeline can pick either, knowingly."""
    df = load(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    frame = _w().rowsBetween(-3, -1)
    strict = F.when(
        F.count("value").over(frame) == 3, rnd(F.avg("value").over(frame))
    )
    return df.select("event_id", "user_id", "ts", strict.alias("rolling_mean_3_strict"))
