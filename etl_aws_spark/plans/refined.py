"""The raw→refined pipeline: `glue.py:28-292` recomposed from engine
operators, with every hazard fixed.

| reference behavior | fix here |
|---|---|
| ano/mes range conjunction breaks across years (`glue.py:78-83`) | prune on a derived DATE with ``between`` |
| plain shuffle join against an 84-row dim (`glue.py:134`) | explicit ``broadcast()`` |
| ≥8 ``count()`` actions re-run the lineage (`glue.py:89-229`) | one ``observe()`` per stage — metrics ride the single real action |
| ``dropDuplicates`` picks an arbitrary survivor (`glue.py:226`) | ``row_number() = 1`` over an explicit tie-break |
| static overwrite wipes the refined tree (`glue.py:237`) | dynamic partition overwrite |
| (date, acao) partitioning → days×84 tiny files | partition by date, sort within partitions by key |
| two dayofweek conventions (§1.2) | ISO weekday (0=Monday) everywhere |
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F

from etl_aws_spark.operators.windows import key_window


def derive_event_date(df: DataFrame, ts_col: str, out: str = "date") -> DataFrame:
    """Partition-prunable trade date (`glue.py:85-86` built it from path
    parts; with a date column the BETWEEN below prunes partitions and
    survives year boundaries)."""
    return df.withColumn(out, F.to_date(ts_col))


def calendar_features(df: DataFrame, date_col: str) -> DataFrame:
    """ISO weekday + month with cyclic encodings (`glue.py:174-178`,
    `preprocessing.py:194-215` — the two disagreed; this is the single
    engine convention: weekday() 0=Monday, business-day rebase mod 5)."""
    two_pi = 2.0 * math.pi
    dow = F.weekday(date_col)
    month = F.month(date_col)
    return df.withColumns(
        {
            "dayofweek": dow.cast("int"),
            "month": month.cast("int"),
            "day_sin": F.sin(F.lit(two_pi) * (dow % 5) / F.lit(5.0)),
            "day_cos": F.cos(F.lit(two_pi) * (dow % 5) / F.lit(5.0)),
            "month_sin": F.sin(F.lit(two_pi) * month / F.lit(12.0)),
            "month_cos": F.cos(F.lit(two_pi) * month / F.lit(12.0)),
        }
    )


def feature_block(
    df: DataFrame, value: str, key: str, order: Sequence[str]
) -> tuple[DataFrame, list[str]]:
    """The glue.py window block (`glue.py:183-214`): diff, diff lags
    {1,2,3,5}, trailing mean/stddev over (-3,-1) and (-5,-1), zero-filled
    warm-up. One window spec → one exchange for all nine features."""
    w = key_window(key, list(order))
    diff = f"{value}_diff"
    out = df.withColumn(diff, F.col(value) - F.lag(value, 1).over(w))
    lag_cols = {f"lag_{n}_{diff}": F.lag(diff, n).over(w) for n in (1, 2, 3, 5)}
    roll_cols = {}
    for n in (3, 5):
        frame = w.rowsBetween(-n, -1)
        roll_cols[f"rolling_mean_{n}_{diff}"] = F.avg(diff).over(frame)
        roll_cols[f"volatility_{n}_{diff}"] = F.stddev_samp(diff).over(frame)
    out = out.withColumns({**lag_cols, **roll_cols})
    feature_cols = [diff, *lag_cols, *roll_cols]
    return out.fillna(0, subset=feature_cols), feature_cols


def dedup_last_per_key(df: DataFrame, keys: Sequence[str], tiebreak: Sequence[str]) -> DataFrame:
    """Deterministic (keys)-grain dedup: survivor = first row under the
    explicit tie-break (`glue.py:226` used dropDuplicates — arbitrary)."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in tiebreak])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def refined_pipeline(
    raw: DataFrame,
    dim: DataFrame,
    *,
    ts_col: str,
    key_col: str,
    value_col: str,
    order_tail: Sequence[str],
    raw_join_key,
    dim_join_key,
    dim_cols: Sequence[str],
    date_start: str,
    date_end: str,
) -> tuple[DataFrame, Observation, Observation]:
    """Compose the full raw→refined flow. Returns (refined, obs_raw,
    obs_joined): the Observations carry the reference's CHECKPOINT counts
    (`glue.py:93-97,166-170`) without extra actions — read them after the
    caller's single write/collect."""
    obs_raw = Observation("raw")
    obs_joined = Observation("joined")

    dated = derive_event_date(raw, ts_col)
    pruned = dated.filter(F.col("date").between(F.lit(date_start), F.lit(date_end)))
    # observe() forbids DISTINCT aggregates; approx_count_distinct is the
    # right checkpoint metric at scale anyway (HLL, mergeable, no shuffle)
    observed = pruned.observe(
        obs_raw,
        F.count(F.lit(1)).alias("n_raw"),
        F.approx_count_distinct(key_col).alias("n_keys"),
    )

    joined = observed.join(
        F.broadcast(dim.select(dim_join_key.alias("_jk"), *dim_cols)),
        raw_join_key == F.col("_jk"),
        "left",
    ).drop("_jk")
    joined = joined.observe(
        obs_joined,
        F.count(F.lit(1)).alias("n_joined"),
        F.sum(F.col(dim_cols[0]).isNull().cast("long")).alias("n_dim_miss"),
    )

    with_cal = calendar_features(joined, "date")
    featured, _ = feature_block(
        with_cal, value_col, key_col, ["date", *order_tail]
    )
    deduped = dedup_last_per_key(
        featured, [key_col, "date"], [*order_tail]
    )
    return deduped, obs_raw, obs_joined


def write_refined(df: DataFrame, path: str, date_col: str, key_col: str) -> None:
    """Refined layout for scale: partition by date only (not date×key —
    `glue.py:237`'s layout makes days×84 tiny files), rows sorted by key
    within each partition so per-key scans are contiguous; dynamic overwrite
    replaces only touched dates."""
    (
        df.repartition(F.col(date_col))
        .sortWithinPartitions(key_col)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(date_col)
        .parquet(path)
    )
