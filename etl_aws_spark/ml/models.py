"""Per-group model fitting, CV folds, splits, validation frames.

Reference surface: `src/model/train.py` (SARIMAX per ticker 250-291, GBT
pipelines 293-352, temporal split 57-92, TimeSeriesSplit folds 14) and
`src/model/utils.py:8-36` (persistence, validation frame).
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def split_by_date(df: DataFrame, date_col: str, cutoff) -> DataFrame:
    """Temporal holdout labeling (`train.py:57-92`): rows before ``cutoff``
    are 'train', the rest 'test'. One expression, no shuffle — downstream
    consumers filter on the label so the scan stays pushdown-friendly."""
    return df.withColumn(
        "split", F.when(F.col(date_col) < F.lit(cutoff), F.lit("train")).otherwise(F.lit("test"))
    )


def time_series_folds(
    df: DataFrame, key: str, order: Sequence[str], n_splits: int
) -> DataFrame:
    """Expanding-window CV fold assignment per key (`train.py:14`,
    sklearn ``TimeSeriesSplit`` semantics): with n rows and k splits,
    test_size = n // (k+1); fold i trains on [0, n-(k-i)·ts) and tests on the
    next ts rows. Emits one row per (row, fold) with a 'train'/'test' role —
    window expressions only, one shuffle on the key.
    """
    w = Window.partitionBy(key).orderBy(*[F.col(c) for c in order])
    wk = Window.partitionBy(key)
    folds = F.sequence(F.lit(0), F.lit(n_splits - 1))
    base = (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wk))
        .withColumn("_ts", F.floor(F.col("_n") / (n_splits + 1)).cast("int"))
        .withColumn("fold", F.explode(folds))
    )
    train_end = F.col("_n") - (n_splits - F.col("fold")) * F.col("_ts")
    role = (
        F.when(F.col("_rn") <= train_end, F.lit("train"))
        .when(F.col("_rn") <= train_end + F.col("_ts"), F.lit("test"))
    )
    return (
        base.withColumn("role", role)
        .filter(F.col("role").isNotNull())
        .drop("_rn", "_n", "_ts")
    )


def validation_frame(
    actuals: DataFrame, preds: DataFrame, keys: Sequence[str], y_real: str, y_pred: str
) -> DataFrame:
    """Assemble the (keys…, y_real, y_pred) validation table
    (`src/model/utils.py:20-36`) via an aligned equi-join — never positional
    concat (the reference's axis-1 concat silently misaligns on reindexed
    frames)."""
    keys = list(keys)
    return (
        actuals.select(*keys, F.col(y_real).alias("y_real"))
        .join(preds.select(*keys, F.col(y_pred).alias("y_pred")), keys)
    )


# ---------------------------------------------------------------------------
# Per-key autoregressive forecasting (train.py:250-291)
# ---------------------------------------------------------------------------

def arx_forecast_per_key(
    df: DataFrame,
    value: str,
    key: str,
    order: Sequence[str],
    steps: int,
    ar_order: int = 1,
) -> DataFrame:
    """Per-key AR(p)-with-trend fit + h-step forecast via ``applyInPandas``
    (`train.py:250-291` fits SARIMAX(1,0,1) per ticker; statsmodels is not
    available in this environment, so the estimator is an exact-OLS ARX(p)
    fitted with ``numpy.linalg.lstsq`` — same applyInPandas plumbing, same
    output shape, deterministic). If statsmodels is importable it is used
    instead (SARIMAX(1,0,1)).

    Output: (key, step, yhat) with step ∈ 1..steps. One shuffle on the key;
    each group is one ticker's history (bounded), the canonical grouped-map
    pattern.
    """
    order = list(order)
    # Derive the key field's type from the input schema: the reference keys
    # series by ticker STRINGS (train.py:250), so hard-coding `long` would
    # fail or miscast at the Arrow boundary for non-bigint keys.
    key_type = df.schema[key].dataType.simpleString()
    schema = f"`{key}` {key_type}, step int, yhat double"

    def fit_forecast(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values(order, kind="mergesort")
        y = pdf[value].to_numpy(dtype=float)
        k = pdf[key].iloc[0]
        try:  # optional native path
            from statsmodels.tsa.statespace.sarimax import SARIMAX  # noqa

            model = SARIMAX(y, order=(1, 0, 1)).fit(disp=False)
            fc = model.forecast(steps)
        except Exception:
            p = ar_order
            if len(y) <= p + 2:
                fc = np.full(steps, y.mean() if len(y) else np.nan)
            else:
                X = np.column_stack(
                    [np.ones(len(y) - p)] + [y[p - j - 1 : len(y) - j - 1] for j in range(p)]
                )
                beta, *_ = np.linalg.lstsq(X, y[p:], rcond=None)
                hist = list(y)
                fc = []
                for _ in range(steps):
                    x = np.array([1.0] + [hist[-j - 1] for j in range(p)])
                    nxt = float(x @ beta)
                    fc.append(nxt)
                    hist.append(nxt)
                fc = np.array(fc)
        return pd.DataFrame(
            {key: k, "step": np.arange(1, steps + 1, dtype="int32"), "yhat": fc}
        )

    return df.select(key, *order, value).groupBy(key).applyInPandas(fit_forecast, schema=schema)


def ar1_forecast_closed_form(
    df: DataFrame, value: str, key: str, order: Sequence[str], steps: int
) -> DataFrame:
    """AR(1)-with-intercept forecast per key in CLOSED FORM — no UDF, no
    solver: φ = covar_pop(y, y₋₁)/var_pop(y₋₁), c = ȳ − φ·ȳ₋₁, and the
    h-step forecast telescopes to c·(1−φ^h)/(1−φ) + φ^h·y_last (drift
    limit c·h + y_last as φ→1). One window pass + one aggregate + a
    5-element explode: the entire model fit is whole-stage-codegen'd
    relational algebra, the fully-declarative twin of
    `arx_forecast_per_key`."""
    w = Window.partitionBy(key).orderBy(*[F.col(c) for c in order])
    lagged = df.select(
        key,
        F.col(value).alias("_y"),
        F.lag(value, 1).over(w).alias("_yl"),
        *[F.col(c) for c in order],
    )
    stats = lagged.groupBy(key).agg(
        (F.covar_pop("_y", "_yl") / F.var_pop("_yl")).alias("_phi"),
        F.avg(F.when(F.col("_yl").isNotNull(), F.col("_y"))).alias("_my"),
        F.avg("_yl").alias("_mx"),
        F.max_by("_y", F.col(order[0])).alias("_ylast"),
    )
    base = stats.select(
        key,
        "_phi",
        (F.col("_my") - F.col("_phi") * F.col("_mx")).alias("_c"),
        "_ylast",
        F.explode(F.sequence(F.lit(1), F.lit(steps))).alias("step"),
    )
    phi_k = F.pow("_phi", F.col("step"))
    geo = F.coalesce(
        (1.0 - phi_k) / F.nullif(1.0 - F.col("_phi"), F.lit(0.0)),
        F.col("step").cast("double"),
    )
    return base.select(
        key,
        F.col("step").cast("int").alias("step"),
        (F.col("_c") * geo + phi_k * F.col("_ylast")).alias("yhat"),
    )


# ---------------------------------------------------------------------------
# Gradient-boosted trees via Spark ML (train.py:319-352)
# ---------------------------------------------------------------------------

def gbt_fit_predict(
    df: DataFrame,
    features: Sequence[str],
    target: str,
    keys: Sequence[str],
    max_iter: int = 10,
    max_depth: int = 3,
    seed: int = 42,
    fit_df: DataFrame | None = None,
):
    """Fit a ``GBTRegressor`` on the feature columns and score ``df``
    (`train.py:319-352` trains CatBoost/XGB/LGBM single-node; Spark ML trains
    distributed). Pass ``fit_df`` to train on a (deterministic) sample while
    scoring the full frame — each boosting iteration is a full pass over the
    training data, so at scale you fit on a sample and score everything.
    Returns (predictions DataFrame, fitted PipelineModel).
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import GBTRegressor

    assembler = VectorAssembler(inputCols=list(features), outputCol="_features")
    gbt = GBTRegressor(
        featuresCol="_features", labelCol=target, predictionCol="yhat",
        maxIter=max_iter, maxDepth=max_depth, seed=seed, stepSize=0.1,
    )
    model = Pipeline(stages=[assembler, gbt]).fit(df if fit_df is None else fit_df)
    preds = model.transform(df).select(*keys, target, "yhat")
    return preds, model


def persist_pipeline(model, path: str):
    """Round-trip a fitted PipelineModel through disk
    (`src/model/utils.py:8-13` pickles; Spark ML uses its own writer so the
    artifact is executor-loadable). Returns the reloaded model."""
    from pyspark.ml import PipelineModel

    model.write().overwrite().save(path)
    return PipelineModel.load(path)
