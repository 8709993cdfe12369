"""Per-group model fitting, CV folds, splits, validation frames.

Reference surface: `src/model/train.py` (SARIMAX per ticker 250-291, GBT
pipelines 293-352, temporal split 57-92, TimeSeriesSplit folds 14) and
`src/model/utils.py:8-36` (persistence, validation frame).
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
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

def css_refine(y, X, c, phi, theta, beta, n_iter: int = 30):
    """Conditional-sum-of-squares refinement of ARMAX(1,0,1) parameters by
    damped Gauss–Newton (Levenberg), starting from Hannan–Rissanen
    estimates.

    CSS — minimize S(c,φ,θ,β) = Σ_t e_t² with e_0 := 0 and
    e_t = y_t − (c + φ·y_{t−1} + θ·e_{t−1} + β·x_t) — is the conditional
    Gaussian (negative log-)likelihood up to a monotone transform, i.e. the
    same objective statsmodels' ``SARIMAX(..., method='css')`` minimizes
    and the large-n limit of its exact MLE (the reference fit,
    `/root/reference/src/model/train.py:250-291`). Two-stage OLS alone is
    consistent but not efficient; this closes the estimator gap with
    public textbook machinery only (Box–Jenkins §7.1 conditional least
    squares).

    The Jacobian follows the innovation recursion: each ∂e_t/∂p obeys the
    same AR(1)-in-θ filter ∂e_t/∂p = −s_t − θ·∂e_{t−1}/∂p with signal
    s_t ∈ {1, y_{t−1}, e_{t−1}, x_t}. Deterministic; diverging steps are
    rejected by the damping loop, and a non-finite state returns the start
    values untouched (the HR fit), so this is strictly-no-worse.

    Returns (c, φ, θ, β, e) with e the length-n innovation array under the
    refined parameters (e[0] = 0), ready for forecasting.
    """
    import numpy as np

    n = len(y)
    k_x = 0 if X is None else X.shape[1]
    p = np.concatenate([[c, phi, theta], np.asarray(beta, dtype=float)])

    def innovations(p):
        c_, phi_, theta_ = p[0], p[1], p[2]
        b_ = p[3:]
        e = np.zeros(n)
        for t in range(1, n):
            xb = float(X[t] @ b_) if k_x else 0.0
            e[t] = y[t] - c_ - phi_ * y[t - 1] - theta_ * e[t - 1] - xb
        return e

    def jacobian(p, e):
        theta_ = p[2]
        J = np.zeros((n, 3 + k_x))
        for t in range(1, n):
            J[t, 0] = -1.0 - theta_ * J[t - 1, 0]
            J[t, 1] = -y[t - 1] - theta_ * J[t - 1, 1]
            J[t, 2] = -e[t - 1] - theta_ * J[t - 1, 2]
            if k_x:
                J[t, 3:] = -X[t] - theta_ * J[t - 1, 3:]
        return J

    e = innovations(p)
    if not np.isfinite(e).all():
        return c, phi, theta, np.asarray(beta, dtype=float), e
    sse = float(e[1:] @ e[1:])
    lam = 1e-3
    for _ in range(n_iter):
        J = jacobian(p, e)
        A = J[1:].T @ J[1:]
        g = J[1:].T @ e[1:]
        improved = False
        for _try in range(8):
            damp = lam * (np.diag(np.diag(A)) + 1e-12 * np.eye(len(p)))
            try:
                step = np.linalg.solve(A + damp, g)
            except np.linalg.LinAlgError:
                lam *= 10.0
                continue
            p_new = p - step
            p_new[1] = float(np.clip(p_new[1], -0.995, 0.995))
            p_new[2] = float(np.clip(p_new[2], -0.995, 0.995))
            e_new = innovations(p_new)
            sse_new = float(e_new[1:] @ e_new[1:]) if np.isfinite(e_new).all() else float("inf")
            if sse_new < sse:
                p, e, improved = p_new, e_new, True
                rel = (sse - sse_new) / max(sse, 1e-300)
                sse = sse_new
                lam = max(lam / 10.0, 1e-12)
                if rel < 1e-12:
                    n_iter = 0  # converged — outer loop exits next check
                break
            lam *= 10.0
        if not improved or n_iter == 0:
            break
    return float(p[0]), float(p[1]), float(p[2]), p[3:].copy(), e


def hannan_rissanen_armax(
    y,
    X=None,
    X_future=None,
    steps: int = 5,
    n_iter: int = 2,
    refine: str | None = "css",
):
    """Pure-numpy ARMAX(1, 0, 1) fit + h-step forecast — the estimator
    behind :func:`arx_forecast_per_key`, factored out so tests can pin the
    Spark output against this exact function (tests/test_ml.py).

    Hannan–Rissanen two-stage least squares, the classical statsmodels-free
    route to the reference's SARIMAX(1,0,1)-with-exog per ticker
    (`train.py:250-291`, ``ORDEM_ARIMA = (1, 0, 1)``):

    1. long-AR stage: OLS of y_t on [1, y_{t-1..t-p_long}, x_t] gives
       innovation estimates ê_t (ê := 0 before the window);
    2. ARMAX stage: OLS of y_t on [1, y_{t-1}, ê_{t-1}, x_t] gives
       (c, φ, θ, β);
    3. ``n_iter`` refinements: rebuild ê from the fitted recursion
       ê_t = y_t − (c + φ·y_{t-1} + θ·ê_{t-1} + β·x_t), refit stage 2.

    With ``refine="css"`` (default) the HR estimates then seed
    :func:`css_refine`, aligning the estimator with the reference's MLE fit
    (HR alone is consistent but not efficient; the CSS optimum coincides
    with conditional maximum likelihood under Gaussian errors).

    Forecasts use the standard conditional expectation: step 1 carries the
    last in-sample innovation through θ, steps ≥ 2 have E[e] = 0, the AR
    term telescopes on its own forecasts. ``X_future`` (steps × k) supplies
    future exog; defaults to the last observed row held constant.

    Returns (params dict, np.ndarray forecasts of length ``steps``).
    """
    import numpy as np

    y = np.asarray(y, dtype=float)
    n = len(y)
    if X is not None:
        X = np.asarray(X, dtype=float)
        if X.ndim == 1:
            X = X[:, None]
        k_x = X.shape[1]
    else:
        k_x = 0
    # Too short for two-stage estimation: mean forecast. 12 is the floor at
    # which stage 1 (p_long >= 4) keeps at least 8 regression rows — n=8
    # left only ~5 rows and the unconstrained OLS routinely exploded.
    if n < 12:
        mu = float(y.mean()) if n else float("nan")
        return {"c": mu, "phi": 0.0, "theta": 0.0, "beta": [0.0] * k_x}, np.full(steps, mu)

    def _mean_fallback():
        mu = float(y.mean())
        return {"c": mu, "phi": 0.0, "theta": 0.0, "beta": [0.0] * k_x}, np.full(steps, mu)

    def _x(t0, t1):
        return [X[t0:t1]] if k_x else []

    # stage 1: long autoregression for innovation estimates
    p_long = int(min(max(4, round(np.sqrt(n))), n // 2 - 1))
    rows = n - p_long
    design = np.column_stack(
        [np.ones(rows)]
        + [y[p_long - j - 1 : n - j - 1] for j in range(p_long)]
        + _x(p_long, n)
    )
    coef, *_ = np.linalg.lstsq(design, y[p_long:], rcond=None)
    e = np.zeros(n)
    e[p_long:] = y[p_long:] - design @ coef

    # stage 2 (+ refinements): ARMAX(1,1) regression on lagged y and ê
    c = phi = theta = 0.0
    beta = np.zeros(k_x)
    for _ in range(1 + n_iter):
        d2 = np.column_stack([np.ones(n - 1), y[:-1], e[:-1]] + _x(1, n))
        coef2, *_ = np.linalg.lstsq(d2, y[1:], rcond=None)
        c, phi, theta = float(coef2[0]), float(coef2[1]), float(coef2[2])
        beta = coef2[3:]
        # Stationarity/invertibility guard: the reference's SARIMAX(1,0,1)
        # constrains |phi| < 1 and |theta| < 1 (train.py:250-291); the
        # unconstrained stage-2 OLS can return coefficients far outside the
        # stable region on short noisy series, after which the innovation
        # recursion and the h-step forecast both diverge geometrically.
        # Clip into (-0.99, 0.99) and re-derive (c, beta) by OLS with
        # (phi, theta) held fixed so the intercept stays consistent.
        if abs(phi) >= 0.99 or abs(theta) >= 0.99:
            phi = float(np.clip(phi, -0.99, 0.99))
            theta = float(np.clip(theta, -0.99, 0.99))
            resid = y[1:] - phi * y[:-1] - theta * e[:-1]
            d_cb = np.column_stack([np.ones(n - 1)] + _x(1, n))
            coef_cb, *_ = np.linalg.lstsq(d_cb, resid, rcond=None)
            c = float(coef_cb[0])
            beta = coef_cb[1:] if k_x else np.zeros(0)
        # rebuild innovations from the fitted recursion (e_0 := 0)
        e = np.zeros(n)
        for t in range(1, n):
            xb = float(X[t] @ beta) if k_x else 0.0
            e[t] = y[t] - (c + phi * y[t - 1] + theta * e[t - 1] + xb)
        # Even inside the clipped region the rebuilt innovations can blow up
        # when the exog fit is degenerate — bail to the mean forecast rather
        # than emit absurd yhat (this query is rows-only; no oracle catches it).
        scale = float(np.abs(y).max()) + 1.0
        if not np.isfinite(e).all() or float(np.abs(e).max()) > 1e6 * scale:
            return _mean_fallback()

    if refine == "css":
        c, phi, theta, beta, e = css_refine(y, X, c, phi, theta, beta)

    if k_x:
        if X_future is None:
            X_future = np.repeat(X[-1][None, :], steps, axis=0)
        else:
            X_future = np.asarray(X_future, dtype=float).reshape(steps, k_x)
    fc = np.empty(steps)
    prev, e_prev = y[-1], e[-1]
    for h in range(steps):
        xb = float(X_future[h] @ beta) if k_x else 0.0
        fc[h] = c + phi * prev + theta * e_prev + xb
        prev, e_prev = fc[h], 0.0  # E[e_{n+h}] = 0 for h >= 1
    params = {"c": c, "phi": phi, "theta": theta, "beta": [float(b) for b in beta]}
    return params, fc


def arx_forecast_per_key(
    df: DataFrame,
    value: str,
    key: str,
    order: Sequence[str],
    steps: int,
    exog: Sequence[str] = (),
) -> DataFrame:
    """Per-key ARMAX(1, 0, 1) fit + h-step forecast via ``applyInPandas``,
    mirroring `train.py:250-291` (SARIMAX(1,0,1) with exogenous regressors
    per ticker, ``treinar_sarimax_por_acao_com_exog``). The estimator is
    :func:`hannan_rissanen_armax` — pure numpy, deterministic, no
    statsmodels dependency; future exog holds the last observed row.

    Output: (key, step, yhat) with step ∈ 1..steps. One shuffle on the key;
    each group is one ticker's history (bounded), the canonical grouped-map
    pattern — at 100 TB the shuffle carries only (key, order, value, exog).
    """
    order = list(order)
    exog = list(exog)
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
        X = pdf[exog].to_numpy(dtype=float) if exog else None
        k = pdf[key].iloc[0]
        _, fc = hannan_rissanen_armax(y, X, steps=steps)
        return pd.DataFrame(
            {key: k, "step": np.arange(1, steps + 1, dtype="int32"), "yhat": fc}
        )

    return (
        df.select(key, *order, value, *exog)
        .groupBy(key)
        .applyInPandas(fit_forecast, schema=schema)
    )


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

def _gbt_pipeline(
    features: Sequence[str],
    target: str,
    categorical: Sequence[str] = (),
    max_iter: int = 10,
    max_depth: int = 3,
    step_size: float = 0.1,
    seed: int = 42,
):
    """Assemble the StringIndexer* → VectorAssembler → GBTRegressor pipeline.

    Categorical columns take the reference's CatBoost ``cat_features`` role
    (`train.py:319-352`): StringIndexer (handleInvalid='keep' so unseen
    levels score instead of failing) feeds the indexed column to the trees,
    which split natively on the index — no one-hot blow-up.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import StringIndexer, VectorAssembler
    from pyspark.ml.regression import GBTRegressor

    categorical = list(categorical)
    indexers = [
        StringIndexer(inputCol=c, outputCol=f"_idx_{c}", handleInvalid="keep")
        for c in categorical
    ]
    assembler = VectorAssembler(
        inputCols=list(features) + [f"_idx_{c}" for c in categorical],
        outputCol="_features",
    )
    gbt = GBTRegressor(
        featuresCol="_features", labelCol=target, predictionCol="yhat",
        maxIter=max_iter, maxDepth=max_depth, seed=seed, stepSize=step_size,
        maxBins=64,
    )
    return Pipeline(stages=[*indexers, assembler, gbt])


def gbt_fit_predict(
    df: DataFrame,
    features: Sequence[str],
    target: str,
    keys: Sequence[str],
    max_iter: int = 10,
    max_depth: int = 3,
    seed: int = 42,
    fit_df: DataFrame | None = None,
    categorical: Sequence[str] = (),
):
    """Fit a ``GBTRegressor`` on the feature columns and score ``df``
    (`train.py:319-352` trains CatBoost/XGB/LGBM single-node; Spark ML trains
    distributed). Pass ``fit_df`` to train on a (deterministic) sample while
    scoring the full frame — each boosting iteration is a full pass over the
    training data, so at scale you fit on a sample and score everything.
    ``categorical`` columns go through StringIndexer into the trees (the
    CatBoost ``cat_features`` analogue). Returns (predictions DataFrame,
    fitted PipelineModel).
    """
    pipe = _gbt_pipeline(
        features, target, categorical=categorical,
        max_iter=max_iter, max_depth=max_depth, seed=seed,
    )
    model = pipe.fit(df if fit_df is None else fit_df)
    preds = model.transform(df).select(*keys, target, "yhat")
    return preds, model


def rf_fit_predict(
    df: DataFrame,
    features: Sequence[str],
    target: str,
    keys: Sequence[str],
    num_trees: int = 20,
    max_depth: int = 5,
    seed: int = 42,
    fit_df: DataFrame | None = None,
    categorical: Sequence[str] = (),
):
    """Random-forest twin of :func:`gbt_fit_predict` — the second tree
    family from the reference's model zoo (`train.py:293-352` trains
    XGB/LGBM/CatBoost AND RandomForest; Spark ML's ``RandomForestRegressor``
    is the distributed analogue). Bagged trees train independently, so —
    unlike boosting's serial full passes — the ensemble parallelizes across
    the cluster per tree; same sample-fit/full-score discipline.
    Returns (predictions DataFrame, fitted PipelineModel)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import StringIndexer, VectorAssembler
    from pyspark.ml.regression import RandomForestRegressor

    categorical = list(categorical)
    indexers = [
        StringIndexer(inputCol=c, outputCol=f"_idx_{c}", handleInvalid="keep")
        for c in categorical
    ]
    assembler = VectorAssembler(
        inputCols=list(features) + [f"_idx_{c}" for c in categorical],
        outputCol="_features",
    )
    rf = RandomForestRegressor(
        featuresCol="_features", labelCol=target, predictionCol="yhat",
        numTrees=num_trees, maxDepth=max_depth, seed=seed, maxBins=64,
    )
    model = Pipeline(stages=[*indexers, assembler, rf]).fit(
        df if fit_df is None else fit_df
    )
    preds = model.transform(df).select(*keys, target, "yhat")
    return preds, model


def prediction_attribution_ablate(
    model,
    df: DataFrame,
    features: Sequence[str],
    keys: Sequence[str],
    scorer=None,
) -> DataFrame:
    """PER-PREDICTION feature attribution by mean ablation — the
    data product behind the reference's SHAP summary/force plots
    (`src/model/metrics_visualizer.py:501-530`) without any SHAP library:
    for each feature f, re-score the frame with f replaced by its global
    mean and report ``contrib_f = yhat − yhat_{f←mean}`` per row. Positive
    contrib = the row's actual value of f pushes the prediction up
    relative to an average-f row.

    Execution shape chosen for scale: every ablation variant is tagged and
    UNIONED, the model scores the union in ONE distributed transform, and a
    keys-pivot on the variant tag reassembles per-row contributions — one
    scoring pass over (|features|+1)·N rows and ONE shuffle (the pivot),
    instead of |features| binary shuffle joins. No per-row Python. (Exact
    TreeSHAP needs per-leaf path weights Spark ML doesn't expose;
    mean-ablation is the standard public fallback and shares its
    sign/ordering on additive signals.)

    Output: keys, yhat, one ``contrib_<f>`` column per feature.
    """
    from functools import reduce

    features = list(features)
    keys = list(keys)
    # the pivot's F.first would silently collapse duplicate keys into
    # arbitrary per-variant picks — fail loudly instead (cheap: limit(1)
    # short-circuits the probe)
    if df.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).count():
        raise ValueError(
            f"prediction_attribution_ablate requires unique keys {keys}; "
            "duplicate key rows would make contributions arbitrary"
        )
    means = df.agg(*[F.avg(f).alias(f) for f in features]).first()
    # an all-NULL feature has no ablation baseline; its contribution is 0
    # by definition — skip the variant, emit a 0.0 column to keep schema
    live = [f for f in features if means[f] is not None]
    variants = [df.withColumn("_variant", F.lit("__base__"))] + [
        df.withColumn(f, F.lit(float(means[f]))).withColumn("_variant", F.lit(f))
        for f in live
    ]
    unioned = reduce(DataFrame.unionByName, variants)
    # scorer: optional callable(df) -> df + "yhat" column for replayable
    # declarative models (r9: the stump booster); defaults to the Spark ML
    # pipeline transform
    scored_df = scorer(unioned) if scorer is not None else model.transform(unioned)
    scored = scored_df.select(*keys, "_variant", "yhat")
    wide = (
        scored.groupBy(*keys)
        .pivot("_variant", ["__base__", *live])
        .agg(F.first("yhat"))
    )
    return wide.select(
        *keys,
        F.col("__base__").alias("yhat"),
        *[
            (F.col("__base__") - F.col(f)).alias(f"contrib_{f}")
            if f in set(live)
            else F.lit(0.0).alias(f"contrib_{f}")
            for f in features
        ],
    )


def _temporal_folds(
    df: DataFrame,
    time_col: str,
    n_splits: int,
    fit_partitions: int | None,
    caller: str,
):
    """Build persisted expanding-window temporal folds by exact
    time-percentile cutoffs (shared by grid and halving search). Returns
    (all_folds, live_folds); caller must unpersist all_folds."""
    fracs = [i / (n_splits + 1.0) for i in range(1, n_splits + 2)]
    cuts = df.agg(
        *[
            F.percentile(F.col(time_col).cast("double"), F.lit(q)).alias(f"c{i}")
            for i, q in enumerate(fracs)
        ]
    ).first()
    folds = []
    t = F.col(time_col).cast("double")
    for i in range(n_splits):
        train = df.filter(t <= F.lit(cuts[i]))
        val = df.filter((t > F.lit(cuts[i])) & (t <= F.lit(cuts[i + 1])))
        if fit_partitions:
            # searches run on a small sample — right-size its partition
            # count so each boosting iteration isn't dominated by empty-task
            # scheduling overhead
            train, val = train.coalesce(fit_partitions), val.coalesce(fit_partitions)
        # every candidate re-reads each fold: persist once, not |grid| scans
        folds.append((train.persist(), val.persist()))
    # one count pass over the persisted folds, then drop degenerate ones
    # (empty train would fail inside pipe.fit; empty val yields NULL rmse)
    live = [(train, val) for train, val in folds if train.count() > 0 and val.count() > 0]
    if not live:
        for train, val in folds:
            train.unpersist()
            val.unpersist()
        raise ValueError(
            f"{caller}: every fold over '{time_col}' has an "
            "empty train or validation slice — the time column is too "
            "coarse/skewed for the requested n_splits"
        )
    return folds, live


def gbt_grid_search_temporal(
    df: DataFrame,
    features: Sequence[str],
    target: str,
    time_col: str,
    grid: Sequence[dict] | None = None,
    n_splits: int = 2,
    categorical: Sequence[str] = (),
    seed: int = 42,
    refit: bool = True,
    fit_partitions: int | None = None,
    parallelism: int = 4,
):
    """Hyperparameter search over ``GBTRegressor`` with EXPANDING-WINDOW
    temporal folds — the reference's ``RandomizedSearchCV(cv=TimeSeriesSplit)``
    shape (`train.py:14`, `notebooks/model_evaluation.ipynb` XGB/LGBM/CatBoost
    grids). Spark ML's CrossValidator randomizes folds, which leaks future
    rows into training for time-series data, so the folds here are built by
    exact time-percentile cutoffs: fold i trains on the first (i+1)/(k+1) of
    the timeline and validates on the next 1/(k+1) slice.

    Each candidate×fold fit is a distributed Spark job (same execution model
    as CrossValidator); up to ``parallelism`` candidates fit concurrently
    from a bounded thread pool (CrossValidator's ``parallelism`` knob —
    Spark's scheduler is thread-safe, and the folds are persisted once so
    concurrent fits share cached input). Candidates are ranked by mean
    validation RMSE. Folds whose train or validation slice is empty (coarse
    or skewed time columns can make adjacent percentile cutoffs equal) are
    skipped up front; if every fold is degenerate a ValueError names the
    time column. Returns (results DataFrame ordered best-first, best
    PipelineModel refit on the full frame). The results frame is
    driver-built but tiny (|grid| rows) — the data never leaves the cluster.
    """
    if grid is None:
        grid = [
            {"max_depth": d, "max_iter": it, "step_size": s}
            for d in (3, 5)
            for it in (5, 10)
            for s in (0.1,)
        ]
    # exact percentile cutoffs over the timeline (one tiny aggregate row)
    folds, live = _temporal_folds(
        df, time_col, n_splits, fit_partitions, "gbt_grid_search_temporal"
    )

    try:
        def _evaluate(params: dict) -> tuple:
            rmses = []
            for train, val in live:
                pipe = _gbt_pipeline(
                    features, target, categorical=categorical, seed=seed, **params
                )
                model = pipe.fit(train)
                err = F.col(target) - F.col("yhat")
                rmse = (
                    model.transform(val)
                    .agg(F.sqrt(F.avg(err * err)).alias("rmse"))
                    .first()["rmse"]
                )
                if rmse is None:  # all-null target in the slice
                    continue
                rmses.append(float(rmse))
            avg = sum(rmses) / len(rmses) if rmses else float("inf")
            return (params["max_depth"], params["max_iter"], params["step_size"], avg)

        if parallelism > 1 and len(grid) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(parallelism, len(grid))) as pool:
                rows = list(pool.map(_evaluate, grid))
        else:
            rows = [_evaluate(p) for p in grid]

        spark = df.sparkSession
        res = spark.createDataFrame(
            rows, "max_depth int, max_iter int, step_size double, avg_rmse double"
        )
        res = res.withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(
                    F.col("avg_rmse").asc(), F.col("max_depth").asc(),
                    F.col("max_iter").asc(), F.col("step_size").asc(),
                )
            ).cast("int"),
        )
        best_model = None
        if refit:
            best = min(rows, key=lambda r: (r[3], r[0], r[1], r[2]))
            best_params = {"max_depth": best[0], "max_iter": best[1], "step_size": best[2]}
            best_model = _gbt_pipeline(
                features, target, categorical=categorical, seed=seed, **best_params
            ).fit(df)
        return res, best_model
    finally:
        for train, val in folds:
            train.unpersist()
            val.unpersist()


def gbt_halving_search_temporal(
    df: DataFrame,
    features: Sequence[str],
    target: str,
    time_col: str,
    grid: Sequence[dict] | None = None,
    n_splits: int = 2,
    categorical: Sequence[str] = (),
    seed: int = 42,
    factor: int = 3,
    min_resource_frac: float = 0.25,
    refit: bool = True,
    fit_partitions: int | None = None,
    parallelism: int = 4,
):
    """SUCCESSIVE-HALVING hyperparameter search over ``GBTRegressor`` with
    the same expanding-window temporal folds as
    :func:`gbt_grid_search_temporal` — the reference's
    ``HalvingRandomSearchCV`` (`train.py:14`, `model_evaluation.ipynb`
    cells 51-61) re-expressed for Spark.

    Rung r evaluates the surviving candidates on a deterministic
    ``min_resource_frac·factor^r`` sample of each training fold (sampled
    once per rung and persisted, shared across candidates), keeps the top
    ``ceil(n/factor)`` by mean validation RMSE, and grows the resource —
    so losing configurations cost a fraction of a full fit. Total fit work
    is O(|grid|·min_frac + |grid|/factor·min_frac·factor + ...) ≈ a couple
    of full-grid rungs instead of |grid| full fits — the point of halving
    at 100 TB, where each boosting iteration is a full pass over the
    sample.

    Validation always runs on the FULL fold slice (sampling the metric
    would add noise exactly where decisions are made — matches sklearn,
    which subsamples only the training resource). Deterministic: sampling
    is seeded per rung, ties break on the params tuple.

    Returns (results DataFrame: one row per candidate×rung evaluation with
    ``rank`` = 1 for the winner, best PipelineModel refit on the full
    frame if ``refit``).
    """
    import math

    if grid is None:
        grid = [
            {"max_depth": d, "max_iter": it, "step_size": s}
            for d in (3, 5)
            for it in (5, 10)
            for s in (0.1,)
        ]
    folds, live = _temporal_folds(
        df, time_col, n_splits, fit_partitions, "gbt_halving_search_temporal"
    )
    rung_caches: list = []

    def _params_key(p: dict) -> tuple:
        return (p["max_depth"], p["max_iter"], p["step_size"])

    try:
        rows = []
        candidates = sorted(grid, key=_params_key)
        frac = float(min_resource_frac)
        rung = 0
        final_scores: dict[tuple, tuple] = {}
        while True:
            if frac >= 1.0:
                rung_folds = live
            else:
                rung_folds = [
                    (train.sample(fraction=frac, seed=seed + rung).persist(), val)
                    for train, val in live
                ]
                rung_caches.extend(t for t, _ in rung_folds)

            def _evaluate(params: dict) -> float:
                rmses = []
                for train, val in rung_folds:
                    pipe = _gbt_pipeline(
                        features, target, categorical=categorical, seed=seed, **params
                    )
                    model = pipe.fit(train)
                    err = F.col(target) - F.col("yhat")
                    rmse = (
                        model.transform(val)
                        .agg(F.sqrt(F.avg(err * err)).alias("rmse"))
                        .first()["rmse"]
                    )
                    if rmse is not None:
                        rmses.append(float(rmse))
                return sum(rmses) / len(rmses) if rmses else float("inf")

            if parallelism > 1 and len(candidates) > 1:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(
                    max_workers=min(parallelism, len(candidates))
                ) as pool:
                    scores = list(pool.map(_evaluate, candidates))
            else:
                scores = [_evaluate(p) for p in candidates]

            ranked = sorted(zip(candidates, scores), key=lambda t: (t[1], _params_key(t[0])))
            n_keep = max(1, math.ceil(len(candidates) / factor))
            survivors = {_params_key(p) for p, _ in ranked[:n_keep]}
            for p, s in ranked:
                k = _params_key(p)
                rows.append((*k, rung, round(min(frac, 1.0), 6), s, k in survivors))
                final_scores[k] = (-rung, s, k)
            candidates = [p for p, _ in ranked[:n_keep]]
            if len(candidates) == 1 or frac >= 1.0:
                break
            frac = min(frac * factor, 1.0)
            rung += 1

        winner_key = min(final_scores[_params_key(p)] for p in candidates)[2]
        spark = df.sparkSession
        res = spark.createDataFrame(
            rows,
            "max_depth int, max_iter int, step_size double, rung int, "
            "resource_frac double, avg_rmse double, survived boolean",
        )
        # rank 1 = winner; everyone else ordered by (last rung desc, rmse)
        order = sorted(final_scores.values())
        rank_of = {k: i + 1 for i, (_, _, k) in enumerate(order)}
        rank_df = spark.createDataFrame(
            [(k[0], k[1], k[2], rank_of[k]) for k in rank_of],
            "max_depth int, max_iter int, step_size double, rank int",
        )
        res = res.join(F.broadcast(rank_df), ["max_depth", "max_iter", "step_size"])
        best_model = None
        if refit:
            best_params = {
                "max_depth": winner_key[0],
                "max_iter": winner_key[1],
                "step_size": winner_key[2],
            }
            best_model = _gbt_pipeline(
                features, target, categorical=categorical, seed=seed, **best_params
            ).fit(df)
        return res, best_model
    finally:
        for cached in rung_caches:
            cached.unpersist()
        for train, val in folds:
            train.unpersist()
            val.unpersist()


def stump_boost_model(
    df: DataFrame,
    features: dict,
    target: str,
    rounds: int = 5,
    lr: float = 0.5,
    n_bins: int = 16,
    scale: float = 1e4,
) -> dict:
    """Train the DECLARATIVE histogram-stump booster and return the MODEL
    — the replayable artifact behind :func:`stump_boost_importances` (r9
    factoring: importances, per-row scoring and mean-ablation attribution
    all read this one dict). See the importances docstring for the
    LightGBM-histogram execution shape and the fixed-point determinism
    bridge; nothing here changes the arithmetic.

    Returns ``{"names", "exprs", "base_fp", "scale", "n_bins", "lr",
    "stats": {f: (mn, mx)}, "rounds": [(feature, bin, gain, cl, cr)]}`` —
    bounded driver state (|features|·rounds scalars), the sanctioned
    model-artifact collect."""
    import math

    names = list(features)
    feat_cols = [
        (F.col(e) if isinstance(e, str) else e).cast("double").alias(n)
        for n, e in features.items()
    ]
    base = df.select(
        *feat_cols,
        F.floor(F.col(target).cast("double") * F.lit(scale) + F.lit(0.5))
        .cast("long")
        .alias("_yfp"),
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_yfp").alias("_sy"),
        *[F.min(n).alias(f"_mn_{n}") for n in names],
        *[F.max(n).alias(f"_mx_{n}") for n in names],
    ).collect()[0]
    n_tot, s_y = stats["_n"], stats["_sy"]
    base_fp = math.floor(float(s_y) / float(n_tot) + 0.5)
    fstats = {n: (float(stats[f"_mn_{n}"]), float(stats[f"_mx_{n}"])) for n in names}

    bin_cols = {n: _stump_bin_col(F.col(n), fstats[n], n_bins) for n in names}
    frame = base.select(
        *[bin_cols[n].cast("int").alias(f"_b_{n}") for n in names],
        (F.col("_yfp") - F.lit(base_fp)).alias("_r"),
    ).localCheckpoint(eager=True)

    melted = F.explode(
        F.array(
            *[
                F.struct(F.lit(n).alias("f"), F.col(f"_b_{n}").alias("bin"))
                for n in names
            ]
        )
    )
    chosen = []  # (feature, bin, gain, cl, cr) per round, in round order
    for _ in range(rounds):
        hist = (
            frame.select(melted.alias("m"), "_r")
            .groupBy("m.f", "m.bin")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("_r").alias("s"))
            .collect()
        )
        per_f = {}
        for row in hist:
            per_f.setdefault(row["f"], {})[row["bin"]] = (row["n"], row["s"])
        best = None  # (-gain, feature, bin) minimized == (gain desc, f asc, bin asc)
        for n in names:
            bins = per_f.get(n, {})
            nt = sum(v[0] for v in bins.values())
            st = sum(v[1] for v in bins.values())
            nl = sl = 0
            for b in range(n_bins - 1):
                cnt, sm = bins.get(b, (0, 0))
                nl += cnt
                sl += sm
                nr, sr = nt - nl, st - sl
                if nl == 0 or nr == 0:
                    continue
                sld, srd, std = float(sl), float(sr), float(st)
                gain = (sld * sld / float(nl) + srd * srd / float(nr)) - (
                    std * std / float(nt)
                )
                key = (-gain, n, b)
                if best is None or key < best[0]:
                    cl = math.floor(lr * (sld / float(nl)) + 0.5)
                    cr = math.floor(lr * (srd / float(nr)) + 0.5)
                    best = (key, gain, cl, cr)
        if best is None:
            break
        (_neg, bf_feat, bb_bin), gain, cl, cr = best
        chosen.append((bf_feat, bb_bin, gain, cl, cr))
        frame = frame.withColumn(
            "_r",
            F.col("_r")
            - F.when(F.col(f"_b_{bf_feat}") <= F.lit(bb_bin), F.lit(cl)).otherwise(
                F.lit(cr)
            ),
        ).localCheckpoint(eager=True)

    return {
        "names": names,
        "exprs": dict(features),
        "base_fp": base_fp,
        "scale": scale,
        "n_bins": n_bins,
        "lr": lr,
        "stats": fstats,
        "rounds": chosen,
    }


def _stump_bin_col(col: Column, mnmx: tuple, n_bins: int) -> Column:
    """Fixed-width histogram bin of a double column over global [mn, mx] —
    the shared binning expression of the stump family (boundary IEEE
    arithmetic identical on both engines)."""
    mn, mx = mnmx
    if mx == mn:
        return F.lit(0)
    w = (mx - mn) / float(n_bins)
    return F.least(
        F.lit(n_bins - 1),
        F.greatest(F.lit(0), F.floor((col - F.lit(mn)) / F.lit(w)).cast("int")),
    )


def stump_model_yhat(model: dict) -> Column:
    """Per-row prediction of a :func:`stump_boost_model` artifact as a
    PURE COLUMN EXPRESSION (codegen-resident — no UDF, no driver loop):
    yhat = (base_fp + Σ_rounds leaf_fp) / scale, where each round's leaf
    is a CASE on the row's bin of the chosen feature. Evaluates the
    feature expressions the model was trained with, so it scores any
    frame carrying those input columns — including ablation variants with
    a feature column overwritten."""
    total = F.lit(int(model["base_fp"]))
    for feat, b, _gain, cl, cr in model["rounds"]:
        e = model["exprs"][feat]
        col = (F.col(e) if isinstance(e, str) else e).cast("double")
        bcol = _stump_bin_col(col, model["stats"][feat], model["n_bins"])
        total = total + F.when(bcol <= F.lit(b), F.lit(cl)).otherwise(F.lit(cr))
    return total.cast("double") / F.lit(float(model["scale"]))


def stump_boost_importances(
    df: DataFrame,
    features: dict,
    target: str,
    rounds: int = 5,
    lr: float = 0.5,
    n_bins: int = 16,
    scale: float = 1e4,
) -> DataFrame:
    """Impurity-gain feature importances from DECLARATIVE histogram
    gradient boosting with depth-1 trees (stumps) — the replayable twin of
    Spark ML's ``GBTRegressor.featureImportances`` (ranking plots,
    `src/model/metrics_visualizer.py:501-530`).

    This is the real distributed-GBDT training shape (LightGBM/XGBoost
    histogram mode): per boosting round, ONE map-side-combined aggregate
    builds a ``(feature, bin)`` histogram of residual sums/counts
    (|features|·n_bins rows — bounded model state, like the k-means
    centroid collect), the best variance-reduction split is picked on the
    driver, and the residual update is a pure column expression. Nothing
    corpus-sized ever reaches the driver; per round the cluster does one
    scan + one tiny shuffle, at any corpus size.

    Determinism bridge (FIXTURES.md §C / SCALE.md §8): the target is
    quantized to fixed-point int64 (``floor(y·scale + 0.5)``) so every
    residual sum is an ORDER-INDEPENDENT integer; gains and leaf values
    are derived from those exact sums through a fixed IEEE expression —
    ``(S_L²/n_L + S_R²/n_R) − S²/n`` and ``floor(lr·(S/n) + 0.5)`` — that
    the SQL oracle replays verbatim, so split choices, residuals, and
    importances are bit-identical across engines. Bins are fixed-width
    over the global [min, max] (boundary IEEE arithmetic shared the same
    way). Training itself lives in :func:`stump_boost_model` (r9
    factoring); this wrapper derives the ranked importance frame.

    ``features`` maps feature name -> numeric Column expression. Returns
    (feature, importance, rank): importance is the per-feature sum of
    chosen-split gains normalized to total gain (round 4), rank by
    (importance desc, feature asc) — same schema as
    :func:`gbt_feature_importances`.
    """
    model = stump_boost_model(df, features, target, rounds, lr, n_bins, scale)
    names = model["names"]
    chosen = model["rounds"]
    total = 0.0
    for _f, _b, g, _cl, _cr in chosen:
        total = total + g
    imps = []
    for n in names:
        acc = 0.0
        for f, _b, g, _cl, _cr in chosen:
            if f == n:
                acc = acc + g
        imps.append((n, acc / total if total != 0.0 else 0.0))
    spark = df.sparkSession
    out = spark.createDataFrame(imps, "feature string, importance double")
    w = Window.orderBy(F.desc("_imp"), F.asc("feature"))
    return (
        out.withColumn("_imp", F.round(F.col("importance"), 4) + F.lit(0.0))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .select("feature", F.col("_imp").alias("importance"), "rank")
    )


_RF_BAG_THRESHOLD = 728650000000000000  # ~63.2% of the 2^60 hash range
_RF_HASH_DEN = 1152921504606846976  # 2^60


def bagged_stump_forest(
    fit_df: DataFrame,
    features: Sequence[str],
    target: str,
    bag_key_cols: Sequence[str],
    n_trees: int = 8,
    n_bins: int = 16,
    scale: float = 1e4,
) -> list:
    """Train a DECLARATIVE random forest of histogram stumps — the
    replayable re-pointing of the reference's RandomForest leg
    (`src/model/train.py:293-352`) promoted off Spark ML in r9, the
    bagging twin of :func:`stump_boost_model`'s boosting.

    Randomness is salted-hash determinism, not an RNG: tree t's bag is
    the rows whose md5('rf<t>:' ++ bag key) lands under ~0.632 of the
    hash range (the bootstrap's expected coverage), and tree t considers
    the classic features-per-split subset — features (t mod p) and
    (t+1 mod p). Because bagged trees are INDEPENDENT (no residual
    chain), all trees train from exactly TWO aggregates over one scan
    each of the tagged (tree, row) expansion: pass 1 collects per-(tree,
    feature) min/max/count/sum (driver state 4·p·T scalars), pass 2
    builds every tree's (feature, bin) target histogram with pass-1 bin
    edges — no per-tree jobs, no corpus collect. Leaves are fixed-point
    bag-mean targets, split by variance reduction on exact integer sums
    (ties: feature asc, bin asc) — every choice bit-replayable in SQL.

    Returns a list of per-tree models: ``{"tree", "feature", "bin",
    "stats": (mn, mx), "cl", "cr"}`` (cl/cr are fixed-point leaf
    predictions). Score with :func:`stump_forest_yhat`."""
    import math

    features = list(features)
    p = len(features)
    key = "concat(" + ", '-', ".join(f"cast({c} as string)" for c in bag_key_cols) + ")"
    trees = F.explode(
        F.array(*[F.lit(t) for t in range(n_trees)])
    ).alias("_tree")
    tagged = fit_df.select(
        *[F.col(f).cast("double").alias(f) for f in features],
        F.floor(F.col(target).cast("double") * F.lit(scale) + F.lit(0.5))
        .cast("long")
        .alias("_yfp"),
        F.expr(key).alias("_bagkey"),
    ).select("*", trees).filter(
        F.expr(
            "cast(conv(substr(md5(concat('rf', cast(_tree as string), ':', _bagkey)), "
            f"1, 15), 16, 10) as bigint) < {_RF_BAG_THRESHOLD}"
        )
    )
    st_rows = (
        tagged.groupBy("_tree")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("_yfp").alias("_sy"),
            *[F.min(f).alias(f"_mn_{f}") for f in features],
            *[F.max(f).alias(f"_mx_{f}") for f in features],
        )
        .collect()
    )
    st = {r["_tree"]: r for r in st_rows}
    # pass 2: per-tree bins from pass-1 edges, one (tree, feature, bin)
    # histogram of target sums/counts
    melt_structs = []
    for t in range(n_trees):
        for fi in (t % p, (t + 1) % p):
            f = features[fi]
            bcol = _stump_bin_col(
                F.col(f), (float(st[t][f"_mn_{f}"]), float(st[t][f"_mx_{f}"])), n_bins
            )
            melt_structs.append(
                F.when(
                    F.col("_tree") == t,
                    F.struct(F.lit(f).alias("f"), bcol.cast("int").alias("bin")),
                )
            )
    melted = F.explode(
        F.filter(F.array(*melt_structs), lambda x: x.isNotNull())
    ).alias("m")
    hist = (
        tagged.select("_tree", melted, "_yfp")
        .groupBy("_tree", "m.f", "m.bin")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("_yfp").alias("s"))
        .collect()
    )
    per_tree = {}
    for row in hist:
        per_tree.setdefault(row["_tree"], {}).setdefault(row["f"], {})[row["bin"]] = (
            row["n"],
            row["s"],
        )
    out = []
    for t in range(n_trees):
        best = None
        for fi in (t % p, (t + 1) % p):
            f = features[fi]
            bins = per_tree.get(t, {}).get(f, {})
            nt = sum(v[0] for v in bins.values())
            stt = sum(v[1] for v in bins.values())
            nl = sl = 0
            for b in range(n_bins - 1):
                cnt, sm = bins.get(b, (0, 0))
                nl += cnt
                sl += sm
                nr, sr = nt - nl, stt - sl
                if nl == 0 or nr == 0:
                    continue
                sld, srd, std = float(sl), float(sr), float(stt)
                gain = (sld * sld / float(nl) + srd * srd / float(nr)) - (
                    std * std / float(nt)
                )
                key2 = (-gain, f, b)
                if best is None or key2 < best[0]:
                    cl = math.floor(sld / float(nl) + 0.5)
                    cr = math.floor(srd / float(nr) + 0.5)
                    best = (key2, f, b, cl, cr)
        if best is None:
            # degenerate bag (all one bin): predict the bag mean
            n_b, s_b = st[t]["_n"], st[t]["_sy"]
            mean_fp = math.floor(float(s_b) / float(n_b) + 0.5)
            out.append(
                {"tree": t, "feature": features[t % p], "bin": n_bins - 1,
                 "stats": (0.0, 0.0), "cl": mean_fp, "cr": mean_fp}
            )
            continue
        (_k, f, b, cl, cr) = (best[0], best[1], best[2], best[3], best[4])
        out.append(
            {
                "tree": t,
                "feature": f,
                "bin": b,
                "stats": (float(st[t][f"_mn_{f}"]), float(st[t][f"_mx_{f}"])),
                "cl": cl,
                "cr": cr,
            }
        )
    return out


def stump_forest_yhat(forest: list, n_bins: int = 16, scale: float = 1e4) -> Column:
    """Forest prediction as a pure column expression: the SUM of per-tree
    fixed-point leaves stays an exact integer (order-free), divided once
    by trees·scale — so the prediction, and any error statistic derived
    in fixed-point units, replays bit-identically in SQL."""
    total = F.lit(0).cast("long")
    for m in forest:
        bcol = _stump_bin_col(F.col(m["feature"]).cast("double"), m["stats"], n_bins)
        total = total + F.when(bcol <= F.lit(m["bin"]), F.lit(m["cl"])).otherwise(
            F.lit(m["cr"])
        )
    return total.cast("double") / F.lit(float(len(forest)) * scale)


def stump_forest_yhat_fp(forest: list, n_bins: int = 16) -> Column:
    """Exact-integer forest prediction in (trees·scale) fixed-point units
    — the error-statistic form: err_fp = y_fp·|trees| − yhat_fp is an
    exact BIGINT both engines agree on."""
    total = F.lit(0).cast("long")
    for m in forest:
        bcol = _stump_bin_col(F.col(m["feature"]).cast("double"), m["stats"], n_bins)
        total = total + F.when(bcol <= F.lit(m["bin"]), F.lit(m["cl"])).otherwise(
            F.lit(m["cr"])
        )
    return total


def gbt_feature_importances(model, spark: "SparkSession") -> DataFrame:
    """Ranked impurity-based feature importances of a fitted GBT pipeline —
    the data behind the reference's SHAP/importance ranking plots
    (`src/model/metrics_visualizer.py:501-530`, `notebooks/
    model_evaluation.ipynb` cell 54 ranks the top 20). Spark ML's
    ``featureImportances`` is the normalized total impurity improvement per
    feature across all trees (sums to 1), the distributed analogue of the
    sklearn/CatBoost attribute the reference plots.

    The vector is |features|-sized driver-side model metadata — not data —
    so building the tiny ranked frame locally is the right call at any
    scale. Indexed categorical columns report under their original name.
    """
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import GBTRegressionModel

    assembler = next(s for s in model.stages if isinstance(s, VectorAssembler))
    gbt = next(s for s in model.stages if isinstance(s, GBTRegressionModel))
    names = [
        n[len("_idx_"):] if n.startswith("_idx_") else n
        for n in assembler.getInputCols()
    ]
    imps = gbt.featureImportances.toArray()
    ranked = sorted(zip(names, imps), key=lambda t: (-t[1], t[0]))
    rows = [(n, float(v), i + 1) for i, (n, v) in enumerate(ranked)]
    return spark.createDataFrame(rows, "feature string, importance double, rank int")


def persist_pipeline(model, path: str):
    """Round-trip a fitted PipelineModel through disk
    (`src/model/utils.py:8-13` pickles; Spark ML uses its own writer so the
    artifact is executor-loadable). Returns the reloaded model."""
    from pyspark.ml import PipelineModel

    model.write().overwrite().save(path)
    return PipelineModel.load(path)
