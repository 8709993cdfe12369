"""SURVEY §2.10 ML-surface queries.

Role mapping: events (user_id ≡ ticker, ts ≡ date, value ≡ close) for
time-series model ops; lineitem for feature-matrix ops (features
l_quantity/l_discount/l_tax, target l_extendedprice).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_aws_spark.ml import encoders, models
from etl_aws_spark.registry import load, query
from etl_aws_spark.suite._util import EVENTS_ORDER_SQL, cache_dir as _cache_dir, rnd

_W_SQL = f"OVER (PARTITION BY user_id ORDER BY {EVENTS_ORDER_SQL})"


@query(
    "encode_target_mean",
    oracle="""
    SELECT e.event_id, e.event_type, e.value,
           round(m.te, 4) + 0.0 AS event_type_te
    FROM events e
    JOIN (SELECT event_type, avg(value) AS te FROM events GROUP BY event_type) m
      USING (event_type)
    """,
    category="ml",
)
def encode_target_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-target encoding (`train.py:187`): fit = one aggregate,
    transform = broadcast join."""
    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    out = encoders.target_encode(ev, "event_type", "value", out="event_type_te")
    return out.select(
        "event_id", "event_type", "value", rnd(F.col("event_type_te")).alias("event_type_te")
    )


@query(
    "encode_onehot",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag,
           CAST(l_returnflag = 'A' AS INTEGER) AS l_returnflag__A,
           CAST(l_returnflag = 'N' AS INTEGER) AS l_returnflag__N,
           CAST(l_returnflag = 'R' AS INTEGER) AS l_returnflag__R
    FROM lineitem
    WHERE l_orderkey % 5 = 0
    """,
    category="ml",
)
def encode_onehot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized one-hot indicators over a fixed vocabulary
    (`train.py:171-175`, handle_unknown='ignore'). Gate projection is a
    deterministic 1/5 key-slice to bound driver-side hashing."""
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 5 == 0)
        .select("l_orderkey", "l_linenumber", "l_returnflag")
    )
    return encoders.onehot_encode(li, "l_returnflag", ["A", "N", "R"])


@query(
    "impute_mean_mode",
    oracle="""
    WITH holed AS (
      SELECT event_id,
             CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS value,
             CASE WHEN event_id % 11 = 0 THEN NULL ELSE event_type END AS event_type
      FROM events
    ), m AS (
      SELECT avg(value) AS mean_v FROM holed
    ), md AS (
      SELECT event_type AS mode_t FROM holed WHERE event_type IS NOT NULL
      GROUP BY event_type ORDER BY count(*) DESC, event_type ASC LIMIT 1
    )
    SELECT event_id,
           round(coalesce(value, mean_v), 4) + 0.0 AS value,
           coalesce(event_type, mode_t) AS event_type
    FROM holed, m, md
    """,
    category="ml",
)
def impute_mean_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean/mode imputation with deterministic mode tie-break
    (`train.py:173,179`). Nulls injected deterministically on the fixtures."""
    ev = load(spark, sf_dir, "events").select("event_id", "value", "event_type")
    holed = ev.withColumns(
        {
            "value": F.when(F.col("event_id") % 5 == 0, None).otherwise(F.col("value")),
            "event_type": F.when(F.col("event_id") % 11 == 0, None).otherwise(F.col("event_type")),
        }
    )
    out = encoders.impute_mean_mode(holed, numeric=["value"], categorical=["event_type"])
    return out.select("event_id", rnd(F.col("value")).alias("value"), "event_type")


@query(
    "transform_power_scale",
    # full grid-MLE mirror: the oracle re-derives λ over the same 41-point
    # grid on the same 1/10 key-sample, then applies the same transform +
    # z-score. (Prices are positive, so only the x>=0 Yeo-Johnson branch
    # fires; it is still written out in full.)
    oracle="""
    WITH grid AS (
      SELECT round(-2.0 + 0.1 * i, 1) AS lam FROM range(41) t(i)
    ), fit AS (
      SELECT l_extendedprice AS x FROM lineitem WHERE l_orderkey % 10 = 0
    ), stats AS (
      SELECT g.lam,
             var_pop(CASE WHEN abs(g.lam) < 1e-12 THEN ln(x + 1.0)
                          ELSE (pow(x + 1.0, g.lam) - 1.0) / g.lam END) AS v,
             count(*) AS n,
             sum(sign(x) * ln(abs(x) + 1.0)) AS pen
      FROM fit CROSS JOIN grid g GROUP BY g.lam
    ), ll AS (
      SELECT lam, -0.5 * n * ln(v) + (lam - 1.0) * pen AS ll
      FROM stats WHERE v IS NOT NULL AND v > 0
    ), best AS (
      SELECT lam FROM ll ORDER BY ll DESC, lam ASC LIMIT 1
    ), t AS (
      SELECT l_orderkey, l_linenumber,
             CASE WHEN abs(b.lam) < 1e-12 THEN ln(l_extendedprice + 1.0)
                  ELSE (pow(l_extendedprice + 1.0, b.lam) - 1.0) / b.lam END AS y
      FROM lineitem CROSS JOIN best b
    ), z AS (
      SELECT avg(y) AS mu, stddev_pop(y) AS sd FROM t
    )
    SELECT l_orderkey, l_linenumber,
           round((y - mu) / nullif(sd, 0.0), 6) + 0.0 AS price_ps
    FROM t CROSS JOIN z
    WHERE l_orderkey % 5 = 0
    """,
    category="ml",
)
def transform_power_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yeo-Johnson + z-score (`train.py:178-182`). λ fitted by a single
    grid-MLE aggregate pass over a deterministic 1/10 key-sample (vs
    sklearn's ~25 sequential Brent passes); the oracle independently
    re-derives λ in SQL and must land on the same grid point."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_extendedprice")
    out = encoders.power_scale(
        li, "l_extendedprice", out="price_ps",
        fit_filter=F.col("l_orderkey") % 10 == 0,
    )
    return out.filter(F.col("l_orderkey") % 5 == 0).select(
        "l_orderkey", "l_linenumber", rnd(F.col("price_ps"), 6).alias("price_ps")
    )


@query(
    "feature_select_kbest",
    oracle="""
    WITH s AS (
      SELECT 'l_quantity' AS feature, corr(l_quantity, l_extendedprice) AS r,
             count(*) AS n FROM lineitem
      UNION ALL
      SELECT 'l_discount', corr(l_discount, l_extendedprice), count(*) FROM lineitem
      UNION ALL
      SELECT 'l_tax', corr(l_tax, l_extendedprice), count(*) FROM lineitem
    ), f AS (
      SELECT feature, r * r * (n - 2) / (1 - r * r) AS f_stat FROM s
    ), rk AS (
      SELECT feature, f_stat,
             CAST(row_number() OVER (ORDER BY f_stat DESC, feature ASC) AS INTEGER) AS rank
      FROM f
    )
    SELECT feature, round(f_stat, 4) + 0.0 AS f_stat, rank FROM rk WHERE rank <= 2
    """,
    category="ml",
)
def feature_select_kbest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k by univariate F-statistic (`train.py:24-54`): all correlations
    in ONE aggregate pass."""
    li = load(spark, sf_dir, "lineitem")
    out = encoders.select_k_best(
        li, ["l_quantity", "l_discount", "l_tax"], "l_extendedprice", k=2
    )
    return out.select("feature", rnd(F.col("f_stat")).alias("f_stat"), "rank")


@query(
    "split_by_date",
    oracle="""
    SELECT event_id, user_id, ts, value,
           CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 'train' ELSE 'test' END AS split
    FROM events
    """,
    category="ml",
)
def split_by_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal holdout labeling at a cutoff (`train.py:57-92`)."""
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    return models.split_by_date(ev, "ts", "2024-01-16 00:00:00")


@query(
    "cv_time_series_folds",
    oracle=f"""
    WITH b AS (
      SELECT event_id, user_id, ts, value,
             row_number() {_W_SQL} AS rn,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM events
    ), x AS (
      SELECT b.*, CAST(floor(n / 4.0) AS INTEGER) AS tsz,
             CAST(f.fold AS INTEGER) AS fold
      FROM b CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS fold) f
    ), r AS (
      SELECT event_id, user_id, ts, value, fold,
             CASE WHEN rn <= n - (3 - fold) * tsz THEN 'train'
                  WHEN rn <= n - (3 - fold) * tsz + tsz THEN 'test' END AS role
      FROM x
    )
    SELECT event_id, user_id, ts, value, fold, role FROM r WHERE role IS NOT NULL
    """,
    category="ml",
)
def cv_time_series_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expanding-window TimeSeriesSplit folds per key (`train.py:14`)."""
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    out = models.time_series_folds(ev, "user_id", ["ts", "event_id"], n_splits=3)
    return out.select(
        "event_id", "user_id", "ts", "value", F.col("fold").cast("int").alias("fold"), "role"
    )


@query(
    "gen_validation_frame",
    oracle=f"""
    WITH p AS (
      SELECT event_id, user_id, value,
             lag(value, 1) {_W_SQL} AS yhat
      FROM events
    )
    SELECT event_id, user_id, value AS y_real, yhat AS y_pred
    FROM p WHERE yhat IS NOT NULL
    """,
    category="ml",
)
def gen_validation_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(key, y_real, y_pred) assembly by aligned join (`utils.py:20-36`);
    the 'prediction' is the naive lag-1 forecast, joined back on keys rather
    than positionally concatenated."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    preds = ev.withColumn("yhat", F.lag("value", 1).over(w)).filter(
        F.col("yhat").isNotNull()
    )
    return models.validation_frame(
        ev.join(preds.select("event_id"), "event_id", "leftsemi"),
        preds,
        keys=["event_id", "user_id"],
        y_real="value",
        y_pred="yhat",
    )


@query(
    "model_ar1_forecast",
    oracle=f"""
    WITH l AS (
      SELECT user_id, value AS y,
             lag(value, 1) {_W_SQL} AS yl,
             ts
      FROM events
    ), s AS (
      SELECT user_id,
             covar_pop(y, yl) / var_pop(yl) AS phi,
             avg(CASE WHEN yl IS NOT NULL THEN y END) AS my,
             avg(yl) AS mx,
             arg_max(y, ts) AS ylast
      FROM l GROUP BY user_id
    ), b AS (
      SELECT user_id, phi, my - phi * mx AS c, ylast,
             CAST(k.step AS INT) AS step
      FROM s CROSS JOIN (SELECT unnest(generate_series(1, 5)) AS step) k
    )
    SELECT user_id, step,
           round(c * coalesce((1.0 - pow(phi, step)) / nullif(1.0 - phi, 0.0),
                              CAST(step AS DOUBLE))
                 + pow(phi, step) * ylast, 4) + 0.0 AS yhat
    FROM b
    """,
    category="ml",
)
def model_ar1_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form AR(1) fit + 5-step forecast per key — the fully
    declarative twin of model_sarimax_per_group: the model IS an aggregate
    (covar/var), so the oracle checks the forecasts exactly."""
    ev = load(spark, sf_dir, "events")
    out = models.ar1_forecast_closed_form(
        ev, "value", key="user_id", order=["ts", "event_id"], steps=5
    )
    return out.select("user_id", "step", rnd(F.col("yhat"), 4).alias("yhat"))


@query("model_sarimax_per_group", oracle=None, category="ml")
def model_sarimax_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key ARMAX(1,0,1)-with-exog fit + 5-step forecast via
    applyInPandas, mirroring `train.py:250-291`
    (``treinar_sarimax_por_acao_com_exog``, ``ORDEM_ARIMA = (1, 0, 1)``):
    Hannan-Rissanen two-stage OLS in pure numpy — AR(1) + MA(1) + exogenous
    calendar regressors (cyclic day-of-week, built as Spark columns before
    the grouped map). Rows-only: ARMA estimation isn't SQL-expressible;
    parameter recovery and Spark-vs-local exactness are pinned in
    tests/test_ml.py."""
    ev = load(spark, sf_dir, "events")
    dow = F.dayofweek("ts").cast("double")
    ev = ev.withColumns(
        {
            "x_dow_sin": F.sin(dow * (2.0 * 3.141592653589793 / 7.0)),
            "x_dow_cos": F.cos(dow * (2.0 * 3.141592653589793 / 7.0)),
        }
    )
    out = models.arx_forecast_per_key(
        ev, "value", key="user_id", order=["ts", "event_id"], steps=5,
        exog=["x_dow_sin", "x_dow_cos"],
    )
    return out.select("user_id", "step", rnd(F.col("yhat"), 4).alias("yhat"))


@query("model_gbt_fit_predict", oracle=None, category="ml")
def model_gbt_fit_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed GBT regression via Spark ML (`train.py:319-352`): assemble
    → GBTRegressor(seed=42) → score. Fit on the deterministic 20% hash-sample
    (iterative full-pass training in a query path is the classic scale-killer
    — at 100 TB you fit on a sample and SCORE the full data), score
    everything, return per-flag error aggregates rather than shipping every
    prediction to the driver. Rows-only (tree ensembles aren't
    SQL-expressible); error aggregates are checked in tests/test_ml.py."""
    li = load(spark, sf_dir, "lineitem")
    fit_df = li.filter(F.col("l_orderkey") % 5 == 0)
    preds, _ = models.gbt_fit_predict(
        li,
        features=["l_quantity", "l_discount", "l_tax"],
        target="l_extendedprice",
        keys=["l_orderkey", "l_linenumber", "l_returnflag"],
        max_iter=5,
        fit_df=fit_df,
    )
    err = F.col("l_extendedprice") - F.col("yhat")
    return preds.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        rnd(F.sqrt(F.avg(err * err)), 4).alias("rmse"),
        rnd(F.avg(F.abs(err)), 4).alias("mae"),
    )


@query("model_gbt_grid_search", oracle=None, category="ml")
def model_gbt_grid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperparameter search with expanding-window temporal folds — the
    reference's RandomizedSearchCV/HalvingRandomSearchCV over TimeSeriesSplit
    (`train.py:14,293-352`, model_evaluation.ipynb grids) re-expressed for
    Spark ML: exact time-percentile fold cutoffs (no future leakage, unlike
    CrossValidator's random folds), one distributed fit per candidate x fold,
    candidates ranked by mean validation RMSE. Categorical feature goes
    through StringIndexer into the trees (CatBoost cat_features analogue).
    Fits run on the deterministic 10% hash-sample — at 100 TB you search on
    a sample and refit the winner. Rows-only: |grid| ranked rows."""
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 10 == 0)
        .withColumn("_t", F.col("l_shipdate").cast("timestamp").cast("double"))
    )
    grid = [
        {"max_depth": d, "max_iter": it, "step_size": 0.1}
        for d in (2, 4) for it in (2, 4)
    ]
    res, _ = models.gbt_grid_search_temporal(
        li,
        features=["l_quantity", "l_discount", "l_tax"],
        target="l_extendedprice",
        time_col="_t",
        grid=grid,
        n_splits=1,
        categorical=["l_returnflag"],
        refit=False,
        fit_partitions=8,
    )
    return res.select(
        "max_depth", "max_iter", "step_size", rnd(F.col("avg_rmse"), 4).alias("avg_rmse"), "rank"
    )


_STUMP_FEATS4 = (
    ("l_quantity", "bq"),
    ("l_discount", "bdc"),
    ("l_tax", "btx"),
    ("l_returnflag", "brf"),
)


def _duck_stump_round(m: int, feats=_STUMP_FEATS4) -> str:
    """One unrolled boosting-stump round: histogram → prefix-sum splits →
    best pick → residual update. Mirrors models.stump_boost_model's
    driver arithmetic expression-for-expression (r9: parameterized on the
    feature list so the 3-feature attribution model shares it)."""
    p = m - 1
    first_f, first_b = feats[0]
    unions = f"SELECT '{first_f}' AS f, {first_b} AS bin, r FROM r{p}"
    for nm, bc in feats[1:]:
        unions += f"\n        UNION ALL SELECT '{nm}', {bc}, r FROM r{p}"
    bin_list = ", ".join(bc for _nm, bc in feats)
    case_f = "CASE b.f " + " ".join(
        f"WHEN '{nm}' THEN {bc}" for nm, bc in feats[:-1]
    ) + f" ELSE {feats[-1][1]} END"
    return f"""
    h{m} AS MATERIALIZED (
      SELECT f, bin, count(*) AS n, sum(r) AS s FROM (
        {unions}
      ) GROUP BY f, bin
    ), sp{m} AS (
      SELECT f, bin,
             sum(n) OVER (PARTITION BY f ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nl,
             sum(s) OVER (PARTITION BY f ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sl,
             sum(n) OVER (PARTITION BY f) AS nt,
             sum(s) OVER (PARTITION BY f) AS stt
      FROM h{m}
    ), g{m} AS (
      SELECT f, bin,
             (CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE)
              + CAST(stt - sl AS DOUBLE) * CAST(stt - sl AS DOUBLE)
                / CAST(nt - nl AS DOUBLE))
             - CAST(stt AS DOUBLE) * CAST(stt AS DOUBLE) / CAST(nt AS DOUBLE)
               AS gain,
             CAST(floor(0.5 * (CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE)) + 0.5)
                  AS BIGINT) AS cl,
             CAST(floor(0.5 * (CAST(stt - sl AS DOUBLE) / CAST(nt - nl AS DOUBLE))
                  + 0.5) AS BIGINT) AS cr
      FROM sp{m} WHERE bin < 15 AND nl > 0 AND nt - nl > 0
    ), b{m} AS MATERIALIZED (
      SELECT f, bin, gain, cl, cr FROM (
        SELECT *, row_number() OVER (ORDER BY gain DESC, f ASC, bin ASC) AS rn
        FROM g{m}
      ) WHERE rn = 1
    ), r{m} AS MATERIALIZED (
      SELECT {bin_list},
             r - CASE WHEN ({case_f}) <= b.bin
                      THEN b.cl ELSE b.cr END AS r
      FROM r{p} CROSS JOIN b{m} b
    )"""


def _duck_bin(col: str, mn: str, mx: str) -> str:
    return (
        f"CASE WHEN {mx} = {mn} THEN 0 ELSE least(15, greatest(0, "
        f"CAST(floor(({col} - {mn}) / (({mx} - {mn}) / 16.0)) AS INT))) END"
    )


_RF_FEATS = (("l_quantity", "q"), ("l_discount", "dc"), ("l_tax", "tx"))
_RF_TREES = 8


def _duck_rf_oracle() -> str:
    """Full SQL replay of the bagged-stump forest (ml/models.py
    bagged_stump_forest): per tree, a salted-hash bag CTE, bag stats, a
    two-feature histogram, prefix-sum split gains, and the best pick;
    scoring cross-joins the 8 one-row split picks and the error statistic
    stays in exact fixed-point integers (HUGEINT squares) so rmse/mae are
    order-free and bit-identical."""
    from etl_aws_spark.ml.models import _RF_BAG_THRESHOLD

    p = len(_RF_FEATS)
    ctes = []
    pred_terms = []
    for t in range(_RF_TREES):
        (f0, c0), (f1, c1) = _RF_FEATS[t % p], _RF_FEATS[(t + 1) % p]
        ctes.append(f"""
    bag{t} AS (
      SELECT {c0}, {c1}, yfp FROM fitr
      WHERE (('0x' || substr(md5('rf{t}:' || bagkey), 1, 15))::BIGINT)
            < {_RF_BAG_THRESHOLD}
    ), st{t} AS (
      SELECT count(*) AS n, sum(yfp) AS sy,
             min({c0}) AS mn0, max({c0}) AS mx0,
             min({c1}) AS mn1, max({c1}) AS mx1
      FROM bag{t}
    ), h{t} AS (
      SELECT f, bin, count(*) AS n, sum(yfp) AS s FROM (
        SELECT '{f0}' AS f,
               {_duck_bin(f'b.{c0}', f'st{t}.mn0', f'st{t}.mx0')} AS bin, b.yfp
        FROM bag{t} b CROSS JOIN st{t}
        UNION ALL
        SELECT '{f1}',
               {_duck_bin(f'b.{c1}', f'st{t}.mn1', f'st{t}.mx1')}, b.yfp
        FROM bag{t} b CROSS JOIN st{t}
      ) GROUP BY f, bin
    ), sp{t} AS (
      SELECT f, bin,
             sum(n) OVER (PARTITION BY f ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nl,
             sum(s) OVER (PARTITION BY f ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sl,
             sum(n) OVER (PARTITION BY f) AS nt,
             sum(s) OVER (PARTITION BY f) AS stt
      FROM h{t}
    ), g{t} AS (
      SELECT f, bin,
             (CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE)
              + CAST(stt - sl AS DOUBLE) * CAST(stt - sl AS DOUBLE)
                / CAST(nt - nl AS DOUBLE))
             - CAST(stt AS DOUBLE) * CAST(stt AS DOUBLE) / CAST(nt AS DOUBLE)
               AS gain,
             CAST(floor(CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE) + 0.5)
                  AS BIGINT) AS cl,
             CAST(floor(CAST(stt - sl AS DOUBLE) / CAST(nt - nl AS DOUBLE)
                  + 0.5) AS BIGINT) AS cr
      FROM sp{t} WHERE bin < 15 AND nl > 0 AND nt - nl > 0
    ), b{t} AS MATERIALIZED (
      SELECT f, bin, gain, cl, cr FROM (
        SELECT *, row_number() OVER (ORDER BY gain DESC, f ASC, bin ASC) AS rn
        FROM g{t}
      ) WHERE rn = 1
    )""")
        pred_terms.append(
            f"CASE WHEN (CASE WHEN b{t}.f = '{f0}'"
            f" THEN {_duck_bin(f'a.{c0}', f'st{t}.mn0', f'st{t}.mx0')}"
            f" ELSE {_duck_bin(f'a.{c1}', f'st{t}.mn1', f'st{t}.mx1')} END)"
            f" <= b{t}.bin THEN b{t}.cl ELSE b{t}.cr END"
        )
    pred = " + ".join(pred_terms)
    crosses = " ".join(
        f"CROSS JOIN st{t} CROSS JOIN b{t}" for t in range(_RF_TREES)
    )
    return f"""
    WITH fitr AS MATERIALIZED (
      SELECT CAST(l_quantity AS DOUBLE) AS q, CAST(l_discount AS DOUBLE) AS dc,
             CAST(l_tax AS DOUBLE) AS tx,
             CAST(floor(CAST(l_extendedprice AS DOUBLE) * 10000.0 + 0.5)
                  AS BIGINT) AS yfp,
             l_orderkey::VARCHAR || '-' || l_linenumber::VARCHAR AS bagkey
      FROM lineitem WHERE l_orderkey % 5 = 0
    ),{','.join(ctes)}, scoredr AS (
      SELECT a.l_returnflag,
             CAST(floor(CAST(a.l_extendedprice AS DOUBLE) * 10000.0 + 0.5)
                  AS BIGINT) * {_RF_TREES} - ({pred}) AS e
      FROM (SELECT l_returnflag, l_extendedprice,
                   CAST(l_quantity AS DOUBLE) AS q,
                   CAST(l_discount AS DOUBLE) AS dc,
                   CAST(l_tax AS DOUBLE) AS tx
            FROM lineitem) a {crosses}
    )
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           round(sqrt(CAST(sum(CAST(e AS HUGEINT) * e) AS DOUBLE)
                      / count(*)) / {_RF_TREES}0000.0, 4) + 0.0 AS rmse,
           round((CAST(sum(abs(e)) AS DOUBLE) / count(*))
                 / {_RF_TREES}0000.0, 4) + 0.0 AS mae
    FROM scoredr GROUP BY l_returnflag
    """


@query("model_rf_fit_predict", oracle=_duck_rf_oracle(), category="ml")
def model_rf_fit_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-forest regression — the second tree family of the reference's
    model zoo (`train.py:293-352` also trains RandomForest alongside the
    boosters). r9: re-pointed at the DECLARATIVE bagged-stump forest
    (ml/models.py bagged_stump_forest — salted-hash ~0.632 bags, per-tree
    feature subsets, all 8 trees trained from TWO aggregates over the fit
    sample since bagged trees are independent), which keeps the bagging
    architecture (parallel trees, unlike boosting's serial passes) while
    making every split and leaf an exact fixed-point quantity — promoted
    from rows-only to a full value-hash oracle. Error statistics stay in
    exact integer fixed-point units (decimal/HUGEINT squares), so rmse and
    mae are summation-order-free on both engines. The Spark-ML
    RandomForestRegressor path remains in ml/models.py rf_fit_predict,
    pinned by tests/test_ml.py signal-recovery."""
    li = load(spark, sf_dir, "lineitem")
    fit_df = li.filter(F.col("l_orderkey") % 5 == 0)
    feats = [f for f, _c in _RF_FEATS]
    forest = models.bagged_stump_forest(
        fit_df,
        features=feats,
        target="l_extendedprice",
        bag_key_cols=["l_orderkey", "l_linenumber"],
        n_trees=_RF_TREES,
    )
    yfp = F.floor(F.col("l_extendedprice").cast("double") * 1e4 + F.lit(0.5)).cast(
        "long"
    )
    e = (yfp * _RF_TREES - models.stump_forest_yhat_fp(forest)).alias("e")
    scored = li.select("l_returnflag", e)
    ec = F.col("e").cast("decimal(19,0)")
    den = float(_RF_TREES) * 1e4
    return scored.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        rnd(
            F.sqrt(F.sum(ec * ec).cast("double") / F.count(F.lit(1)))
            / F.lit(den),
            4,
        ).alias("rmse"),
        rnd(
            (F.sum(F.abs(F.col("e"))).cast("double") / F.count(F.lit(1)))
            / F.lit(den),
            4,
        ).alias("mae"),
    )


_ATTR_FEATS = (("l_quantity", "bq"), ("l_discount", "bdc"), ("l_tax", "btx"))


def _duck_attr_oracle() -> str:
    """Full SQL replay of stump-boost training (3 numeric features, 5
    rounds — the shared _duck_stump_round chain) plus mean-ablation
    scoring of the deterministic 1-in-50 sample: variants cross-join the
    per-round split picks, bins come from the FIT stats, the ablated
    value is the sample mean, and contributions are double differences of
    exact fixed-point leaf sums."""
    rounds = ",".join(_duck_stump_round(m, _ATTR_FEATS) for m in (1, 2, 3, 4, 5))

    def vbin(v: str, mn: str, mx: str) -> str:
        return _duck_bin(v, f"st.{mn}", f"st.{mx}")

    pred_terms = []
    for m in (1, 2, 3, 4, 5):
        pred_terms.append(
            f"CASE WHEN (CASE b{m}.f"
            f" WHEN 'l_quantity' THEN {vbin('vv.vq', 'mnq', 'mxq')}"
            f" WHEN 'l_discount' THEN {vbin('vv.vdc', 'mndc', 'mxdc')}"
            f" ELSE {vbin('vv.vtx', 'mntx', 'mxtx')} END) <= b{m}.bin"
            f" THEN b{m}.cl ELSE b{m}.cr END"
        )
    pred = "bse.bse + " + " + ".join(pred_terms)
    return f"""
    WITH fit AS (
      SELECT CAST(l_quantity AS DOUBLE) AS q, CAST(l_discount AS DOUBLE) AS dc,
             CAST(l_tax AS DOUBLE) AS tx,
             CAST(floor(CAST(l_extendedprice AS DOUBLE) * 10000.0 + 0.5)
                  AS BIGINT) AS yfp
      FROM lineitem WHERE l_orderkey % 5 = 0
    ), st AS (
      SELECT count(*) AS n, sum(yfp) AS sy,
             min(q) AS mnq, max(q) AS mxq, min(dc) AS mndc, max(dc) AS mxdc,
             min(tx) AS mntx, max(tx) AS mxtx
      FROM fit
    ), bse AS (
      SELECT CAST(floor(CAST(st.sy AS DOUBLE) / CAST(st.n AS DOUBLE) + 0.5)
                  AS BIGINT) AS bse
      FROM st
    ), r0 AS MATERIALIZED (
      SELECT {_duck_bin('f.q', 'st.mnq', 'st.mxq')} AS bq,
             {_duck_bin('f.dc', 'st.mndc', 'st.mxdc')} AS bdc,
             {_duck_bin('f.tx', 'st.mntx', 'st.mxtx')} AS btx,
             f.yfp - bse.bse AS r
      FROM fit f CROSS JOIN st CROSS JOIN bse
    ),{rounds}, samp AS (
      SELECT l_orderkey, l_linenumber, q, dc, tx FROM (
        SELECT l_orderkey, l_linenumber,
               CAST(l_quantity AS DOUBLE) AS q, CAST(l_discount AS DOUBLE) AS dc,
               CAST(l_tax AS DOUBLE) AS tx,
               row_number() OVER (PARTITION BY l_orderkey, l_linenumber
                                  ORDER BY l_extendedprice) AS rn
        FROM lineitem WHERE l_orderkey % 50 = 0
      ) WHERE rn = 1
    ), mns AS (
      SELECT avg(q) AS mq, avg(dc) AS mdc, avg(tx) AS mtx FROM samp
    ), vv AS (
      SELECT s.l_orderkey, s.l_linenumber, v.variant,
             CASE WHEN v.variant = 'l_quantity' THEN mns.mq ELSE s.q END AS vq,
             CASE WHEN v.variant = 'l_discount' THEN mns.mdc ELSE s.dc END AS vdc,
             CASE WHEN v.variant = 'l_tax' THEN mns.mtx ELSE s.tx END AS vtx
      FROM samp s CROSS JOIN mns
      CROSS JOIN (SELECT unnest(['__base__', 'l_quantity', 'l_discount',
                                 'l_tax']) AS variant) v
    ), scoredv AS (
      SELECT vv.l_orderkey, vv.l_linenumber, vv.variant,
             CAST(({pred}) AS DOUBLE) / 10000.0 AS yhat
      FROM vv CROSS JOIN st CROSS JOIN bse
      CROSS JOIN b1 CROSS JOIN b2 CROSS JOIN b3 CROSS JOIN b4 CROSS JOIN b5
    ), wide AS (
      SELECT l_orderkey, l_linenumber,
             max(CASE WHEN variant = '__base__' THEN yhat END) AS yb,
             max(CASE WHEN variant = 'l_quantity' THEN yhat END) AS yq,
             max(CASE WHEN variant = 'l_discount' THEN yhat END) AS ydc,
             max(CASE WHEN variant = 'l_tax' THEN yhat END) AS ytx
      FROM scoredv GROUP BY l_orderkey, l_linenumber
    )
    SELECT l_orderkey, l_linenumber,
           round(yb, 4) + 0.0 AS yhat,
           round(yb - yq, 4) + 0.0 AS contrib_l_quantity,
           round(yb - ydc, 4) + 0.0 AS contrib_l_discount,
           round(yb - ytx, 4) + 0.0 AS contrib_l_tax
    FROM wide
    """


@query("model_gbt_attribution", oracle=_duck_attr_oracle(), category="ml")
def model_gbt_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-prediction feature attribution by mean ablation — the data
    behind the reference's SHAP force/summary plots
    (`metrics_visualizer.py:501-530`) with public machinery only: one
    scoring pass over the tagged ablation union, one pivot shuffle
    (ml/models.py prediction_attribution_ablate). r9: scored by the
    DECLARATIVE histogram-stump booster (models.stump_boost_model +
    stump_model_yhat — a pure codegen column expression, no Spark-ML
    transform), which makes every split, leaf, and therefore every
    contribution an exact fixed-point quantity and promotes this query
    from rows-only to a full value-hash oracle. The Spark-ML path stays
    covered by model_gbt_fit_predict. Returns row-level contributions for
    a deterministic 1-in-50 sample plus yhat."""
    li = load(spark, sf_dir, "lineitem")
    fit_df = li.filter(F.col("l_orderkey") % 5 == 0)
    feats = ["l_quantity", "l_discount", "l_tax"]
    model = models.stump_boost_model(
        fit_df,
        features={f: f for f in feats},
        target="l_extendedprice",
        rounds=5,
        lr=0.5,
    )
    # the synthetic lineitem is NOT key-unique on (l_orderkey,
    # l_linenumber) — ~20% of key groups hold several distinct rows, and
    # ablate's pivot requires unique keys (it raises otherwise, since
    # F.first would pick arbitrarily per variant). Keep the
    # lowest-extendedprice row per key: deterministic (extendedprice is
    # distinct within every duplicate group of the fixture) and cheap.
    from pyspark.sql import Window

    wdet = Window.partitionBy("l_orderkey", "l_linenumber").orderBy("l_extendedprice")
    sample = (
        li.filter(F.col("l_orderkey") % 50 == 0)
        .withColumn("_rn", F.row_number().over(wdet))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    out = models.prediction_attribution_ablate(
        None,
        sample,
        feats,
        keys=["l_orderkey", "l_linenumber"],
        scorer=lambda d: d.withColumn("yhat", models.stump_model_yhat(model)),
    )
    return out.select(
        "l_orderkey", "l_linenumber",
        rnd(F.col("yhat"), 4).alias("yhat"),
        *[rnd(F.col(f"contrib_{f}"), 4).alias(f"contrib_{f}") for f in feats],
    )


@query("model_gbt_halving_search", oracle=None, category="ml")
def model_gbt_halving_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Successive-halving hyperparameter search (the reference's
    HalvingRandomSearchCV, `train.py:14`, `model_evaluation.ipynb` cells
    51-61) over the same temporal folds as the full grid: rung 0 fits every
    candidate on a 30% fold sample, survivors advance to the full fold —
    losers cost a fraction of a full fit. Rows-only: one row per
    candidate x rung with survived flag and final rank; halving-vs-grid
    winner parity is pinned in tests/test_ml.py."""
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 10 == 0)
        .withColumn("_t", F.col("l_shipdate").cast("timestamp").cast("double"))
    )
    grid = [
        {"max_depth": d, "max_iter": it, "step_size": 0.1}
        for d in (2, 4) for it in (2, 4)
    ]
    res, _ = models.gbt_halving_search_temporal(
        li,
        features=["l_quantity", "l_discount", "l_tax"],
        target="l_extendedprice",
        time_col="_t",
        grid=grid,
        n_splits=1,
        categorical=["l_returnflag"],
        factor=2,
        min_resource_frac=0.3,
        refit=False,
        fit_partitions=8,
    )
    return res.select(
        "max_depth", "max_iter", "step_size", "rung", "resource_frac",
        rnd(F.col("avg_rmse"), 4).alias("avg_rmse"), "survived", "rank",
    ).orderBy("rank", "rung")


@query(
    "model_gbt_feature_importance",
    # Full replay of the declarative histogram-stump boosting (promoted
    # from rows-only in r8): fixed-point residuals make every histogram
    # sum an exact integer, so split choices and gains are bit-identical
    # and the 5 rounds unroll as CTEs.
    oracle=f"""
    WITH fit AS (
      SELECT CAST(l_quantity AS DOUBLE) AS q, CAST(l_discount AS DOUBLE) AS dc,
             CAST(l_tax AS DOUBLE) AS tx,
             CASE l_returnflag WHEN 'A' THEN 0.0 WHEN 'N' THEN 1.0
                  ELSE 2.0 END AS rf,
             CAST(floor(CAST(l_extendedprice AS DOUBLE) * 10000.0 + 0.5)
                  AS BIGINT) AS yfp
      FROM lineitem WHERE l_orderkey % 5 = 0
    ), st AS (
      SELECT count(*) AS n, sum(yfp) AS sy,
             min(q) AS mnq, max(q) AS mxq, min(dc) AS mndc, max(dc) AS mxdc,
             min(tx) AS mntx, max(tx) AS mxtx, min(rf) AS mnrf, max(rf) AS mxrf
      FROM fit
    ), r0 AS MATERIALIZED (
      SELECT {_duck_bin('f.q', 'st.mnq', 'st.mxq')} AS bq,
             {_duck_bin('f.dc', 'st.mndc', 'st.mxdc')} AS bdc,
             {_duck_bin('f.tx', 'st.mntx', 'st.mxtx')} AS btx,
             {_duck_bin('f.rf', 'st.mnrf', 'st.mxrf')} AS brf,
             f.yfp - CAST(floor(CAST(st.sy AS DOUBLE) / CAST(st.n AS DOUBLE)
                                + 0.5) AS BIGINT) AS r
      FROM fit f CROSS JOIN st
    ),{_duck_stump_round(1)},{_duck_stump_round(2)},{_duck_stump_round(3)},{_duck_stump_round(4)},{_duck_stump_round(5)}, tot AS (
      SELECT ((((b1.gain + b2.gain) + b3.gain) + b4.gain) + b5.gain) AS t
      FROM b1, b2, b3, b4, b5
    ), imp AS (
      SELECT n.f AS feature,
             ((((CASE WHEN b1.f = n.f THEN b1.gain ELSE 0.0 END
                + CASE WHEN b2.f = n.f THEN b2.gain ELSE 0.0 END)
                + CASE WHEN b3.f = n.f THEN b3.gain ELSE 0.0 END)
                + CASE WHEN b4.f = n.f THEN b4.gain ELSE 0.0 END)
                + CASE WHEN b5.f = n.f THEN b5.gain ELSE 0.0 END) AS g
      FROM (VALUES ('l_quantity'), ('l_discount'), ('l_tax'),
                   ('l_returnflag')) n(f)
      CROSS JOIN b1 CROSS JOIN b2 CROSS JOIN b3 CROSS JOIN b4 CROSS JOIN b5
    )
    SELECT feature, round(g / t, 4) + 0.0 AS importance,
           CAST(row_number() OVER (ORDER BY round(g / t, 4) + 0.0 DESC,
                feature ASC) AS INT) AS rank
    FROM imp CROSS JOIN tot
    """,
    category="ml",
)
def model_gbt_feature_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranked boosted-tree feature importances (`metrics_visualizer.py:
    501-530` SHAP ranking, `model_evaluation.ipynb` cell 54 top-20) — fit
    on the deterministic 20% hash-sample, rank the impurity gain of each
    feature incl. the categorical. r8: retrained on the DECLARATIVE
    histogram-stump booster (models.stump_boost_importances — the
    LightGBM-style histogram algorithm: one (feature, bin) aggregate per
    round, bounded driver state, fixed-point residuals), which makes the
    split-gain arithmetic engine-exact and promotes this query from
    rows-only to a full value-hash oracle. The Spark-ML GBT path stays
    covered by model_gbt_fit_predict."""
    li = load(spark, sf_dir, "lineitem")
    fit_df = li.filter(F.col("l_orderkey") % 5 == 0)
    flag_idx = (
        F.when(F.col("l_returnflag") == "A", 0.0)
        .when(F.col("l_returnflag") == "N", 1.0)
        .otherwise(2.0)
    )
    return models.stump_boost_importances(
        fit_df,
        features={
            "l_quantity": "l_quantity",
            "l_discount": "l_discount",
            "l_tax": "l_tax",
            "l_returnflag": flag_idx,
        },
        target="l_extendedprice",
        rounds=5,
        lr=0.5,
    )


@query(
    "model_persist_pickle",
    oracle="""
    SELECT CAST(2 AS INT) AS n_stages,
           CAST(2 AS INT) AS n_trees,
           'l_quantity,l_discount' AS features,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_match,
           TRUE AS roundtrip_ok
    FROM lineitem WHERE l_orderkey % 50 = 0
    """,
    category="ml",
)
def model_persist_pickle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model persistence round trip (`utils.py:8-13`): save the fitted
    pipeline with Spark ML's writer, reload, re-score, and report the
    RELOADED artifact's metadata plus prediction parity. The fit itself
    is nondeterministic-by-library, but the persisted-artifact metadata
    (stage count, tree count, assembler input columns) and the
    save→load→re-score parity ARE deterministic given the seed, so this
    is a full value-hash oracle (r11 promotion from rows-only): the SQL
    pins the expected metadata and asserts n_match == n_rows — any
    roundtrip drift (a prediction changing across the reload) breaks the
    hash."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    feats = ["l_quantity", "l_discount"]
    _, model = models.gbt_fit_predict(
        li,
        features=feats,
        target="l_extendedprice",
        keys=["l_orderkey", "l_linenumber"],
        max_iter=2,
    )
    path = _cache_dir(sf_dir, "gbt_model")
    reloaded = models.persist_pipeline(model, path)
    # metadata read from the RELOADED artifact, not the in-memory model —
    # the writer/loader pair is the surface under test
    assembler, gbt = reloaded.stages[0], reloaded.stages[-1]
    feat_list = ",".join(assembler.getInputCols())
    n_trees = gbt.getNumTrees
    # row-aligned parity: score the SAME rows with both models in one
    # plan (original then reloaded) — a key join would fan out because
    # the synthetic lineitem's (orderkey, linenumber) is not unique
    both = reloaded.transform(
        model.transform(li)
        .withColumnRenamed("yhat", "yhat_orig")
        .drop("_features")
    )
    agg = both.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (F.abs(F.col("yhat_orig") - F.col("yhat")) < 1e-9).cast("long")
        ).alias("m"),
    ).first()
    n_total, n_match = int(agg["n"]), int(agg["m"])
    return spark.createDataFrame(
        [
            (
                len(reloaded.stages),
                int(n_trees),
                feat_list,
                n_total,
                n_match,
                n_total == n_match,
            )
        ],
        "n_stages int, n_trees int, features string, n_rows long,"
        " n_match long, roundtrip_ok boolean",
    )


def _nb_oracle() -> str:
    from etl_aws_spark.text import _dialect as D

    toks = D.tokens("text", D.DUCK)
    return f"""
    WITH tok AS (
      SELECT doc_id, lang, unnest({toks}) AS t FROM documents
    ), tf AS (
      SELECT doc_id, lang, t, count(*) AS tf FROM tok GROUP BY 1, 2, 3
    ), cls_tok AS (
      SELECT lang AS c, t, count(*) AS ct FROM tok GROUP BY 1, 2
    ), cls_tot AS (
      SELECT c, CAST(sum(ct) AS BIGINT) AS tot FROM cls_tok GROUP BY 1
    ), priors AS (
      SELECT lang AS c, count(*) AS nd FROM documents GROUP BY 1
    ), vocab AS (
      SELECT count(DISTINCT t) AS v FROM tok
    ), nn AS (
      SELECT count(*) AS n FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.lang, p.c,
             tf.tf * ln((coalesce(k.ct, 0) + 1.0) / (ct2.tot + v.v)) AS ll,
             ln(CAST(p.nd AS DOUBLE) / nn.n) AS lp
      FROM tf
      CROSS JOIN priors p
      JOIN cls_tot ct2 ON ct2.c = p.c
      CROSS JOIN vocab v CROSS JOIN nn
      LEFT JOIN cls_tok k ON k.c = p.c AND k.t = tf.t
    ), per AS (
      SELECT doc_id, lang, c, round(sum(ll) + any_value(lp), 4) AS score
      FROM scored GROUP BY 1, 2, 3
    )
    SELECT doc_id, lang, c AS pred, score + 0.0 AS score
    FROM per
    QUALIFY row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, c ASC) = 1
    """


@query("model_naive_bayes_lang", oracle=_nb_oracle(), category="ml")
def model_naive_bayes_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language classifier trained AND scored as
    pure DataFrame algebra (ml/naive_bayes.py): the model is two broadcast
    tables, training is one aggregation pass, inference is a join — no
    driver-side model object, no UDF. The oracle replays the identical
    smoothed arithmetic in SQL, making this the rare *trained model* whose
    per-prediction outputs are exact-hash-checked cross-engine (the
    GBT/SARIMAX family is rows-only by declared design). Rounded scores +
    lexicographic tie-break keep the argmax engine-stable."""
    from etl_aws_spark.ml import naive_bayes
    from etl_aws_spark.text import _dialect as D

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.expr(D.tokens("text", D.SPARK)).alias("_toks")
    )
    out = naive_bayes.nb_train_score(
        docs, id_col="doc_id", class_col="lang", tokens_col="_toks"
    )
    return out.select("doc_id", "lang", "pred", "score")


_LR_ITERS, _LR_RATE = 5, 0.5
# fixed-point grid for the gradient sums: term ≤ ~1.1 ⇒ |Σ| ≤ N·1.1e9,
# exact in int64 up to ~8e6 rows (sf1 and below; see SCALE.md §7f)
_LR_GRID = 1e9


def _duck_lr_iter(t: int) -> str:
    """One unrolled gradient-descent round: margins from the previous
    weight row, rational fast-sigmoid probabilities, FIXED-POINT int64
    gradient sums, nudged-8 weight update — op-for-op the Spark loop."""
    return f"""
    g{t} AS (
      SELECT
        CAST(sum(CAST(round((0.5 + (w.w0 + w.w1*f.x1 + w.w2*f.x2)
              / (2.0*(1.0 + abs(w.w0 + w.w1*f.x1 + w.w2*f.x2))) - f.y)
              * {_LR_GRID}) AS BIGINT)) AS DOUBLE) / {_LR_GRID} AS g0,
        CAST(sum(CAST(round((0.5 + (w.w0 + w.w1*f.x1 + w.w2*f.x2)
              / (2.0*(1.0 + abs(w.w0 + w.w1*f.x1 + w.w2*f.x2))) - f.y)
              * f.x1 * {_LR_GRID}) AS BIGINT)) AS DOUBLE) / {_LR_GRID} AS g1,
        CAST(sum(CAST(round((0.5 + (w.w0 + w.w1*f.x1 + w.w2*f.x2)
              / (2.0*(1.0 + abs(w.w0 + w.w1*f.x1 + w.w2*f.x2))) - f.y)
              * f.x2 * {_LR_GRID}) AS BIGINT)) AS DOUBLE) / {_LR_GRID} AS g2
      FROM feat f CROSS JOIN w{t - 1} w
    ), w{t} AS (
      SELECT
        round(w.w0 - {_LR_RATE} * g.g0 / n.nv
              + sign(w.w0 - {_LR_RATE} * g.g0 / n.nv) * 1e-9, 8) + 0.0 AS w0,
        round(w.w1 - {_LR_RATE} * g.g1 / n.nv
              + sign(w.w1 - {_LR_RATE} * g.g1 / n.nv) * 1e-9, 8) + 0.0 AS w1,
        round(w.w2 - {_LR_RATE} * g.g2 / n.nv
              + sign(w.w2 - {_LR_RATE} * g.g2 / n.nv) * 1e-9, 8) + 0.0 AS w2
      FROM w{t - 1} w CROSS JOIN g{t} g CROSS JOIN nn n
    )"""


@query(
    "model_logreg_gradient_descent",
    oracle=f"""
    WITH feat AS (
      SELECT o_totalprice / 500000.0 AS x1,
             month(o_orderdate) / 12.0 AS x2,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1.0 ELSE 0.0 END AS y
      FROM orders
    ), nn AS (
      SELECT CAST(count(*) AS DOUBLE) AS nv FROM feat
    ), w0 AS (
      SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2
    ),{','.join(_duck_lr_iter(t) for t in range(1, _LR_ITERS + 1))},
    acc AS (
      SELECT sum(CASE WHEN (CASE WHEN w.w0 + w.w1*f.x1 + w.w2*f.x2 > 0
                                 THEN 1.0 ELSE 0.0 END) = f.y
                      THEN 1 ELSE 0 END) AS n_correct
      FROM feat f CROSS JOIN w{_LR_ITERS} w
    )
    SELECT 'w0' AS metric, w0 AS value FROM w{_LR_ITERS}
    UNION ALL SELECT 'w1', w1 FROM w{_LR_ITERS}
    UNION ALL SELECT 'w2', w2 FROM w{_LR_ITERS}
    UNION ALL SELECT 'accuracy',
      round(acc.n_correct / nn.nv, 6) + 0.0 FROM acc CROSS JOIN nn
    UNION ALL SELECT 'n_rows', nn.nv FROM nn
    """,
    category="ml",
)
def model_logreg_gradient_descent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic regression trained FROM SCRATCH by distributed batch
    gradient descent ({_LR_ITERS} fixed rounds, lr {_LR_RATE}) — the
    linear-model complement of the tree family, with every numerical
    trick the engine-parity layer has proven out: (1) the sigmoid is the
    RATIONAL fast-sigmoid 0.5 + m/(2(1+|m|)) — division/abs only, so
    both engines compute bit-identical probabilities where libm exp()
    would drift in the last ulp; (2) gradient sums accumulate in
    FIXED-POINT int64 (1e9 grid — exact to ~8e6 rows, SCALE.md §7f), so
    the distributed sum is summation-order-independent; (3) weights
    cross the nudged-8 bridge each round. Each iteration is ONE
    map-side-combined aggregate over the feature scan; weights are
    3 driver-side doubles (bounded model state, the kmeans pattern).
    Output: final weights, training accuracy (decision boundary m > 0 —
    pure comparison, no transcendental), row count."""
    orders = load(spark, sf_dir, "orders")
    feat = orders.select(
        (F.col("o_totalprice") / 500000.0).alias("x1"),
        (F.month("o_orderdate") / 12.0).alias("x2"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1.0
        ).otherwise(0.0).alias("y"),
    ).localCheckpoint(eager=True)
    n = float(feat.count())
    w = [0.0, 0.0, 0.0]
    grid = _LR_GRID

    def margin_expr():
        return f"({w[0]!r} + {w[1]!r} * x1 + {w[2]!r} * x2)"

    for _ in range(_LR_ITERS):
        m = margin_expr()
        p = f"(0.5 + {m} / (2.0 * (1.0 + abs({m}))))"
        gs = feat.agg(
            *[
                (
                    F.sum(
                        F.round(F.expr(f"({p} - y) {mul}") * F.lit(grid)).cast("long")
                    ).cast("double")
                    / F.lit(grid)
                ).alias(f"g{j}")
                for j, mul in enumerate(["* 1.0", "* x1", "* x2"])
            ]
        ).first()
        new_w = []
        for j in range(3):
            raw = w[j] - _LR_RATE * gs[f"g{j}"] / n
            nudged = round(raw + (1e-9 if raw > 0 else -1e-9 if raw < 0 else 0.0), 8)
            new_w.append(nudged + 0.0)
        w = new_w
    m = margin_expr()
    acc_row = feat.agg(
        F.sum(
            F.when(
                (F.expr(m) > 0).cast("double") == F.col("y"), 1
            ).otherwise(0)
        ).alias("n_correct")
    ).first()
    acc = round(acc_row["n_correct"] / n, 6) + 0.0
    rows = [
        ("w0", w[0]),
        ("w1", w[1]),
        ("w2", w[2]),
        ("accuracy", acc),
        ("n_rows", n),
    ]
    return spark.createDataFrame(rows, "metric string, value double")


@query(
    "model_logreg_calibration",
    # reuses the unrolled gradient-descent replay (same fixed-point
    # grid, same rational sigmoid), then bins the final probabilities
    oracle=f"""
    WITH feat AS (
      SELECT o_totalprice / 500000.0 AS x1,
             month(o_orderdate) / 12.0 AS x2,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1.0 ELSE 0.0 END AS y
      FROM orders
    ), nn AS (
      SELECT CAST(count(*) AS DOUBLE) AS nv FROM feat
    ), w0 AS (
      SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2
    ),{','.join(_duck_lr_iter(t) for t in range(1, _LR_ITERS + 1))},
    probs AS (
      SELECT f.y,
             0.5 + (w.w0 + w.w1*f.x1 + w.w2*f.x2)
               / (2.0*(1.0 + abs(w.w0 + w.w1*f.x1 + w.w2*f.x2))) AS p
      FROM feat f CROSS JOIN w{_LR_ITERS} w
    )
    SELECT CAST(least(greatest(CAST(floor(p * 10.0) AS INT), 0), 9) AS INT)
             AS bin,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(p), 6) + 0.0 AS mean_pred,
           round(avg(y), 6) + 0.0 AS actual_rate
    FROM probs
    GROUP BY least(greatest(CAST(floor(p * 10.0) AS INT), 0), 9)
    """,
    category="ml",
)
def model_logreg_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration / reliability curve for the from-scratch logistic
    regression — the evaluation beyond accuracy: final-round
    probabilities bin into deciles and each bin reports predicted-vs-
    actual rates (a calibrated model sits on the diagonal; the gap is
    what Platt scaling would fix). Training replays the identical
    fixed-point gradient descent (`model_logreg_gradient_descent`), so
    probabilities are bit-exact cross-engine BEFORE binning — bin
    boundaries can never disagree. The curve itself is one 10-cell
    aggregate over the scored scan."""
    orders = load(spark, sf_dir, "orders")
    feat = orders.select(
        (F.col("o_totalprice") / 500000.0).alias("x1"),
        (F.month("o_orderdate") / 12.0).alias("x2"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1.0
        ).otherwise(0.0).alias("y"),
    ).localCheckpoint(eager=True)
    n = float(feat.count())
    w = [0.0, 0.0, 0.0]
    grid = _LR_GRID
    for _ in range(_LR_ITERS):
        m = f"({w[0]!r} + {w[1]!r} * x1 + {w[2]!r} * x2)"
        p = f"(0.5 + {m} / (2.0 * (1.0 + abs({m}))))"
        gs = feat.agg(
            *[
                (
                    F.sum(
                        F.round(F.expr(f"({p} - y) {mul}") * F.lit(grid)).cast("long")
                    ).cast("double")
                    / F.lit(grid)
                ).alias(f"g{j}")
                for j, mul in enumerate(["* 1.0", "* x1", "* x2"])
            ]
        ).first()
        new_w = []
        for j in range(3):
            raw = w[j] - _LR_RATE * gs[f"g{j}"] / n
            nudged = round(raw + (1e-9 if raw > 0 else -1e-9 if raw < 0 else 0.0), 8)
            new_w.append(nudged + 0.0)
        w = new_w
    m = f"({w[0]!r} + {w[1]!r} * x1 + {w[2]!r} * x2)"
    p = f"(0.5 + {m} / (2.0 * (1.0 + abs({m}))))"
    probs = feat.select(F.expr(p).alias("p"), "y")
    binned = probs.select(
        F.least(
            F.greatest(F.floor(F.col("p") * 10.0).cast("int"), F.lit(0)), F.lit(9)
        ).alias("bin"),
        "p",
        "y",
    )
    return binned.groupBy(F.col("bin").cast("int").alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.round(F.avg("p"), 6) + F.lit(0.0)).alias("mean_pred"),
        (F.round(F.avg("y"), 6) + F.lit(0.0)).alias("actual_rate"),
    )


@query(
    "model_roc_auc_exact",
    # histogram formulation of AUC: the probability a random positive
    # outscores a random negative (ties count half) — exactly the
    # Mann-Whitney U_pos / (n_pos * n_neg), computed from per-score
    # (pos, neg) cells + one cumulative window over |distinct scores|.
    # Integer-exact until the final divisions.
    oracle="""
    WITH t AS (
      SELECT user_id,
             sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS score,
             sum(CASE WHEN event_type = 'purchase'
                 THEN CAST(round(CAST(value AS DOUBLE) * 100.0) AS BIGINT)
                 ELSE 0 END) AS cents
      FROM events GROUP BY user_id
    ), m AS (
      SELECT CAST(sum(cents) AS DOUBLE) / count(*) AS mu FROM t
    ), u AS (
      SELECT score,
             CASE WHEN CAST(cents AS DOUBLE) > m.mu THEN 1 ELSE 0 END AS is_pos
      FROM t CROSS JOIN m
    ), h AS (
      SELECT score,
             sum(is_pos) AS np_v,
             sum(1 - is_pos) AS nn_v
      FROM u GROUP BY score
    ), c AS (
      SELECT score, np_v, nn_v,
             coalesce(sum(nn_v) OVER (ORDER BY score
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cumn_lt
      FROM h
    ), tot AS (
      SELECT sum(np_v) AS np, sum(nn_v) AS nn FROM h
    ), a AS (
      SELECT sum(np_v * (cumn_lt + 0.5 * nn_v)) AS u_stat FROM c
    )
    SELECT CAST(tot.np AS BIGINT) AS n_pos,
           CAST(tot.nn AS BIGINT) AS n_neg,
           round(a.u_stat, 4) + 0.0 AS u_stat,
           round(a.u_stat / (tot.np * tot.nn), 6) + 0.0 AS auc,
           round(2.0 * a.u_stat / (tot.np * tot.nn) - 1.0, 6) + 0.0 AS gini
    FROM a CROSS JOIN tot
    """,
    category="ml",
)
def model_roc_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT ROC AUC of a ranking score (per-user click count) against a
    binary label (above-mean total purchase spend) — the standard offline
    eval of any propensity / quality ranker, computed WITHOUT sorting N
    rows: AUC = P(score_pos > score_neg) + 0.5*P(tie) is the normalized
    Mann-Whitney U, so scores pre-aggregate to per-value (n_pos, n_neg)
    histogram cells and one cumulative window over |distinct scores|
    (bounded by max user activity, not corpus size) finishes the job —
    the same scale-safe rank formulation as `stat_mann_whitney_u`.
    Gini = 2*AUC - 1 comes free. Everything is exact integer arithmetic
    until the final two divisions, so the hash is deterministic.

    Scale shape (100 TB): one map-side-combined user aggregate, one
    |distinct scores| histogram, one tiny window. No global sort of the
    score column (the textbook trapezoid formulation needs one); no ties
    approximation. Reference analogue: the eval step the notebooks'
    sklearn `roc_auc_score` calls (src/model/train.py metrics block),
    re-expressed as distributed exact arithmetic."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    t = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
            "score"
        ),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value").cast("double") * 100.0).cast("long"),
            ).otherwise(0)
        ).alias("cents"),
    )
    m = t.agg(
        (F.sum("cents").cast("double") / F.count(F.lit(1))).alias("mu")
    )
    u = t.crossJoin(F.broadcast(m)).select(
        "score",
        F.when(F.col("cents").cast("double") > F.col("mu"), 1)
        .otherwise(0)
        .alias("is_pos"),
    )
    h = u.groupBy("score").agg(
        F.sum("is_pos").alias("np_v"),
        F.sum(F.lit(1) - F.col("is_pos")).alias("nn_v"),
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    c = h.withColumn("cumn_lt", F.coalesce(F.sum("nn_v").over(w), F.lit(0)))
    tot = h.agg(F.sum("np_v").alias("np"), F.sum("nn_v").alias("nn"))
    a = c.agg(
        F.sum(
            F.col("np_v") * (F.col("cumn_lt") + 0.5 * F.col("nn_v"))
        ).alias("u_stat")
    )
    auc = F.col("u_stat") / (F.col("np") * F.col("nn"))
    return a.crossJoin(F.broadcast(tot)).select(
        F.col("np").cast("long").alias("n_pos"),
        F.col("nn").cast("long").alias("n_neg"),
        rnd(F.col("u_stat")).alias("u_stat"),
        (F.round(auc, 6) + F.lit(0.0)).alias("auc"),
        (F.round(2.0 * auc - 1.0, 6) + F.lit(0.0)).alias("gini"),
    )


def _gmm_oracle_sql(iters: int) -> str:
    """Materialized-CTE replay of the histogram-domain EM loop: iteration
    k's cells CTE joins the params CTE i{k-1}, the six responsibility
    folds run in ascending-cents order, and every double op is the same
    IEEE chain the Spark driver loop executes (the BPE-training oracle
    pattern). exp() is the only transcendental — nudge-rounded to 8
    digits before the weight products on both engines."""
    e = (
        "(round(exp(-least(((CAST(x.vc AS DOUBLE) - i.mu{j}) / i.s{j})"
        " * ((CAST(x.vc AS DOUBLE) - i.mu{j}) / i.s{j}) / 2.0, 18.0))"
        " + 1e-9, 8) + 0.0)"
    )
    fold = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list({t} ORDER BY vc)), (a, y) -> a + y)"
    )
    parts = [
        """
    WITH h AS (
      SELECT CAST(round(CAST(value AS DOUBLE) * 100.0) AS BIGINT) AS vc,
             count(*) AS c
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), tot AS (
      SELECT sum(c * vc) AS s, sum(c * vc * vc) AS q,
             sum(c) AS n, count(*) AS ncells
      FROM h
    ), g AS (
      SELECT CAST(n AS DOUBLE) AS nd, n, ncells,
             CAST(s AS DOUBLE) / n AS mu,
             sqrt(greatest(CAST(q AS DOUBLE) / n
                  - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n),
                  1.0)) AS sg
      FROM tot
    ), i0 AS (
      SELECT 0.5 AS pi1, mu - sg / 2.0 AS mu1, sg AS s1,
             mu + sg / 2.0 AS mu2, sg AS s2
      FROM g
    )"""
    ]
    for k in range(1, iters + 1):
        w1 = f"i.pi1 * {e.format(j=1)} / i.s1"
        w2 = f"(1.0 - i.pi1) * {e.format(j=2)} / i.s2"
        parts.append(
            f""", c{k} AS (
      SELECT vc, c, v,
             CASE WHEN (w1 + w2) <= 0.0 THEN 0.5
                  ELSE w1 / (w1 + w2) END AS r
      FROM (
        SELECT x.vc, x.c, CAST(x.vc AS DOUBLE) AS v,
               {w1} AS w1,
               {w2} AS w2
        FROM h x CROSS JOIN i{k - 1} i
      )
    ), a{k} AS (
      SELECT {fold.format(t="c * r")} AS n1,
             {fold.format(t="c * r * v")} AS s1sum,
             {fold.format(t="c * r * v * v")} AS q1,
             {fold.format(t="c * (1.0 - r)")} AS n2,
             {fold.format(t="c * (1.0 - r) * v")} AS s2sum,
             {fold.format(t="c * (1.0 - r) * v * v")} AS q2
      FROM c{k}
    ), i{k} AS (
      SELECT a.n1 / g.nd AS pi1,
             a.s1sum / a.n1 AS mu1,
             sqrt(greatest(a.q1 / a.n1
                  - (a.s1sum / a.n1) * (a.s1sum / a.n1), 1.0)) AS s1,
             a.s2sum / a.n2 AS mu2,
             sqrt(greatest(a.q2 / a.n2
                  - (a.s2sum / a.n2) * (a.s2sum / a.n2), 1.0)) AS s2
      FROM a{k} a CROSS JOIN g
    )"""
        )
    parts.append(
        f"""
    SELECT CAST(g.n AS BIGINT) AS n_obs,
           CAST(g.ncells AS BIGINT) AS n_cells,
           round(i.pi1 + sign(i.pi1) * 1e-9, 6) + 0.0 AS pi1,
           round(i.mu1 / 100.0 + sign(i.mu1 / 100.0) * 1e-9, 6) + 0.0 AS mu1,
           round(i.s1 / 100.0 + sign(i.s1 / 100.0) * 1e-9, 6) + 0.0 AS sigma1,
           round(i.mu2 / 100.0 + sign(i.mu2 / 100.0) * 1e-9, 6) + 0.0 AS mu2,
           round(i.s2 / 100.0 + sign(i.s2 / 100.0) * 1e-9, 6) + 0.0 AS sigma2
    FROM i{iters} i CROSS JOIN g"""
    )
    return "".join(parts)


_GMM_ITERS = 5


@query(
    "model_gmm_em_univariate",
    oracle=_gmm_oracle_sql(_GMM_ITERS),
    category="ml",
)
def model_gmm_em_univariate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-component univariate Gaussian-mixture fit by {n} fixed EM
    iterations over purchase values — run in the HISTOGRAM domain:
    2-decimal prices collapse to |distinct cents| cells first, so the
    E-step responsibilities and the six M-step moment folds touch
    |cells| rows per iteration, never N. Mixture params are O(1) MODEL
    STATE collected to the driver between iterations and re-broadcast as
    plan-time literals (the `kmeans_iterate` pattern, SCALE.md §5) — no
    join, no corpus shuffle; the only aggregate is map-side combined.

    Determinism: initialization comes from exact integer sums (Σc, Σcv,
    Σcv² in cents), every update is the identical IEEE op chain on both
    engines (driver Python doubles == engine doubles), exp() — the one
    transcendental — is nudge-rounded to 8 digits before the weight
    products, the responsibility folds run in ascending-cents order, and
    a degenerate cell (both weights underflow) gets r=1/2 by definition.
    Variance floors at 1 cent² so components can't collapse. Reference
    analogue: the latent-regime step beyond `src/model/train.py`'s
    point-estimate fits; public EM formulation (Dempster et al. 1977).
    """.format(
        n=_GMM_ITERS
    )
    import math

    from etl_aws_spark.suite._util import rnd_nudged

    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    h = (
        ev.groupBy(
            F.round(F.col("value").cast("double") * 100.0)
            .cast("long")
            .alias("vc")
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    t = h.agg(
        F.sum(F.col("c") * F.col("vc")).alias("s"),
        F.sum(F.col("c") * F.col("vc") * F.col("vc")).alias("q"),
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("ncells"),
    ).collect()[0]
    s_i, q_i, n_i, ncells = t["s"], t["q"], t["n"], t["ncells"]
    nd = float(n_i)
    mu = float(s_i) / n_i
    sg = math.sqrt(max(float(q_i) / n_i - mu * mu, 1.0))
    pi1, mu1, s1, mu2, s2 = 0.5, mu - sg / 2.0, sg, mu + sg / 2.0, sg

    def weight(pi: float, m: float, sd: float, sign_pi: bool) -> "F.Column":
        v = F.col("vc").cast("double")
        d = (v - F.lit(m)) / F.lit(sd)
        e = F.round(
            F.exp(-F.least(d * d / F.lit(2.0), F.lit(18.0))) + F.lit(1e-9), 8
        ) + F.lit(0.0)
        p = F.lit(pi) if not sign_pi else (F.lit(1.0) - F.lit(pi))
        return p * e / F.lit(sd)

    fold = (
        "aggregate(transform(array_sort(collect_list(struct(vc, {t} as tv))), "
        "x -> x.tv), cast(0.0 as double), (a, y) -> a + y)"
    )
    for _ in range(_GMM_ITERS):
        w1, w2 = weight(pi1, mu1, s1, False), weight(pi1, mu2, s2, True)
        cells = h.select(
            "vc",
            "c",
            F.col("vc").cast("double").alias("v"),
            F.when(w1 + w2 <= 0.0, 0.5).otherwise(w1 / (w1 + w2)).alias("r"),
        )
        row = cells.agg(
            F.expr(fold.format(t="c * r")).alias("n1"),
            F.expr(fold.format(t="c * r * v")).alias("s1sum"),
            F.expr(fold.format(t="c * r * v * v")).alias("q1"),
            F.expr(fold.format(t="c * (1.0D - r)")).alias("n2"),
            F.expr(fold.format(t="c * (1.0D - r) * v")).alias("s2sum"),
            F.expr(fold.format(t="c * (1.0D - r) * v * v")).alias("q2"),
        ).collect()[0]
        pi1 = row["n1"] / nd
        mu1 = row["s1sum"] / row["n1"]
        s1 = math.sqrt(max(row["q1"] / row["n1"] - mu1 * mu1, 1.0))
        mu2 = row["s2sum"] / row["n2"]
        s2 = math.sqrt(max(row["q2"] / row["n2"] - mu2 * mu2, 1.0))
    return spark.range(1).select(
        F.lit(int(n_i)).cast("long").alias("n_obs"),
        F.lit(int(ncells)).cast("long").alias("n_cells"),
        rnd_nudged(F.lit(pi1), 6).alias("pi1"),
        rnd_nudged(F.lit(mu1 / 100.0), 6).alias("mu1"),
        rnd_nudged(F.lit(s1 / 100.0), 6).alias("sigma1"),
        rnd_nudged(F.lit(mu2 / 100.0), 6).alias("mu2"),
        rnd_nudged(F.lit(s2 / 100.0), 6).alias("sigma2"),
    )


@query(
    "model_ndcg_ranking_eval",
    # top-20 by score and ideal top-20 by relevance both come from
    # orderBy().limit(20) (TakeOrderedAndProject); ranks attach on the
    # 20-row frames; log2 — the one transcendental — is nudge-rounded to
    # 8 digits before the division; per-k folds walk rank order.
    oracle="""
    WITH u AS (
      SELECT user_id,
             sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS score,
             least(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END),
                   10) AS rel
      FROM events GROUP BY user_id
    ), top AS (
      SELECT rel, row_number() OVER (ORDER BY score DESC, user_id) AS rk
      FROM u ORDER BY score DESC, user_id LIMIT 20
    ), ideal AS (
      SELECT rel, row_number() OVER (ORDER BY rel DESC, user_id) AS rk
      FROM u ORDER BY rel DESC, user_id LIMIT 20
    ), terms AS (
      SELECT rk,
             (power(2.0, CAST(rel AS DOUBLE)) - 1.0)
               / (round(log2(CAST(rk + 1 AS DOUBLE)) + 1e-9, 8) + 0.0) AS t
      FROM top
    ), iterms AS (
      SELECT rk,
             (power(2.0, CAST(rel AS DOUBLE)) - 1.0)
               / (round(log2(CAST(rk + 1 AS DOUBLE)) + 1e-9, 8) + 0.0) AS t
      FROM ideal
    ), ks AS (SELECT unnest([5, 10, 20]) AS k),
    d AS (
      SELECT ks.k,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(terms.t ORDER BY terms.rk)), (a, x) -> a + x) AS dcg
      FROM ks JOIN terms ON terms.rk <= ks.k GROUP BY ks.k
    ), i AS (
      SELECT ks.k,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(iterms.t ORDER BY iterms.rk)), (a, x) -> a + x) AS idcg
      FROM ks JOIN iterms ON iterms.rk <= ks.k GROUP BY ks.k
    )
    SELECT CAST(d.k AS INT) AS k,
           round(d.dcg, 6) + 0.0 AS dcg,
           round(i.idcg, 6) + 0.0 AS idcg,
           round(d.dcg / i.idcg, 6) + 0.0 AS ndcg
    FROM d JOIN i ON d.k = i.k
    """,
    category="ml",
)
def model_ndcg_ranking_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@{5,10,20} of the click-count ranker against graded purchase
    relevance (capped at 10) — the position-weighted ranking metric that
    AUC can't see: AUC scores the whole ordering, nDCG concentrates on
    the head a retrieval/curation system actually serves. Both the
    scored top-20 and the ideal top-20 come from `orderBy().limit(20)`
    (TakeOrderedAndProject: mergeable per-partition top-k, never a
    global sort), ranks attach on the 20-row frames, and the per-k DCG
    folds walk rank order so the sums are bit-exact. log2 — the one
    transcendental — is nudge-rounded to 8 digits before the division
    (the periodogram trig recipe).

    Scale shape (100 TB): one map-side-combined user aggregate, two
    top-20s, arithmetic on <= 20 rows. Reference analogue: the ranking
    leg of the eval the notebooks run point-metrics for
    (src/model/train.py), made exact and distributed."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
            "score"
        ),
        F.least(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)),
            F.lit(10),
        ).alias("rel"),
    )

    def _ranked_terms(df: DataFrame, order_col: str) -> DataFrame:
        top = df.orderBy(F.desc(order_col), "user_id").limit(20)
        w = Window.orderBy(F.desc(order_col), "user_id")
        r = top.withColumn("rk", F.row_number().over(w))
        lg = F.round(
            F.log2((F.col("rk") + 1).cast("double")) + F.lit(1e-9), 8
        ) + F.lit(0.0)
        return r.select(
            "rk",
            (
                (F.pow(F.lit(2.0), F.col("rel").cast("double")) - 1.0) / lg
            ).alias("t"),
        )

    terms = _ranked_terms(u, "score")
    iterms = _ranked_terms(u, "rel")
    ks = spark.createDataFrame([(5,), (10,), (20,)], "k int")
    fold = (
        "aggregate(transform(array_sort(collect_list(struct(rk, t))), "
        "x -> x.t), cast(0.0 as double), (a, y) -> a + y)"
    )
    d = (
        ks.join(terms, terms["rk"] <= ks["k"])
        .groupBy("k")
        .agg(F.expr(fold).alias("dcg"))
    )
    i = (
        ks.join(iterms, iterms["rk"] <= ks["k"])
        .groupBy("k")
        .agg(F.expr(fold).alias("idcg"))
    )
    return d.join(i, "k").select(
        F.col("k").cast("int").alias("k"),
        (F.round(F.col("dcg"), 6) + F.lit(0.0)).alias("dcg"),
        (F.round(F.col("idcg"), 6) + F.lit(0.0)).alias("idcg"),
        (F.round(F.col("dcg") / F.col("idcg"), 6) + F.lit(0.0)).alias("ndcg"),
    )


@query(
    "model_conformal_interval",
    # split-conformal: q̂ is the ⌈(n_cal+1)(1-α)⌉-th smallest calibration
    # residual — an exact order statistic. The oracle takes it naively
    # (one ranked window); the engine runs the scalable two-phase form
    # (coarse bucket counts → driver cutoff → orderBy().limit(offset)
    # inside the single cutoff bucket — the token-budget pattern).
    # Residuals are |cents − μ| doubles from identical op chains, so the
    # rank-k VALUE matches bit-for-bit.
    oracle="""
    WITH o AS (
      SELECT o_orderpriority AS pri, o_orderdate AS d,
             CAST(round(CAST(o_totalprice AS DOUBLE) * 100.0) AS BIGINT)
               AS cents
      FROM orders
    ), tr AS (
      SELECT pri, CAST(sum(cents) AS DOUBLE) / count(*) AS mu
      FROM o WHERE d < DATE '1996-01-01' GROUP BY pri
    ), cal AS (
      SELECT abs(CAST(o.cents AS DOUBLE) - tr.mu) AS r
      FROM o JOIN tr USING (pri)
      WHERE d >= DATE '1996-01-01' AND d < DATE '1997-06-01'
    ), kk AS (
      SELECT count(*) AS n_cal,
             CAST(ceil((count(*) + 1) * 9e-1) AS BIGINT) AS k
      FROM cal
    ), q AS (
      SELECT s.r AS q_hat
      FROM (SELECT r, row_number() OVER (ORDER BY r) AS rn FROM cal) s
      JOIN kk ON s.rn = kk.k
    ), te AS (
      SELECT abs(CAST(o.cents AS DOUBLE) - tr.mu) AS r
      FROM o JOIN tr USING (pri)
      WHERE d >= DATE '1997-06-01'
    ), cov AS (
      SELECT count(*) AS n_test,
             sum(CASE WHEN te.r <= q.q_hat THEN 1 ELSE 0 END) AS n_in
      FROM te CROSS JOIN q
    )
    SELECT CAST(kk.n_cal AS BIGINT) AS n_cal,
           CAST(kk.k AS BIGINT) AS k_rank,
           CAST(cov.n_test AS BIGINT) AS n_test,
           round(q.q_hat / 100.0, 4) + 0.0 AS q_hat,
           round(2.0 * q.q_hat / 100.0, 4) + 0.0 AS interval_width,
           round(CAST(cov.n_in AS DOUBLE) / cov.n_test, 6) + 0.0 AS coverage
    FROM kk CROSS JOIN q CROSS JOIN cov
    """,
    category="ml",
)
def model_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPLIT-CONFORMAL prediction interval (Vovk; Lei et al. 2018) around
    a per-priority mean-price model: train < 1996-01, calibrate on
    1996-01..1997-06 residuals, test after — q̂ is the ⌈(n+1)(1−α)⌉-th
    smallest calibration residual (α=0.1), giving the distribution-free
    ≥90% coverage guarantee the test leg then verifies empirically. THE
    modern uncertainty wrapper for any point model, and the eval a
    training pipeline runs before shipping intervals.

    Scale shape (100 TB): the exact order statistic never global-sorts —
    coarse 100-dollar bucket counts (bounded by the price domain) reduce
    to a driver cutoff, then `orderBy().limit(offset)` inside the ONE
    cutoff bucket (TakeOrderedAndProject) yields the rank-k value — the
    `curation_token_budget` two-phase pattern applied to quantiles.
    Everything else is map-side aggregates and broadcast joins of the
    5-row model. Exact integer cents keep every residual bit-identical
    across engines."""
    import math

    orders = load(spark, sf_dir, "orders")
    o = orders.select(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_orderdate").alias("d"),
        F.round(F.col("o_totalprice").cast("double") * 100.0)
        .cast("long")
        .alias("cents"),
    )
    tr = (
        o.filter(F.col("d") < F.lit("1996-01-01").cast("date"))
        .groupBy("pri")
        .agg((F.sum("cents").cast("double") / F.count(F.lit(1))).alias("mu"))
    )
    cal = (
        o.filter(
            (F.col("d") >= F.lit("1996-01-01").cast("date"))
            & (F.col("d") < F.lit("1997-06-01").cast("date"))
        )
        .join(F.broadcast(tr), "pri")
        .select(F.abs(F.col("cents").cast("double") - F.col("mu")).alias("r"))
        .localCheckpoint(eager=True)
    )
    n_cal = cal.count()
    k = int(math.ceil((n_cal + 1) * 0.9))
    # phase 1: coarse bucket counts (|price domain| / 100 dollars cells)
    buckets = (
        cal.groupBy(F.floor(F.col("r") / 10000.0).cast("long").alias("bk"))
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy("bk")
        .collect()
    )
    cum = 0
    cutoff_bk, offset = None, None
    for row in buckets:
        if cum + row["c"] >= k:
            cutoff_bk, offset = row["bk"], k - cum
            break
        cum += row["c"]
    # phase 2: rank-(offset) value inside the single cutoff bucket
    q_hat = (
        cal.filter(F.floor(F.col("r") / 10000.0).cast("long") == cutoff_bk)
        .orderBy("r")
        .limit(offset)
        .agg(F.max("r").alias("q"))
        .collect()[0]["q"]
    )
    te = (
        o.filter(F.col("d") >= F.lit("1997-06-01").cast("date"))
        .join(F.broadcast(tr), "pri")
        .select(F.abs(F.col("cents").cast("double") - F.col("mu")).alias("r"))
    )
    cov = te.agg(
        F.count(F.lit(1)).alias("n_test"),
        F.sum(F.when(F.col("r") <= F.lit(q_hat), 1).otherwise(0)).alias("n_in"),
    )
    return cov.select(
        F.lit(n_cal).cast("long").alias("n_cal"),
        F.lit(k).cast("long").alias("k_rank"),
        F.col("n_test").cast("long").alias("n_test"),
        (F.round(F.lit(q_hat) / 100.0, 4) + F.lit(0.0)).alias("q_hat"),
        (F.round(F.lit(2.0) * F.lit(q_hat) / 100.0, 4) + F.lit(0.0)).alias(
            "interval_width"
        ),
        (
            F.round(F.col("n_in").cast("double") / F.col("n_test"), 6)
            + F.lit(0.0)
        ).alias("coverage"),
    )


@query(
    "model_brier_decomposition",
    # Murphy decomposition over forecast-value cells: every rate is an
    # integer ratio, the three components fold over <= |nations| cells in
    # forecast order, and the direct Brier score comes from the same cell
    # counts (s·(p-1)² + (n-s)·p²) — so BS and rel - res + unc are both
    # engine-exact and agree to float identity.
    oracle="""
    WITH o AS (
      SELECT o_custkey, o_orderdate AS d,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
      FROM orders
    ), j AS (
      SELECT c.c_nationkey AS nk, o.d, o.y
      FROM o JOIN customer c ON o.o_custkey = c.c_custkey
    ), tr AS (
      SELECT nk, CAST(sum(y) AS DOUBLE) / count(*) AS p
      FROM j WHERE d < DATE '1996-01-01' GROUP BY nk
    ), te AS (
      SELECT tr.p, j.y FROM j JOIN tr USING (nk)
      WHERE d >= DATE '1996-01-01'
    ), cells AS (
      SELECT p, count(*) AS n, sum(y) AS s FROM te GROUP BY p
    ), tot AS (
      SELECT sum(n) AS nn, sum(s) AS ss FROM cells
    ), terms AS (
      SELECT cells.p, cells.n, cells.s,
             CAST(cells.s AS DOUBLE) / cells.n AS ob,
             tot.nn, CAST(tot.ss AS DOUBLE) / tot.nn AS obar
      FROM cells CROSS JOIN tot
    ), f AS (
      SELECT max(nn) AS nn, max(obar) AS obar,
             count(*) AS n_cells,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(n * (p - ob) * (p - ob) ORDER BY p)),
               (a, x) -> a + x) AS rel_sum,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(n * (ob - obar) * (ob - obar) ORDER BY p)),
               (a, x) -> a + x) AS res_sum,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(s * (p - 1.0) * (p - 1.0) + (n - s) * p * p ORDER BY p)),
               (a, x) -> a + x) AS bs_sum
      FROM terms
    )
    SELECT CAST(nn AS BIGINT) AS n_test,
           CAST(n_cells AS INT) AS n_cells,
           round(bs_sum / nn, 6) + 0.0 AS brier,
           round(rel_sum / nn, 6) + 0.0 AS reliability,
           round(res_sum / nn, 6) + 0.0 AS resolution,
           round(obar * (1.0 - obar), 6) + 0.0 AS uncertainty,
           round(rel_sum / nn - res_sum / nn + obar * (1.0 - obar), 6) + 0.0
             AS brier_reassembled
    FROM f
    """,
    category="ml",
)
def model_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MURPHY DECOMPOSITION of the Brier score for a per-nation
    urgent-order rate forecaster (train < 1996-01, test after):
    BS = reliability − resolution + uncertainty, the standard diagnostic
    that says WHY a probabilistic model scores what it scores —
    miscalibration (reliability), discrimination power (resolution), or
    irreducible base-rate noise (uncertainty). The direct Brier score is
    recomputed from the same cells (s·(p−1)² + (n−s)·p²) and reported
    beside the reassembled sum as a built-in algebraic self-check.

    Scale shape (100 TB): the test scan collapses to |distinct forecast
    values| cells (≤ |nations|) in one map-side aggregate; the three
    component folds run over that tiny frame in forecast order. Exact
    integer counts feed every rate, so both engines produce identical
    IEEE values. Reference analogue: the probabilistic upgrade of
    src/model/train.py's point-metric eval block."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = orders.select(
        "o_custkey",
        F.col("o_orderdate").alias("d"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("y"),
    )
    j = o.join(F.broadcast(cust), o["o_custkey"] == cust["c_custkey"]).select(
        F.col("c_nationkey").alias("nk"), "d", "y"
    )
    tr = (
        j.filter(F.col("d") < F.lit("1996-01-01").cast("date"))
        .groupBy("nk")
        .agg((F.sum("y").cast("double") / F.count(F.lit(1))).alias("p"))
    )
    te = j.filter(F.col("d") >= F.lit("1996-01-01").cast("date")).join(
        F.broadcast(tr), "nk"
    )
    cells = te.groupBy("p").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("s")
    )
    tot = cells.agg(F.sum("n").alias("nn"), F.sum("s").alias("ss"))
    terms = cells.crossJoin(F.broadcast(tot)).select(
        "p", "n", "s",
        (F.col("s").cast("double") / F.col("n")).alias("ob"),
        "nn",
        (F.col("ss").cast("double") / F.col("nn")).alias("obar"),
    )
    fold = (
        "aggregate(transform(array_sort(collect_list(struct(p, {t} as tv))), "
        "x -> x.tv), cast(0.0 as double), (a, y) -> a + y)"
    )
    f = terms.agg(
        F.max("nn").alias("nn"),
        F.max("obar").alias("obar"),
        F.count(F.lit(1)).alias("n_cells"),
        F.expr(fold.format(t="n * (p - ob) * (p - ob)")).alias("rel_sum"),
        F.expr(fold.format(t="n * (ob - obar) * (ob - obar)")).alias("res_sum"),
        F.expr(
            fold.format(t="s * (p - 1.0D) * (p - 1.0D) + (n - s) * p * p")
        ).alias("bs_sum"),
    )
    unc = F.col("obar") * (F.lit(1.0) - F.col("obar"))
    return f.select(
        F.col("nn").cast("long").alias("n_test"),
        F.col("n_cells").cast("int").alias("n_cells"),
        (F.round(F.col("bs_sum") / F.col("nn"), 6) + F.lit(0.0)).alias("brier"),
        (F.round(F.col("rel_sum") / F.col("nn"), 6) + F.lit(0.0)).alias(
            "reliability"
        ),
        (F.round(F.col("res_sum") / F.col("nn"), 6) + F.lit(0.0)).alias(
            "resolution"
        ),
        (F.round(unc, 6) + F.lit(0.0)).alias("uncertainty"),
        (
            F.round(
                F.col("rel_sum") / F.col("nn")
                - F.col("res_sum") / F.col("nn")
                + unc,
                6,
            )
            + F.lit(0.0)
        ).alias("brier_reassembled"),
    )


# Cramer's-rule solve of the 3x3 normal equations, written ONCE as SQL
# text and evaluated by BOTH engines (Spark F.expr / DuckDB) over the
# same nine exact-integer Gram sums, so every intermediate double is
# bit-identical. Columns: n, sx1, sx2, sx11, sx12, sx22, sy, sx1y,
# sx2y, syy (all DOUBLE, each the cast of an exact integer sum).
_OLS_DET = (
    "(n * (sx11 * sx22 - sx12 * sx12) - sx1 * (sx1 * sx22 - sx12 * sx2)"
    " + sx2 * (sx1 * sx12 - sx11 * sx2))"
)
_OLS_B0 = (
    "((sy * (sx11 * sx22 - sx12 * sx12) - sx1 * (sx1y * sx22 - sx12 * sx2y)"
    f" + sx2 * (sx1y * sx12 - sx11 * sx2y)) / {_OLS_DET})"
)
_OLS_B1 = (
    "((n * (sx1y * sx22 - sx12 * sx2y) - sy * (sx1 * sx22 - sx12 * sx2)"
    f" + sx2 * (sx1 * sx2y - sx1y * sx2)) / {_OLS_DET})"
)
_OLS_B2 = (
    "((n * (sx11 * sx2y - sx12 * sx1y) - sx1 * (sx1 * sx2y - sx1y * sx2)"
    f" + sy * (sx1 * sx12 - sx11 * sx2)) / {_OLS_DET})"
)
_OLS_SSE = f"(syy - {_OLS_B0} * sy - {_OLS_B1} * sx1y - {_OLS_B2} * sx2y)"
_OLS_SST = "(syy - sy * sy / n)"


@query(
    "model_ols_normal_equations",
    # the Gram sums are exact integers (price cents, quantity, discount
    # basis points) accumulated in HUGEINT, then the identical Cramer
    # expression tree runs on both engines -> bit-identical coefficients.
    oracle=f"""
    WITH fp AS (
      SELECT l_returnflag,
             CAST(round(CAST(l_extendedprice AS DOUBLE) * 100.0) AS BIGINT) AS y,
             CAST(l_quantity AS BIGINT) AS x1,
             CAST(round(CAST(l_discount AS DOUBLE) * 100.0) AS BIGINT) AS x2
      FROM lineitem
    ), g AS (
      SELECT l_returnflag,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(x1) AS DOUBLE) AS sx1,
             CAST(sum(x2) AS DOUBLE) AS sx2,
             CAST(sum(x1 * x1) AS DOUBLE) AS sx11,
             CAST(sum(x1 * x2) AS DOUBLE) AS sx12,
             CAST(sum(x2 * x2) AS DOUBLE) AS sx22,
             CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(x1 * y) AS DOUBLE) AS sx1y,
             CAST(sum(x2 * y) AS DOUBLE) AS sx2y,
             CAST(sum(y * y) AS DOUBLE) AS syy,
             count(*) AS n_rows
      FROM fp GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n_rows AS BIGINT) AS n_rows,
           round({_OLS_B0} + sign({_OLS_B0}) * 1e-9, 4) + 0.0 AS intercept_cents,
           round({_OLS_B1} + sign({_OLS_B1}) * 1e-9, 4) + 0.0 AS beta_quantity,
           round({_OLS_B2} + sign({_OLS_B2}) * 1e-9, 4) + 0.0 AS beta_discount_pct,
           round(1.0 - {_OLS_SSE} / {_OLS_SST}, 6) + 0.0 AS r_squared
    FROM g
    """,
    category="ml",
)
def model_ols_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-return-flag multiple linear regression (extended price on
    quantity and discount) solved CLOSED-FORM from the normal equations —
    the sklearn ``LinearRegression`` verb of the reference's model layer
    (reference src/model/train.py:180-200 pipelines) re-expressed as the
    only shape that survives 100 TB: ONE map-side-combined aggregate
    collapses the fact table to a 3x3 Gram matrix + moment vector per
    group (10 integer sums), and Cramer's rule solves the 3-coefficient
    system inside a codegen projection over the |groups|-row frame. No
    gradient iterations, no driver-side fitting, no second pass.

    Exactness: y = price CENTS, x1 = quantity, x2 = discount in whole
    percent — all exact integers, so every Gram sum is an order-free
    integer (decimal(38,0) on Spark, HUGEINT on DuckDB); the solve runs
    the IDENTICAL SQL expression tree on both engines over those exact
    inputs, so b and R^2 are bit-identical before the rounding bridge."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice").cast("double") * 100.0)
        .cast("long")
        .alias("y"),
        F.col("l_quantity").cast("long").alias("x1"),
        F.round(F.col("l_discount").cast("double") * 100.0)
        .cast("long")
        .alias("x2"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731 - exact integer sums
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dec(F.col("x1"))).cast("double").alias("sx1"),
        F.sum(dec(F.col("x2"))).cast("double").alias("sx2"),
        F.sum(dec(F.col("x1") * F.col("x1"))).cast("double").alias("sx11"),
        F.sum(dec(F.col("x1") * F.col("x2"))).cast("double").alias("sx12"),
        F.sum(dec(F.col("x2") * F.col("x2"))).cast("double").alias("sx22"),
        F.sum(dec(F.col("y"))).cast("double").alias("sy"),
        F.sum(dec(F.col("x1") * F.col("y"))).cast("double").alias("sx1y"),
        F.sum(dec(F.col("x2") * F.col("y"))).cast("double").alias("sx2y"),
        F.sum(dec(F.col("y") * F.col("y"))).cast("double").alias("syy"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return g.selectExpr(
        "l_returnflag",
        "CAST(n_rows AS BIGINT) AS n_rows",
        f"round({_OLS_B0} + sign({_OLS_B0}) * 1e-9, 4) + 0.0 AS intercept_cents",
        f"round({_OLS_B1} + sign({_OLS_B1}) * 1e-9, 4) + 0.0 AS beta_quantity",
        f"round({_OLS_B2} + sign({_OLS_B2}) * 1e-9, 4) + 0.0 AS beta_discount_pct",
        f"round(1.0 - {_OLS_SSE} / {_OLS_SST}, 6) + 0.0 AS r_squared",
    )


@query(
    "join_point_in_time_features",
    # both engines order by exact epoch-microseconds (+ event_id row
    # tiebreak for the last-view carry), so frame membership is integer-
    # exact; feature values are raw parquet doubles / integer counts.
    oracle="""
    WITH e AS (
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
               AS last_view_value,
             count(*) OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS n_events_before
      FROM e
    )
    SELECT event_id, user_id, ts AS label_ts, value AS label,
           CAST(coalesce(clicks_7d, 0) AS BIGINT) AS clicks_7d,
           last_view_value,
           CAST(n_events_before AS BIGINT) AS n_events_before
    FROM f WHERE event_type = 'purchase'
    """,
    category="ml",
)
def join_point_in_time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME feature assembly — the feature-store verb that turns
    an event stream into a leakage-free training frame: for every label
    row (purchase), attach features computed ONLY from history strictly
    before the label timestamp (clicks in the trailing 7 days, the last
    view value carried forward, lifetime event count). Doing this with a
    plain join leaks future data (the reference's feature builds recompute
    over the whole frame, `glue.py:183-195`, which is exactly the bug);
    the leakage-guard trailing frames generalize `window_rolling_mean`'s
    (-n,-1) discipline to event time.

    Scale shape: NO label×feature join at all — labels and feature events
    ride the SAME per-user partitioning, features are trailing window
    frames over the union (range frame on exact epoch-µs for the 7-day
    count, strictly-preceding row frame with IGNORE NULLS for the
    carry-forward), and the label filter drops non-label rows after.
    One shuffle on user_id; at 100 TB that is the floor for per-entity
    history, and hot users spill within their partition, never across."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        "value",
        F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("us"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is_click"),
    )
    w_range = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-604800000000, -1)
    )
    w_rows = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    f = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        "value",
        F.sum("is_click").over(w_range).alias("clicks_7d"),
        F.last(
            F.when(F.col("event_type") == "view", F.col("value")),
            ignorenulls=True,
        )
        .over(w_rows)
        .alias("last_view_value"),
        F.count(F.lit(1)).over(w_rows).alias("n_events_before"),
    )
    return f.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("label_ts"),
        F.col("value").alias("label"),
        F.coalesce(F.col("clicks_7d"), F.lit(0)).cast("long").alias("clicks_7d"),
        "last_view_value",
        F.col("n_events_before").cast("long").alias("n_events_before"),
    )
