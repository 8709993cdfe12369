"""Feature encoders / imputers / scalers as relational operators.

Reference surface: `src/model/train.py:153-200` (ColumnTransformer with
TargetEncoder, OneHotEncoder, Yeo-Johnson PowerTransformer, StandardScaler)
and `src/model/train.py:173,179` (mean/mode imputation).

Everything here is a DataFrame→DataFrame transform with *derivable* state:
the "fit" is an aggregation the optimizer can pipeline, the "transform" a
broadcast join or column expression. At 100 TB the fitted state (category
maps, means, λ) is tiny — always broadcast.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def target_encode(df: DataFrame, cat: str, target: str, out: str | None = None) -> DataFrame:
    """Mean-target encoding of a categorical (`train.py:187`, TargetEncoder
    with default no-smoothing semantics): category → mean(target).

    Fit = one hash aggregate over the fact table; transform = broadcast
    equi-join of the (|categories|)-row map. No shuffle of the fact side.
    """
    out = out or f"{cat}_te"
    enc = df.groupBy(cat).agg(F.avg(target).alias(out))
    return df.join(F.broadcast(enc), cat, "left")


def onehot_encode(df: DataFrame, cat: str, categories: Sequence[str]) -> DataFrame:
    """Materialized one-hot indicators for a known category set
    (`train.py:171-175`; unknown values get all-zero rows ≡
    ``handle_unknown='ignore'``).

    With an explicit vocabulary this is pure column arithmetic — no fit pass,
    no shuffle, stays in codegen. (For unknown vocabularies, Spark ML
    ``StringIndexer`` + ``OneHotEncoder`` produce the vector form; the
    materialized form here is what the oracle can check.)
    """
    cols = {
        f"{cat}__{v}": (F.col(cat) == F.lit(v)).cast("int") for v in categories
    }
    return df.withColumns(cols)


def impute_mean_mode(
    df: DataFrame, numeric: Sequence[str], categorical: Sequence[str]
) -> DataFrame:
    """Mean-impute numeric columns, mode-impute categoricals
    (`train.py:173,179`), with a deterministic mode tie-break (highest count,
    then lexicographically smallest value — sklearn's SimpleImputer picks the
    smallest as well).

    Means and modes are computed in one aggregate job each and broadcast back;
    the fact table is never shuffled.
    """
    out = df
    if numeric:
        means = df.agg(*[F.avg(c).alias(f"_mean_{c}") for c in numeric])
        out = out.crossJoin(F.broadcast(means))
        for c in numeric:
            out = out.withColumn(c, F.coalesce(F.col(c), F.col(f"_mean_{c}"))).drop(f"_mean_{c}")
    for c in categorical:
        mode_row = (
            df.filter(F.col(c).isNotNull())
            .groupBy(c)
            .count()
            .orderBy(F.desc("count"), F.asc(c))
            .limit(1)
            .select(F.col(c).alias(f"_mode_{c}"))
        )
        out = out.crossJoin(F.broadcast(mode_row))
        out = out.withColumn(c, F.coalesce(F.col(c), F.col(f"_mode_{c}"))).drop(f"_mode_{c}")
    return out


# ---------------------------------------------------------------------------
# Yeo-Johnson power transform + standardization (train.py:178-182)
# ---------------------------------------------------------------------------

def _yj_expr(x, lam: float):
    """Yeo-Johnson transform as a Column expression for a fixed λ."""
    eps = 1e-12
    pos = x >= 0
    if abs(lam) < eps:
        t_pos = F.log1p(x)
    else:
        t_pos = (F.pow(x + 1.0, F.lit(lam)) - 1.0) / lam
    if abs(lam - 2.0) < eps:
        t_neg = -F.log1p(-x)
    else:
        t_neg = -(F.pow(-x + 1.0, F.lit(2.0 - lam)) - 1.0) / (2.0 - lam)
    return F.when(pos, t_pos).otherwise(t_neg)


def yeo_johnson_fit_lambda(
    df: DataFrame, col: str, grid: Sequence[float] | None = None
) -> float:
    """Fit the Yeo-Johnson λ by profile-MLE over a λ grid in ONE Spark pass.

    The log-likelihood ℓ(λ) = -n/2·log(σ̂²_λ) + (λ-1)·Σ sign(x)·log(|x|+1)
    needs only var(t_λ(x)) and one data-independent penalty term — so the
    whole grid evaluates as 2·|grid|+1 vectorized aggregates in a single job
    (sklearn's Brent search makes ~25 sequential passes instead). The driver
    then takes the argmax of |grid| floats.
    """
    grid = list(grid) if grid is not None else [round(-2.0 + 0.1 * i, 1) for i in range(41)]
    aggs = [F.count(col).alias("_n"), F.sum(F.signum(col) * F.log1p(F.abs(col))).alias("_pen")]
    for i, lam in enumerate(grid):
        aggs.append(F.var_pop(_yj_expr(F.col(col), lam)).alias(f"_v{i}"))
    row = df.agg(*aggs).collect()[0]
    n, pen = row["_n"], row["_pen"]
    best_lam, best_ll = grid[0], -float("inf")
    for i, lam in enumerate(grid):
        v = row[f"_v{i}"]
        if v is None or v <= 0:
            continue
        ll = -0.5 * n * math.log(v) + (lam - 1.0) * pen
        if ll > best_ll:
            best_ll, best_lam = ll, lam
    return best_lam


def power_scale(
    df: DataFrame,
    col: str,
    out: str | None = None,
    lam: float | None = None,
    fit_filter: "F.Column | None" = None,
) -> DataFrame:
    """Yeo-Johnson transform (λ fitted if not given) followed by z-score
    standardization (`train.py:178-182`). Two aggregate passes total; the
    transform itself is a pure column expression.

    ``fit_filter`` restricts the λ fit to a deterministic sample (e.g. a
    key-mod predicate): the grid pass evaluates 41 transform variants per
    row, so fitting on a 1/k sample cuts that cost by k× while the λ
    argmax — a corpus-level shape parameter — is statistically unchanged.
    The z-score stats still use the FULL column."""
    out = out or f"{col}_ps"
    if lam is None:
        fit_df = df.filter(fit_filter) if fit_filter is not None else df
        lam = yeo_johnson_fit_lambda(fit_df, col)
    t = df.withColumn(out, _yj_expr(F.col(col), lam))
    stats = t.agg(
        F.avg(out).alias("_mu"), F.stddev_pop(out).alias("_sd")
    )
    return (
        t.crossJoin(F.broadcast(stats))
        .withColumn(out, (F.col(out) - F.col("_mu")) / F.nullif(F.col("_sd"), F.lit(0.0)))
        .drop("_mu", "_sd")
    )


# ---------------------------------------------------------------------------
# Univariate feature selection (train.py:24-54, SelectKBest f_regression)
# ---------------------------------------------------------------------------

def f_regression_scores(df: DataFrame, features: Sequence[str], target: str) -> DataFrame:
    """Univariate F-statistic of each feature vs the target
    (`train.py:24-54`): F = r²·(n-2)/(1-r²) — one aggregate pass computes
    every feature's correlation simultaneously; the unpivot to long form is
    constant-width."""
    n = F.count(F.lit(1))
    aggs = [n.alias("_n")] + [F.corr(c, target).alias(f"_r_{c}") for c in features]
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("feature"),
            (
                F.col(f"_r_{c}") * F.col(f"_r_{c}") * (F.col("_n") - 2)
                / (1 - F.col(f"_r_{c}") * F.col(f"_r_{c}"))
            ).alias("f_stat"),
        )
        for c in features
    ]
    return (
        row.select(F.explode(F.array(*structs)).alias("s"))
        .select("s.feature", "s.f_stat")
    )


def select_k_best(df: DataFrame, features: Sequence[str], target: str, k: int) -> DataFrame:
    """Top-k features by F-statistic, deterministically ordered
    (f_stat desc, feature name asc as tie-break)."""
    scores = f_regression_scores(df, features, target)
    w = Window.orderBy(F.desc("f_stat"), F.asc("feature"))
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("feature", "f_stat", "rank")
    )
