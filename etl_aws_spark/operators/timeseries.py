"""Per-key time-series operators: EWMA/MACD, seasonal decomposition,
cascading interpolation, stationarity statistics.

These re-express the reference's statsmodels/pandas time-series surface
(`src/data/preprocessing.py:217-351`, `src/model/train.py:250-291`) in
Spark-native form:

- **Pure DataFrame ops wherever the math allows** (seasonal decompose,
  Dickey-Fuller, Ljung-Box) — these stay in whole-stage codegen and scale
  to any number of keys with one shuffle on the key column.
- **Arrow-batched ``applyInPandas``** only for true sequential recurrences
  (EWMA) and data-dependent interpolation, where a window expression cannot
  express the semantics. Groups are per-key series (one ticker's history in
  the reference ≈ one ``user_id`` in fixtures), so group state is bounded by
  series length, not dataset size — the canonical Spark pattern for per-key
  pandas.

Scale note: all operators shuffle **once** on the key column; everything
downstream (windows, folds) reuses that partitioning. No driver-side
collection anywhere.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# EWMA / MACD (reference: preprocessing.py:346-351, ewm(span, adjust=False))
# ---------------------------------------------------------------------------

def ewm_alpha(span: int) -> float:
    """pandas span → smoothing factor α = 2/(span+1)."""
    return 2.0 / (span + 1.0)


def macd(
    df: DataFrame,
    value: str,
    key: str,
    order: Sequence[str],
    fast: int = 12,
    slow: int = 26,
    signal: int = 9,
) -> DataFrame:
    """MACD with `adjust=False` EWMA semantics (`preprocessing.py:346-351`).

    The EWMA here is the recurrence y_t = α·x_t + (1-α)·y_{t-1}, y_1 = x_1 —
    inherently sequential per key, so it runs as a grouped-map
    ``applyInPandas``: one Arrow batch per key, a vectorizable O(n) fold
    inside. The fold is written with explicit float literals (α = 2/(span+1),
    β = (span-1)/(span+1)) so the oracle's identical fold is bit-compatible.

    Output: key, order cols, value, macd, macd_signal.
    """
    order = list(order)
    out_cols = [key, *order, value, "macd", "macd_signal"]
    schema_src = df.select(*[c for c in (key, *order, value)])
    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema_src.schema.fields)
    schema += ", macd double, macd_signal double"

    def _gewm(s, by, span: int):
        # pandas' Cython GroupBy.ewm(adjust=False) runs the identical
        # recurrence y_t = α·x_t + (1-α)·y_{t-1}, restarting at each group
        # boundary — BIT-equal to the explicit β-fold (and the DuckDB
        # list_reduce oracle) only when fl(1-α) == fl(β = (span-1)/(span+1)),
        # which holds for the verified spans 9/12/26 but is not an IEEE
        # identity in general. Check it per span and fall back to the
        # explicit fold when it fails, so callers with other spans keep
        # value-hash parity instead of silently drifting. One divergence
        # either way: ewm SKIPS NaN while the fold (and the oracle's NULL
        # arithmetic) poisons everything after it — mask from each group's
        # first NaN onward (the explicit fold poisons naturally).
        alpha = 2.0 / (span + 1.0)
        beta = (span - 1.0) / (span + 1.0)
        if 1.0 - alpha == beta:
            out = s.groupby(by, sort=False).ewm(span=span, adjust=False).mean().to_numpy()
            isna = s.isna()
            if isna.any():
                out[isna.groupby(by, sort=False).cummax().to_numpy()] = float("nan")
            return out
        import numpy as np

        xs = s.to_numpy(dtype=float)
        starts = ~by.eq(by.shift()).to_numpy()  # True at each group's first row
        out = np.empty(len(xs))
        for i in range(len(xs)):
            out[i] = xs[i] if starts[i] else alpha * xs[i] + beta * out[i - 1]
        return out

    def per_partition(batches):
        import pandas as pd

        # one concat per PARTITION (not per key): Python/Arrow round-trip
        # overhead is per-task, so 10k keys cost 32 calls, not 10k.
        # One key-major sort, then every EWMA runs as a single Cython pass
        # over the whole partition — zero Python-per-group cost.
        pdf = pd.concat(list(batches), ignore_index=True)
        if len(pdf) == 0:
            yield pdf.assign(macd=0.0, macd_signal=0.0)[out_cols].iloc[:0]
            return
        pdf = pdf.sort_values([key, *order], kind="mergesort").reset_index(drop=True)
        x = pdf[value].astype(float)
        by = pdf[key]
        m = _gewm(x, by, fast) - _gewm(x, by, slow)
        pdf["macd"] = m
        pdf["macd_signal"] = _gewm(pd.Series(m), by, signal)
        yield pdf[out_cols]

    return (
        df.select(key, *order, value)
        .repartition(key)  # co-locate each key's series in one task
        .mapInPandas(per_partition, schema=schema)
    )


# ---------------------------------------------------------------------------
# Seasonal decomposition (reference: preprocessing.py:217-269 via statsmodels
# seasonal_decompose(model='additive')) — pure DataFrame re-derivation
# ---------------------------------------------------------------------------

def seasonal_decompose_additive(
    df: DataFrame,
    value: str,
    key: str,
    order: Sequence[str],
    period: int,
) -> DataFrame:
    """Additive decomposition x = trend + seasonal + resid, statsmodels
    semantics (`preprocessing.py:262` calls ``seasonal_decompose(...,
    model='additive', period=p)``) expressed entirely with window/group
    aggregates — no UDF, fully codegen'd, one shuffle on the key:

    - trend: centered moving average of width ``period`` (odd periods),
      null where the window is incomplete (statsmodels' NaN edges);
    - seasonal: per-phase mean of (x - trend), centered by subtracting the
      mean of the phase means;
    - resid: x - trend - seasonal.

    Requires odd ``period`` (the reference uses 5 and 7; even periods use a
    2×p convolution the caller can build from two of these).
    """
    if period % 2 == 0:
        raise ValueError("even periods need the 2xMA variant; reference uses 5/7")
    half = period // 2
    w = Window.partitionBy(key).orderBy(*order)
    frame = w.rowsBetween(-half, half)
    rn = F.row_number().over(w)
    with_trend = (
        df.select(key, *order, value)
        .withColumn("_phase", ((rn - F.lit(1)) % F.lit(period)).cast("int"))
        .withColumn(
            "trend",
            F.when(
                F.count(value).over(frame) == period, F.avg(value).over(frame)
            ),
        )
        .withColumn("_detr", F.col(value) - F.col("trend"))
    )
    phase_means = with_trend.groupBy(key, "_phase").agg(
        F.avg("_detr").alias("_pmean")
    )
    # center: subtract the unweighted mean of the phase means (statsmodels
    # seasonal_mean normalization)
    centered = phase_means.withColumn(
        "seasonal", F.col("_pmean") - F.avg("_pmean").over(Window.partitionBy(key))
    ).select(key, "_phase", "seasonal")
    out = (
        with_trend.join(centered, [key, "_phase"])
        .withColumn("resid", F.col(value) - F.col("trend") - F.col("seasonal"))
        .drop("_phase", "_detr")
    )
    return out


# ---------------------------------------------------------------------------
# Stationarity / randomness statistics (reference: preprocessing.py:273-286,
# metrics_visualizer.py:177-193) — closed-form aggregate re-derivations
# ---------------------------------------------------------------------------

def dickey_fuller_stat(df: DataFrame, value: str, key: str, order: Sequence[str]) -> DataFrame:
    """Dickey-Fuller t-statistic per key (lag-0 ADF, `preprocessing.py:273-286`).

    The DF regression Δx_t = c + γ·x_{t-1} + ε has slope t-statistic
    t = r·√((n-2)/(1-r²)) with r = corr(Δx_t, x_{t-1}) — a pure aggregate,
    no OLS solver needed. (statsmodels' ``adfuller`` additionally auto-selects
    augmentation lags; the reference always prints the base statistic.)
    """
    w = Window.partitionBy(key).orderBy(*order)
    lagged = df.select(
        key,
        F.lag(value, 1).over(w).alias("_xl"),
        (F.col(value) - F.lag(value, 1).over(w)).alias("_dx"),
    ).filter(F.col("_xl").isNotNull())
    r = F.corr("_dx", "_xl")
    n = F.count(F.lit(1))
    return lagged.groupBy(key).agg(
        (r * F.sqrt((n - 2) / (1 - r * r))).alias("adf_stat"),
        n.alias("n_obs"),
    )


def ljung_box_q(df: DataFrame, value: str, key: str, order: Sequence[str], lags: int) -> DataFrame:
    """Ljung-Box Q(h) per key (`metrics_visualizer.py:177-193`).

    Q = n(n+2) Σ_{k=1..h} ρ_k²/(n-k), with ρ_k the biased ACF
    (full-series mean, denominator Σ(x-x̄)²) — exactly statsmodels'
    ``acorr_ljungbox`` estimator, as grouped aggregates over lagged columns.
    """
    w = Window.partitionBy(key).orderBy(*order)
    wk = Window.partitionBy(key)
    cols = [F.col(value).alias("_x"), F.avg(value).over(wk).alias("_m")]
    for k in range(1, lags + 1):
        cols.append(F.lag(value, k).over(w).alias(f"_l{k}"))
    lagged = df.select(key, *cols)
    n = F.count("_x")
    c0 = F.sum(((F.col("_x") - F.col("_m")) * (F.col("_x") - F.col("_m"))))
    q = F.lit(0.0)
    aggs = [n.alias("_n"), c0.alias("_c0")]
    for k in range(1, lags + 1):
        ck = F.sum((F.col("_x") - F.col("_m")) * (F.col(f"_l{k}") - F.col("_m")))
        aggs.append(ck.alias(f"_c{k}"))
    g = lagged.groupBy(key).agg(*aggs)
    for k in range(1, lags + 1):
        rho2 = (F.col(f"_c{k}") / F.col("_c0")) ** 2
        q = q + rho2 / (F.col("_n") - k)
    return g.select(
        key,
        (F.col("_n") * (F.col("_n") + 2) * q).alias("lb_stat"),
        F.col("_n").alias("n_obs"),
    )


def pacf_yule_walker(
    df: DataFrame, value: str, key: str, order: Sequence[str]
) -> DataFrame:
    """Partial autocorrelation at lags 1–3 per key via the Durbin–Levinson
    recursion on the biased Yule–Walker ACF — the data behind the
    reference's PACF order-selection plots (`src/data/visualize.py:133-173`,
    ``plot_pacf``), in fully relational form.

    ACF estimator: ρ_k = Σ(x_t−x̄)(x_{t−k}−x̄) / Σ(x_t−x̄)² with the
    full-series mean (statsmodels ``acf(adjusted=False)``), the same shape
    as :func:`ljung_box_q`. Durbin–Levinson then gives closed forms:
    φ₁₁ = ρ₁, φ₂₂ = (ρ₂−ρ₁²)/(1−ρ₁²), and with φ₂₁ = ρ₁(1−φ₂₂),
    φ₃₃ = (ρ₃−φ₂₁ρ₂−φ₂₂ρ₁)/(1−φ₂₁ρ₁−φ₂₂ρ₂).

    One shuffle on the key (window + aggregate share it); denominators are
    null-guarded (constant series → NULL pacf, not a runtime error under
    ANSI mode).
    """
    w = Window.partitionBy(key).orderBy(*order)
    wk = Window.partitionBy(key)
    lagged = df.select(
        key,
        F.col(value).alias("_x"),
        F.avg(value).over(wk).alias("_m"),
        *[F.lag(value, k).over(w).alias(f"_l{k}") for k in (1, 2, 3)],
    )
    dx = F.col("_x") - F.col("_m")
    g = lagged.groupBy(key).agg(
        F.sum(dx * dx).alias("_c0"),
        *[
            F.sum(dx * (F.col(f"_l{k}") - F.col("_m"))).alias(f"_c{k}")
            for k in (1, 2, 3)
        ],
    )
    c0 = F.nullif(F.col("_c0"), F.lit(0.0))
    r1, r2, r3 = (F.col(f"_c{k}") / c0 for k in (1, 2, 3))
    p1 = r1
    p2 = (r2 - r1 * r1) / F.nullif(F.lit(1.0) - r1 * r1, F.lit(0.0))
    a21 = r1 * (F.lit(1.0) - p2)
    p3 = (r3 - a21 * r2 - p2 * r1) / F.nullif(
        F.lit(1.0) - a21 * r1 - p2 * r2, F.lit(0.0)
    )
    return g.select(
        key,
        p1.alias("pacf_1"),
        p2.alias("pacf_2"),
        p3.alias("pacf_3"),
    )


# ---------------------------------------------------------------------------
# Cascading interpolation (reference: preprocessing.py:61-180)
# ---------------------------------------------------------------------------

def interpolate_cascade(
    df: DataFrame,
    value: str,
    ticker: str,
    sector: str,
    industry: str,
    order: Sequence[str],
) -> DataFrame:
    """Cascading null repair: ffill per ticker → quadratic interpolation at
    industry / sector / global granularity (gated by distinct-ticker counts)
    → ffill/bfill → global-mean fallback (`preprocessing.py:61-180`).

    The gating counts are plain grouped aggregates (one ``GROUPING
    SETS``-style pass instead of the reference's three separate
    groupby+merge rounds). The interpolation itself is data-dependent and
    sequential, so it runs per interpolation-group via ``applyInPandas``.
    pandas' ``interpolate(method='polynomial')`` needs scipy (absent here);
    the quadratic fit through the three nearest known points is implemented
    directly in numpy with identical interior semantics.

    Output schema = input schema with ``value`` repaired (no added columns).
    """
    import numpy as np  # noqa: F401  (used inside the UDF)

    order = list(order)
    # Both gating counts in ONE grouping-sets pass (SURVEY §4's fusion):
    # the (sector, industry) set counts distinct tickers per industry, the
    # (sector) set counts distinct industries per sector. Round 2 derived
    # them from a shared distinct() via two chained groupBys, but the ci⋈cs
    # dim join pushed asymmetric isnotnull filters into the two chains, so
    # Catalyst never reused the exchange and the fact was scanned four
    # times (plan audit: 10 exchanges / 5 joins). One aggregate + one tiny
    # window replaces distinct + 2 groupBys + 1 join.
    #
    # NULL keys (advisor finding): pandas groupby/merge drops NaN keys, so
    # in the reference a NULL-industry row is never industry-interpolated
    # but still qualifies for its sector's group. The industry join key is
    # therefore coalesced to a sentinel (joinable either side), the
    # sentinel bucket's ticker count is masked to NULL (it must never gate
    # industry-level interpolation), and the sector-level count uses
    # countDistinct over the RAW industry column, which skips NULLs.
    sent = "\x00"
    _ind_key = F.coalesce(F.col(industry), F.lit(sent))
    g = (
        df.select(
            F.col(sector).alias("_sec"),
            _ind_key.alias("_ind"),
            F.col(industry).alias("_ind_raw"),
            F.col(ticker).alias("_tic"),
        )
        .filter(F.col("_sec").isNotNull())
        .groupingSets([["_sec", "_ind"], ["_sec"]], F.col("_sec"), F.col("_ind"))
        .agg(
            F.countDistinct("_tic").alias("_ntic"),
            F.countDistinct("_ind_raw").alias("_nind"),
            F.grouping_id().alias("_gid"),
        )
    )
    wsec = Window.partitionBy("_sec")
    dim = (
        g.withColumn(
            "_n_ind_sec",
            F.max(F.when(F.col("_gid") != 0, F.col("_nind"))).over(wsec),
        )
        .filter(F.col("_gid") == 0)
        .select(
            "_sec",
            "_ind",
            F.when(F.col("_ind") == sent, F.lit(None))
            .otherwise(F.col("_ntic"))
            .alias("_n_tic_ind"),
            "_n_ind_sec",
        )
    )
    base = df.join(
        F.broadcast(dim),
        (F.col(sector) == F.col("_sec")) & (_ind_key == F.col("_ind")),
        "left",
    ).drop("_sec", "_ind")

    # Choose the interpolation group per row (industry > sector > global).
    # A ticker maps to exactly ONE (sector, industry) pair and therefore to
    # exactly one group, so every per-ticker step (initial ffill, the
    # interpolation, the final ffill/bfill) runs INSIDE the grouped-map —
    # one shuffle instead of four window exchanges (the plan audit caught
    # the 14-exchange formulation).
    grp = (
        F.when(F.col("_n_tic_ind") > 1, F.concat_ws("", F.lit("I"), sector, industry))
        .when(F.col("_n_ind_sec") > 1, F.concat_ws("", F.lit("S"), sector))
        .otherwise(F.lit("G"))
    )
    tagged = base.withColumn("_igrp", grp)

    out_fields = [f for f in df.schema.fields]
    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in out_fields)
    out_cols = [f.name for f in out_fields]

    def interp(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        # step 1: per-ticker ffill (the reference's first pass)
        pdf[value] = pdf.groupby(ticker, sort=False)[value].ffill()
        x = pdf[value].to_numpy(dtype=float)
        isna = np.isnan(x)
        if isna.any() and (~isna).sum() >= 3:
            known = np.flatnonzero(~isna)
            for i in np.flatnonzero(isna):
                lo = np.searchsorted(known, i)
                # three nearest known indices (interior quadratic; edges left
                # to the ffill/bfill pass, matching pandas limit_direction
                # defaults for interpolate)
                if lo == 0 or lo == len(known):
                    continue
                cand = known[max(0, lo - 2): lo + 2]
                if len(cand) < 3:
                    cand = known[:3] if lo <= 1 else known[-3:]
                sel = sorted(sorted(cand, key=lambda j: (abs(j - i), j))[:3])
                # closed-form Lagrange quadratic through the 3 points —
                # an explicit IEEE expression (not np.polyfit's SVD
                # least-squares) so the SQL oracle can replay the exact
                # same arithmetic bit-for-bit; term order mirrored in the
                # interp_polynomial_cascade oracle.
                j0, j1, j2 = sel
                t = float(i - j0)
                d1, d2 = float(j1 - j0), float(j2 - j0)
                y0, y1, y2 = float(x[j0]), float(x[j1]), float(x[j2])
                l0 = ((t - d1) * (t - d2)) / ((0.0 - d1) * (0.0 - d2))
                l1 = ((t - 0.0) * (t - d2)) / ((d1 - 0.0) * (d1 - d2))
                l2 = ((t - 0.0) * (t - d1)) / ((d2 - 0.0) * (d2 - d1))
                x[i] = y0 * l0 + y1 * l1 + y2 * l2
        pdf[value] = x
        # step 3: final per-ticker edge repair
        pdf[value] = pdf.groupby(ticker, sort=False)[value].ffill()
        pdf[value] = pdf.groupby(ticker, sort=False)[value].bfill()
        return pdf[out_cols]

    interped = tagged.groupBy("_igrp").applyInPandas(interp, schema=schema)

    # Global-mean fallback via a broadcast cross join of a 1-row aggregate —
    # never an unpartitioned window (which would funnel all rows through one
    # task at scale). The mean is taken over the OBSERVED (non-null) values,
    # not the repaired frame: aggregating the grouped-map output would
    # reference it twice, and without a persist/checkpoint barrier Catalyst
    # inlines the Arrow stage into both consumers and runs it twice per
    # action (the single worst cost in the round-2 plan — 10 exchanges).
    # The fallback constant only ever fills series with zero observations
    # in their group, where pandas' post-repair mean and the observed mean
    # differ by at most the interpolation's local smoothing.
    gmean = df.agg(F.avg(value).alias("_gmean"))
    repaired = interped.crossJoin(F.broadcast(gmean)).withColumn(
        value, F.coalesce(F.col(value), F.col("_gmean"))
    )
    return repaired.select(*out_cols)