"""Pin timeseries operators to reference (pandas/statsmodels) semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from etl_aws_spark.operators import timeseries as ts


@pytest.fixture(scope="module")
def series_df(spark):
    rng = np.random.RandomState(7)
    rows = []
    for key in (1, 2, 3):
        for i in range(40):
            rows.append((key, i, float(100 + rng.randn() * 5)))
    return spark.createDataFrame(rows, "k long, t long, x double")


def test_macd_matches_pandas_ewm(spark, series_df):
    got = (
        ts.macd(series_df, "x", key="k", order=["t"])
        .orderBy("k", "t")
        .toPandas()
    )
    for key, grp in got.groupby("k"):
        s = grp.sort_values("t")["x"]
        e12 = s.ewm(span=12, adjust=False).mean()
        e26 = s.ewm(span=26, adjust=False).mean()
        macd = e12 - e26
        signal = macd.ewm(span=9, adjust=False).mean()
        np.testing.assert_allclose(grp["macd"].to_numpy(), macd.to_numpy(), rtol=1e-12)
        np.testing.assert_allclose(grp["macd_signal"].to_numpy(), signal.to_numpy(), rtol=1e-12)


def test_macd_ewm_bit_equals_oracle_fold(spark, series_df):
    """The DuckDB oracle is the explicit left fold y_t = a·x_t + b·y_{t-1}
    with a = 2/(span+1), b = (span-1)/(span+1). The vectorized pandas-ewm
    path must stay BIT-equal to it (not just allclose) or the value-hash
    gate breaks."""

    def fold(xs, a, b):
        acc, out = None, []
        for x in xs:
            acc = x if acc is None else a * x + b * acc
            out.append(acc)
        return np.array(out)

    got = ts.macd(series_df, "x", key="k", order=["t"]).orderBy("k", "t").toPandas()
    for _, grp in got.groupby("k"):
        xs = grp.sort_values("t")["x"].to_numpy()
        m = fold(xs, 2.0 / 13.0, 11.0 / 13.0) - fold(xs, 2.0 / 27.0, 25.0 / 27.0)
        sig = fold(m, 2.0 / 10.0, 8.0 / 10.0)
        assert np.array_equal(grp["macd"].to_numpy(), m)
        assert np.array_equal(grp["macd_signal"].to_numpy(), sig)


def test_macd_nan_propagates_like_fold(spark):
    """ewm skips NaN; the fold (and the oracle's NULL arithmetic) poisons
    everything after the first NaN — the mask must preserve that."""
    rows = [(1, 0, 1.0), (1, 1, 2.0), (1, 2, None), (1, 3, 4.0)]
    df = spark.createDataFrame(rows, "k long, t long, x double")
    got = ts.macd(df, "x", key="k", order=["t"]).orderBy("t").toPandas()
    assert got["macd"].notna().tolist() == [True, True, False, False]
    assert got["macd_signal"].notna().tolist() == [True, True, False, False]


def test_seasonal_decompose_reconstructs(spark, series_df):
    out = (
        ts.seasonal_decompose_additive(series_df, "x", key="k", order=["t"], period=5)
        .orderBy("k", "t")
        .toPandas()
    )
    # edges: trend null for first/last half-window rows only
    for _, grp in out.groupby("k"):
        trend = grp["trend"].to_numpy()
        assert np.isnan(trend[:2]).all() and np.isnan(trend[-2:]).all()
        assert not np.isnan(trend[2:-2]).any()
    # additivity where trend defined
    core = out.dropna(subset=["trend"])
    np.testing.assert_allclose(
        core["x"], core["trend"] + core["seasonal"] + core["resid"], rtol=1e-9
    )
    # per-key seasonal components are centered (sum of the 5 phase values ≈ 0)
    for _, grp in out.groupby("k"):
        phases = grp.drop_duplicates(subset=["seasonal"])["seasonal"]
        assert abs(phases.sum()) < 1e-8


def test_dickey_fuller_closed_form(spark, series_df):
    out = ts.dickey_fuller_stat(series_df, "x", key="k", order=["t"]).toPandas()
    pdf = series_df.toPandas()
    for _, row in out.iterrows():
        s = pdf[pdf.k == row.k].sort_values("t")["x"].to_numpy()
        dx, xl = np.diff(s), s[:-1]
        # OLS t-stat of slope in dx = c + g*xl via lstsq, compared to the
        # corr-based closed form the operator uses
        X = np.column_stack([np.ones_like(xl), xl])
        beta, res, *_ = np.linalg.lstsq(X, dx, rcond=None)
        resid = dx - X @ beta
        s2 = (resid**2).sum() / (len(dx) - 2)
        se = np.sqrt(s2 * np.linalg.inv(X.T @ X)[1, 1])
        np.testing.assert_allclose(row.adf_stat, beta[1] / se, rtol=1e-9)


def test_ljung_box_formula(spark, series_df):
    out = ts.ljung_box_q(series_df, "x", key="k", order=["t"], lags=3).toPandas()
    pdf = series_df.toPandas()
    for _, row in out.iterrows():
        s = pdf[pdf.k == row.k].sort_values("t")["x"].to_numpy()
        n, m = len(s), s.mean()
        c0 = ((s - m) ** 2).sum()
        q = 0.0
        for k in (1, 2, 3):
            rk = ((s[k:] - m) * (s[:-k] - m)).sum() / c0
            q += rk * rk / (n - k)
        q *= n * (n + 2)
        np.testing.assert_allclose(row.lb_stat, q, rtol=1e-9)


def test_interpolate_cascade_repairs_all_nulls(spark):
    rng = np.random.RandomState(3)
    rows = []
    for key in range(8):
        sector = f"s{key % 2}"
        industry = f"i{key % 3}" if key > 0 else "solo"
        for i in range(30):
            v = None if (i % 6 == 2) else float(50 + rng.randn())
            rows.append((key, sector, industry, i, v))
    df = spark.createDataFrame(rows, "tic long, sec string, ind string, t long, x double")
    out = ts.interpolate_cascade(
        df, "x", ticker="tic", sector="sec", industry="ind", order=["t"]
    )
    pdf = out.toPandas()
    assert len(pdf) == len(rows)
    assert pdf["x"].notna().all()
    # idempotence: repairing a null-free frame is the identity
    again = ts.interpolate_cascade(
        out, "x", ticker="tic", sector="sec", industry="ind", order=["t"]
    ).toPandas()
    merged = pdf.merge(again, on=["tic", "t"], suffixes=("_a", "_b"))
    np.testing.assert_allclose(merged["x_a"], merged["x_b"], rtol=1e-12)

def test_interpolate_cascade_null_industry_uses_sector(spark):
    # Advisor finding (round 2): a NULL-industry row must still qualify for
    # SECTOR-level interpolation (pandas drops NaN groupby keys, so the
    # reference never industry-interpolates it, but its sector-only merge
    # still attaches the sector gate). Ticker 9's industry is NULL inside a
    # multi-industry sector: its interior null must be repaired by the
    # sector group's quadratic, not demoted to the global-mean constant.
    rows = []
    for tic, ind in ((1, "ia"), (2, "ib"), (9, None)):
        for i in range(12):
            v = None if (tic == 9 and i == 6) else float(10 * tic + i)
            rows.append((tic, "s0", ind, i, v))
    df = spark.createDataFrame(rows, "tic long, sec string, ind string, t long, x double")
    out = ts.interpolate_cascade(
        df, "x", ticker="tic", sector="sec", industry="ind", order=["t"]
    ).toPandas()
    assert out["x"].notna().all()
    got = out[(out.tic == 9) & (out.t == 6)]["x"].iloc[0]
    # ticker 9's own series is linear (90 + t): ffill inside the sector
    # group carries 95.0; the global mean of observed values would be far
    # from that. Sector-level repair keeps the value near the local series.
    assert abs(got - 95.0) < 3.0
    # and the NULL-industry bucket itself must never gate industry-level
    # interpolation: with TWO null-industry tickers in an otherwise
    # single-ticker-per-industry sector, each still repairs via sector.
    rows2 = []
    for tic, ind in ((1, "ia"), (8, None), (9, None)):
        for i in range(12):
            v = None if (tic in (8, 9) and i == 6) else float(10 * tic + i)
            rows2.append((tic, "s0", ind, i, v))
    df2 = spark.createDataFrame(rows2, "tic long, sec string, ind string, t long, x double")
    out2 = ts.interpolate_cascade(
        df2, "x", ticker="tic", sector="sec", industry="ind", order=["t"]
    ).toPandas()
    assert out2["x"].notna().all()

def test_pacf_matches_numpy_durbin_levinson(spark, series_df):
    out = ts.pacf_yule_walker(series_df, "x", key="k", order=["t"]).toPandas()
    pdf = series_df.toPandas()
    for _, row in out.iterrows():
        s = pdf[pdf.k == row.k].sort_values("t")["x"].to_numpy()
        m = s.mean()
        c0 = ((s - m) ** 2).sum()
        rho = [((s[k:] - m) * (s[:-k] - m)).sum() / c0 for k in (1, 2, 3)]
        # Durbin-Levinson reference implementation
        phi = np.zeros((4, 4))
        phi[1, 1] = rho[0]
        for j in (2, 3):
            num = rho[j - 1] - sum(phi[j - 1, i] * rho[j - i - 1] for i in range(1, j))
            den = 1.0 - sum(phi[j - 1, i] * rho[i - 1] for i in range(1, j))
            phi[j, j] = num / den
            for i in range(1, j):
                phi[j, i] = phi[j - 1, i] - phi[j, j] * phi[j - 1, j - i]
        np.testing.assert_allclose(
            [row.pacf_1, row.pacf_2, row.pacf_3],
            [phi[1, 1], phi[2, 2], phi[3, 3]],
            rtol=1e-9,
        )


def test_pacf_ar1_signature(spark):
    # AR(1) with phi=0.7: pacf_1 ~ 0.7, pacf_2 and pacf_3 ~ 0 (the PACF
    # cutoff property that makes the plot useful for order selection).
    rng = np.random.RandomState(17)
    y = np.zeros(800)
    for t in range(1, 800):
        y[t] = 0.7 * y[t - 1] + rng.randn()
    df = spark.createDataFrame(
        [(1, i, float(v)) for i, v in enumerate(y)], "k long, t long, x double"
    )
    out = ts.pacf_yule_walker(df, "x", key="k", order=["t"]).toPandas().iloc[0]
    assert abs(out.pacf_1 - 0.7) < 0.08
    assert abs(out.pacf_2) < 0.08
    assert abs(out.pacf_3) < 0.08
