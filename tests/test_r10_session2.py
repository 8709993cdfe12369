"""Engine-free pins for the r10 session-2 operators: the shared
Spark/DuckDB formulations (Cramer OLS solve, histogram signed-rank,
integer-numerator EMD) are validated against independent plain-Python /
numpy references through DuckDB alone — no SparkSession needed."""

from __future__ import annotations

import math
from fractions import Fraction

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


# ---------------------------------------------------------------- OLS
@settings(max_examples=25, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=50),      # x1
            st.integers(min_value=0, max_value=10),      # x2
            st.integers(min_value=100, max_value=10_000_000),  # y
        ),
        min_size=8,
        max_size=60,
    )
)
def test_ols_cramer_solve_matches_numpy_lstsq(rows):
    """The shared 3x3 Cramer expression used by model_ols_normal_equations
    must agree with numpy's least-squares solve on the same exact integer
    Gram sums (to solver tolerance)."""
    x1 = np.array([r[0] for r in rows], dtype=float)
    x2 = np.array([r[1] for r in rows], dtype=float)
    y = np.array([r[2] for r in rows], dtype=float)
    X = np.column_stack([np.ones_like(x1), x1, x2])
    # skip degenerate designs (constant x1 or x2, or collinear)
    if np.linalg.matrix_rank(X) < 3:
        return
    beta_np, *_ = np.linalg.lstsq(X, y, rcond=None)

    n = len(rows)
    s = {
        "n": float(n),
        "sx1": x1.sum(),
        "sx2": x2.sum(),
        "sx11": (x1 * x1).sum(),
        "sx12": (x1 * x2).sum(),
        "sx22": (x2 * x2).sum(),
        "sy": y.sum(),
        "sx1y": (x1 * y).sum(),
        "sx2y": (x2 * y).sum(),
        "syy": (y * y).sum(),
    }
    cols = ", ".join(f"CAST({v!r} AS DOUBLE) AS {k}" for k, v in s.items())
    from etl_aws_spark.suite.q_ml import _OLS_B0, _OLS_B1, _OLS_B2, _OLS_DET

    row = (
        duckdb.connect()
        .execute(
            f"SELECT {_OLS_DET} AS det, {_OLS_B0} AS b0, {_OLS_B1} AS b1,"
            f" {_OLS_B2} AS b2 FROM (SELECT {cols})"
        )
        .fetchone()
    )
    det, b0, b1, b2 = row
    if abs(det) < 1e-6 * max(1.0, s["sx11"] * s["sx22"]):
        return  # numerically near-singular: lstsq regularizes, Cramer can't
    assert math.isclose(b0, beta_np[0], rel_tol=1e-6, abs_tol=1e-6)
    assert math.isclose(b1, beta_np[1], rel_tol=1e-6, abs_tol=1e-6)
    assert math.isclose(b2, beta_np[2], rel_tol=1e-6, abs_tol=1e-6)


# --------------------------------------------- Wilcoxon signed-rank
def _wilcoxon_python(diffs):
    """Textbook average-rank signed-rank statistic — ranks assigned
    per-pair, not via the histogram."""
    d = [x for x in diffs if x != 0]
    srt = sorted(d, key=abs)
    n = len(srt)
    ranks = {}
    i = 0
    while i < n:
        j = i
        while j < n and abs(srt[j]) == abs(srt[i]):
            j += 1
        avg = (i + 1 + j) / 2.0  # mean of ranks i+1..j
        ranks.setdefault(abs(srt[i]), avg)
        i = j
    w_plus = sum(ranks[abs(x)] for x in d if x > 0)
    ties = 0
    from collections import Counter

    for t in Counter(abs(x) for x in d).values():
        ties += t * t * t - t
    mu = n * (n + 1) / 4.0
    sd = math.sqrt(n * (n + 1) * (2 * n + 1) / 24.0 - ties / 48.0)
    return n, w_plus, (w_plus - mu) / sd if sd > 0 else float("nan")


@settings(max_examples=25, deadline=None)
@given(
    diffs=st.lists(
        st.integers(min_value=-50, max_value=50).filter(lambda x: x != 0),
        min_size=5,
        max_size=80,
    )
)
def test_signed_rank_histogram_formulation_matches_textbook(diffs):
    """The histogram W+ = sum n_pos(v) * (cum_lt + (t+1)/2) used by
    stat_wilcoxon_signed_rank must equal per-pair average ranking."""
    vals = ", ".join(f"({d}, {abs(d)})" for d in diffs)
    sql = f"""
    WITH d AS (SELECT * FROM (VALUES {vals}) t(diff, ad)),
    h AS (
      SELECT ad, sum(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS np_v,
             count(*) AS t_v
      FROM d GROUP BY ad
    ), c AS (
      SELECT ad, np_v, t_v,
             coalesce(sum(t_v) OVER (ORDER BY ad
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_lt
      FROM h
    )
    SELECT sum(np_v * (cum_lt + (t_v + 1.0) / 2.0)) FROM c
    """
    w_duck = duckdb.connect().execute(sql).fetchone()[0]
    n, w_py, _z = _wilcoxon_python(diffs)
    assert math.isclose(w_duck, w_py, rel_tol=0, abs_tol=1e-9)


# ------------------------------------------------- t-closeness EMD
@settings(max_examples=25, deadline=None)
@given(
    class_counts=st.lists(
        st.integers(min_value=0, max_value=20), min_size=2, max_size=12
    ).filter(lambda c: sum(c) > 0),
    extra=st.lists(
        st.integers(min_value=0, max_value=20), min_size=2, max_size=12
    ),
)
def test_t_closeness_integer_emd_equals_rational_definition(class_counts, extra):
    """quality_t_closeness computes EMD as
    sum |cum_c*total - cum_g*size| / (size*total*(m-1)). That must equal
    the textbook ordered-EMD sum |cumP_class - cumP_global| / (m-1),
    verified in exact rational arithmetic."""
    m = len(class_counts)
    glob = [c + (extra[i] if i < len(extra) else 0) for i, c in enumerate(class_counts)]
    if sum(glob) == 0 or m < 2:
        return
    size, total = sum(class_counts), sum(glob)
    # rational reference
    emd_ref = Fraction(0)
    cc = cg = 0
    for i in range(m):
        cc += class_counts[i]
        cg += glob[i]
        emd_ref += abs(Fraction(cc, size) - Fraction(cg, total))
    emd_ref /= m - 1
    # integer-numerator formulation
    num = 0
    cc = cg = 0
    for i in range(m):
        cc += class_counts[i]
        cg += glob[i]
        num += abs(cc * total - cg * size)
    emd_int = Fraction(num, size * total * (m - 1))
    assert emd_int == emd_ref
