"""Engine-free pins for the r9 session-2 operators: the shared
Spark/DuckDB formulations are validated against plain-Python references
through DuckDB alone (fast — no SparkSession), the same
oracle-vs-independent-reference discipline as test_properties.py's PQ
pin."""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def _hw_python(vals, m=7, a=0.5, b=0.25, g=0.25):
    """Plain-Python Holt-Winters additive with the rotating seasonal
    queue — independent of both engines' HOF folds."""
    l0 = sum(vals[:m]) / float(m)
    level, trend = l0, 0.0
    seas = [v - l0 for v in vals[:m]]
    for x in vals[m:]:
        sold = seas.pop(0)
        newl = a * (x - sold) + (1.0 - a) * (level + trend)
        trend = b * (newl - level) + (1.0 - b) * trend
        seas.append(g * (x - newl) + (1.0 - g) * sold)
        level = newl
    return level, trend, seas


@settings(max_examples=30, deadline=None)
@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=10_000_000),
        min_size=14,
        max_size=40,
    )
)
def test_holt_winters_duck_fold_matches_python(vals):
    """The DuckDB list_reduce formulation used by
    window_holt_winters_additive must equal an independently written
    Python recurrence bit-for-bit (same IEEE chain)."""
    m = 7
    vv = "[" + ", ".join(f"CAST({v} AS DOUBLE)" for v in vals) + "]"
    sql = f"""
    WITH i AS (
      SELECT {vv} AS vv,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               ({vv})[1:{m}]), (acc, v) -> acc + v) / {float(m)} AS l0
    )
    SELECT list_reduce(
             list_prepend(
               list_concat([l0, CAST(0.0 AS DOUBLE)],
                           list_transform(vv[1:{m}], v -> v - l0)),
               list_transform(vv[{m + 1}:],
                 v -> [v, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])),
             (acc, x) -> list_concat(
               list_concat(
                 [0.5 * (x[1] - acc[3]) + 0.5 * (acc[1] + acc[2]),
                  0.25 * ((0.5 * (x[1] - acc[3]) + 0.5 * (acc[1] + acc[2]))
                          - acc[1]) + 0.75 * acc[2]],
                 acc[4:{m + 2}]),
               [0.25 * (x[1] - (0.5 * (x[1] - acc[3])
                        + 0.5 * (acc[1] + acc[2]))) + 0.75 * acc[3]])
           ) AS st
    FROM i
    """
    st_row = duckdb.connect().execute(sql).fetchone()[0]
    level, trend, seas = _hw_python([float(v) for v in vals], m)
    assert st_row[0] == level
    assert st_row[1] == trend
    assert list(st_row[2:]) == seas


def _otsu_python(hist):
    n = sum(hist)
    total = sum(t * c for t, c in enumerate(hist))
    best_t, best_score = 0, -1
    w0 = s0 = 0
    for t, c in enumerate(hist):
        w0 += c
        s0 += t * c
        w1 = n - w0
        if w0 == 0 or w1 == 0:
            continue
        d = s0 * w1 - (total - s0) * w0
        score = (d * d * 1000000) // (w0 * w1)
        if score > best_score:
            best_t, best_score = t, score
    return best_t


@settings(max_examples=30, deadline=None)
@given(
    hist=st.lists(
        st.integers(min_value=0, max_value=50), min_size=8, max_size=32
    ).filter(lambda h: sum(1 for c in h if c > 0) >= 2)
)
def test_otsu_quantized_argmax_duck_matches_python(hist):
    """The HUGEINT occupied-bin scan of the Otsu oracle equals the
    decoder's full 0..255-style integer scan (plateaus start at occupied
    bins, quantized score, lower-t ties)."""
    rows = ", ".join(f"({t}, {c})" for t, c in enumerate(hist) if c > 0)
    sql = f"""
    WITH hist AS (SELECT * FROM (VALUES {rows}) h(v, c)),
    cum AS (
      SELECT v, c,
             sum(c) OVER (ORDER BY v) AS w0,
             sum(v * c) OVER (ORDER BY v) AS s0,
             sum(c) OVER () AS n,
             sum(v * c) OVER () AS ts
      FROM hist
    ), scored AS (
      SELECT v,
             (CAST(s0 * (n - w0) - (ts - s0) * w0 AS HUGEINT)
              * CAST(s0 * (n - w0) - (ts - s0) * w0 AS HUGEINT)
              * 1000000) // (CAST(w0 AS HUGEINT) * (n - w0)) AS score
      FROM cum WHERE w0 > 0 AND w0 < n
    )
    SELECT v FROM scored ORDER BY score DESC, v ASC LIMIT 1
    """
    got = duckdb.connect().execute(sql).fetchone()[0]
    assert got == _otsu_python(hist)


def test_soundex_known_codes():
    """Canonical simplified-soundex vectors (h/w map to the vowel class,
    the documented deviation) through the shared dialect chain."""
    import sys

    sys.path.insert(0, "/root/repo")
    from etl_aws_spark.text import _dialect as D

    expr = D.soundex_simplified("w", D.DUCK)
    cases = {
        "robert": "R163", "rupert": "R163", "tymczak": "T522",
        "pfister": "P236", "honeyman": "H555", "aaa": "A000",
    }
    vals = ", ".join(f"('{w}')" for w in cases)
    rows = duckdb.connect().execute(
        f"SELECT w, {expr} FROM (VALUES {vals}) t(w)"
    ).fetchall()
    for w, code in rows:
        assert code == cases[w], (w, code)
        assert len(code) == 4 and code[0].isalpha() and code[1:].isdigit()


def _lcg_vals(seed, n, lo=-8.0, hi=8.0):
    out, x = [], seed
    for _ in range(n):
        x = (1103515245 * x + 12345) % (1 << 31)
        out.append(lo + (hi - lo) * (x / float(1 << 31)))
    return out


def test_runs_test_counts_match_python():
    """Runs-test break counting (lag formulation) equals a direct Python
    run count on a deterministic pseudo-random series."""
    vals = _lcg_vals(7, 101)
    med = sorted(vals)[(len(vals) + 1) // 2 - 1]
    above = [1 if v > med else 0 for v in vals]
    runs = 1 + sum(1 for i in range(1, len(above)) if above[i] != above[i - 1])
    rows = ", ".join(f"({i}, {a})" for i, a in enumerate(above))
    got = duckdb.connect().execute(f"""
      SELECT sum(brk) FROM (
        SELECT CASE WHEN lag(a) OVER (ORDER BY i) IS NULL
                    OR lag(a) OVER (ORDER BY i) <> a THEN 1 ELSE 0 END AS brk
        FROM (VALUES {rows}) t(i, a)
      )
    """).fetchone()[0]
    assert got == runs
