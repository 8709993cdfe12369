"""Per-key ordered-window operators (SURVEY.md §2.5 — the reference's core).

Everything here is `Window.partitionBy(key).orderBy(order)` analytics:
lag/diff features (`glue.py:183-191`), leakage-guarded trailing frames
(-n,-1) (`glue.py:192-195`, `preprocessing.py:329-331`), pct-change, RSI
(`preprocessing.py:337-343`), positional splits (`train.py:120-147`).

Scale notes:
- All ops over the SAME (key, order) share ONE window spec, so Catalyst
  plans a single Exchange(hashpartitioning(key)) + one sort for the whole
  feature block — N features cost one shuffle, not N.
- Frames are row-based and bounded; state per key is O(frame), so executors
  never materialize a whole key group (safe for skewed keys at 100 TB).
- A full tie-break in the ordering makes every result hash-deterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def key_window(key: str | Sequence[str], order: str | Sequence[Column | str]) -> WindowSpec:
    keys = [key] if isinstance(key, str) else list(key)
    orders = [order] if isinstance(order, str) else list(order)
    return Window.partitionBy(*keys).orderBy(*orders)


def lag_diff(df: DataFrame, col: str, w: WindowSpec, out: str) -> DataFrame:
    """First-order difference x - lag(x, 1) per key (`glue.py:183-184`)."""
    return df.withColumn(out, F.col(col) - F.lag(col, 1).over(w))


def lag_features(df: DataFrame, col: str, lags: Sequence[int], w: WindowSpec) -> DataFrame:
    """lag_{n}_{col} for each n (`glue.py:188-191`, `preprocessing.py:325-326`)."""
    return df.withColumns({f"lag_{n}_{col}": F.lag(col, n).over(w) for n in lags})


def trailing(df: DataFrame, col: str, n: int, w: WindowSpec, stats: Sequence[str], prefix: str = "") -> DataFrame:
    """Trailing-frame stats over the previous n rows EXCLUDING current.

    Frame (-n, -1) is the reference's leakage guard (`glue.py:192-195`:
    rolling mean/stddev; `preprocessing.py:329-331`: shift(1).rolling(n)).
    """
    frame = w.rowsBetween(-n, -1)
    fns = {"mean": F.avg, "stddev": F.stddev_samp, "sum": F.sum, "min": F.min, "max": F.max}
    names = {"mean": "rolling_mean", "stddev": "volatility", "sum": "rolling_sum", "min": "rolling_min", "max": "rolling_max"}
    cols = {f"{prefix}{names[s]}_{n}_{col}": fns[s](col).over(frame) for s in stats}
    return df.withColumns(cols)


def pct_change(df: DataFrame, col: str, w: WindowSpec, out: str) -> DataFrame:
    """x / lag(x,1) - 1 per key (`eda.ipynb` cells 37-38).

    NULL (not an ANSI error) when the previous value is 0 — `nullif` guard
    keeps semantics identical under ANSI and non-ANSI modes.
    """
    return df.withColumn(out, F.col(col) / F.nullif(F.lag(col, 1).over(w), F.lit(0.0)) - F.lit(1.0))


def rsi(df: DataFrame, col: str, w: WindowSpec, n: int = 14, out: str = "rsi") -> DataFrame:
    """Relative Strength Index over n periods (`preprocessing.py:337-343`).

    Clamped up/down moves averaged over a trailing frame of n rows
    INCLUDING current (pandas `rolling(14)` on the diff), computed in the
    algebraically-equal zero-safe form 100*up/(up+down) — equals
    100 - 100/(1+up/down) when down>0, 100 when down=0, NULL when the
    frame is flat (0/0). Pure expressions — no UDF.
    """
    diff = F.col(col) - F.lag(col, 1).over(w)
    frame = w.rowsBetween(-(n - 1), 0)
    up = F.avg(F.greatest(diff, F.lit(0.0))).over(frame)
    down = F.avg(F.greatest(-diff, F.lit(0.0))).over(frame)
    return df.withColumn(out, F.lit(100.0) * up / F.nullif(up + down, F.lit(0.0)))


def row_number_split(
    df: DataFrame, w: WindowSpec, n_train: int, n_test: int, out: str = "split"
) -> DataFrame:
    """Positional per-group split: first n -> 'train', next m -> 'test', else NULL.

    Re-expresses `train.py:120-147` (head/tail slicing per ticker) as a
    single window pass instead of a per-group driver loop.
    """
    rn = F.row_number().over(w)
    return df.withColumn(
        out,
        F.when(rn <= n_train, F.lit("train"))
        .when(rn <= n_train + n_test, F.lit("test"))
        .otherwise(F.lit(None).cast("string")),
    )


def forward_fill(df: DataFrame, col: str, w: WindowSpec, out: str | None = None) -> DataFrame:
    """Last non-null value up to current row per key (`preprocessing.py:158-160`)."""
    frame = w.rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(out or col, F.last(col, ignorenulls=True).over(frame))


def backward_fill(df: DataFrame, col: str, w: WindowSpec, out: str | None = None) -> DataFrame:
    """First non-null value from current row onward per key (`preprocessing.py:161`)."""
    frame = w.rowsBetween(0, Window.unboundedFollowing)
    return df.withColumn(out or col, F.first(col, ignorenulls=True).over(frame))


def glue_feature_block(
    df: DataFrame,
    value_col: str,
    key: str,
    order: str | Sequence[Column | str],
    lags: Sequence[int] = (1, 2, 3, 5),
    windows: Sequence[int] = (3, 5),
) -> DataFrame:
    """The reference's whole engineered-feature block in one window pass.

    Reproduces `glue.py:183-214`: diff -> lag features -> trailing
    mean/stddev -> zero-fill warm-up nulls. One Exchange + one Sort for
    everything (verified via .explain — see tests/test_plans.py).
    """
    w = key_window(key, order)
    diff_col = f"{value_col}_diff"
    out = lag_diff(df, value_col, w, diff_col)
    out = lag_features(out, diff_col, lags, w)
    for n in windows:
        out = trailing(out, diff_col, n, w, stats=("mean", "stddev"))
    fill_cols = (
        [diff_col]
        + [f"lag_{n}_{diff_col}" for n in lags]
        + [f"rolling_mean_{n}_{diff_col}" for n in windows]
        + [f"volatility_{n}_{diff_col}" for n in windows]
    )
    return out.fillna(0.0, subset=fill_cols)
