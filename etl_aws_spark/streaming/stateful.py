"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference recomputes every window feature from scratch each daily run
(`glue.py:183-195` over a 10-day re-read). The streaming-native form keeps
per-key state (the EWMA accumulator, last value, row count) in the state
store and updates it incrementally per micro-batch — O(new rows), not
O(history), per trigger.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "ewma double, n bigint"


def ewma_stateful(
    df: DataFrame,
    key: str,
    ts_col: str,
    value: str,
    span: int = 12,
) -> DataFrame:
    """Incremental per-key EWMA (`adjust=False` recurrence, the MACD
    building block — `preprocessing.py:346-351`) over a stream.

    State per key is TWO numbers (accumulator + count) regardless of
    history length; each micro-batch folds only its own rows. Compare the
    batch path (`operators/timeseries.macd`), which recomputes the full
    series — identical math, so a catch-up streaming run converges to the
    batch result exactly (pinned in tests/test_streaming_stateful.py).
    """
    alpha = 2.0 / (span + 1.0)
    # Key dtype follows the input schema — the reference keys series by
    # ticker strings, so a hard-coded `key long` would miscast at the Arrow
    # boundary for non-bigint keys.
    key_type = df.schema[key].dataType.simpleString()
    out_schema = f"key {key_type}, ts timestamp, value double, ewma double, n bigint"

    def update(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key_tuple
        acc, n = state.get if state.exists else (None, 0)
        # columns arrive renamed to (key, ts, value) by the selectExpr.
        # The iterator CAN be empty (any timeout configuration delivers
        # timed-out keys with no data) — pd.concat([]) raises, and an
        # implicitly all-object empty frame would not coerce to the typed
        # out_schema at the Arrow boundary, so build the typed empty frame
        # explicitly.
        frames = [p for p in pdfs]
        empty = pd.DataFrame(
            {
                "key": pd.Series(dtype=object),
                "ts": pd.Series(dtype="datetime64[ns]"),
                "value": pd.Series(dtype=float),
                "ewma": pd.Series(dtype=float),
                "n": pd.Series(dtype="int64"),
            }
        )
        if not frames or sum(len(p) for p in frames) == 0:
            state.update((acc, n))
            yield empty
            return
        pdf = pd.concat(frames, ignore_index=True).sort_values(
            ["ts"], kind="mergesort"
        )
        if len(pdf):
            # Vectorized adjust=False fold seeded by the carried-in
            # accumulator: prepend the state row, ewm, drop it — identical
            # recurrence e_t = α·x_t + (1−α)·e_{t−1}, no per-row Python.
            x = pdf["value"].astype(float)
            if acc is None:
                ewma = x.ewm(alpha=alpha, adjust=False).mean()
            else:
                seeded = pd.concat([pd.Series([acc]), x], ignore_index=True)
                ewma = seeded.ewm(alpha=alpha, adjust=False).mean().iloc[1:]
                ewma.index = x.index
            acc = float(ewma.iloc[-1])
            out = pd.DataFrame(
                {
                    "key": k,
                    "ts": pdf["ts"],
                    "value": x,
                    "ewma": ewma,
                    "n": n + pd.RangeIndex(1, len(pdf) + 1),
                }
            )
            n += len(pdf)
        else:
            out = empty
        state.update((acc, n))
        yield out

    return (
        df.selectExpr(f"{key} AS key", f"{ts_col} AS ts", f"{value} AS value")
        .groupBy("key")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def kalman_stateful(
    df: DataFrame,
    key: str,
    ts_col: str,
    value: str,
    q_noise: float = 0.125,
    r_noise: float = 4.0,
) -> DataFrame:
    """Incremental per-key 1-D KALMAN FILTER over a stream — the
    adaptive-gain upgrade of :func:`ewma_stateful` (the gain
    K = (P+Q)/(P+Q+R) adapts from the carried error covariance instead
    of a fixed α). State per key is THREE numbers (level, P, count)
    regardless of history; each micro-batch folds only its own rows in
    event-time order. The recurrence is the identical IEEE op chain as
    the batch `window_kalman_filter_1d` fold, so a catch-up streaming
    run lands on the batch replay exactly (batch-parity oracle)."""
    key_type = df.schema[key].dataType.simpleString()
    out_schema = (
        f"key {key_type}, ts timestamp, value double, "
        f"level double, variance double, n bigint"
    )

    def update(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key_tuple
        level, p, n = state.get if state.exists else (None, 1.0, 0)
        frames = [pf for pf in pdfs]
        empty = pd.DataFrame(
            {
                "key": pd.Series(dtype=object),
                "ts": pd.Series(dtype="datetime64[ns]"),
                "value": pd.Series(dtype=float),
                "level": pd.Series(dtype=float),
                "variance": pd.Series(dtype=float),
                "n": pd.Series(dtype="int64"),
            }
        )
        if not frames or sum(len(pf) for pf in frames) == 0:
            state.update((level, p, n))
            yield empty
            return
        pdf = pd.concat(frames, ignore_index=True).sort_values(
            ["ts"], kind="mergesort"
        )
        xs = pdf["value"].astype(float).tolist()
        levels, variances = [], []
        for z in xs:
            if level is None:
                level, p = float(z), 1.0
            else:
                # identical op chain as the batch HOF fold: recompute the
                # gain expression textually, never a cached reordering
                level = level + (p + q_noise) / (p + q_noise + r_noise) * (
                    z - level
                )
                p = (p + q_noise) - (p + q_noise) / (
                    p + q_noise + r_noise
                ) * (p + q_noise)
            levels.append(level)
            variances.append(p)
        out = pd.DataFrame(
            {
                "key": k,
                "ts": pdf["ts"],
                "value": xs,
                "level": levels,
                "variance": variances,
                "n": n + pd.RangeIndex(1, len(pdf) + 1),
            }
        )
        state.update((level, p, n + len(pdf)))
        yield out

    renamed = df.selectExpr(
        f"{key} as key", f"{ts_col} as ts", f"cast({value} as double) as value"
    )
    return renamed.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="level double, p double, n bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
