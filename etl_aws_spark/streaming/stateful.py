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


def pit_features_stateful(df: DataFrame, window_us: int = 604_800_000_000) -> DataFrame:
    """ONLINE point-in-time feature assembly — the streaming twin of the
    batch `join_point_in_time_features` query: as events arrive, every
    purchase (label) row is emitted with features computed ONLY from the
    key's history strictly before it — clicks in the trailing 7 days, the
    last view value, lifetime event count.

    State per key: the click timestamps still inside the trailing window
    (pruned every batch — O(7-day activity), never O(history)), the last
    view value, and the event count. Feature math inside a batch is
    vectorized: the click-window count is two ``searchsorted`` calls on
    the sorted click-µs array, the view carry-forward is a shifted
    ffill — no per-row Python loop.

    Input columns: ``event_id, user_id, ts, event_type, value``.
    """
    import numpy as np

    out_schema = (
        "event_id bigint, key bigint, label_ts timestamp, label double,"
        " clicks_7d bigint, last_view_value double, n_events_before bigint"
    )

    def update(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key_tuple
        clicks, lv, n0 = state.get if state.exists else ([], None, 0)
        clicks = list(clicks or [])
        empty = pd.DataFrame(
            {
                "event_id": pd.Series(dtype="int64"),
                "key": pd.Series(dtype="int64"),
                "label_ts": pd.Series(dtype="datetime64[ns]"),
                "label": pd.Series(dtype=float),
                "clicks_7d": pd.Series(dtype="int64"),
                "last_view_value": pd.Series(dtype=float),
                "n_events_before": pd.Series(dtype="int64"),
            }
        )
        frames = [p for p in pdfs]
        if not frames or sum(len(p) for p in frames) == 0:
            state.update((clicks, lv, n0))
            yield empty
            return
        pdf = (
            pd.concat(frames, ignore_index=True)
            .sort_values(["us", "event_id"], kind="mergesort")
            .reset_index(drop=True)
        )
        us = pdf["us"].to_numpy(dtype="int64")
        # Contract: micro-batches must arrive in global per-key time
        # order — searchsorted below needs concat(carried, batch clicks)
        # sorted, and the trailing-window prune has already discarded
        # clicks older than the carried horizon, so an event that time-
        # travels behind the carried state cannot be answered correctly.
        # Fail loudly instead of silently emitting wrong clicks_7d.
        if clicks and len(us) and us[0] < clicks[-1]:
            raise ValueError(
                "pit_features_stateful: out-of-order micro-batch for key "
                f"{k}: event at {us[0]}us precedes carried click horizon "
                f"{clicks[-1]}us; per-key batches must be time-ordered "
                "across triggers"
            )
        is_click = (pdf["event_type"] == "click").to_numpy()
        # sorted click-µs array: carried state (earlier batches) + this
        # batch's clicks in time order; clicks at position >= K_i are
        # ordered after row i, so searchsorted over the prefix is exact
        arr = np.concatenate(
            [np.asarray(clicks, dtype="int64"), us[is_click]]
        )
        # number of clicks ordered strictly before row i
        lt = np.searchsorted(arr, us, side="left")
        lo = np.searchsorted(arr, us - window_us, side="left")
        clicks_7d = lt - lo
        view_vals = pdf["value"].where(pdf["event_type"] == "view")
        carried = view_vals.shift(1).ffill()
        if lv is not None:
            carried = carried.fillna(lv)
        n_before = n0 + np.arange(len(pdf), dtype="int64")
        lab = (pdf["event_type"] == "purchase").to_numpy()
        out = pd.DataFrame(
            {
                "event_id": pdf.loc[lab, "event_id"].astype("int64"),
                "key": k,
                "label_ts": pdf.loc[lab, "ts"],
                "label": pdf.loc[lab, "value"].astype(float),
                "clicks_7d": clicks_7d[lab],
                "last_view_value": carried[lab],
                "n_events_before": n_before[lab],
            }
        )
        # prune carried clicks to the trailing window of the latest event
        last_us = int(us[-1])
        keep = arr[arr >= last_us - window_us]
        lv_batch = view_vals.dropna()
        if len(lv_batch):
            lv = float(lv_batch.iloc[-1])
        state.update(([int(x) for x in keep], lv, n0 + len(pdf)))
        yield out

    from pyspark.sql import functions as F

    prepared = df.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        "value",
        F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("us"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="clicks array<bigint>, lv double, n bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
