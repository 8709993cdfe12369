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

OUT_SCHEMA = "key long, ts timestamp, value double, ewma double, n bigint"
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
    beta = (span - 1.0) / (span + 1.0)

    def update(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key_tuple
        acc, n = state.get if state.exists else (None, 0)
        out = []
        for pdf in pdfs:
            # columns arrive renamed to (key, ts, value) by the selectExpr
            pdf = pdf.sort_values(["ts"], kind="mergesort")
            for _, row in pdf.iterrows():
                x = float(row["value"])
                acc = x if acc is None else alpha * x + beta * acc
                n += 1
                out.append((k, row["ts"], x, acc, n))
        state.update((acc, n))
        yield pd.DataFrame(out, columns=["key", "ts", "value", "ewma", "n"])

    return (
        df.selectExpr(f"{key} AS key", f"{ts_col} AS ts", f"{value} AS value")
        .groupBy("key")
        .applyInPandasWithState(
            update,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
