"""Distributed batch REST ingestion (SURVEY §2.1 `source_rest_api_batch`).

The reference fetches quotes ticker-by-ticker in a serial driver-side loop
with fixed sleeps (`src/etl/webscrapping.py:19-60`: ~0.7 s/ticker → ≈1 min
for 84 tickers) and a tenacity retry wrapper
(`src/etl/webscrapping_proxy.py:38-53`). Spark-native shape: the ticker
dimension is a DataFrame, the fetch runs inside ``mapInPandas`` so every
executor pulls a disjoint slice of tickers concurrently; retry/backoff and
rate limiting live inside the task, per partition.

The HTTP client is **pluggable and defaults to a deterministic synthetic
quote generator** — this container has no network; the generator derives an
OHLCV history from a hash of (ticker, day) so results are stable across runs
and engines. The plumbing (partitioning, Arrow batches, retry, rate limit,
empty-result guard) is the real, tested surface.
"""

from __future__ import annotations

import hashlib
import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

QUOTE_SCHEMA = (
    "ticker string, day int, open double, high double, low double, "
    "close double, volume long"
)


def synthetic_quote_client(ticker: str, n_days: int) -> pd.DataFrame:
    """Deterministic stand-in for the yfinance history call
    (`webscrapping.py:22-25`): a hash-seeded random walk per ticker."""
    rows = []
    seed = int.from_bytes(hashlib.sha256(ticker.encode()).digest()[:4], "big")
    price = 20.0 + (seed % 1000) / 10.0
    for day in range(n_days):
        h = int.from_bytes(
            hashlib.sha256(f"{ticker}:{day}".encode()).digest()[:4], "big"
        )
        move = ((h % 2001) - 1000) / 10000.0  # ±10%
        o = price
        c = price * (1.0 + move)
        # raw doubles, no rounding: Python round() is banker's, SQL round()
        # is half-away — emitting raw keeps the oracle mirror bit-exact
        rows.append(
            (
                ticker,
                day,
                o,
                max(o, c) * 1.01,
                min(o, c) * 0.99,
                c,
                100_000 + h % 900_000,
            )
        )
        price = c
    return pd.DataFrame(
        rows, columns=["ticker", "day", "open", "high", "low", "close", "volume"]
    )


class FlakyError(RuntimeError):
    """Raised by test clients to exercise the retry path."""


def fetch_quotes_batch(
    tickers: DataFrame,
    ticker_col: str,
    n_days: int,
    client: Callable[[str, int], pd.DataFrame] | None = None,
    max_attempts: int = 5,
    backoff_base: float = 0.0,
    rate_limit_s: float = 0.0,
) -> DataFrame:
    """tickers-df → ``mapInPandas(fetch)`` → one OHLCV row per (ticker, day).

    Retry policy mirrors `webscrapping_proxy.py:38-41` (N attempts,
    exponential backoff capped at 10 s); per-call rate limiting mirrors the
    `time.sleep` pacing at `webscrapping.py:23,60` but applies per executor
    slot, so wall-clock scales as tickers / parallelism instead of serially.
    Empty per-ticker results are skipped with the same guard as
    `webscrapping.py:28-31`.
    """
    fetch_one = client or synthetic_quote_client

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for ticker in pdf[ticker_col].astype(str):
                last_err: Exception | None = None
                for attempt in range(max_attempts):
                    try:
                        if rate_limit_s:
                            time.sleep(rate_limit_s)
                        out = fetch_one(ticker, n_days)
                        break
                    except Exception as e:  # retry with capped exp backoff
                        last_err = e
                        if backoff_base:
                            time.sleep(min(backoff_base * 2**attempt, 10.0))
                        out = None
                if out is None:
                    raise RuntimeError(f"fetch failed for {ticker}") from last_err
                if len(out):
                    yield out

    # repartition so every core fetches a disjoint ticker slice concurrently
    n_part = max(tickers.sparkSession.sparkContext.defaultParallelism, 1)
    return tickers.select(ticker_col).repartition(n_part).mapInPandas(
        fetch, schema=QUOTE_SCHEMA
    )
