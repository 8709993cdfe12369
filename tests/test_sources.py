"""REST source plumbing: determinism, retry, failure propagation."""

from __future__ import annotations

import pytest

from etl_aws_spark.sources import rest


@pytest.fixture(scope="module")
def tickers(spark):
    return spark.createDataFrame([("AAA",), ("BBB",), ("CCC",)], "ticker string")


def test_synthetic_fetch_is_deterministic(spark, tickers):
    a = rest.fetch_quotes_batch(tickers, "ticker", n_days=5).toPandas()
    b = rest.fetch_quotes_batch(tickers, "ticker", n_days=5).toPandas()
    assert len(a) == 15
    key = ["ticker", "day"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True)
    )
    # OHLC invariants
    assert (a["high"] >= a[["open", "close"]].max(axis=1)).all()
    assert (a["low"] <= a[["open", "close"]].min(axis=1)).all()


def test_retry_recovers_from_transient_failures(spark, tickers):
    fails = {"n": 0}

    def flaky(ticker: str, n_days: int):
        # fail the first two calls per ticker, then defer to the real client
        fails["n"] += 1
        if fails["n"] % 3 != 0:
            raise rest.FlakyError("transient")
        return rest.synthetic_quote_client(ticker, n_days)

    out = rest.fetch_quotes_batch(
        tickers, "ticker", n_days=2, client=flaky, max_attempts=5
    ).toPandas()
    assert len(out) == 6


def test_permanent_failure_raises(spark, tickers):
    def dead(ticker: str, n_days: int):
        raise rest.FlakyError("down")

    with pytest.raises(Exception):
        rest.fetch_quotes_batch(
            tickers, "ticker", n_days=2, client=dead, max_attempts=2
        ).count()
