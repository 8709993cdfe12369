"""Shared helpers for suite queries (determinism conventions)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordering for the events table: ts is unique per user in the fixtures, but
# event_id is appended as an unconditional tie-break so every windowed result
# is hash-deterministic even if that ever changes.
EVENTS_ORDER = ("ts", "event_id")
EVENTS_ORDER_SQL = "ts, event_id"


def rnd(c: Column, n: int = 4) -> Column:
    """Round a derived double identically to the oracle's ``round(x, n) + 0.0``.

    The ``+ 0.0`` collapses IEEE negative zero so both engines hash the
    same bits. Use n=2 for large-magnitude global sums (double error there
    can exceed 1e-4 absolute), 4 for window-frame stats, 6 for ratios.
    """
    return F.round(c, n) + F.lit(0.0)


def sql_rnd(expr: str, n: int = 4) -> str:
    return f"round({expr}, {n}) + 0.0"


def rnd_nudged(c: Column, n: int = 4) -> Column:
    """Nudged rounding bridge for columns measured to land exactly on
    decimal half-boundaries (SCALE.md §8): Spark rounds the shortest-
    decimal repr HALF_UP while DuckDB rounds the binary double, so a
    bit-identical value can round differently. Adding sign(x)·1e-9 —
    far above any summation jitter, far below data resolution — moves
    the value off the boundary the same way on BOTH engines. Mirror with
    :func:`sql_rnd_nudged` in the oracle."""
    return F.round(c + F.signum(c) * F.lit(1e-9), n) + F.lit(0.0)


def sql_rnd_nudged(expr: str, n: int = 4) -> str:
    return f"round(({expr}) + sign({expr}) * 1e-9, {n}) + 0.0"
