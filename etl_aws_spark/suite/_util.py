"""Shared helpers for suite queries (determinism conventions)."""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import Column
from pyspark.sql import functions as F

_CACHE_ROOT = "/tmp/etl_aws_spark_cache"


def cache_dir(sf_dir: str, layout: str) -> str:
    """Cache path for a derived artifact of ``sf_dir``, keyed on the
    directory name AND a content fingerprint (name/size/mtime of every
    parquet file under it). If the driver regenerates the fixtures
    in-place between rounds, the tag changes and stale artifacts are
    abandoned rather than served (ADVICE r6: the bare-``sf_dir`` tag
    could silently survive a data refresh)."""
    h = hashlib.sha1(sf_dir.encode())
    try:
        for root, _dirs, files in sorted(os.walk(sf_dir)):
            for fname in sorted(files):
                if not fname.endswith(".parquet"):
                    continue
                st = os.stat(os.path.join(root, fname))
                h.update(f"{root}/{fname}:{st.st_size}:{st.st_mtime_ns}".encode())
    except OSError:
        pass
    return os.path.join(_CACHE_ROOT, h.hexdigest()[:16], layout)

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
