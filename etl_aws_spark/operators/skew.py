"""Skew-mitigation operators for hot keys (100 TB posture).

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
default in `session.py`) handles sort-merge joins; these helpers cover the
two cases AQE does not: skewed **aggregations** and skewed **broadcast-side
replication** when the hot side must meet a non-broadcastable right side.

Pattern: salt the hot key with a bounded random suffix → partial aggregate
on (key, salt) → final aggregate on key. Two shuffles, but each partition is
bounded by |hot_key|/n_salts instead of |hot_key|.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted(
    df: DataFrame,
    n_salts: int,
    salt_col: str = "_salt",
    deterministic_by: str | Sequence[str] | None = None,
) -> DataFrame:
    """Append a salt in [0, n_salts). Deterministic when ``deterministic_by``
    names a column or columns (hash-mod — reproducible across runs and stage
    retries; a retry of a lost partition re-derives the same salt from row
    content, where F.rand would reassign); otherwise uniform random per row
    (better balance for truly degenerate keys, but NOT retry-stable)."""
    if deterministic_by is not None:
        cols = [deterministic_by] if isinstance(deterministic_by, str) else list(deterministic_by)
        salt = F.pmod(F.xxhash64(*cols), F.lit(n_salts))
    else:
        salt = (F.rand(seed=42) * n_salts).cast("int")
    return df.withColumn(salt_col, salt)


def salted_count_sum(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    n_salts: int = 16,
    deterministic_by: str | None = None,
) -> DataFrame:
    """Two-phase skew-safe count/sum aggregate: partial on (keys, salt),
    final on keys. Algebraic aggregates (count/sum/min/max) re-combine
    exactly; use this when one key holds a large share of the rows and the
    single-phase hash agg's map-side combine isn't enough (e.g. high-
    cardinality payload columns defeating combine)."""
    part = (
        salted(df, n_salts, deterministic_by=deterministic_by)
        .groupBy(*keys, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            *[F.sum(c).alias(f"_s_{c}") for c in sum_cols],
        )
    )
    return part.groupBy(*keys).agg(
        F.sum("_n").alias("n"),
        *[F.sum(f"_s_{c}").alias(f"sum_{c}") for c in sum_cols],
    )


_REPLICATION_SAFE_HOW = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}


def replicated_skew_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join without AQE: salt the big side, replicate the small
    side across every salt (explode of a literal range — |small|×n_salts
    rows), join on (key, salt). Each shuffle partition receives at most
    |hot_key|/n_salts big-side rows. Use when the small side is too large to
    broadcast but small enough to replicate n_salts times.

    Only big-side-preserving join types are accepted: under 'right'/'full'
    every unmatched small-side row would be emitted once per salt copy —
    n_salts duplicates — so those raise instead of silently corrupting.
    The big-side salt is a deterministic hash of the whole row (varies
    within a hot key, stable across stage retries — F.rand would reassign
    rows to salts on a retry after repartition)."""
    if how not in _REPLICATION_SAFE_HOW:
        raise ValueError(
            f"replicated_skew_join: how={how!r} is not replication-safe; "
            f"unmatched small-side rows would duplicate {n_salts}x. "
            f"Use one of {sorted(_REPLICATION_SAFE_HOW)}."
        )
    big_s = salted(big, n_salts, deterministic_by=big.columns)
    small_r = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = big_s.join(small_r, [key, "_salt"], how)
    return out.drop("_salt")
