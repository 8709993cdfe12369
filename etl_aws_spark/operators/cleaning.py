"""Data-cleaning operators for training-data pipelines: robust outlier
flagging, winsorization, deterministic stratified sampling.

All pure DataFrame compositions; fitted state (per-group medians, global
percentiles) is tiny and broadcast back — the fact table shuffles at most
once, on the group key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def flag_outliers_mad(
    df: DataFrame, value: str, key: str, k: float = 3.0
) -> DataFrame:
    """Robust per-key outlier flag: |x − median| > k·MAD (median absolute
    deviation). Immune to the outliers it hunts, unlike z-scores. Two
    grouped percentile aggregates (median, then MAD over deviations), both
    joined back as broadcast maps; adds ``is_outlier``."""
    med = df.groupBy(key).agg(
        F.percentile(value, F.lit(0.5)).alias("_med")
    )
    with_med = df.join(F.broadcast(med), key)
    mad = (
        with_med.groupBy(key)
        .agg(
            F.percentile(F.abs(F.col(value) - F.col("_med")), F.lit(0.5)).alias("_mad")
        )
    )
    out = with_med.join(F.broadcast(mad), key)
    # Degenerate-MAD policy: when >50% of a group's values equal the median,
    # MAD is 0 and the k·MAD band collapses — fall back to flagging any
    # deviation from the median (every non-median value is extreme relative
    # to a group that is mostly constant). Never emits NULL.
    dev = F.abs(F.col(value) - F.col("_med"))
    return out.withColumn(
        "is_outlier",
        F.when(F.col("_mad") == 0.0, (dev > 0.0).cast("int"))
        .otherwise((dev > F.lit(k) * F.col("_mad")).cast("int")),
    ).drop("_med", "_mad")


def winsorize(
    df: DataFrame, cols: Sequence[str], lower: float = 0.01, upper: float = 0.99
) -> DataFrame:
    """Clip each column to its global [lower, upper] exact percentiles —
    the standard heavy-tail guard before scaling/training. One aggregate
    computes every bound; the clip is pure column arithmetic."""
    bounds = df.agg(
        *[F.percentile(c, F.lit(lower)).alias(f"_lo_{c}") for c in cols],
        *[F.percentile(c, F.lit(upper)).alias(f"_hi_{c}") for c in cols],
    )
    out = df.crossJoin(F.broadcast(bounds))
    for c in cols:
        out = out.withColumn(
            c, F.least(F.greatest(F.col(c), F.col(f"_lo_{c}")), F.col(f"_hi_{c}"))
        )
    return out.drop(*[f"_lo_{c}" for c in cols], *[f"_hi_{c}" for c in cols])


def stratified_sample_hash(
    df: DataFrame, strata: str, id_col: str, fraction_pct: int
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row when
    md5(stratum:id) mod 100 < pct. Unlike ``df.sample`` the selection is a
    pure function of the data — stable across runs, engines, partitionings,
    and resumable pipelines (the property that matters when a 100 TB sample
    must be reproducible months later)."""
    h = F.expr(
        f"cast(conv(substr(md5(concat(cast({strata} as string), ':', "
        f"cast({id_col} as string))), 1, 8), 16, 10) as bigint) % 100"
    )
    return df.withColumn("_bucket", h).filter(
        F.col("_bucket") < fraction_pct
    ).drop("_bucket")
