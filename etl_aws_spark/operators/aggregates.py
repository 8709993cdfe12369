"""Aggregation operators (SURVEY.md §2.4).

All are single hash-aggregate plans (partial + final automatic in Spark —
map-side combine means the shuffle carries group states, not rows).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def grouped_agg(df: DataFrame, keys: Sequence[str], aggs: dict[str, tuple[str, str]]) -> DataFrame:
    """Generic groupBy().agg() (`preprocessing.py:33-46`).

    ``aggs``: out_name -> (fn_name, col). fn from pyspark.sql.functions.
    """
    exprs = [getattr(F, fn)(col).alias(out) for out, (fn, col) in aggs.items()]
    return df.groupBy(*keys).agg(*exprs)


def nunique_per_group(df: DataFrame, keys: Sequence[str], col: str, out: str, approx: bool = False) -> DataFrame:
    """Distinct count per group (`preprocessing.py:85-99`).

    ``approx=True`` switches to HyperLogLog (`approx_count_distinct`) —
    at 100 TB an exact distinct forces a second shuffle keyed by
    (group, value); HLL keeps it one pass. Exact is the oracle-checked
    default at test scale.
    """
    fn = F.approx_count_distinct if approx else F.countDistinct
    return df.groupBy(*keys).agg(fn(col).alias(out))


def value_counts(df: DataFrame, col: str) -> DataFrame:
    """Frequency table, descending (`eda.ipynb` cell 8)."""
    return df.groupBy(col).agg(F.count(F.lit(1)).alias("count")).orderBy(F.desc("count"), col)


def global_means(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """One-row global means (`preprocessing.py:164-168` imputation source)."""
    return df.agg(*[F.avg(c).alias(f"mean_{c}") for c in cols])


def fill_with_global_mean(df: DataFrame, col: str, out: str | None = None) -> DataFrame:
    """coalesce(c, global mean of c) (`preprocessing.py:163-168`).

    The scalar aggregate is broadcast via crossJoin — NOT computed with an
    empty-frame window, which would funnel every row through one partition.
    """
    mean_df = df.agg(F.avg(col).alias("__gmean"))
    return (
        df.crossJoin(F.broadcast(mean_df))
        .withColumn(out or col, F.coalesce(F.col(col), F.col("__gmean")))
        .drop("__gmean")
    )


def describe_percentiles(df: DataFrame, col: str, ps: Sequence[float] = (0.1, 0.25, 0.5, 0.75, 0.95, 0.99)) -> DataFrame:
    """count/mean/std/min/max + exact interpolated percentiles
    (`preprocessing.py:50-58` pandas describe with custom percentiles).

    Uses exact `percentile` (matches pandas/DuckDB linear interpolation);
    swap to `percentile_approx` at 100 TB where a t-digest is the only
    single-pass option.
    """
    aggs = [
        F.count(col).alias("count"),
        F.avg(col).alias("mean"),
        F.stddev_samp(col).alias("std"),
        F.min(col).alias("min"),
        F.max(col).alias("max"),
    ] + [F.expr(f"percentile({col}, {p})").alias(f"p{int(p * 100)}") for p in ps]
    return df.agg(*aggs)


def null_counts(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Per-column null counts in ONE pass (`eda.ipynb` cell 21)."""
    cols = cols or df.columns
    return df.agg(*[F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}") for c in cols])


def duplicate_row_count(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """count(*) - count(distinct <row>): fully-duplicated rows (`eda.ipynb`
    cell 25, pandas ``df.duplicated().sum()``).

    The distinct is taken over a STRUCT of the columns, not the bare column
    list: SQL ``COUNT(DISTINCT c1, c2)`` skips any tuple containing a NULL,
    which would count every null-bearing row as a "duplicate" — pandas
    treats NaN == NaN for duplicated(). A struct is itself never NULL, so
    null-bearing tuples participate as ordinary distinct values.
    """
    cols = cols or df.columns
    return df.agg(
        (
            F.count(F.lit(1))
            - F.countDistinct(F.struct(*[F.col(c) for c in cols]))
        ).alias("dup_rows")
    )


def with_count_checkpoint(df: DataFrame, name: str) -> tuple[DataFrame, Observation]:
    """Pipeline row-count checkpoint WITHOUT an extra action.

    The reference fires ≥8 separate count() jobs re-running the whole
    lineage (`glue.py:89-228`). `observe()` piggybacks the count on the
    one real action; read `obs.get` after that action completes.
    """
    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias("rows")), obs


def regression_metrics(df: DataFrame, y: str, yhat: str) -> DataFrame:
    """MAE / RMSE / R² as pure aggregates (`train.py:358-368`).

    One pass, no sklearn: R² = 1 - SS_res/SS_tot with SS_tot via the
    variance identity sum((y-ȳ)²) = sum(y²) - n·ȳ².
    """
    e = F.col(y) - F.col(yhat)
    pairs = df.filter(F.col(y).isNotNull() & F.col(yhat).isNotNull())
    return pairs.agg(
        F.avg(F.abs(e)).alias("mae"),
        F.sqrt(F.avg(e * e)).alias("rmse"),
        (
            F.lit(1.0)
            - F.sum(e * e) / (F.sum(F.col(y) * F.col(y)) - F.count(F.lit(1)) * F.pow(F.avg(y), 2))
        ).alias("r2"),
    )
