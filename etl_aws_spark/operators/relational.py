"""Projection / filter / join / set operators (SURVEY.md §2.2, §2.3, §2.7).

Thin, typed wrappers over the DataFrame API — the point is policy, not
mechanism: key normalization folded into joins, broadcast hints for
dimension tables, date-range predicates that survive year boundaries
(the reference's independent ano/mes ranges select nothing across
2024-12 → 2025-01, `glue.py:78-83`), and explicit deterministic forms.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_aws_spark.functions import normalize_key

# ---- projections (§2.2) -------------------------------------------------


def rename_columns(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Bulk rename (`glue.py:113-128` chains 16 withColumnRenamed calls;
    one `withColumnsRenamed` keeps a single projection node)."""
    return df.withColumnsRenamed(mapping)


def lowercase_columns(df: DataFrame) -> DataFrame:
    """Lowercase every column name (`glue.py:102-103`)."""
    return df.toDF(*[c.lower() for c in df.columns])


# ---- filters (§2.2) -----------------------------------------------------


def filter_date_range(df: DataFrame, col: str, start: str, end: str) -> DataFrame:
    """Inclusive date-range predicate on a date/timestamp column.

    Replaces the reference's conjunctive ano/mes ranges (`glue.py:78-83`)
    with a single BETWEEN on the derived date — correct across year
    boundaries, and still prunes Hive partitions because Catalyst folds
    `make_date(ano,mes,dia) BETWEEN ...` into partition filters when the
    parts are partition columns.
    """
    c = F.col(col)
    return df.filter(c.between(F.lit(start).cast(df.schema[col].dataType), F.lit(end).cast(df.schema[col].dataType)))


def split_by_cutoff(df: DataFrame, col: str, cutoff: str, out: str = "split") -> DataFrame:
    """Temporal holdout label: t < cutoff -> 'train' else 'test'
    (`train.py:57-92` as one pass instead of two filters)."""
    c = F.col(col)
    return df.withColumn(out, F.when(c < F.lit(cutoff).cast(df.schema[col].dataType), "train").otherwise("test"))


# ---- joins (§2.3) -------------------------------------------------------


def left_join_dim(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    normalize: bool = False,
    hint_broadcast: bool = True,
) -> DataFrame:
    """Left equi-join fact -> small dimension (`glue.py:131-134`).

    - ``normalize``: apply lower(trim(cast)) to BOTH keys before matching
      (the reference's dimension CSV has stray whitespace/case).
    - ``hint_broadcast``: dimension tables are broadcast so the fact side
      never shuffles — at 100 TB the fact shuffle is the whole cost.
    The dim key column is dropped after the join (it equals the fact key).
    """
    d = F.broadcast(dim) if hint_broadcast else dim
    if normalize:
        cond = normalize_key(fact[fact_key]) == normalize_key(d[dim_key])
    else:
        cond = fact[fact_key] == d[dim_key]
    return fact.join(d, cond, "left").drop(d[dim_key])


def attach_group_counts(df: DataFrame, keys: Sequence[str], out: str = "n_in_group") -> DataFrame:
    """Left-join per-composite-key group sizes back onto rows
    (`preprocessing.py:104-106`). Partial aggregation makes the counts
    side tiny; it is broadcast back so the row side never shuffles."""
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias(out))
    return df.join(F.broadcast(counts), list(keys), "left")


# ---- set ops (§2.7) -----------------------------------------------------


def union_all(dfs: Sequence[DataFrame]) -> DataFrame:
    """Schema-aligned UNION ALL of per-source frames
    (`webscrapping.py:52,64` pd.concat; `train.py:144-147`)."""
    return reduce(DataFrame.unionByName, dfs)


def concat_columns(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """Column-wise concat of aligned frames re-expressed as a key join —
    the engine never relies on positional alignment (`webscrapping.py:46`,
    `model_evaluation.ipynb` cells 9/12 use pandas axis=1 concat)."""
    keys = [on] if isinstance(on, str) else list(on)
    return left.join(right, keys, "inner")
