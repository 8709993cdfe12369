"""Deterministic deduplication (SURVEY.md §2.9).

The reference's `dropDuplicates(['date','acao'])` (`glue.py:226`) keeps an
ARBITRARY survivor — whichever row a task sees first — so two runs of the
same pipeline can emit different refined tables. Engine policy: dedup is
always `row_number() == 1` over an explicit (keys, tie-break) ordering,
which is reproducible, hash-stable, and exactly one shuffle (same cost as
dropDuplicates).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_canonical(df: DataFrame, keys: Sequence[str], order: Sequence[Column | str]) -> DataFrame:
    """Keep exactly one row per key: the first under ``order``.

    Covers both `dedup_by_key` (`glue.py:226`) and
    `dedup_keep_first_ordered` (`preprocessing.py:22-25`).
    """
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
