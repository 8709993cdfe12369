"""Bucketed-table layout for shuffle-free co-located joins (100 TB path).

The refined layer is read back repeatedly and joined/aggregated on the same
keys (ticker, order key…). Bucketing both sides by the join key at write
time lets every later join/aggregate reuse the on-disk partitioning — the
Exchange disappears from the plan, which at cluster scale is the difference
between a local merge and an all-to-all network shuffle of the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int, sort_col: str | None = None
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table. Sorting
    within buckets additionally removes the Sort from sort-merge joins."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket counts Spark plans a zero-Exchange sort-merge join."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
