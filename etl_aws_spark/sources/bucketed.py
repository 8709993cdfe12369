"""Bucketed-table layout for shuffle-free co-located joins (100 TB path).

The refined layer is read back repeatedly and joined/aggregated on the same
keys (ticker, order key…). Bucketing both sides by the join key at write
time lets every later join/aggregate reuse the on-disk partitioning — the
Exchange disappears from the plan, which at cluster scale is the difference
between a local merge and an all-to-all network shuffle of the fact table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int, sort_col: str | None = None
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table. Sorting
    within buckets additionally removes the Sort from sort-merge joins."""
    spark = df.sparkSession
    if not spark.catalog.tableExists(table):
        # the in-memory catalog dies with the session but the warehouse
        # directory persists: saveAsTable refuses an orphaned location
        # (LOCATION_ALREADY_EXISTS) even in overwrite mode, so clear it
        import shutil
        from urllib.parse import urlparse

        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        stale = os.path.join(wh, table.lower())
        if os.path.isdir(stale):
            shutil.rmtree(stale)
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket counts Spark plans a zero-Exchange sort-merge join."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
