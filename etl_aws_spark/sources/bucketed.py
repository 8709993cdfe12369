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


def _managed_location(spark: SparkSession, table: str) -> str:
    """Filesystem path saveAsTable would use for a managed table name,
    handling database-qualified 'db.table' (-> <wh>/<db>.db/<table>)."""
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    parts = table.lower().split(".")
    if len(parts) == 2:
        return os.path.join(wh, parts[0] + ".db", parts[1])
    return os.path.join(wh, parts[-1])


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
    owned: bool = False,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table. Sorting
    within buckets additionally removes the Sort from sort-merge joins.

    The in-memory catalog dies with the session but the warehouse directory
    persists, and saveAsTable refuses an orphaned location
    (LOCATION_ALREADY_EXISTS) even in overwrite mode. With ``owned=True``
    the caller asserts the name is private to this process (e.g. it embeds
    the applicationId, the q_scans pattern) and a stale location is cleared
    automatically. Default ``owned=False`` NEVER deletes: the catalog check
    is session-local, so a shared name could belong to another live
    application mid-read — the orphan surfaces as a clear error instead."""
    spark = df.sparkSession
    if not spark.catalog.tableExists(table):
        stale = _managed_location(spark, table)
        if os.path.isdir(stale):
            if owned:
                import shutil

                shutil.rmtree(stale)
            else:
                raise RuntimeError(
                    f"write_bucketed: orphaned warehouse location {stale!r} "
                    f"exists for table {table!r} not in this session's "
                    "catalog. It may belong to another live application — "
                    "pass owned=True only if this process owns the name "
                    "(e.g. it embeds the applicationId), or remove the "
                    "directory manually."
                )
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket counts Spark plans a zero-Exchange sort-merge join."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
