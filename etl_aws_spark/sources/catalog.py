"""Catalog partition registration (SURVEY §2.1 `catalog_msck_repair`).

The reference registers freshly-written partitions by launching an Athena
``MSCK REPAIR TABLE`` via boto3 and polling it to completion
(`glue.py:241-287`, 1 s poll loop). Spark-native: the catalog lives in the
session, so ``MSCK REPAIR TABLE`` is a synchronous `spark.sql` call — no
client, no polling, no cross-service round trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def register_partitioned_table(
    spark: SparkSession, table: str, location: str, schema_ddl: str, partition_cols: list[str]
) -> None:
    """Create (if absent) an external parquet table over an existing
    partitioned layout. Idempotent."""
    parts = ", ".join(partition_cols)
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {table} ({schema_ddl}) "
        f"USING PARQUET PARTITIONED BY ({parts}) LOCATION '{location}'"
    )


def msck_repair(spark: SparkSession, table: str) -> DataFrame:
    """Recover partitions and return the registered partition list
    (`glue.py:241-287` minus the Athena poll loop)."""
    spark.sql(f"MSCK REPAIR TABLE {table}")
    return spark.sql(f"SHOW PARTITIONS {table}")
