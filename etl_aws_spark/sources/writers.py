"""Sink operators (SURVEY.md §2.1 write side).

Fixes carried from the reference:
- `glue.py:237` uses static overwrite with partitionBy — every daily run
  wipes the WHOLE refined tree. Engine default is dynamic partition
  overwrite (only partitions present in this batch are replaced).
- `glue.py:237` partitions by (date, acao): days × 84 tiny files. At
  scale, partition by the coarse key (date) only and sort within files by
  the fine key so row-group statistics still prune per-ticker scans.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_parquet_partitioned(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
    sort_within_by: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Partitioned parquet write with dynamic overwrite.

    ``sort_within_by``: cluster rows inside each partition's files so
    min/max row-group stats make fine-key lookups cheap without exploding
    the directory count (replaces the reference's (date, acao) layout).
    """
    out = df
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    (
        out.write.partitionBy(*partition_by)
        .option("partitionOverwriteMode", "dynamic")
        .mode(mode)
        .parquet(path)
    )


def write_daily_partition(df: DataFrame, root: str, date_col: str) -> None:
    """Land rows under ano=Y/mes=M/dia=D derived from the event date
    (`s3.py:72-95`, `lambda_function.py:73-91`) — partition values come
    from the DATA, not from wall-clock, so backfills land correctly."""
    dated = df.withColumns(
        {
            "ano": F.year(date_col),
            "mes": F.month(date_col),
            "dia": F.dayofmonth(date_col),
        }
    )
    write_parquet_partitioned(dated, root, ["ano", "mes", "dia"])


def write_csv(df: DataFrame, path: str, sep: str = ";", mode: str = "overwrite") -> None:
    """Delimited CSV sink (`load_data.py:8-11`)."""
    df.write.option("header", True).option("sep", sep).mode(mode).csv(path)


def repair_table(spark: SparkSession, table: str) -> None:
    """Catalog partition sync after an external write (`glue.py:241-287`
    polls Athena MSCK REPAIR; on Spark the statement is synchronous)."""
    spark.sql(f"MSCK REPAIR TABLE {table}")
