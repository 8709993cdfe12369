"""SURVEY §2.1 ingestion queries: REST batch source, catalog repair."""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_aws_spark.registry import load, query
from etl_aws_spark.sources import catalog, rest, writers


@query("source_rest_api_batch", oracle=None, category="source")
def source_rest_api_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed per-ticker REST fetch (`webscrapping.py:19-60`): the
    nation table stands in for the ticker dimension; the deterministic
    synthetic client stands in for yfinance (no network in this
    environment). Rows-only: 25 tickers × 30 days = 750 rows; values are
    hash-derived and identical on every run."""
    tickers = load(spark, sf_dir, "nation").select(F.col("n_name").alias("ticker"))
    return rest.fetch_quotes_batch(tickers, "ticker", n_days=30)


@query("catalog_msck_repair", oracle=None, category="source")
def catalog_msck_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`MSCK REPAIR TABLE` + partition listing (`glue.py:241-287`), on a
    daily-partitioned events layout. Rows-only: one row per recovered
    partition (30 days in the fixtures)."""
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    root = os.path.join("/tmp/etl_aws_spark_cache", tag, "events_catalog")
    if not os.path.exists(os.path.join(root, "_SUCCESS")):
        writers.write_daily_partition(load(spark, sf_dir, "events"), root, "ts")
    table = f"events_cat_{tag}"
    catalog.register_partitioned_table(
        spark,
        table,
        root,
        schema_ddl=(
            "event_id bigint, ts timestamp, user_id bigint, event_type string, "
            "value double, props string, ano int, mes int, dia int"
        ),
        partition_cols=["ano", "mes", "dia"],
    )
    return catalog.msck_repair(spark, table)
