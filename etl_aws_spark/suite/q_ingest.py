"""SURVEY §2.1 ingestion queries: REST batch source, catalog repair."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_aws_spark.suite._util import cache_dir as _cache_dir
from etl_aws_spark.registry import load, query
from etl_aws_spark.sources import catalog, rest, writers


@query(
    "source_rest_api_batch",
    # the synthetic client is a sha256-seeded random walk — DuckDB replays
    # it with the same left-fold product, so even the INGEST source is
    # value-checked (a real HTTP client would fall back to rows-only)
    oracle="""
    WITH t AS (
      SELECT n_name AS ticker,
             20.0 + (('0x' || substr(sha256(n_name), 1, 8))::BIGINT % 1000) / 10.0 AS p0
      FROM nation
    ), d AS (
      SELECT ticker, p0, CAST(x AS INT) AS day,
             ('0x' || substr(sha256(ticker || ':' || x), 1, 8))::BIGINT AS h
      FROM t CROSS JOIN (SELECT unnest(range(30)) AS x)
    ), m AS (
      SELECT ticker, p0, day, h,
             ((h % 2001) - 1000) / 10000.0 AS move
      FROM d
    ), pre AS (
      SELECT ticker, p0, day, h, move,
             coalesce(list(1.0 + move) OVER (PARTITION BY ticker ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), []) AS factors
      FROM m
    ), px AS (
      SELECT ticker, day, h, move,
             list_reduce(list_prepend(p0, factors), (acc, x) -> acc * x) AS o
      FROM pre
    )
    SELECT ticker, day,
           round(o, 4) + 0.0 AS open,
           round(greatest(o, o * (1.0 + move)) * 1.01, 4) + 0.0 AS high,
           round(least(o, o * (1.0 + move)) * 0.99, 4) + 0.0 AS low,
           round(o * (1.0 + move), 4) + 0.0 AS close,
           CAST(100000 + h % 900000 AS BIGINT) AS volume
    FROM px
    """,
    category="source",
)
def source_rest_api_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed per-ticker REST fetch (`webscrapping.py:19-60`): the
    nation table stands in for the ticker dimension; the deterministic
    synthetic client stands in for yfinance (no network in this
    environment). 25 tickers × 30 days, every OHLCV value hash-checked
    against the SQL replay of the same walk."""
    tickers = load(spark, sf_dir, "nation").select(F.col("n_name").alias("ticker"))
    out = rest.fetch_quotes_batch(tickers, "ticker", n_days=30)
    return out.select(
        "ticker", "day",
        (F.round("open", 4) + F.lit(0.0)).alias("open"),
        (F.round("high", 4) + F.lit(0.0)).alias("high"),
        (F.round("low", 4) + F.lit(0.0)).alias("low"),
        (F.round("close", 4) + F.lit(0.0)).alias("close"),
        "volume",
    )


@query(
    "catalog_msck_repair",
    # Exact oracle (promoted r8 from rows-only): SHOW PARTITIONS returns
    # one `partition` string per recovered ano=/mes=/dia= directory, and
    # the daily layout is derived 1:1 from the event timestamps — so the
    # listing is exactly the distinct calendar days of `events` rendered
    # in Hive partition-path syntax (unpadded ints, as the writer emits).
    # A partition the repair failed to register fails rows_match; a
    # mis-derived path component fails the value hash.
    oracle="""
    SELECT DISTINCT
      'ano=' || CAST(date_part('year', ts) AS VARCHAR)
      || '/mes=' || CAST(date_part('month', ts) AS VARCHAR)
      || '/dia=' || CAST(date_part('day', ts) AS VARCHAR) AS "partition"
    FROM events
    """,
    category="source",
)
def catalog_msck_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`MSCK REPAIR TABLE` + partition listing (`glue.py:241-287`), on a
    daily-partitioned events layout. One row per recovered partition
    (30 days in the fixtures); value-hash-checked against the SQL replay
    of the distinct event days since r8."""
    root = _cache_dir(sf_dir, "events_catalog")
    tag = os.path.basename(os.path.dirname(root))
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


@query(
    "catalog_compute_stats",
    # ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS, as a data product:
    # per ship-year partition, the row count, exact NDVs, min/max bounds
    # and null counts a cost-based optimizer (or table-format manifest)
    # records. All counts exact integers; prices round 2.
    oracle="""
    SELECT CAST(year(l_shipdate) AS INT) AS part_year,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS ndv_partkey,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS ndv_suppkey,
           CAST(min(l_quantity) AS BIGINT) AS min_qty,
           CAST(max(l_quantity) AS BIGINT) AS max_qty,
           round(min(l_extendedprice), 2) + 0.0 AS min_price,
           round(max(l_extendedprice), 2) + 0.0 AS max_price,
           CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS null_returnflags
    FROM lineitem GROUP BY year(l_shipdate)
    """,
    category="source",
)
def catalog_compute_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style per-partition column statistics — the manifest every
    cost-based optimizer and table format (Iceberg/Delta column bounds,
    Hive CBO stats) maintains so scans can prune and joins can size: per
    ship-year, row count, exact NDVs of the join keys, min/max bounds of
    the predicate columns, null counts. The companion to
    `catalog_msck_repair` (partitions) and `layout_zorder_pruning`
    (clustering): repair discovers, stats describe, layout exploits.

    Scale shape: ONE map-side-combined aggregate per partition; the two
    exact NDVs are the only expand — Spark plans them as a single expand
    + two-phase distinct aggregate, still one shuffle keyed on the
    partition column. On a real manifest run the same plan appends to the
    catalog instead of returning rows."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.year("l_shipdate").cast("int").alias("part_year")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("l_partkey").cast("long").alias("ndv_partkey"),
        F.countDistinct("l_suppkey").cast("long").alias("ndv_suppkey"),
        F.min("l_quantity").cast("long").alias("min_qty"),
        F.max("l_quantity").cast("long").alias("max_qty"),
        (F.round(F.min("l_extendedprice"), 2) + F.lit(0.0)).alias("min_price"),
        (F.round(F.max("l_extendedprice"), 2) + F.lit(0.0)).alias("max_price"),
        F.sum(F.col("l_returnflag").isNull().cast("int")).cast("long").alias(
            "null_returnflags"
        ),
    )
