"""Data-cleaning queries: MAD outliers, winsorization, stratified sample."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_aws_spark.operators import cleaning
from etl_aws_spark.registry import load, query
from etl_aws_spark.suite._util import rnd


@query(
    "filter_outliers_mad",
    oracle="""
    WITH med AS (
      SELECT user_id, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY user_id
    ), mad AS (
      SELECT e.user_id, quantile_cont(abs(e.value - m.med), 0.5) AS mad
      FROM events e JOIN med m USING (user_id) GROUP BY e.user_id
    )
    SELECT e.event_id, e.user_id, e.value,
           CASE WHEN d.mad = 0.0 THEN CAST(abs(e.value - m.med) > 0.0 AS INT)
                ELSE CAST(abs(e.value - m.med) > 3.0 * d.mad AS INT) END AS is_outlier
    FROM events e JOIN med m USING (user_id) JOIN mad d USING (user_id)
    """,
    category="cleaning",
)
def filter_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-key outlier flag (|x−median| > 3·MAD) — z-scores break on
    the outliers they hunt; MAD doesn't."""
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
    out = cleaning.flag_outliers_mad(ev, "value", "user_id", k=3.0)
    return out.select("event_id", "user_id", "value", "is_outlier")


@query(
    "transform_winsorize",
    oracle="""
    WITH b AS (
      SELECT quantile_cont(l_extendedprice, 0.01) AS lo,
             quantile_cont(l_extendedprice, 0.99) AS hi
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber,
           round(least(greatest(l_extendedprice, lo), hi), 4) + 0.0 AS price_w
    FROM lineitem CROSS JOIN b
    WHERE l_orderkey % 5 = 0
    """,
    category="cleaning",
)
def transform_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorize to the exact [p1, p99] band — heavy-tail guard before
    scaling; one aggregate + pure clip arithmetic. Percentiles are fitted on
    the FULL table; the returned audit projection is a deterministic 1/5
    key-slice so the gate hashes 12k rows instead of 60k."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    out = cleaning.winsorize(li, ["l_extendedprice"])
    return out.filter(F.col("l_orderkey") % 5 == 0).select(
        "l_orderkey", "l_linenumber",
        rnd(F.col("l_extendedprice"), 4).alias("price_w"),
    )


@query(
    "sample_stratified_hash",
    oracle="""
    SELECT doc_id, lang FROM documents
    WHERE ('0x' || substr(md5(lang || ':' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 30
    """,
    category="cleaning",
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 30% per-language sample: selection is a pure function
    of (stratum, id) — reproducible across runs, engines, and partitionings
    (unlike df.sample), which is what a months-later 100 TB re-run needs."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    return cleaning.stratified_sample_hash(docs, "lang", "doc_id", fraction_pct=30)
