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


def _median_of(arr: str, dialect: str) -> str:
    """Exact median of a small array, identical arithmetic in both
    dialects: sort, pick middle (odd) or mean of the two middles (even —
    one exact-rounded double op). 1-based element access in both."""
    if dialect == "spark":
        s, n, el = f"array_sort({arr})", f"size({arr})", "element_at"
    else:
        s, n, el = f"list_sort({arr})", f"len({arr})", None
    if el:  # spark: element_at needs an INT index; div yields BIGINT
        return (
            f"CASE WHEN {n} % 2 = 1 THEN {el}({s}, cast(({n} + 1) div 2 as int)) "
            f"ELSE ({el}({s}, cast({n} div 2 as int)) "
            f"+ {el}({s}, cast({n} div 2 + 1 as int))) / 2.0 END"
        )
    return (
        f"CASE WHEN {n} % 2 = 1 THEN {s}[({n} + 1) // 2] "
        f"ELSE ({s}[{n} // 2] + {s}[{n} // 2 + 1]) / 2.0 END"
    )


_HAMPEL_K = 3.0 * 1.4826  # 3 sigma-equivalents of MAD


@query(
    "clean_hampel_filter",
    oracle=f"""
    WITH fr AS (
      SELECT event_id, user_id, value,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS arr
      FROM events
    ), med AS (
      SELECT event_id, user_id, value, arr,
             ({_median_of('arr', 'duckdb')}) AS rmed
      FROM fr
    ), mad AS (
      SELECT event_id, user_id, value, rmed,
             ({_median_of('list_transform(arr, v -> abs(v - rmed))', 'duckdb')}) AS rmad
      FROM med
    )
    SELECT event_id,
           round(value, 4) + 0.0 AS value,
           round(rmed, 4) + 0.0 AS rolling_median,
           abs(value - rmed) > {_HAMPEL_K} * rmad AS is_outlier,
           round(CASE WHEN abs(value - rmed) > {_HAMPEL_K} * rmad
                      THEN rmed ELSE value END, 4) + 0.0 AS cleaned
    FROM mad
    """,
    category="cleaning",
)
def clean_hampel_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel filter — the robust de-spiking cleaner the reference's
    z-score outlier pass cannot be (one wild spike inflates a stddev; it
    barely moves a median): each point is compared to the median of its
    ±5-row neighborhood, flagged when it deviates by more than 3
    MAD-sigmas, and replaced by that median. Both the rolling median and
    the MAD are EXACT small-array sorts inside one window frame collect —
    no percentile approximation, no second shuffle (the frame list, the
    median, and the MAD all ride the single user_id window partitioning).
    Sort-pick arithmetic is engine-identical, so flags replay exactly."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-5, 5)
    )
    fr = ev.select(
        "event_id", "value", F.collect_list("value").over(w).alias("arr")
    )
    med = fr.withColumn("rmed", F.expr(_median_of("arr", "spark")))
    mad = med.withColumn(
        "rmad",
        F.expr(_median_of("transform(arr, v -> abs(v - rmed))", "spark")),
    )
    flag = F.abs(F.col("value") - F.col("rmed")) > _HAMPEL_K * F.col("rmad")
    return mad.select(
        "event_id",
        (F.round("value", 4) + F.lit(0.0)).alias("value"),
        (F.round("rmed", 4) + F.lit(0.0)).alias("rolling_median"),
        flag.alias("is_outlier"),
        (
            F.round(F.when(flag, F.col("rmed")).otherwise(F.col("value")), 4)
            + F.lit(0.0)
        ).alias("cleaned"),
    )
