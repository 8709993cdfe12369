"""SURVEY §2.8 scalar-function queries (string / date / math / null).

Every expression is JVM-side (whole-stage codegen); no Python UDFs.
Derived integers are cast to BIGINT to match DuckDB's extraction types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_aws_spark import functions as fx
from etl_aws_spark.operators import windows as ow
from etl_aws_spark.registry import load, query
from etl_aws_spark.suite._util import rnd

_NULLIFY = "CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END"


def _nullified(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.withColumn(
        "value", F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(F.col("value"))
    )


@query(
    "str_lower_trim",
    oracle="""
    SELECT n_nationkey, lower(trim(concat('  ', upper(n_name), '  '))) AS key_norm FROM nation
    """,
    category="scalar",
)
def str_lower_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key normalization (`glue.py:131-132`), demonstrated on a dirtied key."""
    n = load(spark, sf_dir, "nation")
    dirty = F.concat(F.lit("  "), F.upper(F.col("n_name")), F.lit("  "))
    return n.select("n_nationkey", fx.normalize_key(dirty).alias("key_norm"))


@query(
    "str_lstrip",
    oracle="SELECT p_partkey, ltrim(concat('   ', p_brand)) AS brand_clean FROM part",
    category="scalar",
)
def str_lstrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading-whitespace strip (`eda.ipynb` cell 8 — the dimension CSV
    carries real leading spaces)."""
    p = load(spark, sf_dir, "part")
    return p.select("p_partkey", F.ltrim(F.concat(F.lit("   "), F.col("p_brand"))).alias("brand_clean"))


@query(
    "str_suffix_strip",
    oracle="""
    SELECT event_id, regexp_replace(concat(event_type, '.SA'), '\\.SA$', '') AS sym
    FROM events
    """,
    category="scalar",
)
def str_suffix_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exchange-suffix removal (`webscrapping.py:49` strips '.SA')."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id", fx.strip_suffix(F.concat(F.col("event_type"), F.lit(".SA")), ".SA").alias("sym")
    )


@query(
    "str_concat_date_parts",
    oracle="""
    SELECT event_id, concat(year(ts), '-', month(ts), '-', day(ts)) AS date_str FROM events
    """,
    category="scalar",
)
def str_concat_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'ano-mes-dia' string build (`glue.py:85`) — kept for parity; the
    engine's real path is make_date (see cast_to_date)."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.concat(
            F.year("ts").cast("string"), F.lit("-"),
            F.month("ts").cast("string"), F.lit("-"),
            F.dayofmonth("ts").cast("string"),
        ).alias("date_str"),
    )


@query(
    "cast_to_date",
    oracle="SELECT event_id, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS d FROM events",
    category="scalar",
)
def cast_to_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/timestamp -> date (`glue.py:86`). Output re-cast to timestamp
    purely for cross-engine hash stability of the date value."""
    ev = load(spark, sf_dir, "events")
    return ev.select("event_id", F.to_date("ts").cast("timestamp").alias("d"))


@query(
    "cast_bool_to_int",
    oracle="SELECT event_id, CAST(value > 100.0 AS INTEGER) AS is_high FROM events",
    category="scalar",
)
def cast_bool_to_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean flag -> int (`eda.ipynb` cell 14)."""
    ev = load(spark, sf_dir, "events")
    return ev.select("event_id", (F.col("value") > 100.0).cast("int").alias("is_high"))


@query(
    "date_dayofweek",
    oracle="SELECT event_id, CAST(isodow(ts) - 1 AS BIGINT) AS dow FROM events",
    category="scalar",
)
def date_dayofweek(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week, standardized 0=Monday (SURVEY §1.2: the reference mixes
    Spark's 1=Sunday and pandas' 0=Monday; the engine picks ISO-Monday)."""
    ev = load(spark, sf_dir, "events")
    return ev.select("event_id", fx.business_dayofweek("ts").cast("bigint").alias("dow"))


@query(
    "date_month",
    oracle="SELECT event_id, month(ts) AS m FROM events",
    category="scalar",
)
def date_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month extraction (`glue.py:174`)."""
    ev = load(spark, sf_dir, "events")
    return ev.select("event_id", F.month("ts").cast("bigint").alias("m"))


@query(
    "math_cyclic_encode",
    oracle="""
    SELECT event_id,
           round(sin(2 * pi() * CAST(isodow(ts) - 1 AS DOUBLE) / 7), 6) + 0.0 AS dow_sin,
           round(cos(2 * pi() * CAST(isodow(ts) - 1 AS DOUBLE) / 7), 6) + 0.0 AS dow_cos,
           round(sin(2 * pi() * CAST(month(ts) AS DOUBLE) / 12), 6) + 0.0 AS month_sin,
           round(cos(2 * pi() * CAST(month(ts) AS DOUBLE) / 12), 6) + 0.0 AS month_cos
    FROM events
    """,
    category="scalar",
)
def math_cyclic_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sin/cos cyclic calendar features (`glue.py:175-178`,
    `preprocessing.py:194-215`) — constant-folded pure expressions."""
    ev = load(spark, sf_dir, "events")
    dow_sin, dow_cos = fx.cyclic_encode(fx.business_dayofweek("ts"), 7, "dow")
    m_sin, m_cos = fx.cyclic_encode(F.month("ts"), 12, "month")
    return ev.select(
        "event_id",
        rnd(dow_sin, 6).alias("dow_sin"),
        rnd(dow_cos, 6).alias("dow_cos"),
        rnd(m_sin, 6).alias("month_sin"),
        rnd(m_cos, 6).alias("month_cos"),
    )


@query(
    "flag_holiday_lookup",
    oracle="""
    SELECT e.event_id,
           CAST(h.d IS NOT NULL AS INTEGER) AS is_holiday
    FROM events e
    LEFT JOIN (VALUES (DATE '2024-01-01'), (DATE '2024-01-15'), (DATE '2024-01-25')) h(d)
      ON CAST(e.ts AS DATE) = h.d
    """,
    category="scalar",
)
def flag_holiday_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holiday membership via a broadcast calendar-dimension join — replaces
    the reference's per-row python `holidays.BR()` lookup
    (`preprocessing.py:186-190`); a UDF would leave codegen for a set probe."""
    ev = load(spark, sf_dir, "events")
    holidays = spark.createDataFrame(
        [("2024-01-01",), ("2024-01-15",), ("2024-01-25",)], "d_str string"
    ).select(F.to_date("d_str").alias("d"))
    joined = ev.join(F.broadcast(holidays), F.to_date(ev.ts) == holidays.d, "left")
    return joined.select("event_id", F.col("d").isNotNull().cast("int").alias("is_holiday"))


@query(
    "null_fill_zero_subset",
    oracle=f"""
    SELECT event_id, coalesce(v.value, 0.0) AS value, v.event_type
    FROM (SELECT event_id, {_NULLIFY} AS value, event_type FROM events) v
    """,
    category="null",
)
def null_fill_zero_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-fill restricted to named columns (`glue.py:199-214` fills only
    the 9 engineered features; other columns keep their nulls)."""
    df = _nullified(spark, sf_dir).select("event_id", "value", "event_type")
    return df.fillna(0.0, subset=["value"])


@query(
    "null_ffill_group",
    oracle=f"""
    WITH n AS (SELECT event_id, user_id, ts, {_NULLIFY} AS value FROM events)
    SELECT event_id, user_id, ts,
           last_value(value IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill
    FROM n
    """,
    category="null",
)
def null_ffill_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key forward fill (`preprocessing.py:118-119,158-160`)."""
    df = _nullified(spark, sf_dir).select("event_id", "user_id", "ts", "value")
    w = ow.key_window("user_id", ["ts", "event_id"])
    return ow.forward_fill(df, "value", w, "value_ffill").drop("value")


@query(
    "null_bfill_group",
    oracle=f"""
    WITH n AS (SELECT event_id, user_id, ts, {_NULLIFY} AS value FROM events)
    SELECT event_id, user_id, ts,
           first_value(value IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS value_bfill
    FROM n
    """,
    category="null",
)
def null_bfill_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key backward fill (`preprocessing.py:161`)."""
    df = _nullified(spark, sf_dir).select("event_id", "user_id", "ts", "value")
    w = ow.key_window("user_id", ["ts", "event_id"])
    return ow.backward_fill(df, "value", w, "value_bfill").drop("value")


@query(
    "drop_na_rows",
    oracle=f"""
    SELECT event_id, user_id, v.value
    FROM (SELECT event_id, user_id, {_NULLIFY} AS value FROM events) v
    WHERE v.value IS NOT NULL
    """,
    category="null",
)
def drop_na_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop rows with any null (`train.py:40`)."""
    df = _nullified(spark, sf_dir).select("event_id", "user_id", "value")
    return df.na.drop()


@query(
    "scalar_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket
    FROM events
    """,
    category="scalar",
)
def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction from the JSON props column — the log-
    pipeline staple. ``from_json`` with a declared schema (not
    ``get_json_object`` string-probing) so the parse happens ONCE per row
    into a struct, Catalyst prunes unused fields, and the typed column
    participates in pushdown/codegen downstream."""
    ev = load(spark, sf_dir, "events")
    parsed = ev.withColumn("_p", F.from_json("props", "k BIGINT"))
    return parsed.select(
        "event_id",
        F.col("_p.k").alias("k"),
        (F.col("_p.k") % 10).alias("k_bucket"),
    )


@query(
    "agg_json_stats",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) + 0.0 AS avg_k
    FROM events GROUP BY event_type
    """,
    category="scalar",
)
def agg_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse-then-aggregate over the JSON payload: one from_json pass, hash
    aggregate on the typed field — the shape a 100 TB log rollup needs
    (parse cost scales with the scan, the shuffle carries only the typed
    aggregates)."""
    ev = load(spark, sf_dir, "events")
    parsed = ev.select("event_type", F.from_json("props", "k BIGINT").getField("k").alias("k"))
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").cast("bigint").alias("sum_k"),
        rnd(F.avg("k"), 4).alias("avg_k"),
    )
