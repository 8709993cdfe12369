"""SURVEY §2.4 aggregation queries.

Rounding: grouped double sums round to 2 decimals (magnitude ~1e8 at test
scale — fp accumulation error is far below 5e-3), means/stddevs to 4,
ratios/R² to 6. Mirrored exactly in the oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_aws_spark.operators import aggregates as agg
from etl_aws_spark.operators import windows as ow
from etl_aws_spark.registry import load, query
from etl_aws_spark.suite._util import rnd, rnd_nudged, rnd_nudged_rel

# deterministic null injection: the fixtures are null-free, so null-handling
# operators knock out value on event_id % 7 == 0 (same rule in the oracles)
_NULLIFY = "CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END"


def _nullified(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.withColumn(
        "value", F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(F.col("value"))
    )


@query(
    "agg_group_generic",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) + 0.0 AS sum_qty,
           round(sum(l_extendedprice), 2) + 0.0 AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) + 0.0 AS sum_disc_price,
           round(avg(l_quantity), 4) + 0.0 AS avg_qty,
           round(avg(l_discount), 6) + 0.0 AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    category="aggregate",
)
def agg_group_generic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic grouped aggregate (`preprocessing.py:33-46`), TPC-H-Q1-shaped:
    one hash aggregate, partial+final, map-side combine."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        rnd(F.sum("l_quantity"), 2).alias("sum_qty"),
        rnd(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
        rnd(F.avg("l_quantity"), 4).alias("avg_qty"),
        rnd(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "agg_group_nunique",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps
    FROM lineitem GROUP BY l_returnflag
    """,
    category="aggregate",
)
def agg_group_nunique(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count per group (`preprocessing.py:85-99`, `eda.ipynb` 18-20).
    Exact here; `nunique_per_group(approx=True)` is the 100 TB path."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@query(
    "agg_value_counts",
    oracle="SELECT event_type, count(*) AS count FROM events GROUP BY event_type",
    category="aggregate",
)
def agg_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency table (`eda.ipynb` cell 8)."""
    return agg.value_counts(load(spark, sf_dir, "events"), "event_type")


@query(
    "agg_global_mean_fill",
    oracle="""
    SELECT round(avg(value), 4) + 0.0 AS mean_value,
           round(avg(CAST(user_id AS DOUBLE)), 4) + 0.0 AS mean_user_id
    FROM events
    """,
    category="aggregate",
)
def agg_global_mean_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global column means, the imputation source (`preprocessing.py:164-168`)."""
    ev = load(spark, sf_dir, "events").withColumn("user_id", F.col("user_id").cast("double"))
    means = agg.global_means(ev, ["value", "user_id"])
    return means.select(
        rnd(F.col("mean_value"), 4).alias("mean_value"),
        rnd(F.col("mean_user_id"), 4).alias("mean_user_id"),
    )


@query(
    "null_fill_global_mean",
    oracle=f"""
    WITH n AS (SELECT event_id, {_NULLIFY} AS value FROM events),
         m AS (SELECT avg(value) AS gmean FROM n)
    SELECT event_id, round(coalesce(value, gmean), 4) + 0.0 AS value_filled
    FROM n CROSS JOIN m
    """,
    category="null",
)
def null_fill_global_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce(c, global mean) (`preprocessing.py:163-168`) — scalar agg
    broadcast-crossed, NOT an empty-frame window (which would funnel all
    rows through one partition)."""
    df = _nullified(spark, sf_dir).select("event_id", "value")
    filled = agg.fill_with_global_mean(df, "value", out="value_filled")
    return filled.select("event_id", rnd(F.col("value_filled"), 4).alias("value_filled"))


@query(
    "agg_describe_percentiles",
    oracle="""
    SELECT count(l_extendedprice) AS count,
           round(avg(l_extendedprice), 4) + 0.0 AS mean,
           round(stddev_samp(l_extendedprice), 4) + 0.0 AS std,
           round(min(l_extendedprice), 4) + 0.0 AS min,
           round(max(l_extendedprice), 4) + 0.0 AS max,
           round(quantile_cont(l_extendedprice, 0.10), 4) + 0.0 AS p10,
           round(quantile_cont(l_extendedprice, 0.25), 4) + 0.0 AS p25,
           round(quantile_cont(l_extendedprice, 0.50), 4) + 0.0 AS p50,
           round(quantile_cont(l_extendedprice, 0.75), 4) + 0.0 AS p75,
           round(quantile_cont(l_extendedprice, 0.95), 4) + 0.0 AS p95,
           round(quantile_cont(l_extendedprice, 0.99), 4) + 0.0 AS p99
    FROM lineitem
    """,
    category="aggregate",
)
def agg_describe_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """describe() with the reference's percentile list
    (`preprocessing.py:50-58`): exact interpolated percentiles (matches
    quantile_cont); `percentile_approx` is the 100 TB single-pass variant."""
    d = agg.describe_percentiles(load(spark, sf_dir, "lineitem"), "l_extendedprice")
    keep = [F.col("count")] + [
        rnd(F.col(c), 4).alias(c)
        for c in ["mean", "std", "min", "max", "p10", "p25", "p50", "p75", "p95", "p99"]
    ]
    return d.select(*keep)


@query(
    "agg_null_count",
    oracle=f"""
    SELECT count(*) FILTER (WHERE v.value IS NULL) AS nulls_value,
           count(*) FILTER (WHERE v.event_type IS NULL) AS nulls_event_type
    FROM (SELECT {_NULLIFY} AS value, event_type FROM events) v
    """,
    category="aggregate",
)
def agg_null_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column null counts in one pass (`eda.ipynb` cell 21)."""
    return agg.null_counts(_nullified(spark, sf_dir), ["value", "event_type"])


@query(
    "agg_dup_count",
    oracle="""
    SELECT (SELECT count(*) FROM lineitem)
         - (SELECT count(*) FROM (SELECT DISTINCT l_returnflag, l_linestatus, l_quantity FROM lineitem))
         AS dup_rows
    """,
    category="aggregate",
)
def agg_dup_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fully-duplicated row count over a projection (`eda.ipynb` cell 25)."""
    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus", "l_quantity")
    return agg.duplicate_row_count(li)


@query(
    "agg_row_count_checkpoint",
    oracle="""
    SELECT (SELECT count(*) FROM orders) AS raw_rows,
           (SELECT count(*) FROM orders WHERE o_orderstatus = 'F') AS filtered_rows,
           (SELECT count(*) FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey) AS joined_rows
    """,
    category="aggregate",
)
def agg_row_count_checkpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage row-count checkpoints (`glue.py:93-229` fires ≥8 count() jobs;
    the engine computes all three in one action — in pipelines the same
    numbers ride on `observe()`, see plans/refined.py)."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    raw = orders.agg(F.count(F.lit(1)).alias("raw_rows"))
    filt = orders.filter(F.col("o_orderstatus") == "F").agg(F.count(F.lit(1)).alias("filtered_rows"))
    joined = orders.join(customer, orders.o_custkey == customer.c_custkey).agg(
        F.count(F.lit(1)).alias("joined_rows")
    )
    return raw.crossJoin(filt).crossJoin(joined)


@query(
    "agg_regression_metrics",
    oracle="""
    WITH p AS (
      SELECT value AS y,
             lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS yhat
      FROM events
    ), f AS (SELECT y, yhat FROM p WHERE yhat IS NOT NULL)
    SELECT round(avg(abs(y - yhat)), 4) + 0.0 AS mae,
           round(sqrt(avg((y - yhat) * (y - yhat))), 4) + 0.0 AS rmse,
           round(1.0 - sum((y - yhat) * (y - yhat))
                     / (sum(y * y) - count(*) * avg(y) * avg(y)), 6) + 0.0 AS r2
    FROM f
    """,
    category="aggregate",
)
def agg_regression_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAE/RMSE/R² as one aggregate pass (`train.py:358-368`), on the
    naive-persistence validation frame (yhat = previous value)."""
    ev = load(spark, sf_dir, "events")
    w = ow.key_window("user_id", ["ts", "event_id"])
    pairs = ev.select(F.col("value").alias("y"), F.lag("value", 1).over(w).alias("yhat"))
    m = agg.regression_metrics(pairs, "y", "yhat")
    return m.select(
        rnd(F.col("mae"), 4).alias("mae"),
        rnd(F.col("rmse"), 4).alias("rmse"),
        rnd(F.col("r2"), 6).alias("r2"),
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT c_mktsegment,
           CASE WHEN GROUPING(c_nationkey) = 0 THEN CAST(c_nationkey AS INT) END
             AS c_nationkey,
           CAST(GROUPING(c_nationkey) AS INT) AS gid,
           count(DISTINCT c_custkey) AS n_cust,
           round(sum(c_acctbal), 2) + 0.0 AS sum_bal
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment, c_nationkey), (c_mktsegment))
    """,
    category="aggregate",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy rollup in ONE pass via GROUPING SETS — the rewrite of the
    reference's three separate groupby+merge rounds
    (`preprocessing.py:85-106`: tickers per (setor,industria), per setor).
    One shuffle instead of three jobs + two joins; `grouping()` tags the
    level. Mapping: c_mktsegment ≡ setor, c_nationkey ≡ industria,
    c_custkey ≡ ticker."""
    cust = load(spark, sf_dir, "customer")
    out = (
        cust.groupingSets(
            [["c_mktsegment", "c_nationkey"], ["c_mktsegment"]],
            "c_mktsegment",
            "c_nationkey",
        )
        .agg(
            F.grouping("c_nationkey").cast("int").alias("gid"),
            F.countDistinct("c_custkey").alias("n_cust"),
            rnd(F.sum("c_acctbal"), 2).alias("sum_bal"),
        )
    )
    return out.select(
        "c_mktsegment",
        F.col("c_nationkey").cast("int").alias("c_nationkey"),
        "gid",
        "n_cust",
        "sum_bal",
    )


@query(
    "agg_group_median",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) + 0.0 AS median_price,
           round(quantile_cont(l_extendedprice, 0.9), 4) + 0.0 AS p90_price
    FROM lineitem GROUP BY l_returnflag
    """,
    category="aggregate",
)
def agg_group_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group exact interpolated percentiles (grouped twin of
    agg_describe_percentiles). `percentile()` is exact/interpolated and
    matches quantile_cont; `percentile_approx` is the single-pass 100 TB
    variant (KLL sketch, mergeable)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        rnd(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("median_price"),
        rnd(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90_price"),
    )


@query(
    "agg_approx_distinct_error",
    # DuckDB cannot replay Spark's HLL++ sketch, so the oracle checks the
    # EXACT side exactly and the sketch side via its accuracy contract:
    # within_tol is TRUE iff the HLL estimate lands within 3x the requested
    # rsd of the exact count — deterministic for fixed data (the sketch is
    # deterministic), and the bound is generous (3 sigma) so the row is
    # stable across scale factors. Same harness pattern as the ANN recall
    # queries: accuracy measured, not assumed.
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_exact,
           TRUE AS within_tol
    FROM events GROUP BY event_type
    """,
    category="aggregate",
)
def agg_approx_distinct_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy harness for approx_count_distinct (HLL++): at 100 TB
    the exact distinct needs a full shuffle of the key universe, while the
    HLL sketch is a fixed-size, map-side-mergeable register set — this
    query quantifies what that buys, per group: the exact count plus
    whether the estimate honored 3x its requested 5% rsd."""
    ev = load(spark, sf_dir, "events")
    out = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact"),
        F.expr("approx_count_distinct(user_id, 0.05)").alias("_n_approx"),
    )
    rel_err = F.abs(F.col("_n_approx") - F.col("n_exact")) / F.col("n_exact")
    return out.select(
        "event_type", "n_exact", (rel_err <= 0.15).alias("within_tol")
    )


@query(
    "agg_approx_quantiles_error",
    # exact side: percentile() (linear interpolation) == quantile_cont.
    # sketch side: approx_percentile with accuracy A guarantees a result
    # whose RANK is within N/A of the target — checked by bracketing the
    # estimate between the exact quantiles at q +/- 2/A (margin 2x).
    oracle="""
    SELECT CAST(0.25 AS DOUBLE) AS q,
           round(quantile_cont(l_extendedprice, 0.25), 4) + 0.0 AS exact_val,
           TRUE AS within_tol
    FROM lineitem
    UNION ALL
    SELECT CAST(0.5 AS DOUBLE),
           round(quantile_cont(l_extendedprice, 0.5), 4) + 0.0, TRUE
    FROM lineitem
    UNION ALL
    SELECT CAST(0.75 AS DOUBLE),
           round(quantile_cont(l_extendedprice, 0.75), 4) + 0.0, TRUE
    FROM lineitem
    """,
    category="aggregate",
)
def agg_approx_quantiles_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy harness for approx_percentile (Greenwald-Khanna): the
    exact percentile is a full sort at scale; the GK sketch is one pass and
    mergeable. Emits the exact quantile (value-checked) and whether the
    estimate honored its rank guarantee: approx(q) must lie between the
    exact quantiles at q-2/A and q+2/A (A=1000, so rank slack 2N/1000)."""
    li = load(spark, sf_dir, "lineitem")
    qs = [0.25, 0.5, 0.75]
    acc, slack = 1000, 2.0 / 1000
    probe = sorted({round(v, 6) for q in qs for v in (q - slack, q, q + slack)})
    probe_sql = ", ".join(str(v) for v in probe)
    aggd = li.agg(
        F.expr(f"percentile(l_extendedprice, array({probe_sql}))").alias("ex"),
        F.expr(
            f"approx_percentile(l_extendedprice, array({', '.join(map(str, qs))}), {acc})"
        ).alias("ap"),
    )
    structs = []
    for i, q in enumerate(qs):
        lo = probe.index(round(q - slack, 6)) + 1
        mid = probe.index(round(q, 6)) + 1
        hi = probe.index(round(q + slack, 6)) + 1
        structs.append(
            F.struct(
                F.lit(q).cast("double").alias("q"),
                rnd(F.element_at("ex", mid), 4).alias("exact_val"),
                (
                    (F.element_at("ap", i + 1) >= F.element_at("ex", lo))
                    & (F.element_at("ap", i + 1) <= F.element_at("ex", hi))
                ).alias("within_tol"),
            )
        )
    return aggd.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


@query(
    "agg_skew_salted_sum",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(sum(value), 4) + 0.0 AS sum_value
    FROM events GROUP BY event_type
    """,
    category="aggregate",
)
def agg_skew_salted_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase skew-safe aggregate (operators/skew.py salted_count_sum):
    partial count/sum on (key, salt), final on key — each partition is
    bounded by |hot_key|/n_salts when one key dominates (event_type has
    ~5 values over the whole table: exactly the shape that defeats a
    single hash agg's combine at scale). The oracle is the plain GROUP BY:
    algebraic aggregates recombine exactly, which the value-hash proves.
    Deterministic hash salt (retry-stable), not F.rand."""
    from etl_aws_spark.operators import skew

    ev = load(spark, sf_dir, "events")
    out = skew.salted_count_sum(
        ev, keys=["event_type"], sum_cols=["value"], n_salts=16,
        deterministic_by="event_id",
    )
    return out.select(
        "event_type", "n", (F.round("sum_value", 4) + F.lit(0.0)).alias("sum_value")
    )


@query(
    "agg_histogram_fixed_bins",
    oracle="""
    SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bin,
           count(*) AS n,
           round(min(o_totalprice), 2) + 0.0 AS min_price,
           round(max(o_totalprice), 2) + 0.0 AS max_price,
           round(sum(o_totalprice), 2) + 0.0 AS sum_price
    FROM orders
    GROUP BY bin
    """,
    category="aggregate",
)
def agg_histogram_fixed_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (25k bins over order value): bin assignment is
    a pure projection, so the whole query is one map-side-combined hash
    aggregate — the cardinality-bounded distribution profile that replaces
    a driver-side ``value_counts`` on binned data. ~20 output rows
    regardless of input scale."""
    o = load(spark, sf_dir, "orders")
    out = (
        o.withColumn("bin", F.floor(F.col("o_totalprice") / 25000.0).cast("long"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            rnd(F.min("o_totalprice"), 2).alias("min_price"),
            rnd(F.max("o_totalprice"), 2).alias("max_price"),
            rnd(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )
    return out.select("bin", "n", "min_price", "max_price", "sum_price")


@query(
    "agg_mode_per_group",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, count(*) AS n
      FROM events GROUP BY user_id, event_type
    ), r AS (
      SELECT user_id, event_type, n,
             row_number() OVER (PARTITION BY user_id ORDER BY n DESC, event_type ASC) AS rn
      FROM c
    )
    SELECT user_id, event_type AS mode_event_type, n AS n_occurrences
    FROM r WHERE rn = 1
    """,
    category="aggregate",
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key modal value (most frequent event_type per user, ties broken
    lexicographically): count-then-rank — the distributed form of pandas
    ``groupby().agg(pd.Series.mode)``. The pre-aggregate bounds the window
    input to (keys × distinct values), so the rank pass is tiny no matter
    how many raw events feed it."""
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n").desc(), F.col("event_type").asc())
    out = counts.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return out.select(
        "user_id", F.col("event_type").alias("mode_event_type"), F.col("n").alias("n_occurrences")
    )


@query(
    "quality_constraint_report",
    oracle="""
    SELECT 'orders_pk_unique' AS chk,
           CAST(count(*) - count(DISTINCT o_orderkey) AS DOUBLE) AS metric,
           CAST(count(*) = count(DISTINCT o_orderkey) AS INT) AS passed
    FROM orders
    UNION ALL
    SELECT 'lineitem_fk_orphans',
           CAST(count(*) AS DOUBLE),
           CAST(count(*) = 0 AS INT)
    FROM lineitem l WHERE NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'orders_custkey_null_rate',
           round(CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) + 0.0,
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) = 0 AS INT)
    FROM orders
    UNION ALL
    SELECT 'lineitem_discount_in_range',
           CAST(sum(CASE WHEN l_discount < 0.0 OR l_discount > 0.5 THEN 1 ELSE 0 END)
                AS DOUBLE),
           CAST(sum(CASE WHEN l_discount < 0.0 OR l_discount > 0.5 THEN 1 ELSE 0 END) = 0
                AS INT)
    FROM lineitem
    UNION ALL
    SELECT 'orders_status_domain',
           CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END)
                AS DOUBLE),
           CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END) = 0
                AS INT)
    FROM orders
    """,
    category="aggregate",
)
def quality_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate (the Deequ pattern): one row per
    constraint — PK uniqueness, FK orphan count, null rate, numeric range,
    accepted domain — each computed as a single-pass aggregate, unioned
    into a (check, metric, passed) report. The formalization of the
    reference's ad-hoc `df.count()` / `isNull().sum()` sanity prints
    (`preprocessing.py` EDA cells); at scale each check is one
    map-side-combined scan and the report is bounded by the number of
    constraints, not the data."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")

    pk = o.agg(
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).cast("double").alias("metric"),
        (F.count(F.lit(1)) == F.countDistinct("o_orderkey")).cast("int").alias("passed"),
    ).select(F.lit("orders_pk_unique").alias("chk"), "metric", "passed")

    orphans = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"], "left_anti")
        .agg(F.count(F.lit(1)).cast("double").alias("metric"))
        .select(
            F.lit("lineitem_fk_orphans").alias("chk"),
            "metric",
            (F.col("metric") == 0).cast("int").alias("passed"),
        )
    )

    nulls = o.agg(
        rnd(
            F.sum(F.col("o_custkey").isNull().cast("int")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("metric"),
        (F.sum(F.col("o_custkey").isNull().cast("int")) == 0).cast("int").alias("passed"),
    ).select(F.lit("orders_custkey_null_rate").alias("chk"), "metric", "passed")

    rng = li.agg(
        F.sum(
            ((F.col("l_discount") < 0.0) | (F.col("l_discount") > 0.5)).cast("int")
        ).cast("double").alias("metric")
    ).select(
        F.lit("lineitem_discount_in_range").alias("chk"),
        "metric",
        (F.col("metric") == 0).cast("int").alias("passed"),
    )

    dom = o.agg(
        F.sum((~F.col("o_orderstatus").isin("O", "F", "P")).cast("int"))
        .cast("double")
        .alias("metric")
    ).select(
        F.lit("orders_status_domain").alias("chk"),
        "metric",
        (F.col("metric") == 0).cast("int").alias("passed"),
    )

    return pk.unionByName(orphans).unionByName(nulls).unionByName(rng).unionByName(dom)


@query(
    "agg_weighted_median",
    oracle="""
    WITH h AS (
      SELECT l_returnflag,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
      FROM lineitem GROUP BY 1, 2
    ), c AS (
      SELECT l_returnflag, cents,
             sum(w) OVER (PARTITION BY l_returnflag ORDER BY cents) AS cumw,
             sum(w) OVER (PARTITION BY l_returnflag) AS totw
      FROM h
    )
    SELECT l_returnflag,
           round(min(cents) / 100.0, 2) + 0.0 AS weighted_median_price,
           round(CAST(max(totw) AS DOUBLE), 2) + 0.0 AS total_weight
    FROM c WHERE 2 * cumw >= totw
    GROUP BY l_returnflag
    """,
    category="aggregate",
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag — the distributed
    weighted-percentile shape `percentile_approx` cannot weight, in the
    HISTOGRAM-CUMSUM formulation (the gini/ABC house pattern): exact
    BIGINT quantity weights collapse to a (flag, price-cents) histogram
    in ONE map-side-combined aggregate, the cumulative-weight window runs
    over the |distinct prices per flag| frame, and the median is the
    first price whose doubled block-end cum crosses the total (2·cum ≥
    tot — integer arithmetic, no float halving). Identical value to the
    row-level crossing (the first crossing row lies inside the first
    crossing price block), but the full fact table is never sorted —
    the r10 rewrite of the original per-row window, whose
    3-flag-partition sort was the measured 4.8× slope at 10× data
    (BASELINE.md r10 wave; a 3-reducer global sort at 100 TB)."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    h = (
        li.select(
            "l_returnflag",
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
            F.col("l_quantity").cast("long").alias("q"),
        )
        .groupBy("l_returnflag", "cents")
        .agg(F.sum("q").alias("w"))
    )
    wp = Window.partitionBy("l_returnflag")
    wc = wp.orderBy("cents")
    c = h.select(
        "l_returnflag", "cents",
        F.sum("w").over(wc).alias("cumw"),
        F.sum("w").over(wp).alias("totw"),
    )
    return (
        c.filter(2 * F.col("cumw") >= F.col("totw"))
        .groupBy("l_returnflag")
        .agg(
            rnd(F.min("cents") / 100.0, 2).alias("weighted_median_price"),
            rnd(F.max("totw").cast("double"), 2).alias("total_weight"),
        )
    )


def _cms_oracle() -> str:
    from etl_aws_spark.operators import sketch

    return sketch.count_min_oracle_sql("events", "user_id", depth=4, width=32)


@query("sketch_count_min_freq", oracle=_cms_oracle(), category="aggregate")
def sketch_count_min_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimates for every user (150 keys into
    a 4x32 grid — collisions by design) with the exact count and per-key
    overcount alongside: the CMS accuracy harness, completing the sketch
    trio (HLL distinct, GK quantiles, CMS frequencies). Estimates can
    never undercount; the md5-derived bucket family replays exactly in
    the oracle, so every estimate is value-checked, not bounds-checked."""
    from etl_aws_spark.operators import sketch

    ev = load(spark, sf_dir, "events")
    return sketch.count_min_estimates(ev, "user_id", depth=4, width=32)


@query(
    "agg_time_decay_score",
    oracle="""
    WITH ref AS (
      SELECT max(epoch_us(ts)) AS t_ref FROM events
    ), w AS (
      SELECT user_id, value,
             ((r.t_ref - epoch_us(ts)) // 604800000000) AS k
      FROM events CROSS JOIN ref r
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value * CASE WHEN k > 50 THEN 0.0
                        ELSE 1.0 / CAST((1::BIGINT << k) AS DOUBLE) END)
                 + sign(sum(value * CASE WHEN k > 50 THEN 0.0
                        ELSE 1.0 / CAST((1::BIGINT << k) AS DOUBLE) END)) * 1e-9, 4)
             + 0.0 AS decayed_score,
           CAST(min(k) AS BIGINT) AS weeks_since_last
    FROM w GROUP BY user_id
    """,
    category="aggregate",
)
def agg_time_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted engagement score — the feature-store staple: each
    event contributes value · 2^-(weeks since corpus end), a one-week
    half-life. The decay weight is a POWER OF TWO with an integer exponent
    (shiftleft on exact microsecond arithmetic), so it is bit-identical
    across engines — no transcendental pow() in the hash path (exponents
    beyond 50 clamp to zero weight, far past double precision anyway).
    t_ref is a 1-row broadcast; the corpus aggregates in one narrow
    (user_id) shuffle."""
    from etl_aws_spark.operators.temporal_joins import _epoch_micros

    ev = load(spark, sf_dir, "events")
    ref = ev.agg(F.max(_epoch_micros("ts")).alias("t_ref"))
    w = ev.join(F.broadcast(ref)).select(
        "user_id",
        "value",
        ((F.col("t_ref") - _epoch_micros("ts")) / F.lit(1)).cast("long").alias("_us"),
    ).select(
        "user_id", "value", F.expr("_us div 604800000000").alias("k")
    )
    weight = F.when(F.col("k") > 50, F.lit(0.0)).otherwise(
        F.lit(1.0) / F.expr("cast(shiftleft(cast(1 as bigint), cast(k as int)) as double)")
    )
    s = F.sum(F.col("value") * weight)
    # each product is an EXACT power-of-two scaling, but partial-agg
    # summation ORDER still differs across engines by ~1e-12 — and decimal
    # -structured inputs land sums exactly on 4-digit half-boundaries, so
    # one unnudged rounding flips (the SCALE.md §8 class). The 1e-9 nudge
    # (>> order jitter, << data resolution) makes both engines round the
    # same way.
    return w.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.round(s + F.signum(s) * F.lit(1e-9), 4) + F.lit(0.0)).alias("decayed_score"),
        F.min("k").cast("long").alias("weeks_since_last"),
    )


@query(
    "agg_hdr_log_histogram_percentiles",
    oracle="""
    WITH cents AS (
      SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c FROM orders
    ), hist AS (
      SELECT length(bin(c)) AS bucket, count(*) AS n FROM cents GROUP BY 1
    ), cum AS (
      SELECT bucket, n,
             sum(n) OVER (ORDER BY bucket) AS cum_n,
             sum(n) OVER () AS total
      FROM hist
    ), pcts AS (
      SELECT unnest([0.5, 0.9, 0.95, 0.99]) AS p
    ), hit AS (
      SELECT p.p, min(c.bucket) AS bucket
      FROM pcts p JOIN cum c ON c.cum_n >= p.p * c.total
      GROUP BY p.p
    )
    SELECT h.p,
           CAST(h.bucket AS INT) AS bucket,
           round((1::BIGINT << (h.bucket - 1)) / 100.0, 2) + 0.0 AS lo_value,
           round(((1::BIGINT << h.bucket) - 1) / 100.0, 2) + 0.0 AS hi_value,
           CAST(c.cum_n AS BIGINT) AS cum_count,
           CAST(c.total AS BIGINT) AS total
    FROM hit h JOIN cum c ON h.bucket = c.bucket
    """,
    category="aggregate",
)
def agg_hdr_log_histogram_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HdrHistogram-style percentiles: order totals land in log2 buckets
    of exact integer cents (bucket = bit length — no transcendental log),
    and p50/p90/p95/p99 are read off the cumulative histogram as bucket
    bounds. The ops-latency percentile machine: the histogram is ~27
    mergeable integer cells regardless of corpus size (the map-side state
    a billion-row latency pipeline keeps per partition), unlike an exact
    percentile's full sort. Bit arithmetic replays exactly; the accuracy
    trade (bucket-width resolution) is explicit in the lo/hi bounds."""
    ord_ = load(spark, sf_dir, "orders")
    cents = ord_.select(
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("c")
    )
    hist = cents.select(F.length(F.bin("c")).alias("bucket")).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    from pyspark.sql import Window

    cum = hist.select(
        "bucket",
        "n",
        F.sum("n").over(Window.orderBy("bucket")).alias("cum_n"),
        F.sum("n").over(Window.partitionBy()).alias("total"),
    )
    pcts = spark.createDataFrame([(0.5,), (0.9,), (0.95,), (0.99,)], "p double")
    hit = (
        pcts.join(cum, F.col("cum_n") >= F.col("p") * F.col("total"))
        .groupBy("p")
        .agg(F.min("bucket").alias("bucket"))
    )
    return hit.join(cum, "bucket").select(
        "p",
        F.col("bucket").cast("int").alias("bucket"),
        (
            F.round(F.expr("shiftleft(cast(1 as bigint), bucket - 1)") / 100.0, 2)
            + F.lit(0.0)
        ).alias("lo_value"),
        (
            F.round((F.expr("shiftleft(cast(1 as bigint), bucket)") - 1) / 100.0, 2)
            + F.lit(0.0)
        ).alias("hi_value"),
        F.col("cum_n").cast("long").alias("cum_count"),
        F.col("total").cast("long").alias("total"),
    )


@query(
    "agg_gini_concentration",
    oracle="""
    WITH spend AS (
      SELECT c.c_mktsegment, o.o_custkey, sum(o.o_totalprice) AS x
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ), ranked AS (
      SELECT c_mktsegment, x,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY x, o_custkey) AS i
      FROM spend
    ), g AS (
      SELECT c_mktsegment,
             count(*) AS n_customers,
             (2.0 * sum(i * x) - (count(*) + 1) * sum(x))
               / (count(*) * sum(x)) AS gini
      FROM ranked GROUP BY c_mktsegment
    )
    SELECT c_mktsegment,
           CAST(n_customers AS BIGINT) AS n_customers,
           round(gini + sign(gini) * 1e-9, 6) + 0.0 AS gini
    FROM g
    """,
    category="aggregate",
)
def agg_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration Gini coefficient per market segment — the
    inequality measure behind 'top-1% of customers' dashboards, computed
    EXACTLY from the sorted-rank formula G = (2Σi·xᵢ − (n+1)Σx)/(nΣx)
    (tie-invariant: permuting equal spends leaves Σi·xᵢ unchanged, so the
    custkey tie-break is deterministic without affecting the value). One
    narrow (segment, customer) aggregate, one rank window per segment,
    one 5-row reduce; the fact table is scanned once."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    spend = (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment", "o_custkey")
        .agg(F.sum("o_totalprice").alias("x"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy("x", "o_custkey")
    ranked = spend.withColumn("i", F.row_number().over(w))
    n = F.count(F.lit(1))
    gini = (2.0 * F.sum(F.col("i") * F.col("x")) - (n + 1) * F.sum("x")) / (
        n * F.sum("x")
    )
    return ranked.groupBy("c_mktsegment").agg(
        n.cast("long").alias("n_customers"),
        rnd_nudged(gini, 6).alias("gini"),
    )


@query(
    "agg_bitmap_distinct_users",
    oracle="""
    WITH seg AS (
      SELECT event_type, user_id // 62 AS bucket,
             bit_or(1::BIGINT << CAST(user_id % 62 AS INT)) AS mask
      FROM events GROUP BY event_type, user_id // 62
    )
    SELECT event_type,
           CAST(sum(bit_count(mask)) AS BIGINT) AS n_distinct_users,
           CAST(count(*) AS BIGINT) AS n_segments
    FROM seg GROUP BY event_type
    """,
    category="aggregate",
)
def agg_bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bitmap segments — the roaring-bitmap
    technique (Druid/ClickHouse/Kylin) expressed relationally: user ids
    pack into 62-bit segments (bucket = id div 62, bit = id mod 62 —
    62 keeps every shift strictly inside the signed-int64 positive
    range, which DuckDB enforces), a
    `bit_or` aggregate builds each segment mask, and popcounts sum to
    the exact distinct count. Why it matters at 100 TB: the bitmap
    segments are MERGEABLE state — partial masks combine map-side and
    across days/partitions with plain OR, so incremental exact distincts
    cost O(id-space/64) longs instead of a re-scan (where
    `approx_count_distinct` trades exactness and `countDistinct`
    re-shuffles raw ids). Cross-checked by construction: popcount-of-OR
    is exact, not approximate."""
    ev = load(spark, sf_dir, "events")
    seg = ev.groupBy(
        "event_type", (F.col("user_id") / 62).cast("long").alias("bucket")
    ).agg(
        F.bit_or(
            F.expr("shiftleft(cast(1 as bigint), cast(user_id % 62 as int))")
        ).alias("mask")
    )
    return seg.groupBy("event_type").agg(
        F.sum(F.bit_count("mask")).cast("long").alias("n_distinct_users"),
        F.count(F.lit(1)).cast("long").alias("n_segments"),
    )


@query(
    "agg_seasonal_index_monthly",
    oracle="""
    WITH m AS (
      SELECT month(o_orderdate) AS mon,
             sum(o_totalprice) AS rev,
             count(*) AS n
      FROM orders GROUP BY month(o_orderdate)
    ), tot AS (
      SELECT sum(rev) / sum(n) AS overall_avg FROM m
    )
    SELECT CAST(mon AS INT) AS mon,
           CAST(n AS BIGINT) AS n_orders,
           round(rev, 2) + 0.0 AS revenue,
           round((rev / n) / tot.overall_avg, 6) + 0.0 AS seasonal_index
    FROM m CROSS JOIN tot
    """,
    category="aggregate",
)
def agg_seasonal_index_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly seasonal index (avg order value per month ÷ overall avg) —
    the demand-planning normalizer behind deseasonalized forecasts and
    'is December really bigger' questions. One 12-cell aggregate plus a
    1-row broadcast of the overall mean; the index is a ratio of two
    exact-sum-derived means, so a single rounding at the end suffices."""
    orders = load(spark, sf_dir, "orders")
    m = orders.groupBy(F.month("o_orderdate").alias("mon")).agg(
        F.sum("o_totalprice").alias("rev"), F.count(F.lit(1)).alias("n")
    )
    tot = m.agg((F.sum("rev") / F.sum("n")).alias("overall_avg"))
    return m.crossJoin(F.broadcast(tot)).select(
        F.col("mon").cast("int").alias("mon"),
        F.col("n").cast("long").alias("n_orders"),
        (F.round(F.col("rev"), 2) + F.lit(0.0)).alias("revenue"),
        (
            F.round((F.col("rev") / F.col("n")) / F.col("overall_avg"), 6)
            + F.lit(0.0)
        ).alias("seasonal_index"),
    )


_BOOT_B = 20  # deterministic half-subsample replicates


@query(
    "stat_bootstrap_ci_subsample",
    # replicate b keeps rows where md5(id:b) lands in the lower half of
    # the 60-bit hash space — a deterministic ~n/2 subsample per b; the
    # replicate means' order statistics give the CI, RNG-free
    oracle=f"""
    WITH reps AS (
      SELECT b.b,
             avg(value) AS m
      FROM events
      CROSS JOIN (SELECT unnest(generate_series(1, {_BOOT_B})) AS b) b
      WHERE event_type = 'purchase'
        AND ('0x' || substr(md5(concat('bs', CAST(b.b AS VARCHAR), ':',
                                        CAST(event_id AS VARCHAR))), 1, 15))::BIGINT
            < 576460752303423488
      GROUP BY b.b
    ), ranked AS (
      SELECT m, row_number() OVER (ORDER BY m) AS rk FROM reps
    )
    SELECT CAST({_BOOT_B} AS BIGINT) AS n_replicates,
           round((SELECT avg(value) FROM events WHERE event_type = 'purchase'),
                 4) + 0.0 AS point_estimate,
           round((SELECT m FROM ranked WHERE rk = 2), 4) + 0.0 AS ci_low,
           round((SELECT m FROM ranked WHERE rk = {_BOOT_B} - 1), 4) + 0.0
             AS ci_high
    """,
    category="aggregate",
)
def stat_bootstrap_ci_subsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resampling confidence interval WITHOUT an RNG: {_BOOT_B} half-
    subsample replicates, each membership decided by an md5 hash of
    (replicate, row-id) — deterministic across engines, runs, and
    partitionings, which is what makes a distributed bootstrap
    REPRODUCIBLE (seeded per-partition RNGs are not, once partitioning
    changes). The replicate means' 2nd/19th order statistics bound the
    subsampling CI for the mean purchase value. Execution is ONE
    conditional pass: the replicate dimension is a {_BOOT_B}-row
    broadcast, membership is a per-(row, b) hash test, and everything
    reduces map-side — the corpus is scanned once, never materialized
    ×B. (Half-subsampling, not with-replacement bootstrap — the
    deterministic-hash form of m-out-of-n; CI widths differ from the
    classic bootstrap by the known √(m/n) factor.)"""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    reps_dim = spark.range(1, _BOOT_B + 1).select(F.col("id").alias("b"))
    h = (
        "cast(conv(substr(md5(concat('bs', cast(b as string), ':', "
        "cast(event_id as string))), 1, 15), 16, 10) as bigint)"
    )
    reps = (
        ev.crossJoin(F.broadcast(reps_dim))
        .filter(F.expr(h) < F.lit(576460752303423488))
        .groupBy("b")
        .agg(F.avg("value").alias("m"))
    )
    from pyspark.sql import Window

    ranked = reps.withColumn("rk", F.row_number().over(Window.orderBy("m")))
    point = ev.agg((F.round(F.avg("value"), 4) + F.lit(0.0)).alias("point_estimate"))
    lo = ranked.filter(F.col("rk") == 2).select(
        (F.round(F.col("m"), 4) + F.lit(0.0)).alias("ci_low")
    )
    hi = ranked.filter(F.col("rk") == _BOOT_B - 1).select(
        (F.round(F.col("m"), 4) + F.lit(0.0)).alias("ci_high")
    )
    return (
        spark.range(1)
        .select(F.lit(_BOOT_B).cast("long").alias("n_replicates"))
        .crossJoin(F.broadcast(point))
        .crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
    )


# Benford expected first-digit shares log10(1+1/d), pre-computed to 10
# decimals so NO transcendental runs in either engine's hash path
_BENFORD = (
    0.3010299957, 0.1760912591, 0.1249387366, 0.0969100130, 0.0791812460,
    0.0669467896, 0.0579919470, 0.0511525224, 0.0457574906,
)


@query(
    "stat_benford_first_digit",
    oracle=f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS INT) AS d
      FROM orders WHERE o_totalprice >= 1
    ), cells AS (
      SELECT d, count(*) AS n FROM digits GROUP BY d
    ), tot AS (
      SELECT CAST(sum(n) AS DOUBLE) AS t FROM cells
    ), exp AS (
      SELECT unnest(generate_series(1, 9)) AS d,
             unnest([{', '.join(repr(v) for v in _BENFORD)}]) AS p
    )
    SELECT CAST(e.d AS INT) AS first_digit,
           CAST(coalesce(c.n, 0) AS BIGINT) AS n,
           round(coalesce(c.n, 0) / tot.t, 6) + 0.0 AS observed_share,
           round(e.p, 6) + 0.0 AS benford_share,
           round(power(coalesce(c.n, 0) - e.p * tot.t, 2) / (e.p * tot.t), 6)
             + 0.0 AS chi2_term
    FROM exp e LEFT JOIN cells c ON e.d = c.d CROSS JOIN tot
    """,
    category="aggregate",
)
def stat_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the forensic
    screen for fabricated or manipulated amounts (natural multiplicative
    data follows log10(1+1/d); fabricated numbers rarely do). First
    digits come from integer truncation + string head (no logs at
    runtime — the expected shares are pre-computed literals), the digit
    histogram is a 9-cell aggregate, and per-digit chi² terms quantify
    the deviation. The fixture's uniform-ish prices will NOT follow
    Benford — which is exactly what the audit should report for
    synthetic data; the machinery, not the verdict, is the product."""
    orders = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digits = orders.select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        ).cast("int").alias("d")
    )
    cells = digits.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    tot = cells.agg(F.sum("n").cast("double").alias("t"))
    exp = spark.createDataFrame(
        [(d + 1, p) for d, p in enumerate(_BENFORD)], "d int, p double"
    )
    j = exp.join(cells, "d", "left").crossJoin(F.broadcast(tot))
    n = F.coalesce("n", F.lit(0))
    return j.select(
        F.col("d").alias("first_digit"),
        n.cast("long").alias("n"),
        (F.round(n / F.col("t"), 6) + F.lit(0.0)).alias("observed_share"),
        (F.round(F.col("p"), 6) + F.lit(0.0)).alias("benford_share"),
        (
            F.round(
                F.pow(n - F.col("p") * F.col("t"), 2) / (F.col("p") * F.col("t")), 6
            )
            + F.lit(0.0)
        ).alias("chi2_term"),
    )


# ---------------------------------------------------------------------------
# HyperLogLog from scratch (p=8, m=256 registers) — the canonical mergeable
# distinct-count sketch, built declaratively so Spark and the DuckDB oracle
# compute bit-identical state from the shared md5-based hash60. Completes the
# sketch family next to the exact bitmap (`agg_bitmap_distinct_users`), the
# count-min sketch (`streaming_sketch_count_min`) and approx quantiles.
#
# Determinism: every register is an integer (max of leading-zero ranks); the
# harmonic-mean denominator Σ 2^-M_j is computed in FIXED POINT as
# Σ 2^(50-M_j) int64 (max 256·2^50 = 2^58, no overflow, no float summation
# order), and the float estimate is one shared-literal expression — the
# e-notation literals force DOUBLE parsing in BOTH engines (plain `0.7213`
# is DECIMAL in each with different division rules; measured 5th-decimal
# divergence). The ln() in the small-range branch is the one transcendental;
# rnd(4) bridges it (see determinism notes in SCALE.md §8).

from etl_aws_spark.operators.sketch import (  # noqa: E402
    hll_est_expr,
    hll_fold,
    hll_hash_expr,
    hll_registers,
    hll_rho_expr,
)

_HLL_EST = hll_est_expr(p=8)


def _hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, j, m_reg) HLL register rows — the mergeable state."""
    return hll_registers(load(spark, sf_dir, "events"), "user_id", ["event_type"], p=8)


def _hll_oracle_regs(group: str = "event_type", alias: str | None = None) -> str:
    from etl_aws_spark.text import _dialect as D

    out = alias or group
    return f"""
      hashed AS (SELECT {group} AS {out}, {D.hash60(hll_hash_expr("user_id"), D.DUCK)} AS h FROM events),
      reg AS (
        SELECT {out}, h % 256 AS j, max({hll_rho_expr(D.DUCK, 8)}) AS m_reg
        FROM hashed GROUP BY {out}, h % 256
      )"""


@query(
    "agg_hll_distinct_users",
    oracle=f"""
    WITH {_hll_oracle_regs()},
    sk AS (
      SELECT event_type, count(*) AS n_hit,
             sum((1::BIGINT << CAST(50 - m_reg AS INT))) AS s_obs
      FROM reg GROUP BY event_type
    ),
    fx AS (
      SELECT event_type, n_hit, 256 - n_hit AS v_zero,
             s_obs + (256 - n_hit) * 1125899906842624 AS s_fixed
      FROM sk
    ),
    est AS (SELECT event_type, n_hit, v_zero, {_HLL_EST} AS est FROM fx),
    ex AS (
      SELECT event_type, count(DISTINCT user_id) AS exact_distinct
      FROM events GROUP BY event_type
    )
    SELECT est.event_type,
           CAST(n_hit AS INT) AS n_registers_hit,
           CAST(v_zero AS INT) AS zero_registers,
           round(est, 4) + 0.0 AS hll_estimate,
           CAST(exact_distinct AS BIGINT) AS exact_distinct,
           round(100.0e0 * (est - exact_distinct) / exact_distinct, 4) + 0.0
             AS rel_err_pct
    FROM est JOIN ex ON est.event_type = ex.event_type
    """,
    category="aggregate",
)
def agg_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct users per event type, from scratch (p=8, m=256),
    alongside the exact count and the measured relative error — accuracy
    measured, not assumed (the estimate lands inside HLL's theoretical
    1.04/√256 ≈ 6.5% band on both fixture regimes: the sf0.01 corpus
    exercises the linear-counting branch, sf0.1 the raw harmonic branch).

    Why it matters at 100 TB: the register table IS the aggregation state —
    m=256 ints per group regardless of corpus size, mergeable across
    partitions/days with plain max, so distinct-user reporting over a
    petabyte event log costs one narrow groupBy plus O(m) per group,
    where exact distinct re-shuffles every raw id (`agg_bitmap_distinct_
    users` is the exact-but-id-space-bound alternative). Plan: two narrow
    hash aggregates (register build, sketch fold) + one 5-row self-join
    against the exact branch."""
    est = hll_fold(_hll_registers(spark, sf_dir), ["event_type"], p=8)
    exact = (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_distinct"))
    )
    return est.join(exact, "event_type").select(
        "event_type",
        F.col("n_hit").cast("int").alias("n_registers_hit"),
        F.col("v_zero").cast("int").alias("zero_registers"),
        rnd(F.col("est"), 4).alias("hll_estimate"),
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
        rnd(
            F.lit(100.0)
            * (F.col("est") - F.col("exact_distinct"))
            / F.col("exact_distinct"),
            4,
        ).alias("rel_err_pct"),
    )


@query(
    "agg_hll_union_sketch",
    oracle=f"""
    WITH {_hll_oracle_regs()},
    merged AS (SELECT j, max(m_reg) AS m_reg FROM reg GROUP BY j),
    sk AS (
      SELECT count(*) AS n_hit,
             sum((1::BIGINT << CAST(50 - m_reg AS INT))) AS s_obs
      FROM merged
    ),
    fx AS (
      SELECT n_hit, 256 - n_hit AS v_zero,
             s_obs + (256 - n_hit) * 1125899906842624 AS s_fixed
      FROM sk
    ),
    est AS (SELECT {_HLL_EST} AS est FROM fx),
    ex AS (
      SELECT count(DISTINCT user_id) AS exact_union,
             (SELECT sum(d) FROM (
                SELECT count(DISTINCT user_id) AS d FROM events
                GROUP BY event_type)) AS sum_exact_parts
      FROM events
    )
    SELECT round(est, 4) + 0.0 AS hll_union_estimate,
           CAST(exact_union AS BIGINT) AS exact_union,
           CAST(sum_exact_parts AS BIGINT) AS sum_exact_parts,
           round(cast(sum_exact_parts as double) / exact_union, 4) + 0.0
             AS overlap_factor,
           round(100.0e0 * (est - exact_union) / exact_union, 4) + 0.0
             AS rel_err_pct
    FROM est CROSS JOIN ex
    """,
    category="aggregate",
)
def agg_hll_union_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-union distinct count: the five per-event-type HLL sketches
    merge into one by register-wise max — the lossless union operation that
    makes HLL state reusable (count any union of pre-sketched segments
    without touching raw ids). The fixture's event types share one user
    universe, so the union estimate stays ≈ each part while the naive sum
    of per-type exacts is 5× — `overlap_factor` reports exactly that
    dedup headroom.

    Why it matters at 100 TB: pre-sketched daily/segment registers are
    O(m) each; any ad-hoc union (all of Q3, these 14 segments, …) folds
    them with max — no re-scan, no raw-id shuffle. The estimate and its
    measured error ride the same fixed-point + shared-literal bridge as
    `agg_hll_distinct_users`."""
    regs = _hll_registers(spark, sf_dir)
    merged = regs.groupBy("j").agg(F.max("m_reg").alias("m_reg"))
    est = hll_fold(merged, [], p=8).select("est")
    ev = load(spark, sf_dir, "events")
    exact_union = ev.agg(F.countDistinct("user_id").alias("exact_union"))
    parts = ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("d"))
    sum_parts = parts.agg(F.sum("d").alias("sum_exact_parts"))
    return (
        est.crossJoin(F.broadcast(exact_union))
        .crossJoin(F.broadcast(sum_parts))
        .select(
            rnd(F.col("est"), 4).alias("hll_union_estimate"),
            F.col("exact_union").cast("long").alias("exact_union"),
            F.col("sum_exact_parts").cast("long").alias("sum_exact_parts"),
            rnd(
                F.col("sum_exact_parts").cast("double") / F.col("exact_union"), 4
            ).alias("overlap_factor"),
            rnd(
                F.lit(100.0)
                * (F.col("est") - F.col("exact_union"))
                / F.col("exact_union"),
                4,
            ).alias("rel_err_pct"),
        )
    )


@query(
    "agg_hll_rolling_distinct",
    oracle=f"""
    WITH {_hll_oracle_regs(group="CAST(ts AS DATE)", alias="day")},
    days AS (SELECT DISTINCT CAST(ts AS DATE) AS rday FROM events),
    merged AS (
      SELECT d.rday, r.j, max(r.m_reg) AS m_reg
      FROM reg r JOIN days d ON d.rday BETWEEN r.day AND r.day + 6
      GROUP BY d.rday, r.j
    ),
    sk AS (
      SELECT rday, count(*) AS n_hit,
             sum((1::BIGINT << CAST(50 - m_reg AS INT))) AS s_obs
      FROM merged GROUP BY rday
    ),
    fx AS (
      SELECT rday, n_hit, 256 - n_hit AS v_zero,
             s_obs + (256 - n_hit) * 1125899906842624 AS s_fixed
      FROM sk
    ),
    est AS (SELECT rday, n_hit, v_zero, {_HLL_EST} AS est FROM fx),
    ex AS (
      SELECT d.rday, count(DISTINCT e.user_id) AS exact_distinct
      FROM (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events) e
      JOIN days d ON e.day BETWEEN d.rday - 6 AND d.rday
      GROUP BY d.rday
    )
    SELECT CAST(est.rday AS TIMESTAMP) AS day,
           CAST(est.n_hit AS INT) AS n_registers_hit,
           round(est.est, 4) + 0.0 AS hll_estimate,
           CAST(ex.exact_distinct AS BIGINT) AS exact_distinct,
           round(100.0e0 * (est.est - ex.exact_distinct) / ex.exact_distinct, 4)
             + 0.0 AS rel_err_pct
    FROM est JOIN ex ON est.rday = ex.rday
    """,
    category="aggregate",
)
def agg_hll_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day from PRE-SKETCHED daily HLL
    registers — the precompute-once / answer-any-range pattern that makes
    sketches pay on an append-only event log: each day's registers are
    built exactly once (one narrow aggregate over that day's partition),
    and any date range folds them with register-wise max. Here every day's
    sketch is fanned out to the ≤7 window ends it serves (a 7× explode of
    O(m)-sized state, NOT of raw events) and max-merged per window end;
    the exact trailing count re-scans raw ids for comparison, and the
    measured error stays inside HLL's 1.04/√256 band.

    Why it matters at 100 TB: the daily register table is m=256 rows per
    day regardless of event volume; a year of dailies is ~94k rows, and
    ANY rolling window, month, or ad-hoc range is a max-fold over them —
    no raw-id re-shuffle, no second scan of the log. The estimate rides
    the same fixed-point + shared-literal bridge as the HLL siblings."""
    ev = load(spark, sf_dir, "events")
    daily = hll_registers(
        ev.withColumn("day", F.col("ts").cast("date")), "user_id", ["day"], p=8
    )
    days = ev.select(F.col("ts").cast("date").alias("rday")).distinct()
    contrib = daily.select(
        F.explode(F.expr("sequence(day, date_add(day, 6))")).alias("rday"),
        "j",
        "m_reg",
    )
    merged = (
        contrib.join(F.broadcast(days), "rday")
        .groupBy("rday", "j")
        .agg(F.max("m_reg").alias("m_reg"))
    )
    est = hll_fold(merged, ["rday"], p=8)
    evd = ev.select(F.col("ts").cast("date").alias("day"), "user_id").distinct()
    exact = (
        evd.join(
            F.broadcast(days),
            (F.col("day") <= F.col("rday")) & (F.col("day") >= F.date_sub("rday", 6)),
        )
        .groupBy("rday")
        .agg(F.countDistinct("user_id").alias("exact_distinct"))
    )
    return (
        est.join(exact, "rday")
        .select(
            F.col("rday").cast("timestamp").alias("day"),
            F.col("n_hit").cast("int").alias("n_registers_hit"),
            rnd(F.col("est"), 4).alias("hll_estimate"),
            F.col("exact_distinct").cast("long").alias("exact_distinct"),
            rnd(
                F.lit(100.0)
                * (F.col("est") - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                4,
            ).alias("rel_err_pct"),
        )
    )


@query(
    "agg_hll_intersection_estimate",
    oracle=f"""
    WITH {_hll_oracle_regs()},
    types AS (SELECT DISTINCT event_type FROM events),
    prs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b
      FROM types a JOIN types b ON a.event_type < b.event_type
    ),
    psk AS (
      SELECT event_type, count(*) AS n_hit,
             sum((1::BIGINT << CAST(50 - m_reg AS INT))) AS s_obs
      FROM reg GROUP BY event_type
    ),
    pfx AS (
      SELECT event_type, n_hit, 256 - n_hit AS v_zero,
             s_obs + (256 - n_hit) * 1125899906842624 AS s_fixed
      FROM psk
    ),
    pest AS (SELECT event_type, {_HLL_EST} AS est FROM pfx),
    umerged AS (
      SELECT p.type_a, p.type_b, r.j, max(r.m_reg) AS m_reg
      FROM prs p JOIN reg r
        ON r.event_type = p.type_a OR r.event_type = p.type_b
      GROUP BY p.type_a, p.type_b, r.j
    ),
    usk AS (
      SELECT type_a, type_b, count(*) AS n_hit,
             sum((1::BIGINT << CAST(50 - m_reg AS INT))) AS s_obs
      FROM umerged GROUP BY type_a, type_b
    ),
    ufx AS (
      SELECT type_a, type_b, n_hit, 256 - n_hit AS v_zero,
             s_obs + (256 - n_hit) * 1125899906842624 AS s_fixed
      FROM usk
    ),
    uest AS (SELECT type_a, type_b, {_HLL_EST} AS est FROM ufx),
    tu AS (SELECT DISTINCT event_type, user_id FROM events),
    exact AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS exact_intersection
      FROM tu a JOIN tu b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
    )
    SELECT u.type_a, u.type_b,
           round(ea.est + eb.est - u.est, 4) + 0.0 AS hll_intersection_estimate,
           CAST(coalesce(x.exact_intersection, 0) AS BIGINT) AS exact_intersection,
           round(100.0e0 * (ea.est + eb.est - u.est
                            - coalesce(x.exact_intersection, 0))
                 / nullif(CAST(coalesce(x.exact_intersection, 0) AS DOUBLE), 0.0), 4)
             + 0.0 AS rel_err_pct
    FROM uest u
    JOIN pest ea ON ea.event_type = u.type_a
    JOIN pest eb ON eb.event_type = u.type_b
    LEFT JOIN exact x ON x.type_a = u.type_a AND x.type_b = u.type_b
    """,
    category="aggregate",
)
def agg_hll_intersection_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimation by HLL inclusion-exclusion: for every
    unordered pair of event types, |A∩B| ≈ est(A) + est(B) − est(A∪B),
    where the union estimate comes from the lossless register-wise max
    merge — the one set operation HLL supports natively. The exact
    intersection (distinct users present in BOTH types) rides along with
    the measured relative error, which is the honest part: intersection
    error compounds three estimates, so small overlaps carry much larger
    relative error than the 1.04/√m union band — measured, not assumed.

    Why it matters at 100 TB: pairwise audience overlap across N segments
    is N²/2 exact distinct-joins over raw ids, but only N pre-built O(m)
    sketches under inclusion-exclusion — the standard first-pass overlap
    matrix, with exact joins reserved for the pairs that matter."""
    ev = load(spark, sf_dir, "events")
    regs = _hll_registers(spark, sf_dir)
    per_type = hll_fold(regs, ["event_type"], p=8).select(
        "event_type", F.col("est").alias("_e")
    )
    types = ev.select("event_type").distinct()
    prs = (
        types.select(F.col("event_type").alias("type_a"))
        .join(
            types.select(F.col("event_type").alias("type_b")),
            F.col("type_a") < F.col("type_b"),
        )
    )
    umerged = (
        F.broadcast(prs)
        .join(
            regs,
            (regs["event_type"] == F.col("type_a"))
            | (regs["event_type"] == F.col("type_b")),
        )
        .groupBy("type_a", "type_b", "j")
        .agg(F.max("m_reg").alias("m_reg"))
    )
    uest = hll_fold(umerged, ["type_a", "type_b"], p=8).select(
        "type_a", "type_b", F.col("est").alias("_u")
    )
    tu = ev.select("event_type", "user_id").distinct()
    exact = (
        tu.select(F.col("event_type").alias("type_a"), "user_id")
        .join(
            tu.select(F.col("event_type").alias("type_b"), "user_id"),
            "user_id",
        )
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("exact_intersection"))
    )
    ea = per_type.select(F.col("event_type").alias("type_a"), F.col("_e").alias("_ea"))
    eb = per_type.select(F.col("event_type").alias("type_b"), F.col("_e").alias("_eb"))
    inter = F.col("_ea") + F.col("_eb") - F.col("_u")
    return (
        uest.join(F.broadcast(ea), "type_a")
        .join(F.broadcast(eb), "type_b")
        .join(exact, ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            rnd(inter, 4).alias("hll_intersection_estimate"),
            F.coalesce("exact_intersection", F.lit(0))
            .cast("long")
            .alias("exact_intersection"),
            rnd(
                F.lit(100.0)
                * (inter - F.coalesce("exact_intersection", F.lit(0)))
                / F.nullif(
                    F.coalesce("exact_intersection", F.lit(0)).cast("double"),
                    F.lit(0.0),
                ),
                4,
            ).alias("rel_err_pct"),
        )
    )


def _kmv_oracle_sketch(filt: str = "", k: int = 64) -> str:
    """Shared oracle CTEs: distinct salted hashes + per-type k-min sketch."""
    from etl_aws_spark.operators.sketch import kmv_hash_expr
    from etl_aws_spark.text import _dialect as D

    return f"""
      hashed AS (
        SELECT DISTINCT event_type, {D.hash60(kmv_hash_expr("user_id"), D.DUCK)} AS h
        FROM events {filt}
      ),
      sk AS (
        SELECT event_type, h FROM (
          SELECT event_type, h,
                 row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
          FROM hashed
        ) WHERE rn <= {k}
      )"""


@query(
    "agg_kmv_distinct_users",
    oracle=f"""
    WITH {_kmv_oracle_sketch()},
    fold AS (
      SELECT event_type, count(*) AS sketch_size, max(h) AS kth_min_hash
      FROM sk GROUP BY event_type
    ),
    est AS (
      SELECT event_type, sketch_size, kth_min_hash,
             CASE WHEN sketch_size < 64 THEN CAST(sketch_size AS DOUBLE)
                  ELSE 63e0 * 1152921504606846976e0 / CAST(kth_min_hash AS DOUBLE)
             END AS est
      FROM fold
    ),
    ex AS (
      SELECT event_type, count(DISTINCT user_id) AS exact_distinct
      FROM events GROUP BY event_type
    )
    SELECT est.event_type,
           CAST(sketch_size AS INT) AS sketch_size,
           CAST(kth_min_hash AS BIGINT) AS kth_min_hash,
           round(est, 4) + 0.0 AS kmv_estimate,
           CAST(exact_distinct AS BIGINT) AS exact_distinct,
           round(100.0e0 * (est - exact_distinct) / exact_distinct, 4) + 0.0
             AS rel_err_pct
    FROM est JOIN ex ON est.event_type = ex.event_type
    """,
    category="aggregate",
)
def agg_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k minimum values, k=64) distinct users per event type beside
    the exact count and measured error — the order-statistics distinct
    sketch next to HLL (`agg_hll_distinct_users`): same mergeable-state
    posture (k longs per group, union = k smallest of the concatenation)
    but, unlike HLL registers, the retained hashes support direct set
    algebra (see `agg_kmv_jaccard_pairs`). The sf0.001 fixture exercises
    the linear regime (distinct < k → the sketch is exhaustive and exact),
    sf0.01+ the (k-1)/R estimator.

    Why it matters at 100 TB: the distinct-hash collapse is map-side
    combined and everything past it is bounded by k per group; the exact
    branch exists purely as the accuracy harness."""
    from etl_aws_spark.operators.sketch import kmv_estimate, kmv_sketch

    ev = load(spark, sf_dir, "events")
    sk = kmv_sketch(ev, "user_id", ["event_type"], k=64)
    est = kmv_estimate(sk, ["event_type"], k=64)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return est.join(exact, "event_type").select(
        "event_type",
        F.col("sketch_size").cast("int").alias("sketch_size"),
        F.col("kth_min_hash").cast("long").alias("kth_min_hash"),
        rnd(F.col("est"), 4).alias("kmv_estimate"),
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
        rnd(
            F.lit(100.0)
            * (F.col("est") - F.col("exact_distinct"))
            / F.col("exact_distinct"),
            4,
        ).alias("rel_err_pct"),
    )


@query(
    "agg_kmv_jaccard_pairs",
    # per-type user sets are thresholded (value > 150) so the sets genuinely
    # differ — unfiltered, every user has every event type on the fixtures
    # and all Jaccards collapse to 1.0.
    oracle=f"""
    WITH {_kmv_oracle_sketch(filt="WHERE value > 150")},
    types AS (SELECT DISTINCT event_type FROM events WHERE value > 150),
    pairs AS (
      SELECT a.event_type AS ta, b.event_type AS tb
      FROM types a JOIN types b ON a.event_type < b.event_type
    ),
    u AS (
      SELECT ta, tb, h, max(in_a) AS in_a, max(in_b) AS in_b FROM (
        SELECT p.ta, p.tb, s.h, 1 AS in_a, 0 AS in_b
        FROM pairs p JOIN sk s ON s.event_type = p.ta
        UNION ALL
        SELECT p.ta, p.tb, s.h, 0 AS in_a, 1 AS in_b
        FROM pairs p JOIN sk s ON s.event_type = p.tb
      ) GROUP BY ta, tb, h
    ),
    x AS (
      SELECT ta, tb, in_a, in_b FROM (
        SELECT ta, tb, in_a, in_b,
               row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rn
        FROM u
      ) WHERE rn <= 64
    ),
    est AS (
      SELECT ta, tb, count(*) AS union_sketch_size,
             sum(in_a * in_b) AS inter_sketch
      FROM x GROUP BY ta, tb
    ),
    users AS (SELECT DISTINCT event_type, user_id FROM events WHERE value > 150),
    eu AS (
      SELECT ta, tb, user_id, max(in_a) AS in_a, max(in_b) AS in_b FROM (
        SELECT p.ta, p.tb, s.user_id, 1 AS in_a, 0 AS in_b
        FROM pairs p JOIN users s ON s.event_type = p.ta
        UNION ALL
        SELECT p.ta, p.tb, s.user_id, 0 AS in_a, 1 AS in_b
        FROM pairs p JOIN users s ON s.event_type = p.tb
      ) GROUP BY ta, tb, user_id
    ),
    ex AS (
      SELECT ta, tb, sum(in_a * in_b) AS inter_u, count(*) AS union_u
      FROM eu GROUP BY ta, tb
    )
    SELECT est.ta AS type_a, est.tb AS type_b,
           CAST(union_sketch_size AS INT) AS union_sketch_size,
           round(CAST(inter_sketch AS DOUBLE) / union_sketch_size, 6) + 0.0
             AS jaccard_sketch,
           round(CAST(inter_u AS DOUBLE) / union_u, 6) + 0.0 AS jaccard_exact,
           round(abs(CAST(inter_sketch AS DOUBLE) / union_sketch_size
                     - CAST(inter_u AS DOUBLE) / union_u), 6) + 0.0 AS abs_err
    FROM est JOIN ex ON est.ta = ex.ta AND est.tb = ex.tb
    """,
    category="aggregate",
)
def agg_kmv_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jaccard similarity of high-value (value > 150) user sets
    across all event-type pairs, estimated FROM KMV SKETCHES ALONE — the
    set-algebra payoff that register sketches (HLL) cannot give directly:
    the k smallest hashes of A ∪ B are derivable from the two k-min
    sketches, and the fraction of that union sketch present in BOTH
    sketches estimates J(A,B) (Bar-Yossef et al. 2002; the MinHash
    bottom-k estimator). The exact leg is the accuracy harness.

    Shape: sketches are ≤ k rows per type, the pair frame is |types|²
    rows — everything past the first distinct-hash collapse is bounded by
    k·|types|², independent of corpus size. `agg_hll_intersection_
    estimate` gets the same answer by inclusion-exclusion; this is the
    direct estimator with one error term instead of three."""
    from etl_aws_spark.operators.sketch import kmv_sketch
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").filter(F.col("value") > 150)
    k = 64
    sk = kmv_sketch(ev, "user_id", ["event_type"], k=k)
    types = ev.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("ta"))
        .join(
            types.select(F.col("event_type").alias("tb")),
            F.col("ta") < F.col("tb"),
        )
    )

    def _tagged(rows: DataFrame, id_col: str) -> DataFrame:
        a = pairs.join(
            rows.select(F.col("event_type").alias("ta"), id_col), "ta"
        ).select("ta", "tb", id_col, F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
        b = pairs.join(
            rows.select(F.col("event_type").alias("tb"), id_col), "tb"
        ).select("ta", "tb", id_col, F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
        return (
            a.unionByName(b)
            .groupBy("ta", "tb", id_col)
            .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
        )

    u = _tagged(sk, "h")
    w = Window.partitionBy("ta", "tb").orderBy("h")
    x = u.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    est = x.groupBy("ta", "tb").agg(
        F.count(F.lit(1)).alias("union_sketch_size"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("inter_sketch"),
    )
    users = ev.select("event_type", "user_id").distinct()
    eu = _tagged(users, "user_id")
    ex = eu.groupBy("ta", "tb").agg(
        F.sum(F.col("in_a") * F.col("in_b")).alias("inter_u"),
        F.count(F.lit(1)).alias("union_u"),
    )
    j_sk = F.col("inter_sketch").cast("double") / F.col("union_sketch_size")
    j_ex = F.col("inter_u").cast("double") / F.col("union_u")
    return est.join(ex, ["ta", "tb"]).select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        F.col("union_sketch_size").cast("int").alias("union_sketch_size"),
        rnd(j_sk, 6).alias("jaccard_sketch"),
        rnd(j_ex, 6).alias("jaccard_exact"),
        rnd(F.abs(j_sk - j_ex), 6).alias("abs_err"),
    )


@query(
    "quality_k_anonymity",
    oracle="""
    WITH cls AS (
      SELECT c_nationkey, c_mktsegment, count(*) AS class_size
      FROM customer GROUP BY c_nationkey, c_mktsegment
    ), agg AS (
      SELECT k.k,
             count(*) AS n_classes,
             sum(class_size) AS n_rows,
             min(class_size) AS min_class_size,
             sum(CASE WHEN class_size < k.k THEN 1 ELSE 0 END) AS classes_below_k,
             sum(CASE WHEN class_size < k.k THEN class_size ELSE 0 END) AS rows_below_k
      FROM cls CROSS JOIN (VALUES (2), (5), (10)) k(k)
      GROUP BY k.k
    )
    SELECT CAST(k AS INT) AS k,
           CAST(n_classes AS BIGINT) AS n_classes,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(min_class_size AS BIGINT) AS min_class_size,
           CAST(classes_below_k AS BIGINT) AS classes_below_k,
           CAST(rows_below_k AS BIGINT) AS rows_at_risk,
           round(100.0e0 * rows_below_k / n_rows, 4) + 0.0 AS pct_rows_at_risk,
           CAST(min_class_size >= k AS INT) AS is_k_anonymous
    FROM agg
    """,
    category="aggregate",
)
def quality_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier pair (nation, market
    segment): for k ∈ {2, 5, 10}, how many equivalence classes fall below
    k members and how many rows they expose — the standard re-identification
    risk gate a training-data pipeline runs before releasing records with
    demographic columns (Sweeney 2002), joining `text_pii_redact` (direct
    identifiers) with a protection for the indirect ones.

    Shape: ONE groupBy collapses the corpus to |QI classes| rows; the three
    thresholds then fan out over that tiny frame (classes × 3), so the audit
    costs a single narrow aggregate at any corpus size. Suppression (drop
    rows in at-risk classes) or generalization (coarsen a QI column) both
    derive directly from this class table."""
    cust = load(spark, sf_dir, "customer")
    cls = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("class_size")
    )
    ks = spark.createDataFrame([(2,), (5,), (10,)], "k int")
    agg = cls.crossJoin(F.broadcast(ks)).groupBy("k").agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("class_size").alias("n_rows"),
        F.min("class_size").alias("min_class_size"),
        F.sum(F.when(F.col("class_size") < F.col("k"), 1).otherwise(0)).alias(
            "classes_below_k"
        ),
        F.sum(
            F.when(F.col("class_size") < F.col("k"), F.col("class_size")).otherwise(0)
        ).alias("rows_below_k"),
    )
    return agg.select(
        F.col("k").cast("int").alias("k"),
        F.col("n_classes").cast("long").alias("n_classes"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("min_class_size").cast("long").alias("min_class_size"),
        F.col("classes_below_k").cast("long").alias("classes_below_k"),
        F.col("rows_below_k").cast("long").alias("rows_at_risk"),
        rnd(F.lit(100.0) * F.col("rows_below_k") / F.col("n_rows"), 4).alias(
            "pct_rows_at_risk"
        ),
        (F.col("min_class_size") >= F.col("k")).cast("int").alias("is_k_anonymous"),
    )


@query(
    "agg_group_skew_kurtosis",
    # standardized 3rd/4th moments from EXACT integer power sums: prices
    # are 2-decimal, so x_fp = round(100x) is an exact integer and every
    # power sum is an order-free HUGEINT/decimal — both engines then
    # derive the moments through the IDENTICAL double expression tree, so
    # skewness and kurtosis replay bit-exactly with no summation jitter.
    oracle="""
    WITH fp AS (
      SELECT l_returnflag,
             CAST(round(CAST(l_extendedprice AS DOUBLE) * 100.0) AS BIGINT) AS x
      FROM lineitem
    ), sums AS (
      SELECT l_returnflag,
             count(*) AS n,
             sum(CAST(x AS HUGEINT)) AS s1,
             sum(CAST(x AS HUGEINT) * x) AS s2,
             sum(CAST(x AS HUGEINT) * x * x) AS s3,
             sum(CAST(x AS HUGEINT) * x * x * x) AS s4
      FROM fp GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           round(CAST(s1 AS DOUBLE) / n / 100.0, 4) + 0.0 AS mean_price,
           round(sqrt(CAST(s2 AS DOUBLE) / n
                      - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                 / 100.0, 4) + 0.0 AS stddev_price,
           round((CAST(s3 AS DOUBLE) / n
                  - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
                  + 2.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                    * (CAST(s1 AS DOUBLE) / n))
                 / pow(CAST(s2 AS DOUBLE) / n
                       - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n),
                       1.5), 6) + 0.0 AS skewness,
           round((CAST(s4 AS DOUBLE) / n
                  - 4.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n)
                  + 6.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                    * (CAST(s2 AS DOUBLE) / n)
                  - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                    * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                 / ((CAST(s2 AS DOUBLE) / n
                     - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                    * (CAST(s2 AS DOUBLE) / n
                       - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)))
                 - 3.0, 6) + 0.0 AS kurtosis_excess
    FROM sums
    """,
    category="aggregate",
)
def agg_group_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group skewness and excess kurtosis of the price distribution —
    the two shape moments `agg_describe_percentiles` doesn't cover, and
    the standard drift signals a data-quality monitor tracks beside
    mean/stddev (a kurtosis jump = new outlier regime; a skew flip =
    truncation/clipping upstream).

    Scale shape: ONE map-side-combined aggregate computes four integer
    power sums per group (prices are 2-decimal, so the cent-scaled
    values — and therefore x², x³, x⁴ — are exact integers in
    decimal/HUGEINT; x⁴ ≈ 1e28 per row and ~1e35 summed, inside both
    engines' 38-digit range); the moment algebra then runs on the
    |groups|-row frame through an expression tree written identically on
    both engines, so the statistics are deterministic at any parallelism
    — the same totals-not-means rule as the RF error statistics."""
    li = load(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_extendedprice").cast("double") * 100.0).cast("long")
    xd = F.col("x").cast("decimal(19,0)")
    sums = li.select("l_returnflag", x.alias("x")).groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s1"),
        F.sum(xd * xd).alias("s2"),
        F.sum(xd * xd * xd).alias("s3"),
        F.sum(xd * xd * xd * xd).alias("s4"),
    )
    n = F.col("n").cast("double")
    s1, s2, s3, s4 = [F.col(c).cast("double") for c in ("s1", "s2", "s3", "s4")]
    mu = s1 / n
    m2 = s2 / n - mu * mu
    m3 = s3 / n - F.lit(3.0) * mu * (s2 / n) + F.lit(2.0) * mu * mu * mu
    m4 = (
        s4 / n
        - F.lit(4.0) * mu * (s3 / n)
        + F.lit(6.0) * mu * mu * (s2 / n)
        - F.lit(3.0) * mu * mu * mu * mu
    )
    return sums.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        rnd(mu / 100.0, 4).alias("mean_price"),
        rnd(F.sqrt(m2) / 100.0, 4).alias("stddev_price"),
        (F.round(m3 / F.pow(m2, 1.5), 6) + F.lit(0.0)).alias("skewness"),
        (F.round(m4 / (m2 * m2) - F.lit(3.0), 6) + F.lit(0.0)).alias(
            "kurtosis_excess"
        ),
    )


# two-sided alpha=0.05 and 80% power normal quantiles — shared literals,
# so both engines compute the identical closed forms
_Z_ALPHA = 1.959963984540054
_Z_BETA = 0.8416212335729143


@query(
    "stat_power_mde",
    # experiment sizing from EXACT integer power sums (cent-scaled
    # values): pooled variance, minimum detectable effect at the current
    # sample sizes, and the per-arm n required for a 5% lift — every
    # input an order-free integer, every output one shared IEEE closed
    # form.
    oracle=f"""
    WITH fp AS (
      SELECT CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS arm,
             CAST(round(CAST(value AS DOUBLE) * 100.0) AS BIGINT) AS x
      FROM events WHERE event_type = 'purchase'
    ), sums AS (
      SELECT arm, count(*) AS n, sum(CAST(x AS HUGEINT)) AS s1,
             sum(CAST(x AS HUGEINT) * x) AS s2
      FROM fp GROUP BY arm
    ), w AS (
      SELECT max(CASE WHEN arm = 1 THEN n END) AS na,
             max(CASE WHEN arm = 0 THEN n END) AS nb,
             max(CASE WHEN arm = 1 THEN CAST(s1 AS DOUBLE) END) AS s1a,
             max(CASE WHEN arm = 0 THEN CAST(s1 AS DOUBLE) END) AS s1b,
             max(CASE WHEN arm = 1 THEN CAST(s2 AS DOUBLE) END) AS s2a,
             max(CASE WHEN arm = 0 THEN CAST(s2 AS DOUBLE) END) AS s2b
      FROM sums
    ), m AS (
      SELECT na, nb,
             ((s2a - s1a * s1a / na) + (s2b - s1b * s1b / nb))
               / (na + nb - 2.0) AS var_cents,
             (s1a + s1b) / (na + nb) AS mean_cents
      FROM w
    )
    SELECT CAST(na AS BIGINT) AS n_weekend,
           CAST(nb AS BIGINT) AS n_weekday,
           round(sqrt(var_cents) / 100.0, 4) + 0.0 AS pooled_std,
           round(({_Z_ALPHA} + {_Z_BETA}) * sqrt(var_cents)
                 * sqrt(1.0 / na + 1.0 / nb) / 100.0, 4) + 0.0 AS mde_abs,
           round(({_Z_ALPHA} + {_Z_BETA}) * sqrt(var_cents)
                 * sqrt(1.0 / na + 1.0 / nb) / mean_cents, 6) + 0.0 AS mde_rel,
           CAST(ceil(2.0 * pow(({_Z_ALPHA} + {_Z_BETA}) * sqrt(var_cents)
                               / (0.05 * mean_cents), 2.0)) AS BIGINT)
             AS n_per_arm_for_5pct
    FROM m
    """,
    category="aggregate",
)
def stat_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment POWER ANALYSIS over the live metric: pooled variance of
    purchase value (weekend vs weekday arms), the minimum detectable
    effect at the CURRENT sample sizes (two-sided α=0.05, 80% power),
    and the per-arm n required to detect a 5% lift — the sizing table an
    experimentation platform shows before anyone launches, and the
    third leg of the stack beside `stat_welch_t_test` (did it move) and
    `stat_cuped_adjustment` (shrink the variance first).

    Scale shape: ONE map-side-combined conditional aggregate produces
    exact integer power sums per arm (cent-scaled, HUGEINT/decimal);
    every statistic is a closed form over the 1-row frame through a
    shared IEEE expression — deterministic at any parallelism."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    fp = ev.select(
        F.when(F.dayofweek("ts").isin(1, 7), 1).otherwise(0).alias("arm"),
        F.round(F.col("value").cast("double") * 100.0).cast("long").alias("x"),
    )
    xd = F.col("x").cast("decimal(19,0)")
    sums = fp.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s1"),
        F.sum(xd * xd).alias("s2"),
    )
    w = sums.agg(
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("na"),
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("nb"),
        F.max(F.when(F.col("arm") == 1, F.col("s1").cast("double"))).alias("s1a"),
        F.max(F.when(F.col("arm") == 0, F.col("s1").cast("double"))).alias("s1b"),
        F.max(F.when(F.col("arm") == 1, F.col("s2").cast("double"))).alias("s2a"),
        F.max(F.when(F.col("arm") == 0, F.col("s2").cast("double"))).alias("s2b"),
    )
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    var_c = (
        (F.col("s2a") - F.col("s1a") * F.col("s1a") / na)
        + (F.col("s2b") - F.col("s1b") * F.col("s1b") / nb)
    ) / (na + nb - F.lit(2.0))
    mean_c = (F.col("s1a") + F.col("s1b")) / (na + nb)
    zsum = F.lit(_Z_ALPHA + _Z_BETA)
    m = w.select("na", "nb", var_c.alias("var_cents"), mean_c.alias("mean_cents"))
    vc, mc = F.col("var_cents"), F.col("mean_cents")
    return m.select(
        F.col("na").cast("long").alias("n_weekend"),
        F.col("nb").cast("long").alias("n_weekday"),
        rnd(F.sqrt(vc) / 100.0, 4).alias("pooled_std"),
        rnd(
            zsum * F.sqrt(vc)
            * F.sqrt(1.0 / F.col("na").cast("double") + 1.0 / F.col("nb").cast("double"))
            / 100.0,
            4,
        ).alias("mde_abs"),
        (
            F.round(
                zsum * F.sqrt(vc)
                * F.sqrt(
                    1.0 / F.col("na").cast("double")
                    + 1.0 / F.col("nb").cast("double")
                )
                / mc,
                6,
            )
            + F.lit(0.0)
        ).alias("mde_rel"),
        F.ceil(
            F.lit(2.0) * F.pow(zsum * F.sqrt(vc) / (F.lit(0.05) * mc), 2.0)
        ).cast("long").alias("n_per_arm_for_5pct"),
    )


@query(
    "stat_gini_revenue_concentration",
    # exact Gini from the distinct-value histogram: with x ascending,
    # G = 2·Σ i·x_i / (n·Σx) − (n+1)/n, and a tied block of k copies of v
    # after c smaller values contributes v·(k·c + k(k+1)/2) — every term
    # an exact integer (cents × positions) in HUGEINT/decimal, so the
    # coefficient is summation-order-free and never touches a
    # corpus-sized sort.
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             sum(CAST(round(CAST(o_totalprice AS DOUBLE) * 100.0) AS BIGINT))
               AS cents
      FROM orders GROUP BY o_custkey
    ), h AS (
      SELECT cents AS v, count(*) AS k FROM rev GROUP BY cents
    ), c AS (
      SELECT v, k,
             coalesce(sum(k) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
      FROM h
    ), agg AS (
      SELECT sum(k) AS n,
             sum(CAST(v AS HUGEINT) * k) AS sx,
             sum(CAST(v AS HUGEINT)
                 * (CAST(k AS HUGEINT) * cb
                    + (CAST(k AS HUGEINT) * (k + 1)) // 2)) AS six
      FROM c
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           round(CAST(sx AS DOUBLE) / 100.0, 2) + 0.0 AS total_revenue,
           round(2.0 * CAST(six AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
                 - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6) + 0.0
             AS gini
    FROM agg
    """,
    category="aggregate",
)
def stat_gini_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue — the concentration audit
    behind every 'whale dependency' dashboard (0 = spend spread evenly,
    →1 = a few customers carry the book), the scalar summary of
    `showcase_abc_classification`'s Pareto curve.

    Scale shape: the fact table reduces to per-customer cents (exact
    integers), collapses to the DISTINCT-VALUE histogram, and the only
    cumulative pass runs over |distinct revenue values| cells via
    `_util.bucketed_cumsum` ($1000 cells — bounded by the spend DOMAIN);
    the rank-weighted sum folds each tied block's closed form
    v·(k·c + k(k+1)/2) in exact HUGEINT/decimal arithmetic, so the exact
    Gini never sorts the corpus and is bit-identical in any
    partitioning."""
    from etl_aws_spark.suite._util import bucketed_cumsum

    orders = load(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(
            F.round(F.col("o_totalprice").cast("double") * 100.0).cast("long")
        ).alias("cents")
    )
    h = rev.groupBy(F.col("cents").alias("v")).agg(F.count(F.lit(1)).alias("k"))
    c = bucketed_cumsum(
        h, "v", "k", F.expr("v div 100000"), out_cols="cb", inclusive=False
    )
    vd = F.col("v").cast("decimal(19,0)")
    agg = c.agg(
        F.sum("k").alias("n"),
        F.sum(vd * F.col("k").cast("decimal(19,0)")).alias("sx"),
        F.sum(
            vd
            * (
                F.col("k").cast("decimal(19,0)")
                * F.col("cb").cast("decimal(19,0)")
                + F.expr("cast(k * (k + 1) div 2 as decimal(19,0))")
            )
        ).alias("six"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    six = F.col("six").cast("double")
    return agg.select(
        F.col("n").cast("long").alias("n_customers"),
        rnd(sx / 100.0, 2).alias("total_revenue"),
        (
            F.round(
                F.lit(2.0) * six / (n * sx) - (n + F.lit(1.0)) / n, 6
            )
            + F.lit(0.0)
        ).alias("gini"),
    )


@query(
    "sample_neyman_allocation",
    # optimal stratified-sample allocation n_h ∝ N_h·σ_h (Neyman 1934):
    # per-stratum σ from exact cent-scaled power sums, allocation shares
    # and rounded per-stratum budgets from one shared closed form — the
    # design table every stratified audit/eval sample is drawn from.
    oracle="""
    WITH fp AS (
      SELECT event_type,
             CAST(round(CAST(value AS DOUBLE) * 100.0) AS BIGINT) AS x
      FROM events
    ), s AS (
      SELECT event_type, count(*) AS nh,
             sum(CAST(x AS HUGEINT)) AS s1,
             sum(CAST(x AS HUGEINT) * x) AS s2
      FROM fp GROUP BY event_type
    ), v AS (
      SELECT event_type, nh,
             sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / nh)
                  / (nh - 1.0)) AS sd
      FROM s
    ), tot AS (
      SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(nh * sd ORDER BY event_type)), (acc, t) -> acc + t) AS z,
             sum(nh) AS n
      FROM v
    )
    SELECT v.event_type,
           CAST(v.nh AS BIGINT) AS n_stratum,
           round(v.sd / 100.0, 4) + 0.0 AS stddev,
           round(v.nh * v.sd / tot.z, 6) + 0.0 AS neyman_share,
           CAST(round(10000.0 * v.nh * v.sd / tot.z) AS BIGINT)
             AS n_alloc_10k,
           round((CAST(v.nh AS DOUBLE) / tot.n) / (v.nh * v.sd / tot.z), 4)
             + 0.0 AS vs_proportional
    FROM v CROSS JOIN tot
    """,
    category="sample",
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEYMAN ALLOCATION for stratified sampling: the variance-optimal
    per-stratum budget n_h ∝ N_h·σ_h for a fixed total sample (here a
    10k-row audit sample over event types) — high-variance strata get
    oversampled relative to proportional allocation, the `vs_proportional`
    column quantifying by how much. The design step BEFORE
    `sample_stratified_by_source` draws anything; together they are the
    survey-sampling pair every eval/labeling pipeline runs.

    Scale shape: ONE map-side-combined aggregate yields exact
    cent-scaled power sums per stratum (order-free integers); σ, shares
    and budgets are closed forms over the |strata| frame through a
    shared IEEE expression tree."""
    ev = load(spark, sf_dir, "events")
    fp = ev.select(
        "event_type",
        F.round(F.col("value").cast("double") * 100.0).cast("long").alias("x"),
    )
    xd = F.col("x").cast("decimal(19,0)")
    s = fp.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nh"),
        F.sum("x").alias("s1"),
        F.sum(xd * xd).alias("s2"),
    )
    nh = F.col("nh").cast("double")
    sd = F.sqrt(
        (
            F.col("s2").cast("double")
            - F.col("s1").cast("double") * F.col("s1").cast("double") / nh
        )
        / (nh - F.lit(1.0))
    )
    v = s.select("event_type", "nh", sd.alias("sd"))
    # z folds in event_type order (|strata| rows) — no float sum order
    tot = v.select(
        "event_type", (F.col("nh") * F.col("sd")).alias("t"), "nh"
    ).agg(
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(event_type, t))), "
            "s -> s.t), cast(0.0 as double), (acc, x) -> acc + x)"
        ).alias("z"),
        F.sum("nh").alias("n"),
    )
    share = F.col("nh") * F.col("sd") / F.col("z")
    return v.crossJoin(F.broadcast(tot)).select(
        "event_type",
        F.col("nh").cast("long").alias("n_stratum"),
        rnd(F.col("sd") / 100.0, 4).alias("stddev"),
        (F.round(share, 6) + F.lit(0.0)).alias("neyman_share"),
        F.round(F.lit(10000.0) * share).cast("long").alias("n_alloc_10k"),
        rnd(
            (F.col("nh").cast("double") / F.col("n")) / share, 4
        ).alias("vs_proportional"),
    )


# Poisson(1) CDF thresholds in 2^60 units (floor(CDF_k * 2^60)): the
# deterministic-hash uniform u in [0, 2^60) maps to a with-replacement
# bootstrap weight w = #{k : threshold_k <= u}. Exact integer literals on
# both engines, so replicate membership can never diverge.
_POIS_THRESH = [
    424136118829305344,
    848272237658610688,
    1060340297073263360,
    1131029650211480960,
    1148701988496035328,
    1152236456152946176,
    1152825534095764608,
    1152909688087595776,
]
_PB_B = 24  # Poisson-bootstrap replicates; CI = 2nd/23rd order statistics


def _pois_w_sql(u: str) -> str:
    """Weight expression: count of CDF thresholds <= u (identical SQL on
    Spark and DuckDB — a sum of integer comparisons, no float)."""
    return "(" + " + ".join(
        f"CASE WHEN {u} >= {t} THEN 1 ELSE 0 END" for t in _POIS_THRESH
    ) + ")"


@query(
    "stat_poisson_bootstrap_ci",
    # the with-replacement bootstrap AT SCALE: per-(row, replicate)
    # Poisson(1) weights from a deterministic hash (Chamandy et al.,
    # "Estimating Uncertainty for Massive Data Streams", Google 2012) —
    # multinomial resampling needs global coordination, Poisson weights
    # need none and are exchangeable with it to O(1/n). One corpus scan,
    # map-side-combined; CI from the 24 replicate means' order stats.
    oracle=f"""
    WITH base AS (
      SELECT event_id,
             CAST(round(CAST(value AS DOUBLE) * 100.0) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ), reps AS (
      SELECT b, base.event_id, base.cents,
             ('0x' || substr(md5(concat('pb', CAST(b AS VARCHAR), ':',
               CAST(base.event_id AS VARCHAR))), 1, 15))::BIGINT AS u
      FROM base CROSS JOIN (SELECT unnest(generate_series(1, {_PB_B})) AS b) bd
    ), w AS (
      SELECT b, sum(CAST({_pois_w_sql('u')} AS HUGEINT) * cents) AS sw,
             sum({_pois_w_sql('u')}) AS nw
      FROM reps GROUP BY b
    ), m AS (
      SELECT b, CAST(sw AS DOUBLE) / nw AS mean_b,
             row_number() OVER (ORDER BY CAST(sw AS DOUBLE) / nw, b) AS rk
      FROM w
    ), pt AS (
      SELECT count(*) AS n_rows,
             round(avg(CAST(cents AS DOUBLE)) / 100.0, 4) + 0.0 AS point_estimate
      FROM base
    )
    SELECT pt.n_rows, CAST({_PB_B} AS BIGINT) AS n_replicates,
           pt.point_estimate,
           round((SELECT mean_b FROM m WHERE rk = 2) / 100.0, 4) + 0.0 AS ci_lo,
           round((SELECT mean_b FROM m WHERE rk = {_PB_B - 1}) / 100.0, 4) + 0.0
             AS ci_hi
    FROM pt
    """,
    category="aggregate",
)
def stat_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH-REPLACEMENT bootstrap CI for the mean purchase value via
    deterministic Poisson(1) weights — the industry-standard way to
    bootstrap a dataset that does not fit on one machine (Chamandy et
    al. 2012): instead of drawing n indices with replacement (which
    needs a global RNG and n draws of coordination), each (row,
    replicate) pair independently takes weight w ~ Poisson(1), decided
    here by an md5 hash against exact integer CDF thresholds, so the
    resample is reproducible under ANY partitioning and identical on
    both engines. Complements `stat_bootstrap_ci_subsample` (the
    m-out-of-n half-sample variant): this one has the classic
    bootstrap's first-order CI width, no sqrt(m/n) correction.

    Scale shape: the purchase slice is scanned ONCE against a
    broadcast {B}-row replicate dimension; weights are integer
    comparisons (codegen, no float, no RNG state), the per-replicate
    (Σw·cents, Σw) reduce map-side, and every frame past the scan is
    {B} rows. The order-statistic CI sorts {B} rows — driver-bounded."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    base = ev.select(
        "event_id",
        F.round(F.col("value").cast("double") * 100.0).cast("long").alias("cents"),
    )
    reps_dim = spark.range(1, _PB_B + 1).select(F.col("id").alias("b"))
    u = (
        "cast(conv(substr(md5(concat('pb', cast(b as string), ':', "
        "cast(event_id as string))), 1, 15), 16, 10) as bigint)"
    )
    w = (
        base.crossJoin(F.broadcast(reps_dim))
        .withColumn("u", F.expr(u))
        .withColumn("w", F.expr(_pois_w_sql("u")))
        .groupBy("b")
        .agg(
            F.sum(F.col("w").cast("decimal(19,0)") * F.col("cents")).alias("sw"),
            F.sum("w").alias("nw"),
        )
    )
    from pyspark.sql import Window

    mean_b = F.col("sw").cast("double") / F.col("nw")
    m = w.select("b", mean_b.alias("mean_b")).withColumn(
        "rk", F.row_number().over(Window.orderBy("mean_b", "b"))
    )
    pt = base.agg(
        F.count(F.lit(1)).alias("n_rows"),
        rnd(F.avg(F.col("cents").cast("double")) / 100.0, 4).alias("point_estimate"),
    )
    lo = m.filter(F.col("rk") == 2).select(
        rnd(F.col("mean_b") / 100.0, 4).alias("ci_lo")
    )
    hi = m.filter(F.col("rk") == _PB_B - 1).select(
        rnd(F.col("mean_b") / 100.0, 4).alias("ci_hi")
    )
    return (
        pt.withColumn("n_replicates", F.lit(_PB_B).cast("long"))
        .select("n_rows", "n_replicates", "point_estimate")
        .crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
    )


@query(
    "stat_benjamini_hochberg_fdr",
    # multiple-testing control for segment dashboards: one z-test per
    # nation (urgent-order share vs pooled), p-values via the
    # Abramowitz-Stegun 7.1.26 normal-tail polynomial (the only
    # transcendental, exp, crosses the nudged-rounding bridge), then the
    # Benjamini-Hochberg step-up at q = 0.10 over the |nations| frame.
    oracle="""
    WITH g AS (
      SELECT c.c_nationkey AS nk,
             sum(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
               AS x,
             count(*) AS n
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_nationkey
    ), tot AS (
      SELECT sum(x) AS sx, sum(n) AS sn FROM g
    ), z AS (
      SELECT g.nk, g.x, g.n,
             (CAST(g.x AS DOUBLE) / g.n
              - CAST(tot.sx AS DOUBLE) / tot.sn)
             / sqrt(CAST(tot.sx AS DOUBLE) / tot.sn
                    * (1.0 - CAST(tot.sx AS DOUBLE) / tot.sn) / g.n) AS zv
      FROM g CROSS JOIN tot
    ), pv AS (
      SELECT nk, x, n, zv,
             least(1.0,
               2.0 * (round(exp(-abs(zv) * abs(zv) / 2.0)
                            + sign(exp(-abs(zv) * abs(zv) / 2.0)) * 1e-9, 10)
                      + 0.0)
                   / 2.5066282746310002
                   * ((1.0 / (1.0 + 0.2316419 * abs(zv)))
                      * (0.319381530 + (1.0 / (1.0 + 0.2316419 * abs(zv)))
                        * (-0.356563782 + (1.0 / (1.0 + 0.2316419 * abs(zv)))
                          * (1.781477937 + (1.0 / (1.0 + 0.2316419 * abs(zv)))
                            * (-1.821255978 + (1.0 / (1.0 + 0.2316419 * abs(zv)))
                              * 1.330274429)))))) AS p
      FROM z
    ), rk AS (
      SELECT pv.*,
             row_number() OVER (ORDER BY p, nk) AS r,
             count(*) OVER () AS m
      FROM pv
    ), crit AS (
      SELECT max(CASE WHEN p <= 0.10 * r / m THEN r ELSE 0 END) AS cr FROM rk
    )
    SELECT n.n_name,
           CAST(rk.x AS BIGINT) AS urgent_orders,
           CAST(rk.n AS BIGINT) AS total_orders,
           round(CAST(rk.x AS DOUBLE) / rk.n, 6) + 0.0 AS urgent_share,
           round(rk.zv + sign(rk.zv) * 1e-9, 4) + 0.0 AS z_score,
           round(rk.p + sign(rk.p) * 1e-9, 8) + 0.0 AS p_value,
           CAST(rk.r AS BIGINT) AS p_rank,
           round(0.10 * rk.r / rk.m, 6) + 0.0 AS bh_threshold,
           CASE WHEN rk.r <= crit.cr THEN 1 ELSE 0 END AS rejected
    FROM rk CROSS JOIN crit JOIN nation n ON rk.nk = n.n_nationkey
    """,
    category="aggregate",
)
def stat_benjamini_hochberg_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENJAMINI-HOCHBERG FDR control across per-nation proportion
    tests — the guard every segment-drilldown dashboard needs: testing
    25 nations at alpha = 0.05 fires ~1.2 false alarms per refresh by
    construction; BH (1995) step-up at q = 0.10 bounds the expected
    FALSE-DISCOVERY share of the flagged set instead. Per nation, the
    urgent-order share is z-tested against the pooled share; two-sided
    p-values come from the Abramowitz-Stegun 7.1.26 polynomial tail
    (max abs error 7.5e-8, far above the 1e-8 output resolution), and
    the step-up keeps every rank up to the largest r with
    p_(r) <= q*r/m.

    Scale shape: the fact-dim join shuffles once and reduces to ONE row
    per nation (map-side-combined counts); pooled totals are exact
    integers (order-free), z and p are a shared IEEE expression tree
    over exact inputs whose single transcendental, exp, is nudge-rounded
    to 10 digits before any product (the periodogram recipe). The rank
    window and step-up maximum run on the |nations| frame — bounded by
    the dimension, never the fact table."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    g = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).alias("x"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    tot = g.agg(F.sum("x").alias("sx"), F.sum("n").alias("sn"))
    p0 = F.col("sx").cast("double") / F.col("sn")
    zv = (F.col("x").cast("double") / F.col("n") - p0) / F.sqrt(
        p0 * (F.lit(1.0) - p0) / F.col("n")
    )
    z = g.crossJoin(F.broadcast(tot)).select("nk", "x", "n", zv.alias("zv"))
    az = F.abs(F.col("zv"))
    e_n = rnd_nudged(F.exp(-az * az / F.lit(2.0)), 10)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.2316419) * az)
    poly = t * (
        F.lit(0.319381530)
        + t
        * (
            F.lit(-0.356563782)
            + t
            * (
                F.lit(1.781477937)
                + t * (F.lit(-1.821255978) + t * F.lit(1.330274429))
            )
        )
    )
    p = F.least(F.lit(1.0), F.lit(2.0) * e_n / F.lit(2.5066282746310002) * poly)
    pv = z.select("nk", "x", "n", "zv", p.alias("p"))
    w = Window.orderBy("p", "nk")
    rk = pv.withColumn("r", F.row_number().over(w)).withColumn(
        "m", F.count(F.lit(1)).over(Window.partitionBy())
    )
    crit = rk.agg(
        F.max(
            F.when(
                F.col("p") <= F.lit(0.10) * F.col("r") / F.col("m"), F.col("r")
            ).otherwise(0)
        ).alias("cr")
    )
    return (
        rk.crossJoin(F.broadcast(crit))
        .join(F.broadcast(n), F.col("nk") == F.col("n_nationkey"))
        .select(
            "n_name",
            F.col("x").cast("long").alias("urgent_orders"),
            F.col("n").cast("long").alias("total_orders"),
            rnd(F.col("x").cast("double") / F.col("n"), 6).alias("urgent_share"),
            rnd_nudged(F.col("zv"), 4).alias("z_score"),
            rnd_nudged(F.col("p"), 8).alias("p_value"),
            F.col("r").cast("long").alias("p_rank"),
            rnd(F.lit(0.10) * F.col("r") / F.col("m"), 6).alias("bh_threshold"),
            F.when(F.col("r") <= F.col("cr"), 1).otherwise(0).alias("rejected"),
        )
    )


@query(
    "stat_jackknife_group_se",
    # delete-one-GROUP jackknife (Tukey 1958; the grouped variant is how
    # clustered/correlated data gets honest SEs): leave each nation out,
    # recompute the mean from the REMAINING exact integer totals, and the
    # (g-1)/g-scaled spread of the 25 replicates is the standard error.
    # Cross-replicate float sums fold in nationkey order (house rule: no
    # float summation order may depend on partitioning).
    oracle="""
    WITH g AS (
      SELECT c.c_nationkey AS nk,
             sum(CAST(round(CAST(o.o_totalprice AS DOUBLE) * 100.0) AS BIGINT))
               AS s,
             count(*) AS n
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_nationkey
    ), tot AS (
      SELECT sum(s) AS st, sum(n) AS nt, count(*) AS ng FROM g
    ), l AS (
      SELECT g.nk, CAST(tot.st - g.s AS DOUBLE) / (tot.nt - g.n) AS loo
      FROM g CROSS JOIN tot
    ), th AS (
      SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(loo ORDER BY nk)), (a, b) -> a + b)
             / (SELECT ng FROM tot) AS theta
      FROM l
    ), ss AS (
      SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list((loo - th.theta) * (loo - th.theta) ORDER BY nk)),
               (a, b) -> a + b) AS ssv,
             max(abs(loo - th.theta)) AS mi
      FROM l CROSS JOIN th
    ), infl AS (
      SELECT min(l.nk) AS mnk
      FROM l CROSS JOIN th CROSS JOIN ss
      WHERE abs(l.loo - th.theta) = ss.mi
    )
    SELECT CAST(tot.ng AS BIGINT) AS n_groups,
           round(CAST(tot.st AS DOUBLE) / 100.0 / tot.nt, 4) + 0.0
             AS full_mean,
           round(sqrt((tot.ng - 1.0) / tot.ng * ss.ssv) / 100.0, 6) + 0.0
             AS jackknife_se,
           n.n_name AS most_influential_nation,
           round(ss.mi / 100.0, 6) + 0.0 AS max_influence
    FROM tot CROSS JOIN ss CROSS JOIN infl
    JOIN nation n ON infl.mnk = n.n_nationkey
    """,
    category="aggregate",
)
def stat_jackknife_group_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE-ONE-GROUP jackknife standard error for the mean order
    value — the honest SE when observations are correlated WITHIN
    groups (customers cluster by nation): each replicate drops one
    whole nation and recomputes the mean from the remaining totals;
    the (g-1)/g-scaled spread of the replicates is the SE, and the
    largest |replicate - mean| names the nation whose removal moves
    the metric most (the influence diagnostic).

    Scale shape: the fact-dim join reduces to ONE exact integer
    (Σcents, count) row per nation map-side; every leave-one-out mean
    is a closed form over those integers (no second scan — deleting a
    group is subtraction), and the two cross-replicate float sums fold
    in nationkey order over the |nations| frame via the ordered
    collect_list fold, so no float summation order ever depends on
    partitioning. The influence argmax ties-break by MIN nationkey on
    bit-identical doubles — deterministic on both engines."""
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nn = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    g = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.sum(
                F.round(F.col("o_totalprice").cast("double") * 100.0).cast("long")
            ).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    tot = g.agg(
        F.sum("s").alias("st"), F.sum("n").alias("nt"), F.count(F.lit(1)).alias("ng")
    )
    l = g.crossJoin(F.broadcast(tot)).select(
        "nk",
        (
            (F.col("st") - F.col("s")).cast("double") / (F.col("nt") - F.col("n"))
        ).alias("loo"),
        "st",
        "nt",
        "ng",
    )
    th = l.agg(
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(nk, loo))), "
            "s -> s.loo), cast(0.0 as double), (a, b) -> a + b)"
        ).alias("tsum"),
        F.first("ng").alias("ng_"),
    ).select((F.col("tsum") / F.col("ng_")).alias("theta"))
    lt = l.crossJoin(F.broadcast(th))
    ss = lt.agg(
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(nk, loo, theta))), "
            "s -> (s.loo - s.theta) * (s.loo - s.theta)), "
            "cast(0.0 as double), (a, b) -> a + b)"
        ).alias("ssv"),
        F.max(F.abs(F.col("loo") - F.col("theta"))).alias("mi"),
        F.first("st").alias("st"),
        F.first("nt").alias("nt"),
        F.first("ng").alias("ng"),
        F.first("theta").alias("theta"),
    )
    infl = (
        lt.crossJoin(F.broadcast(ss.select("mi", "theta").withColumnRenamed("theta", "th2")))
        .filter(F.abs(F.col("loo") - F.col("th2")) == F.col("mi"))
        .agg(F.min("nk").alias("mnk"))
    )
    return (
        ss.crossJoin(F.broadcast(infl))
        .join(F.broadcast(nn), F.col("mnk") == F.col("n_nationkey"))
        .select(
            F.col("ng").cast("long").alias("n_groups"),
            rnd(F.col("st").cast("double") / 100.0 / F.col("nt"), 4).alias(
                "full_mean"
            ),
            (
                F.round(
                    F.sqrt(
                        (F.col("ng") - F.lit(1.0)) / F.col("ng") * F.col("ssv")
                    )
                    / 100.0,
                    6,
                )
                + F.lit(0.0)
            ).alias("jackknife_se"),
            F.col("n_name").alias("most_influential_nation"),
            rnd(F.col("mi") / 100.0, 6).alias("max_influence"),
        )
    )


@query(
    "stat_two_way_anova",
    # two-way factorial ANOVA (region x order priority on order value):
    # the corpus reduces to 25 cells of exact integer power sums; main,
    # interaction and error sums of squares are closed forms over cell /
    # margin frames, with every cross-cell float sum folded in key order.
    # Unbalanced cells use the classic proportional (Type I sequential)
    # decomposition - stated, not hidden.
    oracle="""
    WITH cells AS (
      SELECT r.r_name AS region, o.o_orderpriority AS priority,
             count(*) AS n,
             sum(CAST(round(CAST(o.o_totalprice AS DOUBLE) * 100.0) AS BIGINT))
               AS s,
             sum(CAST(CAST(round(CAST(o.o_totalprice AS DOUBLE) * 100.0)
                 AS BIGINT) AS HUGEINT)
                 * CAST(round(CAST(o.o_totalprice AS DOUBLE) * 100.0)
                 AS BIGINT)) AS ssq
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation nn ON c.c_nationkey = nn.n_nationkey
      JOIN region r ON nn.n_regionkey = r.r_regionkey
      GROUP BY r.r_name, o.o_orderpriority
    ), tot AS (
      SELECT sum(n) AS n, sum(s) AS t, sum(ssq) AS syy,
             count(*) AS ab,
             count(DISTINCT region) AS a, count(DISTINCT priority) AS b
      FROM cells
    ), ma AS (
      SELECT region, sum(s) AS sa, sum(n) AS na FROM cells GROUP BY region
    ), mb AS (
      SELECT priority, sum(s) AS sb_, sum(n) AS nb FROM cells GROUP BY priority
    ), folds AS (
      SELECT
        (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(CAST(sa AS DOUBLE) * sa / na ORDER BY region)),
           (x, y) -> x + y) FROM ma) AS fa,
        (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(CAST(sb_ AS DOUBLE) * sb_ / nb ORDER BY priority)),
           (x, y) -> x + y) FROM mb) AS fb,
        (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(CAST(s AS DOUBLE) * s / n ORDER BY region, priority)),
           (x, y) -> x + y) FROM cells) AS fc
    ), ss AS (
      SELECT tot.n, tot.a, tot.b, tot.ab,
             CAST(tot.t AS DOUBLE) * tot.t / tot.n AS corr,
             folds.fa - CAST(tot.t AS DOUBLE) * tot.t / tot.n AS ss_a,
             folds.fb - CAST(tot.t AS DOUBLE) * tot.t / tot.n AS ss_b,
             folds.fc - CAST(tot.t AS DOUBLE) * tot.t / tot.n AS ss_cells,
             CAST(tot.syy AS DOUBLE)
               - CAST(tot.t AS DOUBLE) * tot.t / tot.n AS ss_tot
      FROM tot CROSS JOIN folds
    ), eff AS (
      SELECT 'region' AS effect, CAST(a - 1 AS BIGINT) AS df, ss_a AS ssv,
             (ss_tot - ss_cells) / (n - ab) AS mse, n, ab FROM ss
      UNION ALL
      SELECT 'priority', CAST(b - 1 AS BIGINT), ss_b,
             (ss_tot - ss_cells) / (n - ab), n, ab FROM ss
      UNION ALL
      SELECT 'interaction', CAST((a - 1) * (b - 1) AS BIGINT),
             ss_cells - ss_a - ss_b,
             (ss_tot - ss_cells) / (n - ab), n, ab FROM ss
      UNION ALL
      SELECT 'error', CAST(n - ab AS BIGINT), ss_tot - ss_cells,
             (ss_tot - ss_cells) / (n - ab), n, ab FROM ss
    )
    SELECT effect, df,
           round(ssv / 10000.0 + sign(ssv / 10000.0)
                 * greatest(1e-9, abs(ssv / 10000.0) * 1e-12), 2) + 0.0 AS ss,
           round(ssv / df / 10000.0 + sign(ssv / df / 10000.0)
                 * greatest(1e-9, abs(ssv / df / 10000.0) * 1e-12), 2)
             + 0.0 AS ms,
           CASE WHEN effect = 'error' THEN NULL
                ELSE round((ssv / df) / mse
                           + sign((ssv / df) / mse) * 1e-9, 4) + 0.0
           END AS f_stat
    FROM eff
    """,
    category="aggregate",
)
def stat_two_way_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-WAY FACTORIAL ANOVA — does order value differ by customer
    REGION, by order PRIORITY, and (the question one-way ANOVA cannot
    ask) does the region effect DEPEND on priority? Main effects,
    interaction and error decompose the total sum of squares; F ratios
    test each against the within-cell error. Cells are near-balanced
    here; for unbalanced data this is the classic proportional
    (sequential) decomposition, stated openly.

    Scale shape: one fact-dim join chain reduces map-side to a 25-cell
    frame of exact integer power sums (cents and cents² in
    HUGEINT/decimal(38)); margins, corrections and all five sums of
    squares are closed forms over cell/margin frames, with the three
    cross-cell float sums folded in key order (region, priority). No
    window, no sort, nothing grows with the corpus past the first
    aggregate."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_totalprice"
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    cents = F.round(F.col("o_totalprice").cast("double") * 100.0).cast("long")
    cells = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            F.col("r_name").alias("region"),
            F.col("o_orderpriority").alias("priority"),
            cents.alias("x"),
        )
        .groupBy("region", "priority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("s"),
            F.sum(
                F.col("x").cast("decimal(38,0)") * F.col("x").cast("decimal(38,0)")
            ).alias("ssq"),
        )
    )
    tot = cells.agg(
        F.sum("n").alias("n"),
        F.sum("s").alias("t"),
        F.sum("ssq").alias("syy"),
        F.count(F.lit(1)).alias("ab"),
        F.countDistinct("region").alias("a"),
        F.countDistinct("priority").alias("b"),
    )
    ma = cells.groupBy("region").agg(F.sum("s").alias("sa"), F.sum("n").alias("na"))
    mb = cells.groupBy("priority").agg(
        F.sum("s").alias("sb_"), F.sum("n").alias("nb")
    )
    fold = (
        "aggregate(transform(array_sort(collect_list(struct({keys}, "
        "cast({num} as double) * {num} / {den} as t))), x -> x.t), "
        "cast(0.0 as double), (p, q) -> p + q)"
    )
    fa = ma.agg(
        F.expr(fold.format(keys="region", num="sa", den="na")).alias("fa")
    )
    fb = mb.agg(
        F.expr(fold.format(keys="priority", num="sb_", den="nb")).alias("fb")
    )
    fc = cells.agg(
        F.expr(fold.format(keys="region, priority", num="s", den="n")).alias("fc")
    )
    ss = (
        tot.crossJoin(F.broadcast(fa))
        .crossJoin(F.broadcast(fb))
        .crossJoin(F.broadcast(fc))
    )
    corr = F.col("t").cast("double") * F.col("t") / F.col("n")
    ss = ss.select(
        "n",
        "a",
        "b",
        "ab",
        (F.col("fa") - corr).alias("ss_a"),
        (F.col("fb") - corr).alias("ss_b"),
        (F.col("fc") - corr).alias("ss_cells"),
        (F.col("syy").cast("double") - corr).alias("ss_tot"),
    ).localCheckpoint(eager=True)
    mse = (F.col("ss_tot") - F.col("ss_cells")) / (F.col("n") - F.col("ab"))
    eff = (
        ss.select(
            F.lit("region").alias("effect"),
            (F.col("a") - 1).cast("long").alias("df"),
            F.col("ss_a").alias("ssv"),
            mse.alias("mse"),
        )
        .unionByName(
            ss.select(
                F.lit("priority").alias("effect"),
                (F.col("b") - 1).cast("long").alias("df"),
                F.col("ss_b").alias("ssv"),
                mse.alias("mse"),
            )
        )
        .unionByName(
            ss.select(
                F.lit("interaction").alias("effect"),
                ((F.col("a") - 1) * (F.col("b") - 1)).cast("long").alias("df"),
                (F.col("ss_cells") - F.col("ss_a") - F.col("ss_b")).alias("ssv"),
                mse.alias("mse"),
            )
        )
        .unionByName(
            ss.select(
                F.lit("error").alias("effect"),
                (F.col("n") - F.col("ab")).cast("long").alias("df"),
                (F.col("ss_tot") - F.col("ss_cells")).alias("ssv"),
                mse.alias("mse"),
            )
        )
    )
    return eff.select(
        "effect",
        "df",
        rnd_nudged_rel(F.col("ssv") / 10000.0, 2).alias("ss"),
        rnd_nudged_rel(F.col("ssv") / F.col("df") / 10000.0, 2).alias("ms"),
        F.when(F.col("effect") == "error", F.lit(None).cast("double"))
        .otherwise(rnd_nudged((F.col("ssv") / F.col("df")) / F.col("mse"), 4))
        .alias("f_stat"),
    )


@query(
    "stat_mcnemar_paired_test",
    # McNemar's test for PAIRED binary outcomes: the same user observed
    # in two periods (first vs second half of the event window, split at
    # the midpoint day). Only the discordant cells b (converted early
    # only) and c (late only) carry information; the continuity-
    # corrected chi-square (|b-c|-1)^2/(b+c) is exact integer arithmetic
    # until one division.
    oracle="""
    WITH bounds AS (
      SELECT min(CAST(ts AS DATE)) AS d0,
             min(CAST(ts AS DATE))
               + CAST((max(CAST(ts AS DATE)) - min(CAST(ts AS DATE))) // 2
                      AS INTEGER) AS mid
      FROM events
    ), u AS (
      SELECT e.user_id,
             max(CASE WHEN e.event_type = 'purchase'
                  AND CAST(e.ts AS DATE) <= b.mid THEN 1 ELSE 0 END) AS p1,
             max(CASE WHEN e.event_type = 'purchase'
                  AND CAST(e.ts AS DATE) > b.mid THEN 1 ELSE 0 END) AS p2
      FROM events e CROSS JOIN bounds b
      GROUP BY e.user_id
    ), cells AS (
      SELECT count(*) AS n,
             sum(CASE WHEN p1 = 1 AND p2 = 1 THEN 1 ELSE 0 END) AS both_,
             sum(CASE WHEN p1 = 0 AND p2 = 0 THEN 1 ELSE 0 END) AS neither,
             sum(CASE WHEN p1 = 1 AND p2 = 0 THEN 1 ELSE 0 END) AS b,
             sum(CASE WHEN p1 = 0 AND p2 = 1 THEN 1 ELSE 0 END) AS c
      FROM u
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           CAST(both_ AS BIGINT) AS converted_both,
           CAST(neither AS BIGINT) AS converted_neither,
           CAST(b AS BIGINT) AS early_only,
           CAST(c AS BIGINT) AS late_only,
           round(CASE WHEN b + c = 0 THEN 0.0
                 ELSE (abs(b - c) - 1.0) * (abs(b - c) - 1.0) / (b + c)
                 END, 4) + 0.0 AS chi2_continuity,
           round(CASE WHEN b + c = 0 THEN 0.0
                 ELSE CAST(b AS DOUBLE) / (b + c) END, 6) + 0.0
             AS early_share_of_switchers
    FROM cells
    """,
    category="aggregate",
)
def stat_mcnemar_paired_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNEMAR'S TEST for paired binary outcomes — did per-user
    purchase behavior CHANGE between the first and second half of the
    window? Unlike the two-proportion z-test (which treats the periods
    as independent samples), McNemar pairs each user with themselves:
    concordant users cancel out and only the discordant counts b
    (early-only) and c (late-only) drive the continuity-corrected
    chi-square — the right test for before/after product changes on
    the same population.

    Scale shape: one 2-row broadcast of the window midpoint, ONE
    per-user conditional aggregate (map-side combined), and a 1-row
    cell frame; every statistic is exact integer arithmetic until the
    final two divisions."""
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.expr(
            "cast(min(cast(ts as date)) + cast(datediff(max(cast(ts as date)), "
            "min(cast(ts as date))) div 2 as int) as date)"
        ).alias("mid"),
    )
    u = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts").cast("date") <= F.col("mid")),
                    1,
                ).otherwise(0)
            ).alias("p1"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts").cast("date") > F.col("mid")),
                    1,
                ).otherwise(0)
            ).alias("p2"),
        )
    )
    cells = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when((F.col("p1") == 1) & (F.col("p2") == 1), 1).otherwise(0)).alias("both_"),
        F.sum(F.when((F.col("p1") == 0) & (F.col("p2") == 0), 1).otherwise(0)).alias("neither"),
        F.sum(F.when((F.col("p1") == 1) & (F.col("p2") == 0), 1).otherwise(0)).alias("b"),
        F.sum(F.when((F.col("p1") == 0) & (F.col("p2") == 1), 1).otherwise(0)).alias("c"),
    )
    bc = F.col("b") + F.col("c")
    ad = F.abs(F.col("b") - F.col("c"))
    return cells.select(
        F.col("n").cast("long").alias("n_users"),
        F.col("both_").cast("long").alias("converted_both"),
        F.col("neither").cast("long").alias("converted_neither"),
        F.col("b").cast("long").alias("early_only"),
        F.col("c").cast("long").alias("late_only"),
        (
            F.round(
                F.when(bc == 0, F.lit(0.0)).otherwise(
                    (ad - F.lit(1.0)) * (ad - F.lit(1.0)) / bc
                ),
                4,
            )
            + F.lit(0.0)
        ).alias("chi2_continuity"),
        (
            F.round(
                F.when(bc == 0, F.lit(0.0)).otherwise(
                    F.col("b").cast("double") / bc
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("early_share_of_switchers"),
    )


@query(
    "quality_l_diversity",
    # distinct-l-diversity over the same QI classes as quality_k_anonymity:
    # pure integer counts — classes collapse first, sensitive diversity is
    # a count distinct per class, thresholds fan out over the tiny frame.
    oracle="""
    WITH cls AS (
      SELECT c_nationkey, c_mktsegment,
             count(*) AS class_size,
             count(DISTINCT CAST(floor(c_acctbal / 1000.0) AS INT))
               AS n_sensitive
      FROM customer GROUP BY c_nationkey, c_mktsegment
    ), agg AS (
      SELECT l.l,
             count(*) AS n_classes,
             sum(class_size) AS n_rows,
             min(n_sensitive) AS min_diversity,
             sum(CASE WHEN n_sensitive < l.l THEN 1 ELSE 0 END)
               AS classes_below_l,
             sum(CASE WHEN n_sensitive < l.l THEN class_size ELSE 0 END)
               AS rows_below_l
      FROM cls CROSS JOIN (VALUES (2), (3), (5)) l(l)
      GROUP BY l.l
    )
    SELECT CAST(l AS INT) AS l,
           CAST(n_classes AS BIGINT) AS n_classes,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(min_diversity AS BIGINT) AS min_diversity,
           CAST(classes_below_l AS BIGINT) AS classes_below_l,
           CAST(rows_below_l AS BIGINT) AS rows_at_risk,
           round(100.0e0 * rows_below_l / n_rows, 4) + 0.0 AS pct_rows_at_risk,
           CAST(min_diversity >= l AS INT) AS is_l_diverse
    FROM agg
    """,
    category="aggregate",
)
def quality_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct l-DIVERSITY audit (Machanavajjhala 2007) over the same
    quasi-identifier classes as `quality_k_anonymity`, with the account-
    balance band (1000-unit buckets) as the sensitive attribute: a class
    can be k-anonymous yet leak everything if all its members share one
    sensitive value — l-diversity requires >= l DISTINCT sensitive values
    per class. For l in {2, 3, 5}: classes below l, rows they expose, and
    whether the release is l-diverse. The two audits together are the
    standard pre-release privacy gate pair.

    Shape: ONE groupBy collapses the corpus to |QI classes| rows (count
    distinct folds map-side per class); thresholds fan out over that tiny
    frame. Pure integer arithmetic — no rounding bridge needed beyond the
    one percentage."""
    cust = load(spark, sf_dir, "customer")
    cls = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("class_size"),
        F.countDistinct(
            F.floor(F.col("c_acctbal") / 1000.0).cast("int")
        ).alias("n_sensitive"),
    )
    ls = spark.createDataFrame([(2,), (3,), (5,)], "l int")
    agg = cls.crossJoin(F.broadcast(ls)).groupBy("l").agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("class_size").alias("n_rows"),
        F.min("n_sensitive").alias("min_diversity"),
        F.sum(F.when(F.col("n_sensitive") < F.col("l"), 1).otherwise(0)).alias(
            "classes_below_l"
        ),
        F.sum(
            F.when(F.col("n_sensitive") < F.col("l"), F.col("class_size")).otherwise(0)
        ).alias("rows_below_l"),
    )
    return agg.select(
        F.col("l").cast("int").alias("l"),
        F.col("n_classes").cast("long").alias("n_classes"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("min_diversity").cast("long").alias("min_diversity"),
        F.col("classes_below_l").cast("long").alias("classes_below_l"),
        F.col("rows_below_l").cast("long").alias("rows_at_risk"),
        rnd(F.lit(100.0) * F.col("rows_below_l") / F.col("n_rows"), 4).alias(
            "pct_rows_at_risk"
        ),
        (F.col("min_diversity") >= F.col("l")).cast("int").alias("is_l_diverse"),
    )


@query(
    "quality_benford_law_audit",
    # first significant digit histogram vs Benford expectation: counts are
    # exact integers off one map-side aggregate; expected shares use
    # nudge-rounded log10 (the transcendental recipe); chi-square folds in
    # digit order over 9 cells.
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(round(CAST(o_totalprice AS DOUBLE) * 100.0)
                  AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders
      WHERE o_totalprice > 0
    ), h AS (
      SELECT digit, count(*) AS n FROM d GROUP BY digit
    ), t AS (
      SELECT sum(n) AS total FROM h
    ), e AS (
      SELECT h.digit, h.n, t.total,
             round(log10(1e0 + 1e0 / h.digit)
                   + sign(log10(1e0 + 1e0 / h.digit)) * 1e-9, 8) + 0.0 AS p_exp
      FROM h CROSS JOIN t
    )
    SELECT CAST(digit AS INT) AS digit,
           CAST(n AS BIGINT) AS n,
           round(CAST(n AS DOUBLE) / total, 6) + 0.0 AS p_observed,
           p_exp AS p_expected,
           round((CAST(n AS DOUBLE) - total * p_exp)
                 * (CAST(n AS DOUBLE) - total * p_exp)
                 / (total * p_exp), 6) + 0.0 AS chi2_term
    FROM e
    """,
    category="aggregate",
)
def quality_benford_law_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENFORD'S-LAW first-digit audit of order totals — the classic
    fabricated-data detector: naturally occurring multi-scale amounts
    follow P(d) = log10(1 + 1/d), and a synthetic or manipulated column
    deviates visibly (uniform TPC-H prices do, and the audit says so —
    the honest answer, exactly like the flat periodogram). Emits the
    per-digit observed/expected shares and chi-square terms so the
    caller thresholds Σχ² at any significance.

    Scale shape (100 TB): the first significant digit comes from exact
    integer-cents string arithmetic (no float log for binning), the
    histogram is ONE map-side-combined 9-cell aggregate, and the only
    transcendental (log10 of 9 constants) is nudge-rounded before use.
    Reference analogue: the data-quality gate family
    (`src/data/preprocessing.py` sanity checks), upgraded to a
    statistical audit."""
    orders = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    d = orders.select(
        F.substring(
            F.round(F.col("o_totalprice").cast("double") * 100.0)
            .cast("long")
            .cast("string"),
            1,
            1,
        )
        .cast("int")
        .alias("digit")
    )
    h = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    t = h.agg(F.sum("n").alias("total"))
    lg = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    p_exp = F.round(lg + F.signum(lg) * F.lit(1e-9), 8) + F.lit(0.0)
    e = h.crossJoin(F.broadcast(t)).withColumn("p_exp", p_exp)
    dev = F.col("n").cast("double") - F.col("total") * F.col("p_exp")
    return e.select(
        F.col("digit").cast("int").alias("digit"),
        F.col("n").cast("long").alias("n"),
        (F.round(F.col("n").cast("double") / F.col("total"), 6) + F.lit(0.0)).alias(
            "p_observed"
        ),
        F.col("p_exp").alias("p_expected"),
        (
            F.round(dev * dev / (F.col("total") * F.col("p_exp")), 6) + F.lit(0.0)
        ).alias("chi2_term"),
    )


@query(
    "stat_srm_sample_ratio_check",
    # 50/50 md5-bucket assignment; chi-square collapses to (na-nb)²/N —
    # pure integers until two scalar divisions. Checked at BOTH the user
    # grain (the randomization unit — should pass) and the event grain
    # (the classic false-alarm grain — activity skew inflates it).
    oracle="""
    WITH u AS (
      SELECT DISTINCT user_id FROM events
    ), arm_u AS (
      SELECT user_id,
             CASE WHEN ('0x' || substr(md5('srm:'
                  || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 50
                  THEN 1 ELSE 0 END AS arm
      FROM u
    ), lvls AS (
      SELECT 'users' AS unit,
             sum(arm) AS na, sum(1 - arm) AS nb
      FROM arm_u
      UNION ALL
      SELECT 'events' AS unit,
             sum(a.arm) AS na, sum(1 - a.arm) AS nb
      FROM events e JOIN arm_u a ON e.user_id = a.user_id
    )
    SELECT unit,
           CAST(na AS BIGINT) AS n_treat,
           CAST(nb AS BIGINT) AS n_control,
           round(CAST(na AS DOUBLE) / (na + nb), 6) + 0.0 AS treat_share,
           round(CAST((na - nb) * (na - nb) AS DOUBLE) / (na + nb), 6) + 0.0
             AS chi2,
           CAST(CAST((na - nb) * (na - nb) AS DOUBLE) / (na + nb) > 3.841
                AS INT) AS srm_flag
    FROM lvls
    """,
    category="aggregate",
)
def stat_srm_sample_ratio_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAMPLE-RATIO-MISMATCH check for a 50/50 md5-bucketed experiment —
    the first gate every A/B readout must pass (Kohavi: a failed SRM
    invalidates the experiment before any metric is read): chi-square of
    observed arm counts against the declared split, which for 50/50
    collapses to (n_a−n_b)²/N. Audited at TWO grains: the user grain
    (the randomization unit — should pass) and the event grain (the
    classic false-alarm grain: per-user activity skew inflates the
    statistic even under perfect randomization — the query demonstrates
    WHY SRM must be tested at the assignment unit).

    Scale shape (100 TB): distinct users (map-side), one hash per user,
    two 1-row combines; the event-grain leg is a broadcast-joinable arm
    map over one fact scan. Integer-exact until two scalar divisions."""
    ev = load(spark, sf_dir, "events")
    u = ev.select("user_id").distinct()
    h = (
        "cast(conv(substr(md5(concat('srm:', cast(user_id as string))), "
        "1, 15), 16, 10) as bigint)"
    )
    arm_u = u.select(
        "user_id",
        F.when(F.expr(h) % 100 < 50, 1).otherwise(0).alias("arm"),
    )
    users = arm_u.agg(
        F.sum("arm").alias("na"), F.sum(F.lit(1) - F.col("arm")).alias("nb")
    ).select(F.lit("users").alias("unit"), "na", "nb")
    events = (
        ev.join(F.broadcast(arm_u), "user_id")
        .agg(
            F.sum("arm").alias("na"),
            F.sum(F.lit(1) - F.col("arm")).alias("nb"),
        )
        .select(F.lit("events").alias("unit"), "na", "nb")
    )
    lvls = users.unionByName(events)
    d = F.col("na") - F.col("nb")
    n = F.col("na") + F.col("nb")
    chi2 = (d * d).cast("double") / n
    return lvls.select(
        "unit",
        F.col("na").cast("long").alias("n_treat"),
        F.col("nb").cast("long").alias("n_control"),
        (F.round(F.col("na").cast("double") / n, 6) + F.lit(0.0)).alias(
            "treat_share"
        ),
        (F.round(chi2, 6) + F.lit(0.0)).alias("chi2"),
        (chi2 > 3.841).cast("int").alias("srm_flag"),
    )


@query(
    "stat_negative_binomial_mom",
    # method-of-moments NB fit on per-user purchase counts: μ and σ² from
    # exact integer power sums (order-free), closed forms in one identical
    # double chain; the dispersion index is the Poisson-adequacy verdict.
    oracle="""
    WITH c AS (
      SELECT user_id,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS k
      FROM events GROUP BY user_id
    ), m AS (
      SELECT count(*) AS n, sum(k) AS s1, sum(k * k) AS s2 FROM c
    ), est AS (
      SELECT n, s1, s2,
             CAST(s1 AS DOUBLE) / n AS mu,
             CAST(s2 AS DOUBLE) / n
               - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS v
      FROM m
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           round(mu, 6) + 0.0 AS mean_purchases,
           round(v, 6) + 0.0 AS variance,
           round(v / mu, 6) + 0.0 AS dispersion_index,
           CAST(v > mu AS INT) AS overdispersed,
           round(CASE WHEN v > mu THEN mu * mu / (v - mu) ELSE 0.0 END, 6)
             + 0.0 AS nb_r,
           round(CASE WHEN v > mu THEN mu / v ELSE 1.0 END, 6) + 0.0 AS nb_p
    FROM est
    """,
    category="aggregate",
)
def stat_negative_binomial_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEGATIVE-BINOMIAL method-of-moments fit of per-user purchase
    counts — the standard overdispersion upgrade of a Poisson rate model
    (real user activity almost always has variance > mean; modeling it
    Poisson under-covers the tail): dispersion index σ²/μ as the
    verdict, and the closed-form MoM parameters r = μ²/(σ²−μ),
    p = μ/σ² when overdispersed — the distribution a synthetic-data or
    simulation layer would then sample user activity from. Both moments
    come from exact INTEGER power sums in ONE map-side aggregate, so the
    estimates are deterministic with no fold anywhere.

    Scale shape (100 TB): one user aggregate, one 1-row combine, pure
    closed forms. Companion: `events_interarrival_exponential_fit`
    (timing) and `stat_cusum_changepoint` (rate shifts)."""
    ev = load(spark, sf_dir, "events")
    c = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "k"
        )
    )
    m = c.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("s1"),
        F.sum(F.col("k") * F.col("k")).alias("s2"),
    )
    mu = F.col("s1").cast("double") / F.col("n")
    v = F.col("s2").cast("double") / F.col("n") - mu * mu
    est = m.select(
        F.col("n").cast("long").alias("n_users"),
        (F.round(mu, 6) + F.lit(0.0)).alias("mean_purchases"),
        (F.round(v, 6) + F.lit(0.0)).alias("variance"),
        (F.round(v / mu, 6) + F.lit(0.0)).alias("dispersion_index"),
        (v > mu).cast("int").alias("overdispersed"),
        (
            F.round(
                F.when(v > mu, mu * mu / (v - mu)).otherwise(0.0), 6
            )
            + F.lit(0.0)
        ).alias("nb_r"),
        (
            F.round(F.when(v > mu, mu / v).otherwise(1.0), 6) + F.lit(0.0)
        ).alias("nb_p"),
    )
    return est


@query(
    "quality_dp_noisy_release",
    # same hash60-derived uniform, same inverse-CDF algebra, ln output
    # nudge-rounded to 8 in BOTH engines before the product (the
    # transcendental-base determinism recipe)
    oracle="""
    WITH eps AS (
      SELECT * FROM (VALUES ('e1', 1.0), ('e01', 0.1)) AS t(tag, eps)
    ), base AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_true
      FROM events GROUP BY event_type
    ), g AS (
      SELECT b.event_type, e.tag, e.eps, b.n_true,
             (CAST(('0x' || substr(md5('dp:' || e.tag || ':' || b.event_type), 1, 15))::BIGINT
                   % 1099511627776 AS DOUBLE) + 0.5) / 1099511627776.0 AS u
      FROM base b CROSS JOIN eps e
    ), n AS (
      SELECT event_type, tag, eps, n_true,
             -(1.0 / eps) * sign(u - 0.5)
               * (round(ln(1.0 - 2.0 * abs(u - 0.5))
                        + sign(ln(1.0 - 2.0 * abs(u - 0.5))) * 1e-9, 8) + 0.0)
               AS noise
      FROM g
    )
    SELECT event_type, tag AS eps_tag,
           round(eps, 2) + 0.0 AS eps, n_true,
           round(n_true + noise, 4) + 0.0 AS n_noisy,
           round(abs(noise), 4) + 0.0 AS abs_err
    FROM n
    """,
    category="aggregate",
)
def quality_dp_noisy_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENTIALLY-PRIVATE count release (Laplace mechanism,
    sensitivity 1) with the measured noise alongside — the
    privacy-preserving stats publication layer a data platform puts in
    front of raw group-bys, audited at two budgets (eps = 1.0 / 0.1, so
    the 1/eps error scaling is visible in the output). Noise is
    DETERMINISTIC for the harness: the Laplace draw comes from the
    inverse CDF of a hash60-derived uniform (exact 40-bit integer -> the
    same double in both engines), with the single transcendental (ln)
    nudge-rounded to 8 digits before the product — the periodogram
    recipe — so every released value hash-matches. A production release
    swaps the hashed uniform for a real RNG; everything else is this
    exact algebra.

    Scale shape (100 TB): one map-side-combined count per group; noise
    is O(|groups| x |budgets|) scalar arithmetic. Companions:
    `quality_k_anonymity` / `quality_l_diversity` (the suppression-based
    alternatives), `stat_srm_sample_ratio_check` (release sanity)."""
    ev = load(spark, sf_dir, "events")
    base = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_true")
    )
    eps = spark.createDataFrame([("e1", 1.0), ("e01", 0.1)], "tag string, eps double")
    h60 = F.expr(
        "cast(conv(substr(md5(concat('dp:', tag, ':', event_type)), 1, 15), 16, 10) as bigint)"
    )
    g = base.crossJoin(F.broadcast(eps)).withColumn(
        "u",
        ((h60 % F.lit(1099511627776)).cast("double") + F.lit(0.5))
        / F.lit(1099511627776.0),
    )
    lnexpr = F.log(F.lit(1.0) - 2.0 * F.abs(F.col("u") - 0.5))
    ln_nudged = F.round(lnexpr + F.signum(lnexpr) * F.lit(1e-9), 8) + F.lit(0.0)
    noise = -(1.0 / F.col("eps")) * F.signum(F.col("u") - 0.5) * ln_nudged
    return g.select(
        "event_type",
        F.col("tag").alias("eps_tag"),
        (F.round("eps", 2) + F.lit(0.0)).alias("eps"),
        "n_true",
        (F.round(F.col("n_true") + noise, 4) + F.lit(0.0)).alias("n_noisy"),
        (F.round(F.abs(noise), 4) + F.lit(0.0)).alias("abs_err"),
    )


@query(
    "quality_t_closeness",
    # EMD numerators are exact integers: |cum_class*total - cum_global*
    # class_size| needs no common-denominator float until the single
    # final division, so per-class EMD is bit-identical on both engines.
    oracle="""
    WITH base AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000.0) AS INT) AS sv
      FROM customer
    ), cls AS (
      SELECT c_nationkey, c_mktsegment, count(*) AS class_size
      FROM base GROUP BY c_nationkey, c_mktsegment
    ), buckets AS (
      SELECT DISTINCT sv FROM base
    ), m AS (
      SELECT count(*) AS m, (SELECT count(*) FROM base) AS total FROM buckets
    ), gv AS (
      SELECT sv, count(*) AS g_cnt FROM base GROUP BY sv
    ), cv AS (
      SELECT c_nationkey, c_mktsegment, sv, count(*) AS c_cnt
      FROM base GROUP BY c_nationkey, c_mktsegment, sv
    ), grid AS (
      SELECT cls.c_nationkey, cls.c_mktsegment, cls.class_size,
             b.sv, coalesce(cv.c_cnt, 0) AS c_cnt, gv.g_cnt
      FROM cls CROSS JOIN buckets b
      JOIN gv ON gv.sv = b.sv
      LEFT JOIN cv ON cv.c_nationkey = cls.c_nationkey
                  AND cv.c_mktsegment = cls.c_mktsegment
                  AND cv.sv = b.sv
    ), cum AS (
      SELECT c_nationkey, c_mktsegment, class_size,
             sum(c_cnt) OVER w AS cum_c,
             sum(g_cnt) OVER w AS cum_g
      FROM grid
      WINDOW w AS (PARTITION BY c_nationkey, c_mktsegment ORDER BY sv)
    ), emd AS (
      SELECT c_nationkey, c_mktsegment, class_size,
             CAST(sum(abs(cum_c * m.total - cum_g * class_size)) AS DOUBLE)
               / (CAST(class_size AS DOUBLE) * m.total * (m.m - 1)) AS emd
      FROM cum CROSS JOIN m
      GROUP BY c_nationkey, c_mktsegment, class_size, m.total, m.m
    ), audit AS (
      SELECT t.t,
             count(*) AS n_classes,
             sum(class_size) AS n_rows,
             max(emd) AS max_emd,
             sum(CASE WHEN emd > t.t THEN 1 ELSE 0 END) AS classes_above_t,
             sum(CASE WHEN emd > t.t THEN class_size ELSE 0 END) AS rows_above_t
      FROM emd CROSS JOIN (VALUES (0.15), (0.25), (0.35)) t(t)
      GROUP BY t.t
    )
    SELECT round(t, 2) + 0.0 AS t,
           CAST(n_classes AS BIGINT) AS n_classes,
           CAST(n_rows AS BIGINT) AS n_rows,
           round(max_emd, 6) + 0.0 AS max_emd,
           CAST(classes_above_t AS BIGINT) AS classes_above_t,
           CAST(rows_above_t AS BIGINT) AS rows_at_risk,
           round(100.0e0 * rows_above_t / n_rows, 4) + 0.0 AS pct_rows_at_risk,
           CAST(max_emd <= t AS INT) AS is_t_close
    FROM audit
    """,
    category="aggregate",
)
def quality_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-CLOSENESS audit (Li et al. 2007) — the third pre-release privacy
    gate after `quality_k_anonymity` and `quality_l_diversity` over the
    same quasi-identifier classes: a class can be k-anonymous AND
    l-diverse yet still leak if its sensitive-value DISTRIBUTION differs
    sharply from the global one. For the ordered sensitive attribute
    (acctbal 1000-unit band), the Earth Mover's Distance reduces to the
    mean absolute cumulative-share gap: EMD = Σ|cumP_class − cumP_global|
    / (m−1). For t ∈ {0.15, 0.25, 0.35}: classes above t, rows they
    expose, and whether the release is t-close.

    Scale shape: two map-side-combined aggregates collapse the corpus to
    the (class, bucket) histogram and the global bucket histogram; the
    dense grid, cumulative windows, and EMD all run over |classes|×|m|
    rows (hundreds), never over the corpus. Exactness: the cumulative
    gap is computed as the INTEGER |cum_c·total − cum_g·class_size|
    before the one final division, so EMD carries no summation jitter."""
    base = load(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("int").alias("sv"),
    )
    cls = base.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("class_size")
    )
    gv = base.groupBy("sv").agg(F.count(F.lit(1)).alias("g_cnt"))
    cv = base.groupBy("c_nationkey", "c_mktsegment", "sv").agg(
        F.count(F.lit(1)).alias("c_cnt")
    )
    consts = base.agg(
        F.count(F.lit(1)).alias("total"), F.countDistinct("sv").alias("m")
    )
    grid = (
        cls.crossJoin(F.broadcast(gv.select("sv", "g_cnt")))
        .join(
            cv,
            ["c_nationkey", "c_mktsegment", "sv"],
            "left",
        )
        .withColumn("c_cnt", F.coalesce(F.col("c_cnt"), F.lit(0)))
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("sv")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = grid.select(
        "c_nationkey",
        "c_mktsegment",
        "class_size",
        F.sum("c_cnt").over(w).alias("cum_c"),
        F.sum("g_cnt").over(w).alias("cum_g"),
    )
    emd = (
        cum.crossJoin(F.broadcast(consts))
        .groupBy("c_nationkey", "c_mktsegment", "class_size", "total", "m")
        .agg(
            F.sum(
                F.abs(
                    F.col("cum_c") * F.col("total")
                    - F.col("cum_g") * F.col("class_size")
                )
            ).alias("gap")
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "class_size",
            (
                F.col("gap").cast("double")
                / (
                    F.col("class_size").cast("double")
                    * F.col("total")
                    * (F.col("m") - 1)
                )
            ).alias("emd"),
        )
    )
    ts = spark.createDataFrame([(0.15,), (0.25,), (0.35,)], "t double")
    audit = emd.crossJoin(F.broadcast(ts)).groupBy("t").agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("class_size").alias("n_rows"),
        F.max("emd").alias("max_emd"),
        F.sum(F.when(F.col("emd") > F.col("t"), 1).otherwise(0)).alias(
            "classes_above_t"
        ),
        F.sum(
            F.when(F.col("emd") > F.col("t"), F.col("class_size")).otherwise(0)
        ).alias("rows_above_t"),
    )
    return audit.select(
        rnd(F.col("t"), 2).alias("t"),
        F.col("n_classes").cast("long").alias("n_classes"),
        F.col("n_rows").cast("long").alias("n_rows"),
        rnd(F.col("max_emd"), 6).alias("max_emd"),
        F.col("classes_above_t").cast("long").alias("classes_above_t"),
        F.col("rows_above_t").cast("long").alias("rows_at_risk"),
        rnd(F.lit(100.0) * F.col("rows_above_t") / F.col("n_rows"), 4).alias(
            "pct_rows_at_risk"
        ),
        (F.col("max_emd") <= F.col("t")).cast("int").alias("is_t_close"),
    )
