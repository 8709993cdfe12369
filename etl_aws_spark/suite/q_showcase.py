"""Composed multi-way-join showcase queries (TPC-H Q3/Q5 shapes on the
driver's TPC-H-ish fixtures).

The reference never joins more than two tables; these demonstrate that the
engine surface composes to classic warehouse workloads — Catalyst handles
join ordering, broadcast selection for the dimension chain, and partial
aggregation with no hand-holding."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_aws_spark.registry import load, query
from etl_aws_spark.suite._util import rnd


@query(
    "showcase_topk_revenue_3way",
    oracle="""
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) + 0.0 AS revenue,
           CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-06-01'
      AND l.l_shipdate > TIMESTAMP '1997-06-01'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
    category="showcase",
)
def showcase_topk_revenue_3way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, filtered on every table, grouped revenue,
    deterministic top-k. Filters push to all three scans; customer
    broadcasts; the orders⋈lineitem shuffle is the only wide exchange."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1997-06-01")
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1997-06-01")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


@query(
    "showcase_regional_revenue_5way",
    oracle="""
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) + 0.0 AS revenue
    FROM region r
    JOIN nation n ON r.r_regionkey = n.n_regionkey
    JOIN customer c ON n.n_nationkey = c.c_nationkey
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
    category="showcase",
)
def showcase_regional_revenue_5way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (minus the supplier leg the fixtures can't close):
    region→nation→customer dimension chain folds into broadcast joins; only
    orders⋈lineitem shuffles."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    return (
        r.join(n, r.r_regionkey == n.n_regionkey)
        .join(c, n.n_nationkey == c.c_nationkey)
        .join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("n_name")
        .agg(
            rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
        )
    )


@query(
    "showcase_promo_revenue_ratio",
    oracle="""
    SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS month,
           round(100.0 * sum(CASE WHEN p_type = 'ECONOMY'
                             THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) + 0.0 AS economy_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
    category="showcase",
)
def showcase_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregate ratio over a dim join with a
    date-range filter — the filter reaches the lineitem scan as a pushed
    predicate, `part` broadcasts, and the CASE rides the partial aggregate
    (monthly promo-revenue share, the marketing-mix rollup)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    return (
        joined.groupBy(F.date_trunc("month", "l_shipdate").alias("month"))
        .agg(
            rnd(
                100.0
                * F.sum(F.when(F.col("p_type") == "ECONOMY", rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                4,
            ).alias("economy_pct")
        )
    )


@query(
    "showcase_large_volume_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, round(sum(l_quantity), 4) + 0.0 AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
           round(o.o_totalprice, 2) + 0.0 AS o_totalprice,
           b.total_qty
    FROM big b
    JOIN orders o ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
    LIMIT 20
    """,
    category="showcase",
)
def showcase_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate-then-join — the HAVING pre-aggregate
    shrinks lineitem to the qualifying orderkeys BEFORE any join, so the
    expensive fact⋈fact becomes a join against a tiny filtered aggregate
    (broadcast-able), then the customer dim attaches. The
    aggregate-first ordering is the whole point of the shape: joining raw
    lineitem to orders first would shuffle the full fact table."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 150)
        .select("l_orderkey", rnd(F.col("_q"), 4).alias("total_qty"))
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            rnd(F.col("o_totalprice"), 2).alias("o_totalprice"),
            "total_qty",
        )
    )


@query(
    "showcase_order_priority_count",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
    """,
    category="showcase",
)
def showcase_order_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: date-windowed orders, EXISTS-filtered by a mixed
    equi + non-equi condition (any lineitem shipped after the order date),
    counted per priority. The LEFT SEMI join carries the extra theta
    predicate on the equi-join hash match, emits each order at most once,
    and never materializes lineitem columns — the date filter prunes the
    orders scan first."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = load(spark, sf_dir, "lineitem")
    qualified = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"]) & (li["l_shipdate"] > o["o_orderdate"]),
        "left_semi",
    )
    return qualified.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
