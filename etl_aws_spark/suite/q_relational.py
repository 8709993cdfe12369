"""SURVEY §2.2 (projections/filters), §2.3 (joins), §2.7 (set ops)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_aws_spark.functions import normalize_key
from etl_aws_spark.operators import relational as rel
from etl_aws_spark.registry import load, query
from etl_aws_spark.suite._util import rnd

# ---- projections --------------------------------------------------------


@query(
    "project_select",
    oracle="SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice, l_shipdate FROM lineitem",
    category="projection",
)
def project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit projection (`glue.py:140-162`); reaches the parquet scan as
    ReadSchema pruning — only these 5 columns are decoded."""
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "l_shipdate"
    )


@query(
    "project_rename",
    oracle="""
    SELECT o_orderkey AS pedido, o_custkey AS cliente, o_totalprice AS valor_total,
           o_orderdate AS data_pedido, o_orderstatus AS status
    FROM orders
    """,
    category="projection",
)
def project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk rename in one projection node (`glue.py:113-128` chains 16)."""
    df = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate", "o_orderstatus"
    )
    return rel.rename_columns(
        df,
        {
            "o_orderkey": "pedido",
            "o_custkey": "cliente",
            "o_totalprice": "valor_total",
            "o_orderdate": "data_pedido",
            "o_orderstatus": "status",
        },
    )


@query(
    "project_rename_all_lower",
    oracle="SELECT p_partkey, p_brand, p_retailprice FROM part",
    category="projection",
)
def project_rename_all_lower(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lowercase every column name (`glue.py:102-103`) — demonstrated by
    first aliasing to the mixed case the raw yfinance frames carry."""
    df = load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("P_PartKey"),
        F.col("p_brand").alias("P_Brand"),
        F.col("p_retailprice").alias("P_RetailPrice"),
    )
    return rel.lowercase_columns(df)


@query(
    "project_drop",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount,
           l_tax, l_returnflag, l_linestatus, l_shipdate
    FROM lineitem
    """,
    category="projection",
)
def project_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column drop (`glue.py:226`) — Catalyst folds it into scan pruning."""
    return load(spark, sf_dir, "lineitem").drop("l_partkey", "l_suppkey")


# ---- filters ------------------------------------------------------------


@query(
    "filter_range_conjunctive",
    oracle="""
    SELECT * FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31 23:59:59'
      AND l_quantity >= 10.0 AND l_quantity <= 40.0
    """,
    category="filter",
)
def filter_range_conjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive range predicate (`glue.py:78-83`), expressed as BETWEEN
    on the actual date column so year boundaries can't zero it out; both
    conjuncts reach the parquet scan as PushedFilters."""
    df = rel.filter_date_range(
        load(spark, sf_dir, "lineitem"), "l_shipdate", "1996-01-01", "1996-12-31 23:59:59"
    )
    return df.filter((F.col("l_quantity") >= 10.0) & (F.col("l_quantity") <= 40.0))


@query(
    "filter_equality",
    oracle="SELECT * FROM orders WHERE o_orderstatus = 'F' AND o_orderpriority = '1-URGENT'",
    category="filter",
)
def filter_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality selection (`glue.py:96,169`, `visualize.py:35,79`)."""
    df = load(spark, sf_dir, "orders")
    return df.filter((F.col("o_orderstatus") == "F") & (F.col("o_orderpriority") == "1-URGENT"))


@query(
    "filter_not_null",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o
    LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 1000.0) c
      ON o.o_custkey = c.c_custkey
    WHERE c.c_name IS NOT NULL
    """,
    category="filter",
)
def filter_not_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-success check: left join then isNotNull on a dim attribute
    (`glue.py:137`)."""
    dim = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 1000.0)
    joined = rel.left_join_dim(
        load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        dim.select("c_custkey", "c_name", "c_mktsegment"),
        "o_custkey",
        "c_custkey",
    )
    return joined.filter(F.col("c_name").isNotNull())


@query(
    "filter_date_cutoff",
    oracle="""
    SELECT o_orderkey, o_orderdate,
           CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 'train' ELSE 'test' END AS split
    FROM orders
    """,
    category="filter",
)
def filter_date_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal train/test cutoff (`train.py:73-79`) in one labeled pass."""
    df = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return rel.split_by_cutoff(df, "o_orderdate", "1998-01-01")


# ---- joins --------------------------------------------------------------


@query(
    "join_left_equi_dim",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_custkey, c.c_name, c.c_mktsegment, c.c_acctbal
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    category="join",
)
def join_left_equi_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left equi-join fact -> broadcast dimension (`glue.py:134`). The dim
    is hinted broadcast: no shuffle of the fact side (BroadcastHashJoin)."""
    return rel.left_join_dim(
        load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice", "o_custkey"),
        load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment", "c_acctbal"),
        "o_custkey",
        "c_custkey",
    )


@query(
    "join_key_normalize",
    oracle="""
    WITH dirty AS (
      SELECT upper(concat('  ', n_name, ' ')) AS dirty_name, n_regionkey AS dim_regionkey
      FROM nation
    )
    SELECT n.n_nationkey, n.n_name, d.dim_regionkey
    FROM nation n
    LEFT JOIN dirty d
      ON lower(trim(d.dirty_name)) = lower(trim(n.n_name))
    """,
    category="join",
)
def join_key_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key normalization before joining (`glue.py:131-132`): the dimension
    side carries the reference CSV's real defects (leading spaces, wrong
    case) and still matches via lower(trim(cast))."""
    nation = load(spark, sf_dir, "nation")
    dirty = nation.select(
        F.upper(F.concat(F.lit("  "), F.col("n_name"), F.lit(" "))).alias("dirty_name"),
        F.col("n_regionkey").alias("dim_regionkey"),
    )
    joined = nation.select("n_nationkey", "n_name").join(
        F.broadcast(dirty),
        normalize_key(F.col("dirty_name")) == normalize_key(F.col("n_name")),
        "left",
    )
    return joined.select("n_nationkey", "n_name", "dim_regionkey")


@query(
    "join_left_multi_key",
    oracle="""
    SELECT p.p_partkey, p.p_brand, p.p_type, g.n_in_group
    FROM part p
    LEFT JOIN (
      SELECT p_brand, p_type, count(*) AS n_in_group FROM part GROUP BY p_brand, p_type
    ) g ON p.p_brand = g.p_brand AND p.p_type = g.p_type
    """,
    category="join",
)
def join_left_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-key left join attaching group sizes
    (`preprocessing.py:104-106`). The aggregate side is broadcast."""
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_type")
    return rel.attach_group_counts(part, ["p_brand", "p_type"]).select(
        "p_partkey", "p_brand", "p_type", "n_in_group"
    )


@query(
    "join_broadcast_scalar_row",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_suppkey, l.l_quantity, s.s_acctbal, s.s_name
    FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
    """,
    category="join",
)
def join_broadcast_scalar_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replicate one scalar row per key across all fact rows of that key
    (`webscrapping.py:41-46` repeats a ticker's fundamentals over its whole
    history) — a broadcast left join, not a per-row python loop."""
    return rel.left_join_dim(
        load(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_suppkey", "l_quantity"),
        load(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal", "s_name"),
        "l_suppkey",
        "s_suppkey",
    )


# ---- set ops ------------------------------------------------------------


@query(
    "union_concat",
    oracle="""
    SELECT event_id, user_id, event_type, value FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT event_id, user_id, event_type, value FROM events WHERE event_type = 'purchase'
    UNION ALL
    SELECT event_id, user_id, event_type, value FROM events WHERE event_type = 'view'
    """,
    category="setop",
)
def union_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append same-schema frames (`webscrapping.py:52,64` pd.concat) via
    unionByName — name-aligned, not positional."""
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "value")
    parts = [ev.filter(F.col("event_type") == t) for t in ("click", "purchase", "view")]
    return rel.union_all(parts)


@query(
    "concat_columns_axis1",
    oracle="""
    SELECT x.o_orderkey, x.o_totalprice, y.o_orderdate, y.o_orderpriority
    FROM (SELECT o_orderkey, o_totalprice FROM orders) x
    JOIN (SELECT o_orderkey, o_orderdate, o_orderpriority FROM orders) y
      ON x.o_orderkey = y.o_orderkey
    """,
    category="setop",
)
def concat_columns_axis1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-wise concat of aligned frames (`webscrapping.py:46`) as a key
    join — positional alignment is never trusted in a distributed engine."""
    orders = load(spark, sf_dir, "orders")
    x = orders.select("o_orderkey", "o_totalprice")
    y = orders.select("o_orderkey", "o_orderdate", "o_orderpriority")
    return rel.concat_columns(x, y, "o_orderkey")


@query(
    "setop_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    category="setop",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) — absent from the reference (SURVEY §2.7), free
    on Spark: customers with both finished and open orders."""
    o = load(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(op)


@query(
    "setop_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    """,
    category="setop",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — customers with no orders (the anti-join the
    reference approximates with a left join + isNotNull check,
    `glue.py:137`)."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.exceptAll(o).distinct()


@query(
    "pivot_counts",
    oracle="""
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click') AS click,
           count(*) FILTER (WHERE event_type = 'error') AS error,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup') AS signup,
           count(*) FILTER (WHERE event_type = 'view') AS view
    FROM events GROUP BY user_id
    """,
    category="setop",
)
def pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized pivot: per-user event-type count matrix. An explicit
    category list keeps the pivot single-pass (no extra distinct job) and
    the output schema stable."""
    ev = load(spark, sf_dir, "events")
    cats = ["click", "error", "purchase", "signup", "view"]
    out = ev.groupBy("user_id").pivot("event_type", cats).count()
    return out.select(
        "user_id", *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in cats]
    )


@query(
    "reshape_unpivot_long",
    oracle="""
    WITH w AS (
      SELECT user_id,
             count(*) FILTER (WHERE event_type = 'click') AS click,
             count(*) FILTER (WHERE event_type = 'error') AS error,
             count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
             count(*) FILTER (WHERE event_type = 'signup') AS signup,
             count(*) FILTER (WHERE event_type = 'view') AS view
      FROM events GROUP BY user_id
    )
    SELECT user_id, 'click' AS event_type, click AS n FROM w
    UNION ALL SELECT user_id, 'error', error FROM w
    UNION ALL SELECT user_id, 'purchase', purchase FROM w
    UNION ALL SELECT user_id, 'signup', signup FROM w
    UNION ALL SELECT user_id, 'view', view FROM w
    """,
    category="setop",
)
def reshape_unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (pandas melt / SQL UNPIVOT): the wide per-user count matrix
    back to long form via Spark's native ``unpivot`` — a Generate node, one
    pass, no join; the inverse of `pivot_counts`."""
    ev = load(spark, sf_dir, "events")
    cats = ["click", "error", "purchase", "signup", "view"]
    wide = ev.groupBy("user_id").pivot("event_type", cats).count()
    wide = wide.select(
        "user_id", *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in cats]
    )
    return wide.unpivot("user_id", cats, "event_type", "n")


@query(
    "join_semi_filter",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) + 0.0 AS o_totalprice
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
    )
    """,
    category="relational",
)
def join_semi_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join — orders with at least one returned lineitem
    (SQL EXISTS). The semi-join physical node emits each left row at most
    once and never materializes right columns — strictly less work than
    the inner-join+distinct a pandas workflow would use."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    out = o.join(li, o["o_orderkey"] == li["l_orderkey"], "left_semi")
    return out.select(
        "o_orderkey", "o_custkey", (F.round("o_totalprice", 2) + F.lit(0.0)).alias("o_totalprice")
    )


@query(
    "join_skew_salted_replicated",
    oracle="""
    SELECT c.c_nationkey,
           count(*) AS n_orders,
           round(sum(o.o_totalprice), 2) + 0.0 AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_nationkey
    """,
    category="relational",
)
def join_skew_salted_replicated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salt-replicated skew join (operators/skew.py replicated_skew_join):
    the big side salts on a deterministic row hash, the small side
    replicates across all 8 salts, and the join runs on (key, salt) so no
    shuffle partition receives more than |hot_key|/n_salts big rows — the
    manual fallback when AQE skew splitting can't apply (e.g. the small
    side is too big to broadcast but fine to replicate). The oracle is the
    PLAIN join: salting must be result-invariant, which this value-hash
    proves (each big row joins exactly its own salt's copy)."""
    from etl_aws_spark.operators import skew

    o = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    joined = skew.replicated_skew_join(o, c, key="o_custkey", n_salts=8, how="inner")
    return joined.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.round(F.sum("o_totalprice"), 2) + F.lit(0.0)).alias("revenue"),
    )


@query(
    "join_anti_orphans",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
    )
    """,
    category="relational",
)
def join_anti_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join — customers with no high-value (>400k) order, the
    SQL NOT EXISTS. The anti-join physical node streams the left side
    against a broadcast hash set of qualifying custkeys: the filter on the
    right side is pushed below the join, so the build side is the
    qualifying keys only — strictly smaller than the join-then-isnull a
    pandas workflow would build."""
    c = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    out = c.join(big, c["c_custkey"] == big["o_custkey"], "left_anti")
    return out.select("c_custkey", "c_name", "c_mktsegment")


@query(
    "join_full_outer_reconcile",
    oracle="""
    WITH a AS (
      SELECT o_custkey AS k, count(*) AS n_orders
      FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01' GROUP BY 1
    ), b AS (
      SELECT c_custkey AS k, c_acctbal FROM customer WHERE c_acctbal > 5000.0
    )
    SELECT coalesce(a.k, b.k) AS custkey,
           CASE WHEN a.k IS NULL THEN 'right_only'
                WHEN b.k IS NULL THEN 'left_only'
                ELSE 'both' END AS match_status,
           coalesce(a.n_orders, 0) AS n_orders,
           round(coalesce(b.c_acctbal, 0.0), 2) + 0.0 AS acctbal
    FROM a FULL OUTER JOIN b ON a.k = b.k
    """,
    category="relational",
)
def join_full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-system reconciliation: FULL OUTER join of recent-order activity
    vs high-balance accounts, each row labeled left_only / right_only /
    both — the audit shape (completing the join-type family: inner, left,
    semi, anti, cross, and now full outer). Both sides pre-aggregate or
    pre-filter before the join, so the full-outer shuffle carries the
    reduced keyed frames, not the raw tables."""
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .groupBy(F.col("o_custkey").alias("ka"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000.0)
        .select(F.col("c_custkey").alias("kb"), "c_acctbal")
    )
    j = o.join(c, o.ka == c.kb, "full_outer")
    return j.select(
        F.coalesce("ka", "kb").alias("custkey"),
        F.when(F.col("ka").isNull(), "right_only")
        .when(F.col("kb").isNull(), "left_only")
        .otherwise("both")
        .alias("match_status"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        rnd(F.coalesce("c_acctbal", F.lit(0.0)), 2).alias("acctbal"),
    )


def _bloom_oracle() -> str:
    from etl_aws_spark.text import _dialect as D

    def pos(j: int) -> str:
        return f"({D.hash60(f'''concat('bloom{j}:', key)''', D.DUCK)}) % 1024"

    return f"""
    WITH dimk AS (
      SELECT DISTINCT CAST(c_custkey AS VARCHAR) AS key
      FROM customer WHERE c_mktsegment = 'BUILDING'
    ), positions AS (
      SELECT {pos(0)} AS p FROM dimk UNION ALL SELECT {pos(1)} AS p FROM dimk
    ), words AS (
      SELECT p // 32 AS word_idx, bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS word
      FROM positions GROUP BY 1
    ), probe AS (
      SELECT CAST(o_custkey AS VARCHAR) AS key, {pos(0)} AS p0, {pos(1)} AS p1
      FROM orders
    ), checked AS (
      SELECT pr.key,
             coalesce((w0.word & (1::BIGINT << CAST(pr.p0 % 32 AS INT))) != 0, FALSE)
             AND coalesce((w1.word & (1::BIGINT << CAST(pr.p1 % 32 AS INT))) != 0, FALSE)
               AS bloom_pass,
             EXISTS (SELECT 1 FROM dimk d WHERE d.key = pr.key) AS is_match
      FROM probe pr
      LEFT JOIN words w0 ON pr.p0 // 32 = w0.word_idx
      LEFT JOIN words w1 ON pr.p1 // 32 = w1.word_idx
    )
    SELECT count(*) AS n_fact,
           CAST(sum(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_bloom,
           CAST(sum(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT) AS n_true_match,
           CAST(sum(CASE WHEN bloom_pass AND NOT is_match THEN 1 ELSE 0 END) AS BIGINT)
             AS n_false_positive,
           round(sum(CASE WHEN bloom_pass AND NOT is_match THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) + 0.0 AS fp_rate
    FROM checked
    """


@query("join_bloom_prefilter", oracle=_bloom_oracle(), category="join")
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter join prefiltering, measured: a 1024-bit / 2-hash bloom
    of the BUILDING-segment customer keys is broadcast and probes every
    order BEFORE the join shuffle — the explicit form of the runtime
    row-level filtering AQE injects on selective joins, and at 100 TB the
    difference between shuffling the whole fact table and shuffling the
    ~20% that can possibly match. The report quantifies the trade
    (pass/true/false-positive counts + FP rate); md5-derived positions
    and packed-long bitset arithmetic replay exactly in the oracle."""
    from etl_aws_spark.operators import sketch

    dim = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    fact = load(spark, sf_dir, "orders")
    return sketch.bloom_prefilter_report(
        fact, "o_custkey", dim, "c_custkey", m_bits=1024, n_hashes=2
    )


@query(
    "join_null_safe_keys",
    # deterministic null injection: every 13th event loses its user_id;
    # the oracle mirrors both join semantics over the same frames
    oracle="""
    WITH e AS (
      SELECT event_id,
             CASE WHEN event_id % 13 = 0 THEN NULL ELSE user_id END AS k,
             value
      FROM events
    ), d AS (
      SELECT DISTINCT CASE WHEN user_id % 11 = 0 THEN NULL ELSE user_id END
               AS k
      FROM events
    )
    SELECT
      CAST((SELECT count(*) FROM e JOIN d ON e.k = d.k) AS BIGINT)
        AS n_plain_eq,
      CAST((SELECT count(*) FROM e JOIN d ON e.k IS NOT DISTINCT FROM d.k)
           AS BIGINT) AS n_null_safe,
      CAST((SELECT count(*) FROM e WHERE k IS NULL) AS BIGINT)
        AS n_null_left
    """,
    category="relational",
)
def join_null_safe_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe join semantics, demonstrated side by side: with nulls
    injected into both sides' keys, the plain equi-join silently DROPS
    every null-keyed row (`NULL = NULL` is not true — the classic silent
    data-loss bug in identity-resolution pipelines), while the
    null-safe operator (`<=>` / IS NOT DISTINCT FROM) matches the null
    bucket. The output pins all three counts, so the difference — every
    null-keyed left row — is explicit. Spark plans `<=>` as a normal
    hash join on a null-safe key, so there is no performance cliff; the
    caveat at 100 TB is SKEW: the null bucket is one key and may need
    the salting treatment (`join_skew_salted_replicated`) if nulls
    dominate."""
    ev = load(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        F.when(F.col("event_id") % 13 == 0, F.lit(None))
        .otherwise(F.col("user_id"))
        .alias("k"),
        "value",
    )
    d = ev.select(
        F.when(F.col("user_id") % 11 == 0, F.lit(None))
        .otherwise(F.col("user_id"))
        .alias("k")
    ).distinct()
    n_plain = e.join(d, e["k"] == d["k"]).count()
    n_safe = e.join(d, e["k"].eqNullSafe(d["k"])).count()
    n_null_left = e.filter(F.col("k").isNull()).count()
    return spark.createDataFrame(
        [(n_plain, n_safe, n_null_left)],
        "n_plain_eq bigint, n_null_safe bigint, n_null_left bigint",
    )


@query(
    "scalar_json_map_explode",
    oracle="""
    WITH m AS (
      SELECT event_id, 'k' AS key,
             CAST(json_extract(props, '$.k') AS INT) AS val
      FROM events
    )
    SELECT key,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(val) AS BIGINT) AS total,
           CAST(min(val) AS BIGINT) AS min_val,
           CAST(max(val) AS BIGINT) AS max_val
    FROM m GROUP BY key
    """,
    category="relational",
)
def scalar_json_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-typed semi-structured handling: props parses to
    ``map<string,int>`` (the open-schema form for payloads whose keys
    aren't known at write time — where `scalar_json_extract`'s struct
    needs them declared), the map EXPLODES to (key, value) rows, and
    per-key stats aggregate — the schema-on-read path for telemetry
    property bags. One from_json pass, one explode Generate, one
    aggregate; at scale the map form trades columnar pushdown (structs
    prune, maps don't) for schema freedom — both forms now exist so the
    tradeoff is explicit."""
    ev = load(spark, sf_dir, "events")
    m = ev.select(
        "event_id",
        F.explode(
            F.from_json("props", "map<string,int>")
        ).alias("key", "val"),
    )
    return m.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("val").cast("long").alias("total"),
        F.min("val").cast("long").alias("min_val"),
        F.max("val").cast("long").alias("max_val"),
    )


@query(
    "union_schema_evolution",
    # old batch (events first half) lacks `value`; new batch has it. The
    # evolved union back-fills NULL — counts and sums must match the
    # oracle's conditional replay
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(CASE WHEN dayofmonth(ts) > 15 THEN value END) AS BIGINT)
             AS n_with_value,
           round(sum(CASE WHEN dayofmonth(ts) > 15 THEN value END), 4) + 0.0
             AS sum_new_value
    FROM events
    """,
    category="relational",
)
def union_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution UNION (`unionByName(allowMissingColumns=True)`):
    the old batch predates the `value` column, the new batch carries it,
    and the union back-fills NULL for the old rows by NAME — where
    positional `union` would silently misalign columns (the classic
    append-job corruption). Counts of present values and the new-batch
    sum pin the back-fill behavior; the same mechanism is what makes
    `scan_parquet_schema_merge` work at the file level — this is the
    DataFrame-level half."""
    ev = load(spark, sf_dir, "events")
    old_batch = ev.filter(F.dayofmonth("ts") <= 15).select(
        "event_id", "ts", "user_id", "event_type"
    )
    new_batch = ev.filter(F.dayofmonth("ts") > 15).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    evolved = old_batch.unionByName(new_batch, allowMissingColumns=True)
    return evolved.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count("value").cast("long").alias("n_with_value"),
        (F.round(F.sum("value"), 4) + F.lit(0.0)).alias("sum_new_value"),
    )
