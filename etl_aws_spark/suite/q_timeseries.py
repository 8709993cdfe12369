"""SURVEY §2.5/§2.8/§2.10 time-series queries: EWMA/MACD, seasonal
decomposition, stationarity stats, cascading interpolation.

Role mapping (FIXTURES.md §C): user_id ≡ ticker, ts ≡ trade date,
value ≡ close.

The MACD oracle is exact: pandas ``ewm(adjust=False)`` is the recurrence
y_t = α·x_t + β·y_{t-1}, which DuckDB expresses as ``list_reduce`` over the
per-row prefix list — the same sequential fold, same float literals, so the
hashes match bit-for-bit after rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_aws_spark.operators import timeseries as ts
from etl_aws_spark.registry import load, query
from etl_aws_spark.suite._util import EVENTS_ORDER_SQL, rnd, rnd_nudged

_OVER_PRE = (
    f"OVER (PARTITION BY user_id ORDER BY {EVENTS_ORDER_SQL} "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
)


@query(
    "window_ewm_macd",
    oracle=f"""
    WITH s AS (
      SELECT event_id, user_id, ts, value,
             list(value) {_OVER_PRE} AS pre
      FROM events
    ), m AS (
      SELECT event_id, user_id, ts, value,
             list_reduce(pre, (acc, x) -> 2.0/13.0*x + 11.0/13.0*acc)
               - list_reduce(pre, (acc, x) -> 2.0/27.0*x + 25.0/27.0*acc) AS macd
      FROM s
    ), ms AS (
      SELECT event_id, user_id, ts, value, macd,
             list(macd) {_OVER_PRE} AS mpre
      FROM m
    )
    SELECT event_id, user_id, ts, value,
           round(macd, 4) + 0.0 AS macd,
           round(list_reduce(mpre, (acc, x) -> 2.0/10.0*x + 8.0/10.0*acc), 4) + 0.0
             AS macd_signal
    FROM ms
    """,
    category="timeseries",
)
def window_ewm_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MACD(12,26,9), `ewm(adjust=False)` semantics (`preprocessing.py:346-351`)."""
    df = load(spark, sf_dir, "events")
    out = ts.macd(df, "value", key="user_id", order=["ts", "event_id"])
    return out.select(
        "event_id", "user_id", "ts", "value",
        rnd(F.col("macd")).alias("macd"),
        rnd(F.col("macd_signal")).alias("macd_signal"),
    )


@query(
    "stat_seasonal_decompose",
    oracle=f"""
    WITH t AS (
      SELECT event_id, user_id, ts, value,
             (row_number() OVER (PARTITION BY user_id ORDER BY {EVENTS_ORDER_SQL}) - 1) % 5
               AS phase,
             CASE WHEN count(value) OVER (PARTITION BY user_id ORDER BY {EVENTS_ORDER_SQL}
                      ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) = 5
                  THEN avg(value) OVER (PARTITION BY user_id ORDER BY {EVENTS_ORDER_SQL}
                      ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) END AS trend
      FROM events
    ), p AS (
      SELECT user_id, phase, avg(value - trend) AS pmean
      FROM t GROUP BY user_id, phase
    ), c AS (
      SELECT user_id, phase,
             pmean - avg(pmean) OVER (PARTITION BY user_id) AS seasonal
      FROM p
    )
    SELECT t.event_id, t.user_id, t.ts, t.value,
           round(t.trend + sign(t.trend) * 1e-9, 4) + 0.0 AS trend,
           round(c.seasonal + sign(c.seasonal) * 1e-9, 4) + 0.0 AS seasonal,
           round((t.value - t.trend - c.seasonal)
                 + sign(t.value - t.trend - c.seasonal) * 1e-9, 4) + 0.0 AS resid
    FROM t JOIN c ON t.user_id = c.user_id AND t.phase = c.phase
    """,
    category="timeseries",
)
def stat_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive decomposition, period 5, statsmodels semantics
    (`preprocessing.py:217-269`) — pure window/group aggregates, no UDF."""
    df = load(spark, sf_dir, "events")
    out = ts.seasonal_decompose_additive(
        df, "value", key="user_id", order=["ts", "event_id"], period=5
    )
    return out.select(
        "event_id", "user_id", "ts", "value",
        rnd_nudged(F.col("trend")).alias("trend"),
        rnd_nudged(F.col("seasonal")).alias("seasonal"),
        rnd_nudged(F.col("resid")).alias("resid"),
    )


@query(
    "stat_adf_test",
    oracle=f"""
    WITH l AS (
      SELECT user_id,
             lag(value, 1) OVER (PARTITION BY user_id ORDER BY {EVENTS_ORDER_SQL}) AS xl,
             value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY {EVENTS_ORDER_SQL}) AS dx
      FROM events
    )
    SELECT user_id,
           round(corr(dx, xl) * sqrt((count(*) - 2) / (1.0 - corr(dx, xl) * corr(dx, xl))), 6)
             + 0.0 AS adf_stat,
           count(*) AS n_obs
    FROM l WHERE xl IS NOT NULL GROUP BY user_id
    """,
    category="timeseries",
)
def stat_adf_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dickey-Fuller t-stat per key (`preprocessing.py:273-286`), closed form."""
    df = load(spark, sf_dir, "events")
    out = ts.dickey_fuller_stat(df, "value", key="user_id", order=["ts", "event_id"])
    return out.select("user_id", rnd(F.col("adf_stat"), 6).alias("adf_stat"), "n_obs")


@query(
    "stat_ljung_box",
    oracle=f"""
    WITH l AS (
      SELECT user_id, value AS x,
             avg(value) OVER (PARTITION BY user_id) AS m,
             lag(value, 1) OVER (PARTITION BY user_id ORDER BY {EVENTS_ORDER_SQL}) AS l1,
             lag(value, 2) OVER (PARTITION BY user_id ORDER BY {EVENTS_ORDER_SQL}) AS l2,
             lag(value, 3) OVER (PARTITION BY user_id ORDER BY {EVENTS_ORDER_SQL}) AS l3
      FROM events
    ), g AS (
      SELECT user_id, count(x) AS n, sum((x - m) * (x - m)) AS c0,
             sum((x - m) * (l1 - m)) AS c1,
             sum((x - m) * (l2 - m)) AS c2,
             sum((x - m) * (l3 - m)) AS c3
      FROM l GROUP BY user_id
    )
    SELECT user_id,
           round(n * (n + 2) * ((c1/c0)*(c1/c0)/(n-1) + (c2/c0)*(c2/c0)/(n-2)
                                + (c3/c0)*(c3/c0)/(n-3)), 6) + 0.0 AS lb_stat,
           n AS n_obs
    FROM g
    """,
    category="timeseries",
)
def stat_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box Q(3) per key (`metrics_visualizer.py:177-193`), aggregates only."""
    df = load(spark, sf_dir, "events")
    out = ts.ljung_box_q(df, "value", key="user_id", order=["ts", "event_id"], lags=3)
    return out.select("user_id", rnd(F.col("lb_stat"), 6).alias("lb_stat"), "n_obs")


@query(
    "stat_corr_matrix",
    oracle="""
    SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
           round(corr(l_quantity, l_extendedprice), 6) + 0.0 AS corr FROM lineitem
    UNION ALL
    SELECT 'l_quantity', 'l_discount',
           round(corr(l_quantity, l_discount), 6) + 0.0 FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', 'l_discount',
           round(corr(l_extendedprice, l_discount), 6) + 0.0 FROM lineitem
    """,
    category="timeseries",
)
def stat_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise correlation matrix, long form (`visualize.py:258-263`).
    One aggregate pass computes all pairs; the long form is a driver-side
    constant unpivot of the single result row."""
    li = load(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    agg = li.agg(
        *[rnd(F.corr(a, b), 6).alias(f"corr_{a}__{b}") for a, b in pairs]
    )
    stacked = agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(a).alias("col_a"),
                        F.lit(b).alias("col_b"),
                        F.col(f"corr_{a}__{b}").alias("corr"),
                    )
                    for a, b in pairs
                ]
            )
        ).alias("r")
    )
    return stacked.select("r.col_a", "r.col_b", "r.corr")


@query(
    "interp_polynomial_cascade",
    # Full replay of the cascade (promoted from rows-only in r8): null
    # injection, hierarchy tags, gating counts, per-ticker ffill, the
    # interior quadratic (closed-form Lagrange, the exact expression the
    # grouped-map UDF evaluates — bit-identical doubles), then the
    # ffill/bfill edge repair. The global-mean fallback is omitted: it can
    # only fire for a ticker with zero observations whose nulls all sit at
    # group edges, impossible under the every-7th-event injection.
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value,
             CASE WHEN user_id = 0 THEN 's_solo'
                  ELSE 's' || CAST(user_id % 4 AS VARCHAR) END AS setor,
             CASE WHEN user_id = 0 THEN 'i_solo'
                  WHEN user_id % 5 = 0 THEN 'iu' || CAST(user_id AS VARCHAR)
                  ELSE 'i' || CAST(user_id % 20 AS VARCHAR) END AS industria
      FROM events
    ), gi AS (
      SELECT setor, industria, count(DISTINCT user_id) AS n_tic_ind
      FROM ev GROUP BY setor, industria
    ), gs AS (
      SELECT setor, count(DISTINCT industria) AS n_ind_sec FROM ev GROUP BY setor
    ), tagged AS (
      SELECT ev.*, CASE WHEN gi.n_tic_ind > 1 THEN 'I' || ev.setor || ev.industria
                        WHEN gs.n_ind_sec > 1 THEN 'S' || ev.setor
                        ELSE 'G' END AS igrp
      FROM ev JOIN gi USING (setor, industria) JOIN gs USING (setor)
    ), f1 AS (
      SELECT *, last_value(value IGNORE NULLS) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v1
      FROM tagged
    ), pos AS (
      SELECT *, row_number() OVER (PARTITION BY igrp ORDER BY ts, event_id) AS p,
             count(CASE WHEN v1 IS NOT NULL THEN 1 END)
               OVER (PARTITION BY igrp) AS nknown,
             count(CASE WHEN v1 IS NOT NULL THEN 1 END)
               OVER (PARTITION BY igrp ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lo
      FROM f1
    ), known AS (
      SELECT igrp, p, v1, row_number() OVER (PARTITION BY igrp ORDER BY p) AS k
      FROM pos WHERE v1 IS NOT NULL
    ), cand AS (
      SELECT n.igrp, n.p, k.p AS jp, k.v1 AS jy
      FROM pos n JOIN known k
        ON n.igrp = k.igrp AND k.k BETWEEN n.lo - 1 AND n.lo + 2
      WHERE n.v1 IS NULL AND n.nknown >= 3 AND n.lo >= 1 AND n.lo < n.nknown
    ), sel AS (
      SELECT igrp, p, jp, jy,
             row_number() OVER (PARTITION BY igrp, p ORDER BY abs(jp - p), jp) AS r
      FROM cand
    ), tri AS (
      SELECT igrp, p, jp, jy, row_number() OVER (PARTITION BY igrp, p ORDER BY jp) AS o
      FROM sel WHERE r <= 3
    ), fit AS (
      SELECT igrp, p,
             max(CASE WHEN o = 1 THEN jp END) AS j0,
             max(CASE WHEN o = 1 THEN jy END) AS y0,
             max(CASE WHEN o = 2 THEN jy END) AS y1,
             max(CASE WHEN o = 2 THEN jp END) AS j1,
             max(CASE WHEN o = 3 THEN jp END) AS j2,
             max(CASE WHEN o = 3 THEN jy END) AS y2
      FROM tri GROUP BY igrp, p
    ), interp AS (
      SELECT igrp, p,
             (y0 * (((t - d1) * (t - d2)) / ((0.0 - d1) * (0.0 - d2)))
              + y1 * (((t - 0.0) * (t - d2)) / ((d1 - 0.0) * (d1 - d2))))
              + y2 * (((t - 0.0) * (t - d1)) / ((d2 - 0.0) * (d2 - d1))) AS vfit
      FROM (SELECT *, CAST(p - j0 AS DOUBLE) AS t,
                   CAST(j1 - j0 AS DOUBLE) AS d1,
                   CAST(j2 - j0 AS DOUBLE) AS d2 FROM fit)
    ), s2 AS (
      SELECT pos.event_id, pos.user_id, pos.ts, pos.setor, pos.industria,
             coalesce(pos.v1, i.vfit) AS x2
      FROM pos LEFT JOIN interp i ON pos.igrp = i.igrp AND pos.p = i.p
    ), f3 AS (
      SELECT *, last_value(x2 IGNORE NULLS) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v3
      FROM s2
    )
    SELECT event_id, user_id, ts,
           first_value(v3 IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS value,
           setor, industria
    FROM f3
    """,
    category="timeseries",
)
def interp_polynomial_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cascading quadratic interpolation (`preprocessing.py:61-180`).

    Fixture adaptation: nulls are injected deterministically (every 7th
    event) and a (setor, industria) hierarchy is derived from user_id so all
    three cascade rules fire: shared industries (rule 1), single-ticker
    industries in multi-industry sectors (rule 2), and one isolated
    sector/industry pair (rule 3). Promoted to an exact oracle in r8: the
    interior quadratic is a closed-form Lagrange evaluation whose exact
    expression tree is mirrored in the SQL, so repaired doubles are
    bit-identical across engines (no rounding needed).
    """
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    holed = ev.withColumn(
        "value", F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(F.col("value"))
    )
    tagged = holed.withColumns(
        {
            "setor": F.when(F.col("user_id") == 0, F.lit("s_solo")).otherwise(
                F.concat(F.lit("s"), (F.col("user_id") % 4).cast("string"))
            ),
            "industria": F.when(F.col("user_id") == 0, F.lit("i_solo"))
            .when(F.col("user_id") % 5 == 0, F.concat(F.lit("iu"), F.col("user_id").cast("string")))
            .otherwise(F.concat(F.lit("i"), (F.col("user_id") % 20).cast("string"))),
        }
    )
    return ts.interpolate_cascade(
        tagged, "value", ticker="user_id", sector="setor", industry="industria",
        order=["ts", "event_id"],
    )


@query(
    "stat_ks_two_sample",
    oracle="""
    WITH s AS (
      SELECT CAST(floor(value * 100.0) AS BIGINT) AS bin,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS ib
      FROM events WHERE event_type IN ('click', 'purchase')
    ), g AS (
      SELECT bin, sum(ia) AS na, sum(ib) AS nb FROM s GROUP BY bin
    ), tot AS (
      SELECT sum(na) AS ta, sum(nb) AS tb FROM g
    ), c AS (
      SELECT bin,
             sum(na) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
             sum(nb) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
      FROM g
    )
    SELECT round(max(abs(CAST(c.ca AS DOUBLE) / t.ta - CAST(c.cb AS DOUBLE) / t.tb)), 6)
             + 0.0 AS ks_d,
           CAST(max(t.ta) AS BIGINT) AS n_a,
           CAST(max(t.tb) AS BIGINT) AS n_b
    FROM c CROSS JOIN tot t
    """,
    category="timeseries",
)
def stat_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic (click vs purchase value
    distributions): D = max |ECDF_a − ECDF_b| over 0.01-quantized value
    bins. The quantization is the scale design, not a shortcut: the
    ordered-cumsum window runs over the BINNED aggregate (cardinality
    bounded by 100 × value range, not row count), so the global ordering
    the ECDF needs never touches raw rows — the standard histogram-KS
    formulation for distributed data. Identical binning in both engines
    makes D exact, not approximate-vs-exact."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    from pyspark.sql import Window

    g = (
        ev.select(
            F.floor(F.col("value") * 100.0).cast("long").alias("bin"),
            (F.col("event_type") == "click").cast("int").alias("ia"),
            (F.col("event_type") == "purchase").cast("int").alias("ib"),
        )
        .groupBy("bin")
        .agg(F.sum("ia").alias("na"), F.sum("ib").alias("nb"))
    )
    cum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    c = g.select(
        "bin",
        F.sum("na").over(cum).alias("ca"),
        F.sum("nb").over(cum).alias("cb"),
    )
    tot = g.agg(
        F.sum("na").alias("ta"), F.sum("nb").alias("tb")
    )
    out = c.crossJoin(F.broadcast(tot)).agg(
        rnd(
            F.max(
                F.abs(
                    F.col("ca").cast("double") / F.col("ta")
                    - F.col("cb").cast("double") / F.col("tb")
                )
            ),
            6,
        ).alias("ks_d"),
        F.max("ta").cast("long").alias("n_a"),
        F.max("tb").cast("long").alias("n_b"),
    )
    return out.select("ks_d", "n_a", "n_b")


@query(
    "stat_linear_trend_per_group",
    oracle="""
    WITH d AS (
      SELECT event_type, value AS y,
             (epoch(ts) - min(epoch(ts)) OVER (PARTITION BY event_type))
               / 86400.0 AS x
      FROM events
    )
    SELECT event_type, count(*) AS n,
           round(regr_slope(y, x), 6) + 0.0 AS slope,
           round(regr_intercept(y, x), 6) + 0.0 AS intercept,
           round(regr_r2(y, x), 6) + 0.0 AS r2
    FROM d GROUP BY event_type
    """,
    category="timeseries",
)
def stat_linear_trend_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series OLS trend line (slope/intercept/R² of value vs time) via
    the native regression aggregates. Time is re-based to days-since-first-
    observation *per group* before the fit — with raw epoch seconds the
    normal equations cancel catastrophically (x ~ 1e9, x² ~ 1e18) and no
    rounding would reconcile engines; after centering both engines agree to
    well past 6 digits. One window (min over group) + one partial-aggregated
    group-by, both on the same key, so the plan carries a single Exchange."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    d = ev.select(
        "event_type",
        F.col("value").alias("y"),
        F.col("ts").cast("timestamp_ltz").cast("double").alias("xs"),
    ).withColumn("x", (F.col("xs") - F.min("xs").over(w)) / F.lit(86400.0))
    return d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        rnd(F.regr_slope("y", "x"), 6).alias("slope"),
        rnd(F.regr_intercept("y", "x"), 6).alias("intercept"),
        rnd(F.regr_r2("y", "x"), 6).alias("r2"),
    )


@query(
    "stat_cross_correlation_daily",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
             sum(value) AS v
      FROM events GROUP BY 1, 2
    ), a AS (SELECT day, v FROM daily WHERE event_type = 'click'),
    b AS (SELECT day, v FROM daily WHERE event_type = 'purchase'),
    lags AS (SELECT CAST(unnest(range(0, 8)) AS INTEGER) AS lag)
    SELECT l.lag, count(*) AS n_days, round(corr(a.v, b.v), 6) + 0.0 AS xcorr
    FROM a CROSS JOIN lags l JOIN b ON b.day = a.day + l.lag
    GROUP BY l.lag
    """,
    category="timeseries",
)
def stat_cross_correlation_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-correlation between two daily series (does click volume
    lead purchase volume?): aggregate to day grain first — the only pass
    over raw events — then an 8-row broadcast lag dimension shifts the
    purchase series and one Pearson aggregate per lag scores the alignment.
    The day-grain pre-aggregation is the scale move: the lag sweep joins
    ~spans-days rows, never events, so widening to 90 lags costs nothing."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    daily = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.sum("value").alias("v"))
    a = daily.filter(F.col("event_type") == "click").select(
        F.col("day").alias("da"), F.col("v").alias("va")
    )
    b = daily.filter(F.col("event_type") == "purchase").select(
        F.col("day").alias("db"), F.col("v").alias("vb")
    )
    lags = F.broadcast(
        ev.sparkSession.range(0, 8).select(F.col("id").cast("int").alias("lag"))
    )
    pairs = a.crossJoin(lags).join(
        b, F.date_add(F.col("da"), F.col("lag")) == F.col("db")
    )
    return pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_days"),
        rnd(F.corr("va", "vb"), 6).alias("xcorr"),
    )


@query(
    "stat_chi2_independence",
    oracle="""
    WITH obs AS (
      SELECT event_type, CAST(date_part('dow', ts) AS INTEGER) AS dow,
             count(*) AS o
      FROM events GROUP BY 1, 2
    ), grid AS (
      SELECT t.event_type, d.dow
      FROM (SELECT DISTINCT event_type FROM obs) t
      CROSS JOIN (SELECT DISTINCT dow FROM obs) d
    ), full_grid AS (
      SELECT g.event_type, g.dow, CAST(coalesce(o.o, 0) AS DOUBLE) AS o
      FROM grid g LEFT JOIN obs o USING (event_type, dow)
    ), tot AS (
      SELECT event_type, dow, o,
             sum(o) OVER (PARTITION BY event_type) AS r,
             sum(o) OVER (PARTITION BY dow) AS c,
             sum(o) OVER () AS n
      FROM full_grid
    )
    SELECT round(sum((o - r * c / n) * (o - r * c / n) / (r * c / n)), 4) + 0.0
             AS chi2,
           CAST((count(DISTINCT event_type) - 1) * (count(DISTINCT dow) - 1) AS BIGINT)
             AS dof,
           CAST(sum(o) AS BIGINT) AS n_obs
    FROM tot
    """,
    category="timeseries",
)
def stat_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence for event_type × day-of-week: is
    activity mix stable across the week? Contingency counts are ONE
    group-by over events; the zero-filled grid, marginals (windows over
    the tiny cell table), and the statistic never touch raw rows again —
    the distributed-contingency formulation (cells ≪ rows). Expected
    counts use the same r·c/n double arithmetic in both engines."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", (F.dayofweek("ts") - 1).cast("int").alias("dow")
    ).agg(F.count(F.lit(1)).alias("o"))
    types = obs.select("event_type").distinct()
    dows = obs.select("dow").distinct()
    grid = types.crossJoin(dows)
    full_grid = grid.join(obs, ["event_type", "dow"], "left").select(
        "event_type", "dow", F.coalesce("o", F.lit(0)).cast("double").alias("o")
    )
    tot = full_grid.select(
        "event_type", "dow", "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("r"),
        F.sum("o").over(Window.partitionBy("dow")).alias("c"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    e = F.col("r") * F.col("c") / F.col("n")
    return tot.agg(
        rnd(F.sum((F.col("o") - e) * (F.col("o") - e) / e), 4).alias("chi2"),
        ((F.countDistinct("event_type") - 1) * (F.countDistinct("dow") - 1))
        .cast("long")
        .alias("dof"),
        F.sum("o").cast("long").alias("n_obs"),
    )


@query(
    "stat_welch_t_test",
    # weekend test: Spark dayofweek() is 1=Sun..7=Sat; DuckDB dayofweek()
    # is 0=Sun..6=Sat — constants differ, predicate is identical.
    oracle="""
    WITH g AS (
      SELECT CASE WHEN dayofweek(ts) IN (0, 6)
                  THEN 'weekend' ELSE 'weekday' END AS grp, value
      FROM events WHERE event_type = 'purchase'
    ), m AS (
      SELECT grp, count(*) AS n, avg(value) AS mean, var_samp(value) AS v
      FROM g GROUP BY grp
    ), wide AS (
      SELECT
        max(CASE WHEN grp = 'weekend' THEN n END) AS n1,
        max(CASE WHEN grp = 'weekend' THEN mean END) AS m1,
        max(CASE WHEN grp = 'weekend' THEN v END) AS v1,
        max(CASE WHEN grp = 'weekday' THEN n END) AS n2,
        max(CASE WHEN grp = 'weekday' THEN mean END) AS m2,
        max(CASE WHEN grp = 'weekday' THEN v END) AS v2
      FROM m
    )
    SELECT CAST(n1 AS BIGINT) AS n_weekend,
           CAST(n2 AS BIGINT) AS n_weekday,
           round(m1, 4) + 0.0 AS mean_weekend,
           round(m2, 4) + 0.0 AS mean_weekday,
           round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) + 0.0 AS t_stat,
           round(power(v1 / n1 + v2 / n2, 2)
                 / (power(v1 / n1, 2) / (n1 - 1)
                    + power(v2 / n2, 2) / (n2 - 1)), 4) + 0.0 AS dof
    FROM wide
    """,
    category="timeseries",
)
def stat_welch_t_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t-test (weekend vs weekday
    purchase values): t statistic and Welch–Satterthwaite degrees of
    freedom, completing the hypothesis-test family beside KS and chi².
    ONE conditional aggregate produces both groups' (n, mean, var_samp)
    — the fact table is scanned once, never split into two jobs — and
    the statistic is a pure 1-row expression after a pivot to wide.
    Both engines aggregate in different orders, so every derived double
    crosses the rounding bridge."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    g = ev.select(
        F.when(F.dayofweek("ts").isin(1, 7), "weekend")
        .otherwise("weekday")
        .alias("grp"),
        "value",
    )
    m = g.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("value").alias("mean"),
        F.var_samp("value").alias("v"),
    )
    pick = lambda col, grp: F.max(F.when(F.col("grp") == grp, F.col(col)))  # noqa: E731
    wide = m.agg(
        pick("n", "weekend").alias("n1"),
        pick("mean", "weekend").alias("m1"),
        pick("v", "weekend").alias("v1"),
        pick("n", "weekday").alias("n2"),
        pick("mean", "weekday").alias("m2"),
        pick("v", "weekday").alias("v2"),
    )
    se2 = F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    return wide.select(
        F.col("n1").cast("long").alias("n_weekend"),
        F.col("n2").cast("long").alias("n_weekday"),
        rnd(F.col("m1")).alias("mean_weekend"),
        rnd(F.col("m2")).alias("mean_weekday"),
        (F.round((F.col("m1") - F.col("m2")) / F.sqrt(se2), 6) + F.lit(0.0)).alias(
            "t_stat"
        ),
        rnd(
            F.pow(se2, 2)
            / (
                F.pow(F.col("v1") / F.col("n1"), 2) / (F.col("n1") - 1)
                + F.pow(F.col("v2") / F.col("n2"), 2) / (F.col("n2") - 1)
            )
        ).alias("dof"),
    )


@query(
    "stat_mann_whitney_u",
    # histogram formulation: U from value-level counts + cumulative
    # windows; integer-exact until the final z division. Weekend constants
    # differ per engine (Spark dayofweek 1=Sun..7=Sat, DuckDB 0=Sun..6).
    oracle="""
    WITH g AS (
      SELECT CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS is_a,
             value
      FROM events WHERE event_type = 'purchase'
    ), h AS (
      SELECT value,
             sum(is_a) AS na_v,
             sum(1 - is_a) AS nb_v,
             count(*) AS t_v
      FROM g GROUP BY value
    ), c AS (
      SELECT value, na_v, nb_v, t_v,
             coalesce(sum(nb_v) OVER (ORDER BY value
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cumb_lt
      FROM h
    ), tot AS (
      SELECT sum(na_v) AS na, sum(nb_v) AS nb,
             sum(na_v) + sum(nb_v) AS n,
             sum(t_v * t_v * t_v - t_v) AS ties
      FROM h
    ), u AS (
      SELECT sum(na_v * (cumb_lt + 0.5 * nb_v)) AS u_a FROM c
    )
    SELECT CAST(tot.na AS BIGINT) AS n_weekend,
           CAST(tot.nb AS BIGINT) AS n_weekday,
           round(u.u_a, 4) + 0.0 AS u_stat,
           round((u.u_a - tot.na * tot.nb / 2.0)
                 / sqrt(tot.na * tot.nb / 12.0
                        * ((tot.n + 1.0) - CAST(tot.ties AS DOUBLE)
                           / (tot.n * (tot.n - 1.0)))), 6) + 0.0 AS z_score
    FROM u CROSS JOIN tot
    """,
    category="timeseries",
)
def stat_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U rank test (weekend vs weekday purchase values) in
    the HISTOGRAM formulation — the rank-based twin of
    `stat_welch_t_test` for non-normal data. Instead of ranking N rows
    (a global sort), values pre-aggregate to per-value (count_A,
    count_B) cells and U = Σ n_A(v)·(cum_B(<v) + ½·n_B(v)) — identical
    to the average-rank definition, but the shuffle and the cumulative
    window run over |distinct values| cells (prices have 2 decimals:
    bounded domain), not rows. Tie-corrected normal approximation for
    the z-score; everything is exact integer arithmetic until the final
    two divisions."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    g = ev.select(
        F.when(F.dayofweek("ts").isin(1, 7), 1).otherwise(0).alias("is_a"),
        "value",
    )
    h = g.groupBy("value").agg(
        F.sum("is_a").alias("na_v"),
        F.sum(F.lit(1) - F.col("is_a")).alias("nb_v"),
        F.count(F.lit(1)).alias("t_v"),
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, -1)
    c = h.withColumn("cumb_lt", F.coalesce(F.sum("nb_v").over(w), F.lit(0)))
    tot = h.agg(
        F.sum("na_v").alias("na"),
        F.sum("nb_v").alias("nb"),
        (F.sum("na_v") + F.sum("nb_v")).alias("n"),
        F.sum(F.col("t_v") * F.col("t_v") * F.col("t_v") - F.col("t_v")).alias("ties"),
    )
    u = c.agg(
        F.sum(F.col("na_v") * (F.col("cumb_lt") + 0.5 * F.col("nb_v"))).alias("u_a")
    )
    z = (F.col("u_a") - F.col("na") * F.col("nb") / 2.0) / F.sqrt(
        F.col("na") * F.col("nb") / 12.0
        * (
            (F.col("n") + 1.0)
            - F.col("ties").cast("double") / (F.col("n") * (F.col("n") - 1.0))
        )
    )
    return u.crossJoin(F.broadcast(tot)).select(
        F.col("na").cast("long").alias("n_weekend"),
        F.col("nb").cast("long").alias("n_weekday"),
        rnd(F.col("u_a")).alias("u_stat"),
        (F.round(z, 6) + F.lit(0.0)).alias("z_score"),
    )


@query(
    "stat_theilsen_slope_per_group",
    # exact pairwise-median replay: both engines build the identical slope
    # list (same (i, j) enumeration, exact µs integer time deltas), sort,
    # and take the exact median (middle element / mean of middles). The
    # per-series budget (<=500 events, smallest salted hashes) mirrors the
    # engine cap verbatim.
    oracle="""
    WITH capped AS (
      SELECT user_id, ts, event_id, value FROM (
        SELECT user_id, ts, event_id, value,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY md5(concat('tsen:', CAST(event_id AS VARCHAR))),
                          event_id) AS hrn
        FROM events WHERE event_type = 'purchase'
      ) WHERE hrn <= 500
    ), s AS (
      SELECT user_id,
             list(epoch_us(ts) ORDER BY ts, event_id) AS tt,
             list(value ORDER BY ts, event_id) AS vv,
             count(*) AS n
      FROM capped
      GROUP BY user_id
    ), sl AS (
      SELECT user_id, n,
             list_sort(flatten(list_transform(range(1, CAST(n AS INT)),
               i -> list_transform(range(i + 1, CAST(n AS INT) + 1),
                 j -> (vv[j] - vv[i]) * 86400000000.0 / (tt[j] - tt[i])))))
               AS slopes
      FROM s WHERE n >= 2
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_obs,
           round(CASE WHEN len(slopes) % 2 = 1
                      THEN slopes[len(slopes) // 2 + 1]
                      ELSE (slopes[len(slopes) // 2]
                            + slopes[len(slopes) // 2 + 1]) / 2.0 END
                 + sign(CASE WHEN len(slopes) % 2 = 1
                      THEN slopes[len(slopes) // 2 + 1]
                      ELSE (slopes[len(slopes) // 2]
                            + slopes[len(slopes) // 2 + 1]) / 2.0 END) * 1e-9,
                 6) + 0.0 AS slope_per_day
    FROM sl
    """,
    category="timeseries",
)
def stat_theilsen_slope_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend per series: the MEDIAN of all pairwise
    slopes (value/day) of each user's purchase history — the
    outlier-immune twin of `stat_linear_trend_per_group` (one wild price
    breaks OLS; Theil–Sen tolerates ~29% corruption). Execution is the
    `clean_hampel_filter` posture: ONE user_id shuffle collects each
    series, and the O(n²) pairwise slopes + exact median run INSIDE the
    row as HOF array expressions — no second shuffle, no UDF. The
    per-series bound is ENFORCED (r9, the `model_knn_label_classifier`
    budget pattern): series beyond 500 events are subsampled to the 500
    smallest salted md5 hashes — deterministic, unbiased, mirrored
    verbatim in the oracle — so the in-row pair count is capped at
    500²/2 regardless of how hot a user gets; for genuinely unbounded
    series Theil–Sen itself is the wrong estimator (use repeated-median).
    Exact µs integer time deltas; the median crosses the nudged bridge."""
    from pyspark.sql import Window

    from etl_aws_spark.operators.temporal_joins import _epoch_micros

    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    wcap = Window.partitionBy("user_id").orderBy(
        F.md5(F.concat(F.lit("tsen:"), F.col("event_id").cast("string"))),
        "event_id",
    )
    ev = (
        ev.withColumn("_hrn", F.row_number().over(wcap))
        .filter(F.col("_hrn") <= 500)
        .drop("_hrn")
    )
    s = (
        ev.select(
            "user_id",
            F.struct(
                _epoch_micros("ts").alias("t"),
                F.col("event_id").alias("e"),
                F.col("value").alias("v"),
            ).alias("p"),
        )
        .groupBy("user_id")
        .agg(
            F.array_sort(F.collect_list("p")).alias("ps"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") >= 2)
        .select(
            "user_id",
            "n",
            F.expr("transform(ps, x -> x.t)").alias("tt"),
            F.expr("transform(ps, x -> x.v)").alias("vv"),
        )
    )
    slopes = (
        "array_sort(flatten(transform(sequence(1, cast(n as int) - 1), "
        "i -> transform(sequence(i + 1, cast(n as int)), "
        "j -> (element_at(vv, j) - element_at(vv, i)) * 86400000000.0D "
        "/ (element_at(tt, j) - element_at(tt, i))))))"
    )
    med = (
        f"CASE WHEN size({slopes}) % 2 = 1 "
        f"THEN element_at({slopes}, cast(size({slopes}) div 2 + 1 as int)) "
        f"ELSE (element_at({slopes}, cast(size({slopes}) div 2 as int)) "
        f"+ element_at({slopes}, cast(size({slopes}) div 2 + 1 as int))) / 2.0D END"
    )
    return s.select(
        "user_id",
        F.col("n").cast("long").alias("n_obs"),
        (
            F.round(F.expr(med) + F.signum(F.expr(med)) * F.lit(1e-9), 6)
            + F.lit(0.0)
        ).alias("slope_per_day"),
    )


@query(
    "stat_theilsen_slope_sampled",
    # deterministic PAIR-sampled Theil-Sen: both engines keep exactly the
    # pairs whose salted 60-bit hash clears a per-series rate chosen so
    # ~200 slopes survive, then take the exact median of the sample — the
    # identical hash family, rate arithmetic and median on both sides, so
    # the value-hash gate checks the sampled estimator itself.
    oracle="""
    WITH capped AS (
      SELECT user_id, ts, event_id, value FROM (
        SELECT user_id, ts, event_id, value,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY md5(concat('tsen:', CAST(event_id AS VARCHAR))),
                          event_id) AS hrn
        FROM events WHERE event_type = 'purchase'
      ) WHERE hrn <= 2000
    ), s AS (
      SELECT user_id,
             list(epoch_us(ts) ORDER BY ts, event_id) AS tt,
             list(value ORDER BY ts, event_id) AS vv,
             list(event_id ORDER BY ts, event_id) AS ee,
             count(*) AS n
      FROM capped
      GROUP BY user_id
    ), r AS (
      SELECT user_id, n, tt, vv, ee,
             least(CAST(1048576 AS BIGINT),
                   CAST(ceil(1048576.0 * 400.0
                        / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                        AS BIGINT)) AS lim
      FROM s WHERE n >= 2
    ), sl AS (
      SELECT user_id, n,
             list_sort(flatten(list_transform(range(1, CAST(n AS INT)),
               i -> list_transform(
                 list_filter(range(i + 1, CAST(n AS INT) + 1),
                   j -> ('0x' || substr(md5(concat('tsenp:',
                          CAST(user_id AS VARCHAR), ':',
                          CAST(ee[i] AS VARCHAR), ':',
                          CAST(ee[j] AS VARCHAR))), 1, 15))::BIGINT
                        % 1048576 < lim),
                 j -> (vv[j] - vv[i]) * 86400000000.0 / (tt[j] - tt[i])))))
               AS slopes
      FROM r
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_obs,
           CAST(len(slopes) AS BIGINT) AS n_slopes,
           round(CASE WHEN len(slopes) % 2 = 1
                      THEN slopes[len(slopes) // 2 + 1]
                      ELSE (slopes[len(slopes) // 2]
                            + slopes[len(slopes) // 2 + 1]) / 2.0 END
                 + sign(CASE WHEN len(slopes) % 2 = 1
                      THEN slopes[len(slopes) // 2 + 1]
                      ELSE (slopes[len(slopes) // 2]
                            + slopes[len(slopes) // 2 + 1]) / 2.0 END) * 1e-9,
                 6) + 0.0 AS slope_per_day
    FROM sl WHERE len(slopes) >= 1
    """,
    category="timeseries",
)
def stat_theilsen_slope_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAMPLED-PAIRS Theil–Sen — the scale-safe form of
    `stat_theilsen_slope_per_group` (r11 verdict task #5): instead of the
    exact median over all n(n−1)/2 pairwise slopes, each series keeps the
    pairs whose salted 60-bit hash falls under a per-series acceptance
    rate targeting ~200 slopes (min(1, 400/(n(n−1))) of the 2^20 hash
    space) and takes the exact median of that sample — the
    Efraimidis–Spirakis-style deterministic reservoir of the
    `sample_weighted_reservoir` family with uniform weights, keyed on
    (user, event_i, event_j) so the SAME pairs survive in both engines
    and re-runs. Series longer than 2000 events are first capped to the
    2000 smallest salted point hashes — the documented length-bound
    guard: the in-row pair ENUMERATION is still O(n²) hash evaluations,
    so the cap bounds it at ≤2M cheap md5s per row while the sampled
    median's sort drops from n² log n² to 200 log 200 (SCALE.md
    crossover note). Statistically, the pair-sampled median keeps
    Theil–Sen's breakdown robustness with O(1/√200) added median noise —
    the estimator production runs when series length is unbounded, while
    the exact 500-cap form stays the fixture-scale reference.

    Scale shape (100 TB): one user_id shuffle, everything else in-row
    HOF expressions; per-row work ≤ cap²/2 hash+filter ops and a
    fixed-200 sort regardless of corpus size."""
    from pyspark.sql import Window

    from etl_aws_spark.operators.temporal_joins import _epoch_micros

    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    wcap = Window.partitionBy("user_id").orderBy(
        F.md5(F.concat(F.lit("tsen:"), F.col("event_id").cast("string"))),
        "event_id",
    )
    ev = (
        ev.withColumn("_hrn", F.row_number().over(wcap))
        .filter(F.col("_hrn") <= 2000)
        .drop("_hrn")
    )
    s = (
        ev.select(
            "user_id",
            F.struct(
                _epoch_micros("ts").alias("t"),
                F.col("event_id").alias("e"),
                F.col("value").alias("v"),
            ).alias("p"),
        )
        .groupBy("user_id")
        .agg(
            F.array_sort(F.collect_list("p")).alias("ps"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") >= 2)
        .select(
            "user_id",
            "n",
            F.expr("transform(ps, x -> x.t)").alias("tt"),
            F.expr("transform(ps, x -> x.v)").alias("vv"),
            F.expr("transform(ps, x -> x.e)").alias("ee"),
            F.expr(
                "least(cast(1048576 as bigint), cast(ceil(1048576.0D * 400.0D "
                "/ (cast(n as double) * (cast(n as double) - 1.0D))) as bigint))"
            ).alias("lim"),
        )
    )
    pair_h = (
        "cast(conv(substr(md5(concat('tsenp:', cast(user_id as string), ':', "
        "cast(element_at(ee, i) as string), ':', "
        "cast(element_at(ee, j) as string))), 1, 15), 16, 10) as bigint)"
    )
    slopes = (
        "array_sort(flatten(transform(sequence(1, cast(n as int) - 1), "
        "i -> transform("
        f"filter(sequence(i + 1, cast(n as int)), j -> {pair_h} % 1048576 < lim), "
        "j -> (element_at(vv, j) - element_at(vv, i)) * 86400000000.0D "
        "/ (element_at(tt, j) - element_at(tt, i))))))"
    )
    sl = s.select(
        "user_id", "n", F.expr(slopes).alias("slopes")
    ).filter(F.size("slopes") >= 1)
    med = (
        "CASE WHEN size(slopes) % 2 = 1 "
        "THEN element_at(slopes, cast(size(slopes) div 2 + 1 as int)) "
        "ELSE (element_at(slopes, cast(size(slopes) div 2 as int)) "
        "+ element_at(slopes, cast(size(slopes) div 2 + 1 as int))) / 2.0D END"
    )
    return sl.select(
        "user_id",
        F.col("n").cast("long").alias("n_obs"),
        F.size("slopes").cast("long").alias("n_slopes"),
        (
            F.round(F.expr(med) + F.signum(F.expr(med)) * F.lit(1e-9), 6)
            + F.lit(0.0)
        ).alias("slope_per_day"),
    )


@query(
    "stat_siegel_repeated_median",
    # repeated median (Siegel 1982): per-point inner medians, outer
    # median of those — both engines build the identical per-i sorted
    # slope lists and take the same (s[(m+1)//2] + s[m//2+1])/2.0 middle
    # (equal indexes when m is odd; (x+x)/2 == x exactly in IEEE), so the
    # estimator replays bit-for-bit.
    oracle="""
    WITH capped AS (
      SELECT user_id, ts, event_id, value FROM (
        SELECT user_id, ts, event_id, value,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY md5(concat('tsen:', CAST(event_id AS VARCHAR))),
                          event_id) AS hrn
        FROM events WHERE event_type = 'purchase'
      ) WHERE hrn <= 500
    ), s AS (
      SELECT user_id,
             list(epoch_us(ts) ORDER BY ts, event_id) AS tt,
             list(value ORDER BY ts, event_id) AS vv,
             count(*) AS n
      FROM capped
      GROUP BY user_id
    ), m AS (
      SELECT user_id, n,
             list_sort(list_transform(
               list_transform(range(1, CAST(n AS INT) + 1),
                 i -> list_sort(list_transform(
                        list_filter(range(1, CAST(n AS INT) + 1), j -> j <> i),
                        j -> (vv[j] - vv[i]) * 86400000000.0
                             / (tt[j] - tt[i])))),
               sl -> (sl[(len(sl) + 1) // 2] + sl[len(sl) // 2 + 1]) / 2.0))
               AS meds
      FROM s WHERE n >= 2
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_obs,
           round((meds[(len(meds) + 1) // 2] + meds[len(meds) // 2 + 1]) / 2.0
                 + sign((meds[(len(meds) + 1) // 2]
                         + meds[len(meds) // 2 + 1]) / 2.0) * 1e-9,
                 6) + 0.0 AS slope_per_day
    FROM m
    """,
    category="timeseries",
)
def stat_siegel_repeated_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIEGEL REPEATED-MEDIAN trend per series — the estimator SCALE.md
    §9 names as the literature's answer when Theil–Sen's pairwise median
    is off the table: for each point i take the MEDIAN of its slopes to
    every other point, then the median of those per-point medians. The
    double median lifts the breakdown point from Theil–Sen's ~29% to
    50% — half the series can be garbage and the trend survives — which
    is why robust-monitoring pipelines run it over dirty telemetry.

    Execution is the Theil–Sen posture: ONE user_id shuffle, the O(n²)
    slope table INSIDE the row — but as a NESTED transform whose outer
    lambda receives each per-i sorted slope list as its element, so the
    sort is evaluated once per point (inlining the list into the median's
    three element_at sites re-sorts 3×; the verify-skill CollapseProject
    gotcha, dodged structurally). The median itself is the branch-free
    (s[(m+1)÷2] + s[m÷2+1])/2 middle — equal indexes when m is odd, and
    (x+x)/2 is exactly x in IEEE, so no parity CASE duplicates the list
    expression. Same 500-point salted cap and exact µs integer time
    deltas as the exact Theil–Sen; for unbounded series the sampled-pairs
    variant (`stat_theilsen_slope_sampled`) is the scale path.

    Reference analogue: `preprocessing.py:61-351`'s trend features, made
    outlier-immune."""
    from pyspark.sql import Window

    from etl_aws_spark.operators.temporal_joins import _epoch_micros

    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    wcap = Window.partitionBy("user_id").orderBy(
        F.md5(F.concat(F.lit("tsen:"), F.col("event_id").cast("string"))),
        "event_id",
    )
    ev = (
        ev.withColumn("_hrn", F.row_number().over(wcap))
        .filter(F.col("_hrn") <= 500)
        .drop("_hrn")
    )
    s = (
        ev.select(
            "user_id",
            F.struct(
                _epoch_micros("ts").alias("t"),
                F.col("event_id").alias("e"),
                F.col("value").alias("v"),
            ).alias("p"),
        )
        .groupBy("user_id")
        .agg(
            F.array_sort(F.collect_list("p")).alias("ps"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") >= 2)
        .select(
            "user_id",
            "n",
            F.expr("transform(ps, x -> x.t)").alias("tt"),
            F.expr("transform(ps, x -> x.v)").alias("vv"),
        )
    )
    inner = (
        "array_sort(transform("
        "filter(sequence(1, cast(n as int)), j -> j != i), "
        "j -> (element_at(vv, j) - element_at(vv, i)) * 86400000000.0D "
        "/ (element_at(tt, j) - element_at(tt, i))))"
    )
    meds = (
        "array_sort(transform("
        f"transform(sequence(1, cast(n as int)), i -> {inner}), "
        "sl -> (element_at(sl, cast((size(sl) + 1) div 2 as int)) "
        "+ element_at(sl, cast(size(sl) div 2 + 1 as int))) / 2.0D))"
    )
    m = s.select("user_id", "n", F.expr(meds).alias("meds"))
    outer = (
        "(element_at(meds, cast((size(meds) + 1) div 2 as int)) "
        "+ element_at(meds, cast(size(meds) div 2 + 1 as int))) / 2.0D"
    )
    return m.select(
        "user_id",
        F.col("n").cast("long").alias("n_obs"),
        (
            F.round(F.expr(outer) + F.signum(F.expr(outer)) * F.lit(1e-9), 6)
            + F.lit(0.0)
        ).alias("slope_per_day"),
    )


# exact binary fractions: the Holt fold is pure add/multiply chains with
# identical op order on both engines -> bit-exact accumulators
_HOLT_ALPHA, _HOLT_BETA = 0.5, 0.25


@query(
    "window_holt_linear_forecast",
    oracle=f"""
    WITH s AS (
      SELECT user_id,
             list(value ORDER BY ts, event_id) AS vv,
             count(*) AS n
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
      HAVING count(*) >= 2
    ), f AS (
      SELECT user_id, n,
             list_reduce(
               list_prepend(
                 [CAST(vv[1] AS DOUBLE), CAST(0.0 AS DOUBLE)],
                 list_transform(vv[2:], v -> [CAST(v AS DOUBLE),
                                              CAST(0.0 AS DOUBLE)])),
               (acc, x) -> [
                 {_HOLT_ALPHA} * x[1]
                   + (1.0 - {_HOLT_ALPHA}) * (acc[1] + acc[2]),
                 {_HOLT_BETA} * (({_HOLT_ALPHA} * x[1]
                   + (1.0 - {_HOLT_ALPHA}) * (acc[1] + acc[2])) - acc[1])
                   + (1.0 - {_HOLT_BETA}) * acc[2]
               ]
             ) AS lb
      FROM s
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_obs,
           round(lb[1], 4) + 0.0 AS level,
           round(lb[2], 4) + 0.0 AS trend,
           round(lb[1] + lb[2], 4) + 0.0 AS forecast_next
    FROM f
    """,
    category="timeseries",
)
def window_holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing (level + linear trend) per
    series, with the one-step-ahead forecast — the trend-aware upgrade
    of the EWMA family (EWMA lags any trending series; Holt tracks it).
    α=1/2, β=1/4 are exact binary fractions and the recurrence runs as
    ONE sequential HOF fold over each user's collected series with an
    array<double> [level, trend] accumulator — JVM-side, no Python, one
    user_id shuffle — mirrored op-for-op by the oracle's list_reduce, so
    the accumulators are bit-exact across engines (same IEEE op chain).
    Initialization: level = first value, trend = 0."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    s = (
        ev.select(
            "user_id",
            F.struct(
                F.col("ts").alias("t"),
                F.col("event_id").alias("e"),
                F.col("value").alias("v"),
            ).alias("p"),
        )
        .groupBy("user_id")
        .agg(
            F.expr("transform(array_sort(collect_list(p)), x -> x.v)").alias("vv"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") >= 2)
    )
    a, b = _HOLT_ALPHA, _HOLT_BETA
    fold = (
        f"aggregate(slice(vv, 2, size(vv) - 1), "
        f"array(element_at(vv, 1), cast(0.0 as double)), "
        f"(acc, x) -> array("
        f"{a}D * x + (1.0D - {a}D) * (element_at(acc, 1) + element_at(acc, 2)), "
        f"{b}D * (({a}D * x + (1.0D - {a}D) * (element_at(acc, 1) + element_at(acc, 2)))"
        f" - element_at(acc, 1)) + (1.0D - {b}D) * element_at(acc, 2)))"
    )
    return s.select(
        "user_id",
        F.col("n").cast("long").alias("n_obs"),
        rnd(F.expr(f"element_at({fold}, 1)")).alias("level"),
        rnd(F.expr(f"element_at({fold}, 2)")).alias("trend"),
        rnd(
            F.expr(f"element_at({fold}, 1)") + F.expr(f"element_at({fold}, 2)")
        ).alias("forecast_next"),
    )


# Holt–Winters additive: exact binary fractions -> bit-exact fold chains
_HW_ALPHA, _HW_BETA, _HW_GAMMA, _HW_PERIOD = 0.5, 0.25, 0.25, 7


@query(
    "window_holt_winters_additive",
    # the accumulator is a 9-array [level, trend, s1..s7] where the
    # seasonal slots form a ROTATING queue: slot 3 is always the seasonal
    # state about to be consumed (s_{t-m}); each step drops it, appends
    # the refreshed seasonal at the tail. Values are exact integer cents
    # cast to double, so every engine folds the identical IEEE op chain.
    oracle=f"""
    WITH daily AS (
      SELECT o_orderpriority AS pri, o_orderdate AS d,
             sum(CAST(round(CAST(o_totalprice AS DOUBLE) * 100.0) AS BIGINT))
               AS cents
      FROM orders GROUP BY o_orderpriority, o_orderdate
    ), s AS (
      SELECT pri, list(CAST(cents AS DOUBLE) ORDER BY d) AS vv,
             count(*) AS n
      FROM daily GROUP BY pri HAVING count(*) >= 2 * {_HW_PERIOD}
    ), i AS (
      SELECT pri, vv, n,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               vv[1:{_HW_PERIOD}]), (acc, v) -> acc + v)
               / {float(_HW_PERIOD)} AS l0
      FROM s
    ), f AS (
      SELECT pri, n,
             list_reduce(
               list_prepend(
                 list_concat([l0, CAST(0.0 AS DOUBLE)],
                             list_transform(vv[1:{_HW_PERIOD}], v -> v - l0)),
                 list_transform(vv[{_HW_PERIOD + 1}:],
                   v -> [v, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])),
               (acc, x) -> list_concat(
                 list_concat(
                   [{_HW_ALPHA} * (x[1] - acc[3])
                      + {1.0 - _HW_ALPHA} * (acc[1] + acc[2]),
                    {_HW_BETA} * (({_HW_ALPHA} * (x[1] - acc[3])
                        + {1.0 - _HW_ALPHA} * (acc[1] + acc[2])) - acc[1])
                      + {1.0 - _HW_BETA} * acc[2]],
                   acc[4:{_HW_PERIOD + 2}]),
                 [{_HW_GAMMA} * (x[1] - ({_HW_ALPHA} * (x[1] - acc[3])
                      + {1.0 - _HW_ALPHA} * (acc[1] + acc[2])))
                    + {1.0 - _HW_GAMMA} * acc[3]])
             ) AS st
      FROM i
    )
    SELECT pri AS priority, CAST(n AS BIGINT) AS n_days,
           round(st[1] / 100.0, 4) + 0.0 AS level,
           round(st[2] / 100.0, 4) + 0.0 AS trend,
           round((st[1] + st[2] + st[3]) / 100.0, 4) + 0.0 AS forecast_next,
           round((list_max(st[3:{_HW_PERIOD + 2}])
                  - list_min(st[3:{_HW_PERIOD + 2}])) / 100.0, 4) + 0.0
             AS seas_amplitude
    FROM f
    """,
    category="timeseries",
)
def window_holt_winters_additive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt–Winters ADDITIVE triple-exponential smoothing per priority
    class: level + linear trend + a period-7 additive seasonal cycle over
    the ascending-date daily-revenue series — the full seasonal upgrade
    of `window_holt_linear_forecast` (Holt tracks trend but lags any
    weekly cycle; HW carries both). α=1/2, β=1/4, γ=1/4 are exact binary
    fractions; daily revenue is summed as exact integer cents (order-free
    determinism) then cast to double, so the recurrence is one identical
    IEEE op chain on both engines. The seasonal states live in a rotating
    7-slot queue inside the fold's array accumulator: slot 3 is always
    s_{t-m}, consumed then re-appended refreshed — no positional
    arithmetic, no modular indexing. Initialization: level = mean of the
    first 7 daily values, trend = 0, seasonals = first-week deviations.

    Scale shape (100 TB): the fact table collapses to the |priority|×|days|
    daily frame in ONE map-side-combined hash aggregate; the sequential
    fold runs over calendar-bounded series (|days| per priority), never
    corpus-sized data, and is embarrassingly parallel across series.
    Reference analogue: the seasonal step beyond `src/model/train.py`'s
    SARIMAX seasonal order, re-expressed as a declarative fold."""
    orders = load(spark, sf_dir, "orders")
    m = _HW_PERIOD
    a, b, g = _HW_ALPHA, _HW_BETA, _HW_GAMMA
    daily = orders.groupBy("o_orderpriority", "o_orderdate").agg(
        F.sum(
            F.round(F.col("o_totalprice").cast("double") * 100.0).cast("long")
        ).alias("cents")
    )
    s = (
        daily.groupBy(F.col("o_orderpriority").alias("pri"))
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(o_orderdate, cents))), "
                "x -> cast(x.cents as double))"
            ).alias("vv"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") >= 2 * m)
    )
    i = s.withColumn(
        "l0",
        F.expr(
            f"aggregate(slice(vv, 1, {m}), cast(0.0 as double), "
            f"(acc, v) -> acc + v) / {float(m)}D"
        ),
    )
    lvl, tr, sold = "element_at(acc, 1)", "element_at(acc, 2)", "element_at(acc, 3)"
    newl = f"({a}D * (x - {sold}) + {1.0 - a}D * ({lvl} + {tr}))"
    newt = f"({b}D * ({newl} - {lvl}) + {1.0 - b}D * {tr})"
    news = f"({g}D * (x - {newl}) + {1.0 - g}D * {sold})"
    init = (
        f"concat(array(l0, cast(0.0 as double)), "
        f"transform(slice(vv, 1, {m}), v -> v - l0))"
    )
    fold = (
        f"aggregate(slice(vv, {m + 1}, size(vv) - {m}), {init}, "
        f"(acc, x) -> concat(array({newl}, {newt}), "
        f"slice(acc, 4, {m - 1}), array({news})))"
    )
    st = i.withColumn("st", F.expr(fold))
    seas = f"slice(st, 3, {m})"
    return st.select(
        F.col("pri").alias("priority"),
        F.col("n").cast("long").alias("n_days"),
        rnd(F.expr("element_at(st, 1)") / 100.0).alias("level"),
        rnd(F.expr("element_at(st, 2)") / 100.0).alias("trend"),
        rnd(
            F.expr("element_at(st, 1) + element_at(st, 2) + element_at(st, 3)")
            / 100.0
        ).alias("forecast_next"),
        rnd(
            (F.expr(f"array_max({seas})") - F.expr(f"array_min({seas})")) / 100.0
        ).alias("seas_amplitude"),
    )


_OHLC_BAR_US = 6 * 3600 * 1000000  # 6-hour bars


@query(
    "window_ohlc_resample",
    # open/close pick values by a zero-padded (epoch-µs, event_id) string
    # key — lexicographic order == numeric order, and a SCALAR key is what
    # both engines' arg_min/min_by accept
    oracle=f"""
    WITH t AS (
      SELECT user_id,
             epoch_us(ts) // {_OHLC_BAR_US} AS bar,
             value,
             printf('%020d%012d', epoch_us(ts), event_id) AS ord
      FROM events
    )
    SELECT user_id,
           CAST(bar AS BIGINT) AS bar,
           arg_min(value, ord) AS open,
           round(max(value), 4) + 0.0 AS high,
           round(min(value), 4) + 0.0 AS low,
           arg_max(value, ord) AS close,
           CAST(count(*) AS BIGINT) AS n_ticks,
           round(sum(value), 4) + 0.0 AS volume
    FROM t GROUP BY user_id, bar
    """,
    category="timeseries",
)
def window_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick resampling (6-hour bars per series): open/close
    via `min_by`/`max_by` on a composite event-order key, high/low/count/
    volume as plain aggregates — the market-data product the reference's
    daily scrape feeds (`webscrapping.py` history rows), produced in ONE
    hash aggregate with map-side combine: no window, no sort, no second
    pass. At 100 TB this is the canonical pre-aggregation that turns tick
    streams into queryable bars; the (user, bar) keying makes it
    embarrassingly parallel."""
    from etl_aws_spark.operators.temporal_joins import _epoch_micros

    ev = load(spark, sf_dir, "events")
    us = _epoch_micros("ts")
    t = ev.select(
        "user_id",
        # exact bucketing: subtract the remainder FIRST — the division of
        # an exact multiple is exact in double, where us/BAR could round
        # up across a bucket boundary from one ulp below it
        ((us - us % _OHLC_BAR_US) / _OHLC_BAR_US).cast("long").alias("bar"),
        "value",
        F.format_string("%020d%012d", us, F.col("event_id")).alias("ord"),
    )
    return t.groupBy("user_id", "bar").agg(
        F.min_by("value", "ord").alias("open"),
        rnd(F.max("value")).alias("high"),
        rnd(F.min("value")).alias("low"),
        F.max_by("value", "ord").alias("close"),
        F.count(F.lit(1)).cast("long").alias("n_ticks"),
        rnd(F.sum("value")).alias("volume"),
    )


@query(
    "stat_kaplan_meier_survival",
    # the survival product is a SEQUENTIAL fold over ascending event times
    # — pure multiplies of (1 - d/n) rational terms, mirrored op-for-op by
    # list_reduce, so the curve is bit-identical before the final round.
    oracle="""
    WITH o AS (
      SELECT o_custkey, o_orderdate,
             lead(o_orderdate) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey)
               AS nxt
      FROM orders
    ), mx AS (
      SELECT max(o_orderdate) AS tmax FROM orders
    ), obs AS (
      SELECT date_diff('day', o_orderdate, nxt) AS t, 1 AS ev
      FROM o WHERE nxt IS NOT NULL
      UNION ALL
      SELECT date_diff('day', o_orderdate, mx.tmax) AS t, 0 AS ev
      FROM o CROSS JOIN mx WHERE o.nxt IS NULL
    ), cells AS (
      SELECT t, sum(ev) AS d, count(*) AS c FROM obs GROUP BY t
    ), risk AS (
      SELECT t, d, c,
             sum(c) OVER (ORDER BY t DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_risk
      FROM cells
    ), pre AS (
      SELECT t, d, c, n_risk,
             list(1.0 - CAST(d AS DOUBLE) / n_risk)
               OVER (ORDER BY t ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS fac
      FROM risk
    )
    SELECT CAST(t AS BIGINT) AS t_days,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_events,
           CAST(c - d AS BIGINT) AS n_censored,
           round(list_reduce(list_prepend(CAST(1.0 AS DOUBLE), fac),
                             (acc, x) -> acc * x), 6) + 0.0 AS survival
    FROM pre
    """,
    category="timeseries",
)
def stat_kaplan_meier_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve for customer reorder behavior — the
    churn/retention estimator: observations are the day-gaps between a
    customer's consecutive orders (events) plus the right-CENSORED gap
    from each last order to the corpus end (what naive 'average gap'
    analyses silently drop, biasing churn low). Per distinct duration:
    at-risk counts from ONE reverse cumulative window over the ~hundreds
    of distinct day values (never the raw orders), and S(t) =
    Π(1 − dᵢ/nᵢ) as a sequential HOF product fold per row (the MACD
    prefix-list pattern) — multiplies of exact rationals, bit-identical
    across engines. The fact table is shuffled once on custkey for the
    gap window; everything after is |distinct durations|-sized."""
    from pyspark.sql import Window

    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = orders.select(
        "o_custkey",
        "o_orderdate",
        F.lead("o_orderdate").over(w).alias("nxt"),
    )
    mx = orders.agg(F.max("o_orderdate").alias("tmax"))
    events = o.filter(F.col("nxt").isNotNull()).select(
        F.datediff(F.to_date("nxt"), F.to_date("o_orderdate")).alias("t"),
        F.lit(1).alias("ev"),
    )
    censored = (
        o.filter(F.col("nxt").isNull())
        .crossJoin(F.broadcast(mx))
        .select(
            F.datediff(F.to_date("tmax"), F.to_date("o_orderdate")).alias("t"),
            F.lit(0).alias("ev"),
        )
    )
    cells = events.unionByName(censored).groupBy("t").agg(
        F.sum("ev").alias("d"), F.count(F.lit(1)).alias("c")
    )
    w_risk = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = cells.withColumn("n_risk", F.sum("c").over(w_risk))
    w_fac = Window.orderBy(F.asc("t")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pre = risk.withColumn(
        "fac",
        F.collect_list(
            F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk")
        ).over(w_fac),
    )
    surv = (
        "aggregate(fac, cast(1.0 as double), (acc, x) -> acc * x)"
    )
    return pre.select(
        F.col("t").cast("long").alias("t_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("n_events"),
        (F.col("c") - F.col("d")).cast("long").alias("n_censored"),
        (F.round(F.expr(surv), 6) + F.lit(0.0)).alias("survival"),
    )


@query(
    "stat_mutual_information",
    # ln() differs in the last ulp across libms — every log term is
    # nudge-rounded at 8 BEFORE the weighted sum (the
    # curation_source_entropy bridge), so both engines sum identical
    # addends.
    oracle="""
    WITH cont AS (
      SELECT event_type, dayofweek(ts) AS dow, count(*) AS n
      FROM events GROUP BY 1, 2
    ), tot AS (
      SELECT CAST(sum(n) AS DOUBLE) AS t FROM cont
    ), marg_a AS (
      SELECT event_type, sum(n) AS na FROM cont GROUP BY event_type
    ), marg_b AS (
      SELECT dow, sum(n) AS nb FROM cont GROUP BY dow
    ), terms AS (
      SELECT c.n / tot.t
             * round(ln(c.n * tot.t / (ma.na * CAST(mb.nb AS DOUBLE)))
                     + sign(ln(c.n * tot.t / (ma.na * CAST(mb.nb AS DOUBLE))))
                       * 1e-9, 8) AS term
      FROM cont c
      JOIN marg_a ma USING (event_type)
      JOIN marg_b mb USING (dow)
      CROSS JOIN tot
    )
    SELECT round(sum(term), 6) + 0.0 AS mutual_information,
           CAST((SELECT count(*) FROM cont) AS BIGINT) AS n_cells
    FROM terms
    """,
    category="timeseries",
)
def stat_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(event_type; day-of-week) from the contingency
    counts — the effect-SIZE companion to `stat_chi2_independence` (chi²
    says whether dependence exists; MI says how many bits of it). One
    contingency aggregate (|types|·7 cells), marginals as two tiny
    rollups joined back, and the Σ p·ln(p/(pq)) sum runs over the
    bounded cell frame — the raw table is scanned once. Each ln term
    crosses the nudged-8 bridge before summation (libm ulp differences),
    the same closure as `curation_source_entropy`. Note: Spark
    dayofweek() is 1=Sun..7=Sat vs DuckDB 0..6 — a constant relabel,
    which MI is invariant to."""
    ev = load(spark, sf_dir, "events")
    cont = ev.groupBy(
        "event_type", F.dayofweek("ts").alias("dow")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = cont.agg(F.sum("n").cast("double").alias("t"))
    ma = cont.groupBy("event_type").agg(F.sum("n").alias("na"))
    mb = cont.groupBy("dow").agg(F.sum("n").alias("nb"))
    ratio = F.col("n") * F.col("t") / (F.col("na") * F.col("nb").cast("double"))
    log_term = F.round(
        F.log(ratio) + F.signum(F.log(ratio)) * F.lit(1e-9), 8
    )
    terms = (
        cont.join(F.broadcast(ma), "event_type")
        .join(F.broadcast(mb), "dow")
        .crossJoin(F.broadcast(tot))
        .select((F.col("n") / F.col("t") * log_term).alias("term"))
    )
    n_cells = cont.agg(F.count(F.lit(1)).cast("long").alias("n_cells"))
    return terms.agg(
        (F.round(F.sum("term"), 6) + F.lit(0.0)).alias("mutual_information")
    ).crossJoin(F.broadcast(n_cells))


_DID_CUTOFF = "2024-01-16"


@query(
    "stat_diff_in_diff",
    oracle=f"""
    WITH g AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS treated,
             CASE WHEN ts >= TIMESTAMP '{_DID_CUTOFF}' THEN 1 ELSE 0 END
               AS post,
             value
      FROM events WHERE event_type = 'purchase'
    ), m AS (
      SELECT treated, post, avg(value) AS mean_value, count(*) AS n
      FROM g GROUP BY treated, post
    ), wide AS (
      SELECT
        max(CASE WHEN treated = 1 AND post = 0 THEN mean_value END) AS t_pre,
        max(CASE WHEN treated = 1 AND post = 1 THEN mean_value END) AS t_post,
        max(CASE WHEN treated = 0 AND post = 0 THEN mean_value END) AS c_pre,
        max(CASE WHEN treated = 0 AND post = 1 THEN mean_value END) AS c_post,
        CAST(sum(n) AS BIGINT) AS n_obs
      FROM m
    )
    SELECT round(t_pre, 4) + 0.0 AS treated_pre,
           round(t_post, 4) + 0.0 AS treated_post,
           round(c_pre, 4) + 0.0 AS control_pre,
           round(c_post, 4) + 0.0 AS control_post,
           round((t_post - t_pre) - (c_post - c_pre), 6) + 0.0 AS did_estimate,
           n_obs
    FROM wide
    """,
    category="timeseries",
)
def stat_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimator — the workhorse of
    observational experiment readouts: treated cohort (even user_id —
    the synthetic exposure flag) vs control, purchase-value means before
    and after the {_DID_CUTOFF} cutoff, DiD = (ΔTreated) − (ΔControl).
    ONE conditional aggregate produces all four cell means (the Welch
    pattern: the fact table is never split into per-cell jobs), then a
    1-row pivot expression — at any scale this is a single
    map-side-combined pass."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    g = ev.select(
        F.when(F.col("user_id") % 2 == 0, 1).otherwise(0).alias("treated"),
        F.when(
            F.col("ts") >= F.lit(_DID_CUTOFF).cast("timestamp"), 1
        ).otherwise(0).alias("post"),
        "value",
    )
    m = g.groupBy("treated", "post").agg(
        F.avg("value").alias("mean_value"), F.count(F.lit(1)).alias("n")
    )
    pick = lambda t, p: F.max(  # noqa: E731
        F.when((F.col("treated") == t) & (F.col("post") == p), F.col("mean_value"))
    )
    wide = m.agg(
        pick(1, 0).alias("t_pre"),
        pick(1, 1).alias("t_post"),
        pick(0, 0).alias("c_pre"),
        pick(0, 1).alias("c_post"),
        F.sum("n").cast("long").alias("n_obs"),
    )
    return wide.select(
        rnd(F.col("t_pre")).alias("treated_pre"),
        rnd(F.col("t_post")).alias("treated_post"),
        rnd(F.col("c_pre")).alias("control_pre"),
        rnd(F.col("c_post")).alias("control_post"),
        (
            F.round(
                (F.col("t_post") - F.col("t_pre"))
                - (F.col("c_post") - F.col("c_pre")),
                6,
            )
            + F.lit(0.0)
        ).alias("did_estimate"),
        "n_obs",
    )


@query(
    "stat_cusum_changepoint",
    oracle=f"""
    WITH b AS (
      SELECT user_id, event_id, ts, value,
             avg(value) OVER (PARTITION BY user_id) AS mu,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY {EVENTS_ORDER_SQL}) AS pos
      FROM events
    ), c AS (
      SELECT user_id, event_id, pos,
             round(sum(value - mu) OVER (PARTITION BY user_id
                 ORDER BY {EVENTS_ORDER_SQL}
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 + sign(sum(value - mu) OVER (PARTITION BY user_id
                     ORDER BY {EVENTS_ORDER_SQL}
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                   * 1e-9, 6) + 0.0 AS s
      FROM b
    )
    SELECT user_id,
           round(max(s) - min(s), 6) + 0.0 AS cusum_range,
           CAST(arg_max(pos, printf('%030.6f-%012d', s - (SELECT min(s2.s)
                  FROM c s2 WHERE s2.user_id = c.user_id), 999999999999 - pos))
                AS BIGINT) AS changepoint_pos,
           CAST(count(*) AS BIGINT) AS n_obs
    FROM c GROUP BY user_id
    """,
    category="timeseries",
)
def stat_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per series: the cumulative sum of
    mean-deviations S_i peaks where the level shifts — the monitoring
    primitive behind 'when did this metric change'. Output: the CUSUM
    range (max−min, the shift magnitude signal) and the position of the
    maximum deviation (earliest position on exact ties). One user_id
    window partitioning serves the mean, the running sum, and the
    position index; each S_i crosses the nudged-6 bridge BEFORE the
    argmax so the peak choice is engine-deterministic. The argmax key is
    a zero-padded string of (shifted-positive S, inverted pos) — scalar,
    lexicographic == (S desc, pos asc), both engines."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    wp = Window.partitionBy("user_id")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wr = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.avg("value").over(wp).alias("mu"),
        F.row_number().over(wo).alias("pos"),
    )
    s_raw = F.sum(F.col("value") - F.col("mu")).over(wr)
    c = b.select(
        "user_id",
        "pos",
        (F.round(s_raw + F.signum(s_raw) * F.lit(1e-9), 6) + F.lit(0.0)).alias("s"),
    )
    smin = c.groupBy("user_id").agg(F.min("s").alias("smin"))
    keyed = c.join(F.broadcast(smin), "user_id").select(
        "user_id",
        "pos",
        "s",
        F.format_string(
            "%030.6f-%012d", F.col("s") - F.col("smin"), F.lit(999999999999) - F.col("pos")
        ).alias("ord"),
    )
    return keyed.groupBy("user_id").agg(
        (F.round(F.max("s") - F.min("s"), 6) + F.lit(0.0)).alias("cusum_range"),
        F.max_by("pos", "ord").cast("long").alias("changepoint_pos"),
        F.count(F.lit(1)).cast("long").alias("n_obs"),
    )


@query(
    "stat_runs_test",
    oracle=f"""
    WITH s AS (
      SELECT user_id, value,
             CASE WHEN value > avg(value) OVER (PARTITION BY user_id)
                  THEN 1 ELSE 0 END AS above,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY {EVENTS_ORDER_SQL}) AS pos
      FROM events
    ), runs AS (
      SELECT user_id,
             sum(CASE WHEN prev IS NULL OR above <> prev THEN 1 ELSE 0 END)
               AS n_runs,
             sum(above) AS n1,
             count(*) - sum(above) AS n2
      FROM (
        SELECT user_id, above,
               lag(above) OVER (PARTITION BY user_id ORDER BY pos) AS prev
        FROM s
      ) GROUP BY user_id
    )
    SELECT user_id,
           CAST(n_runs AS BIGINT) AS n_runs,
           CAST(n1 AS BIGINT) AS n_above,
           CAST(n2 AS BIGINT) AS n_below,
           round((n_runs - (2.0*n1*n2 / (n1+n2) + 1))
                 / sqrt(2.0*n1*n2 * (2.0*n1*n2 - n1 - n2)
                        / ((n1+n2)*(n1+n2)*(n1+n2-1.0))), 6) + 0.0 AS z_score
    FROM runs
    """,
    category="timeseries",
)
def stat_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test per series — the randomness check that
    completes the nonparametric family (KS, Mann-Whitney, chi²): values
    binarize against the series mean, runs count by lag-breaks, and the
    z-score comes from the exact run-count moments. Everything up to the
    final z is INTEGER arithmetic on one user_id window partitioning —
    the same single-Exchange shape as `window_streak_runs`, upgraded
    from description to inference."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    wp = Window.partitionBy("user_id")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        F.when(F.col("value") > F.avg("value").over(wp), 1)
        .otherwise(0)
        .alias("above"),
        F.row_number().over(wo).alias("pos"),
    )
    lagged = s.select(
        "user_id",
        "above",
        F.lag("above").over(Window.partitionBy("user_id").orderBy("pos")).alias("prev"),
    )
    runs = lagged.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("prev").isNull() | (F.col("above") != F.col("prev")), 1)
            .otherwise(0)
        ).alias("n_runs"),
        F.sum("above").alias("n1"),
        (F.count(F.lit(1)) - F.sum("above")).alias("n2"),
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("n_runs")
    mu = 2.0 * n1 * n2 / (n1 + n2) + 1
    var = (
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))
    )
    return runs.select(
        "user_id",
        r.cast("long").alias("n_runs"),
        n1.cast("long").alias("n_above"),
        n2.cast("long").alias("n_below"),
        (F.round((r - mu) / F.sqrt(var), 6) + F.lit(0.0)).alias("z_score"),
    )


@query(
    "forecast_seasonal_naive_backtest",
    # MAPE/sMAPE over the last-20 holdout, forecast = value 5 steps back
    # (the fixture's seasonal period, matching stat_seasonal_decompose)
    oracle=f"""
    WITH s AS (
      SELECT user_id, value,
             lag(value, 5) OVER (PARTITION BY user_id
                                 ORDER BY {EVENTS_ORDER_SQL}) AS fc,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY {EVENTS_ORDER_SQL}) AS pos,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM events
    ), holdout AS (
      SELECT user_id, value, fc FROM s
      WHERE pos > n - 20 AND fc IS NOT NULL AND value <> 0
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_eval,
           round(avg(abs(value - fc) / abs(value)), 6) + 0.0 AS mape,
           round(avg(2.0 * abs(value - fc) / (abs(value) + abs(fc))), 6)
             + 0.0 AS smape,
           round(avg(abs(value - fc)), 4) + 0.0 AS mae
    FROM holdout GROUP BY user_id
    """,
    category="timeseries",
)
def forecast_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest — the baseline every forecasting
    model must beat (and the honest eval the reference's notebook-only
    metrics never persisted): the forecast for each point is the value
    one season (5 steps) earlier, scored on the last-20 holdout per
    series with MAPE, sMAPE, and MAE. One lag + position window on a
    single user_id partitioning, then a per-series aggregate — the
    entire backtest is two narrow passes, embarrassingly parallel over
    series. Error ratios are per-row exact divisions of identical
    doubles; only the averaged metrics cross the rounding bridge."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wp = Window.partitionBy("user_id")
    s = ev.select(
        "user_id",
        "value",
        F.lag("value", 5).over(wo).alias("fc"),
        F.row_number().over(wo).alias("pos"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    holdout = s.filter(
        (F.col("pos") > F.col("n") - 20)
        & F.col("fc").isNotNull()
        & (F.col("value") != 0)
    )
    err = F.abs(F.col("value") - F.col("fc"))
    return holdout.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_eval"),
        (F.round(F.avg(err / F.abs("value")), 6) + F.lit(0.0)).alias("mape"),
        (
            F.round(F.avg(2.0 * err / (F.abs("value") + F.abs("fc"))), 6)
            + F.lit(0.0)
        ).alias("smape"),
        (F.round(F.avg(err), 4) + F.lit(0.0)).alias("mae"),
    )


@query(
    "stat_population_stability_index",
    # PSI over 10 fixed bins of the first-half value domain; counts are
    # exact integers, Laplace-smoothed shares, each ln nudge-rounded at 8
    # before the weighted sum
    oracle="""
    WITH halves AS (
      SELECT event_type, value,
             CASE WHEN dayofmonth(ts) <= 15 THEN 0 ELSE 1 END AS half
      FROM events
    ), binned AS (
      SELECT event_type, half,
             least(greatest(CAST(floor(value / 10.0) AS INT), 0), 9) AS bin
      FROM halves
    ), cells AS (
      SELECT event_type, bin,
             sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS n_ref,
             sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS n_cur
      FROM binned GROUP BY event_type, bin
    ), tot AS (
      SELECT event_type,
             CAST(sum(n_ref) AS DOUBLE) AS t_ref,
             CAST(sum(n_cur) AS DOUBLE) AS t_cur
      FROM cells GROUP BY event_type
    ), terms AS (
      SELECT c.event_type,
             ((c.n_ref + 0.5) / (t.t_ref + 5.0)
              - (c.n_cur + 0.5) / (t.t_cur + 5.0))
             * round(ln(((c.n_ref + 0.5) / (t.t_ref + 5.0))
                        / ((c.n_cur + 0.5) / (t.t_cur + 5.0)))
                     + sign(ln(((c.n_ref + 0.5) / (t.t_ref + 5.0))
                               / ((c.n_cur + 0.5) / (t.t_cur + 5.0)))) * 1e-9,
                     8) AS term
      FROM cells c JOIN tot t USING (event_type)
    )
    SELECT event_type, round(sum(term), 6) + 0.0 AS psi
    FROM terms GROUP BY event_type
    """,
    category="timeseries",
)
def stat_population_stability_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per segment — THE production ML drift
    monitor (PSI > 0.2 = retrain alarm): first-half vs second-half value
    distributions over 10 fixed bins, PSI = Σ(p−q)·ln(p/q) with Laplace
    smoothing (+0.5/bin) so empty bins never divide by zero. Fixed bins
    — not quantile bins — keep the whole computation ONE conditional
    aggregate over (segment, bin) cells with exact integer counts; each
    ln term crosses the nudged bridge pre-sum. At 100 TB the cell frame
    is |segments|·10 rows regardless of corpus size, and the reference
    shares are computed once and broadcast in a real deployment."""
    ev = load(spark, sf_dir, "events")
    binned = ev.select(
        "event_type",
        F.when(F.dayofmonth("ts") <= 15, 0).otherwise(1).alias("half"),
        F.least(
            F.greatest(F.floor(F.col("value") / 10.0).cast("int"), F.lit(0)),
            F.lit(9),
        ).alias("bin"),
    )
    cells = binned.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("n_cur"),
    )
    tot = cells.groupBy("event_type").agg(
        F.sum("n_ref").cast("double").alias("t_ref"),
        F.sum("n_cur").cast("double").alias("t_cur"),
    )
    p = (F.col("n_ref") + 0.5) / (F.col("t_ref") + 5.0)
    q = (F.col("n_cur") + 0.5) / (F.col("t_cur") + 5.0)
    lg = F.round(F.log(p / q) + F.signum(F.log(p / q)) * F.lit(1e-9), 8)
    terms = cells.join(F.broadcast(tot), "event_type").select(
        "event_type", ((p - q) * lg).alias("term")
    )
    return terms.groupBy("event_type").agg(
        (F.round(F.sum("term"), 6) + F.lit(0.0)).alias("psi")
    )


@query(
    "stat_durbin_watson",
    oracle=f"""
    WITH l AS (
      SELECT user_id, value,
             avg(value) OVER (PARTITION BY user_id) AS m,
             lag(value) OVER (PARTITION BY user_id
                              ORDER BY {EVENTS_ORDER_SQL}) AS prev
      FROM events
    )
    SELECT user_id,
           round(sum((value - prev) * (value - prev))
                 / sum((value - m) * (value - m)), 6) + 0.0 AS dw_stat,
           CAST(count(*) AS BIGINT) AS n_obs
    FROM l WHERE prev IS NOT NULL GROUP BY user_id
    """,
    category="timeseries",
)
def stat_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin–Watson statistic per series (Σ(Δx)²/Σ(x−x̄)², mean-model
    residuals): the autocorrelation diagnostic read directly — DW ≈ 2
    means no serial correlation, → 0 positive, → 4 negative —
    completing the serial-dependence toolkit beside ADF (unit root),
    Ljung-Box (joint lags), and the ACF. Convention: BOTH sums run over
    t=2..n (each series' first observation is dropped by the lag filter,
    so the denominator is Σ_{t>=2}(x_t−x̄)² with x̄ the FULL-series mean,
    not the textbook all-n residual sum — a 1/n-order difference the
    oracle replays identically). One lag window + per-series aggregate on
    a single user_id partitioning; the ratio of two sums of identical
    doubles crosses one rounding at the end."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    wp = Window.partitionBy("user_id")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    l = ev.select(
        "user_id",
        "value",
        F.avg("value").over(wp).alias("m"),
        F.lag("value").over(wo).alias("prev"),
    ).filter(F.col("prev").isNotNull())
    d2 = F.sum((F.col("value") - F.col("prev")) * (F.col("value") - F.col("prev")))
    s2 = F.sum((F.col("value") - F.col("m")) * (F.col("value") - F.col("m")))
    return l.groupBy("user_id").agg(
        (F.round(d2 / s2, 6) + F.lit(0.0)).alias("dw_stat"),
        F.count(F.lit(1)).cast("long").alias("n_obs"),
    )


@query(
    "stat_cuped_adjustment",
    oracle=f"""
    WITH g AS (
      SELECT user_id,
             CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS treated,
             CASE WHEN ts >= TIMESTAMP '{_DID_CUTOFF}' THEN 1 ELSE 0 END AS post,
             value
      FROM events WHERE event_type = 'purchase'
    ), per_user AS (
      SELECT user_id, max(treated) AS treated,
             avg(CASE WHEN post = 0 THEN value END) AS x,
             avg(CASE WHEN post = 1 THEN value END) AS y
      FROM g GROUP BY user_id
      HAVING count(CASE WHEN post = 0 THEN 1 END) > 0
         AND count(CASE WHEN post = 1 THEN 1 END) > 0
    ), mom AS (
      SELECT avg(x) AS mx, avg(y) AS my, avg(x * y) AS mxy,
             avg(x * x) AS mxx
      FROM per_user
    ), th AS (
      SELECT mx, (mxy - mx * my) / nullif(mxx - mx * mx, 0.0) AS theta
      FROM mom
    ), adj AS (
      SELECT u.treated, u.y, u.y - th.theta * (u.x - th.mx) AS y_adj
      FROM per_user u CROSS JOIN th
    )
    SELECT treated,
           CAST(count(*) AS BIGINT) AS n_users,
           round(avg(y), 4) + 0.0 AS mean_y,
           round(avg(y_adj), 4) + 0.0 AS mean_y_adj,
           round(avg(y * y) - avg(y) * avg(y), 4) + 0.0 AS var_y,
           round(avg(y_adj * y_adj) - avg(y_adj) * avg(y_adj), 4) + 0.0
             AS var_y_adj,
           round(100.0e0 * (1.0e0 - (avg(y_adj * y_adj) - avg(y_adj) * avg(y_adj))
                 / nullif(avg(y * y) - avg(y) * avg(y), 0.0))
                 + sign(1.0e0 - (avg(y_adj * y_adj) - avg(y_adj) * avg(y_adj))
                        / nullif(avg(y * y) - avg(y) * avg(y), 0.0)) * 1e-9, 4)
             + 0.0 AS var_reduction_pct
    FROM adj GROUP BY treated
    """,
    category="timeseries",
)
def stat_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al., WSDM 2013) — the standard
    experiment-readout companion to `stat_diff_in_diff`: per user, the
    pre-period purchase mean x is the covariate, the post-period mean y
    the metric; θ = cov(x,y)/var(x) is fit POOLED (the unbiased choice
    under randomized assignment), and y_adj = y − θ(x − x̄) keeps each
    arm's mean while shrinking its variance by the x↔y correlation —
    the readout reports per-arm mean, adjusted mean, both variances and
    the achieved reduction. Only users observed in BOTH periods enter
    (CUPED needs the covariate).

    Scale shape: one per-user conditional aggregate over the fact scan
    (map-side combined), a 1-row moment frame broadcast back, and a
    per-arm rollup — the raw log is scanned once, nothing wide ever
    shuffles. The variance-reduction ratio rides the nudged bridge; all
    other outputs are plain rounded means/variances."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    g = ev.select(
        "user_id",
        F.when(F.col("user_id") % 2 == 0, 1).otherwise(0).alias("treated"),
        F.when(
            F.col("ts") >= F.lit(_DID_CUTOFF).cast("timestamp"), 1
        ).otherwise(0).alias("post"),
        "value",
    )
    per_user = (
        g.groupBy("user_id")
        .agg(
            F.max("treated").alias("treated"),
            F.avg(F.when(F.col("post") == 0, F.col("value"))).alias("x"),
            F.avg(F.when(F.col("post") == 1, F.col("value"))).alias("y"),
            F.count(F.when(F.col("post") == 0, F.lit(1))).alias("_npre"),
            F.count(F.when(F.col("post") == 1, F.lit(1))).alias("_npost"),
        )
        .filter((F.col("_npre") > 0) & (F.col("_npost") > 0))
        .drop("_npre", "_npost")
    )
    mom = per_user.agg(
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.avg(F.col("x") * F.col("y")).alias("mxy"),
        F.avg(F.col("x") * F.col("x")).alias("mxx"),
    )
    th = mom.select(
        "mx",
        (
            (F.col("mxy") - F.col("mx") * F.col("my"))
            / F.nullif(F.col("mxx") - F.col("mx") * F.col("mx"), F.lit(0.0))
        ).alias("theta"),
    )
    adj = per_user.crossJoin(F.broadcast(th)).select(
        "treated",
        "y",
        (F.col("y") - F.col("theta") * (F.col("x") - F.col("mx"))).alias("y_adj"),
    )
    var_y = F.avg(F.col("y") * F.col("y")) - F.avg("y") * F.avg("y")
    var_adj = F.avg(F.col("y_adj") * F.col("y_adj")) - F.avg("y_adj") * F.avg(
        "y_adj"
    )
    return adj.groupBy("treated").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        rnd(F.avg("y"), 4).alias("mean_y"),
        rnd(F.avg("y_adj"), 4).alias("mean_y_adj"),
        rnd(var_y, 4).alias("var_y"),
        rnd(var_adj, 4).alias("var_y_adj"),
        rnd_nudged(
            F.lit(100.0) * (F.lit(1.0) - var_adj / F.nullif(var_y, F.lit(0.0))), 4
        ).alias("var_reduction_pct"),
    )


@query(
    "stat_spearman_corr",
    # average-rank formulation: rank() gives the min rank of a tie run and
    # the run length lifts it to the average rank — Spearman with the
    # standard tie correction, as Pearson over average ranks. Ranks are
    # exact integers+halves in both engines; only the final correlation
    # crosses the rounding bridge.
    oracle="""
    WITH r AS (
      SELECT l_returnflag AS grp,
             rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
               + (count(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1) / 2.0
               AS rx,
             rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
               + (count(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1) / 2.0
               AS ry
      FROM lineitem
    ), m AS (
      SELECT grp, count(*) AS n,
             avg(rx) AS mx, avg(ry) AS my,
             avg(rx * ry) AS mxy, avg(rx * rx) AS mxx, avg(ry * ry) AS myy
      FROM r GROUP BY grp
    )
    SELECT grp AS l_returnflag, CAST(n AS BIGINT) AS n,
           round((mxy - mx * my)
                 / sqrt((mxx - mx * mx) * (myy - my * my)), 6) + 0.0
             AS spearman_rho
    FROM m
    """,
    category="timeseries",
)
def stat_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (quantity vs extended price per return
    flag) with the standard average-rank tie treatment — the robust,
    monotone-association twin of the Pearson `stat_corr_matrix`.

    Shape: two rank windows per group (each one sort-shuffle on the group
    key) plus a per-(group, value) tie count that rides the same
    partitioning, then the correlation collapses to one moment aggregate —
    no N x N work, no per-row Python. The moment formulation (E[xy]-mu
    ratios, not corr()) keeps both engines on the identical arithmetic so
    only the final ratio needs the rounding bridge. At 100 TB the cost is
    the two sorts — exactly the floor for any exact rank statistic; for
    approximate rho at scale, rank via approx quantile buckets instead."""
    li = load(spark, sf_dir, "lineitem")
    from pyspark.sql import Window

    def avg_rank(col: str) -> F.Column:
        wr = Window.partitionBy("l_returnflag").orderBy(col)
        wt = Window.partitionBy("l_returnflag", col)
        return F.rank().over(wr) + (F.count(F.lit(1)).over(wt) - 1) / 2.0

    r = li.select(
        F.col("l_returnflag").alias("grp"),
        avg_rank("l_quantity").alias("rx"),
        avg_rank("l_extendedprice").alias("ry"),
    )
    m = r.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("rx").alias("mx"),
        F.avg("ry").alias("my"),
        F.avg(F.col("rx") * F.col("ry")).alias("mxy"),
        F.avg(F.col("rx") * F.col("rx")).alias("mxx"),
        F.avg(F.col("ry") * F.col("ry")).alias("myy"),
    )
    rho = (F.col("mxy") - F.col("mx") * F.col("my")) / F.sqrt(
        (F.col("mxx") - F.col("mx") * F.col("mx"))
        * (F.col("myy") - F.col("my") * F.col("my"))
    )
    return m.select(
        F.col("grp").alias("l_returnflag"),
        F.col("n").cast("long").alias("n"),
        rnd(rho, 6).alias("spearman_rho"),
    )


@query(
    "stat_anova_oneway",
    oracle="""
    WITH g AS (
      SELECT c_mktsegment AS grp, count(*) AS n, avg(c_acctbal) AS m,
             var_samp(c_acctbal) AS v
      FROM customer GROUP BY c_mktsegment
    ), tot AS (
      SELECT count(*) AS k, sum(n) AS n_total,
             sum(n * m) / sum(n) AS grand_mean
      FROM g
    ), ss AS (
      SELECT sum(g.n * (g.m - t.grand_mean) * (g.m - t.grand_mean)) AS ssb,
             sum((g.n - 1) * g.v) AS ssw
      FROM g CROSS JOIN tot t
    )
    SELECT CAST(t.k AS INT) AS n_groups,
           CAST(t.n_total AS BIGINT) AS n_total,
           round(s.ssb, 2) + 0.0 AS ss_between,
           round(s.ssw, 2) + 0.0 AS ss_within,
           round((s.ssb / (t.k - 1)) / (s.ssw / (t.n_total - t.k)), 6) + 0.0
             AS f_stat,
           round(s.ssb / (s.ssb + s.ssw), 6) + 0.0 AS eta_squared
    FROM tot t CROSS JOIN ss s
    """,
    category="timeseries",
)
def stat_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA (account balance across market segments): F statistic
    from the between/within sum-of-squares decomposition, plus eta-squared
    effect size — the k-group generalization of `stat_welch_t_test`.

    One grouped aggregate produces every per-segment moment (n, mean,
    var_samp); SSB/SSW then fold over k rows against the broadcast grand
    mean. The fact table is scanned ONCE and nothing after the first
    aggregate exceeds k rows, so the plan is flat at any corpus size."""
    cust = load(spark, sf_dir, "customer")
    g = cust.groupBy(F.col("c_mktsegment").alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("c_acctbal").alias("m"),
        F.var_samp("c_acctbal").alias("v"),
    )
    tot = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("n_total"),
        (F.sum(F.col("n") * F.col("m")) / F.sum("n")).alias("grand_mean"),
    )
    ss = g.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.col("n")
            * (F.col("m") - F.col("grand_mean"))
            * (F.col("m") - F.col("grand_mean"))
        ).alias("ssb"),
        F.sum((F.col("n") - 1) * F.col("v")).alias("ssw"),
        F.first("k").alias("k"),
        F.first("n_total").alias("n_total"),
    )
    return ss.select(
        F.col("k").cast("int").alias("n_groups"),
        F.col("n_total").cast("long").alias("n_total"),
        rnd(F.col("ssb"), 2).alias("ss_between"),
        rnd(F.col("ssw"), 2).alias("ss_within"),
        rnd(
            (F.col("ssb") / (F.col("k") - 1))
            / (F.col("ssw") / (F.col("n_total") - F.col("k"))),
            6,
        ).alias("f_stat"),
        rnd(F.col("ssb") / (F.col("ssb") + F.col("ssw")), 6).alias("eta_squared"),
    )


@query(
    "stat_proportion_ztest",
    # deterministic A/B assignment by user_id parity; conversion = the user
    # has at least one purchase above 150 (the all-purchases definition is
    # degenerate on the fixtures: every user converts, pooled var = 0).
    # Counts are integer-exact; only rates and z cross the rounding bridge.
    oracle="""
    WITH u AS (
      SELECT user_id, user_id % 2 AS arm,
             max(CASE WHEN event_type = 'purchase' AND value > 150 THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY user_id
    ), g AS (
      SELECT arm, count(*) AS n, sum(conv) AS c FROM u GROUP BY arm
    ), wide AS (
      SELECT max(CASE WHEN arm = 0 THEN n END) AS n0,
             max(CASE WHEN arm = 0 THEN c END) AS c0,
             max(CASE WHEN arm = 1 THEN n END) AS n1,
             max(CASE WHEN arm = 1 THEN c END) AS c1
      FROM g
    )
    SELECT CAST(n0 AS BIGINT) AS n_control, CAST(c0 AS BIGINT) AS conv_control,
           CAST(n1 AS BIGINT) AS n_treat, CAST(c1 AS BIGINT) AS conv_treat,
           round(CAST(c0 AS DOUBLE) / n0, 6) + 0.0 AS rate_control,
           round(CAST(c1 AS DOUBLE) / n1, 6) + 0.0 AS rate_treat,
           round((CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
                 / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                        * (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                        * (1.0 / n0 + 1.0 / n1)), 6) + 0.0 AS z_score
    FROM wide
    """,
    category="timeseries",
)
def stat_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on conversion (did the user ever purchase above 150?)
    between deterministic parity-split arms — the binary-outcome member of
    the experimentation family beside Welch (means), Mann-Whitney (ranks),
    CUPED (variance reduction) and diff-in-diff (trends). Pooled-variance
    normal approximation.

    Shape: one per-user aggregate (conversion is max over the user's
    events — map-side combined), one 2-row arm aggregate, one pivot to a
    single row. Nothing after the first groupBy exceeds two rows."""
    ev = load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when((F.col("event_type") == "purchase") & (F.col("value") > 150), 1)
            .otherwise(0)
        ).alias("conv")
    ).select((F.col("user_id") % 2).alias("arm"), "conv")
    g = u.groupBy("arm").agg(F.count(F.lit(1)).alias("n"), F.sum("conv").alias("c"))
    pick = lambda col, a: F.max(F.when(F.col("arm") == a, F.col(col)))  # noqa: E731
    wide = g.agg(
        pick("n", 0).alias("n0"),
        pick("c", 0).alias("c0"),
        pick("n", 1).alias("n1"),
        pick("c", 1).alias("c1"),
    )
    p0 = F.col("c0").cast("double") / F.col("n0")
    p1 = F.col("c1").cast("double") / F.col("n1")
    pp = (F.col("c0") + F.col("c1")).cast("double") / (F.col("n0") + F.col("n1"))
    return wide.select(
        F.col("n0").cast("long").alias("n_control"),
        F.col("c0").cast("long").alias("conv_control"),
        F.col("n1").cast("long").alias("n_treat"),
        F.col("c1").cast("long").alias("conv_treat"),
        rnd(p0, 6).alias("rate_control"),
        rnd(p1, 6).alias("rate_treat"),
        rnd(
            (p1 - p0)
            / F.sqrt(pp * (1.0 - pp) * (1.0 / F.col("n0") + 1.0 / F.col("n1"))),
            6,
        ).alias("z_score"),
    )


@query(
    "stat_ratio_metric_delta",
    # ratio metrics (revenue per event) violate the iid assumption of the
    # plain t-test — users, not events, are the randomization unit. The
    # delta method linearizes r = Σn/Σd around the user-level moments.
    oracle="""
    WITH u AS (
      SELECT user_id, user_id % 2 AS arm,
             sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END) AS n,
             count(*) AS d
      FROM events GROUP BY user_id
    ), m AS (
      SELECT arm, count(*) AS users,
             sum(n) AS sum_num, sum(d) AS sum_den,
             avg(n) AS mn, avg(CAST(d AS DOUBLE)) AS md,
             var_samp(n) AS vn, var_samp(CAST(d AS DOUBLE)) AS vd,
             (sum(n * d) - sum(n) * sum(d) / count(*)) / (count(*) - 1) AS cov_nd
      FROM u GROUP BY arm
    )
    SELECT CAST(arm AS BIGINT) AS arm,
           CAST(users AS BIGINT) AS n_users,
           round(sum_num, 2) + 0.0 AS sum_num,
           CAST(sum_den AS BIGINT) AS sum_den,
           round(sum_num / sum_den, 6) + 0.0 AS ratio,
           round(sqrt((vn - 2.0 * (sum_num / sum_den) * cov_nd
                       + (sum_num / sum_den) * (sum_num / sum_den) * vd)
                      / users) / md, 6) + 0.0 AS se_delta
    FROM m
    """,
    category="timeseries",
)
def stat_ratio_metric_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method standard error for a RATIO metric (purchase revenue per
    event) under user-level randomization (parity arms) — the correct
    uncertainty for the metrics every experimentation platform actually
    ships (CTR, revenue/session), where the naive per-event t-test
    understates variance because events within a user are correlated
    (Deng et al. 2011). Var(r) ≈ (σ_n² − 2r·σ_nd + r²·σ_d²) / (N·μ_d²).

    Shape: one per-user aggregate, one 2-row arm aggregate of the five
    moments — the covariance is computed from the raw Σnd moment so both
    engines share the exact arithmetic, and nothing after the first
    groupBy exceeds two rows."""
    ev = load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
        ).alias("n"),
        F.count(F.lit(1)).alias("d"),
    ).select((F.col("user_id") % 2).alias("arm"), "n", F.col("d").cast("double").alias("d"))
    m = u.groupBy("arm").agg(
        F.count(F.lit(1)).alias("users"),
        F.sum("n").alias("sum_num"),
        F.sum("d").alias("sum_den"),
        F.avg("n").alias("mn"),
        F.avg("d").alias("md"),
        F.var_samp("n").alias("vn"),
        F.var_samp("d").alias("vd"),
        (
            (F.sum(F.col("n") * F.col("d")) - F.sum("n") * F.sum("d") / F.count(F.lit(1)))
            / (F.count(F.lit(1)) - 1)
        ).alias("cov_nd"),
    )
    r = F.col("sum_num") / F.col("sum_den")
    return m.select(
        F.col("arm").cast("long").alias("arm"),
        F.col("users").cast("long").alias("n_users"),
        rnd(F.col("sum_num"), 2).alias("sum_num"),
        F.col("sum_den").cast("long").alias("sum_den"),
        rnd(r, 6).alias("ratio"),
        rnd(
            F.sqrt(
                (
                    F.col("vn")
                    - 2.0 * r * F.col("cov_nd")
                    + r * r * F.col("vd")
                )
                / F.col("users")
            )
            / F.col("md"),
            6,
        ).alias("se_delta"),
    )


# two-sided alpha=0.05 and power=0.80 normal quantiles, precomputed (the
# engine keeps transcendentals out of runtime where a literal does):
# z_{0.975} and z_{0.80}
_Z_ALPHA = 1.959963984540054
_Z_POWER = 0.8416212335729143


@query(
    "stat_power_sample_size",
    oracle=f"""
    WITH m AS (
      SELECT avg(value) AS mu, var_samp(value) AS v
      FROM events WHERE event_type = 'purchase'
    ), mde AS (SELECT unnest([1, 2, 5, 10]) AS mde_pct)
    SELECT CAST(mde.mde_pct AS INT) AS mde_pct,
           round(m.mu, 4) + 0.0 AS mean_value,
           round(sqrt(m.v), 4) + 0.0 AS stddev_value,
           CAST(ceil(2.0 * m.v * {_Z_ALPHA + _Z_POWER!r} * {_Z_ALPHA + _Z_POWER!r}
                     / ((mde.mde_pct / 100.0e0 * m.mu)
                        * (mde.mde_pct / 100.0e0 * m.mu))) AS BIGINT)
             AS n_per_arm
    FROM m CROSS JOIN mde
    """,
    category="timeseries",
)
def stat_power_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-priori sample-size calculator for the experimentation suite: users
    per arm needed to detect a 1/2/5/10% relative lift in purchase value at
    α=0.05 (two-sided), power 0.80 — n = 2σ²(z_{{α/2}}+z_β)²/δ² with the
    normal quantiles as precomputed literals (the `stat_benford` pattern:
    no runtime transcendentals). The planning half of the family whose
    post-hoc halves are `stat_welch_t_test` and `stat_proportion_ztest`.

    Shape: ONE moment aggregate over the fact scan, then a 4-row MDE dim
    cross — the calculator itself is free at any corpus size; what the
    corpus buys is the σ estimate."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    m = ev.agg(F.avg("value").alias("mu"), F.var_samp("value").alias("v"))
    mde = spark.createDataFrame([(1,), (2,), (5,), (10,)], "mde_pct int")
    z2 = (_Z_ALPHA + _Z_POWER) * (_Z_ALPHA + _Z_POWER)  # same multiply as the oracle
    delta = F.col("mde_pct") / F.lit(100.0) * F.col("mu")
    return m.crossJoin(F.broadcast(mde)).select(
        F.col("mde_pct").cast("int").alias("mde_pct"),
        rnd(F.col("mu"), 4).alias("mean_value"),
        rnd(F.sqrt(F.col("v")), 4).alias("stddev_value"),
        F.ceil(F.lit(2.0) * F.col("v") * F.lit(z2) / (delta * delta))
        .cast("long")
        .alias("n_per_arm"),
    )


# Bernoulli SPRT literals (Wald 1945): H0 p=0.03 vs H1 p=0.06, α=β=0.05.
# Per-trial LLR increments and the decision bound ±ln(19) are precomputed
# doubles (the stat_benford pattern — no runtime transcendental), so every
# cumulative sum is a sum of two exact literals: engine-identical.
_SPRT_LLR_HIT = 0.6931471805599453     # ln(p1/p0)
_SPRT_LLR_MISS = -0.03141619623337893  # ln((1-p1)/(1-p0))
_SPRT_BOUND = 2.9444389791664403       # ln((1-β)/α) = ln(19)


@query(
    "stat_sprt_sequential_test",
    oracle=f"""
    WITH trials AS (
      SELECT user_id % 2 AS arm, ts, event_id,
             CASE WHEN value > 150 THEN 1 ELSE 0 END AS x
      FROM events WHERE event_type = 'purchase'
    ), walk AS (
      SELECT arm, ts, event_id, x,
             row_number() OVER w AS trial_n,
             sum(CASE WHEN x = 1 THEN {_SPRT_LLR_HIT!r}
                      ELSE {_SPRT_LLR_MISS!r} END) OVER w AS llr
      FROM trials
      WINDOW w AS (PARTITION BY arm ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), crossed AS (
      SELECT arm, trial_n, llr,
             row_number() OVER (PARTITION BY arm ORDER BY trial_n) AS cross_rank
      FROM walk
      WHERE llr >= {_SPRT_BOUND!r} OR llr <= -{_SPRT_BOUND!r}
    ), decision AS (
      SELECT arm, trial_n AS n_at_decision, llr AS llr_at_decision
      FROM crossed WHERE cross_rank = 1
    ), tot AS (
      SELECT arm, count(*) AS n_trials, sum(x) AS n_hits,
             max(llr) AS max_llr, min(llr) AS min_llr
      FROM walk GROUP BY arm
    )
    SELECT CAST(t.arm AS BIGINT) AS arm,
           CAST(t.n_trials AS BIGINT) AS n_trials,
           CAST(t.n_hits AS BIGINT) AS n_hits,
           round(t.max_llr, 6) + 0.0 AS max_llr,
           round(t.min_llr, 6) + 0.0 AS min_llr,
           CAST(coalesce(d.n_at_decision, 0) AS BIGINT) AS n_at_decision,
           CASE WHEN d.arm IS NULL THEN 'undecided'
                WHEN d.llr_at_decision > 0 THEN 'accept_h1'
                ELSE 'accept_h0' END AS decision
    FROM tot t LEFT JOIN decision d ON d.arm = t.arm
    """,
    category="timeseries",
)
def stat_sprt_sequential_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's Sequential Probability Ratio Test over the purchase stream
    (H0: conversion 3% vs H1: 6%, α=β=0.05): per arm, the cumulative
    log-likelihood walk in event order and the FIRST boundary crossing —
    the always-valid sequential-testing member of the experimentation
    family, which reaches a decision with ~half the samples of the
    fixed-horizon `stat_proportion_ztest` and never peeks illegally.

    Shape: one ordered window per arm (the same sort any per-arm cumsum
    pays) over trial scalars; the crossing argmin is a filter + rank on
    the walk. Per-trial increments are two exact literals, so the
    cumulative LLR is engine-exact at every row and the crossing row —
    and therefore the decision — is deterministic."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    trials = ev.select(
        (F.col("user_id") % 2).alias("arm"),
        "ts",
        "event_id",
        F.when(F.col("value") > 150, 1).otherwise(0).alias("x"),
    )
    w = Window.partitionBy("arm").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    walk = trials.select(
        "arm",
        "x",
        F.row_number().over(
            Window.partitionBy("arm").orderBy("ts", "event_id")
        ).alias("trial_n"),
        F.sum(
            F.when(F.col("x") == 1, F.lit(_SPRT_LLR_HIT)).otherwise(
                F.lit(_SPRT_LLR_MISS)
            )
        ).over(w).alias("llr"),
    )
    crossed = walk.filter(
        (F.col("llr") >= _SPRT_BOUND) | (F.col("llr") <= -_SPRT_BOUND)
    )
    wd = Window.partitionBy("arm").orderBy("trial_n")
    decision = (
        crossed.withColumn("cross_rank", F.row_number().over(wd))
        .filter(F.col("cross_rank") == 1)
        .select(
            "arm",
            F.col("trial_n").alias("n_at_decision"),
            F.col("llr").alias("llr_at_decision"),
        )
    )
    tot = walk.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_trials"),
        F.sum("x").alias("n_hits"),
        F.max("llr").alias("max_llr"),
        F.min("llr").alias("min_llr"),
    )
    return tot.join(decision, "arm", "left").select(
        F.col("arm").cast("long").alias("arm"),
        F.col("n_trials").cast("long").alias("n_trials"),
        F.col("n_hits").cast("long").alias("n_hits"),
        rnd(F.col("max_llr"), 6).alias("max_llr"),
        rnd(F.col("min_llr"), 6).alias("min_llr"),
        F.coalesce("n_at_decision", F.lit(0)).cast("long").alias("n_at_decision"),
        F.when(F.col("llr_at_decision").isNull(), "undecided")
        .when(F.col("llr_at_decision") > 0, "accept_h1")
        .otherwise("accept_h0")
        .alias("decision"),
    )


# α = 1/4 — an exact binary fraction, so the SES folds are identical IEEE
# op chains on both engines (the window_holt_linear_forecast discipline)
_CROSTON_ALPHA = 0.25


@query(
    "forecast_croston_intermittent",
    oracle=f"""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             sum(CAST(round(CAST(value AS DOUBLE) * 100.0) AS BIGINT)) AS zc
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, CAST(ts AS DATE)
    ), s AS (
      SELECT user_id,
             list(CAST(zc AS DOUBLE) / 100.0 ORDER BY d) AS zz,
             list(date_diff('day', DATE '1970-01-01', d) ORDER BY d) AS dd,
             count(*) AS k
      FROM daily GROUP BY user_id
      HAVING count(*) >= 2
    ), f AS (
      SELECT user_id, k,
             list_reduce(zz,
               (acc, x) -> {_CROSTON_ALPHA} * x
                           + (1.0 - {_CROSTON_ALPHA}) * acc) AS zhat,
             list_reduce(
               list_transform(range(2, CAST(k AS INT) + 1),
                              i -> CAST(dd[i] - dd[i - 1] AS DOUBLE)),
               (acc, x) -> {_CROSTON_ALPHA} * x
                           + (1.0 - {_CROSTON_ALPHA}) * acc) AS qhat
      FROM s
    )
    SELECT user_id, CAST(k AS BIGINT) AS n_demand_days,
           round(zhat + sign(zhat) * 1e-9, 6) + 0.0 AS level_demand,
           round(qhat + sign(qhat) * 1e-9, 6) + 0.0 AS level_interval,
           round(zhat / qhat + sign(zhat / qhat) * 1e-9, 6) + 0.0
             AS croston_rate,
           round((1.0 - {_CROSTON_ALPHA} / 2.0) * (zhat / qhat)
                 + sign(zhat / qhat) * 1e-9, 6) + 0.0 AS sba_rate
    FROM f
    """,
    category="timeseries",
)
def forecast_croston_intermittent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method for INTERMITTENT demand (Croston 1972, plus the
    Syntetos–Boylan bias correction): purchase streams are mostly-zero
    daily series, where ordinary SES/Holt forecasts collapse toward zero
    between purchases — Croston instead smooths the NONZERO demand sizes
    and the inter-demand intervals separately and forecasts their ratio,
    the standard spare-parts/retail sparse-demand estimator.

    Scale shape: one (user, day) pre-aggregate (demand in exact integer
    cents — order-free), one user_id shuffle collecting each user's
    demand-day series, and both SES recurrences run as sequential HOF
    folds INSIDE the row (JVM, no Python, no second shuffle) — the
    `window_holt_linear_forecast` posture. α=1/4 is an exact binary
    fraction and both engines replay the identical left fold (init =
    first element), so accumulators are bit-exact and only the final
    ratios cross the nudged-6 bridge."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("d")
    ).agg(
        F.sum(
            F.round(F.col("value").cast("double") * 100.0).cast("long")
        ).alias("zc")
    )
    s = (
        daily.select(
            "user_id",
            F.struct(
                F.expr("datediff(d, date'1970-01-01')").alias("dn"),
                (F.col("zc").cast("double") / 100.0).alias("z"),
            ).alias("p"),
        )
        .groupBy("user_id")
        .agg(
            F.expr("transform(array_sort(collect_list(p)), x -> x.z)").alias("zz"),
            F.expr("transform(array_sort(collect_list(p)), x -> x.dn)").alias("dd"),
            F.count(F.lit(1)).alias("k"),
        )
        .filter(F.col("k") >= 2)
    )
    a = _CROSTON_ALPHA
    zfold = (
        f"aggregate(slice(zz, 2, size(zz) - 1), element_at(zz, 1), "
        f"(acc, x) -> {a}D * x + (1.0D - {a}D) * acc)"
    )
    ivs = (
        "transform(sequence(2, cast(k as int)), "
        "i -> cast(element_at(dd, i) - element_at(dd, i - 1) as double))"
    )
    qfold = (
        f"aggregate(slice({ivs}, 2, size({ivs}) - 1), element_at({ivs}, 1), "
        f"(acc, x) -> {a}D * x + (1.0D - {a}D) * acc)"
    )
    from etl_aws_spark.suite._util import rnd_nudged

    zhat = F.expr(zfold)
    qhat = F.expr(qfold)
    return s.select(
        "user_id",
        F.col("k").cast("long").alias("n_demand_days"),
        rnd_nudged(zhat, 6).alias("level_demand"),
        rnd_nudged(qhat, 6).alias("level_interval"),
        rnd_nudged(zhat / qhat, 6).alias("croston_rate"),
        (
            F.round(
                F.lit(1.0 - a / 2.0) * (zhat / qhat)
                + F.signum(zhat / qhat) * F.lit(1e-9),
                6,
            )
            + F.lit(0.0)
        ).alias("sba_rate"),
    )


# exact binary fractions: process/measurement noise and dt — the Kalman
# recurrence is a pure add/mul/div chain with identical op order on both
# engines, so the state and covariance accumulators are bit-exact
_KAL_Q, _KAL_R = 0.125, 4.0


@query(
    "window_kalman_filter_1d",
    oracle=f"""
    WITH s AS (
      SELECT user_id,
             list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vv,
             count(*) AS n
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
      HAVING count(*) >= 2
    ), f AS (
      SELECT user_id, n,
             list_reduce(
               list_prepend([vv[1], CAST(1.0 AS DOUBLE),
                             CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)],
                 list_transform(vv[2:], z -> [z, CAST(0.0 AS DOUBLE),
                                              CAST(0.0 AS DOUBLE),
                                              CAST(0.0 AS DOUBLE)])),
               (acc, m) -> [
                 (acc[1] + (acc[2] + {_KAL_Q}) / (acc[2] + {_KAL_Q} + {_KAL_R})
                            * (m[1] - acc[1])),
                 ((acc[2] + {_KAL_Q})
                  - (acc[2] + {_KAL_Q}) / (acc[2] + {_KAL_Q} + {_KAL_R})
                    * (acc[2] + {_KAL_Q})),
                 (acc[2] + {_KAL_Q}) / (acc[2] + {_KAL_Q} + {_KAL_R}),
                 m[1] - acc[1]
               ]) AS st
      FROM s
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_obs,
           round(st[1] + sign(st[1]) * 1e-9, 6) + 0.0 AS level,
           round(st[2] + sign(st[2]) * 1e-9, 6) + 0.0 AS variance,
           round(st[3] + sign(st[3]) * 1e-9, 6) + 0.0 AS last_gain,
           round(st[4] + sign(st[4]) * 1e-9, 6) + 0.0 AS last_innovation
    FROM f
    """,
    category="timeseries",
)
def window_kalman_filter_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D Kalman filter (random-walk state, noisy observations) per
    series — the optimal-gain generalization of the EWMA family: where
    EWMA/Holt fix their smoothing constants, the Kalman gain
    K = (P+Q)/(P+Q+R) ADAPTS from the running error covariance, trusting
    data when uncertainty is high and the filter once it converges. Per
    user: filtered level, posterior variance, last gain (the effective
    adaptive α), last innovation (the residual an anomaly detector
    thresholds).

    Scale shape: the `window_holt_linear_forecast` posture — one user_id
    shuffle collects each series, and the recurrence runs as ONE
    sequential HOF fold inside the row with an array<double>
    [level, P, K, innovation] accumulator (JVM, no Python, no second
    shuffle). Q=1/8 and R=4 are exact binary fractions and both engines
    replay the identical IEEE op chain, so state and covariance are
    bit-exact; outputs cross the nudged-6 bridge."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    s = (
        ev.select(
            "user_id",
            F.struct(
                F.col("ts").alias("t"),
                F.col("event_id").alias("e"),
                F.col("value").cast("double").alias("v"),
            ).alias("p"),
        )
        .groupBy("user_id")
        .agg(
            F.expr("transform(array_sort(collect_list(p)), x -> x.v)").alias("vv"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") >= 2)
    )
    q, r = _KAL_Q, _KAL_R
    # acc = [level, P, K, innovation]; predict: P' = P + Q; update:
    # K = P'/(P'+R); level += K*(z - level); P = P' - K*P'
    fold = (
        f"aggregate(slice(vv, 2, size(vv) - 1), "
        f"array(element_at(vv, 1), cast(1.0 as double), "
        f"cast(0.0 as double), cast(0.0 as double)), "
        f"(acc, z) -> array("
        f"(element_at(acc, 1) + (element_at(acc, 2) + {q}D) "
        f"/ (element_at(acc, 2) + {q}D + {r}D) * (z - element_at(acc, 1))), "
        f"((element_at(acc, 2) + {q}D) - (element_at(acc, 2) + {q}D) "
        f"/ (element_at(acc, 2) + {q}D + {r}D) * (element_at(acc, 2) + {q}D)), "
        f"(element_at(acc, 2) + {q}D) / (element_at(acc, 2) + {q}D + {r}D), "
        f"z - element_at(acc, 1)))"
    )
    from etl_aws_spark.suite._util import rnd_nudged

    st = F.expr(fold)
    return s.select(
        "user_id",
        F.col("n").cast("long").alias("n_obs"),
        rnd_nudged(st.getItem(0), 6).alias("level"),
        rnd_nudged(st.getItem(1), 6).alias("variance"),
        rnd_nudged(st.getItem(2), 6).alias("last_gain"),
        rnd_nudged(st.getItem(3), 6).alias("last_innovation"),
    )


_PERIODOGRAM_PERIODS = [7, 14, 30, 91, 365]
_TWO_PI = 6.283185307179586


@query(
    "stat_periodogram_revenue",
    # single-frequency periodogram at fixed CALENDAR periods: daily
    # revenue in exact cents, demeaned against the exact mean, projected
    # onto cos/sin at 2π·day/period. Trig values are nudge-rounded to 8
    # digits BEFORE multiplying (cross-engine libm cos/sin differ in the
    # last ulp — quantizing the basis makes the products deterministic),
    # and each projection folds in day order.
    oracle=f"""
    WITH daily AS (
      SELECT o_orderdate AS d,
             sum(CAST(round(CAST(o_totalprice AS DOUBLE) * 100.0) AS BIGINT))
               AS cents
      FROM orders GROUP BY o_orderdate
    ), m AS (
      SELECT min(d) AS d0, count(*) AS n,
             CAST(sum(cents) AS DOUBLE) / count(*) AS mu
      FROM daily
    ), x AS (
      SELECT date_diff('day', m.d0, daily.d) AS idx,
             CAST(daily.cents AS DOUBLE) - m.mu AS xv
      FROM daily CROSS JOIN m
    ), terms AS (
      SELECT p.p, x.idx,
             x.xv * (round(cos({_TWO_PI} * x.idx / p.p)
                     + sign(cos({_TWO_PI} * x.idx / p.p)) * 1e-9, 8) + 0.0)
               AS tc,
             x.xv * (round(sin({_TWO_PI} * x.idx / p.p)
                     + sign(sin({_TWO_PI} * x.idx / p.p)) * 1e-9, 8) + 0.0)
               AS tsn
      FROM x CROSS JOIN (SELECT unnest({_PERIODOGRAM_PERIODS}) AS p) p
    ), proj AS (
      SELECT p,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(tc ORDER BY idx)), (acc, v) -> acc + v) AS a,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(tsn ORDER BY idx)), (acc, v) -> acc + v) AS b
      FROM terms GROUP BY p
    ), ss AS (
      SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(xv * xv ORDER BY idx)), (acc, v) -> acc + v) AS sxx,
             max(m.n) AS n
      FROM x CROSS JOIN m
    )
    SELECT CAST(proj.p AS INT) AS period_days,
           CAST(ss.n AS BIGINT) AS n_days,
           round(2.0 * sqrt(proj.a * proj.a + proj.b * proj.b) / ss.n / 100.0,
                 4) + 0.0 AS amplitude,
           round((proj.a * proj.a + proj.b * proj.b)
                 / (ss.sxx * ss.n / 2.0), 6) + 0.0 AS power_share
    FROM proj CROSS JOIN ss
    """,
    category="timeseries",
)
def stat_periodogram_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-frequency PERIODOGRAM of daily revenue at the calendar
    periods that matter (week, fortnight, month, quarter, year): the
    cos/sin projection amplitude and its share of total variance at each
    period — the seasonality detector that tells a forecasting pipeline
    WHICH cycle to model before `stat_seasonal_decompose` extracts it
    (a flat table = no exploitable cycle, the honest answer for
    uniform synthetic orders).

    Scale shape: the fact table reduces to the |days| cents frame first
    (exact integers), projections are per-(period, day) scalar terms
    folded in day order over the bounded |days| frame, and the trig
    basis is nudge-rounded to 8 digits BEFORE the product so libm's
    last-ulp cos/sin differences can never reach the fold — the
    cross-engine determinism recipe for transcendental bases."""
    orders = load(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(
            F.round(F.col("o_totalprice").cast("double") * 100.0).cast("long")
        ).alias("cents")
    )
    m = daily.agg(
        F.min("d").alias("d0"),
        F.count(F.lit(1)).alias("n"),
        (F.sum("cents").cast("double") / F.count(F.lit(1))).alias("mu"),
    )
    x = daily.crossJoin(F.broadcast(m)).select(
        F.datediff("d", "d0").alias("idx"),
        (F.col("cents").cast("double") - F.col("mu")).alias("xv"),
        "n",
    )
    periods = spark.createDataFrame(
        [(p,) for p in _PERIODOGRAM_PERIODS], "p int"
    )
    theta = F.lit(_TWO_PI) * F.col("idx") / F.col("p")
    from etl_aws_spark.suite._util import rnd_nudged

    terms = x.crossJoin(F.broadcast(periods)).select(
        "p",
        "idx",
        (F.col("xv") * rnd_nudged(F.cos(theta), 8)).alias("tc"),
        (F.col("xv") * rnd_nudged(F.sin(theta), 8)).alias("tsn"),
    )
    fold = (
        "aggregate(transform(array_sort(collect_list(struct(idx, {c}))), "
        "s -> s.{c}), cast(0.0 as double), (acc, v) -> acc + v)"
    )
    proj = terms.groupBy("p").agg(
        F.expr(fold.format(c="tc")).alias("a"),
        F.expr(fold.format(c="tsn")).alias("b"),
    )
    ss = x.select("idx", (F.col("xv") * F.col("xv")).alias("x2"), "n").agg(
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(idx, x2))), "
            "s -> s.x2), cast(0.0 as double), (acc, v) -> acc + v)"
        ).alias("sxx"),
        F.max("n").alias("n"),
    )
    pw = F.col("a") * F.col("a") + F.col("b") * F.col("b")
    return proj.crossJoin(F.broadcast(ss)).select(
        F.col("p").cast("int").alias("period_days"),
        F.col("n").cast("long").alias("n_days"),
        rnd(F.lit(2.0) * F.sqrt(pw) / F.col("n") / 100.0, 4).alias("amplitude"),
        (
            F.round(pw / (F.col("sxx") * F.col("n") / 2.0), 6) + F.lit(0.0)
        ).alias("power_share"),
    )


# (shape k, scale λ-days) grid for the parametric reorder-survival fit —
# broadcast dim, 40 cells
_WEIBULL_KS = [0.5, 0.75, 1.0, 1.25, 1.5]
_WEIBULL_LAMBDAS = [20.0, 40.0, 60.0, 80.0, 120.0, 160.0, 240.0, 320.0]


@query(
    "stat_weibull_censored_mle",
    # censored Weibull log-likelihood on the |distinct duration|×2 cell
    # histogram: event cells contribute ln(k/λ)+(k−1)ln(t/λ)−(t/λ)^k,
    # censored cells −(t/λ)^k, each cnt-weighted term nudge-rounded to 6
    # BEFORE an ordered fold per grid cell; argmax (k, λ) by loglik with
    # (k, λ) tie-break. t is shifted +1 day so ln(t) is defined for
    # same-day reorders (documented, both engines identical).
    oracle=f"""
    WITH o AS (
      SELECT o_custkey, o_orderdate,
             lead(o_orderdate) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey)
               AS nxt
      FROM orders
    ), mx AS (
      SELECT max(o_orderdate) AS tmax FROM orders
    ), obs AS (
      SELECT date_diff('day', o_orderdate, nxt) + 1 AS t, 1 AS ev
      FROM o WHERE nxt IS NOT NULL
      UNION ALL
      SELECT date_diff('day', o_orderdate, mx.tmax) + 1 AS t, 0 AS ev
      FROM o CROSS JOIN mx WHERE o.nxt IS NULL
    ), cells AS (
      SELECT t, ev, count(*) AS cnt FROM obs GROUP BY t, ev
    ), grid AS (
      SELECT k.k, l.l
      FROM (SELECT unnest({_WEIBULL_KS}) AS k) k
      CROSS JOIN (SELECT unnest({_WEIBULL_LAMBDAS}) AS l) l
    ), terms AS (
      SELECT g.k, g.l, c.t, c.ev,
             round(c.cnt * (CASE WHEN c.ev = 1
                     THEN ln(g.k / g.l) + (g.k - 1.0) * ln(c.t / g.l)
                          - pow(c.t / g.l, g.k)
                     ELSE -pow(c.t / g.l, g.k) END)
                   + sign(c.cnt * (CASE WHEN c.ev = 1
                     THEN ln(g.k / g.l) + (g.k - 1.0) * ln(c.t / g.l)
                          - pow(c.t / g.l, g.k)
                     ELSE -pow(c.t / g.l, g.k) END)) * 1e-9, 6) + 0.0 AS v
      FROM cells c CROSS JOIN grid g
    ), ll AS (
      SELECT k, l,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(v ORDER BY t, ev)), (acc, x) -> acc + x) AS loglik
      FROM terms GROUP BY k, l
    ), best AS (
      SELECT k, l, loglik FROM ll
      ORDER BY loglik DESC, k ASC, l ASC LIMIT 1
    )
    SELECT round(k, 2) + 0.0 AS shape_k,
           round(l, 1) + 0.0 AS scale_lambda,
           round(loglik, 4) + 0.0 AS loglik,
           round(l * pow(0.6931471805599453, 1.0 / k), 4) + 0.0
             AS median_days,
           CAST((SELECT sum(cnt) FROM cells WHERE ev = 1) AS BIGINT)
             AS n_events,
           CAST((SELECT sum(cnt) FROM cells WHERE ev = 0) AS BIGINT)
             AS n_censored
    FROM best
    """,
    category="timeseries",
)
def stat_weibull_censored_mle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARAMETRIC reorder-survival fit: censored Weibull maximum
    likelihood over a fixed (shape, scale) grid — the model-based twin of
    `stat_kaplan_meier_survival` (KM describes the observed curve; the
    Weibull extrapolates beyond it and its shape k says whether churn
    risk rises (k>1) or falls (k<1) with tenure — the single most
    decision-relevant retention parameter). Right-censoring handled
    exactly: censored gaps contribute the log-survival −(t/λ)^k, the
    term naive averages silently drop.

    Scale shape: durations reduce to the |distinct day|×2 cell histogram
    once; the grid is a 40-row broadcast dim, each cell's cnt-weighted
    log-lik term is nudge-rounded BEFORE an ordered fold per grid point
    (the grid-MLE recipe of the Yeo-Johnson fit), and the argmax is an
    orderBy().limit(1) on the 40-row frame."""
    from pyspark.sql import Window

    from etl_aws_spark.suite._util import rnd_nudged

    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = orders.select(
        "o_custkey", "o_orderdate",
        F.lead("o_orderdate").over(w).alias("nxt"),
    )
    mx = orders.agg(F.max("o_orderdate").alias("tmax"))
    obs = (
        o.filter(F.col("nxt").isNotNull())
        .select(
            (F.datediff(F.to_date("nxt"), F.to_date("o_orderdate")) + 1).alias("t"),
            F.lit(1).alias("ev"),
        )
        .unionByName(
            o.filter(F.col("nxt").isNull())
            .crossJoin(F.broadcast(mx))
            .select(
                (F.datediff(F.to_date("tmax"), F.to_date("o_orderdate")) + 1).alias("t"),
                F.lit(0).alias("ev"),
            )
        )
    )
    cells = obs.groupBy("t", "ev").agg(F.count(F.lit(1)).alias("cnt")).localCheckpoint(
        eager=True
    )
    grid = spark.createDataFrame(
        [(k, l) for k in _WEIBULL_KS for l in _WEIBULL_LAMBDAS], "k double, l double"
    )
    tt = F.col("t").cast("double")
    term = F.when(
        F.col("ev") == 1,
        F.log(F.col("k") / F.col("l"))
        + (F.col("k") - 1.0) * F.log(tt / F.col("l"))
        - F.pow(tt / F.col("l"), F.col("k")),
    ).otherwise(-F.pow(tt / F.col("l"), F.col("k")))
    terms = cells.crossJoin(F.broadcast(grid)).select(
        "k", "l", "t", "ev", rnd_nudged(F.col("cnt") * term, 6).alias("v")
    )
    ll = terms.groupBy("k", "l").agg(
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(t, ev, v))), "
            "s -> s.v), cast(0.0 as double), (acc, x) -> acc + x)"
        ).alias("loglik")
    )
    best = ll.orderBy(F.desc("loglik"), F.asc("k"), F.asc("l")).limit(1)
    nev = cells.filter(F.col("ev") == 1).agg(F.sum("cnt").alias("n_events"))
    ncn = cells.filter(F.col("ev") == 0).agg(F.sum("cnt").alias("n_censored"))
    return (
        best.crossJoin(F.broadcast(nev))
        .crossJoin(F.broadcast(ncn))
        .select(
            (F.round("k", 2) + F.lit(0.0)).alias("shape_k"),
            (F.round("l", 1) + F.lit(0.0)).alias("scale_lambda"),
            (F.round("loglik", 4) + F.lit(0.0)).alias("loglik"),
            (
                F.round(
                    F.col("l") * F.pow(F.lit(0.6931471805599453), 1.0 / F.col("k")),
                    4,
                )
                + F.lit(0.0)
            ).alias("median_days"),
            F.col("n_events").cast("long").alias("n_events"),
            F.col("n_censored").cast("long").alias("n_censored"),
        )
    )


@query(
    "stat_kruskal_wallis",
    # Kruskal-Wallis H across the 5 customer regions on line-item
    # quantity, in the same histogram formulation as stat_mann_whitney_u
    # generalized to g groups: values collapse to per-(region, quantity)
    # cells, doubled midranks 2*cum_lt + t + 1 stay integer, per-region
    # rank sums are exact HUGEINT, and the cumulative window runs over
    # |distinct quantities| = 50 cells. Cross-group float folds run in
    # region-name order.
    oracle="""
    WITH q AS (
      SELECT r.r_name AS region, CAST(l.l_quantity AS BIGINT) AS v
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    ), h AS (
      SELECT v, region, count(*) AS ngv FROM q GROUP BY v, region
    ), tv AS (
      SELECT v, sum(ngv) AS t,
             coalesce(sum(sum(ngv)) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_lt
      FROM h GROUP BY v
    ), rg AS (
      SELECT h.region, sum(h.ngv) AS ng,
             sum(CAST(h.ngv AS HUGEINT) * (2 * tv.cum_lt + tv.t + 1)) AS r2
      FROM h JOIN tv ON h.v = tv.v
      GROUP BY h.region
    ), tot AS (
      SELECT sum(ng) AS n,
             (SELECT sum(CAST(t AS HUGEINT) * t * t - t) FROM tv) AS ties
      FROM rg
    ), s AS (
      SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(CAST(r2 * r2 AS DOUBLE) / (4.0 * ng) ORDER BY region)),
               (a, b) -> a + b) AS srk
      FROM rg
    ), hh AS (
      SELECT round(12.0 / (CAST(tot.n AS DOUBLE) * (tot.n + 1.0)) * s.srk
                   - 3.0 * (tot.n + 1.0), 6) + 0.0 AS h_stat,
             round(1.0 - CAST(tot.ties AS DOUBLE)
                   / (CAST(tot.n AS DOUBLE) * tot.n * tot.n - tot.n), 8) + 0.0
               AS tie_correction,
             round((12.0 / (CAST(tot.n AS DOUBLE) * (tot.n + 1.0)) * s.srk
                    - 3.0 * (tot.n + 1.0))
                   / (1.0 - CAST(tot.ties AS DOUBLE)
                      / (CAST(tot.n AS DOUBLE) * tot.n * tot.n - tot.n)), 6)
               + 0.0 AS h_corrected
      FROM tot CROSS JOIN s
    )
    SELECT rg.region, CAST(rg.ng AS BIGINT) AS n_group,
           round(CAST(rg.r2 AS DOUBLE) / (2.0 * rg.ng), 4) + 0.0 AS mean_rank,
           hh.h_stat, hh.tie_correction, hh.h_corrected,
           CAST(4 AS BIGINT) AS df
    FROM rg CROSS JOIN hh
    """,
    category="timeseries",
)
def stat_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KRUSKAL-WALLIS H test — does line-item quantity distribute
    differently across the 5 customer regions? The g-group
    generalization of `stat_mann_whitney_u`, in the same HISTOGRAM
    formulation: no N-row rank sort ever happens. Values collapse to
    per-(region, quantity) cells, the doubled midrank 2*cum_lt(v) +
    t(v) + 1 is an exact integer, per-region rank sums R_g are exact
    HUGEINT/decimal products, and H = 12/(N(N+1))*SUM(R_g^2/n_g) -
    3(N+1) over the tie correction 1 - SUM(t^3-t)/(N^3-N) is a closed
    form over 5 group rows.

    Scale shape: the Q5-shaped join chain reduces map-side to
    |regions| x |quantities| = 250 cells; the only cumulative window
    runs over the 50-cell quantity histogram (domain-bounded — the
    honest reason a rank test scales here), and the one cross-group
    float sum folds in region-name order. N^3 and t^3 live in
    decimal(38)/HUGEINT so nothing overflows at any corpus size."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    q = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("r_name").alias("region"), F.col("l_quantity").cast("long").alias("v"))
    )
    h = q.groupBy("v", "region").agg(F.count(F.lit(1)).alias("ngv"))
    tv = h.groupBy("v").agg(F.sum("ngv").alias("t"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    tv = tv.withColumn("cum_lt", F.coalesce(F.sum("t").over(w), F.lit(0)))
    rg = (
        h.join(tv, "v")
        .groupBy("region")
        .agg(
            F.sum("ngv").alias("ng"),
            F.sum(
                F.col("ngv").cast("decimal(38,0)")
                * (2 * F.col("cum_lt") + F.col("t") + 1).cast("decimal(38,0)")
            ).alias("r2"),
        )
    )
    td = F.col("t").cast("decimal(38,0)")
    tot = rg.agg(F.sum("ng").alias("n")).crossJoin(
        F.broadcast(tv.agg(F.sum(td * td * td - td).alias("ties")))
    )
    s = rg.agg(
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(region, "
            "cast(r2 * r2 as double) / (4.0 * ng) as rk))), x -> x.rk), "
            "cast(0.0 as double), (a, b) -> a + b)"
        ).alias("srk")
    )
    nd = F.col("n").cast("double")
    h_raw = F.lit(12.0) / (nd * (nd + F.lit(1.0))) * F.col("srk") - F.lit(3.0) * (
        nd + F.lit(1.0)
    )
    tie_c = F.lit(1.0) - F.col("ties").cast("double") / (nd * nd * nd - nd)
    hh = tot.crossJoin(F.broadcast(s)).select(
        (F.round(h_raw, 6) + F.lit(0.0)).alias("h_stat"),
        (F.round(tie_c, 8) + F.lit(0.0)).alias("tie_correction"),
        (F.round(h_raw / tie_c, 6) + F.lit(0.0)).alias("h_corrected"),
    )
    return rg.crossJoin(F.broadcast(hh)).select(
        "region",
        F.col("ng").cast("long").alias("n_group"),
        rnd(F.col("r2").cast("double") / (F.lit(2.0) * F.col("ng")), 4).alias(
            "mean_rank"
        ),
        "h_stat",
        "tie_correction",
        "h_corrected",
        F.lit(4).cast("long").alias("df"),
    )


@query(
    "stat_mann_kendall_trend",
    # Mann-Kendall monotonic-trend test + Kendall tau-b on DAILY revenue:
    # the corpus reduces to |days| exact-cent rows first, so the O(n^2)
    # pair stage is calendar-bounded (n days -> n(n-1)/2 pairs), never
    # corpus-bounded. S, the tie sums, and Var(S) are exact integers; z
    # uses the standard +-1 continuity correction.
    oracle="""
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             sum(CAST(round(CAST(o_totalprice AS DOUBLE) * 100.0) AS BIGINT))
               AS x
      FROM orders GROUP BY CAST(o_orderdate AS DATE)
    ), s AS (
      SELECT sum(CASE WHEN b.x > a.x THEN 1
                      WHEN b.x < a.x THEN -1 ELSE 0 END) AS sv,
             count(*) AS np
      FROM d a JOIN d b ON a.d < b.d
    ), tv AS (
      SELECT sum(t * (t - 1) * (2 * t + 5)) AS tsum,
             sum(t * (t - 1)) // 2 AS tpairs
      FROM (SELECT count(*) AS t FROM d GROUP BY x) h
    ), n AS (
      SELECT count(*) AS n FROM d
    )
    SELECT CAST(n.n AS BIGINT) AS n_days,
           CAST(s.sv AS BIGINT) AS s_stat,
           CAST((n.n * (CAST(n.n AS BIGINT) - 1) * (2 * n.n + 5)
                 - coalesce(tv.tsum, 0)) // 18 AS BIGINT) AS var_s_floor,
           round(CASE WHEN s.sv > 0 THEN (s.sv - 1.0) ELSE
                      CASE WHEN s.sv < 0 THEN (s.sv + 1.0) ELSE 0.0 END END
                 / sqrt((n.n * (CAST(n.n AS DOUBLE) - 1.0) * (2.0 * n.n + 5.0)
                         - coalesce(tv.tsum, 0)) / 18.0), 4) + 0.0 AS z_score,
           round(CAST(s.sv AS DOUBLE)
                 / sqrt((CAST(n.n AS DOUBLE) * (n.n - 1.0) / 2.0
                         - coalesce(tv.tpairs, 0))
                        * (CAST(n.n AS DOUBLE) * (n.n - 1.0) / 2.0)), 6) + 0.0
             AS tau_b
    FROM n CROSS JOIN s CROSS JOIN tv
    """,
    category="timeseries",
)
def stat_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN-KENDALL trend test on daily order revenue — the
    distribution-free 'is this metric drifting?' monitor (no linearity
    or normality assumed; robust to outlier days), with Kendall tau-b
    as the effect size. S counts concordant-minus-discordant day
    pairs; the tie-corrected Var(S) and the +-1 continuity-corrected z
    give the test; the non-parametric twin of
    `stat_linear_trend_per_group`'s OLS slope.

    Scale shape: the fact table reduces map-side to ONE exact-cents
    row per day, so the quadratic pair stage is CALENDAR-bounded
    (n(n-1)/2 pairs of |days| rows — ~2.9M at the fixture's 2405 days,
    ~26M for a decade of data, independent of corpus width); S and the
    tie sums are exact integers, and the two final ratios are the only
    float operations."""
    d = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.sum(
                F.round(F.col("o_totalprice").cast("double") * 100.0).cast("long")
            ).alias("x")
        )
    )
    a = d.alias("a")
    b = d.alias("b")
    s = a.join(b, F.col("a.d") < F.col("b.d")).agg(
        F.sum(
            F.when(F.col("b.x") > F.col("a.x"), 1)
            .when(F.col("b.x") < F.col("a.x"), -1)
            .otherwise(0)
        ).alias("sv")
    )
    tv = (
        d.groupBy("x")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)),
                F.lit(0),
            ).alias("tsum"),
            F.coalesce(
                F.sum(F.expr("t * (t - 1) div 2")), F.lit(0)
            ).alias("tpairs"),
        )
    )
    n = d.agg(F.count(F.lit(1)).alias("n"))
    j = n.crossJoin(F.broadcast(s)).crossJoin(F.broadcast(tv))
    nd = F.col("n").cast("double")
    var_d = (nd * (nd - 1.0) * (2.0 * nd + 5.0) - F.col("tsum")) / 18.0
    cont = (
        F.when(F.col("sv") > 0, F.col("sv") - F.lit(1.0))
        .when(F.col("sv") < 0, F.col("sv") + F.lit(1.0))
        .otherwise(F.lit(0.0))
    )
    half_pairs = nd * (nd - 1.0) / 2.0
    return j.select(
        F.col("n").cast("long").alias("n_days"),
        F.col("sv").cast("long").alias("s_stat"),
        F.expr(
            "cast((n * (cast(n as bigint) - 1) * (2 * n + 5) - tsum) div 18 "
            "as bigint)"
        ).alias("var_s_floor"),
        (F.round(cont / F.sqrt(var_d), 4) + F.lit(0.0)).alias("z_score"),
        (
            F.round(
                F.col("sv").cast("double")
                / F.sqrt((half_pairs - F.col("tpairs")) * half_pairs),
                6,
            )
            + F.lit(0.0)
        ).alias("tau_b"),
    )


@query(
    "stat_granger_causality",
    # lag-1 Granger test in BOTH directions between daily view counts
    # and daily purchase revenue: restricted (AR(1)) vs unrestricted
    # (AR(1) + cross lag) OLS via exact power sums and Cramer closed
    # forms - the |days| frame is calendar-bounded, sums are exact
    # HUGEINT/decimal, and the F ratio is a shared IEEE tree.
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS vc,
             sum(CASE WHEN event_type = 'purchase' THEN
               CAST(round(CAST(value AS DOUBLE) * 100.0) AS BIGINT)
               ELSE 0 END) AS rev
      FROM events GROUP BY CAST(ts AS DATE)
    ), lagged AS (
      SELECT d, vc, rev,
             lag(vc) OVER (ORDER BY d) AS vc1,
             lag(rev) OVER (ORDER BY d) AS rev1
      FROM daily
    ), obs AS (
      SELECT 'views->revenue' AS direction,
             CAST(rev AS HUGEINT) AS y, CAST(rev1 AS HUGEINT) AS y1,
             CAST(vc1 AS HUGEINT) AS x1
      FROM lagged WHERE rev1 IS NOT NULL
      UNION ALL
      SELECT 'revenue->views',
             CAST(vc AS HUGEINT), CAST(vc1 AS HUGEINT), CAST(rev1 AS HUGEINT)
      FROM lagged WHERE vc1 IS NOT NULL
    ), s AS (
      SELECT direction, count(*) AS n,
             sum(y) AS sy, sum(y1) AS sy1, sum(x1) AS sx1,
             sum(y * y) AS syy, sum(y1 * y1) AS sy1y1,
             sum(x1 * x1) AS sx1x1, sum(y * y1) AS syy1,
             sum(y * x1) AS syx1, sum(y1 * x1) AS sy1x1
      FROM obs GROUP BY direction
    ), f AS (
      SELECT direction, n,
             CAST(n AS DOUBLE) AS dn, CAST(sy AS DOUBLE) AS dsy,
             CAST(sy1 AS DOUBLE) AS dsy1, CAST(sx1 AS DOUBLE) AS dsx1,
             CAST(syy AS DOUBLE) AS dsyy, CAST(sy1y1 AS DOUBLE) AS dsy1y1,
             CAST(sx1x1 AS DOUBLE) AS dsx1x1, CAST(syy1 AS DOUBLE) AS dsyy1,
             CAST(syx1 AS DOUBLE) AS dsyx1, CAST(sy1x1 AS DOUBLE) AS dsy1x1
      FROM s
    ), k AS (
      SELECT direction, n,
             (dn * (dsy1y1 * dsx1x1 - dsy1x1 * dsy1x1)
              - dsy1 * (dsy1 * dsx1x1 - dsy1x1 * dsx1)
              + dsx1 * (dsy1 * dsy1x1 - dsy1y1 * dsx1)) AS det_m,
             (dsy * (dsy1y1 * dsx1x1 - dsy1x1 * dsy1x1)
              - dsy1 * (dsyy1 * dsx1x1 - dsy1x1 * dsyx1)
              + dsx1 * (dsyy1 * dsy1x1 - dsy1y1 * dsyx1)) AS det_0,
             (dn * (dsyy1 * dsx1x1 - dsyx1 * dsy1x1)
              - dsy * (dsy1 * dsx1x1 - dsy1x1 * dsx1)
              + dsx1 * (dsy1 * dsyx1 - dsyy1 * dsx1)) AS det_1,
             (dn * (dsy1y1 * dsyx1 - dsy1x1 * dsyy1)
              - dsy1 * (dsy1 * dsyx1 - dsyy1 * dsx1)
              + dsy * (dsy1 * dsy1x1 - dsy1y1 * dsx1)) AS det_2,
             (dn * dsy1y1 - dsy1 * dsy1) AS det_r,
             dsy, dsy1, dsyy, dsyy1, dsyx1, dn
      FROM f
    ), r AS (
      SELECT direction, n,
             (dn * dsyy1 - dsy * dsy1) / det_r AS b_r,
             (dsy - (dn * dsyy1 - dsy * dsy1) / det_r * dsy1) / dn AS a_r,
             det_0 / det_m AS b0, det_1 / det_m AS b1, det_2 / det_m AS b2,
             dsy, dsyy, dsyy1, dsyx1
      FROM k
    ), rss AS (
      SELECT direction, n,
             dsyy - a_r * dsy - b_r * dsyy1 AS rss_r,
             dsyy - (b0 * dsy + b1 * dsyy1 + b2 * dsyx1) AS rss_u,
             b2
      FROM r
    )
    SELECT direction, CAST(n AS BIGINT) AS n_obs,
           round(b2 + sign(b2) * 1e-9, 6) + 0.0 AS cross_lag_coef,
           round((rss_r - rss_u) / (rss_u / (n - 3.0))
                 + sign((rss_r - rss_u) / (rss_u / (n - 3.0))) * 1e-9, 4)
             + 0.0 AS f_stat,
           round(1.0 - rss_u / rss_r
                 + sign(1.0 - rss_u / rss_r) * 1e-9, 6) + 0.0
             AS partial_r2
    FROM rss
    """,
    category="timeseries",
)
def stat_granger_causality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG-1 GRANGER CAUSALITY between daily view counts and daily
    purchase revenue, both directions — does yesterday's traffic
    predict today's revenue beyond revenue's own momentum (and vice
    versa)? Restricted AR(1) vs unrestricted AR(1)+cross-lag OLS; the
    F statistic compares residual sums of squares, the cross-lag
    coefficient gives sign and scale, partial R² the effect size.

    Scale shape: the corpus reduces map-side to ONE (views, revenue)
    row per day; both regressions are CLOSED FORMS (2x2 and Cramer
    3x3 determinants) over ten exact HUGEINT/decimal power sums of the
    |days| frame — no iteration, no solver, no matrix library. The
    lag window runs over the calendar-bounded daily frame; every
    float enters through the same IEEE expression tree on both
    engines, with nudged rounding only at the output."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("vc"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value").cast("double") * 100.0).cast("long"),
            ).otherwise(0)
        ).alias("rev"),
    )
    w = Window.orderBy("d")
    lagged = daily.select(
        "d",
        "vc",
        "rev",
        F.lag("vc").over(w).alias("vc1"),
        F.lag("rev").over(w).alias("rev1"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")
    obs = lagged.filter(F.col("rev1").isNotNull()).select(
        F.lit("views->revenue").alias("direction"),
        dec("rev").alias("y"),
        dec("rev1").alias("y1"),
        dec("vc1").alias("x1"),
    ).unionByName(
        lagged.filter(F.col("vc1").isNotNull()).select(
            F.lit("revenue->views").alias("direction"),
            dec("vc").alias("y"),
            dec("vc1").alias("y1"),
            dec("rev1").alias("x1"),
        )
    )
    s = obs.groupBy("direction").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum("y1").alias("sy1"),
        F.sum("x1").alias("sx1"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("y1") * F.col("y1")).alias("sy1y1"),
        F.sum(F.col("x1") * F.col("x1")).alias("sx1x1"),
        F.sum(F.col("y") * F.col("y1")).alias("syy1"),
        F.sum(F.col("y") * F.col("x1")).alias("syx1"),
        F.sum(F.col("y1") * F.col("x1")).alias("sy1x1"),
    )
    d = {c: F.col(c).cast("double") for c in
         ["n", "sy", "sy1", "sx1", "syy", "sy1y1", "sx1x1", "syy1", "syx1", "sy1x1"]}
    det_m = (
        d["n"] * (d["sy1y1"] * d["sx1x1"] - d["sy1x1"] * d["sy1x1"])
        - d["sy1"] * (d["sy1"] * d["sx1x1"] - d["sy1x1"] * d["sx1"])
        + d["sx1"] * (d["sy1"] * d["sy1x1"] - d["sy1y1"] * d["sx1"])
    )
    det_0 = (
        d["sy"] * (d["sy1y1"] * d["sx1x1"] - d["sy1x1"] * d["sy1x1"])
        - d["sy1"] * (d["syy1"] * d["sx1x1"] - d["sy1x1"] * d["syx1"])
        + d["sx1"] * (d["syy1"] * d["sy1x1"] - d["sy1y1"] * d["syx1"])
    )
    det_1 = (
        d["n"] * (d["syy1"] * d["sx1x1"] - d["syx1"] * d["sy1x1"])
        - d["sy"] * (d["sy1"] * d["sx1x1"] - d["sy1x1"] * d["sx1"])
        + d["sx1"] * (d["sy1"] * d["syx1"] - d["syy1"] * d["sx1"])
    )
    det_2 = (
        d["n"] * (d["sy1y1"] * d["syx1"] - d["sy1x1"] * d["syy1"])
        - d["sy1"] * (d["sy1"] * d["syx1"] - d["syy1"] * d["sx1"])
        + d["sy"] * (d["sy1"] * d["sy1x1"] - d["sy1y1"] * d["sx1"])
    )
    det_r = d["n"] * d["sy1y1"] - d["sy1"] * d["sy1"]
    b_r = (d["n"] * d["syy1"] - d["sy"] * d["sy1"]) / det_r
    a_r = (d["sy"] - b_r * d["sy1"]) / d["n"]
    b0 = det_0 / det_m
    b1 = det_1 / det_m
    b2 = det_2 / det_m
    rss_r = d["syy"] - a_r * d["sy"] - b_r * d["syy1"]
    rss_u = d["syy"] - (b0 * d["sy"] + b1 * d["syy1"] + b2 * d["syx1"])
    f_stat = (rss_r - rss_u) / (rss_u / (d["n"] - F.lit(3.0)))
    return s.select(
        "direction",
        F.col("n").cast("long").alias("n_obs"),
        rnd_nudged(b2, 6).alias("cross_lag_coef"),
        rnd_nudged(f_stat, 4).alias("f_stat"),
        rnd_nudged(F.lit(1.0) - rss_u / rss_r, 6).alias("partial_r2"),
    )


@query(
    "stat_brown_forsythe_levene",
    # Brown-Forsythe (median-centered Levene) variance-homogeneity test
    # across the 5 regions on quantity: group medians come off the
    # 50-cell histogram (lower median, exact), |x - med| deviations stay
    # integers, and the one-way ANOVA on deviations is a closed form
    # over exact power sums. Cross-group float sums fold in region order.
    oracle="""
    WITH q AS (
      SELECT r.r_name AS region, CAST(l.l_quantity AS BIGINT) AS v
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    ), h AS (
      SELECT region, v, count(*) AS cnt FROM q GROUP BY region, v
    ), cum AS (
      SELECT region, v, cnt,
             sum(cnt) OVER (PARTITION BY region ORDER BY v) AS cf,
             sum(cnt) OVER (PARTITION BY region) AS ng
      FROM h
    ), med AS (
      SELECT region, min(v) AS med FROM cum
      WHERE 2 * cf >= ng GROUP BY region
    ), z AS (
      SELECT h.region, abs(h.v - m.med) AS z, h.cnt
      FROM h JOIN med m ON h.region = m.region
    ), s AS (
      SELECT region, sum(cnt) AS ng,
             sum(CAST(z AS HUGEINT) * cnt) AS sz,
             sum(CAST(z AS HUGEINT) * z * cnt) AS szz
      FROM z GROUP BY region
    ), tot AS (
      SELECT sum(ng) AS n, count(*) AS k, sum(sz) AS st, sum(szz) AS szzt,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(CAST(sz AS DOUBLE) * sz / ng ORDER BY region)),
               (a, b) -> a + b) AS sb
      FROM s
    ), f AS (
      SELECT n, k,
             (sb - CAST(st AS DOUBLE) * st / n) / (k - 1.0) AS msb,
             (CAST(szzt AS DOUBLE) - sb) / (n - k) AS msw
      FROM tot
    )
    SELECT s.region, CAST(s.ng AS BIGINT) AS n_group,
           m.med AS group_median,
           round(CAST(s.sz AS DOUBLE) / s.ng, 4) + 0.0 AS mean_abs_dev,
           round(f.msb / f.msw + sign(f.msb / f.msw) * 1e-9, 4) + 0.0
             AS f_stat,
           CAST(f.k - 1 AS BIGINT) AS df_between,
           CAST(f.n - f.k AS BIGINT) AS df_within
    FROM s JOIN med m ON s.region = m.region CROSS JOIN f
    """,
    category="timeseries",
)
def stat_brown_forsythe_levene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BROWN-FORSYTHE variance-homogeneity test (median-centered
    Levene) — do the 5 regions have the same quantity SPREAD, not just
    the same center? The robustness gate before trusting
    `stat_anova_oneway` (classic ANOVA assumes equal variances) and
    the rank-free sibling of `stat_kruskal_wallis`: deviations from
    the GROUP MEDIAN are ANOVA'd, which stays valid under heavy tails.

    Scale shape: the Q5-shaped join reduces map-side to |regions| x 50
    histogram cells; group medians are exact lower medians off the
    cumulative histogram (domain-bounded window), deviations stay
    INTEGER (so their power sums are exact HUGEINT), and the F
    statistic is a closed form whose only cross-group float sum folds
    in region order."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    q = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            F.col("r_name").alias("region"),
            F.col("l_quantity").cast("long").alias("v"),
        )
    )
    h = q.groupBy("region", "v").agg(F.count(F.lit(1)).alias("cnt"))
    wreg = Window.partitionBy("region").orderBy("v")
    wall = Window.partitionBy("region")
    cum = h.select(
        "region",
        "v",
        "cnt",
        F.sum("cnt").over(wreg).alias("cf"),
        F.sum("cnt").over(wall).alias("ng"),
    )
    med = (
        cum.filter(2 * F.col("cf") >= F.col("ng"))
        .groupBy("region")
        .agg(F.min("v").alias("med"))
    )
    z = h.join(med, "region").select(
        "region", F.abs(F.col("v") - F.col("med")).alias("z"), "cnt"
    )
    zd = F.col("z").cast("decimal(38,0)")
    s = z.groupBy("region").agg(
        F.sum("cnt").alias("ng"),
        F.sum(zd * F.col("cnt")).alias("sz"),
        F.sum(zd * zd * F.col("cnt")).alias("szz"),
    )
    tot = s.agg(
        F.sum("ng").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum("sz").alias("st"),
        F.sum("szz").alias("szzt"),
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(region, "
            "cast(sz as double) * sz / ng as t))), x -> x.t), "
            "cast(0.0 as double), (a, b) -> a + b)"
        ).alias("sb"),
    )
    nd = F.col("n").cast("double")
    msb = (F.col("sb") - F.col("st").cast("double") * F.col("st") / nd) / (
        F.col("k") - F.lit(1.0)
    )
    msw = (F.col("szzt").cast("double") - F.col("sb")) / (nd - F.col("k"))
    f = tot.select(
        "n",
        "k",
        msb.alias("msb"),
        msw.alias("msw"),
    )
    return (
        s.join(med, "region")
        .crossJoin(F.broadcast(f))
        .select(
            "region",
            F.col("ng").cast("long").alias("n_group"),
            F.col("med").alias("group_median"),
            rnd(F.col("sz").cast("double") / F.col("ng"), 4).alias(
                "mean_abs_dev"
            ),
            rnd_nudged(F.col("msb") / F.col("msw"), 4).alias("f_stat"),
            (F.col("k") - 1).cast("long").alias("df_between"),
            (F.col("n") - F.col("k")).cast("long").alias("df_within"),
        )
    )


_HURST_WINDOWS = (8, 16, 32)


@query(
    "stat_hurst_exponent",
    # R/S analysis in one 4-slot fold per block: walking the demeaned
    # prefix sum carries [cum, min, max, ssq] in day order — no prefix
    # array ever materializes. Every value is exact integer cents cast to
    # double, folds replay op-for-op, ln is nudged, and the 3-point
    # log-log OLS is closed form.
    oracle=f"""
    WITH daily AS (
      SELECT o_orderdate AS d,
             sum(CAST(round(CAST(o_totalprice AS DOUBLE) * 100.0) AS BIGINT))
               AS cents
      FROM orders GROUP BY o_orderdate
    ), ser AS (
      SELECT row_number() OVER (ORDER BY d) AS idx,
             CAST(cents AS DOUBLE) AS x
      FROM daily
    ), blocks AS (
      SELECT w.w, CAST((ser.idx - 1) // w.w AS BIGINT) AS blk,
             list(x ORDER BY idx) AS arr
      FROM ser CROSS JOIN (SELECT unnest([{', '.join(str(w) for w in _HURST_WINDOWS)}]) AS w) w
      GROUP BY w.w, CAST((ser.idx - 1) // w.w AS BIGINT)
      HAVING count(*) = w.w
    ), st AS (
      SELECT w, blk,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE), arr),
                         (a, x) -> a + x) / w AS m
      FROM blocks
    ), folded AS (
      SELECT b.w, b.blk,
             list_reduce(
               list_prepend([CAST(0.0 AS DOUBLE), 0.0, 0.0, 0.0],
                 list_transform(b.arr, x -> [x - st.m, 0.0, 0.0, 0.0])),
               (a, e) -> [a[1] + e[1],
                          least(a[2], a[1] + e[1]),
                          greatest(a[3], a[1] + e[1]),
                          a[4] + e[1] * e[1]]
             ) AS f
      FROM blocks b JOIN st ON b.w = st.w AND b.blk = st.blk
    ), rs AS (
      SELECT w, blk,
             (f[3] - f[2]) / sqrt(f[4] / w) AS rs
      FROM folded WHERE f[4] > 0.0
    ), mw AS (
      SELECT w,
             count(*) AS n_blocks,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(rs ORDER BY blk)), (a, x) -> a + x) / count(*) AS mean_rs
      FROM rs GROUP BY w
    ), pts AS (
      SELECT w, n_blocks, mean_rs,
             round(ln(CAST(w AS DOUBLE)) + 1e-9, 8) + 0.0 AS lx,
             round(ln(mean_rs) + sign(ln(mean_rs)) * 1e-9, 8) + 0.0 AS ly
      FROM mw
    ), fit AS (
      SELECT (sum(lx * ly) - count(*) * avg(lx) * avg(ly))
             / (sum(lx * lx) - count(*) * avg(lx) * avg(lx)) AS h
      FROM pts
    )
    SELECT CAST(pts.w AS INT) AS w,
           CAST(pts.n_blocks AS BIGINT) AS n_blocks,
           round(pts.mean_rs, 6) + 0.0 AS mean_rs,
           round(fit.h + sign(fit.h) * 1e-9, 6) + 0.0 AS hurst
    FROM pts CROSS JOIN fit
    """,
    category="timeseries",
)
def stat_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HURST EXPONENT of daily revenue by classic rescaled-range (R/S)
    analysis: for block sizes {8,16,32} days, each block's range of
    demeaned prefix sums over its std, averaged per size, with H = the
    log-log OLS slope — the long-memory detector (H≈0.5 random walk,
    H>0.5 trending/persistent, H<0.5 mean-reverting) that tells a
    forecasting pipeline whether yesterday's shock matters next month.
    The whole R/S walk runs as ONE 4-slot array fold per block
    ([cum, min, max, Σd²] carried in day order) — no prefix array, no
    second pass; the only transcendentals (ln of 3 window sizes + 3 mean
    ratios) are nudge-rounded.

    Scale shape (100 TB): the fact table collapses to the calendar-
    bounded |days| frame first; blocks are (w, blk)-keyed groups of ≤32
    values; everything after is arithmetic over |windows|·|blocks| rows.
    The one unpartitioned row_number runs on the |days| frame — the
    `stat_granger_causality` bound."""
    orders = load(spark, sf_dir, "orders")
    from pyspark.sql import Window

    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(
            F.round(F.col("o_totalprice").cast("double") * 100.0).cast("long")
        ).alias("cents")
    )
    ser = daily.select(
        F.row_number().over(Window.orderBy("d")).alias("idx"),
        F.col("cents").cast("double").alias("x"),
    )
    ws = spark.createDataFrame([(w,) for w in _HURST_WINDOWS], "w int")
    blocks = (
        ser.crossJoin(F.broadcast(ws))
        .groupBy("w", F.expr("cast((idx - 1) div w as bigint)").alias("blk"))
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(idx, x))), s -> s.x)"
            ).alias("arr"),
            F.count(F.lit(1)).alias("c"),
        )
        .filter(F.col("c") == F.col("w"))
    )
    st = blocks.withColumn(
        "m",
        F.expr("aggregate(arr, cast(0.0 as double), (a, x) -> a + x)")
        / F.col("w"),
    )
    folded = st.withColumn(
        "f",
        F.expr(
            "aggregate(transform(arr, x -> x - m), "
            "array(cast(0.0 as double), 0.0D, 0.0D, 0.0D), "
            "(a, e) -> array(element_at(a, 1) + e, "
            "least(element_at(a, 2), element_at(a, 1) + e), "
            "greatest(element_at(a, 3), element_at(a, 1) + e), "
            "element_at(a, 4) + e * e))"
        ),
    )
    rs = folded.filter(F.expr("element_at(f, 4) > 0.0")).select(
        "w",
        "blk",
        F.expr(
            "(element_at(f, 3) - element_at(f, 2)) / sqrt(element_at(f, 4) / w)"
        ).alias("rs"),
    )
    mw = rs.groupBy("w").agg(
        F.count(F.lit(1)).alias("n_blocks"),
        (
            F.expr(
                "aggregate(transform(array_sort(collect_list(struct(blk, rs))), "
                "s -> s.rs), cast(0.0 as double), (a, x) -> a + x)"
            )
            / F.count(F.lit(1))
        ).alias("mean_rs"),
    )
    lx = F.round(F.log(F.col("w").cast("double")) + F.lit(1e-9), 8) + F.lit(0.0)
    lny = F.log("mean_rs")
    ly = F.round(lny + F.signum(lny) * F.lit(1e-9), 8) + F.lit(0.0)
    pts = mw.select("w", "n_blocks", "mean_rs", lx.alias("lx"), ly.alias("ly"))
    fit = pts.agg(
        (
            (
                F.sum(F.col("lx") * F.col("ly"))
                - F.count(F.lit(1)) * F.avg("lx") * F.avg("ly")
            )
            / (
                F.sum(F.col("lx") * F.col("lx"))
                - F.count(F.lit(1)) * F.avg("lx") * F.avg("lx")
            )
        ).alias("h")
    )
    return pts.crossJoin(F.broadcast(fit)).select(
        F.col("w").cast("int").alias("w"),
        F.col("n_blocks").cast("long").alias("n_blocks"),
        (F.round(F.col("mean_rs"), 6) + F.lit(0.0)).alias("mean_rs"),
        (
            F.round(F.col("h") + F.signum("h") * F.lit(1e-9), 6) + F.lit(0.0)
        ).alias("hurst"),
    )


_PERM_B = 200


@query(
    "stat_permutation_test_mean",
    # randomization test with a fixed md5-derived reassignment family:
    # every permuted statistic is built from INTEGER cent sums (order-free
    # exact), the observed statistic uses the same arithmetic, and the
    # p-value is a pure count — no distributional assumption, no float
    # fold anywhere.
    oracle=f"""
    WITH g AS (
      SELECT event_id,
             CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS is_a,
             CAST(round(CAST(value AS DOUBLE) * 100.0) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ), obs AS (
      SELECT sum(is_a) AS na, sum(1 - is_a) AS nb,
             sum(CASE WHEN is_a = 1 THEN cents ELSE 0 END) AS sa,
             sum(CASE WHEN is_a = 0 THEN cents ELSE 0 END) AS sb,
             count(*) AS n
      FROM g
    ), t0 AS (
      SELECT na, nb,
             abs(CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb) AS t_obs
      FROM obs
    ), perm AS (
      SELECT b.b,
             CASE WHEN ('0x' || substr(md5('perm' || b.b || ':'
                        || CAST(g.event_id AS VARCHAR)), 1, 15))::BIGINT
                       % obs.n < obs.na
                  THEN 1 ELSE 0 END AS pa,
             g.cents
      FROM g CROSS JOIN obs
      CROSS JOIN (SELECT unnest(generate_series(1, {_PERM_B})) AS b) b
    ), pt AS (
      SELECT b,
             sum(pa) AS na_b, sum(1 - pa) AS nb_b,
             sum(CASE WHEN pa = 1 THEN cents ELSE 0 END) AS sa_b,
             sum(CASE WHEN pa = 0 THEN cents ELSE 0 END) AS sb_b
      FROM perm GROUP BY b
    ), tb AS (
      SELECT b,
             abs(CAST(sa_b AS DOUBLE) / nullif(na_b, 0)
                 - CAST(sb_b AS DOUBLE) / nullif(nb_b, 0)) AS t_b
      FROM pt
    )
    SELECT CAST(t0.na AS BIGINT) AS n_weekend,
           CAST(t0.nb AS BIGINT) AS n_weekday,
           round(t0.t_obs / 100.0, 4) + 0.0 AS t_obs,
           CAST(sum(CASE WHEN tb.t_b >= t0.t_obs THEN 1 ELSE 0 END)
                AS BIGINT) AS n_extreme,
           round((1.0 + sum(CASE WHEN tb.t_b >= t0.t_obs THEN 1 ELSE 0 END))
                 / (1.0 + {_PERM_B}), 6) + 0.0 AS p_value
    FROM tb CROSS JOIN t0
    GROUP BY t0.na, t0.nb, t0.t_obs
    """,
    category="timeseries",
)
def stat_permutation_test_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANDOMIZATION TEST for the weekend/weekday difference in mean
    purchase value — the assumption-free companion to
    `stat_welch_t_test` (no normality) and `stat_mann_whitney_u` (tests
    means, not ranks): {b} fixed md5-derived label reassignments
    (salted hash % n < n_a — the house deterministic-budget family),
    p = (1 + #extreme)/(1 + B). Every permuted statistic is built from
    INTEGER cent sums, so all B statistics and the ≥ comparisons are
    exact — the p-value is bit-deterministic, no Monte-Carlo seed
    anywhere.

    Scale shape (100 TB): the B-way fan-out shuffles (b, bit, cents)
    scalar triples with map-side combine onto B cells — B is a fixed
    budget knob, the corpus is scanned once, and nothing is ever
    sorted. The label-reassignment variant (vs exact-size permutation)
    is the standard large-N randomization test and is documented as
    such.""".format(
        b=_PERM_B
    )
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    g = ev.select(
        "event_id",
        F.when(F.dayofweek("ts").isin(1, 7), 1).otherwise(0).alias("is_a"),
        F.round(F.col("value").cast("double") * 100.0).cast("long").alias("cents"),
    )
    obs = g.agg(
        F.sum("is_a").alias("na"),
        F.sum(F.lit(1) - F.col("is_a")).alias("nb"),
        F.sum(F.when(F.col("is_a") == 1, F.col("cents")).otherwise(0)).alias("sa"),
        F.sum(F.when(F.col("is_a") == 0, F.col("cents")).otherwise(0)).alias("sb"),
        F.count(F.lit(1)).alias("n"),
    )
    t_obs = F.abs(
        F.col("sa").cast("double") / F.col("na")
        - F.col("sb").cast("double") / F.col("nb")
    )
    bs = spark.range(1, _PERM_B + 1).select(F.col("id").cast("int").alias("b"))
    h = (
        "cast(conv(substr(md5(concat('perm', b, ':', "
        "cast(event_id as string))), 1, 15), 16, 10) as bigint)"
    )
    perm = (
        g.crossJoin(F.broadcast(obs.select("na", "n")))
        .crossJoin(F.broadcast(bs))
        .select(
            "b",
            F.when(F.expr(h) % F.col("n") < F.col("na"), 1)
            .otherwise(0)
            .alias("pa"),
            "cents",
        )
    )
    pt = perm.groupBy("b").agg(
        F.sum("pa").alias("na_b"),
        F.sum(F.lit(1) - F.col("pa")).alias("nb_b"),
        F.sum(F.when(F.col("pa") == 1, F.col("cents")).otherwise(0)).alias("sa_b"),
        F.sum(F.when(F.col("pa") == 0, F.col("cents")).otherwise(0)).alias("sb_b"),
    )
    tb = pt.select(
        "b",
        F.abs(
            F.col("sa_b").cast("double") / F.nullif(F.col("na_b"), F.lit(0))
            - F.col("sb_b").cast("double") / F.nullif(F.col("nb_b"), F.lit(0))
        ).alias("t_b"),
    )
    o = obs.select("na", "nb", t_obs.alias("t_obs"))
    return (
        tb.crossJoin(F.broadcast(o))
        .groupBy("na", "nb", "t_obs")
        .agg(
            F.sum(F.when(F.col("t_b") >= F.col("t_obs"), 1).otherwise(0)).alias(
                "n_extreme"
            )
        )
        .select(
            F.col("na").cast("long").alias("n_weekend"),
            F.col("nb").cast("long").alias("n_weekday"),
            (F.round(F.col("t_obs") / 100.0, 4) + F.lit(0.0)).alias("t_obs"),
            F.col("n_extreme").cast("long").alias("n_extreme"),
            (
                F.round(
                    (F.lit(1.0) + F.col("n_extreme")) / F.lit(1.0 + _PERM_B), 6
                )
                + F.lit(0.0)
            ).alias("p_value"),
        )
    )


_BASS_PS = (0.0005, 0.001, 0.002, 0.005)
_BASS_QS = (0.005, 0.01, 0.02, 0.05, 0.1)


@query(
    "events_bass_diffusion_fit",
    # grid SSE fit of the closed-form Bass curve: the only transcendental
    # (one exp per (day, combo) cell) is nudge-rounded to 8 digits before
    # any product; SSE folds in day order per combo; argmin ties break to
    # the lower (p, q) via struct order. m pins to the observed total.
    oracle=f"""
    WITH s AS (
      SELECT CAST(ts AS DATE) AS d, count(*) AS c
      FROM events WHERE event_type = 'signup' GROUP BY 1
    ), m0 AS (
      SELECT min(d) AS d0, CAST(sum(c) AS DOUBLE) AS m,
             count(*) AS n_days
      FROM s
    ), cum AS (
      SELECT date_diff('day', m0.d0, s.d) AS t,
             CAST(sum(s.c) OVER (ORDER BY s.d
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE) AS y,
             m0.m, m0.n_days
      FROM s CROSS JOIN m0
    ), grid AS (
      SELECT p.p, q.q
      FROM (SELECT unnest([{', '.join(f'{p}e0' for p in _BASS_PS)}]) AS p) p
      CROSS JOIN (SELECT unnest([{', '.join(f'{q}e0' for q in _BASS_QS)}]) AS q) q
    ), cells AS (
      SELECT g.p, g.q, cum.t, cum.n_days,
             cum.y - cum.m * (1e0 - (round(exp(-(g.p + g.q) * cum.t)
                  + 1e-9, 8) + 0.0))
               / (1e0 + (g.q / g.p) * (round(exp(-(g.p + g.q) * cum.t)
                  + 1e-9, 8) + 0.0)) AS err
      FROM grid g CROSS JOIN cum
    ), sse AS (
      SELECT p, q, max(n_days) AS n_days,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(err * err ORDER BY t)), (a, x) -> a + x) AS sse
      FROM cells GROUP BY p, q
    ), best AS (
      SELECT min(struct_pack(sse := sse, p := p, q := q, n_days := n_days))
               AS b
      FROM sse
    )
    SELECT CAST(b.n_days AS BIGINT) AS n_days,
           b.p AS p_innovation,
           b.q AS q_imitation,
           round(b.sse, 4) + 0.0 AS sse,
           round(ln(b.q / b.p) / (b.p + b.q)
                 + sign(ln(b.q / b.p)) * 1e-9, 4) + 0.0 AS peak_time_days
    FROM best
    """,
    category="timeseries",
)
def events_bass_diffusion_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BASS DIFFUSION fit of cumulative signups (Bass 1969) — the
    adoption-curve model growth teams fit to decide whether uptake is
    innovation-driven (p: external marketing) or imitation-driven (q:
    word of mouth), and when adoption peaks (ln(q/p)/(p+q)). Closed-form
    F(t) = m(1−e^{{-(p+q)t}})/(1+(q/p)e^{{-(p+q)t}}) is evaluated on a
    {np}×{nq} (p, q) grid against the observed cumulative curve; least
    SSE wins with ties to the lower (p, q) — the same bounded GRID-MLE
    discipline as the Weibull and Croston fits (no iterative optimizer
    to replay). m pins to the observed total (the standard pinned-market
    simplification); uniform synthetic signups fit poorly and the SSE
    says so — the honest answer.

    Scale shape (100 TB): the fact scan collapses to the |days| daily
    frame; the grid fan-out is |days|·{np}·{nq} scalar cells; one nudged
    exp per cell; SSE folds per combo in day order. The cumulative
    window runs on the calendar-bounded daily frame (the
    `stat_granger_causality` bound).""".format(
        np=len(_BASS_PS), nq=len(_BASS_QS)
    )
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "signup")
    s = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).alias("c")
    )
    m0 = s.agg(
        F.min("d").alias("d0"),
        F.sum("c").cast("double").alias("m"),
        F.count(F.lit(1)).alias("n_days"),
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        s.withColumn("y", F.sum("c").over(w).cast("double"))
        .crossJoin(F.broadcast(m0))
        .select(F.datediff("d", "d0").alias("t"), "y", "m", "n_days")
    )
    grid = spark.createDataFrame(
        [(p, q) for p in _BASS_PS for q in _BASS_QS], "p double, q double"
    )
    e = F.round(
        F.exp(-(F.col("p") + F.col("q")) * F.col("t")) + F.lit(1e-9), 8
    ) + F.lit(0.0)
    fhat = (
        F.col("m")
        * (F.lit(1.0) - e)
        / (F.lit(1.0) + (F.col("q") / F.col("p")) * e)
    )
    cells = F.broadcast(grid).crossJoin(cum).select(
        "p", "q", "t", "n_days", (F.col("y") - fhat).alias("err")
    )
    fold = (
        "aggregate(transform(array_sort(collect_list(struct(t, err))), "
        "x -> x.err * x.err), cast(0.0 as double), (a, y) -> a + y)"
    )
    sse = cells.groupBy("p", "q").agg(
        F.max("n_days").alias("n_days"), F.expr(fold).alias("sse")
    )
    best = sse.agg(
        F.min(F.struct("sse", "p", "q", "n_days")).alias("b")
    ).select("b.*")
    lnqp = F.log(F.col("q") / F.col("p"))
    return best.select(
        F.col("n_days").cast("long").alias("n_days"),
        F.col("p").alias("p_innovation"),
        F.col("q").alias("q_imitation"),
        (F.round(F.col("sse"), 4) + F.lit(0.0)).alias("sse"),
        (
            F.round(
                lnqp / (F.col("p") + F.col("q")) + F.signum(lnqp) * F.lit(1e-9),
                4,
            )
            + F.lit(0.0)
        ).alias("peak_time_days"),
    )


@query(
    "stat_runs_test_randomness",
    # runs above/below the exact median of daily revenue: the median is
    # the lower-middle order statistic off the |days| frame, run breaks
    # come from one lag over the same calendar-bounded frame, and the
    # z-score is closed form over exact integer counts.
    oracle="""
    WITH daily AS (
      SELECT o_orderdate AS d,
             sum(CAST(round(CAST(o_totalprice AS DOUBLE) * 100.0) AS BIGINT))
               AS cents
      FROM orders GROUP BY o_orderdate
    ), med AS (
      SELECT cents AS m FROM (
        SELECT cents, row_number() OVER (ORDER BY cents, d) AS rn,
               count(*) OVER () AS n
        FROM daily
      ) WHERE rn = (n + 1) // 2
    ), s AS (
      SELECT d, CASE WHEN cents > med.m THEN 1 ELSE 0 END AS above
      FROM daily CROSS JOIN med
    ), runs AS (
      SELECT above,
             CASE WHEN lag(above) OVER (ORDER BY d) IS NULL
                  OR lag(above) OVER (ORDER BY d) <> above
                  THEN 1 ELSE 0 END AS brk
      FROM s
    ), agg AS (
      SELECT sum(brk) AS r, sum(above) AS n1,
             sum(1 - above) AS n2, count(*) AS n
      FROM runs
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(n1 AS BIGINT) AS n_above,
           CAST(n2 AS BIGINT) AS n_below,
           CAST(r AS BIGINT) AS n_runs,
           round(1.0 + 2.0 * n1 * n2 / n, 4) + 0.0 AS expected_runs,
           round((r - (1.0 + 2.0 * n1 * n2 / n))
                 / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n)
                        / (CAST(n AS DOUBLE) * n * (n - 1))), 6) + 0.0
             AS z_score
    FROM agg
    """,
    category="timeseries",
)
def stat_runs_test_randomness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WALD–WOLFOWITZ RUNS TEST on daily revenue: dichotomize each day
    against the exact median, count runs of consecutive same-side days,
    and z-score against the null expectation 1 + 2n₁n₂/n — the classic
    sequence-randomness check (too FEW runs = clustering/regimes, too
    MANY = oscillation) that complements the autocorrelation and
    Mann-Kendall views of the same series. The median is the exact
    lower-middle order statistic (integer cents, day tie-break), so the
    dichotomy — and therefore every count — replays exactly.

    Scale shape (100 TB): the fact table collapses to the calendar-
    bounded |days| frame first; the rank and lag windows run on that
    frame only (the `stat_granger_causality` bound); the z-score is one
    closed form over four integers."""
    from pyspark.sql import Window

    orders = load(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(
            F.round(F.col("o_totalprice").cast("double") * 100.0).cast("long")
        ).alias("cents")
    )
    wr = Window.orderBy("cents", "d")
    ranked = daily.select(
        "cents",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    med = ranked.filter(
        F.col("rn") == F.expr("(n + 1) div 2")
    ).select(F.col("cents").alias("m"))
    s = daily.crossJoin(F.broadcast(med)).select(
        "d", F.when(F.col("cents") > F.col("m"), 1).otherwise(0).alias("above")
    )
    wl = Window.orderBy("d")
    runs = s.select(
        "above",
        F.when(
            F.lag("above").over(wl).isNull()
            | (F.lag("above").over(wl) != F.col("above")),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    agg = runs.agg(
        F.sum("brk").alias("r"),
        F.sum("above").alias("n1"),
        F.sum(F.lit(1) - F.col("above")).alias("n2"),
        F.count(F.lit(1)).alias("n"),
    )
    exp_r = F.lit(1.0) + F.lit(2.0) * F.col("n1") * F.col("n2") / F.col("n")
    z = (F.col("r") - exp_r) / F.sqrt(
        F.lit(2.0)
        * F.col("n1")
        * F.col("n2")
        * (F.lit(2.0) * F.col("n1") * F.col("n2") - F.col("n"))
        / (F.col("n").cast("double") * F.col("n") * (F.col("n") - 1))
    )
    return agg.select(
        F.col("n").cast("long").alias("n_days"),
        F.col("n1").cast("long").alias("n_above"),
        F.col("n2").cast("long").alias("n_below"),
        F.col("r").cast("long").alias("n_runs"),
        (F.round(exp_r, 4) + F.lit(0.0)).alias("expected_runs"),
        (F.round(z, 6) + F.lit(0.0)).alias("z_score"),
    )


@query(
    "stat_interrupted_time_series",
    # two independent OLS segments around the intervention date, every
    # moment an exact INTEGER sum (day index × integer cents) — order-free
    # — and the closed forms evaluated in one identical double chain.
    oracle="""
    WITH daily AS (
      SELECT o_orderdate AS d,
             sum(CAST(round(CAST(o_totalprice AS DOUBLE) * 100.0) AS BIGINT))
               AS cents
      FROM orders GROUP BY o_orderdate
    ), x AS (
      SELECT date_diff('day', DATE '1996-01-01', d) AS t, cents,
             CASE WHEN d >= DATE '1996-01-01' THEN 1 ELSE 0 END AS post
      FROM daily
    ), seg AS (
      SELECT post, count(*) AS n, sum(t) AS sx, sum(cents) AS sy,
             sum(t * t) AS sxx, sum(t * cents) AS sxy
      FROM x GROUP BY post
    ), fit AS (
      SELECT post, n,
             (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
               / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) AS b,
             CAST(sy AS DOUBLE) / n
               - (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
                 / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
                 * (CAST(sx AS DOUBLE) / n) AS a
      FROM seg
    )
    SELECT CAST(pre.n AS BIGINT) AS n_pre, CAST(post.n AS BIGINT) AS n_post,
           round(pre.a / 100.0, 4) + 0.0 AS intercept_pre,
           round(pre.b / 100.0, 6) + 0.0 AS slope_pre,
           round(post.a / 100.0, 4) + 0.0 AS intercept_post,
           round(post.b / 100.0, 6) + 0.0 AS slope_post,
           round((post.a - pre.a) / 100.0, 4) + 0.0 AS level_change,
           round((post.b - pre.b) / 100.0, 6) + 0.0 AS slope_change
    FROM (SELECT * FROM fit WHERE post = 0) pre
    CROSS JOIN (SELECT * FROM fit WHERE post = 1) post
    """,
    category="timeseries",
)
def stat_interrupted_time_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERRUPTED TIME-SERIES segmented regression around a 1996-01-01
    intervention: independent OLS lines on the pre and post daily-revenue
    segments (day index centered at the cut), reporting the level jump
    and slope change at the intervention — the quasi-experimental
    workhorse when there is no control group for `stat_diff_in_diff`.
    Every regression moment (Σt, Σy, Σt², Σty) is an exact INTEGER sum
    of day-index × integer-cents products — order-free, no folds — and
    the closed forms run the identical double chain on both engines.

    Scale shape (100 TB): the fact scan collapses map-side to the
    calendar-bounded |days| frame, then ONE 2-group aggregate produces
    all eight moments. No window at all."""
    orders = load(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(
            F.round(F.col("o_totalprice").cast("double") * 100.0).cast("long")
        ).alias("cents")
    )
    cut = F.lit("1996-01-01").cast("date")
    x = daily.select(
        F.datediff("d", cut).alias("t"),
        "cents",
        F.when(F.col("d") >= cut, 1).otherwise(0).alias("post"),
    )
    seg = x.groupBy("post").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").alias("sx"),
        F.sum("cents").alias("sy"),
        F.sum(F.col("t") * F.col("t")).alias("sxx"),
        F.sum(F.col("t") * F.col("cents")).alias("sxy"),
    )
    b = (
        F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy") / F.col("n")
    ) / (
        F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx") / F.col("n")
    )
    a = F.col("sy").cast("double") / F.col("n") - b * (
        F.col("sx").cast("double") / F.col("n")
    )
    fit = seg.select("post", "n", b.alias("b"), a.alias("a"))
    pre = fit.filter(F.col("post") == 0).select(
        F.col("n").alias("n_pre"), F.col("a").alias("a0"), F.col("b").alias("b0")
    )
    post = fit.filter(F.col("post") == 1).select(
        F.col("n").alias("n_post"), F.col("a").alias("a1"), F.col("b").alias("b1")
    )
    return pre.crossJoin(post).select(
        F.col("n_pre").cast("long").alias("n_pre"),
        F.col("n_post").cast("long").alias("n_post"),
        (F.round(F.col("a0") / 100.0, 4) + F.lit(0.0)).alias("intercept_pre"),
        (F.round(F.col("b0") / 100.0, 6) + F.lit(0.0)).alias("slope_pre"),
        (F.round(F.col("a1") / 100.0, 4) + F.lit(0.0)).alias("intercept_post"),
        (F.round(F.col("b1") / 100.0, 6) + F.lit(0.0)).alias("slope_post"),
        (F.round((F.col("a1") - F.col("a0")) / 100.0, 4) + F.lit(0.0)).alias(
            "level_change"
        ),
        (F.round((F.col("b1") - F.col("b0")) / 100.0, 6) + F.lit(0.0)).alias(
            "slope_change"
        ),
    )


def _te_oracle(src: str, dst: str, suffix: str) -> str:
    """One direction of binarized transfer entropy as a CTE block:
    states from exact medians, 8 integer count cells, nudged log2."""
    return f"""
    j{suffix} AS (
      SELECT a.t,
             CASE WHEN a.c > ma.m THEN 1 ELSE 0 END AS xp,
             CASE WHEN b.c > mb.m THEN 1 ELSE 0 END AS yc,
             lag(CASE WHEN b.c > mb.m THEN 1 ELSE 0 END)
               OVER (ORDER BY a.t) AS yp,
             lag(CASE WHEN a.c > ma.m THEN 1 ELSE 0 END)
               OVER (ORDER BY a.t) AS xpl
      FROM s_{src} a
      JOIN s_{dst} b ON a.t = b.t
      CROSS JOIN med_{src} ma CROSS JOIN med_{dst} mb
    ), c3_{suffix} AS (
      SELECT yc, yp, xpl, count(*) AS c
      FROM j{suffix} WHERE yp IS NOT NULL GROUP BY yc, yp, xpl
    ), agg_{suffix} AS (
      SELECT sum(c) AS n FROM c3_{suffix}
    ), te_{suffix} AS (
      SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(term ORDER BY yc, yp, xpl)), (a, x) -> a + x) AS te
      FROM (
        SELECT c3.yc, c3.yp, c3.xpl,
               CAST(c3.c AS DOUBLE) / agg_{suffix}.n
               * (round(log2(CAST(c3.c AS DOUBLE) * cyp.c
                             / (CAST(cpx.c AS DOUBLE) * cyy.c))
                  + sign(log2(CAST(c3.c AS DOUBLE) * cyp.c
                             / (CAST(cpx.c AS DOUBLE) * cyy.c))) * 1e-9, 8)
                  + 0.0) AS term
        FROM c3_{suffix} c3
        JOIN (SELECT yp, sum(c) AS c FROM c3_{suffix} GROUP BY yp) cyp
          ON c3.yp = cyp.yp
        JOIN (SELECT yp, xpl, sum(c) AS c FROM c3_{suffix} GROUP BY yp, xpl)
          cpx ON c3.yp = cpx.yp AND c3.xpl = cpx.xpl
        JOIN (SELECT yc, yp, sum(c) AS c FROM c3_{suffix} GROUP BY yc, yp)
          cyy ON c3.yc = cyy.yc AND c3.yp = cyy.yp
        CROSS JOIN agg_{suffix}
      )
    )"""


@query(
    "stat_transfer_entropy",
    # binarized TE in both directions: states from exact lower-middle
    # medians of the daily count series, 8 integer count cells per
    # direction, one nudged log2 per cell, state-ordered folds.
    oracle=f"""
    WITH cl AS (
      SELECT CAST(ts AS DATE) AS d,
             sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS xc,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS yc
      FROM events GROUP BY 1
    ), s_x AS (
      SELECT row_number() OVER (ORDER BY d) AS t, xc AS c FROM cl
    ), s_y AS (
      SELECT row_number() OVER (ORDER BY d) AS t, yc AS c FROM cl
    ), med_x AS (
      SELECT c AS m FROM (
        SELECT c, row_number() OVER (ORDER BY c, t) AS rn,
               count(*) OVER () AS n FROM s_x
      ) WHERE rn = (n + 1) // 2
    ), med_y AS (
      SELECT c AS m FROM (
        SELECT c, row_number() OVER (ORDER BY c, t) AS rn,
               count(*) OVER () AS n FROM s_y
      ) WHERE rn = (n + 1) // 2
    ),{_te_oracle('x', 'y', 'xy')},{_te_oracle('y', 'x', 'yx')}
    SELECT CAST((SELECT count(*) FROM cl) AS BIGINT) AS n_days,
           round(te_xy.te, 6) + 0.0 AS te_clicks_to_purchases,
           round(te_yx.te, 6) + 0.0 AS te_purchases_to_clicks
    FROM te_xy CROSS JOIN te_yx
    """,
    category="timeseries",
)
def stat_transfer_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRANSFER ENTROPY between daily click and purchase volumes
    (binarized against each series' exact median): the
    information-theoretic, model-free directionality measure that
    complements `stat_granger_causality`'s linear lag test — TE sees ANY
    predictive dependence, not just linear, and its asymmetry
    (TE(X→Y) vs TE(Y→X)) is the direction signal. With binary states the
    whole estimator collapses to 8 integer count cells per direction
    (y_t, y_{{t-1}}, x_{{t-1}}); each cell contributes
    (c/N)·log2(c·c_yp / (c_ypxp·c_ycyp)) with ONE nudged log2, folded in
    state order — bit-deterministic.

    Scale shape (100 TB): the fact scan collapses to the calendar-
    bounded daily frame; medians are exact order statistics on that
    frame; everything after is arithmetic on 8-row cell tables. The
    lag/rank windows run on the |days| frame only (the granger
    bound)."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    cl = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("xc"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "yc"
        ),
    ).localCheckpoint(eager=True)
    n_days = cl.count()

    wt = Window.orderBy("d")

    def series(col: str) -> DataFrame:
        return cl.select(F.row_number().over(wt).alias("t"), F.col(col).alias("c"))

    def median(s: DataFrame) -> DataFrame:
        wr = Window.orderBy("c", "t")
        ranked = s.select(
            "c",
            F.row_number().over(wr).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        )
        return ranked.filter(F.col("rn") == F.expr("(n + 1) div 2")).select(
            F.col("c").alias("m")
        )

    def te_direction(sx: DataFrame, sy: DataFrame, mx: DataFrame, my: DataFrame):
        j = (
            sx.select("t", F.col("c").alias("ca"))
            .join(sy.select("t", F.col("c").alias("cb")), "t")
            .crossJoin(F.broadcast(mx.select(F.col("m").alias("ma"))))
            .crossJoin(F.broadcast(my.select(F.col("m").alias("mb"))))
            .select(
                "t",
                F.when(F.col("ca") > F.col("ma"), 1).otherwise(0).alias("xs"),
                F.when(F.col("cb") > F.col("mb"), 1).otherwise(0).alias("ycur"),
            )
        )
        lagged = j.select(
            "ycur",
            F.lag("ycur").over(wt2).alias("yp"),
            F.lag("xs").over(wt2).alias("xpl"),
        ).filter(F.col("yp").isNotNull())
        c3 = lagged.groupBy("ycur", "yp", "xpl").agg(F.count(F.lit(1)).alias("c"))
        c3 = c3.localCheckpoint(eager=True)
        n = c3.agg(F.sum("c").alias("n"))
        cyp = c3.groupBy("yp").agg(F.sum("c").alias("c_yp"))
        cpx = c3.groupBy("yp", "xpl").agg(F.sum("c").alias("c_ypx"))
        cyy = c3.groupBy("ycur", "yp").agg(F.sum("c").alias("c_yy"))
        ratio = (
            F.col("c").cast("double")
            * F.col("c_yp")
            / (F.col("c_ypx").cast("double") * F.col("c_yy"))
        )
        lg = F.log2(ratio)
        term = (
            F.col("c").cast("double")
            / F.col("n")
            * (F.round(lg + F.signum(lg) * F.lit(1e-9), 8) + F.lit(0.0))
        )
        cells = (
            c3.join(F.broadcast(cyp), "yp")
            .join(F.broadcast(cpx), ["yp", "xpl"])
            .join(F.broadcast(cyy), ["ycur", "yp"])
            .crossJoin(F.broadcast(n))
            .select("ycur", "yp", "xpl", term.alias("term"))
        )
        return cells.agg(
            F.expr(
                "aggregate(transform(array_sort(collect_list("
                "struct(ycur, yp, xpl, term))), x -> x.term), "
                "cast(0.0 as double), (a, y) -> a + y)"
            ).alias("te")
        )

    wt2 = Window.orderBy("t")
    sx, sy = series("xc"), series("yc")
    mx, my = median(sx), median(sy)
    te_xy = te_direction(sx, sy, mx, my).select(F.col("te").alias("te_xy"))
    te_yx = te_direction(sy, sx, my, mx).select(F.col("te").alias("te_yx"))
    return te_xy.crossJoin(te_yx).select(
        F.lit(n_days).cast("long").alias("n_days"),
        (F.round(F.col("te_xy"), 6) + F.lit(0.0)).alias(
            "te_clicks_to_purchases"
        ),
        (F.round(F.col("te_yx"), 6) + F.lit(0.0)).alias(
            "te_purchases_to_clicks"
        ),
    )


@query(
    "stat_wilcoxon_signed_rank",
    # paired differences are exact integer cents, so the |d| histogram,
    # average ranks, W+ and the tie correction are all order-free integer
    # arithmetic until the final z division (stat_mann_whitney_u's
    # histogram recipe applied to the signed-rank test).
    oracle="""
    WITH per AS (
      SELECT o_custkey,
             CAST(sum(CASE WHEN year(o_orderdate) = 1994
                  THEN CAST(round(CAST(o_totalprice AS DOUBLE) * 100.0) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS s94,
             CAST(sum(CASE WHEN year(o_orderdate) = 1995
                  THEN CAST(round(CAST(o_totalprice AS DOUBLE) * 100.0) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS s95,
             max(CASE WHEN year(o_orderdate) = 1994 THEN 1 ELSE 0 END) AS has94,
             max(CASE WHEN year(o_orderdate) = 1995 THEN 1 ELSE 0 END) AS has95
      FROM orders
      WHERE year(o_orderdate) IN (1994, 1995)
      GROUP BY o_custkey
    ), d AS (
      SELECT s95 - s94 AS diff, abs(s95 - s94) AS ad
      FROM per WHERE has94 = 1 AND has95 = 1 AND s95 <> s94
    ), h AS (
      SELECT ad,
             sum(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS np_v,
             count(*) AS t_v
      FROM d GROUP BY ad
    ), c AS (
      SELECT ad, np_v, t_v,
             coalesce(sum(t_v) OVER (ORDER BY ad
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_lt
      FROM h
    ), tot AS (
      SELECT sum(t_v) AS n,
             sum(t_v * t_v * t_v - t_v) AS ties,
             sum(np_v) AS n_pos
      FROM h
    ), w AS (
      SELECT sum(np_v * (cum_lt + (t_v + 1.0) / 2.0)) AS w_plus FROM c
    )
    SELECT CAST(tot.n AS BIGINT) AS n_pairs,
           CAST(tot.n_pos AS BIGINT) AS n_increased,
           round(w.w_plus, 4) + 0.0 AS w_plus,
           round((w.w_plus - tot.n * (tot.n + 1.0) / 4.0)
                 / sqrt(tot.n * (tot.n + 1.0) * (2.0 * tot.n + 1.0) / 24.0
                        - CAST(tot.ties AS DOUBLE) / 48.0), 6) + 0.0 AS z_score
    FROM w CROSS JOIN tot
    """,
    category="timeseries",
)
def stat_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test on PAIRED samples — did per-customer
    spend change from 1994 to 1995? — completing the nonparametric family
    (`stat_mann_whitney_u` is the unpaired twin, `stat_mcnemar_paired_test`
    the binary-paired one; reference src/data/visualize.py statistical
    panel). Pairs are customers ordering in both years; d = exact spend
    difference in cents; zero diffs drop per the standard definition.

    Scale shape: ranking N pairs is a global sort, so the test runs in
    the HISTOGRAM formulation instead — |d| values pre-aggregate to
    per-value (n_positive, count) cells, the average rank of a cell is
    cum_count(<|d|) + (t+1)/2, and W+ = Σ n_pos(v)·avgrank(v) with the
    tie-corrected normal z. The cumulative count runs through
    `bucketed_cumsum` ($10k diff bands), so even the |distinct |d||
    histogram never passes through one partition; everything is exact
    integer arithmetic until the final division."""
    from etl_aws_spark.suite._util import bucketed_cumsum

    cents = F.round(F.col("o_totalprice").cast("double") * 100.0).cast("long")
    yr = F.year("o_orderdate")
    per = (
        load(spark, sf_dir, "orders")
        .filter(yr.isin(1994, 1995))
        .groupBy("o_custkey")
        .agg(
            F.sum(F.when(yr == 1994, cents).otherwise(F.lit(0))).alias("s94"),
            F.sum(F.when(yr == 1995, cents).otherwise(F.lit(0))).alias("s95"),
            F.max(F.when(yr == 1994, 1).otherwise(0)).alias("has94"),
            F.max(F.when(yr == 1995, 1).otherwise(0)).alias("has95"),
        )
    )
    d = per.filter(
        (F.col("has94") == 1) & (F.col("has95") == 1) & (F.col("s95") != F.col("s94"))
    ).select(
        (F.col("s95") - F.col("s94")).alias("diff"),
        F.abs(F.col("s95") - F.col("s94")).alias("ad"),
    )
    h = d.groupBy("ad").agg(
        F.sum(F.when(F.col("diff") > 0, 1).otherwise(0)).alias("np_v"),
        F.count(F.lit(1)).alias("t_v"),
    )
    c = bucketed_cumsum(
        h,
        "ad",
        "t_v",
        bucket=F.expr("ad div 1000000"),
        out_cols="cum_lt",
        inclusive=False,
    )
    agg = c.agg(
        F.sum("t_v").alias("n"),
        F.sum(F.col("t_v") * F.col("t_v") * F.col("t_v") - F.col("t_v")).alias(
            "ties"
        ),
        F.sum("np_v").alias("n_pos"),
        F.sum(
            F.col("np_v") * (F.col("cum_lt") + (F.col("t_v") + F.lit(1.0)) / 2.0)
        ).alias("w_plus"),
    )
    n = F.col("n").cast("double")
    return agg.select(
        F.col("n").cast("long").alias("n_pairs"),
        F.col("n_pos").cast("long").alias("n_increased"),
        rnd(F.col("w_plus"), 4).alias("w_plus"),
        (
            F.round(
                (F.col("w_plus") - n * (n + 1.0) / 4.0)
                / F.sqrt(
                    n * (n + 1.0) * (2.0 * n + 1.0) / 24.0
                    - F.col("ties").cast("double") / 48.0
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("z_score"),
    )


@query(
    "stat_cohens_effect_sizes",
    # exact integer cents power sums per (type, group); means/variances
    # and all three effect sizes derive through identical double
    # expressions, so the values are bit-equal before rounding.
    oracle="""
    WITH g AS (
      SELECT event_type,
             CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS is_we,
             CAST(round(CAST(value AS DOUBLE) * 100.0) AS BIGINT) AS v
      FROM events
    ), s AS (
      SELECT event_type,
             sum(is_we) AS n1, sum(1 - is_we) AS n2,
             CAST(sum(CASE WHEN is_we = 1 THEN v ELSE 0 END) AS DOUBLE) AS s1,
             CAST(sum(CASE WHEN is_we = 0 THEN v ELSE 0 END) AS DOUBLE) AS s2,
             CAST(sum(CASE WHEN is_we = 1 THEN v * v ELSE 0 END) AS DOUBLE) AS q1,
             CAST(sum(CASE WHEN is_we = 0 THEN v * v ELSE 0 END) AS DOUBLE) AS q2
      FROM g GROUP BY event_type
    ), e AS (
      SELECT event_type, n1, n2,
             s1 / n1 AS m1, s2 / n2 AS m2,
             (q1 - s1 * s1 / n1) / (n1 - 1) AS v1,
             (q2 - s2 * s2 / n2) / (n2 - 1) AS v2
      FROM s
    )
    SELECT event_type,
           CAST(n1 AS BIGINT) AS n_weekend,
           CAST(n2 AS BIGINT) AS n_weekday,
           round((m1 - m2) / 100.0, 4) + 0.0 AS mean_diff,
           round((m1 - m2) / sqrt(((n1 - 1) * v1 + (n2 - 1) * v2)
                                  / (n1 + n2 - 2)), 6) + 0.0 AS cohens_d,
           round(((m1 - m2) / sqrt(((n1 - 1) * v1 + (n2 - 1) * v2)
                                   / (n1 + n2 - 2)))
                 * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0)), 6) + 0.0 AS hedges_g,
           round((m1 - m2) / sqrt(v2), 6) + 0.0 AS glass_delta
    FROM e
    """,
    category="timeseries",
)
def stat_cohens_effect_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized EFFECT SIZES per event type (weekend vs weekday value):
    Cohen's d (pooled sd), Hedges' g (small-sample corrected), and Glass's
    delta (control-group sd) — the companion the test-statistic family
    (`stat_welch_t_test`, `stat_mann_whitney_u`) needs to say not just
    "significant" but "how big", which at 100 TB is the question that
    matters (everything is significant at N = 10^12).

    Scale shape: ONE conditional aggregate per event type collapses the
    stream to six exact integer cents power sums; every derived quantity
    is a scalar expression over the |types|-row frame. The sums are
    order-free integers (decimal38/HUGEINT), the doubles derive through
    the identical expression tree on both engines."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.when(F.dayofweek("ts").isin(1, 7), 1).otherwise(0).alias("is_we"),
        F.round(F.col("value").cast("double") * 100.0).cast("long").alias("v"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731 - exact integer sums
    s = ev.groupBy("event_type").agg(
        F.sum("is_we").alias("n1"),
        F.sum(F.lit(1) - F.col("is_we")).alias("n2"),
        F.sum(dec(F.when(F.col("is_we") == 1, F.col("v")).otherwise(0)))
        .cast("double")
        .alias("s1"),
        F.sum(dec(F.when(F.col("is_we") == 0, F.col("v")).otherwise(0)))
        .cast("double")
        .alias("s2"),
        F.sum(
            dec(F.when(F.col("is_we") == 1, F.col("v") * F.col("v")).otherwise(0))
        )
        .cast("double")
        .alias("q1"),
        F.sum(
            dec(F.when(F.col("is_we") == 0, F.col("v") * F.col("v")).otherwise(0))
        )
        .cast("double")
        .alias("q2"),
    )
    return s.selectExpr(
        "event_type",
        "CAST(n1 AS BIGINT) AS n_weekend",
        "CAST(n2 AS BIGINT) AS n_weekday",
        "round((s1 / n1 - s2 / n2) / 100.0, 4) + 0.0 AS mean_diff",
        """round((s1 / n1 - s2 / n2)
                 / sqrt(((n1 - 1) * ((q1 - s1 * s1 / n1) / (n1 - 1))
                         + (n2 - 1) * ((q2 - s2 * s2 / n2) / (n2 - 1)))
                        / (n1 + n2 - 2)), 6) + 0.0 AS cohens_d""",
        """round(((s1 / n1 - s2 / n2)
                 / sqrt(((n1 - 1) * ((q1 - s1 * s1 / n1) / (n1 - 1))
                         + (n2 - 1) * ((q2 - s2 * s2 / n2) / (n2 - 1)))
                        / (n1 + n2 - 2)))
                 * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0)), 6) + 0.0 AS hedges_g""",
        """round((s1 / n1 - s2 / n2)
                 / sqrt((q2 - s2 * s2 / n2) / (n2 - 1)), 6) + 0.0 AS glass_delta""",
    )


@query(
    "stat_tost_equivalence",
    # same exact integer cents power sums as the effect-size suite; both
    # one-sided t statistics derive through one shared expression tree.
    oracle="""
    WITH g AS (
      SELECT CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS is_we,
             CAST(round(CAST(value AS DOUBLE) * 100.0) AS BIGINT) AS v
      FROM events WHERE event_type = 'view'
    ), s AS (
      SELECT sum(is_we) AS n1, sum(1 - is_we) AS n2,
             CAST(sum(CASE WHEN is_we = 1 THEN v ELSE 0 END) AS DOUBLE) AS s1,
             CAST(sum(CASE WHEN is_we = 0 THEN v ELSE 0 END) AS DOUBLE) AS s2,
             CAST(sum(CASE WHEN is_we = 1 THEN v * v ELSE 0 END) AS DOUBLE) AS q1,
             CAST(sum(CASE WHEN is_we = 0 THEN v * v ELSE 0 END) AS DOUBLE) AS q2
      FROM g
    ), e AS (
      SELECT n1, n2, s1 / n1 - s2 / n2 AS diff,
             sqrt((q1 - s1 * s1 / n1) / (n1 - 1) / n1
                  + (q2 - s2 * s2 / n2) / (n2 - 1) / n2) AS se,
             0.05 * ((s1 + s2) / (n1 + n2)) AS margin
      FROM s
    )
    SELECT CAST(n1 AS BIGINT) AS n_weekend,
           CAST(n2 AS BIGINT) AS n_weekday,
           round(diff / 100.0, 4) + 0.0 AS mean_diff,
           round(margin / 100.0, 4) + 0.0 AS margin,
           round((diff + margin) / se, 6) + 0.0 AS t_lower,
           round((diff - margin) / se, 6) + 0.0 AS t_upper,
           CAST((diff + margin) / se > 1.6449 AND
                (diff - margin) / se < -1.6449 AS INT) AS is_equivalent
    FROM e
    """,
    category="timeseries",
)
def stat_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST EQUIVALENCE test (two one-sided tests, Schuirmann 1987) on
    weekend-vs-weekday view values: the A/B question `stat_welch_t_test`
    cannot answer — not "is there a difference" but "is the difference
    provably SMALLER than a margin" (±5% of the pooled mean), which is
    what a data-pipeline migration needs before swapping implementations.
    Both one-sided t statistics must clear z(0.95) ≈ 1.6449 for
    equivalence.

    Scale shape: identical to the effect-size suite — ONE conditional
    aggregate collapses the stream to six exact integer cents power sums;
    the two t statistics are scalar expressions over a 1-row frame,
    derived through the same expression tree on both engines."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    g = ev.select(
        F.when(F.dayofweek("ts").isin(1, 7), 1).otherwise(0).alias("is_we"),
        F.round(F.col("value").cast("double") * 100.0).cast("long").alias("v"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731 - exact integer sums
    s = g.agg(
        F.sum("is_we").alias("n1"),
        F.sum(F.lit(1) - F.col("is_we")).alias("n2"),
        F.sum(dec(F.when(F.col("is_we") == 1, F.col("v")).otherwise(0)))
        .cast("double")
        .alias("s1"),
        F.sum(dec(F.when(F.col("is_we") == 0, F.col("v")).otherwise(0)))
        .cast("double")
        .alias("s2"),
        F.sum(
            dec(F.when(F.col("is_we") == 1, F.col("v") * F.col("v")).otherwise(0))
        )
        .cast("double")
        .alias("q1"),
        F.sum(
            dec(F.when(F.col("is_we") == 0, F.col("v") * F.col("v")).otherwise(0))
        )
        .cast("double")
        .alias("q2"),
    )
    return s.selectExpr(
        "CAST(n1 AS BIGINT) AS n_weekend",
        "CAST(n2 AS BIGINT) AS n_weekday",
        "round((s1 / n1 - s2 / n2) / 100.0, 4) + 0.0 AS mean_diff",
        "round(0.05 * ((s1 + s2) / (n1 + n2)) / 100.0, 4) + 0.0 AS margin",
        """round(((s1 / n1 - s2 / n2) + 0.05 * ((s1 + s2) / (n1 + n2)))
                 / sqrt((q1 - s1 * s1 / n1) / (n1 - 1) / n1
                        + (q2 - s2 * s2 / n2) / (n2 - 1) / n2), 6) + 0.0
           AS t_lower""",
        """round(((s1 / n1 - s2 / n2) - 0.05 * ((s1 + s2) / (n1 + n2)))
                 / sqrt((q1 - s1 * s1 / n1) / (n1 - 1) / n1
                        + (q2 - s2 * s2 / n2) / (n2 - 1) / n2), 6) + 0.0
           AS t_upper""",
        """CAST(((s1 / n1 - s2 / n2) + 0.05 * ((s1 + s2) / (n1 + n2)))
                 / sqrt((q1 - s1 * s1 / n1) / (n1 - 1) / n1
                        + (q2 - s2 * s2 / n2) / (n2 - 1) / n2) > 1.6449
                AND ((s1 / n1 - s2 / n2) - 0.05 * ((s1 + s2) / (n1 + n2)))
                 / sqrt((q1 - s1 * s1 / n1) / (n1 - 1) / n1
                        + (q2 - s2 * s2 / n2) / (n2 - 1) / n2) < -1.6449
                AS INT) AS is_equivalent""",
    )


@query(
    "window_ewm_time_decay",
    # per-step decay lambda = 0.5^(dt/half_life) crosses the nudged-8
    # transcendental bridge BEFORE entering the fold, so the sequential
    # recurrence is deterministic double arithmetic on both engines.
    oracle=f"""
    WITH b AS (
      SELECT event_id, user_id, ts, value, epoch_us(ts) AS us
      FROM events
    ), l AS (
      SELECT event_id, user_id, ts, value,
             CASE WHEN lag(us) OVER w IS NULL THEN 0.0
                  ELSE round(pow(0.5, (us - lag(us) OVER w) / 43200000000.0)
                             + 1e-9, 8) END AS lam
      FROM b
      WINDOW w AS (PARTITION BY user_id ORDER BY {EVENTS_ORDER_SQL})
    ), p AS (
      SELECT event_id, user_id, ts, value,
             list([lam, value]) OVER (PARTITION BY user_id
                 ORDER BY {EVENTS_ORDER_SQL}
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pre
      FROM l
    )
    SELECT event_id, user_id, ts, value,
           round(list_reduce(list_prepend([CAST(NULL AS DOUBLE)], pre),
                 (acc, s) -> [CASE WHEN acc[1] IS NULL THEN s[2]
                              ELSE s[1] * acc[1] + (1.0 - s[1]) * s[2] END])[1],
                 4) + 0.0 AS ewma_decay
    FROM p
    """,
    category="timeseries",
)
def window_ewm_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA with TIME-decay on IRREGULAR event times — the event-time
    generalization of `window_ewm_macd`'s row-count EWMA: each step
    decays the accumulator by λ = 0.5^(Δt / 12h), so a reading after a
    long gap nearly resets while a burst barely moves it (the form
    monitoring systems and online feature stores actually need; a
    row-count span silently treats a 1-second and a 3-day gap alike).

    Exactness: λ is the one transcendental — it crosses the nudged
    round-8 bridge per step BEFORE the fold, so the recurrence
    e = λ·e + (1−λ)·x is identical double arithmetic on both engines.
    Scale shape: one per-user shuffle; the prefix arrays and the fold
    are in-row HOF codegen over bounded per-user series (the
    `window_ewm_macd` / Holt family pattern), no Python anywhere."""
    from pyspark.sql import Window

    b = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lam = F.when(F.lag("us").over(w).isNull(), F.lit(0.0)).otherwise(
        F.round(
            F.pow(F.lit(0.5), (F.col("us") - F.lag("us").over(w)) / 43200000000.0)
            + F.lit(1e-9),
            8,
        )
    )
    l = b.select("event_id", "user_id", "ts", "value", lam.alias("lam"))
    pre = F.collect_list(F.array("lam", "value")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    p = l.select("event_id", "user_id", "ts", "value", pre.alias("pre"))
    fold = (
        "aggregate(pre, array(CAST(NULL AS DOUBLE)),"
        " (acc, s) -> array(CASE WHEN acc[0] IS NULL THEN s[1]"
        " ELSE s[0] * acc[0] + (1.0D - s[0]) * s[1] END),"
        " acc -> acc[0])"
    )
    return p.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        (F.round(F.expr(fold), 4) + F.lit(0.0)).alias("ewma_decay"),
    )


@query(
    "stat_bartlett_variance_test",
    # exact integer cents power sums per group; every ln crosses the
    # nudged-8 transcendental bridge before the cross-group fold, which
    # runs in group-key order on both engines.
    oracle="""
    WITH g AS (
      SELECT event_type,
             count(*) AS n,
             CAST(sum(CAST(round(CAST(value AS DOUBLE) * 100.0) AS BIGINT))
               AS DOUBLE) AS s,
             CAST(sum(CAST(CAST(round(CAST(value AS DOUBLE) * 100.0) AS BIGINT)
                 AS HUGEINT)
                 * CAST(round(CAST(value AS DOUBLE) * 100.0) AS BIGINT))
               AS DOUBLE) AS q
      FROM events GROUP BY event_type
    ), v AS (
      SELECT event_type, n, (q - s * s / n) / (n - 1) AS var
      FROM g
    ), tot AS (
      SELECT sum(n) AS nn, count(*) AS k,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(CAST(n - 1 AS DOUBLE) * var ORDER BY event_type)),
               (a, x) -> a + x) AS pooled_num,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(CAST(n - 1 AS DOUBLE)
                    * (round(ln(var) + sign(ln(var)) * 1e-9, 8) + 0.0)
                    ORDER BY event_type)),
               (a, x) -> a + x) AS sum_ln,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(1.0 / (n - 1) ORDER BY event_type)), (a, x) -> a + x)
               AS sum_inv
      FROM v
    )
    SELECT CAST(nn AS BIGINT) AS n_total,
           CAST(k AS INT) AS k_groups,
           round(pooled_num / (nn - k) / 10000.0, 4) + 0.0 AS pooled_var,
           round(((nn - k) * (round(ln(pooled_num / (nn - k))
                                    + sign(ln(pooled_num / (nn - k))) * 1e-9, 8)
                              + 0.0)
                  - sum_ln)
                 / (1.0 + (sum_inv - 1.0 / (nn - k)) / (3.0 * (k - 1))), 4)
             + 0.0 AS bartlett_stat,
           CAST(k - 1 AS BIGINT) AS df
    FROM tot
    """,
    category="timeseries",
)
def stat_bartlett_variance_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BARTLETT's test for variance homogeneity across event types — the
    parametric member of the family (`stat_brown_forsythe_levene` is the
    robust one): T = [(N−k)·ln(s_p²) − Σ(n_i−1)·ln(s_i²)] / C with the
    Bartlett correction C, chi-square with k−1 df under normality.

    Scale shape: ONE aggregate collapses the stream to exact integer
    cents power sums per group; variances, the pooled variance, and T
    are scalar expressions over the |types|-row frame, with the two
    cross-group float folds running in group-key order and every ln
    crossing the nudged-8 transcendental bridge on both engines.
    Variances stay in cents² until the single display division."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value").cast("double") * 100.0).cast("long").alias("x"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731 - exact integer sums
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("x"))).cast("double").alias("s"),
        F.sum(dec(F.col("x") * F.col("x"))).cast("double").alias("q"),
    )
    v = g.select(
        "event_type",
        "n",
        ((F.col("q") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1)).alias(
            "var"
        ),
    )
    fold = (
        "aggregate(transform(array_sort(collect_list(struct(event_type, "
        "cast({t} as double) as t))), x -> x.t), "
        "cast(0.0 as double), (p, q) -> p + q)"
    )
    ln8 = "(round(ln({x}) + sign(ln({x})) * 1e-9, 8) + 0.0)"
    tot = v.agg(
        F.sum("n").alias("nn"),
        F.count(F.lit(1)).alias("k"),
        F.expr(fold.format(t="(n - 1) * var")).alias("pooled_num"),
        F.expr(
            fold.format(t=f"(n - 1) * {ln8.format(x='var')}")
        ).alias("sum_ln"),
        F.expr(fold.format(t="1.0 / (n - 1)")).alias("sum_inv"),
    )
    pooled = "pooled_num / (nn - k)"
    return tot.selectExpr(
        "CAST(nn AS BIGINT) AS n_total",
        "CAST(k AS INT) AS k_groups",
        f"round({pooled} / 10000.0, 4) + 0.0 AS pooled_var",
        f"""round(((nn - k) * {ln8.format(x=pooled)} - sum_ln)
                 / (1.0 + (sum_inv - 1.0 / (nn - k)) / (3.0 * (k - 1))), 4)
             + 0.0 AS bartlett_stat""",
        "CAST(k - 1 AS BIGINT) AS df",
    )


@query(
    "events_funnel_negation",
    # next-B / next-C via conditional min over the FOLLOWING frame —
    # exact integer microseconds, one per-user window partitioning.
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS us, event_id
      FROM events
    ), w AS (
      SELECT user_id, event_type, us,
             min(CASE WHEN event_type = 'purchase' THEN us END)
               OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_purchase_us,
             min(CASE WHEN event_type = 'error' THEN us END)
               OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_error_us
      FROM e
    ), a AS (
      SELECT user_id,
             CASE WHEN next_purchase_us IS NOT NULL
                   AND next_purchase_us <= us + 604800000000 THEN 1 ELSE 0
               END AS in_window,
             CASE WHEN next_purchase_us IS NOT NULL
                   AND next_purchase_us <= us + 604800000000
                   AND (next_error_us IS NULL
                        OR next_error_us >= next_purchase_us) THEN 1 ELSE 0
               END AS converted
      FROM w WHERE event_type = 'signup'
    )
    SELECT CAST(count(*) AS BIGINT) AS n_signups,
           CAST(sum(in_window) AS BIGINT) AS n_purchase_in_7d,
           CAST(sum(in_window) - sum(converted) AS BIGINT)
             AS n_blocked_by_error,
           CAST(sum(converted) AS BIGINT) AS n_clean_conversions,
           round(CAST(sum(converted) AS DOUBLE) / count(*), 6) + 0.0
             AS clean_conversion_rate
    FROM a
    """,
    category="timeseries",
)
def events_funnel_negation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel with NEGATION — signup → purchase within 7 days with NO
    error event in between: the MATCH_RECOGNIZE-shaped pattern
    (`A (^C)* B` within a window) that plain funnel counting
    (`events_funnel_conversion`, `events_funnel_time_bound`) cannot
    express, and the one that distinguishes "converted" from "converted
    despite our bug" in incident analysis.

    Scale shape: no self-join, no pattern automaton — the next purchase
    and next error timestamps are conditional MINs over the FOLLOWING
    row frame of ONE per-user window partitioning; the negation is then
    a row-local comparison (error-before-purchase blocks the match).
    Exact integer microseconds throughout; one final ratio."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("us"),
        "event_id",
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    w = e.select(
        "user_id",
        "event_type",
        "us",
        F.min(F.when(F.col("event_type") == "purchase", F.col("us"))).over(wf).alias(
            "next_purchase_us"
        ),
        F.min(F.when(F.col("event_type") == "error", F.col("us"))).over(wf).alias(
            "next_error_us"
        ),
    )
    in_window = (
        F.col("next_purchase_us").isNotNull()
        & (F.col("next_purchase_us") <= F.col("us") + F.lit(604800000000))
    )
    converted = in_window & (
        F.col("next_error_us").isNull()
        | (F.col("next_error_us") >= F.col("next_purchase_us"))
    )
    a = w.filter(F.col("event_type") == "signup").select(
        in_window.cast("int").alias("in_window"),
        converted.cast("int").alias("converted"),
    )
    return a.agg(
        F.count(F.lit(1)).cast("long").alias("n_signups"),
        F.sum("in_window").cast("long").alias("n_purchase_in_7d"),
        (F.sum("in_window") - F.sum("converted")).cast("long").alias(
            "n_blocked_by_error"
        ),
        F.sum("converted").cast("long").alias("n_clean_conversions"),
        rnd(
            F.sum("converted").cast("double") / F.count(F.lit(1)), 6
        ).alias("clean_conversion_rate"),
    )


@query(
    "stat_cramers_v_effect",
    # chi-square folds over the cell grid in (type, dow) key order on
    # both engines; V and the Bergsma bias-corrected V are scalar math.
    oracle="""
    WITH obs AS (
      SELECT event_type, CAST(date_part('dow', ts) AS INTEGER) AS dow,
             count(*) AS o
      FROM events GROUP BY 1, 2
    ), grid AS (
      SELECT t.event_type, d.dow
      FROM (SELECT DISTINCT event_type FROM obs) t
      CROSS JOIN (SELECT DISTINCT dow FROM obs) d
    ), full_grid AS (
      SELECT g.event_type, g.dow, CAST(coalesce(o.o, 0) AS DOUBLE) AS o
      FROM grid g LEFT JOIN obs o USING (event_type, dow)
    ), tot AS (
      SELECT event_type, dow, o,
             sum(o) OVER (PARTITION BY event_type) AS r,
             sum(o) OVER (PARTITION BY dow) AS c,
             sum(o) OVER () AS n
      FROM full_grid
    ), s AS (
      SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list((o - r * c / n) * (o - r * c / n) / (r * c / n)
                    ORDER BY event_type, dow)), (a, x) -> a + x) AS chi2,
             count(DISTINCT event_type) AS rr,
             count(DISTINCT dow) AS cc,
             sum(o) AS n
      FROM tot
    )
    SELECT round(chi2, 4) + 0.0 AS chi2,
           CAST(n AS BIGINT) AS n_obs,
           CAST(rr AS INT) AS n_rows_dim,
           CAST(cc AS INT) AS n_cols_dim,
           round(sqrt(chi2 / (n * least(rr - 1, cc - 1))), 6) + 0.0
             AS cramers_v,
           round(sqrt(greatest(chi2 / n - CAST((rr - 1) * (cc - 1) AS DOUBLE)
                               / (n - 1), 0.0)
                      / least(rr - CAST((rr - 1) * (rr - 1) AS DOUBLE) / (n - 1)
                                - 1.0,
                              cc - CAST((cc - 1) * (cc - 1) AS DOUBLE) / (n - 1)
                                - 1.0)), 6) + 0.0 AS cramers_v_corrected
    FROM s
    """,
    category="timeseries",
)
def stat_cramers_v_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CRAMÉR'S V — the effect size for categorical association that
    `stat_chi2_independence`'s test statistic lacks (at N = 10¹² every
    contingency table is "significant"; V says whether the association
    matters), plus the Bergsma (2013) bias-corrected V~ that does not
    inflate on tables with many cells.

    Scale shape: identical to the chi-square parent — one group-by to
    the |types|×|dow| cell grid, marginals as windows over the tiny cell
    frame; the chi-square folds in (type, dow) KEY ORDER on both engines
    (the cross-engine ordered-fold recipe), and both V's are scalar
    expressions over one row."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", (F.dayofweek("ts") - 1).cast("int").alias("dow")
    ).agg(F.count(F.lit(1)).alias("o"))
    types = obs.select("event_type").distinct()
    dows = obs.select("dow").distinct()
    full_grid = (
        types.crossJoin(dows)
        .join(obs, ["event_type", "dow"], "left")
        .select(
            "event_type", "dow", F.coalesce("o", F.lit(0)).cast("double").alias("o")
        )
    )
    tot = full_grid.select(
        "event_type",
        "dow",
        "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("r"),
        F.sum("o").over(Window.partitionBy("dow")).alias("c"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    fold = (
        "aggregate(transform(array_sort(collect_list(struct(event_type, dow, "
        "(o - r * c / n) * (o - r * c / n) / (r * c / n) as t))), x -> x.t), "
        "cast(0.0 as double), (p, q) -> p + q)"
    )
    s = tot.agg(
        F.expr(fold).alias("chi2"),
        F.countDistinct("event_type").alias("rr"),
        F.countDistinct("dow").alias("cc"),
        F.sum("o").alias("n"),
    )
    return s.selectExpr(
        "round(chi2, 4) + 0.0 AS chi2",
        "CAST(n AS BIGINT) AS n_obs",
        "CAST(rr AS INT) AS n_rows_dim",
        "CAST(cc AS INT) AS n_cols_dim",
        "round(sqrt(chi2 / (n * least(rr - 1, cc - 1))), 6) + 0.0 AS cramers_v",
        """round(sqrt(greatest(chi2 / n - CAST((rr - 1) * (cc - 1) AS DOUBLE)
                               / (n - 1), 0.0D)
                      / least(rr - CAST((rr - 1) * (rr - 1) AS DOUBLE) / (n - 1)
                                - 1.0D,
                              cc - CAST((cc - 1) * (cc - 1) AS DOUBLE) / (n - 1)
                                - 1.0D)), 6) + 0.0 AS cramers_v_corrected""",
    )
