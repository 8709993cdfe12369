"""Temporal-join queries: as-of join, sessionization, session rollup.

The as-of oracle uses DuckDB's native ``ASOF LEFT JOIN``; the Spark side is
the union + forward-fill window composition — two completely different
formulations that must agree row-for-row, the strongest kind of oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_aws_spark.operators import temporal_joins as tj
from etl_aws_spark.registry import load, query
from etl_aws_spark.suite._util import EVENTS_ORDER_SQL, rnd, rnd_nudged

# sparse "fundamentals updates": every 17th event is a reference row
_RIGHT_FILTER = "event_id % 17 = 0"


@query(
    "join_asof_backward",
    oracle=f"""
    WITH r AS (
      SELECT user_id, ts, value FROM events WHERE {_RIGHT_FILTER}
    )
    SELECT e.event_id, e.user_id, e.ts, e.value,
           r.value AS right_value, r.ts AS right_ts
    FROM events e ASOF LEFT JOIN r
      ON e.user_id = r.user_id AND e.ts >= r.ts
    """,
    category="temporal",
)
def join_asof_backward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward) join: each event gets the latest reference row at or
    before its timestamp — pandas merge_asof semantics, implemented as a
    single union + forward-fill window pass (no join node, no range-join
    explosion). Checked against DuckDB's native ASOF JOIN."""
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    right = ev.filter(F.expr(_RIGHT_FILTER)).select("user_id", "ts", "value")
    out = tj.asof_join_backward(
        ev, right, key="user_id", left_ts="ts", right_ts="ts", value_cols=["value"]
    )
    return out.select("event_id", "user_id", "ts", "value", "right_value", "right_ts")


@query(
    "window_sessionize",
    oracle=f"""
    WITH g AS (
      SELECT event_id, user_id, ts,
             CASE WHEN date_part('epoch', ts)
                       - lag(date_part('epoch', ts)) OVER (PARTITION BY user_id ORDER BY {EVENTS_ORDER_SQL})
                       > 3600
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY {EVENTS_ORDER_SQL}) IS NULL
                  THEN 1 ELSE 0 END AS s
      FROM events
    )
    SELECT event_id, user_id, ts,
           CAST(sum(s) OVER (PARTITION BY user_id ORDER BY {EVENTS_ORDER_SQL}
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
    FROM g
    """,
    category="temporal",
)
def window_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (1 h gap): lag-gap-cumsum in one window
    pass. The streaming twin is ``F.session_window``."""
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    out = tj.sessionize(ev, "user_id", "ts", gap_seconds=3600, order_tail=["event_id"])
    return out.select("event_id", "user_id", "ts", "session_id")


@query(
    "agg_session_stats",
    oracle=f"""
    WITH g AS (
      SELECT event_id, user_id, ts, value,
             CASE WHEN date_part('epoch', ts)
                       - lag(date_part('epoch', ts)) OVER (PARTITION BY user_id ORDER BY {EVENTS_ORDER_SQL})
                       > 3600
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY {EVENTS_ORDER_SQL}) IS NULL
                  THEN 1 ELSE 0 END AS s
      FROM events
    ), sess AS (
      SELECT user_id, ts, value,
             CAST(sum(s) OVER (PARTITION BY user_id ORDER BY {EVENTS_ORDER_SQL}
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM g
    )
    SELECT user_id, session_id,
           min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events,
           round(sum(value), 4) + 0.0 AS sum_value
    FROM sess GROUP BY user_id, session_id
    """,
    category="temporal",
)
def agg_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session rollup (bounds, counts, value volume) — the event-
    analytics aggregate over the sessionized frame."""
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    out = tj.session_stats(ev, "user_id", "ts", gap_seconds=3600, value="value", order_tail=["event_id"])
    return out.select(
        "user_id", "session_id", "session_start", "session_end", "n_events",
        (F.round(F.col("sum_value"), 4) + F.lit(0.0)).alias("sum_value"),
    )


@query(
    "join_asof_forward",
    oracle=f"""
    WITH r AS (
      SELECT user_id, ts, value FROM events WHERE {_RIGHT_FILTER}
    )
    SELECT e.event_id, e.user_id, e.ts, e.value,
           r.value AS right_value, r.ts AS right_ts
    FROM events e ASOF LEFT JOIN r
      ON e.user_id = r.user_id AND e.ts <= r.ts
    """,
    category="temporal",
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: each event gets the EARLIEST reference row at or
    after its timestamp — pandas ``merge_asof(direction='forward')`` — as a
    single union + backward-fill window pass (no join node). Checked
    against DuckDB's native forward ``ASOF JOIN`` (``<=`` inequality):
    two independent formulations that must agree row-for-row."""
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    right = ev.filter(F.expr(_RIGHT_FILTER)).select("user_id", "ts", "value")
    out = tj.asof_join_forward(
        ev, right, key="user_id", left_ts="ts", right_ts="ts", value_cols=["value"]
    )
    return out.select("event_id", "user_id", "ts", "value", "right_value", "right_ts")


# sparse window anchors: every 97th event opens a 2-hour watch window
_WINDOW_FILTER = "event_id % 97 = 0"


@query(
    "join_range_interval",
    oracle=f"""
    WITH w AS (
      SELECT event_id AS win_id, user_id, ts AS start_ts,
             ts + INTERVAL 2 HOUR AS end_ts
      FROM events WHERE {_WINDOW_FILTER}
    ), p AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT w.win_id, w.user_id, w.start_ts, w.end_ts,
           CAST(count(p.ts) AS BIGINT) AS n_in_range,
           round(coalesce(sum(p.value), 0.0), 4) + 0.0 AS sum_value
    FROM w LEFT JOIN p
      ON p.user_id = w.user_id AND p.ts >= w.start_ts AND p.ts < w.end_ts
    GROUP BY w.win_id, w.user_id, w.start_ts, w.end_ts
    """,
    category="temporal",
)
def join_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap range join — purchases falling inside each 2-hour
    watch window — expressed as a BUCKETED equi-join (operators/
    temporal_joins.py bucketed_range_count): windows explode to the hour
    buckets they cover, points map to one bucket, join on (user, bucket)
    with the range as a residual filter. The oracle is the naive theta
    join the blocking provably equals; at scale the blocked form does
    Σ per-bucket work while the naive form is a per-key cross product."""
    ev = load(spark, sf_dir, "events")
    windows = ev.filter(F.expr(_WINDOW_FILTER)).select(
        F.col("event_id").alias("win_id"),
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"),
    )
    points = ev.filter(F.col("event_type") == "purchase")
    out = tj.bucketed_range_count(
        windows, points, win_id="win_id", key="user_id",
        start_col="start_ts", end_col="end_ts", ts_col="ts",
        value_col="value", bucket_seconds=3600,
    )
    return out.select(
        "win_id", "user_id", "start_ts", "end_ts", "n_in_range",
        (F.round(F.col("sum_value"), 4) + F.lit(0.0)).alias("sum_value"),
    )


@query(
    "timeseries_resample_daily_ffill",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             count(*) AS n, round(sum(value), 4) + 0.0 AS daily_sum
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ), b AS (
      SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id
    ), spine AS (
      SELECT user_id, CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
             CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
      FROM b
    )
    SELECT s.user_id, CAST(s.day AS TIMESTAMP) AS day,
           CAST(coalesce(d.n, 0) AS BIGINT) AS n_events,
           d.daily_sum,
           last_value(d.daily_sum IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried_sum
    FROM spine s LEFT JOIN daily d USING (user_id, day)
    """,
    category="temporal",
)
def timeseries_resample_daily_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily resample with date-spine gap fill (operators/temporal_joins.py
    resample_daily_ffill): per-user calendar-day aggregate, full day spine
    between each user's first and last day, forward-filled daily total
    across gap days — the distributed form of pandas
    ``resample('D').sum().ffill()`` (`preprocessing.py`'s reindex-ffill
    idiom). The spine explode runs on the aggregated (user × day) frame,
    never the raw events."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "value")
    out = tj.resample_daily_ffill(ev, key="user_id", ts_col="ts", value_col="value")
    # day re-cast to timestamp purely for cross-engine hash stability
    return out.select(
        "user_id", F.col("day").cast("timestamp").alias("day"),
        "n_events", "daily_sum", "carried_sum",
    )


@query(
    "join_asof_nearest",
    oracle=f"""
    WITH r AS (
      SELECT user_id, ts, value FROM events WHERE {_RIGHT_FILTER}
    ), bwd AS (
      SELECT e.event_id, e.user_id, e.ts, e.value,
             r.value AS bv, r.ts AS bts
      FROM events e ASOF LEFT JOIN r
        ON e.user_id = r.user_id AND e.ts >= r.ts
    ), fwd AS (
      SELECT e.event_id, r.value AS fv, r.ts AS fts
      FROM events e ASOF LEFT JOIN r
        ON e.user_id = r.user_id AND e.ts <= r.ts
    )
    SELECT b.event_id, b.user_id, b.ts, b.value,
           CASE WHEN b.bts IS NULL THEN f.fv
                WHEN f.fts IS NOT NULL
                     AND epoch_us(f.fts) - epoch_us(b.ts)
                         < epoch_us(b.ts) - epoch_us(b.bts)
                THEN f.fv ELSE b.bv END AS right_value,
           CASE WHEN b.bts IS NULL THEN f.fts
                WHEN f.fts IS NOT NULL
                     AND epoch_us(f.fts) - epoch_us(b.ts)
                         < epoch_us(b.ts) - epoch_us(b.bts)
                THEN f.fts ELSE b.bts END AS right_ts
    FROM bwd b JOIN fwd f USING (event_id)
    """,
    category="temporal",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join — each event takes the temporally closer of its
    backward/forward reference rows (ties backward, pandas
    ``merge_asof(direction='nearest')``). The Spark side computes both
    candidates in ONE union + window pass (the two frames share a sort and
    Exchange); the oracle composes two native DuckDB ASOF joins and picks
    per-row with exact integer-µs distances — independent formulations
    that must agree row-for-row."""
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    right = ev.filter(F.expr(_RIGHT_FILTER)).select("user_id", "ts", "value")
    out = tj.asof_join_nearest(
        ev, right, key="user_id", left_ts="ts", right_ts="ts", value_cols=["value"]
    )
    return out.select("event_id", "user_id", "ts", "value", "right_value", "right_ts")


@query(
    "join_asof_tolerance",
    oracle=f"""
    WITH r AS (
      SELECT user_id, ts, value FROM events WHERE {_RIGHT_FILTER}
    ), m AS (
      SELECT e.event_id, e.user_id, e.ts, e.value,
             r.value AS rv, r.ts AS rts
      FROM events e ASOF LEFT JOIN r
        ON e.user_id = r.user_id AND e.ts >= r.ts
    )
    SELECT event_id, user_id, ts, value,
           CASE WHEN epoch_us(ts) - epoch_us(rts) <= 1800000000 THEN rv
             END AS right_value,
           CASE WHEN epoch_us(ts) - epoch_us(rts) <= 1800000000 THEN rts
             END AS right_ts
    FROM m
    """,
    category="temporal",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join with a 30-minute staleness bound (pandas
    ``merge_asof(tolerance=...)``): a reference older than the bound is no
    match at all — the rule that keeps stale fundamentals from leaking
    into a feature join. Same single union + forward-fill pass as the
    unbounded form; the bound is a post-fill expression, so the plan (one
    key shuffle, no join node) is unchanged."""
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    right = ev.filter(F.expr(_RIGHT_FILTER)).select("user_id", "ts", "value")
    out = tj.asof_join_backward(
        ev, right, key="user_id", left_ts="ts", right_ts="ts",
        value_cols=["value"], tolerance=1800,
    )
    return out.select("event_id", "user_id", "ts", "value", "right_value", "right_ts")


@query(
    "events_funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS vts FROM events WHERE event_type = 'view'
      GROUP BY user_id
    ), c AS (
      SELECT e.user_id, min(e.ts) AS cts
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.vts
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, min(e.ts) AS pts
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.cts
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ), n AS (
      SELECT (SELECT count(*) FROM v) AS n1,
             (SELECT count(*) FROM c) AS n2,
             (SELECT count(*) FROM p) AS n3
    )
    SELECT 1 AS stage, 'view' AS event_type, n1 AS n_users,
           round(1.0, 6) + 0.0 AS conv_from_top FROM n
    UNION ALL
    SELECT 2, 'click', n2, round(n2 / CAST(n1 AS DOUBLE), 6) + 0.0 FROM n
    UNION ALL
    SELECT 3, 'purchase', n3, round(n3 / CAST(n1 AS DOUBLE), 6) + 0.0 FROM n
    """,
    category="temporal",
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase): a user advances a stage
    only with an event strictly AFTER their previous stage's first event.
    Each stage is one per-user min-aggregate joined to the (small) prior
    stage frame — at 100 TB the stage frames are |users| rows and only the
    stage-filtered event slices are scanned; no sessionization state, no
    window over raw events. The three funnel counts collapse to a 1-row
    frame unpivoted driver-free into the report shape."""
    ev = load(spark, sf_dir, "events")

    def first_after(etype: str, prev: DataFrame | None, prev_ts: str, out_ts: str) -> DataFrame:
        e = ev.filter(F.col("event_type") == etype).select("user_id", "ts")
        if prev is not None:
            e = e.join(prev, "user_id").filter(F.col("ts") > F.col(prev_ts))
        return e.groupBy("user_id").agg(F.min("ts").alias(out_ts))

    v = first_after("view", None, "", "vts")
    c = first_after("click", v, "vts", "cts")
    p = first_after("purchase", c, "cts", "pts")
    n = (
        v.agg(F.count(F.lit(1)).alias("n1"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n2")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n3")))
    )
    stages = n.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).alias("stage"), F.lit("view").alias("event_type"),
                    F.col("n1").alias("n_users"),
                    (F.round(F.lit(1.0), 6) + F.lit(0.0)).alias("conv_from_top"),
                ),
                F.struct(
                    F.lit(2).alias("stage"), F.lit("click").alias("event_type"),
                    F.col("n2").alias("n_users"),
                    rnd(F.col("n2") / F.col("n1").cast("double"), 6).alias("conv_from_top"),
                ),
                F.struct(
                    F.lit(3).alias("stage"), F.lit("purchase").alias("event_type"),
                    F.col("n3").alias("n_users"),
                    rnd(F.col("n3") / F.col("n1").cast("double"), 6).alias("conv_from_top"),
                ),
            )
        ).alias("r")
    )
    return stages.select("r.stage", "r.event_type", "r.n_users", "r.conv_from_top")


@query(
    "events_cohort_retention",
    oracle="""
    WITH act AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
    ), cohort AS (
      SELECT user_id, min(wk) AS cwk FROM act GROUP BY user_id
    ), m AS (
      SELECT c.cwk, CAST((epoch(a.wk) - epoch(c.cwk)) / 604800 AS BIGINT) AS offset_w,
             a.user_id
      FROM act a JOIN cohort c USING (user_id)
    ), counts AS (
      SELECT cwk, offset_w, count(DISTINCT user_id) AS n_users
      FROM m GROUP BY cwk, offset_w
    ), size0 AS (
      SELECT cwk, n_users AS cohort_size FROM counts WHERE offset_w = 0
    )
    SELECT CAST(c.cwk AS TIMESTAMP) AS cohort_week, c.offset_w, c.n_users,
           round(c.n_users / CAST(s.cohort_size AS DOUBLE), 6) + 0.0 AS retention
    FROM counts c JOIN size0 s USING (cwk)
    """,
    category="temporal",
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by first-active week,
    counted at each week offset, normalized by cohort size. The raw table
    reduces immediately to the distinct (user, week) activity grid — at
    100 TB that dedup is the only pass over events; cohorts, offsets, and
    the matrix all derive from the |users|-scale grid. Offsets are exact
    integer week arithmetic on truncated timestamps (both engines truncate
    to Monday)."""
    ev = load(spark, sf_dir, "events")
    act = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).distinct()
    cohort = act.groupBy("user_id").agg(F.min("wk").alias("cwk"))
    m = act.join(cohort, "user_id").select(
        "cwk",
        (
            (
                F.col("wk").cast("timestamp_ltz").cast("long")
                - F.col("cwk").cast("timestamp_ltz").cast("long")
            )
            / 604800
        )
        .cast("long")
        .alias("offset_w"),
        "user_id",
    )
    counts = m.groupBy("cwk", "offset_w").agg(
        F.countDistinct("user_id").alias("n_users")
    )
    size0 = counts.filter(F.col("offset_w") == 0).select(
        "cwk", F.col("n_users").alias("cohort_size")
    )
    return counts.join(F.broadcast(size0), "cwk").select(
        F.col("cwk").alias("cohort_week"),
        "offset_w",
        "n_users",
        rnd(F.col("n_users") / F.col("cohort_size").cast("double"), 6).alias(
            "retention"
        ),
    )


@query(
    "events_markov_transitions",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ), trans AS (
      SELECT prev_type, event_type AS next_type, count(*) AS n
      FROM ordered WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT prev_type, next_type,
           CAST(n AS BIGINT) AS n,
           round(n / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE), 6)
             + 0.0 AS prob
    FROM trans
    """,
    category="temporal",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user event streams — the
    product-analytics 'what happens next' model behind Sankey/path
    diagrams (and a text-free twin of the bigram LM): one lag window per
    user (full (ts, event_id) tie-break), one (prev, next) count, row
    probabilities from a partition-total window on the 25-cell matrix.
    The fact table is shuffled once on user_id; everything after operates
    on the |types|² frame."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    trans = (
        ordered.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wp = Window.partitionBy("prev_type")
    return trans.select(
        "prev_type",
        "next_type",
        F.col("n").cast("long").alias("n"),
        (
            F.round(F.col("n") / F.sum("n").over(wp).cast("double"), 6) + F.lit(0.0)
        ).alias("prob"),
    )


_FUNNEL_BOUND_US = 7 * 86400 * 1000000  # complete within 7 days


@query(
    "events_funnel_time_bound",
    oracle=f"""
    WITH lists AS (
      SELECT user_id,
             list(epoch_us(ts)) FILTER (WHERE event_type = 'view') AS vs,
             list(epoch_us(ts)) FILTER (WHERE event_type = 'click') AS cs,
             list(epoch_us(ts)) FILTER (WHERE event_type = 'purchase') AS ps
      FROM events GROUP BY user_id
    ), s1 AS (
      SELECT user_id, cs, ps, list_min(vs) AS f1 FROM lists
    ), s2 AS (
      SELECT user_id, ps, f1, list_min(list_filter(cs, t -> t > f1)) AS f2 FROM s1
    ), s3 AS (
      SELECT user_id, f1, f2, list_min(list_filter(ps, t -> t > f2)) AS f3 FROM s2
    )
    SELECT CAST(count(f1) AS BIGINT) AS n_view,
           CAST(count(f2) AS BIGINT) AS n_click_seq,
           CAST(count(f3) AS BIGINT) AS n_purchase_seq,
           CAST(sum(CASE WHEN f3 - f1 <= {_FUNNEL_BOUND_US} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_within_7d,
           round(sum(CASE WHEN f3 - f1 <= {_FUNNEL_BOUND_US} THEN 1 ELSE 0 END)
                 / nullif(CAST(count(f1) AS DOUBLE), 0.0), 6) + 0.0 AS completion_rate
    FROM s3
    """,
    category="temporal",
)
def events_funnel_time_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded ordered funnel (view → click → purchase, completed
    within 7 days) in the HOF-array execution shape: ONE groupBy collects
    each user's per-stage timestamp lists, and the sequential-minimum
    chain (first click after first view, first purchase after that) runs
    as pure array expressions — one shuffle total, where the join
    formulation (`events_funnel_conversion`) re-shuffles per stage. The
    known CollapseProject HOF-inlining cost is bounded here: lambdas close
    over a scalar min of a ~dozen-element list. Exact integer microsecond
    arithmetic on both engines (NTZ-safe epoch bridge)."""
    from etl_aws_spark.operators.temporal_joins import _epoch_micros

    ev = load(spark, sf_dir, "events")
    us = _epoch_micros("ts")
    lists = ev.groupBy("user_id").agg(
        F.collect_list(F.when(F.col("event_type") == "view", us)).alias("vs"),
        F.collect_list(F.when(F.col("event_type") == "click", us)).alias("cs"),
        F.collect_list(F.when(F.col("event_type") == "purchase", us)).alias("ps"),
    )
    s1 = lists.withColumn("f1", F.array_min("vs"))
    s2 = s1.withColumn("f2", F.expr("array_min(filter(cs, t -> t > f1))"))
    s3 = s2.withColumn("f3", F.expr("array_min(filter(ps, t -> t > f2))"))
    done = F.when(F.col("f3") - F.col("f1") <= _FUNNEL_BOUND_US, 1).otherwise(0)
    return s3.agg(
        F.count("f1").alias("n_view"),
        F.count("f2").alias("n_click_seq"),
        F.count("f3").alias("n_purchase_seq"),
        F.sum(done).cast("long").alias("n_within_7d"),
        (
            F.round(
                F.sum(done) / F.nullif(F.count("f1").cast("double"), F.lit(0.0)), 6
            )
            + F.lit(0.0)
        ).alias("completion_rate"),
    )


_ATTR_WINDOW_US = 7 * 86400 * 1000000  # 7-day lookback


@query(
    "events_attribution_multitouch",
    oracle=f"""
    WITH p AS (
      SELECT event_id AS p_id, user_id, epoch_us(ts) AS p_us, value
      FROM events WHERE event_type = 'purchase'
    ), t AS (
      SELECT user_id, event_id AS t_id, epoch_us(ts) AS t_us,
             event_type AS channel
      FROM events WHERE event_type IN ('view', 'click')
    ), cand AS (
      SELECT p.p_id, p.value, t.channel,
             row_number() OVER (PARTITION BY p.p_id
                                ORDER BY t.t_us DESC, t.t_id DESC) AS rk,
             count(*) OVER (PARTITION BY p.p_id) AS n
      FROM p JOIN t ON p.user_id = t.user_id
       AND t.t_us < p.p_us AND t.t_us >= p.p_us - {_ATTR_WINDOW_US}
    ), weighted AS (
      SELECT channel, value,
             CASE WHEN rk = 1 THEN 1.0 ELSE 0.0 END AS w_last,
             1.0 / n AS w_linear,
             power(2.0, CAST(1 - rk AS DOUBLE))
               / (2.0 - power(2.0, CAST(1 - n AS DOUBLE))) AS w_decay
      FROM cand
    ), attributed AS (
      SELECT channel,
             CAST(count(*) AS BIGINT) AS n_touches,
             round(sum(value * w_last), 4) + 0.0 AS rev_last,
             round(sum(value * w_linear), 4) + 0.0 AS rev_linear,
             round(sum(value * w_decay), 4) + 0.0 AS rev_decay
      FROM weighted GROUP BY channel
    ), direct AS (
      SELECT 'direct' AS channel,
             CAST(count(*) AS BIGINT) AS n_touches,
             round(sum(value), 4) + 0.0 AS rev_last,
             round(sum(value), 4) + 0.0 AS rev_linear,
             round(sum(value), 4) + 0.0 AS rev_decay
      FROM p WHERE NOT EXISTS (
        SELECT 1 FROM t WHERE t.user_id = p.user_id
          AND t.t_us < p.p_us AND t.t_us >= p.p_us - {_ATTR_WINDOW_US})
      HAVING count(*) > 0
    )
    SELECT * FROM attributed UNION ALL SELECT * FROM direct
    """,
    category="temporal",
)
def events_attribution_multitouch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch marketing attribution: every purchase's revenue is
    credited to the user's view/click touches in the prior 7 days under
    THREE models at once — last-touch (full credit to the latest touch),
    linear (1/n each), and position-decay (weight halves per step away
    from the conversion, normalized by the exact geometric total
    2 − 2^(1−n)). Purchases with no in-window touch report as 'direct'.

    The decay weight is a power of two with an INTEGER exponent — IEEE-
    exact on both engines, no transcendental in the hash path (the same
    trick as `agg_time_decay_score`). Scale shape: the touch join is a
    user_id EQUI-join with a residual µs range filter (never a range-only
    theta join), so it shuffles on user_id once; the per-purchase rank
    windows ride the same partitioning, and everything after the weighted
    projection is a 5-channel aggregate. Reference analogue: none —
    extension tier (event analytics over the events fixture)."""
    from pyspark.sql import Window

    from etl_aws_spark.operators.temporal_joins import _epoch_micros

    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        _epoch_micros("ts").alias("p_us"),
        "value",
    )
    t = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("event_id").alias("t_id"),
        _epoch_micros("ts").alias("t_us"),
        F.col("event_type").alias("channel"),
    )
    in_window = (F.col("t_us") < F.col("p_us")) & (
        F.col("t_us") >= F.col("p_us") - F.lit(_ATTR_WINDOW_US)
    )
    cand = p.join(t, "user_id").where(in_window)
    wr = Window.partitionBy("p_id").orderBy(F.desc("t_us"), F.desc("t_id"))
    wn = Window.partitionBy("p_id")
    weighted = cand.select(
        "channel",
        "value",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    ).select(
        "channel",
        "value",
        F.when(F.col("rk") == 1, 1.0).otherwise(0.0).alias("w_last"),
        (F.lit(1.0) / F.col("n")).alias("w_linear"),
        (
            F.pow(F.lit(2.0), (F.lit(1) - F.col("rk")).cast("double"))
            / (F.lit(2.0) - F.pow(F.lit(2.0), (F.lit(1) - F.col("n")).cast("double")))
        ).alias("w_decay"),
    )
    attributed = weighted.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        rnd(F.sum(F.col("value") * F.col("w_last"))).alias("rev_last"),
        rnd(F.sum(F.col("value") * F.col("w_linear"))).alias("rev_linear"),
        rnd(F.sum(F.col("value") * F.col("w_decay"))).alias("rev_decay"),
    )
    touched = cand.select("p_id").distinct()
    direct = (
        p.join(touched, "p_id", "left_anti")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_touches"),
            rnd(F.sum("value")).alias("rev_last"),
            rnd(F.sum("value")).alias("rev_linear"),
            rnd(F.sum("value")).alias("rev_decay"),
        )
        .where(F.col("n_touches") > 0)
        .select(F.lit("direct").alias("channel"), "n_touches", "rev_last", "rev_linear", "rev_decay")
    )
    return attributed.unionByName(direct)


_GAP_THRESHOLD_US = 3600 * 1000000  # 1-hour SLA


@query(
    "timeseries_gap_report",
    oracle=f"""
    WITH gaps AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    SELECT user_id,
           CAST(count(gap_us) AS BIGINT) AS n_intervals,
           CAST(count(*) FILTER (WHERE gap_us > {_GAP_THRESHOLD_US})
                AS BIGINT) AS n_gaps_over_1h,
           CAST(max(gap_us) AS BIGINT) AS max_gap_us,
           CAST(coalesce(sum(gap_us)
                  FILTER (WHERE gap_us > {_GAP_THRESHOLD_US}), 0)
                AS BIGINT) AS downtime_us,
           round(CAST(sum(gap_us) AS DOUBLE) / count(gap_us) / 1e6
                 + sign(CAST(sum(gap_us) AS DOUBLE) / count(gap_us) / 1e6)
                   * 1e-9, 4) + 0.0 AS mean_gap_s
    FROM gaps GROUP BY user_id
    """,
    category="temporal",
)
def timeseries_gap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series gap/SLA report: inter-arrival gaps from one lag window
    per user, then counts and durations of gaps over the 1-hour threshold
    plus the max and mean inter-arrival — the monitoring query behind
    'did this feed stall'. Exact integer-µs arithmetic end to end (the
    mean's integer-sum/count division is bit-identical cross-engine);
    one user_id shuffle serves both the window and the rollup."""
    from pyspark.sql import Window

    from etl_aws_spark.operators.temporal_joins import _epoch_micros

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = _epoch_micros("ts")
    gaps = ev.select(
        "user_id", (us - F.lag(us).over(w)).alias("gap_us")
    )
    over = F.col("gap_us") > _GAP_THRESHOLD_US
    return gaps.groupBy("user_id").agg(
        F.count("gap_us").cast("long").alias("n_intervals"),
        F.count(F.when(over, 1)).cast("long").alias("n_gaps_over_1h"),
        F.max("gap_us").cast("long").alias("max_gap_us"),
        F.coalesce(F.sum(F.when(over, F.col("gap_us"))), F.lit(0))
        .cast("long")
        .alias("downtime_us"),
        # exact int64 sum, ONE double division, reported in SECONDS: at µs
        # magnitude (~4e10) the 1e-9 half-boundary nudge is below one ulp,
        # so the bridge only works after rescaling to O(1e4)
        rnd_nudged(
            F.sum("gap_us").cast("double") / F.count("gap_us") / F.lit(1e6)
        ).alias("mean_gap_s"),
    )


@query(
    "events_path_trigrams_topk",
    oracle=f"""
    WITH o AS (
      SELECT user_id, event_type,
             lag(event_type, 1) OVER (PARTITION BY user_id
                                      ORDER BY {EVENTS_ORDER_SQL}) AS p1,
             lag(event_type, 2) OVER (PARTITION BY user_id
                                      ORDER BY {EVENTS_ORDER_SQL}) AS p2
      FROM events
    ), tri AS (
      SELECT p2 AS step1, p1 AS step2, event_type AS step3, count(*) AS n
      FROM o WHERE p2 IS NOT NULL
      GROUP BY 1, 2, 3
    ), tot AS (
      SELECT CAST(sum(n) AS DOUBLE) AS t FROM tri
    )
    SELECT step1, step2, step3, CAST(n AS BIGINT) AS n,
           round(n / tot.t, 6) + 0.0 AS share
    FROM (
      SELECT *, row_number() OVER (ORDER BY n DESC, step1, step2, step3)
               AS rk
      FROM tri
    ) r CROSS JOIN tot
    WHERE rk <= 20
    """,
    category="temporal",
)
def events_path_trigrams_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common 3-step user journeys (event-type trigrams) with their
    corpus share — the path-mining rollup behind Sankey 'top flows'
    views, extending the first-order `events_markov_transitions` to
    third order. One user_id window pass emits both lags, the trigram
    aggregate reduces to ≤|types|³ cells (125 here) BEFORE the global
    top-20 rank, and the rank window therefore runs on a dimension-sized
    frame — the aggregate-before-global-sort posture again. Full
    (count, lexicographic) tie-break keeps the cut deterministic."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        F.col("event_type").alias("step3"),
        F.lag("event_type", 1).over(w).alias("step2"),
        F.lag("event_type", 2).over(w).alias("step1"),
    )
    tri = (
        o.filter(F.col("step1").isNotNull())
        .groupBy("step1", "step2", "step3")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = tri.agg(F.sum("n").cast("double").alias("t"))
    wr = Window.orderBy(F.desc("n"), "step1", "step2", "step3")
    return (
        tri.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= 20)
        .crossJoin(F.broadcast(tot))
        .select(
            "step1", "step2", "step3",
            F.col("n").cast("long").alias("n"),
            rnd(F.col("n") / F.col("t"), 6).alias("share"),
        )
    )


@query(
    "events_attribution_window_sweep",
    # the sweep shares ONE candidate join at the widest window: a
    # (purchase, touch) pair within 1d is also within 3d and 7d, so
    # conditional sums produce every bound from the same candidates
    oracle="""
    WITH p AS (
      SELECT event_id AS p_id, user_id, epoch_us(ts) AS p_us, value
      FROM events WHERE event_type = 'purchase'
    ), t AS (
      SELECT user_id, epoch_us(ts) AS t_us
      FROM events WHERE event_type IN ('view', 'click')
    ), cand AS (
      SELECT p.p_id, p.value,
             min(p.p_us - t.t_us) AS nearest_us
      FROM p JOIN t ON p.user_id = t.user_id
       AND t.t_us < p.p_us AND t.t_us >= p.p_us - 604800000000
      GROUP BY p.p_id, p.value
    ), tot AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_purch,
             sum(value) AS rev_total
      FROM p
    )
    SELECT w.days AS window_days,
           CAST(count(CASE WHEN c.nearest_us <= w.days * 86400000000
                           THEN 1 END) AS BIGINT) AS n_attributed,
           round(count(CASE WHEN c.nearest_us <= w.days * 86400000000
                            THEN 1 END) / tot.n_purch, 6) + 0.0
             AS attributed_rate,
           round(coalesce(sum(CASE WHEN c.nearest_us <= w.days * 86400000000
                                   THEN c.value END), 0.0), 4) + 0.0
             AS attributed_revenue
    FROM (SELECT unnest([1, 3, 7]) AS days) w
    CROSS JOIN tot
    LEFT JOIN cand c ON true
    GROUP BY w.days, tot.n_purch
    """,
    category="temporal",
)
def events_attribution_window_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution-window SENSITIVITY sweep (1 / 3 / 7 days): how many
    purchases — and how much revenue — get credited to a prior touch
    under each lookback, the knob analysis that decides the window
    BEFORE `events_attribution_multitouch` locks it in (the recall-curve
    harness pattern, applied to attribution). ONE candidate join at the
    WIDEST window serves every bound: each purchase keeps only its
    NEAREST-touch age, and per-window attribution is a conditional count
    over that |purchases|-sized frame — three windows cost one join,
    not three."""
    from etl_aws_spark.operators.temporal_joins import _epoch_micros

    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        _epoch_micros("ts").alias("p_us"),
        "value",
    )
    t = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id", _epoch_micros("ts").alias("t_us")
    )
    widest = 7 * 86400000000
    cand = (
        p.join(t, "user_id")
        .where(
            (F.col("t_us") < F.col("p_us"))
            & (F.col("t_us") >= F.col("p_us") - F.lit(widest))
        )
        .groupBy("p_id", "value")
        .agg(F.min(F.col("p_us") - F.col("t_us")).alias("nearest_us"))
    )
    tot = p.agg(
        F.count(F.lit(1)).cast("double").alias("n_purch"),
        F.sum("value").alias("rev_total"),
    )
    windows = spark.createDataFrame([(1,), (3,), (7,)], "days int")
    within = F.col("nearest_us") <= F.col("days").cast("long") * 86400000000
    return (
        windows.crossJoin(F.broadcast(tot))
        .join(cand, F.lit(True), "left")
        .groupBy(F.col("days").alias("window_days"), "n_purch")
        .agg(
            F.count(F.when(within, 1)).cast("long").alias("n_attributed"),
            (
                F.round(F.count(F.when(within, 1)) / F.col("n_purch"), 6)
                + F.lit(0.0)
            ).alias("attributed_rate"),
            (
                F.round(
                    F.coalesce(F.sum(F.when(within, F.col("value"))), F.lit(0.0)), 4
                )
                + F.lit(0.0)
            ).alias("attributed_revenue"),
        )
        .select("window_days", "n_attributed", "attributed_rate", "attributed_revenue")
    )


@query(
    "events_new_vs_returning_daily",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, min(date_trunc('day', ts)) AS first_day FROM events
      GROUP BY user_id
    ), daily AS (
      SELECT date_trunc('day', e.ts) AS day, e.user_id,
             CASE WHEN date_trunc('day', e.ts) = f.first_day
                  THEN 1 ELSE 0 END AS is_new
      FROM events e JOIN first_seen f USING (user_id)
      GROUP BY 1, 2, 3
    )
    SELECT CAST(day AS TIMESTAMP) AS day,
           CAST(sum(is_new) AS BIGINT) AS n_new,
           CAST(sum(1 - is_new) AS BIGINT) AS n_returning,
           round(sum(1 - is_new) / CAST(count(*) AS DOUBLE), 6) + 0.0
             AS returning_share
    FROM daily GROUP BY day
    """,
    category="temporal",
)
def events_new_vs_returning_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-vs-returning daily active users — the growth-accounting split
    every product dashboard leads with: each user's first-seen day comes
    from one min-aggregate, the (day, user) activity grid reduces the
    fact table BEFORE labeling, and the daily rollup counts both
    populations plus the returning share. Two keyed aggregates + one
    broadcastable first-seen join; at 100 TB the first-seen table is the
    |users| dimension that incremental pipelines maintain as state
    (`incremental_state_merge`'s shape) instead of re-deriving."""
    ev = load(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("first_day")
    )
    daily = (
        ev.select("user_id", F.date_trunc("day", "ts").alias("day"))
        .distinct()
        .join(F.broadcast(first_seen), "user_id")
        .select(
            "day",
            F.when(F.col("day") == F.col("first_day"), 1).otherwise(0).alias("is_new"),
        )
    )
    return daily.groupBy("day").agg(
        F.sum("is_new").cast("long").alias("n_new"),
        F.sum(F.lit(1) - F.col("is_new")).cast("long").alias("n_returning"),
        (
            F.round(
                F.sum(F.lit(1) - F.col("is_new")) / F.count(F.lit(1)).cast("double"),
                6,
            )
            + F.lit(0.0)
        ).alias("returning_share"),
    )


@query(
    "events_interarrival_exponential_fit",
    # gaps are µs-exact integers (the window_time_weighted_avg bridge); the
    # MLE rate is a ratio of exact ints; each KS term is pre-rounded before
    # the max so the statistic is engine-deterministic.
    oracle="""
    WITH g AS (
      SELECT epoch_us(lead(ts) OVER (PARTITION BY user_id
               ORDER BY ts, event_id)) - epoch_us(ts) AS gap_us
      FROM events
    ), gaps AS (SELECT gap_us FROM g WHERE gap_us IS NOT NULL AND gap_us > 0),
    m AS (
      SELECT count(*) AS n, sum(gap_us) AS total_us,
             CAST(count(*) AS DOUBLE) / sum(gap_us) AS lam
      FROM gaps
    ), h AS (
      SELECT gap_us, count(*) AS c FROM gaps GROUP BY gap_us
    ), cum AS (
      SELECT gap_us, sum(c) OVER (ORDER BY gap_us) AS cum_n FROM h
    ), ks AS (
      SELECT max(round(abs(CAST(cum_n AS DOUBLE) / m.n
                           - (1.0 - exp(-m.lam * gap_us))), 6) + 0.0) AS ks_stat
      FROM cum CROSS JOIN m
    )
    SELECT CAST(m.n AS BIGINT) AS n_gaps,
           round(m.total_us / m.n / 1000000.0e0, 4) + 0.0 AS mean_gap_seconds,
           round(m.lam * 3600000000.0e0, 6) + 0.0 AS rate_per_hour,
           round(ks.ks_stat, 6) + 0.0 AS ks_vs_exponential
    FROM m CROSS JOIN ks
    """,
    category="temporal",
)
def events_interarrival_exponential_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrival-process audit: per-user inter-event gaps fitted to an
    exponential (Poisson-process) model — MLE rate λ = n/Σgap — with the
    Kolmogorov-Smirnov distance between the empirical gap CDF and the
    fitted exponential as the burstiness verdict (real user traffic is
    bursty: KS far above the ~1.36/√n acceptance band is the expected
    finding, and the input to capacity/sessionization decisions like
    `window_sessionize`'s gap threshold).

    Shape: one lead() window for gaps (µs-exact integers), then the KS
    scan runs over the |distinct gap values| frame with a single cumulative
    window — the `stat_ks_two_sample` histogram trick against a CLOSED-FORM
    reference CDF instead of a second sample. exp() terms are pre-rounded
    before the max, so the statistic is engine-deterministic."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        (
            F.unix_micros(F.lead("ts").over(w).cast("timestamp"))
            - F.unix_micros(F.col("ts").cast("timestamp"))
        ).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull() & (F.col("gap_us") > 0))
    m = g.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("gap_us").alias("total_us"),
        (F.count(F.lit(1)).cast("double") / F.sum("gap_us")).alias("lam"),
    )
    h = g.groupBy("gap_us").agg(F.count(F.lit(1)).alias("c"))
    # µs gaps are nearly all distinct, so the empirical-CDF running count
    # is computed with the bucketed two-phase cumsum (`_util
    # .bucketed_cumsum`): per-second subtotals cumulate in the only
    # unpartitioned window (bounded by the TIME domain), within-second
    # counts cumulate partitioned by second — exact integers, identical
    # to the global window
    from etl_aws_spark.suite._util import bucketed_cumsum

    cum = bucketed_cumsum(
        h, "gap_us", "c", F.expr("gap_us div 1000000"), out_cols="cum_n"
    )
    ks = cum.crossJoin(F.broadcast(m)).agg(
        F.max(
            F.round(
                F.abs(
                    F.col("cum_n").cast("double") / F.col("n")
                    - (F.lit(1.0) - F.exp(-F.col("lam") * F.col("gap_us")))
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("ks_stat")
    )
    return m.crossJoin(F.broadcast(ks)).select(
        F.col("n").cast("long").alias("n_gaps"),
        rnd(F.col("total_us") / F.col("n") / F.lit(1000000.0), 4).alias(
            "mean_gap_seconds"
        ),
        rnd(F.col("lam") * F.lit(3600000000.0), 6).alias("rate_per_hour"),
        rnd(F.col("ks_stat"), 6).alias("ks_vs_exponential"),
    )


@query(
    "events_bot_traffic_audit",
    # entropy terms are nudge-rounded pre-sum (the PSI/MI pattern); gaps
    # are µs-exact; thresholds are literals. The fixture's synthetic users
    # are uniform-ish — 'human-like' verdicts everywhere are the expected
    # finding; the machinery is the product (stat_benford's posture).
    oracle="""
    WITH g AS (
      SELECT user_id,
             epoch_us(lead(ts) OVER (PARTITION BY user_id
               ORDER BY ts, event_id)) - epoch_us(ts) AS gap_us
      FROM events
    ), gaps AS (
      SELECT user_id,
             count(*) AS n_events,
             sum(CASE WHEN gap_us IS NOT NULL AND gap_us < 1000000
                      THEN 1 ELSE 0 END) AS n_subsecond,
             min(gap_us) AS min_gap_us
      FROM g GROUP BY user_id
    ), tc AS (
      SELECT user_id, event_type, count(*) AS c FROM events
      GROUP BY user_id, event_type
    ), tn AS (
      SELECT user_id, sum(c) AS n FROM tc GROUP BY user_id
    ), ent AS (
      SELECT tc.user_id,
             sum(round(-(CAST(tc.c AS DOUBLE) / tn.n) * ln(CAST(tc.c AS DOUBLE) / tn.n)
                 + sign(-(CAST(tc.c AS DOUBLE) / tn.n) * ln(CAST(tc.c AS DOUBLE) / tn.n)) * 1e-9, 6)
                 + 0.0) AS type_entropy
      FROM tc JOIN tn USING (user_id) GROUP BY tc.user_id
    )
    SELECT CAST(gaps.user_id AS BIGINT) AS user_id,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(n_subsecond AS BIGINT) AS n_subsecond_gaps,
           CAST(min_gap_us AS BIGINT) AS min_gap_us,
           round(ent.type_entropy, 6) + 0.0 AS type_entropy,
           CAST(n_subsecond * 10 > n_events OR ent.type_entropy < 0.5 AS INT)
             AS bot_suspect
    FROM gaps JOIN ent ON ent.user_id = gaps.user_id
    """,
    category="temporal",
)
def events_bot_traffic_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot-traffic screen per user — the standard pre-training-data traffic
    cleaning pass: sub-second inter-event gap share and minimum gap
    (machines burst; humans cannot), plus event-type Shannon entropy
    (single-action scripts have near-zero behavioral entropy), folded into
    a rule verdict (>10% sub-second gaps OR entropy < 0.5 nats). Joins the
    audit family (`stat_benford_first_digit` for fabricated numbers, this
    for fabricated behavior).

    Shape: one lead() window for gaps (µs-exact) and one (user, type)
    aggregate for the entropy — the fact log is scanned twice at most,
    both map-side combined; output is |users| rows. Entropy terms are
    nudge-rounded before summation so the float path is engine-exact."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id",
        (
            F.unix_micros(F.lead("ts").over(w).cast("timestamp"))
            - F.unix_micros(F.col("ts").cast("timestamp"))
        ).alias("gap_us"),
    )
    gaps = g.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.when(F.col("gap_us").isNotNull() & (F.col("gap_us") < 1000000), 1)
            .otherwise(0)
        ).alias("n_subsecond"),
        F.min("gap_us").alias("min_gap_us"),
    )
    tc = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    tn = tc.groupBy("user_id").agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    term = -p * F.log(p)
    ent = (
        tc.join(tn, "user_id")
        .groupBy("user_id")
        .agg(
            F.sum(F.round(term + F.signum(term) * F.lit(1e-9), 6) + F.lit(0.0)).alias(
                "type_entropy"
            )
        )
    )
    return gaps.join(ent, "user_id").select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("n_events").cast("long").alias("n_events"),
        F.col("n_subsecond").cast("long").alias("n_subsecond_gaps"),
        F.col("min_gap_us").cast("long").alias("min_gap_us"),
        rnd(F.col("type_entropy"), 6).alias("type_entropy"),
        (
            (F.col("n_subsecond") * 10 > F.col("n_events"))
            | (F.col("type_entropy") < 0.5)
        )
        .cast("int")
        .alias("bot_suspect"),
    )


@query(
    "events_markov_prediction_accuracy",
    # temporal 80/20 split per user (row_number vs per-user count — integer
    # arithmetic, no sampling); transitions trained on the TRAIN prefix
    # only; argmax prediction with (count desc, next_type asc) tie-break.
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER w AS prev_type,
             row_number() OVER w AS rn,
             count(*) OVER (PARTITION BY user_id) AS n_u
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), tagged AS (
      SELECT *, CAST(rn * 5 <= n_u * 4 AS INT) AS is_train FROM ordered
    ), trans AS (
      SELECT prev_type, event_type AS next_type, count(*) AS n
      FROM tagged WHERE prev_type IS NOT NULL AND is_train = 1
      GROUP BY 1, 2
    ), model AS (
      SELECT prev_type, next_type FROM (
        SELECT prev_type, next_type,
               row_number() OVER (PARTITION BY prev_type
                                  ORDER BY n DESC, next_type ASC) AS r
        FROM trans
      ) WHERE r = 1
    ), test AS (
      SELECT t.prev_type, t.event_type AS actual, m.next_type AS predicted
      FROM tagged t JOIN model m ON m.prev_type = t.prev_type
      WHERE t.is_train = 0 AND t.prev_type IS NOT NULL
    )
    SELECT prev_type,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(sum(CASE WHEN predicted = actual THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct,
           round(CAST(sum(CASE WHEN predicted = actual THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) + 0.0 AS accuracy,
           min(predicted) AS predicted_next
    FROM test GROUP BY prev_type
    """,
    category="temporal",
)
def events_markov_prediction_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-event prediction probe: the first-order Markov model of
    `events_markov_transitions` trained on each user's FIRST 80% of events
    (temporal split — no leakage) and evaluated by argmax accuracy on the
    held-out 20%, per previous-event state. The end-task eval that turns
    the transition matrix from a dashboard into a measured model — near-
    uniform fixture traffic must score ≈1/|types|, which is exactly the
    honest baseline reading (the kNN-probe posture, applied to behavior).

    Shape: one user-partition window pass tags prefix/holdout with integer
    arithmetic; training counts and the argmax model live on the |types|²
    frame and broadcast back to the test rows. The fact table shuffles
    once on user_id."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n_u"),
    )
    tagged = ordered.withColumn(
        "is_train", (F.col("rn") * 5 <= F.col("n_u") * 4).cast("int")
    )
    trans = (
        tagged.filter(F.col("prev_type").isNotNull() & (F.col("is_train") == 1))
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wm = Window.partitionBy("prev_type").orderBy(F.desc("n"), F.asc("next_type"))
    model = (
        trans.withColumn("r", F.row_number().over(wm))
        .filter(F.col("r") == 1)
        .select("prev_type", F.col("next_type").alias("predicted"))
    )
    test = (
        tagged.filter(F.col("prev_type").isNotNull() & (F.col("is_train") == 0))
        .join(F.broadcast(model), "prev_type")
        .select("prev_type", F.col("event_type").alias("actual"), "predicted")
    )
    return test.groupBy("prev_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.sum(F.when(F.col("predicted") == F.col("actual"), 1).otherwise(0))
        .cast("long")
        .alias("n_correct"),
        rnd(
            F.sum(F.when(F.col("predicted") == F.col("actual"), 1).otherwise(0))
            .cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("accuracy"),
        F.min("predicted").alias("predicted_next"),
    )


@query(
    "events_retention_half_life",
    # retention rates are exact integer ratios on the (age)-day frame;
    # the exponential fit ln r = a·slope + icept is OLS moments over ≤
    # |days| points (age 0 == 1.0 by definition is excluded — it carries
    # no decay information and ln 1 = 0 would bias the intercept).
    oracle="""
    WITH firsts AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT e.user_id,
             datediff('day', f.d0, CAST(e.ts AS DATE)) AS age
      FROM events e JOIN firsts f USING (user_id)
    ), cohort AS (SELECT count(*) AS n_users FROM firsts),
    curve AS (
      SELECT age, count(*) AS n_active FROM activity GROUP BY age
    ), pts AS (
      SELECT CAST(age AS DOUBLE) AS x,
             ln(CAST(n_active AS DOUBLE) / cohort.n_users) AS y
      FROM curve CROSS JOIN cohort WHERE age > 0
    ), mom AS (
      SELECT count(*) AS n_pts, avg(x) AS mx, avg(y) AS my,
             avg(x * y) AS mxy, avg(x * x) AS mxx, avg(y * y) AS myy
      FROM pts
    ), fit AS (
      SELECT n_pts,
             (mxy - mx * my) / (mxx - mx * mx) AS slope,
             (mxy - mx * my) * (mxy - mx * my)
               / ((mxx - mx * mx) * (myy - my * my)) AS r2
      FROM mom
    )
    SELECT CAST(cohort.n_users AS BIGINT) AS n_users,
           CAST(fit.n_pts AS BIGINT) AS n_curve_points,
           round(fit.slope, 6) + 0.0 AS daily_log_decay,
           round(-0.6931471805599453e0 / fit.slope, 4) + 0.0 AS half_life_days,
           round(fit.r2, 6) + 0.0 AS r_squared
    FROM fit CROSS JOIN cohort
    """,
    category="temporal",
)
def events_retention_half_life(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention half-life: the whole-population retention curve (share of
    users active at age a days since their first event) fitted to
    exponential decay r(a) = e^{slope·a} — half-life = ln2/|slope|, the
    single number a growth model plugs into LTV math, distilled from the
    grid `events_cohort_retention` reports. r² says whether exponential
    decay even fits (synthetic always-on fixture users decay barely — a
    near-flat curve with the fit machinery verified is the honest
    reading).

    Shape: the corpus collapses to the DISTINCT (user, age) frame in one
    shuffle (map-side combined), the curve to ≤ |days| rows, and the fit
    is closed-form moments — the Heaps/power-law OLS pattern on a
    temporal curve."""
    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d0"))
    activity = (
        ev.join(firsts, "user_id")
        .select("user_id", F.datediff(F.to_date("ts"), F.col("d0")).alias("age"))
        .distinct()
    )
    cohort = firsts.agg(F.count(F.lit(1)).alias("n_users"))
    curve = activity.groupBy("age").agg(F.count(F.lit(1)).alias("n_active"))
    pts = (
        curve.crossJoin(F.broadcast(cohort))
        .filter(F.col("age") > 0)
        .select(
            F.col("age").cast("double").alias("x"),
            F.log(F.col("n_active").cast("double") / F.col("n_users")).alias("y"),
        )
    )
    mom = pts.agg(
        F.count(F.lit(1)).alias("n_pts"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.avg(F.col("x") * F.col("y")).alias("mxy"),
        F.avg(F.col("x") * F.col("x")).alias("mxx"),
        F.avg(F.col("y") * F.col("y")).alias("myy"),
    )
    slope = (F.col("mxy") - F.col("mx") * F.col("my")) / (
        F.col("mxx") - F.col("mx") * F.col("mx")
    )
    fit = mom.select(
        "n_pts",
        slope.alias("slope"),
        (
            (F.col("mxy") - F.col("mx") * F.col("my"))
            * (F.col("mxy") - F.col("mx") * F.col("my"))
            / (
                (F.col("mxx") - F.col("mx") * F.col("mx"))
                * (F.col("myy") - F.col("my") * F.col("my"))
            )
        ).alias("r2"),
    )
    return fit.crossJoin(F.broadcast(cohort)).select(
        F.col("n_users").cast("long").alias("n_users"),
        F.col("n_pts").cast("long").alias("n_curve_points"),
        rnd(F.col("slope"), 6).alias("daily_log_decay"),
        rnd(F.lit(-0.6931471805599453) / F.col("slope"), 4).alias("half_life_days"),
        rnd(F.col("r2"), 6).alias("r_squared"),
    )


@query(
    "events_attribution_shapley",
    # coalition values are exact conversion-rate ratios on the ≤2^|channels|
    # observed-set cells; unobserved coalitions (and the empty set) carry
    # v=0 — the standard observed-coalition simplification. Per-cell terms
    # are pre-rounded before the channel sum (the PSI/MI pattern).
    oracle="""
    WITH conv AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'purchase' AND value > 150
                      THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY user_id
    ), touches AS (
      SELECT DISTINCT user_id, event_type AS channel
      FROM events WHERE event_type <> 'purchase'
    ), usets AS (
      SELECT t.user_id,
             list_sort(list(t.channel)) AS chans,
             array_to_string(list_sort(list(t.channel)), ',') AS set_key
      FROM touches t GROUP BY t.user_id
    ), cells AS (
      SELECT u.set_key, any_value(u.chans) AS chans,
             count(*) AS n_users, sum(c.conv) AS n_conv,
             CAST(sum(c.conv) AS DOUBLE) / count(*) AS v
      FROM usets u JOIN conv c USING (user_id)
      GROUP BY u.set_key
    ), expanded AS (
      SELECT cells.set_key, cells.v, len(cells.chans) AS sz,
             ch.channel,
             array_to_string(list_filter(cells.chans, x -> x <> ch.channel), ',')
               AS minus_key
      FROM cells, unnest(cells.chans) AS ch(channel)
    ), terms AS (
      SELECT e.channel,
             round((e.v - coalesce(m.v, 0.0)) / e.sz, 8) + 0.0 AS term
      FROM expanded e LEFT JOIN cells m ON m.set_key = e.minus_key
    )
    SELECT channel,
           CAST(count(*) AS BIGINT) AS n_coalitions,
           round(sum(term), 6) + 0.0 AS shapley_value
    FROM terms GROUP BY channel
    """,
    category="temporal",
)
def events_attribution_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley-value channel attribution (the game-theoretic upgrade of
    `events_attribution_multitouch`'s rule-based credits): each user's
    distinct touch channels form a coalition, v(S) = that coalition's
    conversion rate (purchase > 150), and each channel's value is
    Σ_{S∋c} (v(S) − v(S∖c))/|S| over OBSERVED coalitions (unobserved and
    empty coalitions carry v=0 — the standard data-driven simplification
    of exact Shapley, which needs all 2^n cells). Negative values are
    meaningful: a channel whose presence lowers coalition conversion.

    Shape: the corpus collapses to per-user (coalition, conv) in one
    distinct + one aggregate; everything after lives on ≤ 2^|channels|
    cells (16 here) — the marginal-contribution join is cell-to-cell on
    the removed-channel key. Per-cell terms pre-round before the channel
    sum so the float path is engine-exact."""
    ev = load(spark, sf_dir, "events")
    conv = ev.groupBy("user_id").agg(
        F.max(
            F.when((F.col("event_type") == "purchase") & (F.col("value") > 150), 1)
            .otherwise(0)
        ).alias("conv")
    )
    touches = (
        ev.filter(F.col("event_type") != "purchase")
        .select("user_id", F.col("event_type").alias("channel"))
        .distinct()
    )
    usets = touches.groupBy("user_id").agg(
        F.array_sort(F.collect_set("channel")).alias("chans")
    ).withColumn("set_key", F.array_join("chans", ","))
    cells = (
        usets.join(conv, "user_id")
        .groupBy("set_key")
        .agg(
            F.first("chans").alias("chans"),
            F.count(F.lit(1)).alias("n_users"),
            F.sum("conv").alias("n_conv"),
        )
        .withColumn("v", F.col("n_conv").cast("double") / F.col("n_users"))
    )
    expanded = cells.select(
        "set_key",
        "v",
        F.size("chans").alias("sz"),
        F.explode("chans").alias("channel"),
        "chans",
    ).withColumn(
        "minus_key", F.array_join(F.array_remove("chans", F.col("channel")), ",")
    )
    minus = cells.select(
        F.col("set_key").alias("minus_key"), F.col("v").alias("v_minus")
    )
    terms = expanded.join(F.broadcast(minus), "minus_key", "left").select(
        "channel",
        (
            F.round(
                (F.col("v") - F.coalesce("v_minus", F.lit(0.0))) / F.col("sz"), 8
            )
            + F.lit(0.0)
        ).alias("term"),
    )
    return terms.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_coalitions"),
        rnd(F.sum("term"), 6).alias("shapley_value"),
    )


@query(
    "events_transition_entropy_per_user",
    # per-user behavioral predictability: Shannon entropy of the user's
    # own (prev -> next) transition distribution, each ln term
    # nudge-rounded BEFORE the per-user sum folds in (prev, next) order —
    # the stat_mutual_information determinism recipe on a per-user frame.
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ), cells AS (
      SELECT user_id, prev_type, event_type AS next_type, count(*) AS n
      FROM ordered WHERE prev_type IS NOT NULL
      GROUP BY user_id, prev_type, event_type
    ), tot AS (
      SELECT user_id, sum(n) AS nt, count(*) AS n_cells FROM cells
      GROUP BY user_id
    ), terms AS (
      SELECT c.user_id, c.prev_type, c.next_type, t.nt, t.n_cells,
             round(-(CAST(c.n AS DOUBLE) / t.nt)
                     * ln(CAST(c.n AS DOUBLE) / t.nt)
                   + sign(-(CAST(c.n AS DOUBLE) / t.nt)
                          * ln(CAST(c.n AS DOUBLE) / t.nt)) * 1e-9, 8)
               + 0.0 AS h
      FROM cells c JOIN tot t USING (user_id)
    )
    SELECT user_id,
           CAST(max(nt) AS BIGINT) AS n_transitions,
           CAST(max(n_cells) AS BIGINT) AS n_distinct_pairs,
           round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list(h ORDER BY prev_type, next_type)),
                 (acc, x) -> acc + x), 6) + 0.0 AS entropy_nats,
           round(CASE WHEN max(n_cells) > 1
                      THEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                             list(h ORDER BY prev_type, next_type)),
                           (acc, x) -> acc + x) / ln(CAST(max(n_cells) AS DOUBLE))
                      ELSE 0.0 END, 6) + 0.0 AS normalized_entropy
    FROM terms GROUP BY user_id
    """,
    category="temporal",
)
def events_transition_entropy_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user TRANSITION ENTROPY — the behavioral-predictability score
    product analytics ranks users by (low entropy = habitual loops, high
    = exploratory): Shannon entropy of each user's own first-order
    (prev → next) transition distribution, plus the n-distinct-pairs
    normalization that makes users with different activity levels
    comparable. The per-user refinement of `events_markov_transitions`'
    global matrix (and the event-stream twin of `curation_source_entropy`).

    Scale shape: one user_id shuffle for the lag, one (user, prev, next)
    count — the per-user cell frame is bounded by |types|² per user —
    and each entropy term is nudge-rounded BEFORE an ordered fold sums it
    (the `stat_mutual_information` recipe), so the per-user sums are
    engine-exact in any partitioning."""
    from pyspark.sql import Window

    from etl_aws_spark.suite._util import rnd_nudged

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    cells = (
        ordered.filter(F.col("prev_type").isNotNull())
        .groupBy("user_id", "prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wt = Window.partitionBy("user_id")
    p = F.col("n").cast("double") / F.sum("n").over(wt)
    terms = cells.select(
        "user_id",
        "prev_type",
        "next_type",
        F.sum("n").over(wt).alias("nt"),
        F.count(F.lit(1)).over(wt).alias("n_cells"),
        rnd_nudged(-p * F.log(p), 8).alias("h"),
    )
    ent = F.expr(
        "aggregate(transform(array_sort(collect_list(struct(prev_type, next_type, h))), "
        "s -> s.h), cast(0.0 as double), (acc, x) -> acc + x)"
    )
    return terms.groupBy("user_id").agg(
        F.max("nt").cast("long").alias("n_transitions"),
        F.max("n_cells").cast("long").alias("n_distinct_pairs"),
        (F.round(ent, 6) + F.lit(0.0)).alias("entropy_nats"),
        (
            F.round(
                F.when(
                    F.max("n_cells") > 1,
                    ent / F.log(F.max("n_cells").cast("double")),
                ).otherwise(F.lit(0.0)),
                6,
            )
            + F.lit(0.0)
        ).alias("normalized_entropy"),
    )


@query(
    "stat_conversion_beta_posterior",
    # Bayesian conversion monitoring: Beta(1+s, 1+f) posterior per funnel
    # step from exact integer counts — posterior mean/sd and a normal-
    # approximation credible interval, all closed forms over the |types|
    # frame. The Bayesian twin of stat_proportion_ztest.
    oracle="""
    WITH u AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
             max(CASE WHEN event_type = 'cart_add' THEN 1 ELSE 0 END) AS c,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
      FROM events GROUP BY user_id
    ), steps AS (
      SELECT 'view->cart' AS step,
             sum(CASE WHEN v = 1 THEN c ELSE 0 END) AS s,
             sum(CASE WHEN v = 1 THEN 1 - c ELSE 0 END) AS f
      FROM u
      UNION ALL
      SELECT 'cart->purchase',
             sum(CASE WHEN c = 1 THEN p ELSE 0 END),
             sum(CASE WHEN c = 1 THEN 1 - p ELSE 0 END)
      FROM u
    ), post AS (
      SELECT step, s, f,
             (1.0 + s) AS a, (1.0 + f) AS b
      FROM steps
    )
    SELECT step,
           CAST(s AS BIGINT) AS n_converted,
           CAST(f AS BIGINT) AS n_dropped,
           round(a / (a + b), 6) + 0.0 AS posterior_mean,
           round(sqrt(a * b / ((a + b) * (a + b) * (a + b + 1.0))), 6) + 0.0
             AS posterior_sd,
           round(a / (a + b)
                 - 1.959963984540054
                   * sqrt(a * b / ((a + b) * (a + b) * (a + b + 1.0))), 6)
             + 0.0 AS ci_low,
           round(a / (a + b)
                 + 1.959963984540054
                   * sqrt(a * b / ((a + b) * (a + b) * (a + b + 1.0))), 6)
             + 0.0 AS ci_high
    FROM post
    """,
    category="temporal",
)
def stat_conversion_beta_posterior(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bayesian funnel-conversion monitoring: Beta(1+successes,
    1+failures) posterior per step (uniform prior), with posterior
    mean/sd and a 95% normal-approximation credible interval — the
    always-valid per-step dashboard number that, unlike
    `stat_proportion_ztest`'s point test, stays meaningful at tiny
    counts (a new step's wide interval says 'not enough data', not
    'no effect').

    Scale shape: ONE per-user conditional aggregate (the funnel
    reduction), a 2-row step frame, closed forms from exact integer
    counts — deterministic at any parallelism."""
    ev = load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("v"),
        F.max(F.when(F.col("event_type") == "cart_add", 1).otherwise(0)).alias("c"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("p"),
    )
    s1 = u.agg(
        F.lit("view->cart").alias("step"),
        F.sum(F.when(F.col("v") == 1, F.col("c")).otherwise(0)).alias("s"),
        F.sum(F.when(F.col("v") == 1, 1 - F.col("c")).otherwise(0)).alias("f"),
    )
    s2 = u.agg(
        F.lit("cart->purchase").alias("step"),
        F.sum(F.when(F.col("c") == 1, F.col("p")).otherwise(0)).alias("s"),
        F.sum(F.when(F.col("c") == 1, 1 - F.col("p")).otherwise(0)).alias("f"),
    )
    steps = s1.unionByName(s2)
    a = F.lit(1.0) + F.col("s")
    b = F.lit(1.0) + F.col("f")
    mean = a / (a + b)
    sd = F.sqrt(a * b / ((a + b) * (a + b) * (a + b + F.lit(1.0))))
    z = F.lit(1.959963984540054)
    return steps.select(
        "step",
        F.col("s").cast("long").alias("n_converted"),
        F.col("f").cast("long").alias("n_dropped"),
        (F.round(mean, 6) + F.lit(0.0)).alias("posterior_mean"),
        (F.round(sd, 6) + F.lit(0.0)).alias("posterior_sd"),
        (F.round(mean - z * sd, 6) + F.lit(0.0)).alias("ci_low"),
        (F.round(mean + z * sd, 6) + F.lit(0.0)).alias("ci_high"),
    )


_STATIONARY_ITERS = 10


def _duck_stationary_round(k: int) -> str:
    """One power-iteration round π' = π·P on the |types|² cell frame,
    nudge-rounded to 8 digits per iterate (the PCA per-iterate bridge)."""
    p = k - 1
    return f"""
    pi{k} AS MATERIALIZED (
      SELECT t.next_type AS typ,
             round(sum(pi.prob * t.p) + sign(sum(pi.prob * t.p)) * 1e-9, 8)
               + 0.0 AS prob
      FROM pi{p} pi JOIN tmat t ON pi.typ = t.prev_type
      GROUP BY t.next_type
    )"""


@query(
    "events_markov_stationary",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ), cells AS (
      SELECT prev_type, event_type AS next_type, count(*) AS n
      FROM ordered WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    ), tmat AS (
      SELECT prev_type, next_type,
             CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY prev_type) AS p
      FROM cells
    ), starts AS (
      SELECT event_type AS typ, count(*) AS n FROM events GROUP BY event_type
    ), pi0 AS (
      SELECT typ, CAST(n AS DOUBLE) / sum(n) OVER () AS prob FROM starts
    ),{','.join(_duck_stationary_round(k) for k in range(1, _STATIONARY_ITERS + 1))}
    SELECT s.typ AS event_type,
           round(p0.prob, 6) + 0.0 AS empirical_share,
           round(pN.prob, 6) + 0.0 AS stationary_prob,
           round(pN.prob - p0.prob, 6) + 0.0 AS drift
    FROM starts s
    JOIN pi0 p0 ON s.typ = p0.typ
    JOIN pi{_STATIONARY_ITERS} pN ON s.typ = pN.typ
    """,
    category="temporal",
)
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATIONARY DISTRIBUTION of the event-type Markov chain: power-
    iterate π' = π·P for {_STATIONARY_ITERS} rounds from the empirical
    type mix — where user behavior settles if today's transition dynamics
    persist, and the drift column (stationary − empirical) is the
    leading indicator a product team reads (purchase share drifting down
    under the chain = the funnel is leaking faster than the current mix
    shows). Completes the Markov family: `events_markov_transitions`
    (the matrix), `_prediction_accuracy` (its skill), this (its
    long-run fix-point).

    Scale shape: the corpus is touched once (the lag + cell count);
    every iteration is a join on the |types|² ≈ 25-cell frame with
    per-iterate nudged-8 rounding (the PCA bridge), so all
    {_STATIONARY_ITERS} rounds replay bit-exactly and cost nothing at
    any corpus size."""
    from pyspark.sql import Window

    from etl_aws_spark.suite._util import rnd_nudged

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    cells = (
        ordered.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wp = Window.partitionBy("prev_type")
    tmat = cells.select(
        "prev_type",
        "next_type",
        (F.col("n").cast("double") / F.sum("n").over(wp)).alias("p"),
    ).localCheckpoint(eager=True)
    starts = ev.groupBy(F.col("event_type").alias("typ")).agg(
        F.count(F.lit(1)).alias("n")
    )
    wall = Window.partitionBy()
    pi = starts.select(
        "typ", (F.col("n").cast("double") / F.sum("n").over(wall)).alias("prob")
    ).localCheckpoint(eager=True)
    pi0 = pi
    for _ in range(_STATIONARY_ITERS):
        pi = (
            pi.join(tmat, pi["typ"] == tmat["prev_type"])
            .groupBy(F.col("next_type").alias("typ"))
            .agg(rnd_nudged(F.sum(F.col("prob") * F.col("p")), 8).alias("prob"))
            .localCheckpoint(eager=True)
        )
    return (
        starts.select("typ")
        .join(pi0.withColumnRenamed("prob", "p0"), "typ")
        .join(pi.withColumnRenamed("prob", "pn"), "typ")
        .select(
            F.col("typ").alias("event_type"),
            (F.round("p0", 6) + F.lit(0.0)).alias("empirical_share"),
            (F.round("pn", 6) + F.lit(0.0)).alias("stationary_prob"),
            (F.round(F.col("pn") - F.col("p0"), 6) + F.lit(0.0)).alias("drift"),
        )
    )


_REMOVAL_ITERS = 20
_REMOVAL_CHANNELS = ["click", "error", "signup", "view"]


def _duck_removal_round(k: int) -> str:
    """One absorption-probability round per scenario on the tiny
    (scenario x |states|^2) frame: r'(s) = sum_next p * value(next) with
    value(purchase) = 1, value(end) = 0, value(channel) = r(channel);
    nudge-rounded to 8 digits per iterate (the stationary-chain bridge)."""
    p = k - 1
    return f"""
    r{k} AS MATERIALIZED (
      SELECT t.scenario, t.prev_type AS s,
             round(sum(t.p * CASE WHEN t.next_type = 'purchase' THEN 1.0
                               WHEN t.next_type = '(end)' THEN 0.0
                               ELSE coalesce(r.val, 0.0) END)
                   + sign(sum(t.p * CASE WHEN t.next_type = 'purchase' THEN 1.0
                               WHEN t.next_type = '(end)' THEN 0.0
                               ELSE coalesce(r.val, 0.0) END)) * 1e-9, 8)
               + 0.0 AS val
      FROM tmat_s t LEFT JOIN r{p} r
        ON t.scenario = r.scenario AND t.next_type = r.s
      GROUP BY t.scenario, t.prev_type
    )"""


@query(
    "events_attribution_markov_removal",
    # Markov-chain (removal-effect) attribution, the data-driven model
    # beside the heuristic multitouch and Shapley queries: journeys
    # truncate at the first purchase, absorb in 'purchase'/'(end)', and
    # each channel's value is how much the START->purchase absorption
    # probability drops when the channel's outgoing mass is removed.
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, event_type, ts, event_id,
             count(CASE WHEN event_type = 'purchase' THEN 1 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prior_purchases
      FROM events
    ), journey AS (
      SELECT user_id, event_type, ts, event_id
      FROM flagged WHERE prior_purchases = 0
    ), seq AS (
      SELECT user_id, event_type,
             coalesce(lag(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id), 'START') AS prev_type,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts DESC, event_id DESC) AS rev_rank
      FROM journey
    ), trans AS (
      SELECT prev_type, event_type AS next_type FROM seq
      UNION ALL
      SELECT event_type AS prev_type, '(end)' AS next_type
      FROM seq WHERE rev_rank = 1 AND event_type <> 'purchase'
    ), cells AS (
      SELECT prev_type, next_type, count(*) AS n FROM trans
      GROUP BY prev_type, next_type
    ), tmat AS (
      SELECT prev_type, next_type,
             CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY prev_type) AS p
      FROM cells
    ), scen AS (
      SELECT unnest(['(base)'] ||
                    [{", ".join(f"'{c}'" for c in _REMOVAL_CHANNELS)}]) AS scenario
    ), tmat_s AS MATERIALIZED (
      SELECT s.scenario, t.prev_type, t.next_type, t.p
      FROM tmat t CROSS JOIN scen s
      WHERE s.scenario = '(base)' OR t.prev_type <> s.scenario
    ), r0 AS (
      SELECT scenario, prev_type AS s, CAST(0.0 AS DOUBLE) AS val
      FROM tmat_s GROUP BY scenario, prev_type
    ),{','.join(_duck_removal_round(k) for k in range(1, _REMOVAL_ITERS + 1))},
    fin AS (
      SELECT scenario, val FROM r{_REMOVAL_ITERS} WHERE s = 'START'
    ), base AS (
      SELECT val AS cvr FROM fin WHERE scenario = '(base)'
    ), re AS (
      SELECT f.scenario AS channel,
             1.0 - f.val / b.cvr AS removal_effect, b.cvr
      FROM fin f CROSS JOIN base b WHERE f.scenario <> '(base)'
    ), tot AS (
      SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(removal_effect ORDER BY channel)), (a, b) -> a + b) AS z
      FROM re
    )
    SELECT re.channel,
           round(re.removal_effect + sign(re.removal_effect) * 1e-9, 6) + 0.0
             AS removal_effect,
           round(re.removal_effect / tot.z
                 + sign(re.removal_effect / tot.z) * 1e-9, 6) + 0.0
             AS attribution_share,
           round(re.cvr, 6) + 0.0 AS base_conversion_prob
    FROM re CROSS JOIN tot
    """,
    category="temporal",
)
def events_attribution_markov_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MARKOV-CHAIN ATTRIBUTION by removal effect (Anderl et al. 2014)
    — the data-driven credit model that replaces position heuristics:
    build the journey chain (START -> events -> absorb in 'purchase'
    or '(end)', truncated at the first purchase), and value each
    channel by how much the START->purchase absorption probability
    drops when that channel's outgoing transitions are removed.
    Shares normalize the drops; sits beside
    `events_attribution_multitouch` (heuristics) and
    `events_attribution_shapley` (coalition model) as the third
    attribution family every marketing stack compares.

    Scale shape: the corpus is touched twice (first-purchase cutoff
    window + lag window, both partitioned by user) and reduces to the
    |states|^2 transition-cell frame; all {K} absorption iterations —
    for the base chain AND the 4 removal scenarios — run on ONE tiny
    (scenario x states) frame via LEFT JOIN + groupBy with per-iterate
    nudged-8 rounding, so every round replays bit-exactly on both
    engines and costs nothing at any corpus size. The one
    cross-channel float sum folds in channel order."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.coalesce(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).over(wu.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("prior_purchases"),
    )
    journey = flagged.filter(F.col("prior_purchases") == 0)
    wd = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    seq = journey.select(
        "user_id",
        "event_type",
        F.coalesce(F.lag("event_type").over(wu), F.lit("START")).alias(
            "prev_type"
        ),
        F.row_number().over(wd).alias("rev_rank"),
    )
    trans = seq.select(
        "prev_type", F.col("event_type").alias("next_type")
    ).unionByName(
        seq.filter(
            (F.col("rev_rank") == 1) & (F.col("event_type") != "purchase")
        ).select(
            F.col("event_type").alias("prev_type"),
            F.lit("(end)").alias("next_type"),
        )
    )
    cells = trans.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wp = Window.partitionBy("prev_type")
    tmat = cells.select(
        "prev_type",
        "next_type",
        (F.col("n").cast("double") / F.sum("n").over(wp)).alias("p"),
    )
    scen = spark.createDataFrame(
        [("(base)",)] + [(c,) for c in _REMOVAL_CHANNELS], ["scenario"]
    )
    tmat_s = (
        tmat.crossJoin(F.broadcast(scen))
        .filter(
            (F.col("scenario") == "(base)")
            | (F.col("prev_type") != F.col("scenario"))
        )
        .localCheckpoint(eager=True)
    )
    r = tmat_s.groupBy("scenario", F.col("prev_type").alias("s")).agg(
        F.lit(0.0).alias("val")
    ).localCheckpoint(eager=True)
    for _ in range(_REMOVAL_ITERS):
        rj = r.select(
            F.col("scenario").alias("r_scen"),
            F.col("s").alias("r_s"),
            "val",
        )
        r = (
            tmat_s.join(
                rj,
                (F.col("scenario") == F.col("r_scen"))
                & (F.col("next_type") == F.col("r_s")),
                "left",
            )
            .groupBy("scenario", F.col("prev_type").alias("s"))
            .agg(
                rnd_nudged(
                    F.sum(
                        F.col("p")
                        * F.when(F.col("next_type") == "purchase", F.lit(1.0))
                        .when(F.col("next_type") == "(end)", F.lit(0.0))
                        .otherwise(F.coalesce(F.col("val"), F.lit(0.0)))
                    ),
                    8,
                ).alias("val")
            )
            .localCheckpoint(eager=True)
        )
    fin = r.filter(F.col("s") == "START").select("scenario", "val")
    base = fin.filter(F.col("scenario") == "(base)").select(
        F.col("val").alias("cvr")
    )
    re = (
        fin.filter(F.col("scenario") != "(base)")
        .crossJoin(F.broadcast(base))
        .select(
            F.col("scenario").alias("channel"),
            (F.lit(1.0) - F.col("val") / F.col("cvr")).alias("removal_effect"),
            "cvr",
        )
    )
    tot = re.agg(
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(channel, "
            "removal_effect))), x -> x.removal_effect), "
            "cast(0.0 as double), (a, b) -> a + b)"
        ).alias("z")
    )
    return re.crossJoin(F.broadcast(tot)).select(
        "channel",
        rnd_nudged(F.col("removal_effect"), 6).alias("removal_effect"),
        rnd_nudged(F.col("removal_effect") / F.col("z"), 6).alias(
            "attribution_share"
        ),
        (F.round(F.col("cvr"), 6) + F.lit(0.0)).alias("base_conversion_prob"),
    )


@query(
    "events_dau_mau_stickiness",
    # DAU and MAU are exact distinct counts; the per-month average of
    # integer DAUs is an integer-sum ratio — no fold, no rounding bridge
    # beyond the display division.
    oracle="""
    WITH dau AS (
      SELECT date_trunc('month', ts) AS month, CAST(ts AS DATE) AS d,
             count(DISTINCT user_id) AS dau
      FROM events GROUP BY 1, 2
    ), mau AS (
      SELECT date_trunc('month', ts) AS month,
             count(DISTINCT user_id) AS mau
      FROM events GROUP BY 1
    )
    SELECT CAST(dau.month AS TIMESTAMP) AS month,
           CAST(count(*) AS INT) AS n_days,
           CAST(sum(dau.dau) AS BIGINT) AS sum_dau,
           CAST(max(mau.mau) AS BIGINT) AS mau,
           round(CAST(sum(dau.dau) AS DOUBLE) / count(*), 4) + 0.0 AS avg_dau,
           round(CAST(sum(dau.dau) AS DOUBLE) / count(*) / max(mau.mau), 6)
             + 0.0 AS stickiness
    FROM dau JOIN mau ON dau.month = mau.month
    GROUP BY dau.month
    """,
    category="temporal",
)
def events_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU STICKINESS per month — the canonical engagement ratio
    (what fraction of a month's actives show up on an average day):
    exact distinct-user counts at both grains, averaged over the days
    the month actually has data for. Integer arithmetic throughout; the
    two display divisions are the only doubles.

    Scale shape (100 TB): two distinct aggregates over one fact scan
    (both map-side partial on (grain, user)), joined on |months| rows.
    The distinct is the honest cost — the HLL sketch family
    (`agg_hll_distinct_users`, `streaming_sketch_hll_distinct`) is the
    documented approximate path when exactness can yield."""
    ev = load(spark, sf_dir, "events")
    dau = ev.groupBy(
        F.date_trunc("month", "ts").alias("month"),
        F.col("ts").cast("date").alias("d"),
    ).agg(F.countDistinct("user_id").alias("dau"))
    mau = ev.groupBy(F.date_trunc("month", "ts").alias("month")).agg(
        F.countDistinct("user_id").alias("mau")
    )
    j = dau.join(mau, "month").groupBy("month").agg(
        F.count(F.lit(1)).cast("int").alias("n_days"),
        F.sum("dau").cast("long").alias("sum_dau"),
        F.max("mau").cast("long").alias("mau"),
    )
    avg_dau = F.col("sum_dau").cast("double") / F.col("n_days")
    return j.select(
        "month",
        "n_days",
        "sum_dau",
        "mau",
        (F.round(avg_dau, 4) + F.lit(0.0)).alias("avg_dau"),
        (F.round(avg_dau / F.col("mau"), 6) + F.lit(0.0)).alias("stickiness"),
    )
