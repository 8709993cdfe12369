"""Temporal-join queries: as-of join, sessionization, session rollup.

The as-of oracle uses DuckDB's native ``ASOF LEFT JOIN``; the Spark side is
the union + forward-fill window composition — two completely different
formulations that must agree row-for-row, the strongest kind of oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_aws_spark.operators import temporal_joins as tj
from etl_aws_spark.registry import load, query
from etl_aws_spark.suite._util import EVENTS_ORDER_SQL

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
