"""Temporal join operators: as-of (backward) join and gap-based
sessionization.

Neither exists as a single Spark primitive; both are expressed as
compositions of built-in operators (task-brief case (a)), so they stay in
whole-stage codegen and inherit Catalyst planning — no Pandas UDF needed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_seconds(col: str | Column) -> Column:
    """Seconds-since-epoch expression legal for BOTH ``TIMESTAMP`` (LTZ) and
    ``TIMESTAMP_NTZ`` inputs.

    Parquet timestamps without a timezone annotation are inferred as
    ``TIMESTAMP_NTZ``, and ``TIMESTAMP_NTZ → BIGINT`` is an illegal cast
    (AnalysisException DATATYPE_MISMATCH.CAST_WITHOUT_SUGGESTION). Casting
    through ``timestamp_ltz`` first is legal from both flavors; with the
    session timezone pinned to UTC (session.py) the NTZ wall-clock maps to
    the same epoch value DuckDB's ``date_part('epoch', ts)`` yields on naive
    timestamps, so the oracles are unaffected.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp_ltz").cast("long")


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    tolerance: int | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right_ts <= left_ts`` within the key (pandas ``merge_asof`` /
    DuckDB ``ASOF JOIN`` semantics, left-outer).

    ``tolerance``: maximum staleness in SECONDS — a match older than this
    is nulled out (pandas ``merge_asof(tolerance=...)``), applied as a
    post-fill expression so the plan is unchanged.

    Implementation: union the two sides tagged by origin, sort per key on
    (ts, origin) with right rows first at equal timestamps, and
    forward-fill the right payload with ``last(ignorenulls)`` — an as-of
    join as ONE window pass over the union. No join node at all: one
    shuffle on the key, O(1) state per row, immune to the range-join
    explosion a naive ``ON l.ts >= r.ts`` theta join produces (which Spark
    would execute as a per-key cross product).
    """
    lcols = [c for c in left.columns]
    l_tagged = left.select(
        *lcols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r_ts"),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != key],
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.col(right_ts).alias("_r_ts"),
    ).select(*l_tagged.columns)  # align column order
    unioned = l_tagged.unionByName(r_tagged)
    # right rows sort BEFORE left rows at identical ts → inclusive (<=)
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.withColumns(
        {f"_r_{c}": F.last(f"_r_{c}", ignorenulls=True).over(w) for c in value_cols}
        | {"_r_ts": F.last("_r_ts", ignorenulls=True).over(w)}
    )
    keep = F.lit(True)
    if tolerance is not None:
        # exact integer-µs staleness: truncated-seconds arithmetic flips
        # matches within 1 s of the bound when timestamps carry fractions
        keep = (
            _epoch_micros("_ts") - _epoch_micros("_r_ts")
            <= F.lit(int(tolerance) * 1_000_000)
        )
    out = filled.filter(F.col("_side") == 1).select(
        *lcols,
        *[
            F.when(keep, F.col(f"_r_{c}")).alias(f"right_{c}")
            for c in value_cols
        ],
        F.when(keep, F.col("_r_ts")).alias(f"right_{right_ts}"),
    )
    return out


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: int,
    order_tail: Sequence[str] = (),
) -> DataFrame:
    """Gap-based session assignment: a new session starts when the time
    since the previous event in the key exceeds ``gap_seconds``. Session id
    = running count of session starts (the lag-gap-cumsum composition —
    identical SQL runs on any engine; Spark's native ``session_window``
    aggregate is the streaming twin).

    Adds ``session_id`` (per-key, 1-based) — one window pass, one shuffle.
    """
    order = [ts_col, *order_tail]
    w = Window.partitionBy(key).orderBy(*order)
    gap = _epoch_seconds(ts_col) - F.lag(_epoch_seconds(ts_col), 1).over(w)
    is_start = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    run = Window.partitionBy(key).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn("_start", is_start).withColumn(
        "session_id", F.sum("_start").over(run).cast("long")
    ).drop("_start")


def session_stats(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: int,
    value: str,
    order_tail: Sequence[str] = (),
) -> DataFrame:
    """Per-session aggregates over the sessionized frame: bounds, event
    count, value sum — the event-analytics rollup."""
    s = sessionize(df, key, ts_col, gap_seconds, order_tail)
    return s.groupBy(key, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(value).alias("sum_value"),
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """For each left row, attach the EARLIEST right row with
    ``right_ts >= left_ts`` within the key (forward as-of — pandas
    ``merge_asof(direction='forward')``).

    Mirror of :func:`asof_join_backward`: union tagged sides, one window
    pass — here a backward-fill with ``first(ignorenulls)`` over the
    [current, unbounded following] frame. Left rows sort BEFORE right rows
    at identical timestamps so the match is inclusive. Same scale shape:
    one shuffle on the key, no join node, no range explosion.
    """
    lcols = [c for c in left.columns]
    l_tagged = left.select(
        *lcols,
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r_ts"),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != key],
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.col(right_ts).alias("_r_ts"),
    ).select(*l_tagged.columns)
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    filled = unioned.withColumns(
        {f"_r_{c}": F.first(f"_r_{c}", ignorenulls=True).over(w) for c in value_cols}
        | {"_r_ts": F.first("_r_ts", ignorenulls=True).over(w)}
    )
    return filled.filter(F.col("_side") == 0).select(
        *lcols,
        *[F.col(f"_r_{c}").alias(f"right_{c}") for c in value_cols],
        F.col("_r_ts").alias(f"right_{right_ts}"),
    )


def bucketed_range_count(
    windows: DataFrame,
    points: DataFrame,
    win_id: str,
    key: str,
    start_col: str,
    end_col: str,
    ts_col: str,
    value_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Interval-overlap range join as a BLOCKED equi-join: count/sum the
    points falling in each window's ``[start, end)``.

    A naive ``ON p.ts BETWEEN w.start AND w.end`` theta join degenerates to
    a per-key cross product (BroadcastNestedLoopJoin at scale — the classic
    range-join explosion). Instead both sides are bucketed on
    ``floor(epoch / bucket_seconds)``: each window explodes to the handful
    of buckets it covers (⌈len/bucket⌉+1 rows), each point maps to exactly
    one bucket, and the join is a plain equi-join on (key, bucket) with the
    range predicate as a residual filter. A point can meet a window in only
    one bucket — its own — so no post-join dedup is needed. Work is
    Σ per-bucket |windows|·|points|, not |W|·|P|.

    Windows with no matching points are kept (count 0) via a final
    broadcast-able left join of the per-window aggregate back onto the
    window list.
    """
    bkt = lambda c: F.floor(_epoch_seconds(c) / F.lit(bucket_seconds))  # noqa: E731
    pb = points.select(
        F.col(key).alias("_pkey"),
        F.col(ts_col).alias("_pts"),
        F.col(value_col).alias("_pval"),
        bkt(ts_col).alias("_pbkt"),
    )
    wb = windows.withColumn(
        "_bkt", F.explode(F.sequence(bkt(start_col), bkt(end_col)))
    )
    joined = wb.join(
        pb,
        (F.col(key) == F.col("_pkey"))
        & (F.col("_bkt") == F.col("_pbkt"))
        & (F.col("_pts") >= F.col(start_col))
        & (F.col("_pts") < F.col(end_col)),
        "inner",
    )
    per_win = joined.groupBy(win_id).agg(
        F.count(F.lit(1)).alias("n_in_range"),
        F.sum("_pval").alias("sum_value"),
    )
    return (
        windows.join(per_win, on=win_id, how="left")
        .withColumn("n_in_range", F.coalesce(F.col("n_in_range"), F.lit(0)).cast("long"))
        .withColumn("sum_value", F.coalesce(F.col("sum_value"), F.lit(0.0)))
    )


def resample_daily_ffill(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key daily resample with gap fill: aggregate to calendar days,
    generate the full day spine between each key's first and last day, and
    forward-fill the last observed daily total across gaps.

    The spine is built per key from the AGGREGATED frame (keys × days, not
    raw rows), so the explode is bounded by the date span — at 100 TB the
    raw table never re-shuffles: daily agg, per-key min/max, sequence
    explode, one left join, one window pass, all on the same key
    partitioning.

    Output: key, day, n_events (0 on gap days), daily_sum (NULL on gaps),
    carried_sum (forward-filled).
    """
    daily = df.groupBy(
        F.col(key), F.to_date(F.col(ts_col)).alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.round(F.sum(value_col), 4) + F.lit(0.0)).alias("daily_sum"),
    )
    spine = (
        daily.groupBy(key)
        .agg(F.min("day").alias("_d0"), F.max("day").alias("_d1"))
        .withColumn("day", F.explode(F.expr("sequence(_d0, _d1, interval 1 day)")))
        .select(key, "day")
    )
    j = spine.join(daily, on=[key, "day"], how="left")
    w = (
        Window.partitionBy(key)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        j.withColumn("n_events", F.coalesce(F.col("n_events"), F.lit(0)).cast("long"))
        .withColumn("carried_sum", F.last("daily_sum", ignorenulls=True).over(w))
    )


def _epoch_micros(col: str | Column) -> Column:
    """Exact integer microseconds-since-epoch, legal for LTZ and NTZ inputs
    (same ``timestamp_ltz`` bridge as :func:`_epoch_seconds`; integer µs so
    nearest-neighbor distance comparisons can never tie on rounding)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp_ltz"))


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Nearest as-of join (pandas ``merge_asof(direction='nearest')``): each
    left row takes whichever of its backward / forward reference rows is
    closer in time; ties go backward.

    ONE union + ONE window partitioning computes both candidates — the
    backward fill over (unbounded preceding, current) and the forward fill
    over (current, unbounded following) share the same sort and Exchange,
    so the plan cost equals a single directional as-of join. With right
    rows sorted before left at equal timestamps, an equal-ts reference is
    always the backward candidate at distance zero, which wins every tie —
    so the single sort order serves both directions correctly.
    """
    lcols = list(left.columns)
    l_tagged = left.select(
        *lcols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r_ts"),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != key],
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.col(right_ts).alias("_r_ts"),
    ).select(*l_tagged.columns)
    unioned = l_tagged.unionByName(r_tagged)
    base = Window.partitionBy(key).orderBy("_ts", "_side")
    wb = base.rowsBetween(Window.unboundedPreceding, 0)
    wf = base.rowsBetween(0, Window.unboundedFollowing)
    cols = {}
    for c in value_cols:
        cols[f"_b_{c}"] = F.last(f"_r_{c}", ignorenulls=True).over(wb)
        cols[f"_f_{c}"] = F.first(f"_r_{c}", ignorenulls=True).over(wf)
    cols["_b_ts"] = F.last("_r_ts", ignorenulls=True).over(wb)
    cols["_f_ts"] = F.first("_r_ts", ignorenulls=True).over(wf)
    filled = unioned.withColumns(cols).filter(F.col("_side") == 1)
    fwd_wins = (
        F.col("_b_ts").isNull()
        | (
            F.col("_f_ts").isNotNull()
            & (
                _epoch_micros("_f_ts") - _epoch_micros("_ts")
                < _epoch_micros("_ts") - _epoch_micros("_b_ts")
            )
        )
    )
    picked = [
        F.when(fwd_wins, F.col(f"_f_{c}")).otherwise(F.col(f"_b_{c}")).alias(f"right_{c}")
        for c in value_cols
    ] + [
        F.when(fwd_wins, F.col("_f_ts")).otherwise(F.col("_b_ts")).alias(f"right_{right_ts}")
    ]
    return filled.select(*lcols, *picked)
