"""Scale-adaptive parallelism helpers (guide §2.5 / §6.1).

At 100 TB a scan yields thousands of splits and every downstream map
stage is wide; at the gate SFs the same table is ONE small parquet file →
one split, so compute-heavy per-row chains (tokenize/shingle/MinHash
HOFs, Arrow kernels, ADC folds) serialize on a single core while the
rest idle. `fan_out_small_scan` widens exactly that case and is a
guaranteed no-op at scale — the fan-out only fires when the frame has
FEWER partitions than the session's parallelism, which a large scan
never does.

Round-robin repartition is deterministic (sort-before-repartition is on
by default, SPARK-23207) and the explicit partition count is
deliberately NOT AQE-coalescible: AQE sizes partitions by bytes, and the
whole point here is that cost-per-byte is enormous (interpreted HOF
folds, Python kernels), so byte-based coalescing would re-serialize the
work.

Width is COST-AWARE (r13 verdict #2): fanning a tiny frame all the way
to ``defaultParallelism`` buys nothing once per-partition work drops
under the per-task floor (task scheduling + Arrow eval setup, measured
5–50 ms each), and the 8-core driver bench proved 32-wide fan-outs
LOSING to 8-wide on the PQ/semantic-dedup family. The width is capped
so each partition keeps at least ``_MIN_BYTES_PER_PART`` of input: with
this repo's heavy operators costing ~0.5–5 ms per input KB (levenshtein
DPs, shingle folds, ADC kernels), 64 KB/partition keeps every task at
tens to hundreds of ms of real work — comfortably above the floor at
any width. Frames big enough to fire the cap's ceiling (≥ cores ×
64 KB ≈ a few MB) still fan out to full parallelism, and at production
scale the helper is a no-op anyway (the partition-count guard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# per-partition input floor for the cost-aware width (see module doc).
# Deliberately small relative to AQE's 64 MB advisory size because the
# consumers here are ~100-1000x costlier per byte than a generic shuffle
# stage; raising it re-serializes exactly the work the fan-out exists to
# spread.
_MIN_BYTES_PER_PART = 64 * 1024

#: floor for SUPERLINEAR / extreme per-byte consumers (Σ|block|² edit-
#: distance DPs, per-pair shingle intersections, BPE merge loops —
#: measured 5-15 ms per input KB at sf0.1, vs ~0.5-1 ms/KB for the fold/
#: kernel family): 8 KB/partition keeps those tasks in the 40-120 ms
#: range instead of re-serializing seconds of DP work onto a few tasks.
HEAVY_BYTES_PER_PART = 8 * 1024


def _plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's logical size estimate for ``df`` (file bytes at the
    leaves, propagated through projections). Falls back to "unknown =
    huge" so estimation failure can only widen, never serialize."""
    try:
        return int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return 1 << 62


def fan_out_small_scan(
    df: DataFrame, min_bytes_per_part: int = _MIN_BYTES_PER_PART
) -> DataFrame:
    """Repartition ``df`` round-robin to the cost-aware width iff it
    currently has fewer partitions — a no-op (and no added shuffle) on
    any frame that is already wide, i.e. always at production scale.

    Width = min(defaultParallelism, ceil(estimated bytes /
    ``min_bytes_per_part``)), at least 2: enough partitions to engage
    every core once per-partition work clears the per-task floor, never
    more (BENCH_r13_c8: four queries ran FASTER at 8 cores than 32
    because 32-wide fan-outs of ~1 MB frames paid more in task floors
    than they bought). Callers whose downstream work is superlinear per
    byte pass ``HEAVY_BYTES_PER_PART`` so the width floor matches their
    measured cost class.

    Contract (classic Spark only): the partition probe goes through
    ``df.rdd``, which forces eager physical planning and is unavailable
    under Spark Connect; callers apply this to scan-stage frames (before
    any exchange), where the probe returns the true split count cheaply.
    On a frame that already contains an exchange the probe would report
    the pre-AQE shuffle-partition count and the fan-out may quietly skip
    — keep the call upstream of the first shuffle.
    """
    sc = df.sparkSession.sparkContext
    cur = df.rdd.getNumPartitions()
    if cur >= sc.defaultParallelism:
        return df
    size = _plan_size_bytes(df)
    width = min(
        sc.defaultParallelism,
        max(2, -(-size // min_bytes_per_part)),  # ceil div
    )
    if width <= cur:
        return df
    return df.repartition(width)
