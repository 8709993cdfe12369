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
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out_small_scan(df: DataFrame) -> DataFrame:
    """Repartition ``df`` round-robin to the default parallelism iff it
    currently has fewer partitions — a no-op (and no added shuffle) on
    any frame that is already wide, i.e. always at production scale."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df
