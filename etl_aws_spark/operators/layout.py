"""Z-order (Morton) data layout — multi-dimensional clustering for scan
pruning.

A single sort key prunes scans on one column only; interleaving the bits
of two key columns into one Morton code and range-partitioning on it
keeps rows that are close in BOTH dimensions inside the same file, so
each file's per-column min/max footer stats stay tight on both columns
and a 2-D box predicate skips most files (the technique behind
Delta/Iceberg `OPTIMIZE ZORDER BY`; public literature: Morton 1966,
"z-order curve"). Reference analogue: none — the reference rewrites whole
parquet snapshots with no layout control (`glue.py` full overwrite); this
is the §2.13 scale-extension tier.

Everything here is exact integer bit arithmetic, identical in Spark SQL
and DuckDB — the z-value, the bucket prefix, and the pruning stats all
replay bit-for-bit in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SPARK = "spark"
DUCK = "duckdb"


def zvalue_sql(x: str, y: str, bits: int, dialect: str) -> str:
    """Morton interleave of two non-negative ints (``x`` even bit lanes,
    ``y`` odd): identical SQL text shape in both dialects, exact BIGINT
    arithmetic (2·bits <= 62, no overflow)."""
    terms = []
    for j in range(bits):
        if dialect == SPARK:
            terms.append(f"shiftleft(shiftright({x}, {j}) & 1, {2 * j})")
            terms.append(f"shiftleft(shiftright({y}, {j}) & 1, {2 * j + 1})")
        else:
            terms.append(f"((({x} >> {j}) & 1) << {2 * j})")
            terms.append(f"((({y} >> {j}) & 1) << {2 * j + 1})")
    return "(" + " + ".join(terms) + ")"


def norm_sql(col: str, lo: int, hi: int, q_bits: int, dialect: str) -> str:
    """Map an integer in [lo, hi] onto the q-bit lane [0, 2^q): exact
    integer scaling ``(x - lo) * 2^q // (hi - lo + 1)`` — the domain
    normalization every real z-order implementation performs (raw keys
    rarely fill their bit width, which would leave the interleave's high
    bits constant and every row in one bucket)."""
    width = hi - lo + 1
    expr = f"(({col} - {lo}) * {1 << q_bits})"
    return f"({expr} div {width})" if dialect == SPARK else f"({expr} // {width})"


def bounds(df: DataFrame, x_col: str, y_col: str) -> tuple[int, int, int, int]:
    """Domain bounds for normalization — four scalars (the bounded
    model-state pattern; the oracle recomputes the identical values).

    Raises ``ValueError`` when the input has no rows with non-null keys —
    min/max aggregates return NULL there, and a z-order layout of nothing
    is a caller bug better surfaced than int(None)-crashed."""
    r = df.agg(
        F.min(F.col(x_col).cast("long")).alias("x_lo"),
        F.max(F.col(x_col).cast("long")).alias("x_hi"),
        F.min(F.col(y_col).cast("long")).alias("y_lo"),
        F.max(F.col(y_col).cast("long")).alias("y_hi"),
    ).first()
    if r.x_lo is None or r.y_lo is None:
        raise ValueError(
            f"bounds({x_col!r}, {y_col!r}): input has no rows with "
            "non-null key values; cannot derive a z-order domain"
        )
    return int(r.x_lo), int(r.x_hi), int(r.y_lo), int(r.y_hi)


def zorder_bucket_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    q_bits: int = 8,
    prefix_bits: int = 4,
    box: tuple[int, int, int, int] | None = None,
) -> DataFrame:
    """Cluster rows by the top ``prefix_bits`` of their normalized z-value
    (each prefix is one file/partition of the z-ordered layout) and report
    the per-bucket footer stats a scan planner would consult: row count
    and min/max of BOTH dimensions. With ``box`` = (x_lo, x_hi, y_lo,
    y_hi), also flag whether the bucket's bounding box intersects the
    query box — a non-overlapping bucket is a file the scan skips
    entirely.

    Scale shape: one bounded 4-scalar bounds pass, then one
    map-side-combined aggregate on the bucket prefix (2^prefix_bits
    groups); the z-value itself is a pure projection, so the real layout
    write (`write_zordered`) never shuffles more than a range partitioner
    does.
    """
    x_lo, x_hi, y_lo, y_hi = bounds(df, x_col, y_col)
    xn = norm_sql(f"cast({x_col} as bigint)", x_lo, x_hi, q_bits, SPARK)
    yn = norm_sql(f"cast({y_col} as bigint)", y_lo, y_hi, q_bits, SPARK)
    z = F.expr(zvalue_sql(xn, yn, q_bits, SPARK))
    shift = 2 * q_bits - prefix_bits
    bucketed = df.select(
        F.shiftright(z, shift).cast("long").alias("bucket"),
        F.col(x_col).cast("long").alias("_x"),
        F.col(y_col).cast("long").alias("_y"),
    )
    out = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("_x").alias("min_x"),
        F.max("_x").alias("max_x"),
        F.min("_y").alias("min_y"),
        F.max("_y").alias("max_y"),
    )
    if box is not None:
        x_lo, x_hi, y_lo, y_hi = box
        out = out.withColumn(
            "overlaps_box",
            (F.col("min_x") <= x_hi)
            & (F.col("max_x") >= x_lo)
            & (F.col("min_y") <= y_hi)
            & (F.col("max_y") >= y_lo),
        )
    return out


def write_zordered(
    df: DataFrame, path: str, x_col: str, y_col: str, q_bits: int = 8, n_files: int = 16
) -> None:
    """Materialize the z-ordered layout: range-partition on the normalized
    Morton code (one shuffle — the same price as any re-layout) and sort
    within partitions so parquet row-group stats are tight too."""
    x_lo, x_hi, y_lo, y_hi = bounds(df, x_col, y_col)
    xn = norm_sql(f"cast({x_col} as bigint)", x_lo, x_hi, q_bits, SPARK)
    yn = norm_sql(f"cast({y_col} as bigint)", y_lo, y_hi, q_bits, SPARK)
    z = F.expr(zvalue_sql(xn, yn, q_bits, SPARK)).alias("_z")
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
