"""Change-data operators: snapshot diff (CDC) and SCD2 history build.

The reference pipeline rewrites its whole refined layer every run
(`glue.py:237` static overwrite) and keeps no history; production lakes do
incremental merges instead. These two operators supply that layer
Spark-first:

- :func:`snapshot_diff` derives the change set between two snapshots of the
  same keyed table (the input a MERGE INTO would consume);
- :func:`scd2_from_log` collapses an append-only change log into
  slowly-changing-dimension type-2 validity ranges.

Both are single-shuffle compositions of built-in operators (full-outer join
/ one window pass), so they stay in whole-stage codegen and scale like any
keyed join: shuffle on the key, no skew beyond the key distribution, no
driver-side state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: Sequence[str],
) -> DataFrame:
    """Classify every key across two snapshots as insert / delete / update.

    Full-outer join on the key; unchanged rows are dropped so the output is
    exactly the change set a downstream MERGE would apply. NULL-safe
    equality (`<=>`) keeps NULL attribute values from masquerading as
    updates. One shuffle per side on the key; AQE can turn either side into
    a broadcast when a snapshot is small (typical for incremental loads).

    Output: key, change (insert|delete|update), old_<c>, new_<c> per
    compare column.
    """
    o = old.select(
        F.col(key),
        F.lit(1).alias("_old_present"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        F.col(key),
        F.lit(1).alias("_new_present"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    j = o.join(n, on=key, how="full_outer")
    same = None
    for c in compare_cols:
        eq = F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        same = eq if same is None else (same & eq)
    change = (
        F.when(F.col("_old_present").isNull(), F.lit("insert"))
        .when(F.col("_new_present").isNull(), F.lit("delete"))
        .when(~same, F.lit("update"))
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(
            key,
            "change",
            *[f"old_{c}" for c in compare_cols],
            *[f"new_{c}" for c in compare_cols],
        )
    )


def scd2_from_log(
    log: DataFrame,
    key: str,
    attr: str,
    ts_col: str,
    order_tail: Sequence[str] = (),
) -> DataFrame:
    """Collapse an append-only change log into SCD2 validity ranges.

    Two window passes over one (key)-partitioned sort: (1) keep only rows
    where ``attr`` differs from its predecessor (run-length compression of
    consecutive duplicates), (2) ``valid_to`` = next surviving row's
    timestamp, ``is_current`` = no successor. Equivalent to the
    lag-filter + lead composition any SQL engine runs; both passes share
    one partitioning so Spark plans a single Exchange.

    Output: key, attr, valid_from, valid_to (NULL while current),
    is_current (int 0/1).
    """
    order = [ts_col, *order_tail]
    w = Window.partitionBy(key).orderBy(*[F.col(c) for c in order])
    prev = F.lag(attr, 1).over(w)
    changed = log.withColumn("_prev", prev).filter(
        F.col("_prev").isNull() | (F.col(attr) != F.col("_prev"))
    )
    w2 = Window.partitionBy(key).orderBy(*[F.col(c) for c in order])
    return (
        changed.withColumn("valid_to", F.lead(ts_col, 1).over(w2))
        .select(
            F.col(key),
            F.col(attr),
            F.col(ts_col).alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().cast("int").alias("is_current"),
        )
    )


def write_versioned(
    base: DataFrame, deltas, path: str, validate_key: str | None = None
) -> None:
    """Write a versioned snapshot tree: ``version=0/`` holds the base
    snapshot, ``version=N/`` the Nth delta log (rows carry an ``op``
    column: ``upsert`` | ``delete``). The layout is the MVCC core of a
    lakehouse table format (Delta/Iceberg keep the same thing plus a
    transaction manifest): history is append-only, every version is a
    directory, and a reader reconstructs any point in time without
    touching newer files.

    ``deltas`` is an ordered list of DataFrames with the base's columns
    plus ``op``.

    When ``validate_key`` is given, every version is checked for key
    uniqueness before any file is written and a duplicate raises — a
    delta that carries the same key twice in one version (e.g. upsert
    then delete) has no well-defined survivor without an op-sequence
    column, so the contract is enforced loudly at write time instead of
    resolved arbitrarily at read time.

    Each version writes to its own ``version=N`` directory with an
    explicit per-directory overwrite — never a partitionBy overwrite of
    the root — so a re-run is idempotent under BOTH static and dynamic
    ``partitionOverwriteMode`` (the `maintain_gdpr_delete` r10 lesson:
    static-vs-dynamic root overwrites desynchronize on the second run).
    """
    import os

    from pyspark.sql import functions as F

    if validate_key is not None:
        for v, d in enumerate([base] + list(deltas)):
            dup = (
                d.groupBy(validate_key)
                .count()
                .filter(F.col("count") > 1)
                .limit(1)
                .collect()
            )
            if dup:
                raise ValueError(
                    f"write_versioned: duplicate key {dup[0][0]!r} in "
                    f"version {v}; each version must carry a key at most "
                    "once (no op-sequence column exists to break ties)"
                )
    base.withColumn("op", F.lit("upsert")).write.mode("overwrite").parquet(
        os.path.join(path, "version=0")
    )
    for i, d in enumerate(deltas, start=1):
        d.write.mode("overwrite").parquet(os.path.join(path, f"version={i}"))


def read_asof(spark, path: str, key: str, version: int) -> DataFrame:
    """Reconstruct the table AS OF ``version``: scan only ``version <= v``
    directories (a literal partition filter — newer versions are never
    opened), keep the LATEST op per key, and drop keys whose latest op is
    a delete. One shuffle on the key; cost scales with the history read,
    not with the table's full lifetime.

    Within a version, ``write_versioned(validate_key=...)`` guarantees
    key uniqueness; should unvalidated data carry a key twice in one
    version, the tie breaks deterministically: ``op`` ascending first
    (delete precedes upsert, so the delete wins a delete-vs-upsert
    conflict), then a stable whole-row hash (xxhash64 over every column)
    so even two same-version upserts of one key yield a scan-order-free
    survivor (ADVICE r11: (version, op) alone left that last case
    nondeterministic)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    snap = spark.read.parquet(path).filter(F.col("version") <= version)
    w = Window.partitionBy(key).orderBy(
        F.desc("version"), F.asc("op"), F.asc(F.xxhash64(*snap.columns))
    )
    return (
        snap.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("op") == "upsert"))
        .drop("_rn", "op", "version")
    )
