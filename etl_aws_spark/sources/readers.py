"""Scan operators: parquet (single / Hive-partitioned) and CSV.

The reference relies on parquet-footer schema + CSV ``inferSchema``
(`glue.py:78-83,100`) even though it declares an explicit StructType it
never uses (`glue.py:53-70`). Here the explicit-schema path is first-class:
pass ``schema=`` to the CSV reader; parquet carries its own types.

Nanosecond note: some fixture tables store TIMESTAMP(NANOS) which Spark's
vectorized parquet reader rejects ([PARQUET_TYPE_ILLEGAL]). ``read_table``
flips ``spark.sql.legacy.parquet.nanosAsLong`` and rebuilds a microsecond
``TimestampType`` column JVM-side — lossless for the fixtures (no sub-µs
components) and fully codegen'd.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# fixture columns stored as TIMESTAMP(NANOS,false) in parquet
_NANOS_COLS: dict[str, list[str]] = {"events": ["ts"]}


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Plain parquet scan (columnar, predicate/column pushdown via Catalyst)."""
    return spark.read.parquet(path)


def read_parquet_partitioned(spark: SparkSession, root: str) -> DataFrame:
    """Hive-partitioned tree scan: partition dirs (`k=v`) become columns and
    Catalyst prunes them from pushed-down filters (`glue.py:78-83`)."""
    return spark.read.option("basePath", root).parquet(root)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    sep: str = ";",
    header: bool = True,
) -> DataFrame:
    """Delimited CSV scan (`glue.py:100`, `load_data.py:14-21`).

    Explicit ``schema`` preferred; ``inferSchema`` only as a dev fallback
    (it costs an extra full pass over the file).
    """
    reader = spark.read.option("header", header).option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic fixture table, normalizing nano-timestamps.

    The ``nanosAsLong`` flag is consulted only at schema-inference time (the
    eager footer read inside ``spark.read.parquet``), so it is scoped to
    exactly that call and the prior value restored in a ``finally`` — later
    parquet reads in the same session see TIMESTAMP(NANOS) columns of
    non-fixture tables fail loudly instead of silently decoding as longs.
    """
    nanos = _NANOS_COLS.get(name, [])
    if nanos:
        prior = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        finally:
            if prior is None:
                spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
            else:
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prior)
    else:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in nanos:
        if isinstance(df.schema[c].dataType, T.LongType):
            # integral `div` — float division would lose precision on ~1e18 ns
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def read_parquet_schema_merged(spark: SparkSession, root: str) -> DataFrame:
    """Scan a parquet tree whose files were written under EVOLVING schemas
    (columns added over time). ``mergeSchema`` makes the scan reconcile the
    per-file footers into the union schema; files missing a column surface
    NULLs for it. Schema merge costs one footer read per file at planning
    time — fine for daily epochs, not for millions of tiny files; at that
    scale pin the schema explicitly (or use a table format with a tracked
    schema) and skip the footer sweep."""
    return spark.read.option("mergeSchema", "true").parquet(root)
