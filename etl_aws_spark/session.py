"""SparkSession factory with scale-aware defaults.

The reference job inherits whatever Glue gives it (no tuning anywhere in
`glue.py`). Here the session is configured deliberately:

- AQE on: runtime coalescing, skew-join splitting, dynamic broadcast.
- ``spark.sql.shuffle.partitions`` sized to cores for local runs; on a real
  cluster this is superseded by AQE coalescing from a higher initial value.
- Arrow enabled: every pandas-interop boundary (``applyInPandas``,
  ``toPandas``) is vectorized.
- Session timezone pinned to UTC so timestamp semantics are stable across
  engines (the reference mixes São Paulo tz-aware and naive timestamps;
  see SURVEY.md §1.2).
- Dynamic partition overwrite: daily re-runs replace only the partitions
  they produce (the reference's static overwrite clobbers the whole
  refined tree, `glue.py:237`).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(app_name: str = "etl_aws_spark", extra_conf: dict | None = None) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    Honors ``SPARK_GRAFT_CPUS`` for local parallelism; defaults to all cores.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_existing(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an externally-created session.

    The driver hands us a session it built; master/memory are fixed at that
    point, but SQL confs are not. Called from ``__spark_entry__``.
    """
    for k, v in [
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        ("spark.sql.sources.partitionOverwriteMode", "dynamic"),
        ("spark.sql.shuffle.partitions", "32"),
    ]:
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf locked by the driver — keep its value
    return spark
