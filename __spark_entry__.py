"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real implementation lives in the ``etl_aws_spark`` package; this
module only adapts its registry to the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_aws_spark import registry
from etl_aws_spark.session import tune_existing


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's refined-layer
    feature block (`glue.py:183-214`) — per-key diff, lag features, trailing
    mean/stddev with leakage-guard frames, warm-up zero-fill — over `events`.
    """
    from etl_aws_spark.operators.windows import glue_feature_block
    from etl_aws_spark.sources.readers import read_table

    tune_existing(spark)
    events = read_table(spark, "/root/testdata/sf0.001", "events")
    return glue_feature_block(events, "value", key="user_id", order=["ts", "event_id"])


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted keys -> rows-only check."""
    return registry.all_oracles()
