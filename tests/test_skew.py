"""Skew helpers: salted aggregates and replicated joins match their
unsalted equivalents exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_aws_spark.operators import skew


@pytest.fixture(scope="module")
def skewed(spark):
    # key 0 holds 90% of rows
    rows = [(0 if i % 10 else i % 7 + 1, float(i)) for i in range(5000)]
    return spark.createDataFrame(rows, "k long, v double")


def test_salted_count_sum_matches_plain(spark, skewed):
    plain = (
        skewed.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v"))
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    salted = (
        skew.salted_count_sum(skewed, ["k"], ["v"], n_salts=8, deterministic_by="v")
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert plain["n"].tolist() == salted["n"].tolist()
    assert plain["sum_v"].tolist() == pytest.approx(salted["sum_v"].tolist())


def test_replicated_skew_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame([(i, f"name{i}") for i in range(8)], "k long, name string")
    plain = skewed.join(dim, "k").count()
    via_salt = skew.replicated_skew_join(skewed, dim, "k", n_salts=4).count()
    assert plain == via_salt
    # left join preserves unmatched big-side rows
    dim_small = dim.filter(F.col("k") <= 2)
    plain_left = skewed.join(dim_small, "k", "left").count()
    salted_left = skew.replicated_skew_join(skewed, dim_small, "k", n_salts=4, how="left").count()
    assert plain_left == salted_left == skewed.count()


def test_replicated_skew_join_rejects_small_side_preserving_how(spark, skewed):
    # 'right'/'full' would emit each unmatched small-side row once per salt
    # copy (n_salts duplicates) — must refuse loudly, not corrupt silently.
    dim = spark.createDataFrame([(99, "orphan")], "k long, name string")
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="not replication-safe"):
            skew.replicated_skew_join(skewed, dim, "k", n_salts=4, how=how)
