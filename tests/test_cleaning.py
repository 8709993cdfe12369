"""Cleaning operators: MAD robustness, winsor bounds, sample determinism."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_aws_spark.operators import cleaning


def test_mad_flags_planted_outlier_zscore_would_miss(spark):
    # 30 tight values + 2 huge outliers per key: the outliers inflate the
    # stddev (z-score misses the smaller one) but not the MAD
    rows = []
    for k in (1, 2):
        rows += [(k, i, 100.0 + (i % 7) * 0.1) for i in range(30)]
        rows += [(k, 100, 5000.0), (k, 101, 300.0)]
    df = spark.createDataFrame(rows, "k long, i long, x double")
    out = cleaning.flag_outliers_mad(df, "x", "k", k=3.0).toPandas()
    flagged = set(map(tuple, out[out.is_outlier == 1][["k", "i"]].values))
    assert (1, 100) in flagged and (1, 101) in flagged
    assert not any(i < 30 for _, i in flagged)


def test_mad_zero_group_still_flags_wild_value(spark):
    # Degenerate-MAD group: 20 constant values + one wild one. MAD is 0, so
    # the k*MAD band collapses; the fallback flags any deviation from the
    # median instead of emitting NULL for the whole group.
    rows = [(1, i, 42.0) for i in range(20)] + [(1, 99, 9000.0)]
    rows += [(2, i, float(i)) for i in range(21)]  # healthy group for contrast
    df = spark.createDataFrame(rows, "k long, i long, x double")
    out = cleaning.flag_outliers_mad(df, "x", "k", k=3.0).toPandas()
    g1 = out[out.k == 1]
    assert g1.is_outlier.notna().all()  # never NULL
    assert set(g1[g1.is_outlier == 1].i) == {99}
    assert (g1[g1.i != 99].is_outlier == 0).all()


def test_winsorize_clips_to_percentile_band(spark):
    vals = [float(v) for v in range(1, 101)]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, x double")
    out = cleaning.winsorize(df, ["x"], lower=0.05, upper=0.95).toPandas()
    lo, hi = np.percentile(vals, 5), np.percentile(vals, 95)
    assert out["x"].min() == pytest.approx(lo)
    assert out["x"].max() == pytest.approx(hi)
    # interior values untouched
    mid = out[(out.i >= 10) & (out.i < 90)].sort_values("i")["x"]
    assert mid.tolist() == vals[10:90]


def test_stratified_sample_deterministic_and_balanced(spark):
    rows = [(i, f"s{i % 4}") for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, grp string")
    a = cleaning.stratified_sample_hash(df, "grp", "id", 25).toPandas()
    b = cleaning.stratified_sample_hash(df, "grp", "id", 25).toPandas()
    assert sorted(a.id) == sorted(b.id)  # pure function of the data
    by = a.groupby("grp").size()
    # each stratum near 25% of 500
    assert ((by > 80) & (by < 175)).all(), by.to_dict()


def test_hampel_flags_spike_zscore_misses(spark):
    # one wild spike in a flat series: hampel must flag ONLY the spike and
    # replace it with the local median; the flat neighbors stay untouched
    import etl_aws_spark.suite.q_cleaning as qc
    from pyspark.sql import Window, functions as F

    vals = [10.0] * 6 + [500.0] + [10.0] * 6
    rows = [(i, 1, float(i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts double, value double")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-5, 5)
    fr = df.select("event_id", "value", F.collect_list("value").over(w).alias("arr"))
    med = fr.withColumn("rmed", F.expr(qc._median_of("arr", "spark")))
    mad = med.withColumn(
        "rmad", F.expr(qc._median_of("transform(arr, v -> abs(v - rmed))", "spark"))
    )
    flag = F.abs(F.col("value") - F.col("rmed")) > qc._HAMPEL_K * F.col("rmad")
    out = mad.select("event_id", "value", flag.alias("f"),
                     F.when(flag, F.col("rmed")).otherwise(F.col("value")).alias("clean")
                     ).toPandas().set_index("event_id").sort_index()
    assert out.loc[6, "f"] == True  # noqa: E712
    assert out.loc[6, "clean"] == 10.0
    assert out.drop(index=6).f.sum() == 0
