"""Sketch aggregates: count-min frequency estimates."""

from __future__ import annotations

def test_count_min_never_undercounts_and_collides(spark):
    from etl_aws_spark.operators import sketch

    rows = [(f"u{i % 40}",) for i in range(4000)]
    df = spark.createDataFrame(rows, "user string")
    out = sketch.count_min_estimates(df, "user", depth=4, width=8).toPandas()
    assert len(out) == 40
    assert (out.cms_est >= out.exact_n).all()
    assert (out.overcount >= 0).all()
    # 40 keys into 8 buckets per depth: some collision must survive the min
    assert out.overcount.sum() > 0
    # a deeper sketch can only tighten estimates (min over a superset)
    deeper = sketch.count_min_estimates(df, "user", depth=8, width=8).toPandas()
    m = out.set_index("key").cms_est
    d = deeper.set_index("key").cms_est
    assert (d <= m).all()
