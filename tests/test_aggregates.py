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


def test_bloom_prefilter_no_false_negatives(spark):
    from etl_aws_spark.operators import sketch

    dim = spark.range(0, 50).selectExpr("id * 3 as k")  # keys 0,3,...,147
    fact = spark.range(0, 300).selectExpr("id as k")
    rep = sketch.bloom_prefilter_report(fact, "k", dim, "k", m_bits=256, n_hashes=2)
    r = rep.collect()[0]
    assert r.n_fact == 300
    assert r.n_true_match == 50
    # a Bloom filter can never reject a true member
    assert r.n_pass_bloom >= r.n_true_match
    assert r.n_false_positive == r.n_pass_bloom - r.n_true_match
    # 100 bits set of 256: FP rate must be well under the reject-nothing 1.0
    assert r.n_pass_bloom < 300


def test_bloom_more_bits_fewer_false_positives(spark):
    from etl_aws_spark.operators import sketch

    dim = spark.range(0, 64).selectExpr("id * 7 as k")
    fact = spark.range(0, 2000).selectExpr("id as k")
    small = sketch.bloom_prefilter_report(fact, "k", dim, "k", m_bits=128, n_hashes=2).collect()[0]
    big = sketch.bloom_prefilter_report(fact, "k", dim, "k", m_bits=2048, n_hashes=2).collect()[0]
    assert big.n_false_positive < small.n_false_positive


def test_hll_estimate_within_error_band(spark):
    from etl_aws_spark.operators import sketch

    # 5000 distinct keys, each seen 3x — estimate must land inside the
    # theoretical 1.04/sqrt(256) ~ 6.5% band (loose 3-sigma: 20%)
    df = spark.range(0, 15000).selectExpr("id % 5000 as k")
    regs = sketch.hll_registers(df, "k", [], p=8)
    est = sketch.hll_fold(regs, [], p=8).collect()[0]
    assert abs(est.est - 5000) / 5000 < 0.20
    # duplicates are invisible to the sketch: same registers for 1 copy
    regs1 = sketch.hll_registers(
        spark.range(0, 5000).selectExpr("id as k"), "k", [], p=8
    )
    assert regs.orderBy("j").collect() == regs1.orderBy("j").collect()


def test_hll_small_range_uses_linear_counting(spark):
    from etl_aws_spark.operators import sketch

    # 30 distinct << 2.5*m: the LC branch is near-exact (empty registers
    # dominate), unlike the raw harmonic estimate at this range
    df = spark.range(0, 30).selectExpr("id as k")
    est = sketch.hll_fold(sketch.hll_registers(df, "k", [], p=8), [], p=8).collect()[0]
    assert est.v_zero > 0
    assert abs(est.est - 30) < 3


def test_hll_union_merge_is_lossless(spark):
    from pyspark.sql import functions as F

    from etl_aws_spark.operators import sketch

    # register-wise max over two halves == registers of the whole
    lo = spark.range(0, 2000).selectExpr("id as k")
    hi = spark.range(1500, 4000).selectExpr("id as k")  # overlapping halves
    whole = lo.unionByName(hi)
    merged = (
        sketch.hll_registers(lo, "k", [], p=8)
        .unionByName(sketch.hll_registers(hi, "k", [], p=8))
        .groupBy("j")
        .agg(F.max("m_reg").alias("m_reg"))
    )
    direct = sketch.hll_registers(whole, "k", [], p=8)
    assert merged.orderBy("j").collect() == direct.orderBy("j").collect()


def test_kmv_linear_regime_is_exact(spark):
    from etl_aws_spark.operators import sketch

    df = spark.createDataFrame([(f"k{i}",) for i in range(40)], "k string")
    sk = sketch.kmv_sketch(df, "k", [], k=64)
    est = sketch.kmv_estimate(sk, [], k=64).collect()[0]
    assert est.sketch_size == 40
    assert est.est == 40.0  # under-full sketch saw the whole key set


def test_kmv_estimate_within_error_band(spark):
    from etl_aws_spark.operators import sketch

    n, k = 5000, 64
    df = spark.createDataFrame([(f"k{i}",) for i in range(n)], "k string")
    sk = sketch.kmv_sketch(df, "k", [], k=k)
    est = sketch.kmv_estimate(sk, [], k=k).collect()[0]
    assert est.sketch_size == k
    # KMV rel. std. error ~ 1/sqrt(k-2) ≈ 12.7%; allow 3 sigma
    assert abs(est.est - n) / n < 0.4


def test_kmv_union_of_sketches_equals_sketch_of_union(spark):
    from pyspark.sql import Window, functions as F
    from etl_aws_spark.operators import sketch

    k = 32
    lo = spark.createDataFrame([(f"k{i}",) for i in range(400)], "k string")
    hi = spark.createDataFrame([(f"k{i}",) for i in range(200, 700)], "k string")
    merged = (
        sketch.kmv_sketch(lo, "k", [], k=k)
        .unionByName(sketch.kmv_sketch(hi, "k", [], k=k))
        .distinct()
        .withColumn("rn", F.row_number().over(Window.orderBy("h")))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
    direct = sketch.kmv_sketch(lo.unionByName(hi), "k", [], k=k)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0
