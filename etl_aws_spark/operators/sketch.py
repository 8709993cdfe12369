"""Count-min sketch — the mergeable frequency sketch beside the engine's
HLL++ (distinct) and Greenwald-Khanna (quantile) sketch surfaces.

A CMS is a depth x width grid of counters; each key increments one
counter per depth row (seeded hash) and its frequency estimate is the
MIN over its depth cells — never an undercount, overcount bounded by
collisions (Cormode & Muthukrishnan 2005). The grid is tiny bounded
state (depth·width longs), built with map-side-combined aggregates and
broadcast back — the same scale posture as every sketch: corpus scanned
once, sketch mergeable across partitions by cell-wise addition.

Hashing reuses the engine's md5-derived 60-bit family
(`text/_dialect.hash60`) with a per-depth seed, so the oracle replays
every bucket — and therefore every estimate — exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_aws_spark.text import _dialect as D


def _bucket_expr(j: int, width: int, dialect: str) -> str:
    """Depth-``j`` CMS bucket of the string column ``key``."""
    h = D.hash60(f"concat('cms{j}:', key)", dialect)
    return f"({h}) % {width}"


def count_min_estimates(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 32
) -> DataFrame:
    """Exact counts, CMS estimates, and the per-key overcount.

    Two-level shape chosen for 100 TB: the corpus collapses to per-key
    exact counts FIRST (one narrow shuffle — needed anyway to report the
    estimation error); buckets, the grid, and the min-estimate are then
    computed on the distinct-key frame only, with the depth·width grid
    broadcast for the lookup join. A production ingest-side CMS skips the
    exact pass and aggregates (depth, bucket) straight off the stream —
    same grid, same estimates; the exact counts here are the accuracy
    harness, exactly like `agg_approx_distinct_error` does for HLL.

    Output: (key, exact_n, cms_est, overcount) with cms_est >= exact_n
    guaranteed by construction.
    """
    exact = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("exact_n")
    )
    pairs = exact.select(
        "key",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("depth"),
                        F.expr(_bucket_expr(j, width, D.SPARK)).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("p"),
    ).select("key", "exact_n", F.col("p.depth").alias("depth"), F.col("p.bucket").alias("bucket"))
    grid = pairs.groupBy("depth", "bucket").agg(F.sum("exact_n").alias("cell_n"))
    est = (
        pairs.join(F.broadcast(grid), ["depth", "bucket"])
        .groupBy("key", "exact_n")
        .agg(F.min("cell_n").alias("cms_est"))
    )
    return est.select(
        "key",
        F.col("exact_n").cast("long").alias("exact_n"),
        F.col("cms_est").cast("long").alias("cms_est"),
        (F.col("cms_est") - F.col("exact_n")).cast("long").alias("overcount"),
    )


def count_min_oracle_sql(
    table: str, key_col: str, depth: int = 4, width: int = 32
) -> str:
    """DuckDB mirror of :func:`count_min_estimates` (identical seeds,
    identical 60-bit hash family, identical grid)."""
    branches = " UNION ALL ".join(
        f"SELECT key, exact_n, {j} AS depth, {_bucket_expr(j, width, D.DUCK)} AS bucket FROM exact"
        for j in range(depth)
    )
    return f"""
    WITH exact AS (
      SELECT CAST({key_col} AS VARCHAR) AS key, count(*) AS exact_n
      FROM {table} GROUP BY 1
    ), pairs AS (
      {branches}
    ), grid AS (
      SELECT depth, bucket, sum(exact_n) AS cell_n FROM pairs GROUP BY 1, 2
    )
    SELECT p.key,
           CAST(p.exact_n AS BIGINT) AS exact_n,
           CAST(min(g.cell_n) AS BIGINT) AS cms_est,
           CAST(min(g.cell_n) - p.exact_n AS BIGINT) AS overcount
    FROM pairs p JOIN grid g USING (depth, bucket)
    GROUP BY p.key, p.exact_n
    """


def bloom_bits(
    keys: DataFrame, key_col: str, m_bits: int = 1024, n_hashes: int = 2
) -> DataFrame:
    """Build a Bloom filter over a key set as ``m_bits/32`` packed longs
    ``(word_idx, word)`` — an exact-arithmetic bitset both engines can
    replay (the md5-derived position family again). The build is one
    explode + one ``bit_or`` aggregate; the result is broadcast-sized by
    construction (16 rows here)."""
    pos_exprs = [
        F.expr("(%s) %% %d" % (D.hash60("concat('bloom%d:', key)" % j, D.SPARK), m_bits))
        for j in range(n_hashes)
    ]
    pos = keys.select(F.col(key_col).cast("string").alias("key")).select(
        F.explode(F.array(*pos_exprs)).alias("p")
    )
    # 32-bit lanes: DuckDB's checked BIGINT shift rejects 1 << 63, so both
    # engines pack positions as (p div 32, 1 << (p % 32)) — max shift 31
    return pos.select(
        F.expr("p div 32").cast("int").alias("word_idx"),
        F.expr("shiftleft(cast(1 as bigint), cast(p % 32 as int))").alias("bit"),
    ).groupBy("word_idx").agg(F.bit_or("bit").alias("word"))


def bloom_prefilter_report(
    fact: DataFrame,
    fact_key: str,
    dim_keys: DataFrame,
    dim_key: str,
    m_bits: int = 1024,
    n_hashes: int = 2,
) -> DataFrame:
    """The classic 100 TB shuffle-reduction move, measured: broadcast a
    Bloom filter of the (filtered) dimension's keys and prefilter the fact
    table BEFORE its join shuffle — rows the filter rejects never enter
    the Exchange (Spark's AQE runtime row-filtering does this implicitly;
    this is the explicit, engine-checkable form). The report quantifies
    the trade: fact rows in, rows passing the bloom, true matches, false
    positives, and the false-positive rate.

    Every hash position is md5-derived integer arithmetic, so the oracle
    replays membership — and the exact FP count — bit-for-bit.
    """
    words = bloom_bits(dim_keys, dim_key, m_bits, n_hashes)
    probe = fact.select(F.col(fact_key).cast("string").alias("key"))
    checked = probe
    for j in range(n_hashes):
        p = F.expr("(%s) %% %d" % (D.hash60("concat('bloom%d:', key)" % j, D.SPARK), m_bits))
        w = words.select(
            F.col("word_idx").alias(f"_wi{j}"), F.col("word").alias(f"_w{j}")
        )
        checked = checked.withColumn(f"_p{j}", p).join(
            F.broadcast(w),
            F.expr(f"_p{j} div 32") == F.col(f"_wi{j}"),
            "left",
        ).withColumn(
            f"_hit{j}",
            F.coalesce(
                F.expr(f"(_w{j} & shiftleft(cast(1 as bigint), cast(_p{j} % 32 as int))) != 0"),
                F.lit(False),
            ),
        )
    passed = checked.withColumn(
        "bloom_pass", F.expr(" AND ".join(f"_hit{j}" for j in range(n_hashes)))
    )
    truth = dim_keys.select(
        F.col(dim_key).cast("string").alias("key"), F.lit(True).alias("is_match")
    ).distinct()
    marked = passed.join(F.broadcast(truth), "key", "left").select(
        "bloom_pass", F.coalesce("is_match", F.lit(False)).alias("is_match")
    )
    return marked.agg(
        F.count(F.lit(1)).alias("n_fact"),
        F.sum(F.col("bloom_pass").cast("int")).cast("long").alias("n_pass_bloom"),
        F.sum(F.col("is_match").cast("int")).cast("long").alias("n_true_match"),
        F.sum((F.col("bloom_pass") & ~F.col("is_match")).cast("int"))
        .cast("long")
        .alias("n_false_positive"),
        (
            F.round(
                F.sum((F.col("bloom_pass") & ~F.col("is_match")).cast("int"))
                / F.nullif(F.count(F.lit(1)).cast("double"), F.lit(0.0)),
                6,
            )
            + F.lit(0.0)
        ).alias("fp_rate"),
    )


# --------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007) — the mergeable distinct-count sketch.
# Registers are integer state (max leading-zero ranks of a shared 60-bit
# hash), mergeable across partitions/segments with plain MAX; the estimate
# is replayed exactly by the oracle because the harmonic-mean denominator
# is folded in FIXED POINT (Σ 2^(50-M_j) as int64 — no float summation
# order) and every float literal is e-notation (plain `0.7213` parses as
# DECIMAL in both engines with different division rules; measured
# 5th-decimal divergence). Safe for p ≤ 12: m·2^50 ≤ 2^62 < int64 max.

def hll_hash_expr(key: str) -> str:
    """Dialect-neutral argument for hash60: salted stringified key."""
    return f"concat('hll:', cast({key} as string))"


def hll_rho_expr(dialect: str, p: int = 8) -> str:
    """Rank of the first set bit of the (60-p) post-index hash bits, capped
    at 50 so the fixed-point weight 2^(50-ρ) stays integral. `bin()` emits
    the minimal binary string in both engines (verified incl. bin(0)='0');
    column ``h`` must hold the 60-bit hash."""
    m = 1 << p
    wbits = 60 - p
    div = "div" if dialect == D.SPARK else "//"
    return (
        f"least(CASE WHEN h {div} {m} = 0 THEN {wbits + 1} "
        f"ELSE {wbits + 1} - length(bin(h {div} {m})) END, 50)"
    )


def hll_est_expr(p: int = 8) -> str:
    """Bias-corrected HLL estimate over columns ``s_fixed`` (int64 fixed-
    point denominator) and ``v_zero`` (empty-register count) — identical
    text for both engines: α_m·m²·2^50 / s_fixed, with the linear-counting
    small-range branch below 2.5·m (α_m = 0.7213/(1+1.079/m), m ≥ 128)."""
    m = 1 << p
    num = f"(0.7213e0 / (1.0e0 + 1.079e0 / {m}.0e0)) * {m * m}.0e0 * 1125899906842624.0e0"
    e_raw = f"{num} / cast(s_fixed as double)"
    return (
        f"CASE WHEN {e_raw} <= {int(2.5 * m)}.0e0 AND v_zero > 0 "
        f"THEN {m}.0e0 * ln({m}.0e0 / cast(v_zero as double)) ELSE {e_raw} END"
    )


def hll_registers(df: DataFrame, key: str, group_cols: list[str], p: int = 8) -> DataFrame:
    """(group_cols…, j, m_reg) HLL register rows — the mergeable state.
    One narrow hash aggregate over the scan; map-side combine applies."""
    m = 1 << p
    h = D.hash60(hll_hash_expr(key), D.SPARK)
    return (
        df.selectExpr(*group_cols, f"{h} AS h")
        .selectExpr(*group_cols, f"h % {m} AS j", f"{hll_rho_expr(D.SPARK, p)} AS rho")
        .groupBy(*group_cols, "j")
        .agg(F.max("rho").alias("m_reg"))
    )


def hll_fold(regs: DataFrame, group_cols: list[str], p: int = 8) -> DataFrame:
    """Fold register rows into one estimate row per group: columns
    ``n_hit``, ``v_zero`` and unrounded ``est``. Register rows from any
    number of segments may be unioned first — max-merge is lossless."""
    m = 1 << p
    gb = regs.groupBy(*group_cols) if group_cols else regs.groupBy()
    sk = gb.agg(
        F.count(F.lit(1)).alias("n_hit"),
        F.expr("sum(shiftleft(cast(1 as bigint), cast(50 - m_reg as int)))").alias("s_obs"),
    )
    return sk.selectExpr(
        *group_cols,
        "n_hit",
        f"{m} - n_hit AS v_zero",
        f"s_obs + ({m} - n_hit) * 1125899906842624 AS s_fixed",
    ).selectExpr(*group_cols, "n_hit", "v_zero", f"{hll_est_expr(p)} AS est")


# ---------------------------------------------------------------------------
# KMV (k minimum values) distinct sketch — Bar-Yossef et al. 2002. Keeps the
# k smallest 60-bit hashes of the key set; the k-th smallest normalized hash
# R estimates |S| ≈ (k-1)/R. Unlike HLL it supports DIRECT set operations:
# the k smallest of S_a ∪ S_b are computable from the two sketches alone,
# and Jaccard(S_a, S_b) is estimated by the co-membership share inside that
# union sketch — no inclusion-exclusion error stacking. Same md5 hash60
# bridge as every sketch here, so the oracle replays every hash exactly.

KMV_HASH_SPACE = float(1 << 60)  # exact as a double (power of two)


def kmv_hash_expr(key: str) -> str:
    """Dialect-neutral argument for hash60: salted stringified key."""
    return f"concat('kmv:', cast({key} as string))"


def kmv_sketch(df: DataFrame, key: str, group_cols: list[str], k: int = 64) -> DataFrame:
    """(group_cols…, h) — the k smallest distinct key hashes per group.

    Shape for 100 TB: the distinct collapses the corpus to one row per
    (group, hash) — map-side combined — and the rank window then sees at
    most |distinct keys| rows per group, of which it keeps k. A production
    variant replaces the window with a size-k bounded heap aggregate;
    the window form is exactly replayable by the SQL oracle."""
    from pyspark.sql import Window

    h = D.hash60(kmv_hash_expr(key), D.SPARK)
    hashed = df.selectExpr(*group_cols, f"{h} AS h").distinct()
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def kmv_estimate(sk: DataFrame, group_cols: list[str], k: int = 64) -> DataFrame:
    """Fold sketch rows to (group_cols…, sketch_size, kth_min_hash, est).

    Linear regime: a sketch holding fewer than k hashes saw the whole key
    set — the count IS the (exact) estimate. Full sketch: (k-1)/R with
    R = kth_hash / 2^60; all-double arithmetic on integer-exact inputs, so
    both engines compute the identical IEEE value."""
    gb = sk.groupBy(*group_cols) if group_cols else sk.groupBy()
    agg = gb.agg(F.count(F.lit(1)).alias("sketch_size"), F.max("h").alias("kth_min_hash"))
    est = F.when(
        F.col("sketch_size") < k, F.col("sketch_size").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(KMV_HASH_SPACE) / F.col("kth_min_hash").cast("double")
    )
    return agg.withColumn("est", est)
