"""Z-order layout: Morton-code correctness and the 2-D pruning win."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_aws_spark.operators import layout


def _morton_py(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for j in range(bits):
        z |= ((x >> j) & 1) << (2 * j)
        z |= ((y >> j) & 1) << (2 * j + 1)
    return z


def test_zvalue_matches_python_reference(spark):
    rows = [(x, y) for x in (0, 1, 5, 255, 19999) for y in (0, 2, 99, 999)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select(
        "x", "y", F.expr(layout.zvalue_sql("x", "y", 16, layout.SPARK)).alias("z")
    ).collect()
    for r in got:
        assert r.z == _morton_py(r.x, r.y), (r.x, r.y)


def test_zorder_prunes_where_single_sort_cannot(spark):
    # grid data: both dims uniform and independent — the worst case for a
    # single sort key, the design case for z-order
    df = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    box = (0, 15, 0, 15)  # one-sixteenth of each dimension
    zstats = layout.zorder_bucket_stats(
        df, "x", "y", q_bits=6, prefix_bits=4, box=box
    ).toPandas()
    assert zstats.n_rows.sum() == 4096
    # z-buckets are 2-D tiles: only the tile(s) containing the box overlap
    z_hit = int(zstats.overlaps_box.sum())
    assert z_hit <= 4, zstats.sort_values("bucket")

    # same data bucketed by x alone (a single-column sort layout): every
    # x-stripe spans the full y domain, so y adds no pruning — and a box
    # this selective on y still hits every bucket that matches x... while
    # a layout sorted on an UNCORRELATED column (id order here ~ y order)
    # prunes nothing on x at all
    naive = (
        df.withColumn("bucket", (F.col("y") / 4).cast("long"))  # id-order files
        .groupBy("bucket")
        .agg(
            F.min("x").alias("min_x"), F.max("x").alias("max_x"),
            F.min("y").alias("min_y"), F.max("y").alias("max_y"),
        )
        .withColumn(
            "overlaps_box",
            (F.col("min_x") <= box[1]) & (F.col("max_x") >= box[0])
            & (F.col("min_y") <= box[3]) & (F.col("max_y") >= box[2]),
        )
        .toPandas()
    )
    naive_hit = int(naive.overlaps_box.sum())
    # id-order files: every file spans all of x, so only the y bound
    # prunes; z-order must strictly beat it
    assert z_hit < naive_hit or naive_hit == len(naive)


def test_write_zordered_files_have_tight_2d_ranges(spark, tmp_path):
    df = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    path = str(tmp_path / "zordered")
    layout.write_zordered(df, path, "x", "y", q_bits=6, n_files=16)
    back = spark.read.parquet(path)
    assert back.count() == 4096
    per_file = (
        back.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(
            (F.max("x") - F.min("x")).alias("span_x"),
            (F.max("y") - F.min("y")).alias("span_y"),
        )
        .toPandas()
    )
    # a z-ordered file covers a compact tile: the PRODUCT of its spans is
    # far below the full 64x64 domain (a single-sort layout has one span
    # always ~63)
    areas = (per_file.span_x + 1) * (per_file.span_y + 1)
    assert areas.median() <= 1024, per_file


def test_gdpr_dynamic_overwrite_leaves_untouched_partitions_alone(spark, tmp_path):
    """The targeted-delete invariant: dynamic partition overwrite rewrites
    ONLY partitions containing delete-set rows — files in untouched
    partitions keep their exact paths and bytes."""
    import os

    tree = str(tmp_path / "tree")
    # users 0..9; user 7 has rows ONLY on days 1 and 3
    rows = [(i, (i % 5) + 1 if i % 10 != 7 else (1 if i % 20 == 7 else 3), i % 10)
            for i in range(400)]
    df = spark.createDataFrame(rows, "event_id long, dia int, user_id long")
    df.repartition(2).write.mode("overwrite").partitionBy("dia").parquet(tree)

    def snapshot():
        out = {}
        for root, _dirs, files in os.walk(tree):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    st = os.stat(p)
                    out[p] = (st.st_size, st.st_mtime_ns)
        return out

    before = snapshot()
    delset = spark.createDataFrame([(7,)], "user_id long")
    affected = [r.dia for r in spark.read.parquet(tree)
                .join(F.broadcast(delset), "user_id", "leftsemi")
                .select("dia").distinct().collect()]
    assert sorted(affected) == [1, 3]
    cleaned = (spark.read.parquet(tree)
               .filter(F.col("dia").isin(affected))
               .join(F.broadcast(delset), "user_id", "left_anti"))
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        cleaned.write.mode("overwrite").partitionBy("dia").parquet(tree)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    after = snapshot()
    untouched_before = {p: v for p, v in before.items()
                        if "/dia=1/" not in p and "/dia=3/" not in p}
    untouched_after = {p: v for p, v in after.items()
                       if "/dia=1/" not in p and "/dia=3/" not in p}
    assert untouched_before == untouched_after  # byte+mtime identical
    back = spark.read.parquet(tree)
    assert back.filter(F.col("user_id") == 7).count() == 0
    assert back.count() == 400 - 40
