"""Aggregate-operator edge cases: null-safe duplicate counting."""

from __future__ import annotations

from etl_aws_spark.operators import aggregates as agg


def test_duplicate_row_count_nullsafe(spark):
    # pandas df.duplicated().sum() semantics: NaN == NaN for dedup purposes.
    # (1, NULL) appears twice -> 1 duplicate; (2, 'b') twice -> 1 duplicate;
    # (3, NULL) once -> 0. A bare COUNT(DISTINCT a, b) would skip every
    # null-bearing tuple and report 3 duplicates instead of 2.
    rows = [(1, None), (1, None), (2, "b"), (2, "b"), (3, None), (4, "d")]
    df = spark.createDataFrame(rows, "a long, b string")
    out = agg.duplicate_row_count(df).collect()[0]
    assert out.dup_rows == 2


def test_duplicate_row_count_no_nulls_unchanged(spark):
    rows = [(1, "x"), (1, "x"), (1, "x"), (2, "y")]
    df = spark.createDataFrame(rows, "a long, b string")
    assert agg.duplicate_row_count(df).collect()[0].dup_rows == 2


def test_skyline_window_form_equals_brute_dominance(spark):
    # the cumulative-min skyline must equal the O(N^2) NOT EXISTS
    # definition, duplicates (ties on both axes) surviving together
    import duckdb

    from etl_aws_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    got = sorted(
        r.p_partkey for r in all_queries()["sort_skyline_pareto"](spark, sf).collect()
    )
    brute = [
        r[0]
        for r in duckdb.sql(
            f"""
        SELECT p_partkey FROM '{sf}/part.parquet' x
        WHERE NOT EXISTS (
          SELECT 1 FROM '{sf}/part.parquet' y
          WHERE y.p_retailprice <= x.p_retailprice AND y.p_size <= x.p_size
            AND (y.p_retailprice < x.p_retailprice OR y.p_size < x.p_size))
        ORDER BY 1"""
        ).fetchall()
    ]
    assert got == brute and len(got) > 0
