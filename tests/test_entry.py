"""Smoke tests for the driver contract (__spark_entry__.py)."""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as ent


def test_entry_runs_and_returns_rows(spark):
    df = ent.entry(spark)
    assert df.count() > 0
    cols = set(df.columns)
    assert {"user_id", "ts", "value", "value_diff", "lag_1_value_diff", "rolling_mean_3_value_diff"} <= cols


def test_every_query_has_callable_and_registry_consistency():
    qs, oracles = ent.queries(), ent.oracle_sql()
    assert qs, "no queries registered"
    assert set(oracles) <= set(qs)
    for name, fn in qs.items():
        assert callable(fn), name


def test_queries_run_at_sf0001(spark):
    """Every registered query must execute and return a stable schema at the
    smallest scale factor (cheap end-to-end sanity; value checks are in
    tools/check.py against DuckDB)."""
    for name, fn in ent.queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.columns, name
        df.limit(5).collect()
