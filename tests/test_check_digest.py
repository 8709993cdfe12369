"""The engine-side digest protocol in tools/check.py is correctness-
critical harness code (it IS the sf1 gate for results too large to
transfer), so its detection power is pinned here: agreement passes,
and every failure mode — row count, column set, any single value —
must FAIL."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
from check import digest_compare  # noqa: E402


@pytest.fixture(scope="module")
def sdf(spark):
    return spark.createDataFrame(
        [(1, 10, "x"), (2, -20, "y"), (3, 30, None)],
        "a long, b int, c string",
    )


BASE = "SELECT * FROM (VALUES (1, 10, 'x'), (2, -20, 'y'), (3, 30, NULL)) t(a, b, c)"


def test_digest_agreement(spark, sdf):
    status, msg = digest_compare(sdf, duckdb.connect(), BASE)
    assert status == "OK", msg
    assert "n=3" in msg


def test_digest_detects_rowcount(spark, sdf):
    status, msg = digest_compare(sdf, duckdb.connect(), BASE + " LIMIT 2")
    assert status == "FAIL" and "rowcount" in msg


def test_digest_detects_value_flip(spark, sdf):
    flipped = BASE.replace("(2, -20, 'y')", "(2, -21, 'y')")
    status, msg = digest_compare(sdf, duckdb.connect(), flipped)
    assert status == "FAIL" and "digest" in msg


def test_digest_detects_column_set(spark, sdf):
    status, msg = digest_compare(
        sdf, duckdb.connect(), "SELECT a, b, c AS d FROM (" + BASE + ")"
    )
    assert status == "FAIL" and "columns" in msg


def test_digest_refuses_float_schema(spark):
    f = spark.createDataFrame([(1, 0.5)], "a long, x double")
    status, msg = digest_compare(f, duckdb.connect(), "SELECT 1 AS a, 0.5 AS x")
    assert status == "FAIL" and "schema" in msg


def test_digest_detects_null_position_swap(spark):
    """ADVICE r11 regression: concat_ws skips NULLs, so under the old
    row encoding ('x', NULL) and (NULL, 'x') digested equal. The
    length-prefixed NULL-sentinel cells must tell them apart."""
    sdf = spark.createDataFrame([(1, "x", None)], "a long, b string, c string")
    swapped = "SELECT * FROM (VALUES (1, NULL, 'x')) t(a, b, c)"
    status, msg = digest_compare(sdf, duckdb.connect(), swapped)
    assert status == "FAIL" and "digest" in msg


def test_digest_detects_boundary_straddle(spark):
    """A '|' inside a value must not alias a column boundary: ('a|b', 'c')
    vs ('a', 'b|c') digested equal under the old '|'-join. The length
    prefixes make the row string prefix-decodable."""
    sdf = spark.createDataFrame([(1, "a|b", "c")], "a long, b string, c string")
    straddled = "SELECT * FROM (VALUES (1, 'a', 'b|c')) t(a, b, c)"
    status, msg = digest_compare(sdf, duckdb.connect(), straddled)
    assert status == "FAIL" and "digest" in msg
