"""Query registry: one named query per SURVEY.md §2 operator ID.

Each operator module in ``suite/`` registers a (PySpark callable, DuckDB
oracle SQL) pair with the :func:`query` decorator. ``__spark_entry__.py``
exposes the registry to the driver.

Conventions (see FIXTURES.md §C determinism rules):
- every computed column is aliased identically in Spark and SQL;
- double aggregates are rounded to 4 decimals in BOTH engines so
  floating-point summation order can't flip the value hash;
- derived integer columns are cast to BIGINT in both engines (Spark and
  DuckDB default some extractions to different widths);
- ordering-sensitive ops carry a full tie-break key;
- queries with no SQL-expressible semantics register ``oracle=None`` and
  get the driver's weaker rows-only check.

Rows-only denominator (CLOSED — see SURVEY.md §8, VERDICT r9; r11
promoted ``model_persist_pickle`` to a metadata value-hash oracle):
exactly four registered queries carry ``oracle=None``, all inherently
non-deterministic model fits whose outputs depend on JVM-side impurity
heuristics, random-forest seeds, or iterative ARMA estimation —
``model_gbt_fit_predict``, ``model_gbt_grid_search``,
``model_gbt_halving_search``,
``model_sarimax_per_group``. Each is pinned instead by unit tests
(tests/test_ml.py: signal-recovery, round-trip, and parameter-recovery
assertions). Every other query has an exact DuckDB value-hash oracle; do
not add a rows-only query without a pinning test and a SURVEY §8 note.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB, or None -> rows-only check
    category: str


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, category: str = "") -> Callable:
    """Register a named query with its DuckDB oracle SQL (or None)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        if name in REGISTRY:
            raise ValueError(f"duplicate query id: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, category=category)
        return fn

    return deco


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table. Parquet scan: columnar, pushdown-capable."""
    from etl_aws_spark.sources.readers import read_table

    return read_table(spark, sf_dir, name)


def _cost_order(names) -> list[str]:
    """Order query names by driver-coverage need, then cost.

    The driver evaluates ``queries()`` in dict order under a budget that
    has recorded correctness rows for exactly the first 50 entries each
    round. Sorting cheapest-first alone (round 2) re-verified already-green
    queries while 30 never received a driver row. The fix: primary key is
    the last round in which the driver recorded a row for the query
    (never-recorded sorts first as round 0), secondary key is measured
    sf0.01 wall cost so the budget stretches over as many queries as
    possible. ``tools/update_coverage.py`` regenerates the coverage table
    from CORRECTNESS_r*.json after each round, so successive rounds walk
    the registry toward 100% union coverage.
    """
    try:
        from etl_aws_spark.suite._costs import COSTS
    except ImportError:  # pragma: no cover - costs file is generated
        COSTS = {}
    try:
        from etl_aws_spark.suite._coverage import LAST_DRIVER_ROUND
    except ImportError:  # pragma: no cover - coverage file is generated
        LAST_DRIVER_ROUND = {}
    return sorted(
        names,
        key=lambda n: (LAST_DRIVER_ROUND.get(n, 0), COSTS.get(n, 1.0)),
    )


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_suite_loaded()
    return {name: REGISTRY[name].fn for name in _cost_order(REGISTRY)}


def all_oracles() -> dict[str, str]:
    _ensure_suite_loaded()
    return {
        name: REGISTRY[name].oracle
        for name in _cost_order(REGISTRY)
        if REGISTRY[name].oracle is not None
    }


def _ensure_suite_loaded() -> None:
    # import for side effect: suite modules self-register
    import etl_aws_spark.suite  # noqa: F401
