"""Dump `.explain("formatted")` for headline (or named) queries to files.

Usage: python tools/dump_plans.py <out_dir> <suffix> [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each query — the plan-claim
evidence the optimization rounds commit under plans/r<N>/.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)

    from etl_aws_spark.registry import all_queries
    from etl_aws_spark.session import get_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")

    queries = dict(all_queries())
    if not names:
        import bench

        names = [n for n in bench.HEADLINE if n in queries]

    for name in names:
        fn = queries.get(name)
        if fn is None:
            print(f"  SKIP {name}: not registered", file=sys.stderr)
            continue
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"  wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
