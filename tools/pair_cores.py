"""Paired per-query timing at two core counts (r13 verdict #2/#7).

Usage: python tools/pair_cores.py <query> [query ...] -- [reps]

For each query, runs best-of-<reps> noop-sink timings in a fresh session
per core count (8 then 32 by default, override with SPARK_GRAFT_PAIR_CPUS
="8,32"), ALTERNATING core counts so sandbox drift hits both legs. The
master is fixed per JVM, so each leg is its own spawned subprocess; a
warm run precedes the timed ones (plan + JIT + page cache).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
os.environ["SPARK_GRAFT_CPUS"] = %(cpus)r
from etl_aws_spark.session import get_session
from etl_aws_spark.registry import all_queries
spark = get_session("pair-cores-%(cpus)s")
spark.sparkContext.setLogLevel("ERROR")
qs = dict(all_queries())
out = {}
for name in %(names)r:
    fn = qs[name]
    fn(spark, %(sf)r).write.format("noop").mode("overwrite").save()
    runs = []
    for _ in range(%(reps)d):
        t0 = time.time()
        fn(spark, %(sf)r).write.format("noop").mode("overwrite").save()
        runs.append(round(time.time() - t0, 3))
    out[name] = runs
print("PAIRJSON " + json.dumps(out))
"""


def run_leg(repo: str, cpus: str, names: list[str], sf: str, reps: int) -> dict:
    code = _CHILD % {
        "repo": repo, "cpus": cpus, "names": names, "sf": sf, "reps": reps,
    }
    p = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True
    )
    for line in p.stdout.splitlines():
        if line.startswith("PAIRJSON "):
            return json.loads(line[len("PAIRJSON "):])
    raise RuntimeError(f"leg cpus={cpus} failed:\n{p.stderr[-2000:]}")


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if "--" in args:
        i = args.index("--")
        reps = int(args[i + 1])
        args = args[:i]
    names = args
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpu_pair = os.environ.get("SPARK_GRAFT_PAIR_CPUS", "8,32").split(",")
    legs: dict[str, list[dict]] = {c: [] for c in cpu_pair}
    # two alternating passes per core count so drift hits both directions
    for _pass in range(2):
        for c in cpu_pair:
            legs[c].append(run_leg(repo, c, names, sf, reps))
            print(f"  pass {_pass} cpus={c}: "
                  + json.dumps(legs[c][-1]), file=sys.stderr)
    result = {}
    for name in names:
        row = {}
        for c in cpu_pair:
            best = min(min(leg[name]) for leg in legs[c])
            row[f"c{c}"] = best
        a, b = cpu_pair
        row["ratio"] = round(row[f"c{a}"] / row[f"c{b}"], 3)
        result[name] = row
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
