"""Sweep session confs for a query set at fixed cores (r13 verdict #7).

Usage: SPARK_GRAFT_CPUS=32 python tools/conf_sweep.py "<conf=val,...>;<conf=val,...>" <query ...> [-- reps]

Each conf variant runs in its own subprocess session (fresh JVM), variants
alternate over two passes so sandbox drift hits all of them; reports
best-of per query per variant.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from etl_aws_spark.session import get_session
from etl_aws_spark.registry import all_queries
spark = get_session("conf-sweep", extra_conf=%(conf)r)
spark.sparkContext.setLogLevel("ERROR")
for k, v in %(conf)r.items():
    try: spark.conf.set(k, v)
    except Exception: pass
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
print("SWEEPJSON " + json.dumps(out))
"""


def run_leg(repo, conf, names, sf, reps):
    code = _CHILD % {"repo": repo, "conf": conf, "names": names, "sf": sf, "reps": reps}
    p = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True,
                       env=os.environ)
    for line in p.stdout.splitlines():
        if line.startswith("SWEEPJSON "):
            return json.loads(line[len("SWEEPJSON "):])
    raise RuntimeError(f"leg {conf} failed:\n{p.stderr[-2000:]}")


def main():
    args = sys.argv[1:]
    reps = 3
    if "--" in args:
        i = args.index("--")
        reps = int(args[i + 1])
        args = args[:i]
    variants = []
    for spec in args[0].split(";"):
        conf = {}
        if spec.strip():
            for kv in spec.split(","):
                k, v = kv.split("=", 1)
                conf[k.strip()] = v.strip()
        variants.append(conf)
    names = args[1:]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    legs = [[] for _ in variants]
    for _pass in range(2):
        for vi, conf in enumerate(variants):
            legs[vi].append(run_leg(repo, conf, names, sf, reps))
            print(f"  pass {_pass} v{vi} {conf}: {json.dumps(legs[vi][-1])}",
                  file=sys.stderr)
    result = {}
    for name in names:
        result[name] = {
            f"v{vi}": min(min(leg[name]) for leg in legs[vi])
            for vi in range(len(variants))
        }
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
