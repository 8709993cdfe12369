"""Second-scale-octave spot-bench (r12 verdict #4): Spark walls for the
heaviest queries at sf1 AND sf3 in ONE session, so the sf1->sf3 ratio is
phase-free. Every prior slope was sf0.1->sf1; this adds the octave that
turns the 100x extrapolation into two measured points per query.

Fixtures: tools/gen_sf1.py <dir> 10|30  (sf3 = 30 replicas of sf0.1 with
key offsets + text-shuffle/embedding-resample, so per-unit-data structure
is identical across octaves and a ratio >3x is plan behavior, not fixture
artifact). Walls are noop-sink (full execution, no collect), best-of-2
after a warm run, interleaved sf1/sf3 per query to keep phase drift out
of the ratio.

Usage: python tools/octave_bench.py [query ...]   (default: the 6 heaviest)
Prints one JSON line: {"queries": {name: {"sf1": s, "sf3": s, "ratio": r}}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = "/tmp/etl_aws_spark_sf1"
SF3 = "/tmp/etl_aws_spark_sf3"

HEAVY = [
    "graph_triangle_clustering",
    "text_dedup_connected_components",
    "text_dedup_keep_best",
    "pipeline_corpus_release",
    "pipeline_semantic_dedup",
    "streaming_knn_index_maintenance",
]


def wall(fn, spark, sf_dir: str, repeats: int = 2) -> float:
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def main() -> None:
    names = sys.argv[1:] or HEAVY
    from etl_aws_spark.session import get_session
    from etl_aws_spark import registry

    spark = get_session()
    qs = registry.all_queries()
    out = {}
    for name in names:
        fn = qs[name]
        s1 = wall(fn, spark, SF1)
        s3 = wall(fn, spark, SF3)
        out[name] = {"sf1": s1, "sf3": s3, "ratio": round(s3 / s1, 2)}
        print(f"# {name}: sf1={s1}s sf3={s3}s ratio={out[name]['ratio']}x",
              file=sys.stderr)
    print(json.dumps({"queries": out}))


if __name__ == "__main__":
    main()
