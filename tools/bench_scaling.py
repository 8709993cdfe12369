"""Scaling spot-bench: time a query subset at two scale factors and report
the wall-clock ratio against the data-size ratio.

The r4 verdict's ask: the 100x design story rests on plan reading; this
measures the sf0.1 -> sf1 slope for the most expensive headline queries
plus the two documented-tradeoff compositions (text_tfidf_top_terms's
skewed document-frequency window, pipeline_corpus_refined's 6-shuffle
chain). A query scaling ~linearly (ratio ~= 10x data at equal parallelism,
minus fixed overheads) validates the plan; a super-linear one has a
quadratic term the plan audit missed.

Usage: python tools/bench_scaling.py [sf_small_dir] [sf_big_dir]
Prints one JSON line {query: {small, big, ratio}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "pipeline_refined",
    "showcase_regional_revenue_5way",
    "text_fingerprint",
    "text_dedup_near_minhash",
    "q_feature_block",
    "text_tfidf_top_terms",
    "pipeline_corpus_refined",
]

# override the query subset: SPARK_GRAFT_SCALING_QUERIES="a,b,c"
_env_qs = os.environ.get("SPARK_GRAFT_SCALING_QUERIES")
if _env_qs:
    QUERIES = [q.strip() for q in _env_qs.split(",") if q.strip()]

REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/etl_aws_spark_sf1"

    from etl_aws_spark.operators.windows import glue_feature_block
    from etl_aws_spark.registry import all_queries
    from etl_aws_spark.session import get_session
    from etl_aws_spark.sources.readers import read_table

    spark = get_session("bench-scaling")
    spark.sparkContext.setLogLevel("ERROR")

    queries = dict(all_queries())
    queries["q_feature_block"] = lambda s, d: glue_feature_block(
        read_table(s, d, "events"), "value", "user_id", ["ts", "event_id"]
    )

    def best_of(fn, sf_dir: str) -> float:
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        runs = []
        for _ in range(REPEATS):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        return min(runs)

    out = {}
    for name in QUERIES:
        fn = queries[name]
        t_small = best_of(fn, small)
        t_big = best_of(fn, big)
        out[name] = {
            "small": t_small,
            "big": t_big,
            "ratio": round(t_big / t_small, 2),
        }
        print(f"  {name}: {t_small}s -> {t_big}s  ({out[name]['ratio']}x)", file=sys.stderr)

    print(json.dumps({"small_dir": small, "big_dir": big, "queries": out}))


if __name__ == "__main__":
    main()
