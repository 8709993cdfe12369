"""Per-stage empirical profile of one registry query (guide §1.1).

Runs the query isolated (noop sink, warm + timed run), then dumps every
stage of the timed run from the UI REST API sorted by executor run time,
with shuffle read/write bytes, task counts, and the stage's call-site name.
This is the "open the Stages tab" loop, scriptable.

Usage: python tools/profile_query.py <query> [sf_dir] [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from etl_aws_spark.registry import all_queries
    from etl_aws_spark.session import get_session

    spark = get_session("profile", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    fn = dict(all_queries())[name]

    # warm: plan + JIT + page cache
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def stages() -> list[dict]:
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=complete") as r:
            return json.loads(r.read())

    def jobs() -> list[dict]:
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded") as r:
            return json.loads(r.read())

    seen_jobs = {j["jobId"] for j in jobs()}
    seen = {s["stageId"] for s in stages()}
    walls = []
    for _ in range(repeats):
        t0 = time.time()
        spark.sparkContext.setJobDescription(f"profile:{name}")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls.append(round(time.time() - t0, 3))
    new = [s for s in stages() if s["stageId"] not in seen]
    new_jobs = sorted(
        (j for j in jobs() if j["jobId"] not in seen_jobs),
        key=lambda j: j["jobId"],
    )

    new.sort(key=lambda s: -s.get("executorRunTime", 0))
    total_run = sum(s.get("executorRunTime", 0) for s in new)
    total_cpu = sum(s.get("executorCpuTime", 0) for s in new) / 1e6
    print(f"query={name} wall_best={min(walls)} runs={walls} "
          f"stages={len(new)} sum_executorRunTime={total_run/1000.0:.2f}s "
          f"sum_executorCpuTime={total_cpu/1000.0:.2f}s")
    print(f"{'stage':>6} {'run_ms':>8} {'cpu_ms':>8} {'tasks':>5} {'in_MB':>7} "
          f"{'shR_MB':>7} {'shW_MB':>7} {'spill':>6}  name")
    for s in new[:30]:
        print(
            f"{s['stageId']:>6} {s.get('executorRunTime',0):>8} "
            f"{s.get('executorCpuTime',0)//10**6:>8} {s.get('numCompleteTasks',0):>5} "
            f"{s.get('inputBytes',0)/2**20:>7.1f} "
            f"{s.get('shuffleReadBytes',0)/2**20:>7.1f} "
            f"{s.get('shuffleWriteBytes',0)/2**20:>7.1f} "
            f"{s.get('memoryBytesSpilled',0)/2**20:>6.0f}  {s.get('name','')[:90]}"
        )


    # job timeline: per-job wall and the driver-side gap before it — the
    # two together account for the query wall (guide §7.3: gaps are
    # planning/FS/commit work, not execution)
    from datetime import datetime

    def ts(s: str) -> float:
        return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    print(f"\njobs={len(new_jobs)} (timed run(s) only)")
    prev_end = None
    tot_job = tot_gap = 0.0
    for j in new_jobs:
        t0, t1 = ts(j["submissionTime"]), ts(j["completionTime"])
        gap = (t0 - prev_end) if prev_end is not None else 0.0
        prev_end = t1
        tot_job += t1 - t0
        tot_gap += max(gap, 0.0)
        print(f"  job {j['jobId']:>4} wall={t1-t0:6.3f}s gap_before={gap:6.3f}s "
              f"stages={len(j.get('stageIds', []))} {j.get('description') or j.get('name','')}"[:140])
    print(f"sum job wall={tot_job:.2f}s, sum inter-job gaps={tot_gap:.2f}s")


if __name__ == "__main__":
    main()
