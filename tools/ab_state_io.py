"""A/B: streaming-state per-batch cost vs corpus size (r12 verdict #1).

The r12 verdict flagged both streaming lifecycles for rewriting their
ENTIRE state trees every micro-batch — per-trigger I/O O(corpus). r13
moved both onto delta-versioned state (streaming/state.py). This script
measures the done-criterion directly: fold the SAME fixed batch into a
1× and a 10× pre-seen corpus and compare per-batch fold wall and bytes
written. Under the old snapshot layout, written bytes track the corpus
(10× corpus → ~10× bytes); under deltas they track the batch.

Run uncontended:  python tools/ab_state_io.py
Prints one JSON line; record the numbers in BASELINE.md / SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def _cluster_case(spark, docs, corpus_pred, batch_pred, tag):
    from pyspark.sql import functions as F

    from etl_aws_spark.streaming import clustering as cl
    from etl_aws_spark.streaming.state import VersionedState

    tmp = tempfile.mkdtemp(prefix=f"ab_cluster_{tag}_")
    landing, state, ckpt = (os.path.join(tmp, d) for d in ("in", "st", "ck"))
    corpus = docs.filter(corpus_pred)
    batch = docs.filter(batch_pred)
    cl.init_state(spark, state)
    corpus.coalesce(4).write.mode("append").parquet(landing)
    cl.run_clustering_pass(spark, landing, state, ckpt)
    batch.coalesce(1).write.mode("append").parquet(landing)
    t0 = time.time()
    cl.run_clustering_pass(spark, landing, state, ckpt)
    wall = time.time() - t0
    st = VersionedState(spark, state)
    v = st.version()
    delta_bytes = _du(os.path.join(state, "v%d" % v))
    out = {
        "corpus_rows": corpus.count(),
        "batch_rows": batch.count(),
        "fold_wall_s": round(wall, 3),
        "delta_bytes": delta_bytes,
        "full_state_bytes": sum(
            _du(os.path.join(state, "v%d" % i)) for i in range(v + 1)
        ),
    }
    shutil.rmtree(tmp, ignore_errors=True)
    return out


def _knn_case(spark, emb, corpus_pred, batch_pred, tag):
    from etl_aws_spark.streaming import maintenance as mt
    from etl_aws_spark.streaming.state import VersionedState

    tmp = tempfile.mkdtemp(prefix=f"ab_knn_{tag}_")
    landing, state, ckpt = (os.path.join(tmp, d) for d in ("in", "st", "ck"))
    corpus = emb.filter(corpus_pred)
    batch = emb.filter(batch_pred)
    mt.init_state(spark, corpus, state, 64, k=5, budget=200)
    batch.coalesce(1).write.mode("append").parquet(landing)
    t0 = time.time()
    mt.run_maintenance_pass(
        spark, emb, landing, state, ckpt, 64, k=5, budget=200
    )
    wall = time.time() - t0
    st = VersionedState(spark, state)
    v = st.version()
    delta_bytes = _du(os.path.join(state, "v%d" % v))
    out = {
        "corpus_rows": corpus.count(),
        "batch_rows": batch.count(),
        "fold_wall_s": round(wall, 3),
        "delta_bytes": delta_bytes,
        "full_state_bytes": sum(
            _du(os.path.join(state, "v%d" % i)) for i in range(v + 1)
        ),
    }
    shutil.rmtree(tmp, ignore_errors=True)
    return out


def main() -> None:
    from pyspark.sql import functions as F

    from etl_aws_spark.registry import load
    from etl_aws_spark.session import get_session

    spark = get_session("ab_state_io")
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = load(spark, sf, "documents").select("doc_id", "text")
    emb = load(spark, sf, "embeddings").select("vec_id", "embedding", "label")

    # fixed batch: the 100 highest-id docs (high ids so the fold measures
    # write amplification, not an honest global-min relabel); corpora 1x
    # and 10x drawn below them
    res = {"sf_dir": sf, "clustering": {}, "knn": {}}
    batch_d = (F.col("doc_id") >= 4900) & (F.col("doc_id") < 5000)
    res["clustering"]["corpus_1x"] = _cluster_case(
        spark, docs, F.col("doc_id") < 490, batch_d, "1x"
    )
    res["clustering"]["corpus_10x"] = _cluster_case(
        spark, docs, F.col("doc_id") < 4900, batch_d, "10x"
    )
    batch_e = (F.col("vec_id") >= 1950) & (F.col("vec_id") < 2000)
    res["knn"]["corpus_1x"] = _knn_case(
        spark, emb, F.col("vec_id") < 195, batch_e, "1x"
    )
    res["knn"]["corpus_10x"] = _knn_case(
        spark, emb, F.col("vec_id") < 1950, batch_e, "10x"
    )
    for fam in ("clustering", "knn"):
        a, b = res[fam]["corpus_1x"], res[fam]["corpus_10x"]
        res[fam]["delta_bytes_ratio_10x_over_1x"] = round(
            b["delta_bytes"] / max(1, a["delta_bytes"]), 3
        )
        res[fam]["fold_wall_ratio_10x_over_1x"] = round(
            b["fold_wall_s"] / max(1e-9, a["fold_wall_s"]), 3
        )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
