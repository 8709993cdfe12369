"""Streaming kNN-index maintenance — the shared lifecycle behind the
`streaming_knn_index_maintenance` registry query and its crash/restart
parity test.

State is two versioned parquet trees (edges; corpus with an ``in_pool``
membership flag — r12 consolidated the old separate pool/seen trees) under
``state/v{n}/``, advanced ATOMICALLY per micro-batch: v{n} is only read
after v{n+1} is fully written — the `operators/changedata.write_versioned`
discipline — so a crash mid-batch leaves v{n} intact and the structured-
streaming checkpoint replays the batch against it. The fold algebra is
order-independent across tranches (top-k over an append-only union), so
the post-restart state equals the one-shot batch answer however the file
source slices — and however many times — the landing files arrive.

Reference analogue: the incremental half of `train.py:14-368`'s
retrain-on-new-data loop, as an always-on index instead of a batch job.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _vdir(state: str, n: int, part: str) -> str:
    return os.path.join(state, f"v{n}", part)


def _latest(state: str) -> int:
    if not os.path.exists(state):
        return -1
    return max(
        (int(d[1:]) for d in os.listdir(state) if d.startswith("v")), default=-1
    )


def _rank_window() -> Window:
    return Window.partitionBy("id").orderBy(F.desc("cos"), F.asc("neighbor_id"))


def init_state(
    spark: SparkSession,
    old: DataFrame,
    state: str,
    dim: int,
    k: int = 5,
    budget: int = 200,
) -> None:
    """Write the v0 artifact from the old-epoch batch corpus — TWO trees
    per version (r12, was three): ``edges`` (the served top-k) and
    ``corpus`` (every indexed row, with ``in_pool`` marking membership in
    the budget-capped candidate pool; delta rows always carry true — the
    append-only epoch-pool algebra). One tree fewer means one fewer
    read+write+commit point per micro-batch. Idempotent per-directory
    overwrites."""
    from etl_aws_spark.similarity import knn

    knn.knn_join(old, "vec_id", "embedding", "label", dim, k=k, budget=budget).select(
        "id", "neighbor_id", "cos"
    ).write.mode("overwrite").parquet(_vdir(state, 0, "edges"))
    pool_ids = knn.knn_pool(old, "vec_id", "embedding", "label", budget=budget).select(
        F.col("neighbor_id").alias("vec_id"), F.lit(True).alias("in_pool")
    )
    old.join(pool_ids, "vec_id", "left").select(
        "vec_id", "embedding", "label",
        F.coalesce("in_pool", F.lit(False)).alias("in_pool"),
    ).write.mode("overwrite").parquet(_vdir(state, 0, "corpus"))


def run_maintenance_pass(
    spark: SparkSession,
    emb: DataFrame,
    landing: str,
    state: str,
    ckpt: str,
    dim: int,
    k: int = 5,
    budget: int = 200,
    timeout_s: int = 300,
) -> None:
    """One ``availableNow`` pass of the maintenance stream: every landed
    file not yet marked processed in ``ckpt`` folds into the latest state
    version. Call again after more files land (or after a crash) — the
    checkpoint guarantees each tranche folds exactly once, and the
    versioned state guarantees a replayed batch overwrites its own
    half-written version rather than double-folding into a committed one.
    """
    from pyspark.sql import types as T

    from etl_aws_spark.similarity import knn

    w = _rank_window()

    def fold_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        n = _latest(state)
        edges = spark.read.parquet(_vdir(state, n, "edges"))
        corpus = spark.read.parquet(_vdir(state, n, "corpus"))
        seen = corpus.select("vec_id", "embedding", "label")
        pool = corpus.filter(F.col("in_pool")).select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("_lb"),
            F.col("embedding").alias("_bvec"),
        )
        b = batch.localCheckpoint(eager=True)
        bpool = b.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("_lb"),
            F.col("embedding").alias("_bvec"),
        )
        # old rows score ONLY the batch's delta candidates...
        cand = knn.knn_join(
            emb, "vec_id", "embedding", "label", dim, k=k, probes=seen, pool=bpool
        ).select("id", "neighbor_id", "cos")
        merged = (
            edges.unionAll(cand)
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= k)
            .select("id", "neighbor_id", "cos")
        )
        # ...batch rows probe the pool-so-far plus themselves
        new_topk = knn.knn_join(
            emb, "vec_id", "embedding", "label", dim, k=k,
            probes=b, pool=pool.unionAll(bpool),
        ).select("id", "neighbor_id", "cos")
        merged.unionAll(new_topk).write.mode("overwrite").parquet(
            _vdir(state, n + 1, "edges")
        )
        # delta rows append with in_pool=true (unbudgeted, the epoch-pool
        # contract); the old epoch's flags carry forward unchanged
        corpus.unionAll(
            b.select("vec_id", "embedding", "label").withColumn(
                "in_pool", F.lit(True)
            )
        ).write.mode("overwrite").parquet(_vdir(state, n + 1, "corpus"))

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    )
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
        .writeStream.foreachBatch(fold_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination(timeout_s)


def read_final_topk(spark: SparkSession, state: str, k: int = 5) -> DataFrame:
    """The latest state version's edges, re-ranked to (vec_id,
    neighbor_id, cos, rank) — the maintenance stream's query surface."""
    final = spark.read.parquet(_vdir(state, _latest(state), "edges"))
    return final.withColumn("rank", F.row_number().over(_rank_window())).select(
        F.col("id").cast("long").alias("vec_id"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        (F.round(F.col("cos"), 6) + F.lit(0.0)).alias("cos"),
        F.col("rank").cast("int").alias("rank"),
    )
