"""Streaming near-duplicate CLUSTER maintenance — the streaming twin of
`text_dedup_connected_components`, completing the dedup lifecycle the way
`streaming/maintenance.py` completed the kNN index's (build → incremental
→ streaming → compaction audit).

Documents land as files; every micro-batch folds into a persisted global
clustering in two versioned parquet trees under ``state/v{n}/``:

- ``bmin`` — per LSH band-bucket running MINIMUM doc id (the
  `text_dedup_incremental_minhash` state, promoted to the cluster layer).
- ``labels`` — every seen doc's connected-component label.

The fold uses STAR edges, not bucket cliques: each batch doc links to its
buckets' current minima, and a bucket whose minimum CHANGES links old min
to new min. Per-bucket star chains connect exactly the docs a full bucket
clique would — so components equal the batch LSH closure — while each doc
ever contributes ≤ n_bands edges, which is why NO hot-bucket cap is needed
(the capped-clique batch form drops degenerate buckets to stay sub-
quadratic; the star form is linear by construction). Old connectivity is
carried as the previous labels' (id → label) star edges, so the per-batch
closure runs over |touched-so-far| 2-column rows and converges in O(1)
rounds on the already-flattened labels.

Order-independence (what the oracle proves): the union of all emitted
star edges connects, per bucket, exactly the docs that share it — however
the file source slices or reorders the tranches — and min-label components
are the unique fixpoint of that edge set. The DuckDB oracle computes the
same components from scratch (bucket-min star edges over the FULL corpus +
a recursive reachability closure), so the driver's value-hash gate proves
the incremental fold, not just row counts.

Reference analogue: the always-on form of the dedup pass ahead of
`glue.py:168`'s dropDuplicates.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _vdir(state: str, n: int, part: str) -> str:
    return os.path.join(state, f"v{n}", part)


def _latest(state: str) -> int:
    if not os.path.exists(state):
        return -1
    return max(
        (int(d[1:]) for d in os.listdir(state) if d.startswith("v")), default=-1
    )


def init_state(spark: SparkSession, state: str) -> None:
    """Write the empty v0 artifact (no docs seen yet)."""
    from pyspark.sql import types as T

    bmin = spark.createDataFrame(
        [], T.StructType([T.StructField("bk", T.StringType()),
                          T.StructField("mn", T.LongType())])
    )
    labels = spark.createDataFrame(
        [], T.StructType([T.StructField("doc_id", T.LongType()),
                          T.StructField("component_id", T.LongType())])
    )
    bmin.write.mode("overwrite").parquet(_vdir(state, 0, "bmin"))
    labels.write.mode("overwrite").parquet(_vdir(state, 0, "labels"))


def run_clustering_pass(
    spark: SparkSession,
    landing: str,
    state: str,
    ckpt: str,
    num_hashes: int = 16,
    bands: int = 4,
    timeout_s: int = 300,
) -> None:
    """One ``availableNow`` pass: every landed file not yet marked in
    ``ckpt`` folds into the latest clustering version. Safe to call again
    after more files land or after a crash — the checkpoint guarantees
    each tranche folds exactly once, and a replayed batch overwrites its
    own half-written version rather than double-folding a committed one.
    """
    from pyspark.sql import types as T

    from etl_aws_spark.operators import graph
    from etl_aws_spark.text import dedup

    def fold_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        n = _latest(state)
        bmin_old = spark.read.parquet(_vdir(state, n, "bmin"))
        labels_old = spark.read.parquet(_vdir(state, n, "labels"))
        b = batch.select("doc_id", "text").localCheckpoint(eager=True)
        bands_b = dedup.minhash_band_keys(
            b, "doc_id", "text", num_hashes, bands
        ).localCheckpoint(eager=True)
        bmin_new = (
            bmin_old.unionByName(
                bands_b.groupBy("bk").agg(F.min("doc_id").alias("mn"))
            )
            .groupBy("bk")
            .agg(F.min("mn").alias("mn"))
            .localCheckpoint(eager=True)
        )
        # batch docs -> their buckets' CURRENT minima...
        e1 = (
            bands_b.join(bmin_new, "bk")
            .filter(F.col("doc_id") != F.col("mn"))
            .select(F.col("doc_id").alias("src"), F.col("mn").alias("dst"))
        )
        # ...and buckets whose minimum moved chain old min -> new min
        e2 = (
            bmin_old.select("bk", F.col("mn").alias("_old"))
            .join(bmin_new, "bk")
            .filter(F.col("_old") != F.col("mn"))
            .select(F.col("_old").alias("src"), F.col("mn").alias("dst"))
        )
        # previous connectivity rides as the labels' own star edges
        star = labels_old.filter(F.col("doc_id") != F.col("component_id")).select(
            F.col("doc_id").alias("src"), F.col("component_id").alias("dst")
        )
        verts = labels_old.select("doc_id").unionByName(
            b.select("doc_id")
        ).distinct()
        comp = graph.connected_components(
            verts, e1.unionByName(e2).unionByName(star), id_col="doc_id"
        )
        comp.write.mode("overwrite").parquet(_vdir(state, n + 1, "labels"))
        bmin_new.write.mode("overwrite").parquet(_vdir(state, n + 1, "bmin"))

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
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


def read_clusters(spark: SparkSession, state: str) -> DataFrame:
    """Latest clustering: (doc_id, component_id, is_dup)."""
    labels = spark.read.parquet(_vdir(state, _latest(state), "labels"))
    return labels.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("component_id").cast("long").alias("component_id"),
        (F.col("doc_id") != F.col("component_id")).cast("int").alias("is_dup"),
    )
