"""ANN recall vs exact baseline; LSH bucket properties."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_aws_spark.similarity import knn

DIM = 16


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(11)
    # 10 well-separated cluster centers, 20 points each: ANN must find
    # same-cluster neighbors
    centers = rng.randn(10, DIM) * 5
    rows = []
    for i in range(200):
        c = i % 10
        v = centers[c] + rng.randn(DIM) * 0.1
        rows.append((i, [float(x) for x in v], c))
    return spark.createDataFrame(rows, f"vec_id long, embedding array<float>, label int")


def test_brute_topk_matches_numpy(spark, emb):
    queries = emb.filter(F.col("vec_id") < 3)
    got = knn.brute_topk(emb, queries, "vec_id", "embedding", DIM, k=5).toPandas()
    pdf = emb.toPandas()
    M = np.array([np.array(v, dtype=np.float64) for v in pdf.embedding])
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    for qid in range(3):
        cos = M @ M[qid]
        expect = list(np.lexsort((pdf.vec_id.to_numpy(), -cos))[:5])
        got_ids = got[got.query_id == qid].sort_values("rank").neighbor_id.tolist()
        assert got_ids == [int(pdf.vec_id.iloc[i]) for i in expect]


def test_ann_recall_on_clustered_data(spark, emb):
    queries = emb.filter(F.col("vec_id") < 10)
    exact = knn.brute_topk(emb, queries, "vec_id", "embedding", DIM, k=5).toPandas()
    approx = knn.ann_topk(emb, queries, "vec_id", "embedding", DIM, k=5, n_planes=3).toPandas()
    recalls = []
    for qid in range(10):
        e = set(exact[exact.query_id == qid].neighbor_id)
        a = set(approx[approx.query_id == qid].neighbor_id)
        recalls.append(len(e & a) / len(e))
    # tight clusters land in one bucket: recall should be near-perfect
    assert np.mean(recalls) >= 0.9, recalls


def test_lsh_bucket_is_deterministic(spark, emb):
    b1 = emb.select("vec_id", knn.lsh_bucket_col("embedding", DIM, 4).alias("b")).toPandas()
    b2 = emb.select("vec_id", knn.lsh_bucket_col("embedding", DIM, 4).alias("b")).toPandas()
    assert b1.sort_values("vec_id").b.tolist() == b2.sort_values("vec_id").b.tolist()
    assert b1.b.between(0, 15).all()


def test_ann_recall_query_shape_and_floor(spark, emb):
    # Per-query rows + a rollup total (query_id NULL); every recall in
    # [0,1]; the mean row equals the micro average of the per-query rows.
    queries = emb.filter(F.col("vec_id") < 10)
    out = knn.ann_recall_at_k(
        emb, queries, "vec_id", "embedding", DIM, k=5, n_planes=3
    ).toPandas()
    per_q = out[out.query_id.notna()]
    total = out[out.query_id.isna()]
    assert len(per_q) == 10 and len(total) == 1
    assert (per_q.n_true == 5).all()
    assert per_q.recall.between(0, 1).all()
    assert abs(total.recall.iloc[0] - per_q.n_hits.sum() / per_q.n_true.sum()) < 1e-12
    # clustered fixture: neighbors share the query's bucket -> high recall
    assert total.recall.iloc[0] >= 0.9


def test_ann_multiprobe_raises_recall(spark):
    # On spread-out data single-bucket probing misses cross-boundary
    # neighbors; Hamming-1 multiprobe must recover strictly more of the
    # true top-k (deterministic data + deterministic planes -> exact).
    import numpy as np

    rng = np.random.RandomState(23)
    rows = [
        (i, [float(v) for v in rng.randn(DIM)]) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.filter(F.col("vec_id") < 8)

    def mean_recall(n_probes):
        out = knn.ann_recall_at_k(
            df, queries, "vec_id", "embedding", DIM, k=5,
            n_planes=4, n_probes=n_probes,
        ).toPandas()
        return float(out[out.query_id.isna()].recall.iloc[0])

    r1, r5 = mean_recall(1), mean_recall(5)
    assert r5 > r1, (r1, r5)
    assert r5 >= 0.5, (r1, r5)


def test_cosine_dedup_lsh_fallback_blocks(spark, emb):
    # block_col=None must derive LSH buckets: near-identical vectors agree
    # on every sign bit, so true near-dups land in one bucket and are found;
    # the pair set is a subset of the label-blocked exact pair set restricted
    # to same-bucket, with identical cosines for shared pairs.
    lsh = knn.cosine_dedup_pairs(
        emb, "vec_id", "embedding", DIM, block_col=None, threshold=0.95, n_planes=4
    ).toPandas()
    # clustered fixture: plenty of same-cluster near-dups survive blocking
    assert len(lsh) > 0
    exact = knn.cosine_dedup_pairs(
        emb.withColumn("_one", F.lit(1)),
        "vec_id", "embedding", DIM, block_col="_one", threshold=0.95,
    ).toPandas()
    exact_pairs = {(r.id_a, r.id_b): r.cos for r in exact.itertuples()}
    for r in lsh.itertuples():
        assert (r.id_a, r.id_b) in exact_pairs
        assert r.cos == exact_pairs[(r.id_a, r.id_b)]


def test_ivf_topk_recall_on_clustered_data(spark, emb):
    # well-separated clusters: a query's true neighbors live in its own
    # cell, so probing the 2 nearest centroids recovers ~all of brute-force
    queries = emb.filter(F.col("vec_id") < 6)
    exact = knn.brute_topk(emb, queries, "vec_id", "embedding", DIM, k=5).toPandas()
    ivf = knn.ivf_topk(
        emb, queries, "vec_id", "embedding", "label", DIM, k=5, n_probe=2
    ).toPandas()
    true_pairs = set(zip(exact.query_id, exact.neighbor_id))
    got_pairs = set(zip(ivf.query_id, ivf.neighbor_id))
    recall = len(true_pairs & got_pairs) / len(true_pairs)
    assert recall >= 0.9, recall
    # every query produced exactly k ranked rows
    assert (ivf.groupby("query_id").size() == 5).all()


def test_label_centroids_match_numpy_mean(spark, emb):
    got = {r.label: r.centroid for r in knn.label_centroids(
        emb, "label", "embedding", DIM
    ).collect()}
    pdf = emb.select("label", "embedding").toPandas()
    for lab, grp in pdf.groupby("label"):
        want = np.round(
            np.mean(np.stack(grp.embedding.to_numpy()).astype(np.float64), axis=0), 4
        )
        np.testing.assert_allclose(got[lab], want, atol=1e-9)


def test_ivf_recall_monotone_in_n_probe(spark, emb):
    # probing more cells can only add candidates, so recall@k must be
    # non-decreasing in n_probe; the rollup mean row carries the curve
    queries = emb.filter(F.col("vec_id") < 6)
    rec = knn.ivf_recall_at_k(
        emb, queries, "vec_id", "embedding", "label", DIM, k=5, n_probes=(1, 2, 3)
    ).toPandas()
    means = (
        rec[rec.query_id.isna()].set_index("n_probe").recall.sort_index()
    )
    assert list(means.index) == [1, 2, 3]
    assert (means.diff().dropna() >= -1e-12).all(), means
    # per-query rows: every (n_probe, query) present with k truth rows
    per_q = rec[rec.query_id.notna()]
    assert (per_q.n_true == 5).all()
    assert len(per_q) == 3 * 6


def test_kmeans_iterate_partition_and_determinism(spark, emb):
    out = knn.kmeans_iterate(emb, "vec_id", "embedding", DIM, k=4, iters=2).toPandas()
    n_vec = emb.count()
    # one row per (cluster, component); members partition the corpus
    assert len(out) == 4 * DIM
    per_cluster = out.groupby("cluster").n_members.first()
    assert per_cluster.sum() == n_vec
    # deterministic end to end (fixed init, fixed iteration count)
    again = knn.kmeans_iterate(emb, "vec_id", "embedding", DIM, k=4, iters=2).toPandas()
    pdt = out.sort_values(["cluster", "pos"]).reset_index(drop=True)
    pdt2 = again.sort_values(["cluster", "pos"]).reset_index(drop=True)
    assert pdt.equals(pdt2)


def test_kmeans_literal_and_broadcast_assignment_agree(spark):
    """The k_threshold switch changes the PHYSICAL assignment form only:
    plan-time centroid literals vs one broadcast centroid row + HOF
    argmin. Same fold, same tie order -> identical fit output."""
    from etl_aws_spark.registry import load
    from etl_aws_spark.similarity import knn

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    lit = knn.kmeans_iterate(
        emb, "vec_id", "embedding", 64, k=8, iters=2, k_threshold=256
    )
    bc = knn.kmeans_iterate(
        emb, "vec_id", "embedding", 64, k=8, iters=2, k_threshold=0
    )
    key = ["cluster", "pos"]
    a = sorted(map(tuple, lit.collect()))
    b = sorted(map(tuple, bc.collect()))
    assert a == b
    # the broadcast path's assignment frame carries no join shuffle
    asg = knn.kmeans_assignment(
        emb, "vec_id", "embedding", 64, k=8, iters=2, k_threshold=0
    )
    plan = asg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan


def test_pca_power_iteration_converges(spark):
    """The top component from 6 power-iteration rounds must satisfy the
    eigen-equation approximately: residual ||C v - lambda v|| well below
    |lambda|, unit-norm loading, positive leading eigenvalue."""
    import numpy as np

    from etl_aws_spark.registry import load
    from etl_aws_spark.similarity import pca

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    out = pca.top_component(emb, "embedding", 64, iters=6).collect()
    assert len(out) == 64
    lam = out[0]["eigenvalue"]
    assert lam > 0
    v = np.zeros(64)
    for r in out:
        v[r["pos"]] = r["loading"]
    assert abs(np.linalg.norm(v) - 1.0) < 1e-6
    # rebuild the covariance the same way and check the residual
    cmat = pca.covariance_matrix(
        pca.gram_components(emb, "embedding", 64)
    ).collect()
    C = np.zeros((64, 64))
    for r in cmat:
        C[r["i"], r["j"]] = r["cv"]
    resid = np.linalg.norm(C @ v - lam * v)
    assert resid < 0.2 * abs(lam), (resid, lam)


def test_pca_partitioning_invariant(spark):
    """The fixed-point iteration makes the result independent of physical
    partitioning: wildly different partition counts must produce
    IDENTICAL loadings and eigenvalue (bit-for-bit, not just close)."""
    from etl_aws_spark.registry import load
    from etl_aws_spark.similarity import pca

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    a = sorted(
        map(tuple, pca.top_component(emb.repartition(3), "embedding", 64, iters=4).collect())
    )
    b = sorted(
        map(tuple, pca.top_component(emb.repartition(17), "embedding", 64, iters=4).collect())
    )
    assert a == b


def test_mmr_penalizes_near_duplicates(spark):
    # corpus: query-like axis vector, two near-identical high-relevance
    # vectors, and a moderately relevant orthogonal one — plain top-2 takes
    # the twins; MMR must swap the redundant twin for the diverse vector.
    import etl_aws_spark.suite.q_similarity  # noqa: F401  (registry import)
    from pyspark.sql import functions as F
    from etl_aws_spark.similarity import knn

    dim = 4
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),          # query
        (1, [0.7, 0.7, 0.0, 0.0]),          # twin A
        (2, [0.7, 0.7, 0.0, 0.0]),          # twin B (exact dup of A)
        (3, [0.7, -0.7, 0.0, 0.0]),         # equally relevant, orthogonal
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    topk = knn.brute_topk(
        emb.filter(F.col("vec_id") != 0),
        emb.filter(F.col("vec_id") == 0),
        "vec_id", "embedding", dim, k=2,
    )
    plain = {r.neighbor_id for r in topk.collect()}
    assert plain == {1, 2}  # pure relevance ties resolve by id: both twins
    # greedy MMR by hand over the same cosines: after picking 1, candidate 2
    # is crushed by its ~1.0 similarity to 1 while 3 survives
    import numpy as np

    def cos(a, b):
        a, b = np.array(a), np.array(b)
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    q = rows[0][1]
    rel = {i: cos(v, q) for i, v in rows[1:]}
    first = max(rel, key=lambda i: (rel[i], -i))
    assert first == 1
    mmr2 = {
        i: 0.7 * rel[i] - 0.3 * cos(dict(rows)[i], dict(rows)[first])
        for i in rel if i != first
    }
    assert max(mmr2, key=lambda i: (mmr2[i], -i)) == 3


def test_knn_join_every_row_gets_k_in_cell_neighbors(spark, emb):
    out = knn.knn_join(emb, "vec_id", "embedding", "label", DIM, k=5).toPandas()
    pdf = emb.toPandas()
    # every row appears with exactly k neighbors (cells have 20 >= k+1 rows)
    counts = out.groupby("id").size()
    assert len(counts) == 200 and (counts == 5).all()
    # neighbors stay inside the row's cell and never include the row itself
    lab = dict(zip(pdf.vec_id, pdf.label))
    assert (out.id != out.neighbor_id).all()
    assert all(lab[a] == lab[b] for a, b in zip(out.id, out.neighbor_id))
    # clustered fixture + budget not binding: in-cell top-k == exact top-k
    M = np.array([np.array(v, dtype=np.float64) for v in pdf.embedding])
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    for qid in (0, 7, 133):
        cos = M @ M[qid]
        cos[qid] = -2.0  # exclude self
        expect = [int(pdf.vec_id.iloc[i]) for i in np.lexsort((pdf.vec_id.to_numpy(), -cos))[:5]]
        got = out[out.id == qid].sort_values("rank").neighbor_id.tolist()
        assert got == expect


def test_knn_join_budget_caps_candidate_pool(spark, emb):
    # budget=8 < cell size 20: every neighbor must come from the 8-row
    # salted-hash pool of its cell, and rows still get k neighbors
    out = knn.knn_join(emb, "vec_id", "embedding", "label", DIM, k=5, budget=8).toPandas()
    pool_ids = set()
    pdf = emb.toPandas()
    import hashlib
    for c in sorted(pdf.label.unique()):
        ids = sorted(
            pdf[pdf.label == c].vec_id,
            key=lambda i: (hashlib.md5(f"knnjoin:{i}".encode()).hexdigest(), i),
        )[:8]
        pool_ids.update(int(i) for i in ids)
    assert set(out.neighbor_id).issubset(pool_ids)
    counts = out.groupby("id").size()
    assert len(counts) == 200 and (counts == 5).all()


def test_knn_join_blocking_invariance(spark, emb):
    # n_blocks hash-splits only the BASE side; every row's candidate set
    # stays the full cell pool, so blocked output == unblocked output
    # bit-for-bit (the 100 TB memory-bound path is a pure repartitioning)
    a = knn.knn_join(emb, "vec_id", "embedding", "label", DIM, k=5).toPandas()
    b = knn.knn_join(
        emb, "vec_id", "embedding", "label", DIM, k=5, n_blocks=3
    ).toPandas()
    key = ["id", "rank"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a.equals(b)


def test_incremental_knn_merge_equals_batch_over_epoch_pool(spark, emb):
    # the merge algebra of similarity_knn_join_incremental, pinned
    # Spark-side (the registry oracle proves it against DuckDB): old-epoch
    # top-k unioned with delta-only candidates, re-ranked, must equal the
    # one-shot batch join over the identical append-only epoch pool
    from pyspark.sql import Window

    is_delta = F.pmod(F.col("vec_id"), F.lit(7)) == 3  # ~14% delta
    old, delta = emb.filter(~is_delta), emb.filter(is_delta)
    k, budget = 4, 8  # budget binds (cells have 20 rows) to stress pooling
    dpool = delta.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("_lb"),
        F.col("embedding").alias("_bvec"),
    )
    epool = knn.knn_pool(
        old, "vec_id", "embedding", "label", budget=budget
    ).unionAll(dpool)

    old_topk = knn.knn_join(
        old, "vec_id", "embedding", "label", DIM, k=k, budget=budget
    ).select("id", "neighbor_id", "cos")
    cand = knn.knn_join(
        emb, "vec_id", "embedding", "label", DIM, k=k, probes=old, pool=dpool
    ).select("id", "neighbor_id", "cos")
    w = Window.partitionBy("id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    merged = (
        old_topk.unionAll(cand)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    delta_topk = knn.knn_join(
        emb, "vec_id", "embedding", "label", DIM, k=k, probes=delta, pool=epool
    ).select("id", "neighbor_id", "cos", "rank")
    incremental = merged.select("id", "neighbor_id", "cos", "rank").unionAll(
        delta_topk
    )

    batch = knn.knn_join(
        emb, "vec_id", "embedding", "label", DIM, k=k, pool=epool
    ).select("id", "neighbor_id", "cos", "rank")
    a = sorted(map(tuple, incremental.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert a == b


def test_knn_join_epoch_fused_equals_two_calls(spark, emb):
    # r14 opt: the fused one-cogroup epoch fold must be ROW-IDENTICAL to
    # the two separate knn_join rounds it replaces (old probes vs new
    # pool; new probes vs old ∪ new pool) — cos values bit-for-bit, ranks
    # included, across cells where the budget binds
    is_delta = F.pmod(F.col("vec_id"), F.lit(7)) == 3
    old, delta = emb.filter(~is_delta), emb.filter(is_delta)
    k, budget = 4, 8
    dpool = delta.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("_lb"),
        F.col("embedding").alias("_bvec"),
    )
    epool = knn.knn_pool(old, "vec_id", "embedding", "label", budget=budget)

    fused = knn.knn_join_epoch(
        old, delta, epool, dpool, "vec_id", "embedding", "label", DIM, k=k
    )
    cand = knn.knn_join(
        emb, "vec_id", "embedding", "label", DIM, k=k, probes=old, pool=dpool
    )
    delta_topk = knn.knn_join(
        emb, "vec_id", "embedding", "label", DIM, k=k, probes=delta,
        pool=epool.unionAll(dpool),
    )
    a = sorted(map(tuple, fused.collect()))
    b = sorted(map(tuple, cand.unionAll(delta_topk).collect()))
    assert a == b


def test_pool_rank_window_defines_knn_pool_membership(spark, emb):
    # r13 ADVICE: epoch-state initializers derive in_pool from
    # pool_rank_window; this pins that rank<=budget membership IS
    # knn_pool's row set (same salt, same (md5, id) order)
    budget = 8
    flagged = emb.select(
        "vec_id",
        "label",
        (
            F.row_number().over(knn.pool_rank_window("vec_id", "label")) <= budget
        ).alias("in_pool"),
    )
    got = {r.vec_id for r in flagged.filter("in_pool").collect()}
    want = {
        r.neighbor_id
        for r in knn.knn_pool(
            emb, "vec_id", "embedding", "label", budget=budget
        ).collect()
    }
    assert got == want


def test_multiprobe_rank1_equals_single_assignment(spark, emb):
    """kmeans_assignment_multiprobe's arank=1 slice must be EXACTLY the
    single-cell kmeans_assignment (same fit, same fold, same tie order) —
    the invariant that makes the multi-probe audit's delta attributable
    to probe depth alone. Also pins the probe contract: p rows per
    vector, distinct cells, distances non-decreasing in arank."""
    from pyspark.sql import functions as F

    from etl_aws_spark.similarity import knn

    single = knn.kmeans_assignment(
        emb, "vec_id", "embedding", DIM, k=8, iters=2
    ).select("vec_id", "cluster")
    multi = knn.kmeans_assignment_multiprobe(
        emb, "vec_id", "embedding", DIM, k=8, iters=2, p=3
    )
    r1 = multi.filter(F.col("arank") == 1).select("vec_id", "cluster")
    assert r1.exceptAll(single).count() == 0
    assert single.exceptAll(r1).count() == 0
    per = multi.groupBy("vec_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("cluster").alias("nc"),
    )
    bad = per.filter((F.col("n") != 3) | (F.col("nc") != 3)).count()
    assert bad == 0


def test_multiprobe_fit_on_uses_corpus_not_probes(spark, emb):
    """fit_on separates the fit corpus from the assigned frame: assigning
    a tiny probe sample with fit_on=corpus must reproduce the corpus
    fit's rank-1 cells for those probes (fitting on the sample itself
    would move the centroids)."""
    from pyspark.sql import functions as F

    from etl_aws_spark.similarity import knn

    probes = emb.filter(F.col("vec_id") % 17 == 3)
    got = knn.kmeans_assignment_multiprobe(
        probes, "vec_id", "embedding", DIM, k=8, iters=2, p=1, fit_on=emb
    ).select("vec_id", "cluster")
    want = (
        knn.kmeans_assignment(emb, "vec_id", "embedding", DIM, k=8, iters=2)
        .join(probes.select("vec_id"), "vec_id")
        .select("vec_id", "cluster")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
