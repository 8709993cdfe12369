"""Product quantization (PQ) — the compressed-domain ANN path beyond
scalar int8 quantization.

PQ splits each ``dim``-dimensional vector into ``m`` subvectors of
``dim/m`` components, learns a small codebook per subspace (Lloyd
refinement of a sampled init), and stores each vector as ``m`` small
integer codes — 64 doubles become 8 bytes here. Search runs in the
compressed domain via asymmetric distance computation (ADC): a query
precomputes its distance to every codeword once (an ``m × k`` lookup
table), and each corpus vector's approximate distance is the sum of
``m`` table lookups — no original vectors are ever touched at scan time.
Reference analogue: the notebooks' feature-compression prep
(`src/preprocessing/preprocessing.py` scaling blocks) has no ANN path;
this is the §2.13 extension tier (SURVEY.md) built from the public PQ
literature (Jégou et al., TPAMI 2011).

Scale shape (100 TB): every frame shuffled here carries only scalar
components — ``(id, sub, spos, val)`` parts or ``(id, sub, code, dist)``
candidates — never whole vectors. Codebooks are ``m·k·(dim/m)`` doubles
(1 KiB here), always broadcast. Training cost is the inherent PQ
``N·dim·k`` codeword-evaluation product, executed as one broadcast join
plus a map-side-combined aggregate; the corpus is scanned, never
shuffled by vector. ADC search shuffles ``(query, neighbor, dist)``
triples only, and the distance table (``|Q|·m·k`` rows) is broadcast.

Determinism contract (FIXTURES.md §C): codebook components are rounded
to 4 digits (the rounded codebook IS the index artifact, exactly as in
:func:`knn.label_centroids`); every distance is an ascending-``spos``
(or ascending-``sub``) left fold starting from 0.0, bit-identical to the
DuckDB ``list_reduce(list_prepend(0.0, list(... ORDER BY ...)))``
mirror; argmin ties break to the lower code id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ordered_fold_sum(order_col: str, term_col: str) -> Column:
    """Sum ``term_col`` in ascending ``order_col`` order as a left fold from
    0.0 — the engine-exact summation both Spark and DuckDB replay."""
    return F.expr(
        f"aggregate(transform(array_sort(collect_list(struct({order_col}, {term_col}))), "
        f"s -> s.{term_col}), cast(0.0 as double), (acc, x) -> acc + x)"
    )


def subvector_parts(df: DataFrame, id_col: str, vec_col: str, d_sub: int) -> DataFrame:
    """Explode vectors to scalar subspace components
    ``(_id, sub, spos, val)`` — the only shape PQ ever shuffles."""
    return df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("_pos", "val"),
    ).select(
        "_id",
        F.expr("_pos div %d" % d_sub).cast("int").alias("sub"),
        (F.col("_pos") % d_sub).cast("int").alias("spos"),
        "val",
    )


def _nudged_round(c: Column, n: int) -> Column:
    """House half-boundary bridge (suite/_util.rnd_nudged twin): Spark
    rounds the shortest-decimal repr HALF_UP while other engines round the
    binary double, so an exact-half component (e.g. 1.15625 at 4 digits)
    can round differently across replays. sign(x)·1e-9 moves it off the
    boundary identically everywhere."""
    return F.round(c + F.signum(c) * F.lit(1e-9), n) + F.lit(0.0)


def init_codebook(parts: DataFrame, k: int, round_digits: int = 4) -> DataFrame:
    """Sampled-init codebook: codeword ``j`` of every subspace is vector
    ``j``'s subvector (ids ``< k``), components nudge-rounded (the one
    rounding site that previously lacked the house half-boundary bridge —
    closed in r9 after a Hypothesis property test caught an exact-half
    divergence). Deterministic by construction — the standard sample-init
    Lloyd seeds."""
    return parts.filter(F.col("_id") < k).select(
        "sub",
        F.col("_id").cast("int").alias("code"),
        "spos",
        _nudged_round(F.col("val"), round_digits).alias("cw"),
    )


def _packed(
    rows: DataFrame, key_cols: list[str], val_col: str, out_col: str
) -> DataFrame:
    """Pack scalar component rows back into a per-key DOUBLE array in
    ascending ``spos`` order (one narrow aggregate)."""
    return rows.groupBy(*key_cols).agg(
        F.expr(
            f"transform(array_sort(collect_list(struct(spos, {val_col}))), "
            f"s -> s.{val_col})"
        ).alias(out_col)
    )


def assign_codes(parts: DataFrame, codebook: DataFrame) -> DataFrame:
    """Nearest codeword per (vector, subspace): broadcast the codebook,
    evaluate all k codewords (the inherent PQ N·dim·k product), fold the
    squared-diff terms in spos order, argmin with code-id tie-break.
    Returns ``(_id, sub, code, dist)``.

    Physical shape: both sides are packed back into per-subspace DOUBLE
    arrays so the N·k distance evaluations are ``zip_with`` folds over
    8-element arrays instead of N·k·d_sub scalar rows through a
    collect_list aggregate — ~d_sub× fewer shuffled rows, and the argmin
    is a ``min(struct(dist, code))`` aggregate on the same key as the
    packing shuffle, so Catalyst plans no second exchange. The fold is
    the identical ascending-``spos`` left fold from 0.0 (``zip_with``
    walks index order), so distances stay engine-exact."""
    subvecs = _packed(parts, ["_id", "sub"], "val", "subvec")
    cwvecs = _packed(codebook, ["sub", "code"], "cw", "cwvec")
    dists = subvecs.join(F.broadcast(cwvecs), "sub").select(
        "_id", "sub", "code",
        F.expr(
            "aggregate(zip_with(subvec, cwvec, (a, b) -> (a - b) * (a - b)), "
            "cast(0.0 as double), (acc, x) -> acc + x)"
        ).alias("dist"),
    )
    best = dists.groupBy("_id", "sub").agg(F.min(F.struct("dist", "code")).alias("_b"))
    return best.select("_id", "sub", F.col("_b.code").alias("code"), F.col("_b.dist").alias("dist"))


def refine_codebook(
    parts: DataFrame, codebook: DataFrame, assigned: DataFrame, round_digits: int = 4
) -> DataFrame:
    """One Lloyd recompute: each codeword moves to the rounded component
    mean of its members; a codeword with no members keeps its previous
    position (left-join coalesce — same emptied-cluster rule as
    :func:`knn.kmeans_iterate` and its oracle)."""
    means = (
        assigned.join(parts, ["_id", "sub"])
        .groupBy("sub", "code", "spos")
        .agg(_nudged_round(F.avg("val"), round_digits).alias("cw_new"))
    )
    return codebook.join(means, ["sub", "code", "spos"], "left").select(
        "sub", "code", "spos", F.coalesce("cw_new", "cw").alias("cw")
    )


def train_codebook(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    d_sub: int,
    k: int,
    iters: int = 1,
    round_digits: int = 4,
) -> tuple[DataFrame, DataFrame]:
    """Sample-init + ``iters`` Lloyd refinements per subspace (all
    subspaces train in ONE relational plan — the subspace id is just a
    grouping column, not a loop). Returns (parts, codebook)."""
    parts = subvector_parts(df, id_col, vec_col, d_sub)
    cb = init_codebook(parts, k, round_digits)
    for _ in range(iters):
        cb = refine_codebook(parts, cb, assign_codes(parts, cb), round_digits)
    return parts, cb


def encode(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    d_sub: int,
    k: int,
    iters: int = 1,
    round_digits: int = 4,
    err_digits: int = 6,
) -> DataFrame:
    """Train and encode: ``(vec_id, sub, code, sub_err)`` — one row per
    (vector, subspace); ``sub_err`` is the squared reconstruction error of
    the chosen codeword (the quantity PQ training minimizes)."""
    parts, cb = train_codebook(df, id_col, vec_col, d_sub, k, iters, round_digits)
    enc = assign_codes(parts, cb)
    return enc.select(
        F.col("_id").alias("vec_id"),
        "sub",
        "code",
        (F.round("dist", err_digits) + F.lit(0.0)).alias("sub_err"),
    )


def adc_search(
    codes: DataFrame,
    codebook: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    d_sub: int,
    topk: int = 10,
) -> DataFrame:
    """The search-only ADC leg against an EXISTING index: ``codes``
    is ``(_id, sub, code)`` (the compressed corpus, typically read from a
    persisted parquet artifact), ``codebook`` is ``(sub, code, spos, cw)``
    with already-rounded components. Exactly three shuffles: the per-query
    distance-table aggregate (|Q|·m·k rows, then broadcast), the
    per-(query, neighbor) ADC fold, and the top-k window — training cost
    is zero, which is the point of persisting the index. Returns
    ``(query_id, neighbor_id, adc_dist, rank)`` with rank <= topk."""
    qparts = subvector_parts(queries, id_col, vec_col, d_sub).withColumnRenamed(
        "_id", "query_id"
    )
    qterms = qparts.join(F.broadcast(codebook), ["sub", "spos"]).select(
        "query_id", "sub", "code", "spos",
        ((F.col("val") - F.col("cw")) * (F.col("val") - F.col("cw"))).alias("term"),
    )
    dtable = qterms.groupBy("query_id", "sub", "code").agg(
        _ordered_fold_sum("spos", "term").alias("ddist")
    )

    scored = (
        codes.join(F.broadcast(dtable), ["sub", "code"])
        .groupBy("query_id", F.col("_id").alias("neighbor_id"))
        .agg(_ordered_fold_sum("sub", "ddist").alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "neighbor_id", "adc_dist", "rank")
    )


def ivfpq_residual_adc_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    dim: int,
    d_sub: int,
    k_codes: int,
    n_probe: int = 2,
    topk: int = 10,
    round_digits: int = 4,
) -> DataFrame:
    """IVF + PQ on residuals with asymmetric distance — the IVFADC
    architecture (Jégou et al., TPAMI 2011 §IV), the layout every
    billion-vector ANN service ships: a coarse quantizer (the per-label
    centroids) prunes the corpus to ``n_probe`` cells per query, and a
    single product quantizer trained on CENTERED residuals (v − c(v))
    compresses what remains. Residuals concentrate near 0 regardless of
    which cell a vector lives in, so one shared codebook quantizes them
    far better than raw vectors — the reason IVFADC beats flat ADC at
    equal bits.

    Scale shape: the corpus is touched as (id, sub, code) scalars only;
    per (query, probed cell) a fresh m×k distance table is built from the
    QUERY's residual against that cell (|Q|·n_probe·m·k rows — broadcast);
    candidate scoring joins codes to tables on (cell, sub, code) so a
    vector is only ever scored inside its own cell. Probing is a
    |Q|·n_cells centroid-distance aggregate — never a corpus scan.

    Determinism: centroids and codebook components rounded (the artifact
    convention); every distance an ascending-(spos|sub) left fold;
    probe ties break to the lower label, argmin ties to the lower code.
    Returns (query_id, cell, neighbor_id, adc_dist, rank).
    """
    from etl_aws_spark.similarity import knn

    comp = knn.label_centroid_components(embeddings, label_col, vec_col, round_digits)
    vparts = embeddings.select(
        F.col(id_col).alias("_id"),
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "_v"),
    )
    rparts = (
        vparts.join(F.broadcast(comp), ["label", "pos"])
        .select(
            "_id",
            "label",
            F.expr(f"pos div {d_sub}").cast("int").alias("sub"),
            (F.col("pos") % d_sub).cast("int").alias("spos"),
            (F.col("_v") - F.col("val")).alias("val"),
        )
        .localCheckpoint(eager=True)
    )
    cb = init_codebook(rparts, k_codes, round_digits)
    cb = refine_codebook(rparts, cb, assign_codes(rparts, cb), round_digits)
    codes = assign_codes(rparts, cb).select("_id", "sub", "code").join(
        embeddings.select(
            F.col(id_col).alias("_id"), F.col(label_col).alias("label")
        ),
        "_id",
    )

    qparts = queries.select(
        F.col(id_col).alias("query_id"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "_q"),
    )
    # coarse probe: ascending-pos fold of (q - c)^2 per (query, cell)
    probe_terms = qparts.join(F.broadcast(comp), "pos").select(
        "query_id", "label", "pos",
        ((F.col("_q") - F.col("val")) * (F.col("_q") - F.col("val"))).alias("term"),
    )
    cell_d = probe_terms.groupBy("query_id", "label").agg(
        _ordered_fold_sum("pos", "term").alias("l2")
    )
    wp = Window.partitionBy("query_id").orderBy(F.asc("l2"), F.asc("label"))
    probes = (
        cell_d.withColumn("_pr", F.row_number().over(wp))
        .filter(F.col("_pr") <= n_probe)
        .select("query_id", "label")
    )
    # query residual vs each probed cell, then the per-cell distance table
    qr = probes.join(qparts, "query_id").join(F.broadcast(comp), ["label", "pos"]).select(
        "query_id",
        "label",
        F.expr(f"pos div {d_sub}").cast("int").alias("sub"),
        (F.col("pos") % d_sub).cast("int").alias("spos"),
        (F.col("_q") - F.col("val")).alias("val"),
    )
    qterms = qr.join(F.broadcast(cb), ["sub", "spos"]).select(
        "query_id", "label", "sub", "code", "spos",
        ((F.col("val") - F.col("cw")) * (F.col("val") - F.col("cw"))).alias("term"),
    )
    dtable = qterms.groupBy("query_id", "label", "sub", "code").agg(
        _ordered_fold_sum("spos", "term").alias("ddist")
    )
    scored = (
        codes.join(F.broadcast(dtable), ["label", "sub", "code"])
        .groupBy("query_id", "label", F.col("_id").alias("neighbor_id"))
        .agg(_ordered_fold_sum("sub", "ddist").alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(
            "query_id",
            F.col("label").alias("cell"),
            "neighbor_id",
            "adc_dist",
            "rank",
        )
    )


def brute_l2_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int,
) -> DataFrame:
    """Exact squared-L2 top-k — the ground truth the IVFADC path
    approximates (IVFADC minimizes L2 in the residual domain, so recall
    must be judged against the L2 ranking, not cosine). Queries broadcast,
    corpus never shuffles; the distance is the ascending-index
    :func:`knn._fold_l2` fold, bit-identical to the oracle's list fold."""
    from etl_aws_spark.similarity import knn

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    scored = embeddings.crossJoin(F.broadcast(q)).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.expr(knn._fold_l2(vec_col, "_qvec", dim)).alias("l2"),
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("l2"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "l2", "rank")
    )


def ivfpq_recall_at_k(
    embeddings: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    dim: int,
    d_sub: int,
    k_codes: int,
    k: int = 10,
    n_probe: int = 2,
) -> DataFrame:
    """Recall@k of :func:`ivfpq_residual_adc_topk` against the exact
    :func:`brute_l2_topk` truth — measures BOTH approximation sources at
    once (cell pruning can miss a cross-cell neighbor; PQ quantization can
    reorder close ones), the accuracy half of the compression/probe knobs.
    One row per query (n_hits, n_true, recall) plus the ROLLUP mean row.
    Both sides are |queries|·k frames, so the join is trivial at any
    corpus size."""
    exact = brute_l2_topk(embeddings, queries, id_col, vec_col, dim, k).select(
        "query_id", "neighbor_id"
    )
    approx = ivfpq_residual_adc_topk(
        embeddings, queries, id_col, vec_col, label_col,
        dim=dim, d_sub=d_sub, k_codes=k_codes, n_probe=n_probe, topk=k,
    ).select("query_id", "neighbor_id", F.lit(1).alias("_hit"))
    marked = exact.join(F.broadcast(approx), ["query_id", "neighbor_id"], "left")
    return (
        marked.rollup("query_id")
        .agg(
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("bigint").alias("n_hits"),
            F.count(F.lit(1)).alias("n_true"),
        )
        .select(
            "query_id",
            "n_hits",
            "n_true",
            (F.col("n_hits") / F.col("n_true")).alias("recall"),
        )
    )


def adc_topk(
    df: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    d_sub: int,
    k_codes: int,
    topk: int = 10,
    iters: int = 1,
    round_digits: int = 4,
) -> DataFrame:
    """Asymmetric-distance top-k in the compressed domain: queries keep
    their raw vectors, the corpus is only its PQ codes. The per-query
    distance table (|Q|·m·k rows — 640 here) is built once and broadcast;
    each corpus vector's approximate distance is the ascending-``sub``
    fold of its m table lookups. Trains in the same plan; for the
    train-once / search-many shape, persist ``train_codebook`` +
    ``assign_codes`` output and call :func:`adc_search`. Returns
    ``(query_id, neighbor_id, adc_dist, rank)`` with rank <= topk."""
    parts, cb = train_codebook(df, id_col, vec_col, d_sub, k_codes, iters, round_digits)
    # The trained codebook (m·k·d_sub rows, ~1k) is referenced by BOTH the
    # corpus-encoding leg and the query distance-table leg; without a
    # lineage cut Spark replays the whole training subtree (itself a full
    # corpus assignment) once per reference. Materializing the tiny frame
    # costs one job and makes every downstream reference a scan.
    cb = cb.localCheckpoint(eager=True)
    codes = assign_codes(parts, cb).select("_id", "sub", "code")
    return adc_search(codes, cb, queries, id_col, vec_col, d_sub, topk)
