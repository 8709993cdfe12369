"""Multinomial Naive Bayes as pure DataFrame algebra.

A text classifier trained AND scored entirely with joins and aggregates —
no driver-side model object, no UDF, no collect. The 'model' is two small
keyed tables (class priors, per-(class, token) smoothed log-likelihoods)
that broadcast; scoring is an equi-join from the corpus's (doc, token, tf)
relation. This is how a token-level classifier actually runs at corpus
scale: training is one aggregation pass, the model is data, and inference
is a join — embarrassingly parallel, no per-row Python.

Determinism contract: per-(doc, class) log-score sums are rounded (default
4 digits) BEFORE the argmax, and ties break to the lexicographically
smallest class, so cross-engine float summation order cannot flip a
prediction (the same stabilization the IVF probe ranking uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def nb_train_score(
    docs: DataFrame,
    id_col: str,
    class_col: str,
    tokens_col: str,
    score_round: int = 4,
) -> DataFrame:
    """Train multinomial NB on ``docs`` (self-train) and score every doc.

    ``tokens_col``: an ``array<string>`` column of the doc's tokens.
    Returns (id_col, class_col, pred, score) — one row per doc, ``score``
    the rounded winning log-posterior (up to an additive constant).

    Laplace-smoothed: p(t|c) = (count(t,c) + 1) / (total_c + V), with V the
    corpus-wide distinct-token count; unseen (class, token) pairs hit the
    smoothing floor via a left join + coalesce against the dense
    (doc-token × class) grid. Scoring cost is |(doc, distinct token)| × C
    rows — the per-class model is broadcast, the corpus never reshuffles.
    """
    tok = docs.select(
        F.col(id_col), F.col(class_col), F.explode(tokens_col).alias("_t")
    )
    tf = tok.groupBy(id_col, class_col, "_t").agg(F.count(F.lit(1)).alias("_tf"))
    # model tables (all broadcast-sized: C rows, C×V rows, 1 row)
    cls_tok = tok.groupBy(F.col(class_col).alias("_c"), "_t").agg(
        F.count(F.lit(1)).alias("_ct")
    )
    cls_tot = cls_tok.groupBy("_c").agg(F.sum("_ct").alias("_tot"))
    priors = docs.groupBy(F.col(class_col).alias("_c")).agg(
        F.count(F.lit(1)).alias("_nd")
    )
    vocab = tok.agg(F.countDistinct("_t").alias("_v"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("_n"))
    model = (
        cls_tot.join(priors, "_c")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(n_docs))
    )
    scored = (
        tf.crossJoin(F.broadcast(model.select("_c", "_tot", "_nd", "_v", "_n")))
        .join(
            F.broadcast(cls_tok),
            ["_c", "_t"],
            "left",
        )
        .select(
            id_col,
            class_col,
            "_c",
            "_nd",
            "_n",
            (
                F.col("_tf")
                * F.log(
                    (F.coalesce("_ct", F.lit(0)) + F.lit(1.0))
                    / (F.col("_tot") + F.col("_v"))
                )
            ).alias("_ll"),
        )
    )
    per_class = scored.groupBy(id_col, class_col, "_c").agg(
        F.round(
            F.sum("_ll") + F.first(F.log(F.col("_nd") / F.col("_n"))), score_round
        ).alias("_score")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_score"), F.asc("_c"))
    best = per_class.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    )
    return best.select(
        id_col,
        class_col,
        F.col("_c").alias("pred"),
        (F.col("_score") + F.lit(0.0)).alias("score"),
    )
