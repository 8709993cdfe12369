"""Text analysis operators: language ID, quality scoring, token counting.

All pure column expressions (no UDFs); `_dialect.py`-style SQL mirrors live
in the suite oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_aws_spark.text import _dialect as D

# Compact high-frequency marker lexicons (function words). Real corpora get
# real profiles; the operator semantics — fraction-of-tokens-in-lexicon,
# argmax with deterministic tie-break — are what matters.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "del", "se", "las"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une", "du", "est"),
    "de": ("der", "die", "das", "und", "ist", "von", "den", "mit", "des", "ein"),
    "pt": ("o", "a", "de", "que", "e", "do", "da", "em", "um", "para"),
}

STOPWORDS = LANG_MARKERS["en"]

# BPE-ish pre-tokenization: letter runs, digit runs, single punctuation —
# the classic GPT-2-style split, minus unicode categories (ASCII corpus).
BPE_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _marker_score(text_col: str, markers: tuple[str, ...]) -> F.Column:
    toks = D.tokens(text_col, D.SPARK)
    quoted = ", ".join(f"'{m}'" for m in markers)
    return F.expr(
        f"aggregate({toks}, 0, (acc, t) -> acc + IF(t IN ({quoted}), 1, 0)) "
        f"/ cast(size({toks}) as double)"
    )


def lang_id(df: DataFrame, text_col: str) -> DataFrame:
    """N-gram-lexicon language identification: score = fraction of tokens in
    each language's marker lexicon; prediction = argmax, ties broken by
    language code order. Adds ``pred_lang`` and ``lang_score``."""
    scored = df.withColumns(
        {f"_sc_{lang}": _marker_score(text_col, m) for lang, m in LANG_MARKERS.items()}
    )
    langs = sorted(LANG_MARKERS)  # deterministic tie-break: alphabetical
    best = F.greatest(*[F.col(f"_sc_{lang}") for lang in langs])
    pred = F.lit(None).cast("string")
    for lang in reversed(langs):
        pred = F.when(F.col(f"_sc_{lang}") == best, F.lit(lang)).otherwise(pred)
    out = scored.withColumn("pred_lang", pred).withColumn("lang_score", best)
    return out.drop(*[f"_sc_{lang}" for lang in langs])


def token_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Whitespace token count + BPE-ish pre-token count (letter runs, digit
    runs, single punctuation)."""
    toks = D.tokens(text_col, D.SPARK)
    return df.withColumns(
        {
            "n_tokens_ws": F.expr(f"size({toks})").cast("bigint"),
            "n_tokens_bpe": F.size(
                F.regexp_extract_all(F.col(text_col), F.lit(BPE_REGEX), 0)
            ).cast("bigint"),
        }
    )


def tfidf_top_terms(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF
    (idf = ln((N+1)/(df_t+1)) + 1, sklearn's smooth_idf).

    Relational shape — ONE linear pipeline over the (doc, term) relation,
    exactly three shuffles: explode tokens → (doc, term) counts [1] →
    document frequency as a COUNT WINDOW over term [2] (tf rows are unique
    per (doc, term), so count(*) over the term partition IS the distinct-doc
    frequency — no second aggregate, no vocabulary-sized broadcast join,
    and the tokenize+count subtree is never duplicated) → per-doc rank [3].
    N docs is a 1-row count (``id_col`` is the table's primary key)
    broadcast via a single-row cross join. Very hot terms make skewed term
    partitions in [2]; the sort spills, and the alternative (aggregate +
    broadcast join) re-tokenizes the corpus twice because the join's
    null-filter pushdown breaks exchange reuse — measured strictly worse."""
    from pyspark.sql import Window

    terms = df.select(
        F.col(id_col), F.explode(F.expr(D.tokens(text_col, D.SPARK))).alias("term")
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.select(F.count(id_col).alias("_n"))
    wt = Window.partitionBy("term")
    scored = (
        tf.withColumn("_df", F.count(F.lit(1)).over(wt))
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            (
                F.col("tf")
                * (F.log((F.col("_n") + 1.0) / (F.col("_df") + 1.0)) + 1.0)
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def quality_score(df: DataFrame, text_col: str) -> DataFrame:
    """Heuristic document quality profile: length, mean token length,
    stopword ratio, punctuation ratio, distinct-token ratio, and a composite
    score in [0,1] (Gopher/C4-style repetition+structure filters distilled
    to expression form).

    score = 0.25·clip(n_tok/100) + 0.25·stop_ratio·5 (cap 1) +
            0.25·uniq_ratio + 0.25·(1 - punct_ratio·10 (cap 1))
    """
    toks = D.tokens(text_col, D.SPARK)
    n_tok = F.expr(f"size({toks})")
    n_chars = F.length(text_col)
    mean_tok_len = F.expr(
        f"aggregate({toks}, 0, (acc, t) -> acc + length(t)) / cast(size({toks}) as double)"
    )
    stop_ratio = _marker_score(text_col, STOPWORDS)
    uniq_ratio = F.expr(f"size(array_distinct({toks})) / cast(size({toks}) as double)")
    n_punct = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[^A-Za-z0-9\s]"), 0))
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1)).cast("double")
    clip = lambda c: F.least(c, F.lit(1.0))  # noqa: E731
    score = (
        0.25 * clip(n_tok / F.lit(100.0))
        + 0.25 * clip(stop_ratio * 5.0)
        + 0.25 * uniq_ratio
        + 0.25 * (1.0 - clip(punct_ratio * 10.0))
    )
    return df.withColumns(
        {
            "n_tokens": n_tok.cast("bigint"),
            "mean_token_len": mean_tok_len,
            "stopword_ratio": stop_ratio,
            "uniq_token_ratio": uniq_ratio,
            "punct_ratio": punct_ratio,
            "quality_score": score,
        }
    )


def bigram_lm_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus-trained bigram language-model scoring — the CCNet-shaped
    quality signal: train add-one-smoothed bigram probabilities on the
    corpus itself, then score every document by mean log-probability
    (low = out-of-distribution / garbled text; reference analogue: none —
    LLM-pipeline extension tier).

    P(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V) with V = |vocabulary|.

    Scale shape: the model IS two aggregates — unigram instance counts
    and bigram counts — joined back to the exploded bigram stream on
    their natural keys (token-scale shuffles of short strings; no model
    ever collects anywhere, unlike a perplexity UDF with a broadcast LM).
    Determinism: each bigram's log-prob is rounded to 6 digits, then
    summed per document in POSITION order via the house
    sort-collect-fold, so the float total is engine-exact regardless of
    shuffle order; ln's 1-ulp engine variance is absorbed by the
    pre-round.

    Output: (id, n_bigrams, avg_logp) — avg_logp NULL for docs with
    fewer than two tokens.
    """
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.expr(
            f"filter({D.tokens(text_col, D.SPARK)}, t -> t <> '')"
        ).alias("_toks"),
    )
    big = toks.select(
        "_id",
        F.expr(
            "posexplode(zip_with(slice(_toks, 1, greatest(size(_toks) - 1, 0)), "
            "slice(_toks, 2, greatest(size(_toks) - 1, 0)), "
            "(a, b) -> struct(a as w1, b as w2)))"
        ).alias("pos", "bg"),
    ).select("_id", "pos", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    uni = toks.select(F.explode("_toks").alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("c1")
    )
    vocab = uni.agg(F.count(F.lit(1)).alias("_V"))
    bc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    scored = (
        big.join(bc, ["w1", "w2"])
        .join(uni.select(F.col("w").alias("w1"), "c1"), "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "_id",
            "pos",
            (
                F.round(
                    F.log(
                        (F.col("c2") + 1).cast("double")
                        / (F.col("c1") + F.col("_V")).cast("double")
                    ),
                    6,
                )
                + F.lit(0.0)
            ).alias("_lp"),
        )
    )
    per_doc = scored.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(pos, _lp))), "
            "s -> s._lp), cast(0.0 as double), (acc, x) -> acc + x)"
        ).alias("_sum"),
    )
    all_docs = df.select(F.col(id_col).alias("_id"))
    return all_docs.join(per_doc, "_id", "left").select(
        F.col("_id").alias(id_col),
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        (F.col("_sum") / F.col("n_bigrams")).alias("avg_logp"),
    )
