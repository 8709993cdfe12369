"""Semantic checks for the text dedup family (cross-engine parity is covered
by the DuckDB oracles; these pin detection behavior)."""

from __future__ import annotations

import pytest

from etl_aws_spark.text import analysis, dedup


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "a"),
        (2, "the quick brown fox jumps over the lazy dog", "a"),   # exact dup of 1
        (3, "the quick brown fox leaps over the lazy dog", "a"),   # near dup of 1
        (4, "completely different content about spark engines", "a"),
        (5, "el rapido zorro marron salta sobre el perro", "b"),
    ]
    return spark.createDataFrame(rows, "id long, text string, src string")


def test_exact_dedup_finds_identical(spark, corpus):
    out = dedup.exact_dedup(corpus, "id", "text").toPandas().set_index("id")
    assert out.loc[2, "canonical_id"] == 1 and out.loc[2, "is_dup"] == 1
    assert out.loc[1, "is_dup"] == 0
    assert out.loc[3, "is_dup"] == 0  # near-dup is NOT an exact dup


def test_minhash_lsh_clusters_near_dups(spark, corpus):
    out = dedup.minhash_lsh_dedup(corpus, "id", "text").toPandas().set_index("id")
    # identical docs always share every band
    assert out.loc[2, "canonical_id"] == 1
    # unrelated docs stay distinct
    assert out.loc[4, "canonical_id"] == 4
    assert out.loc[5, "canonical_id"] == 5
    # one-word-changed doc shares 8/9 shingles — jaccard .8, likely banded
    assert out.loc[3, "canonical_id"] in (1, 3)


def test_ngram_jaccard_scores_near_dup(spark, corpus):
    pairs = dedup.ngram_jaccard_pairs(
        corpus, "id", "text", block_cols=["src"], n=2, threshold=0.5
    ).toPandas()
    got = {(a, b): j for a, b, j in pairs.itertuples(index=False)}
    assert got[(1, 2)] == 1.0
    assert 0.5 <= got[(1, 3)] < 1.0
    assert (1, 4) not in got


def test_simhash_hamming_pairs(spark, corpus):
    pairs = dedup.simhash_hamming_pairs(corpus, "id", "text", max_distance=4).toPandas()
    ids = {(a, b) for a, b in zip(pairs.id_a, pairs.id_b)}
    assert (1, 2) in ids  # identical → distance 0


def test_lang_id_separates_languages(spark, corpus):
    out = analysis.lang_id(corpus, "text").toPandas().set_index("id")
    assert out.loc[1, "pred_lang"] == "en"
    assert out.loc[5, "pred_lang"] == "es"


def test_winnow_fingerprint_overlap(spark, corpus):
    fps = dedup.winnow_fingerprint(corpus, "id", "text").toPandas()
    by_id = {i: set(g.fingerprint) for i, g in fps.groupby("id")}
    assert by_id[1] == by_id[2]          # identical docs → identical sketch
    assert by_id[1] & by_id[3]           # near dups share fingerprints
    assert not (by_id[1] & by_id[4])     # unrelated share none


def test_minhash_estimate_quality(spark):
    from etl_aws_spark.text import dedup

    # a: base doc; b: exact copy (est = true = 1, err = 0); c: half-overlap
    docs = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),
        (3, "alpha beta gamma delta iota kappa lambda mu"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = dedup.minhash_estimate_quality(df, "doc_id", "text").toPandas()
    exact = out[(out.id_a == 1) & (out.id_b == 2)]
    assert len(exact) == 1
    assert exact.est_jaccard.iloc[0] == 1.0
    assert exact.true_jaccard.iloc[0] == 1.0
    assert exact.abs_err.iloc[0] == 0.0
    # every surfaced pair: estimator within the 16-hash binomial noise
    assert (out.abs_err <= 0.5).all()
    assert out.est_jaccard.between(0, 1).all() and out.true_jaccard.between(0, 1).all()


def test_minhash_band_edges_bucket_cap(spark):
    # 8 identical docs share every band; cap below the bucket size must
    # drop the bucket entirely (no edges), cap above keeps the clique
    from etl_aws_spark.text.dedup import minhash_band_edges

    rows = [(i, "alpha beta gamma delta") for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = minhash_band_edges(docs, "doc_id", "text", max_bucket=4)
    assert capped.count() == 0
    uncapped = minhash_band_edges(docs, "doc_id", "text", max_bucket=None)
    assert uncapped.count() == 8 * 7 // 2


def test_containment_finds_superset_jaccard_misses(spark):
    from etl_aws_spark.text import dedup

    short = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    long = short + " " + " ".join(f"filler{i} pad{i} word{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(0, short), (1, long), (2, "completely different content " * 5)],
        "doc_id long, text string",
    )
    out = dedup.ngram_containment_pairs(
        docs, "doc_id", "text", n=3, threshold=0.9, max_df=50
    ).toPandas()
    # the short doc is fully contained in the long one
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.id_a, r.id_b) == (0, 1)
    assert r.containment == 1.0
    # jaccard on the same pair is far below any dedup threshold — the
    # reason this operator exists
    assert r.jaccard < 0.2


def test_bpe_expression_path_equals_reference_loop(spark):
    """The replace-chain-in-rank-order formulation must equal the
    textbook min-rank merge loop AND the mapInPandas twin on real corpus
    text plus adversarial edges (repeats, mixed case, punct, digits,
    bracket chars, empty)."""
    from etl_aws_spark.text import bpe

    rows = [
        (1, "The theory of the matter is that running wheels are running."),
        (2, "hello world 12345 !!! <b> and-the-end"),
        (3, ""),
        (4, "a"),
        (5, "THATHATHAT thth chchch whwhich 999 . , ;"),
        (6, "thatthatthat ananan ststst whichwhich"),
        (7, "< > << >> <t><h>"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    expr_out = {
        r.doc_id: r.n_tokens_bpe
        for r in bpe.bpe_token_count(df, "doc_id", "text").collect()
    }
    pd_out = {
        r.doc_id: r.n_tokens_bpe
        for r in bpe.bpe_token_count_pandas(df, "doc_id", "text").collect()
    }
    assert expr_out == pd_out
    # reference loop, recomputed here independently
    import re

    ranks = {p: i for i, p in enumerate(bpe.MERGES)}
    pat = re.compile(bpe.PRETOKEN_RE)
    for doc_id, text in rows:
        n = sum(
            len(bpe._bpe_word(w.lower(), ranks)) if re.fullmatch(r"[A-Za-z]+", w) else 1
            for w in pat.findall(text)
        )
        assert expr_out[doc_id] == n, (doc_id, expr_out[doc_id], n)


def test_bpe_merge_table_is_well_formed():
    """Every merge operand must be a single char or the product of a
    strictly earlier merge — the property that makes one rank-order pass
    equivalent to the min-rank loop."""
    from etl_aws_spark.text import bpe

    produced = set()
    for a, b in bpe.MERGES:
        for operand in (a, b):
            assert len(operand) == 1 or operand in produced, (a, b, operand)
        produced.add(a + b)


def test_bpe_counts_on_documents_fixture(spark):
    """Corpus smoke: BPE counts are positive, strictly fewer than
    character counts, and at least the whitespace token count for every
    non-trivial doc."""
    from pyspark.sql import functions as F

    from etl_aws_spark.registry import load
    from etl_aws_spark.text import bpe

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    out = (
        bpe.bpe_token_count(docs, "doc_id", "text")
        .join(docs.select("doc_id", F.length("text").alias("n_chars")), "doc_id")
        .filter(F.col("n_chars") > 0)
    )
    bad = out.filter(
        (F.col("n_tokens_bpe") <= 0) | (F.col("n_tokens_bpe") > F.col("n_chars"))
    ).count()
    assert bad == 0


def test_bpe_train_merges_hand_fixture(spark):
    """Tiny corpus where the weighted pair argmax sequence is computable
    by hand: 'the'x3 + 'tea'x2 -> first merges (h,e) vs (t,h) tie? counts:
    (t,h)=3, (h,e)=3, (t,e)=2, (e,a)=2 -> lexicographic tie-break picks
    (h,e); then (t,he)=3."""
    from etl_aws_spark.text import bpe

    df = spark.createDataFrame(
        [(1, "the the the tea tea")], "doc_id long, text string"
    )
    m = bpe.train_merges(df, "text", n_merges=3)
    assert m[0] == ("h", "e", 3)
    assert m[1] == ("t", "he", 3)
    assert m[2] == ("e", "a", 2)


def test_bpe_trained_table_is_well_formed_and_applies(spark):
    """Merges learned from the real fixture must satisfy the same
    well-formedness property as the static table (operands are chars or
    earlier products), so the rank-order replace chain applies them
    exactly like the min-rank loop."""
    from etl_aws_spark.registry import load
    from etl_aws_spark.text import bpe

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    learned = bpe.train_merges(docs, "text", n_merges=10)
    assert len(learned) == 10
    produced = set()
    for a, b, c in learned:
        for operand in (a, b):
            assert len(operand) == 1 or operand in produced, (a, b)
        produced.add(a + b)
        assert c >= 1
    # counts are non-increasing is NOT guaranteed by BPE (merging can
    # create new frequent pairs), but the first merge must be the global
    # max weighted bigram — sanity: it involves single chars only
    assert len(learned[0][0]) == 1 and len(learned[0][1]) == 1


def test_bpe_sampled_training_tracks_full_corpus(spark):
    """The hash-sampled training path (tokenizer_train_bpe_sampled) must
    learn substantially the same vocabulary as full-corpus training on
    the fixture (pair statistics concentrate fast — the justification for
    the sampled posture at scale), and its corpus-wide compression curve
    must be strictly non-increasing (every merge can only fuse, never
    split)."""
    from etl_aws_spark.registry import all_queries
    from etl_aws_spark.suite.q_text import _BPE_SAMPLE_MOD
    from etl_aws_spark.text import bpe

    import pyspark.sql.functions as F

    sf = "/root/testdata/sf0.01"
    out = (
        all_queries()["tokenizer_train_bpe_sampled"](spark, sf)
        .orderBy("merge_rank")
        .collect()
    )
    assert len(out) == 12
    curve = [r["corpus_tokens_after"] for r in out]
    assert all(x >= y for x, y in zip(curve, curve[1:])), curve
    # vocabulary overlap with full-corpus training: ≥ 2/3 of merges shared
    from etl_aws_spark.registry import load

    docs = load(spark, sf, "documents")
    full = {(a, b) for a, b, _ in bpe.train_merges(docs, "text", n_merges=12)}
    samp = {(r["a"], r["b"]) for r in out}
    assert len(full & samp) >= 8, (sorted(full), sorted(samp))
    # the sample really is a strict subset of documents
    h = (
        "cast(conv(substr(md5(concat('bpesample:', cast(doc_id as string))),"
        " 1, 15), 16, 10) as bigint)"
    )
    n_all = docs.count()
    n_samp = docs.filter(F.expr(f"pmod({h}, {_BPE_SAMPLE_MOD}) = 0")).count()
    assert 0 < n_samp < n_all


def test_bm25_hand_computed_tiny_corpus(spark):
    import math

    import numpy as np
    from pyspark.sql import functions as F

    from etl_aws_spark.text import _dialect as D

    # 3 docs, query {"a", "b"}: replicate the registered query's scoring
    # rule (Lucene idf, k1=1.2, b=0.75) by hand
    docs = [(0, "a a b"), (1, "a c c c"), (2, "c d")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    from etl_aws_spark.suite.q_text import _BM25_B, _BM25_K1

    toks = {d: t.split() for d, t in docs}
    N = 3
    avgdl = sum(len(v) for v in toks.values()) / N
    dfreq = {"a": 2, "b": 1, "c": 2, "d": 1}

    def bm25(doc, terms):
        s = 0.0
        for t in sorted(terms):
            tf = toks[doc].count(t)
            if tf == 0:
                continue
            idf = math.log(1.0 + (N - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * (tf * (_BM25_K1 + 1.0)) / (
                tf + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * (len(toks[doc]) / avgdl))
            )
        return s

    # run the same pipeline the registered query uses, against this frame
    from pyspark.sql import Window

    tok = df.select("doc_id", F.explode(F.expr(D.tokens("text", D.SPARK))).alias("t"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    tf = tok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("tf"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    dfr = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    qt = spark.createDataFrame([(0, "a"), (0, "b")], "qid long, t string")
    k1, b = _BM25_K1, _BM25_B
    ts = (
        tf.join(qt, "t").join(dl, "doc_id").join(dfr, "t").crossJoin(stats)
        .select(
            "qid", "doc_id",
            (
                F.log(1.0 + ((F.col("n") - F.col("df")).cast("double") + 0.5)
                      / (F.col("df").cast("double") + 0.5))
                * (F.col("tf").cast("double") * F.lit(k1 + 1.0))
                / (F.col("tf").cast("double")
                   + F.lit(k1) * (F.lit(1.0) - F.lit(b)
                                  + F.lit(b) * (F.col("dl").cast("double") / F.col("avgdl"))))
            ).alias("ts"),
        )
    )
    got = ts.groupBy("qid", "doc_id").agg(F.sum("ts").alias("score")).toPandas()
    for _, row in got.iterrows():
        want = bm25(int(row.doc_id), ["a", "b"])
        np.testing.assert_allclose(row.score, want, rtol=1e-12)
    # doc 2 shares no query term: must be absent entirely
    assert set(got.doc_id) == {0, 1}


def test_simhash_hamming_pairs_match_bruteforce(spark):
    # the r8 distinct-signature reduction must emit exactly the pairs the
    # direct per-doc banded join would: same-signature duplicates (the
    # expansion's self-join leg), cross-signature near-dups (the sig-pair
    # expansion leg), and nothing for docs sharing no half-signature
    from itertools import combinations

    from etl_aws_spark.text import dedup

    docs = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),   # dup of 1
        (3, "alpha beta gamma delta epsilon zeta eta iota"),    # near 1
        (4, "one two three four five six seven eight"),
        (5, "alpha beta gamma delta epsilon zeta eta theta"),   # dup of 1
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    nbits, k = 32, 2
    got = (
        dedup.simhash_hamming_pairs(df, "doc_id", "text", nbits=nbits, max_distance=k)
        .toPandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    sigs = dict(
        dedup.simhash(df, "doc_id", "text", nbits)
        .select("doc_id", "simhash")
        .collect()
    )
    half = nbits // 2
    expect = set()
    for a, b in combinations(sorted(sigs), 2):
        sa, sb = sigs[a], sigs[b]
        shares_band = (sa % (1 << half) == sb % (1 << half)) or (sa >> half == sb >> half)
        if shares_band and bin(sa ^ sb).count("1") <= k:
            expect.add((a, b, bin(sa ^ sb).count("1")))
    assert set(map(tuple, got[["id_a", "id_b", "hamming"]].values)) == expect
    assert (got.id_a < got.id_b).all()
    # the duplicate trio must appear as three hamming-0 pairs
    assert {(1, 2, 0), (1, 5, 0), (2, 5, 0)} <= expect
