"""Curation operators: budget selection equivalence, sampling determinism,
contamination and repetition semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_aws_spark.text import curation


def test_token_budget_matches_naive_cumsum(spark):
    # two-phase bucket selection must equal the naive global ordered cumsum
    rows = [(i, float((i * 37 % 100) / 100.0), 10 + i % 7) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, q double, tok long")
    for budget in (0, 137, 1000, 10**6):
        got = sorted(
            r.id
            for r in curation.token_budget_select(df, "id", "q", "tok", budget).collect()
        )
        ordered = sorted(rows, key=lambda r: (-r[1], r[0]))
        cum, want = 0, []
        for i, _, t in ordered:
            cum += t
            if cum > budget:
                break
            want.append(i)
        assert got == sorted(want), budget


def test_stratified_sample_deterministic_and_rated(spark):
    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(3000)]
    df = spark.createDataFrame(rows, "id long, src string")
    rates = {"a": 1.0, "b": 0.3, "c": 0.0}
    s1 = curation.stratified_sample_hash(df, "id", "src", rates).collect()
    s2 = curation.stratified_sample_hash(df, "id", "src", rates).collect()
    assert sorted(r.id for r in s1) == sorted(r.id for r in s2)  # replayable
    by = {}
    for r in s1:
        by[r.src] = by.get(r.src, 0) + 1
    assert by.get("a") == 1000       # rate 1.0 keeps everything
    assert "c" not in by             # rate 0.0 keeps nothing
    assert 200 < by.get("b", 0) < 400  # hash sampling ~30%


def test_contamination_flags_shared_ngrams(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words here nothing shared at all"),
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, "quick brown fox leaps high above the lazy dog")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in curation.contamination_overlap(
        train, eval_df, "doc_id", "text", n=3, min_shared=2
    ).collect()}
    assert 1 in out and out[1].contaminated  # shares "quick brown fox", "the lazy dog"
    assert 2 not in out                      # zero shared shingles -> no row


def test_repetition_ratio_bounds(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a b a b"),          # heavy bigram repetition
            (2, "one two three four five"),  # all bigrams distinct
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.dup_ratio for r in curation.repetition_ratio(
        df, "doc_id", "text", n=2
    ).collect()}
    assert out[2] == 0.0
    # 7 bigrams, only 2 distinct ("a b", "b a") -> 5/7 repeats
    assert out[1] == pytest.approx(5.0 / 7.0)


def test_gopher_rules_keep_is_conjunction(spark):
    df = spark.createDataFrame(
        [(1, "the of and to in is that it for a " * 5), (2, "x")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in curation.gopher_rules(df, "text").collect()}
    assert out[1].keep == all(
        [out[1].r_len, out[1].r_tok_len, out[1].r_uniq, out[1].r_stop]
    )
    assert not out[2].keep and not out[2].r_len


def test_token_budget_null_quality_excluded(spark):
    # NULL-quality rows are unrankable: they must not consume budget in
    # phase 1 and must not appear in the output (the silent-drop advice fix)
    rows = [(1, 0.9, 50), (2, None, 10**6), (3, 0.5, 50), (4, None, 10**6)]
    df = spark.createDataFrame(rows, "id long, q double, tok long")
    got = sorted(r.id for r in curation.token_budget_select(df, "id", "q", "tok", 100).collect())
    # both non-null docs fit ONLY if the huge null-quality docs didn't
    # charge the budget; and the null docs themselves are excluded
    assert got == [1, 3]


def test_duplicate_span_ratio_detects_copied_span(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # exactly 8 words
    docs = spark.createDataFrame(
        [
            (0, shared + " unique tail zero one two"),
            (1, "front words here " + shared),
            (2, "totally different body with no overlap at all nine ten"),
            (3, "tiny doc"),  # shorter than n: zero spans, NULL ratio
        ],
        "doc_id long, text string",
    )
    out = (
        curation.duplicate_span_ratio(docs, "doc_id", "text", n=8)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert len(out) == 4
    # the copied 8-gram is exactly one span start in each carrier doc
    assert out.loc[0, "n_dup_spans"] == 1
    assert out.loc[1, "n_dup_spans"] == 1
    assert out.loc[2, "n_dup_spans"] == 0
    # 13-word doc -> 6 span starts
    assert out.loc[0, "n_spans"] == 6
    assert abs(out.loc[0, "dup_ratio"] - round(1 / 6, 6)) < 1e-9
    # short doc survives with zero spans and NULL ratio
    assert out.loc[3, "n_spans"] == 0
    import pandas as pd

    assert pd.isna(out.loc[3, "dup_ratio"])


def test_sequence_pack_conservation_and_splits(spark):
    """Packing must conserve every token exactly once, keep per-sequence
    totals <= seq_len (== seq_len for all but each shard's last), and
    mark boundary-crossers."""
    from pyspark.sql import functions as F

    from etl_aws_spark.text import curation

    rows = [(i, "w " * (5 + (i * 7) % 23)) for i in range(40)] + [(40, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ntok = "size(filter(split(trim(lower(text)), '\\\\s+'), t -> t <> ''))"
    out = curation.sequence_pack(df, "doc_id", ntok, seq_len=16, n_shards=4).toPandas()
    # conservation: per-doc slices sum to the doc's token count
    per_doc = out.groupby("doc_id").n_tokens_in_seq.sum().to_dict()
    for i in range(40):
        assert per_doc[i] == 5 + (i * 7) % 23, i
    assert 40 not in per_doc  # empty doc occupies nothing
    # sequence budgets: every (shard, seq) holds exactly seq_len tokens
    # except the final sequence of each shard
    totals = out.groupby(["shard", "seq_id"]).n_tokens_in_seq.sum()
    last = out.groupby("shard").seq_id.max().to_dict()
    for (shard, seq), tot in totals.items():
        if seq < last[shard]:
            assert tot == 16, (shard, seq, tot)
        else:
            assert tot <= 16
    # is_split flags exactly the docs appearing in >1 sequence
    counts = out.groupby("doc_id").seq_id.nunique()
    flagged = out.groupby("doc_id").is_split.max()
    for did in counts.index:
        assert (counts[did] > 1) == bool(flagged[did]), did


def test_chunk_overlap_covers_all_tokens_with_stride(spark):
    from etl_aws_spark.text import curation

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(117))), (2, "a b"), (3, "")],
        "doc_id long, text string",
    )
    out = curation.chunk_overlap(df, "doc_id", "text", chunk_tokens=50, overlap=10)
    pdf = out.toPandas().sort_values(["doc_id", "chunk_idx"])
    d1 = pdf[pdf.doc_id == 1]
    # stride 40: starts 0,40,80 -> lens 50,50,37; every token covered
    assert list(d1.tok_start) == [0, 40, 80]
    assert list(d1.n_chunk_tokens) == [50, 50, 37]
    d2 = pdf[pdf.doc_id == 2]
    assert list(d2.tok_start) == [0] and list(d2.n_chunk_tokens) == [2]
    assert (pdf.doc_id == 3).sum() == 0  # empty doc -> no chunks


def test_bigram_lm_score_matches_hand_computation(spark):
    """Tiny corpus where the smoothed bigram probabilities are computable
    by hand; scorer must reproduce them exactly."""
    import math

    from etl_aws_spark.text import analysis

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "c")], "doc_id long, text string"
    )
    out = {r.doc_id: (r.n_bigrams, r.avg_logp)
           for r in analysis.bigram_lm_score(df, "doc_id", "text").collect()}
    # corpus: tokens a,b,a,b,a,b,c -> c1: a=3, b=3, c=1; V=3
    # bigrams: doc1 (a,b),(b,a),(a,b); doc2 (a,b) -> c2(a,b)=3, c2(b,a)=1
    p_ab = round(math.log(4 / 6), 6)
    p_ba = round(math.log(2 / 6), 6)
    assert out[1][0] == 3
    assert abs(out[1][1] - (2 * p_ab + p_ba) / 3) < 1e-9
    assert out[2][0] == 1 and abs(out[2][1] - p_ab) < 1e-9
    assert out[3][0] == 0 and out[3][1] is None


def test_remove_duplicate_spans_keeps_first_occurrence(spark):
    """A full copy of a document must lose every shared block to the
    lower-id original and collapse to its tail; the original keeps all
    its text. Within-doc repeats of a block are cut too."""
    import hashlib

    from etl_aws_spark.text import curation

    blockA = " ".join(f"a{i}" for i in range(4))
    blockB = " ".join(f"b{i}" for i in range(4))
    tail = "t0 t1"
    rows = [
        (1, f"{blockA} {blockB} {tail}"),      # original: 2 spans + tail
        (2, f"{blockA} {blockB} {tail}"),      # full copy -> loses both spans
        (3, f"{blockB} {blockA}"),             # reordered: both spans dup'd
        (4, f"{blockA} {blockA}"),             # within-doc repeat: 2nd cut
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in curation.remove_duplicate_spans(
            df, "doc_id", "text", span_words=4
        ).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    r1 = out[1]
    assert (r1.n_spans, r1.n_spans_removed) == (2, 0)
    assert r1.clean_digest == md5(f"{blockA} {blockB} {tail}")
    r2 = out[2]
    assert (r2.n_spans, r2.n_spans_removed) == (2, 2)
    assert r2.n_tokens_clean == 2 and r2.clean_digest == md5(tail)
    r3 = out[3]
    assert (r3.n_spans, r3.n_spans_removed) == (2, 2)
    assert r3.clean_digest == md5("")
    r4 = out[4]
    # doc 4's first blockA occurrence is NOT the corpus-first (doc 1 is),
    # so both of its spans are cut
    assert (r4.n_spans, r4.n_spans_removed) == (2, 2)
    assert r4.n_tokens_clean == 0
