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
