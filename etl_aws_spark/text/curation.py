"""Training-data curation operators: rule filters, stratified sampling,
contamination checks, repetition detection, token-budget selection.

The curation layer a 100 TB pretraining pipeline runs AFTER dedup
(text/dedup.py) and quality profiling (text/analysis.py) — every operator
here is pure relational algebra over the shared `_dialect` token/shingle
expressions, so each has an exact DuckDB oracle and stays in whole-stage
codegen. The reference repo has no corpus layer (it is a quotes ETL); these
re-express the public C4/Gopher-style curation recipes in Spark form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_aws_spark.text import _dialect as D
from etl_aws_spark.text.analysis import STOPWORDS, _marker_score


def gopher_rules(df: DataFrame, text_col: str) -> DataFrame:
    """Gopher/C4-style rule filter, distilled to expression form: each rule
    is a boolean column, ``keep`` is their conjunction — so downstream can
    both filter and report per-rule rejection counts from one pass.

    Rules (public Gopher table 1 / C4 heuristics, thresholds scaled to the
    fixture corpus): token count in [10, 100k], mean token length in
    [2, 12], distinct-token ratio > 0.3, stopword ratio >= 0.02.
    """
    toks = D.tokens(text_col, D.SPARK)
    n_tok = F.expr(f"size({toks})")
    mean_len = F.expr(
        f"aggregate({toks}, 0, (acc, t) -> acc + length(t)) / cast(size({toks}) as double)"
    )
    uniq_ratio = F.expr(f"size(array_distinct({toks})) / cast(size({toks}) as double)")
    stop_ratio = _marker_score(text_col, STOPWORDS)
    rules = {
        "r_len": (n_tok >= 10) & (n_tok <= 100_000),
        "r_tok_len": (mean_len >= 2.0) & (mean_len <= 12.0),
        "r_uniq": uniq_ratio > 0.3,
        "r_stop": stop_ratio >= 0.02,
    }
    out = df.withColumns(rules)
    keep = None
    for name in rules:
        keep = F.col(name) if keep is None else keep & F.col(name)
    return out.withColumn("keep", keep)


def stratified_sample_hash(
    df: DataFrame, id_col: str, strata_col: str, rates: dict[str, float]
) -> DataFrame:
    """DETERMINISTIC stratified sampling: per-stratum rates applied via a
    content hash of the id — ``hash60('sample:'||id) % 10000 < rate·10000``
    — so the sample is reproducible across runs/engines (no RNG state, no
    seed drift between executors) and any engine can replay it exactly.
    Unlisted strata get rate 0. The rate table enters as plan-time literals
    (a CASE chain), not a join — nothing to broadcast, nothing to skew."""
    h = D.hash60(f"concat('sample:', cast({id_col} as string))", D.SPARK)
    rate = F.lit(0.0)
    for stratum in sorted(rates):
        rate = F.when(F.col(strata_col) == stratum, F.lit(rates[stratum])).otherwise(rate)
    return df.filter(F.expr(f"{h} % 10000") < rate * 10000)


def contamination_overlap(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_shared: int = 2,
) -> DataFrame:
    """Benchmark-contamination check: count distinct word n-gram shingles
    each train document shares with ANY eval document, flag docs with
    ``>= min_shared``. Shuffle carries (shingle_hash, id) pairs only —
    never text — and the eval side (benchmarks are tiny) broadcasts, so at
    100 TB this is one scan of the corpus plus a map-side join.

    Output: one row per train doc that shares at least one shingle:
    (id, n_shared, contaminated)."""
    sh = D.shingle_hashes(text_col, n, D.SPARK)
    t = train.select(F.col(id_col), F.explode(F.expr(sh)).alias("_h"))
    e = eval_df.select(F.explode(F.expr(sh)).alias("_h")).distinct()
    return (
        t.join(F.broadcast(e), "_h")
        .groupBy(id_col)
        .agg(F.count_distinct("_h").alias("n_shared"))
        .withColumn("contaminated", F.col("n_shared") >= min_shared)
    )


def repetition_ratio(df: DataFrame, id_col: str, text_col: str, n: int = 2) -> DataFrame:
    """Within-document repetition (the Gopher duplicate-n-gram filter):
    fraction of n-gram occurrences that are repeats of an earlier n-gram,
    ``1 − distinct/total``. Pure HOF expressions — the shingle array never
    leaves the row, no explode, no shuffle."""
    all_sh = D._shingle_array(text_col, n, D.SPARK)
    total = F.expr(f"size({all_sh})")
    distinct = F.expr(f"size(array_distinct({all_sh}))")
    return df.select(
        F.col(id_col),
        total.cast("bigint").alias("n_shingles"),
        F.when(total > 0, 1.0 - distinct / total.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("dup_ratio"),
    )


def token_budget_select(
    df: DataFrame,
    id_col: str,
    quality_col: str,
    tokens_col: str,
    budget: int,
    n_buckets: int = 1000,
) -> DataFrame:
    """Select the highest-quality documents whose cumulative token count
    fits a budget — the data-mixing step that picks what actually gets
    trained on.

    The naive form is a GLOBAL ordered cumulative sum (one task at 100 TB).
    This is the scalable two-phase equivalent with identical output:

    1. bucket docs by ``floor(quality·n_buckets)`` and aggregate token
       totals per bucket — one narrow shuffle of (bucket, tokens);
    2. the per-bucket running totals (≤ n_buckets rows — driver-safe by
       construction) locate the cutoff bucket: every higher bucket is
       kept wholesale, every lower dropped, and ONLY the cutoff bucket —
       1/n_buckets of the data — runs an ordered cumulative sum against
       the residual budget.

    Monotone bucketing refines the (quality desc, id asc) global order, so
    the result is row-identical to the naive global cumsum (the oracle
    computes that form).

    NULL-quality rows are excluded up front: they cannot be ranked in the
    quality order, and leaving them in would let the NULL bucket's tokens
    be charged against the budget in phase 1 while both phase-2 keep
    predicates (NULL > cutoff, NULL == cutoff) silently drop the rows —
    driver accounting and the returned frame would disagree.
    """
    bucket = F.floor(F.col(quality_col) * n_buckets).cast("long")
    b = df.filter(F.col(quality_col).isNotNull()).withColumn("_bkt", bucket)
    totals = (
        b.groupBy("_bkt")
        .agg(F.sum(tokens_col).alias("_tok"))
        .orderBy(F.desc("_bkt"))
        .collect()
    )
    spent = 0
    cutoff = None  # first bucket that does not fit wholesale
    for row in totals:
        if spent + row["_tok"] <= budget:
            spent += row["_tok"]
        else:
            cutoff = row["_bkt"]
            break
    if cutoff is None:  # everything fits
        return b.select(id_col, quality_col, tokens_col)
    residual = budget - spent
    keep_whole = b.filter(F.col("_bkt") > cutoff)
    w = Window.partitionBy("_bkt").orderBy(F.desc(quality_col), F.asc(id_col))
    keep_partial = (
        b.filter(F.col("_bkt") == cutoff)
        .withColumn("_cum", F.sum(tokens_col).over(w))
        .filter(F.col("_cum") <= residual)
        .drop("_cum")
    )
    return keep_whole.unionByName(keep_partial).select(id_col, quality_col, tokens_col)


def duplicate_span_ratio(
    df: DataFrame, id_col: str, text_col: str, n: int = 8
) -> DataFrame:
    """Cross-document duplicate-span coverage (the span-level dedup metric
    of Lee et al., "Deduplicating Training Data Makes Language Models
    Better", ACL 2022): the fraction of a document's word ``n``-gram starts
    whose n-gram occurs more than once in the corpus (anywhere — another
    document or a repeat within this one). Where `repetition_ratio` is the
    WITHIN-doc Gopher signal, this is the ACROSS-corpus one: a high ratio
    marks boilerplate/template documents that exact- and near-dedup both
    miss because the duplication is sub-document.

    Scale shape (100 TB): spans explode to (doc_id, h) 60-bit hashes — the
    text itself never leaves its scan task; the global frequency table is
    one map-side-combined count on h; the join back to spans is hash-keyed
    (both sides partitioned by h, no broadcast of a corpus-sized table);
    the per-doc rollup is a second narrow (doc_id) aggregate. Shuffles
    carry only 16-byte rows end to end.

    Output: (doc_id, n_spans, n_dup_spans, dup_ratio) — ratio NULL for
    docs shorter than ``n`` words (nullif, ANSI-safe).
    """
    from etl_aws_spark.text import _dialect as D

    # docs shorter than n words have no spans — and would make the Spark
    # slice() inside the shingle expression throw (negative length, ANSI);
    # they re-enter via the left join below with zero counts
    long_enough = df.filter(F.expr(f"size({D.tokens(text_col, D.SPARK)}) >= {n}"))
    spans = long_enough.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.expr(
                f"transform({D._shingle_array(text_col, n, D.SPARK)}, "
                f"s -> {D.hash60('s', D.SPARK)})"
            )
        ).alias("h"),
    )
    freq = spans.groupBy("h").agg(F.count(F.lit(1)).alias("cnt"))
    marked = spans.join(freq, "h")
    per_doc = marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0)).alias("n_dup_spans"),
    )
    # docs shorter than n words produce no spans at all: restore them with
    # zero counts so the output covers every input document
    all_docs = df.select(F.col(id_col).alias("doc_id"))
    return all_docs.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
        (
            F.round(
                F.col("n_dup_spans").cast("double")
                / F.nullif(F.col("n_spans").cast("double"), F.lit(0.0)),
                6,
            )
            + F.lit(0.0)
        ).alias("dup_ratio"),
    )


def sequence_pack(
    df: DataFrame,
    id_col: str,
    tokens_expr: str,
    seq_len: int = 512,
    n_shards: int = 8,
) -> DataFrame:
    """GPT-style sequence packing: concatenate documents in a fixed order
    and cut every ``seq_len`` tokens — documents crossing a cut are SPLIT
    across training sequences (the standard pretraining pack; no padding
    waste, unlike bin-packing). ``tokens_expr`` is a SQL expression giving
    the document's token count (whitespace or BPE — caller's choice).

    Scale shape: real pipelines pack per output shard, so the global
    order is (shard, doc) — the running token offset is a window cumsum
    PARTITIONED by shard (parallel, one narrow (shard, id, n_tok)
    shuffle), never a single global window. Each document then explodes
    to one row per sequence it overlaps via `sequence(lo, hi)` — pure
    rowwise arithmetic. Sequence ids are (shard, seq_in_shard); total
    output rows = n_docs + n_boundary_crossings.

    Output: (id, shard, seq_id, tok_start, n_tokens_in_seq, is_split)
    where tok_start is the document's offset within the sequence.
    Zero-token documents are dropped (they occupy no sequence).
    """
    from pyspark.sql import Window

    from etl_aws_spark.operators.scale import (
        HEAVY_BYTES_PER_PART,
        fan_out_small_scan,
    )

    # tokens_expr (BPE counting) is expensive per-row map work BEFORE the
    # shard window's shuffle — widen a single-split gate-SF scan (no-op
    # at scale; measured 3.7 s of CPU on 1 task at sf0.1, ~6 ms/KB: the
    # heavy floor)
    base = fan_out_small_scan(df, HEAVY_BYTES_PER_PART).select(
        F.col(id_col).alias("_id"),
        (F.col(id_col) % n_shards).cast("int").alias("shard"),
        F.expr(tokens_expr).cast("long").alias("_n"),
    ).filter(F.col("_n") > 0)
    w = Window.partitionBy("shard").orderBy("_id")
    spans = base.select(
        "_id",
        "shard",
        "_n",
        (F.sum("_n").over(w) - F.col("_n")).alias("_start"),
    )
    bounded = spans.select(
        "_id",
        "shard",
        "_start",
        "_n",
        F.floor(F.col("_start") / seq_len).alias("_lo"),
        F.floor((F.col("_start") + F.col("_n") - 1) / seq_len).alias("_hi"),
    )
    out = bounded.select(
        "_id", "shard", "_start", "_n", "_lo", "_hi",
        F.explode(F.expr("sequence(_lo, _hi)")).alias("seq_id"),
    )
    seq_start = F.col("seq_id") * seq_len
    return out.select(
        F.col("_id").alias(id_col),
        "shard",
        F.col("seq_id").cast("long").alias("seq_id"),
        F.greatest(F.col("_start") - seq_start, F.lit(0)).cast("long").alias("tok_start"),
        (
            F.least(F.col("_start") + F.col("_n"), seq_start + seq_len)
            - F.greatest(F.col("_start"), seq_start)
        ).cast("long").alias("n_tokens_in_seq"),
        (F.col("_hi") > F.col("_lo")).cast("int").alias("is_split"),
    )


def chunk_overlap(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 50,
    overlap: int = 10,
) -> DataFrame:
    """Retrieval-style document chunking: whitespace-token windows of
    ``chunk_tokens`` with ``overlap`` tokens shared between consecutive
    chunks (stride = chunk - overlap). One row per chunk with its token
    span and an md5 digest of the re-joined chunk text (scalar output;
    the chunk text itself stays derivable).

    Rowwise only — tokenize once, explode the chunk-start sequence to
    rows, slice per row. No shuffle anywhere: chunking is a projection.
    The explode-to-rows-then-slice order sidesteps the CollapseProject
    re-inlining trap (a transform() lambda over starts would re-tokenize
    per chunk).

    Chunk count for n tokens: 1 + ceil(max(0, n - chunk) / stride) —
    every token is covered, the last chunk may be short, and an
    empty/whitespace doc yields zero chunks.
    """
    from etl_aws_spark.text import _dialect as D

    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.expr(D.tokens(text_col, D.SPARK)).alias("_toks"),
    ).select(
        "_id",
        "_toks",
        F.expr("size(filter(_toks, t -> t <> ''))").alias("_n"),
    ).filter(F.col("_n") > 0).select(
        "_id",
        F.expr("filter(_toks, t -> t <> '')").alias("_toks"),
        "_n",
    )
    rows = toks.select(
        "_id", "_toks", "_n",
        F.explode(F.expr(
            f"sequence(0, cast(ceil(greatest(_n - {chunk_tokens}, 0) / {stride}) as int))"
        )).alias("chunk_idx"),
    )
    start = (F.col("chunk_idx") * stride).cast("int")
    ln = F.least(F.lit(chunk_tokens), F.col("_n") - start).cast("int")
    chunk_text = F.expr(
        f"array_join(slice(_toks, chunk_idx * {stride} + 1, "
        f"least({chunk_tokens}, _n - chunk_idx * {stride})), ' ')"
    )
    return rows.select(
        F.col("_id").alias(id_col),
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        start.cast("long").alias("tok_start"),
        ln.cast("long").alias("n_chunk_tokens"),
        F.md5(chunk_text).alias("chunk_digest"),
    )


def remove_duplicate_spans(
    df: DataFrame, id_col: str, text_col: str, span_words: int = 20
) -> DataFrame:
    """Exact sub-document DEDUP ACTION (Lee et al. ACL 2022, the removal
    step whose measurement twin is :func:`duplicate_span_ratio`): split
    each document into non-overlapping ``span_words``-word blocks, find
    blocks whose text occurs more than once in the corpus, and KEEP ONLY
    THE FIRST occurrence (min (doc, idx)) — every later copy is cut from
    its document. The cleaned text is reassembled from surviving blocks
    plus the sub-block tail (always kept).

    Scale shape: span hashes explode to (doc, idx, h) 60-bit rows — text
    never enters a shuffle; first-occurrence selection is one h-keyed
    min-struct aggregate joined back on h; reassembly happens doc-locally
    from the kept-index list (one (doc) aggregate + one id-keyed join to
    the original scan), so the expensive strings are only ever touched in
    their own scan/projection tasks.

    Output: (doc_id, n_tokens, n_spans, n_spans_removed, n_tokens_clean,
    clean_digest) — clean_digest = md5 of the space-rejoined cleaned
    text.
    """
    from etl_aws_spark.text import _dialect as D

    L = span_words
    toks_e = f"filter({D.tokens(text_col, D.SPARK)}, t -> t <> '')"
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.expr(toks_e).alias("_toks"),
    ).select(
        "doc_id", "_toks", F.expr("size(_toks)").alias("_n"),
        F.expr(f"floor(size(_toks) / {L})").cast("int").alias("_nf"),
    )
    spans = base.filter(F.col("_nf") > 0).select(
        "doc_id", "_toks",
        F.explode(F.expr("sequence(0, _nf - 1)")).alias("idx"),
    ).select(
        "doc_id", "idx",
        F.expr(
            f"{D.hash60(f'array_join(slice(_toks, idx * {L} + 1, {L}), chr(32))', D.SPARK)}"
        ).alias("h"),
    )
    first = spans.groupBy("h").agg(
        F.min(F.struct("doc_id", "idx")).alias("_first"),
        F.count(F.lit(1)).alias("_cnt"),
    )
    kept = (
        spans.join(first, "h")
        .filter(
            (F.col("doc_id") == F.col("_first.doc_id"))
            & (F.col("idx") == F.col("_first.idx"))
        )
        .groupBy("doc_id")
        .agg(F.expr("array_sort(collect_list(idx))").alias("_kept"))
    )
    out = base.join(kept, "doc_id", "left").select(
        "doc_id", "_toks", "_n", "_nf",
        F.coalesce(F.col("_kept"), F.expr("array()")).alias("_kept"),
    )
    pieces = (
        f"concat(transform(_kept, i -> array_join(slice(_toks, i * {L} + 1, {L}), ' ')), "
        f"CASE WHEN _n > _nf * {L} "
        f"THEN array(array_join(slice(_toks, _nf * {L} + 1, _n - _nf * {L}), ' ')) "
        f"ELSE array() END)"
    )
    return out.select(
        "doc_id",
        F.col("_n").cast("long").alias("n_tokens"),
        F.col("_nf").cast("long").alias("n_spans"),
        (F.col("_nf") - F.expr("size(_kept)")).cast("long").alias("n_spans_removed"),
        (
            F.expr("aggregate(_kept, cast(0 as bigint), (acc, i) -> acc + cast(%d as bigint))" % L)
            + F.col("_n") - F.col("_nf") * L
        ).cast("long").alias("n_tokens_clean"),
        F.md5(F.expr(f"array_join({pieces}, ' ')")).alias("clean_digest"),
    )
