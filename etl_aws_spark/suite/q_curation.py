"""Training-data curation queries: rule filters, stratified sampling,
contamination, repetition, token-budget selection (text/curation.py).

The curation layer of a pretraining pipeline, downstream of dedup and
quality profiling. Every query has an exact DuckDB oracle built from the
same `_dialect` expressions, including the deterministic hash sampling —
sampling here is replayable by ANY engine, not a seeded RNG artifact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_aws_spark.registry import load, query
from etl_aws_spark.suite._util import rnd
from etl_aws_spark.text import _dialect as D
from etl_aws_spark.text import analysis, curation

_STOP_IN = ", ".join(f"'{s}'" for s in analysis.STOPWORDS)

_RULES_SQL = f"""
    WITH t AS (
      SELECT doc_id, {D.tokens('text', D.DUCK)} AS toks FROM documents
    ), m AS (
      SELECT doc_id,
             len(toks) AS n_tok,
             list_sum(list_transform(toks, t -> length(t))) / CAST(len(toks) AS DOUBLE) AS mean_len,
             len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE) AS uniq_ratio,
             list_sum(list_transform(toks, t -> CASE WHEN t IN ({_STOP_IN}) THEN 1 ELSE 0 END))
               / CAST(len(toks) AS DOUBLE) AS stop_ratio
      FROM t
    )
    SELECT doc_id,
           n_tok >= 10 AND n_tok <= 100000 AS r_len,
           mean_len >= 2.0 AND mean_len <= 12.0 AS r_tok_len,
           uniq_ratio > 0.3 AS r_uniq,
           stop_ratio >= 0.02 AS r_stop,
           (n_tok >= 10 AND n_tok <= 100000) AND (mean_len >= 2.0 AND mean_len <= 12.0)
             AND uniq_ratio > 0.3 AND stop_ratio >= 0.02 AS keep
    FROM m
"""


@query("text_filter_gopher_rules", oracle=_RULES_SQL, category="curation")
def text_filter_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style rule filter as boolean columns + conjunction, so one
    pass yields both the filtered corpus and per-rule rejection counts."""
    out = curation.gopher_rules(load(spark, sf_dir, "documents"), "text")
    return out.select("doc_id", "r_len", "r_tok_len", "r_uniq", "r_stop", "keep")


# Keys MUST be the fixture's real `source` values (src0..src19,
# TESTDATA.md) — the r11 audit found the old domain-style keys
# {web,news,wiki,books} matched nothing, so the sample was empty at
# every SF and the oracle only ever verified empty-vs-empty. Unlisted
# sources keep rate 0.0 (the drop-this-domain case), which is now a
# TESTED branch rather than the only branch.
_RATES = {"src0": 1.0, "src1": 0.8, "src2": 0.5, "src3": 0.25, "src7": 0.1}
_RATE_CASE = " ".join(
    f"WHEN source = '{s}' THEN {r}" for s, r in sorted(_RATES.items())
)


@query(
    "sample_stratified_by_source",
    oracle=f"""
    SELECT doc_id, source
    FROM documents
    WHERE ({D.hash60("concat('sample:', CAST(doc_id AS VARCHAR))", D.DUCK)}) % 10000
          < (CASE {_RATE_CASE} ELSE 0.0 END) * 10000
    """,
    category="curation",
)
def sample_stratified_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source sampling rates (the domain-mixing step) via
    a content hash of the id — reproducible across engines/runs, no RNG
    state; the oracle replays the identical hash and selects the identical
    rows, which no seeded ``sample()`` can offer."""
    docs = load(spark, sf_dir, "documents")
    return curation.stratified_sample_hash(docs, "doc_id", "source", _RATES).select(
        "doc_id", "source"
    )


@query(
    "text_contamination_ngram",
    oracle=f"""
    WITH tr AS (
      SELECT doc_id, unnest({D.shingle_hashes('text', 3, D.DUCK)}) AS h
      FROM documents WHERE doc_id % 97 <> 0
    ), ev AS (
      SELECT DISTINCT unnest({D.shingle_hashes('text', 3, D.DUCK)}) AS h
      FROM documents WHERE doc_id % 97 = 0
    )
    SELECT tr.doc_id, CAST(count(DISTINCT tr.h) AS BIGINT) AS n_shared,
           count(DISTINCT tr.h) >= 2 AS contaminated
    FROM tr JOIN ev USING (h)
    GROUP BY tr.doc_id
    """,
    category="curation",
)
def text_contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination sweep: 3-gram shingle overlap between the
    training corpus and a (tiny, broadcast) eval set — shuffles carry
    (hash, id) only, never text. Eval set = every 97th doc, standing in
    for a held-out benchmark."""
    docs = load(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 97 != 0)
    eval_df = docs.filter(F.col("doc_id") % 97 == 0)
    return curation.contamination_overlap(
        train, eval_df, "doc_id", "text", n=3, min_shared=2
    )


@query(
    "text_repetition_ratio",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, {D._shingle_array('text', 2, D.DUCK)} AS sh FROM documents
    )
    SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_shingles,
           round(CASE WHEN len(sh) > 0
                 THEN 1.0 - len(list_distinct(sh)) / CAST(len(sh) AS DOUBLE)
                 ELSE 0.0 END, 6) + 0.0 AS dup_ratio
    FROM s
    """,
    category="curation",
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-doc duplicate-bigram fraction (the Gopher repetition filter)
    — HOF expressions only, the shingle array never leaves the row."""
    out = curation.repetition_ratio(load(spark, sf_dir, "documents"), "doc_id", "text", n=2)
    return out.select("doc_id", "n_shingles", rnd(F.col("dup_ratio"), 6).alias("dup_ratio"))


@query(
    "curation_token_budget",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, {D.tokens('text', D.DUCK)} AS toks,
             len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct
      FROM documents
    ), m AS (
      SELECT doc_id,
             len(toks) AS n_tokens,
             list_sum(list_transform(toks, t -> CASE WHEN t IN ({_STOP_IN}) THEN 1 ELSE 0 END))
               / CAST(len(toks) AS DOUBLE) AS stopword_ratio,
             len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE) AS uniq_token_ratio,
             n_punct / CAST(greatest(length(text), 1) AS DOUBLE) AS punct_ratio
      FROM t
    ), q AS (
      SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
             0.25 * least(n_tokens / 100.0, 1.0)
             + 0.25 * least(stopword_ratio * 5.0, 1.0)
             + 0.25 * uniq_token_ratio
             + 0.25 * (1.0 - least(punct_ratio * 10.0, 1.0)) AS quality
      FROM m
    ), c AS (
      SELECT doc_id, quality, n_tokens,
             sum(n_tokens) OVER (ORDER BY quality DESC, doc_id ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM q
    )
    SELECT doc_id, round(quality, 6) + 0.0 AS quality, n_tokens
    FROM c WHERE cum <= 20000
    """,
    category="curation",
)
def curation_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Select the best docs under a 20k-token budget. The oracle is the
    naive GLOBAL ordered cumsum; the engine runs the scalable two-phase
    form (bucket totals -> driver cutoff over <=1001 rows -> ordered cumsum
    inside the single cutoff bucket) — row-identical by monotone-bucketing
    (text/curation.py token_budget_select)."""
    docs = load(spark, sf_dir, "documents")
    scored = analysis.quality_score(docs, "text").select(
        "doc_id",
        F.col("quality_score").alias("quality"),
        F.col("n_tokens"),
    )
    out = curation.token_budget_select(
        scored, "doc_id", "quality", "n_tokens", budget=20_000
    )
    return out.select("doc_id", rnd(F.col("quality"), 6).alias("quality"), "n_tokens")


def _budget_bpe_oracle() -> str:
    from etl_aws_spark.text import bpe

    return f"""
    WITH t AS (
      SELECT doc_id, text, {D.tokens('text', D.DUCK)} AS toks,
             len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct,
             {bpe.doc_token_count_sql('text', bpe.DUCK)} AS n_tokens_bpe
      FROM documents
    ), m AS (
      SELECT doc_id, n_tokens_bpe,
             len(toks) AS n_tokens,
             list_sum(list_transform(toks, t -> CASE WHEN t IN ({_STOP_IN}) THEN 1 ELSE 0 END))
               / CAST(len(toks) AS DOUBLE) AS stopword_ratio,
             len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE) AS uniq_token_ratio,
             n_punct / CAST(greatest(length(text), 1) AS DOUBLE) AS punct_ratio
      FROM t
    ), q AS (
      SELECT doc_id, n_tokens_bpe,
             0.25 * least(n_tokens / 100.0, 1.0)
             + 0.25 * least(stopword_ratio * 5.0, 1.0)
             + 0.25 * uniq_token_ratio
             + 0.25 * (1.0 - least(punct_ratio * 10.0, 1.0)) AS quality
      FROM m
    ), c AS (
      SELECT doc_id, quality, n_tokens_bpe,
             sum(n_tokens_bpe) OVER (ORDER BY quality DESC, doc_id ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM q
    )
    SELECT doc_id, round(quality, 6) + 0.0 AS quality, n_tokens_bpe
    FROM c WHERE cum <= 30000
    """


@query("curation_token_budget_bpe", oracle=_budget_bpe_oracle(), category="curation")
def curation_token_budget_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget selection counted in TOKENIZER tokens (text/bpe.py)
    instead of whitespace tokens — what a real pretraining mix actually
    budgets. Quality score and BPE count are both pure expressions over
    ONE documents scan (no join between the scorer and the tokenizer);
    the cut runs the same scalable two-phase bucket form as
    `curation_token_budget`, row-identical to the oracle's global
    cumsum by monotone bucketing."""
    from etl_aws_spark.operators.scale import (
        HEAVY_BYTES_PER_PART,
        fan_out_small_scan,
    )

    # the BPE token-count expression is evaluated in THIS projection,
    # map-side of everything downstream — widen the single-split gate-SF
    # scan before it (no-op at scale; fanning out inside
    # token_budget_select is too late, the expr runs pre-exchange; BPE
    # counting is ~6 ms/KB — the heavy floor)
    docs = fan_out_small_scan(load(spark, sf_dir, "documents"), HEAVY_BYTES_PER_PART)
    from etl_aws_spark.text import bpe

    scored = analysis.quality_score(docs, "text").select(
        "doc_id",
        F.col("quality_score").alias("quality"),
        F.expr(bpe.doc_token_count_sql("text", bpe.SPARK)).alias("n_tokens_bpe"),
    )
    out = curation.token_budget_select(
        scored, "doc_id", "quality", "n_tokens_bpe", budget=30_000
    )
    return out.select(
        "doc_id", rnd(F.col("quality"), 6).alias("quality"), "n_tokens_bpe"
    )


def _pipeline_oracle() -> str:
    from etl_aws_spark.suite.q_text import _minhash_bands_sql

    rules = """
      len(toks) >= 10 AND len(toks) <= 100000
      AND list_sum(list_transform(toks, t -> length(t))) / CAST(len(toks) AS DOUBLE) BETWEEN 2.0 AND 12.0
      AND len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE) > 0.3
      AND list_sum(list_transform(toks, t -> CASE WHEN t IN ({stop}) THEN 1 ELSE 0 END))
          / CAST(len(toks) AS DOUBLE) >= 0.02
    """.format(stop=_STOP_IN)
    return f"""
    WITH raw AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
    ), ex AS (
      SELECT doc_id, text,
             min(doc_id) OVER (
               PARTITION BY md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
             ) AS canon
      FROM raw
    ), e_kept AS (
      SELECT doc_id, text FROM ex WHERE doc_id = canon
    ), g AS (
      SELECT doc_id, text, {D.tokens('text', D.DUCK)} AS toks FROM e_kept
    ), corpus AS (
      SELECT doc_id, text FROM g WHERE {rules}
    ), {_minhash_bands_sql()},
    bmin AS (SELECT bk, min(doc_id) AS bm FROM bands GROUP BY bk),
    mcanon AS (
      SELECT b.doc_id, min(bm) AS canonical_id FROM bands b JOIN bmin USING (bk)
      GROUP BY b.doc_id
    ), m_kept AS (
      SELECT c.doc_id, c.text FROM corpus c JOIN mcanon USING (doc_id)
      WHERE doc_id = canonical_id
    ), t2 AS (
      SELECT doc_id, text, {D.tokens('text', D.DUCK)} AS toks,
             len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct
      FROM m_kept
    ), m2 AS (
      SELECT doc_id,
             len(toks) AS n_tokens,
             list_sum(list_transform(toks, t -> CASE WHEN t IN ({_STOP_IN}) THEN 1 ELSE 0 END))
               / CAST(len(toks) AS DOUBLE) AS stopword_ratio,
             len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE) AS uniq_token_ratio,
             n_punct / CAST(greatest(length(text), 1) AS DOUBLE) AS punct_ratio
      FROM t2
    ), q2 AS (
      SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
             0.25 * least(n_tokens / 100.0, 1.0)
             + 0.25 * least(stopword_ratio * 5.0, 1.0)
             + 0.25 * uniq_token_ratio
             + 0.25 * (1.0 - least(punct_ratio * 10.0, 1.0)) AS quality
      FROM m2
    ), c2 AS (
      SELECT doc_id, quality, n_tokens,
             sum(n_tokens) OVER (ORDER BY quality DESC, doc_id ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM q2
    )
    SELECT doc_id, round(quality, 6) + 0.0 AS quality, n_tokens
    FROM c2 WHERE cum <= 15000
    """


@query("pipeline_corpus_refined", oracle=_pipeline_oracle(), category="curation")
def pipeline_corpus_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END corpus refinement — the text-side twin of
    `pipeline_refined`: re-delivered raw corpus → exact dedup (digest
    groups) → Gopher rule filter → MinHash/LSH near-dup canonicalization →
    quality-ordered 15k-token budget selection. Four operators from four
    modules composed in one lazy plan (Catalyst sees the whole pipeline:
    the text column is pruned where unused, filters collapse before the
    LSH explode). The oracle recomputes every stage in one SQL — the
    strongest composition check the gate offers."""
    from etl_aws_spark.text import dedup as ddp

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    redelivered = docs.filter(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    raw = docs.unionByName(redelivered)
    e = ddp.exact_dedup(raw, "doc_id", "text").filter(F.col("is_dup") == 0)
    g = curation.gopher_rules(e.select("doc_id", "text"), "text").filter("keep")
    m = ddp.minhash_lsh_dedup(g.select("doc_id", "text"), "doc_id", "text").filter(
        F.col("is_dup") == 0
    )
    scored = analysis.quality_score(m.select("doc_id", "text"), "text").select(
        "doc_id", F.col("quality_score").alias("quality"), "n_tokens"
    )
    out = curation.token_budget_select(scored, "doc_id", "quality", "n_tokens", 15_000)
    return out.select("doc_id", rnd(F.col("quality"), 6).alias("quality"), "n_tokens")


# PII patterns: conservative constructs with identical semantics in Java
# regex (Spark) and RE2 (DuckDB) — character classes, bounded repetition,
# no lookaround/backrefs.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\d{3}-\d{4}"

# deterministic contact strings synthesized from the customer fixture so
# the redactor has real matches (the synthetic documents text is word-salad)
_CONTACT_SQL = (
    "c_name || ' <user' || CAST(c_custkey AS VARCHAR) || '@mail'"
    " || CAST(c_custkey % 7 AS VARCHAR) || '.com> call 555-'"
    " || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') || ' now'"
)


@query(
    "text_pii_redact",
    oracle=f"""
    WITH c AS (SELECT c_custkey, {_CONTACT_SQL} AS contact FROM customer)
    SELECT c_custkey,
           regexp_replace(regexp_replace(contact, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                          '{_PHONE_RE}', '[PHONE]', 'g') AS redacted,
           CAST(len(regexp_extract_all(contact, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(contact, '{_PHONE_RE}')) AS BIGINT) AS n_phones
    FROM c
    """,
    category="curation",
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the redaction pass every pretraining corpus runs
    before tokenization: replace email addresses and phone-shaped numbers,
    and count what was removed (the audit metric). Pure JVM regexp
    expressions (codegen'd, no UDF); patterns restricted to the
    Java-regex ∩ RE2 common subset so the DuckDB oracle replays them
    byte-identically. Input is a deterministic contact string built from
    the customer fixture (the synthetic documents contain no PII-shaped
    spans to exercise the redactor)."""
    c = load(spark, sf_dir, "customer")
    contact = F.concat(
        F.col("c_name"),
        F.lit(" <user"),
        F.col("c_custkey").cast("string"),
        F.lit("@mail"),
        (F.col("c_custkey") % 7).cast("string"),
        F.lit(".com> call 555-"),
        F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
        F.lit(" now"),
    )
    out = c.select(F.col("c_custkey"), contact.alias("contact")).select(
        "c_custkey",
        F.regexp_replace(
            F.regexp_replace(F.col("contact"), _EMAIL_RE, "[EMAIL]"),
            _PHONE_RE,
            "[PHONE]",
        ).alias("redacted"),
        F.regexp_count(F.col("contact"), F.lit(_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(F.col("contact"), F.lit(_PHONE_RE)).cast("long").alias("n_phones"),
    )
    return out


# character-bigram staging: split once, bigrams via zip_with over shifted
# slices (the CollapseProject-safe shingle formulation from text/_dialect)
_CS = "split(lower(text), '')"
_BG_ARR = (
    f"zip_with(slice({_CS}, 1, size({_CS}) - 1), "
    f"slice({_CS}, 2, size({_CS}) - 1), (x, y) -> concat(x, y))"
)


@query(
    "text_char_bigram_bits",
    oracle="""
    WITH d AS (SELECT doc_id, lower(text) AS t FROM documents),
    c AS (SELECT doc_id, string_split(t, '') AS cs, length(t) AS n FROM d),
    ex AS (
      SELECT doc_id, unnest(list_transform(range(1, n), i -> cs[i] || cs[i+1])) AS bg
      FROM c
    ),
    model AS (SELECT bg, count(*) AS n_bg FROM ex GROUP BY bg),
    pref AS (SELECT substr(bg, 1, 1) AS c1, sum(n_bg) AS n_c1 FROM model GROUP BY 1),
    sc AS (
      SELECT e.doc_id,
             ln(CAST(m.n_bg AS DOUBLE)) - ln(CAST(p.n_c1 AS DOUBLE)) AS lp
      FROM ex e JOIN model m USING (bg)
      JOIN pref p ON substr(e.bg, 1, 1) = p.c1
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(-avg(lp) / ln(2.0), 4) + 0.0 AS bits_per_bigram
    FROM sc GROUP BY doc_id
    """,
    category="curation",
)
def text_char_bigram_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-bigram language-model scoring — the perplexity-proxy
    quality signal (CCNet-style LM filtering, reduced to an n-gram model
    the engine can train in one aggregate): fit P(c2|c1) on the corpus
    itself, then score every doc's mean negative log2 conditional
    probability (bits per bigram; high = unusual character statistics).
    Scale shape: the exploded bigram stream aggregates to an
    alphabet²-bounded model table that broadcasts back onto the same
    stream — one explode feeds both passes, the corpus text never
    shuffles. Bigrams via zip_with over shifted slices (CollapseProject-
    safe — an element_at formulation re-splits the doc per element)."""
    docs = load(spark, sf_dir, "documents")
    ex = docs.select("doc_id", F.explode(F.expr(_BG_ARR)).alias("bg"))
    model = ex.groupBy("bg").agg(F.count(F.lit(1)).alias("n_bg"))
    pref = (
        model.groupBy(F.substring("bg", 1, 1).alias("c1"))
        .agg(F.sum("n_bg").alias("n_c1"))
    )
    scored = (
        ex.join(F.broadcast(model), "bg")
        .withColumn("c1", F.substring("bg", 1, 1))
        .join(F.broadcast(pref), "c1")
        .select(
            "doc_id",
            (F.log(F.col("n_bg").cast("double")) - F.log(F.col("n_c1").cast("double"))).alias("lp"),
        )
    )
    out = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        rnd(-F.avg("lp") / F.log(F.lit(2.0)), 4).alias("bits_per_bigram"),
    )
    return out.select("doc_id", "n_bigrams", "bits_per_bigram")


@query(
    "curation_domain_mix_report",
    oracle=f"""
    WITH per_doc AS (
      SELECT source, CAST(len({D.tokens('text', D.DUCK)}) AS BIGINT) AS tk
      FROM documents
    ), per_src AS (
      SELECT source, count(*) AS n_docs, CAST(sum(tk) AS BIGINT) AS tokens
      FROM per_doc GROUP BY source
    ), tot AS (
      SELECT CAST(sum(tokens) AS DOUBLE) AS total FROM per_src
    )
    SELECT source, n_docs, tokens,
           round(tokens / total, 6) + 0.0 AS token_share,
           round(sum(tokens) OVER (ORDER BY tokens DESC, source ASC) / total, 6)
             + 0.0 AS cum_share
    FROM per_src CROSS JOIN tot
    """,
    category="curation",
)
def curation_domain_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix report: per-source document/token counts, corpus token
    share, and head-to-tail cumulative share (the number you read before
    setting sampling weights — 'the top 3 sources are 80% of tokens'). One
    narrow (source, tk) aggregate over the corpus, a 1-row total broadcast,
    and a window over the handful of source rows: the text itself is
    touched exactly once and never shuffled."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    tk = F.expr(f"size({D.tokens('text', D.SPARK)})").cast("bigint")
    per_src = (
        docs.select("source", tk.alias("tk"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("tk").alias("tokens"))
    )
    tot = per_src.agg(F.sum("tokens").cast("double").alias("total"))
    w = Window.orderBy(F.desc("tokens"), F.asc("source")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return per_src.crossJoin(F.broadcast(tot)).select(
        "source", "n_docs", "tokens",
        rnd(F.col("tokens") / F.col("total"), 6).alias("token_share"),
        rnd(F.sum("tokens").over(w) / F.col("total"), 6).alias("cum_share"),
    )


@query(
    "curation_rebalance_to_uniform_mix",
    oracle=f"""
    WITH per_doc AS (
      SELECT doc_id, source,
             CAST(len({D.tokens('text', D.DUCK)}) AS BIGINT) AS tk,
             ({D.hash60("concat('mix:', CAST(doc_id AS VARCHAR))", D.DUCK)}) % 1000000
               AS h
      FROM documents
    ), per_src AS (
      SELECT source, CAST(sum(tk) AS DOUBLE) AS src_tokens FROM per_doc GROUP BY source
    ), tot AS (
      SELECT sum(src_tokens) / count(*) AS target FROM per_src
    ), keep AS (
      SELECT d.doc_id, d.source, d.tk
      FROM per_doc d JOIN per_src s USING (source) CROSS JOIN tot
      WHERE d.h < least(1.0, tot.target / s.src_tokens) * 1000000
    )
    SELECT source, count(*) AS n_docs_kept,
           CAST(sum(tk) AS BIGINT) AS tokens_kept
    FROM keep GROUP BY source
    """,
    category="curation",
)
def curation_rebalance_to_uniform_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mix rebalancing: downsample over-represented sources toward a
    UNIFORM token budget per source (target = total/n_sources; sources
    already under target keep everything). The keep rule is a pure
    content-hash threshold — `h(doc_id) < keep_rate` — so the sample is
    deterministic, reproducible, and needs NO shuffle of the documents
    themselves: per-source token totals are a broadcast-sized aggregate
    joined back, and each doc decides locally. This is the action that
    follows `curation_domain_mix_report`'s diagnosis; expectation-level
    rebalancing (keeps token share ≈ target in expectation, not exactly)
    is the standard production trade."""
    docs = load(spark, sf_dir, "documents")
    tk = F.expr(f"size({D.tokens('text', D.SPARK)})").cast("bigint")
    h = F.expr(
        D.hash60("concat('mix:', cast(doc_id as string))", D.SPARK)
    ) % 1000000
    per_doc = docs.select("doc_id", "source", tk.alias("tk"), h.alias("h"))
    per_src = per_doc.groupBy("source").agg(
        F.sum("tk").cast("double").alias("src_tokens")
    )
    tot = per_src.agg(
        (F.sum("src_tokens") / F.count(F.lit(1))).alias("target")
    )
    keep = (
        per_doc.join(F.broadcast(per_src), "source")
        .crossJoin(F.broadcast(tot))
        .filter(
            F.col("h")
            < F.least(F.lit(1.0), F.col("target") / F.col("src_tokens")) * 1000000
        )
    )
    return keep.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("tk").cast("long").alias("tokens_kept"),
    )


_SPAN_N = 8

_SPAN_PARTS = " || ' ' || ".join(f"t[i + {j + 1}]" for j in range(_SPAN_N))

# token array staged through a MATERIALIZED CTE column: inlining
# D._shingle_array would re-split the document once per concatenation
# term per span (the documented DuckDB list-lambda re-evaluation pitfall
# — measured ~70 s at sf0.1 inlined vs seconds staged); hashes identical.
_DUP_SPAN_SQL = f"""
    WITH tk AS MATERIALIZED (
      SELECT doc_id, {D.tokens('text', D.DUCK)} AS t FROM documents
    ), spans AS (
      SELECT doc_id,
             unnest(list_transform(range(0, len(t) - {_SPAN_N} + 1),
                                   i -> {D.hash60(_SPAN_PARTS, D.DUCK)})) AS h
      FROM tk
    ), freq AS (
      SELECT h, count(*) AS cnt FROM spans GROUP BY h
    ), per_doc AS (
      SELECT s.doc_id, count(*) AS n_spans,
             sum(CASE WHEN f.cnt > 1 THEN 1 ELSE 0 END) AS n_dup
      FROM spans s JOIN freq f USING (h)
      GROUP BY s.doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
           CAST(coalesce(p.n_dup, 0) AS BIGINT) AS n_dup_spans,
           round(CAST(p.n_dup AS DOUBLE) / nullif(CAST(p.n_spans AS DOUBLE), 0.0), 6)
             + 0.0 AS dup_ratio
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


@query("text_duplicate_span_ratio", oracle=_DUP_SPAN_SQL, category="curation")
def text_duplicate_span_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus duplicate-SPAN coverage (Lee et al., ACL 2022): per
    document, the fraction of word 8-gram starts whose 8-gram occurs more
    than once anywhere in the corpus — the sub-document boilerplate signal
    that whole-doc exact/near dedup misses and `text_repetition_ratio`
    (within-doc only) can't see. Identical 60-bit shingle hashes on both
    engines make every count exact. Fixture docs are >= 10 words, so the
    8-gram slice is always non-degenerate."""
    docs = load(spark, sf_dir, "documents")
    return curation.duplicate_span_ratio(docs, "doc_id", "text", n=_SPAN_N)


@query(
    "curation_source_entropy",
    oracle="""
    WITH cnt AS (
      SELECT source, lang, count(*) AS n FROM documents GROUP BY source, lang
    ), tot AS (
      SELECT source, sum(n) AS t, count(*) AS n_langs FROM cnt GROUP BY source
    ), h AS (
      SELECT c.source, t.n_langs, t.t,
             -sum((c.n / CAST(t.t AS DOUBLE))
                  * ln(c.n / CAST(t.t AS DOUBLE)) / ln(2.0)) AS ent
      FROM cnt c JOIN tot t USING (source)
      GROUP BY c.source, t.n_langs, t.t
    )
    SELECT source,
           CAST(n_langs AS BIGINT) AS n_langs,
           CAST(t AS BIGINT) AS n_docs,
           round(ent + sign(ent) * 1e-9, 6) + 0.0 AS entropy_bits,
           round((CASE WHEN n_langs > 1 THEN ent / (ln(n_langs) / ln(2.0)) ELSE 0.0 END)
                 + sign(CASE WHEN n_langs > 1 THEN ent ELSE 0.0 END) * 1e-9, 6)
             + 0.0 AS normalized
    FROM h
    """,
    category="curation",
)
def curation_source_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mix Shannon entropy per source — the diversity gauge a
    curation dashboard puts beside the domain-mix report: H = −Σ p·log₂p
    over the per-source language distribution, plus the [0,1]-normalized
    form H/log₂(k). Computed on the |sources|×|langs| contingency frame
    (one narrow aggregate touches the corpus). Cross-engine ln() can
    differ in the last ulp, so both entropies ride the nudged bridge."""
    docs = load(spark, sf_dir, "documents")
    cnt = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window

    w = Window.partitionBy("source")
    p = cnt.select(
        "source", "n",
        F.sum("n").over(w).alias("t"),
        F.count(F.lit(1)).over(w).alias("n_langs"),
    ).withColumn("p", F.col("n") / F.col("t").cast("double"))
    from etl_aws_spark.suite._util import rnd_nudged

    h = p.groupBy("source", "n_langs", "t").agg(
        (-F.sum(F.col("p") * F.log(F.col("p")) / F.log(F.lit(2.0)))).alias("ent")
    )
    norm = F.when(
        F.col("n_langs") > 1, F.col("ent") / (F.log(F.col("n_langs").cast("double")) / F.log(F.lit(2.0)))
    ).otherwise(F.lit(0.0))
    return h.select(
        "source",
        F.col("n_langs").cast("long").alias("n_langs"),
        F.col("t").cast("long").alias("n_docs"),
        rnd_nudged(F.col("ent"), 6).alias("entropy_bits"),
        rnd_nudged(norm, 6).alias("normalized"),
    )


def _seq_pack_oracle() -> str:
    from etl_aws_spark.text import bpe

    return f"""
    WITH t AS (
      SELECT doc_id, doc_id % 8 AS shard,
             {bpe.doc_token_count_sql('text', bpe.DUCK)} AS n
      FROM documents
    ), nz AS (SELECT * FROM t WHERE n > 0),
    s AS (
      SELECT doc_id, shard, n,
             sum(n) OVER (PARTITION BY shard ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n AS st
      FROM nz
    ), b AS (
      SELECT doc_id, shard, n, CAST(st AS BIGINT) AS st,
             CAST(st // 512 AS BIGINT) AS lo,
             CAST((st + n - 1) // 512 AS BIGINT) AS hi
      FROM s
    ), e AS (
      SELECT doc_id, shard, n, st, lo, hi,
             unnest(generate_series(lo, hi)) AS seq_id
      FROM b
    )
    SELECT doc_id, CAST(shard AS INT) AS shard,
           CAST(seq_id AS BIGINT) AS seq_id,
           CAST(greatest(st - seq_id * 512, 0) AS BIGINT) AS tok_start,
           CAST(least(st + n, seq_id * 512 + 512)
                - greatest(st, seq_id * 512) AS BIGINT) AS n_tokens_in_seq,
           CAST(hi > lo AS INT) AS is_split
    FROM e
    """


@query("curation_sequence_pack", oracle=_seq_pack_oracle(), category="curation")
def curation_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing of the corpus into 512-token training
    sequences, counted in BPE tokens (text/bpe.py): documents concatenate
    in (shard, doc_id) order and cut at sequence boundaries — documents
    crossing a cut are split, nothing is padded. The running offset is a
    window cumsum PARTITIONED by shard (the per-output-shard pack real
    pipelines run — parallel, one narrow shuffle), and each document
    explodes to the sequences it overlaps with pure rowwise arithmetic
    (text/curation.py sequence_pack). The oracle replays the identical
    shard order, cumsum, and interval intersection."""
    from etl_aws_spark.text import bpe

    return curation.sequence_pack(
        load(spark, sf_dir, "documents"),
        "doc_id",
        bpe.doc_token_count_sql("text", bpe.SPARK),
        seq_len=512,
        n_shards=8,
    )


@query(
    "text_chunk_overlap",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ), n AS (
      SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0
    ), e AS (
      SELECT doc_id, toks, n,
             unnest(generate_series(
               0, CAST(ceil(greatest(n - 50, 0) / 40.0) AS BIGINT))) AS chunk_idx
      FROM n
    )
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(chunk_idx * 40 AS BIGINT) AS tok_start,
           CAST(least(50, n - chunk_idx * 40) AS BIGINT) AS n_chunk_tokens,
           md5(array_to_string(
             list_slice(toks, CAST(chunk_idx * 40 + 1 AS BIGINT),
                        CAST(chunk_idx * 40 + least(50, n - chunk_idx * 40) AS BIGINT)),
             ' ')) AS chunk_digest
    FROM e
    """,
    category="curation",
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-style chunking: 50-token windows with 10-token overlap
    (stride 40), one row per chunk with token span + md5 digest of the
    re-joined chunk text. Pure projection — tokenize once, explode chunk
    starts to rows, slice per row (the explode-then-slice order sidesteps
    the CollapseProject re-tokenize trap); no shuffle anywhere. The ASCII
    corpus makes the Spark byte-level md5 equal DuckDB's char-level md5."""
    return curation.chunk_overlap(
        load(spark, sf_dir, "documents"), "doc_id", "text",
        chunk_tokens=50, overlap=10,
    )


def _remove_spans_oracle() -> str:
    from etl_aws_spark.suite.q_text import _CORPUS_SQL

    span = "array_to_string(list_slice(toks, i * 20 + 1, i * 20 + 20), ' ')"
    return f"""
    WITH {_CORPUS_SQL}, t AS (
      SELECT doc_id,
             list_filter({D.tokens('text', D.DUCK)}, x -> x <> '') AS toks
      FROM corpus
    ), b AS (
      SELECT doc_id, toks, len(toks) AS n,
             CAST(len(toks) // 20 AS INT) AS nf
      FROM t
    ), sp AS (
      SELECT doc_id, i AS idx, {D.hash60(span, D.DUCK)} AS h
      FROM (SELECT doc_id, toks, nf,
                   unnest(generate_series(0, nf - 1)) AS i
            FROM b WHERE nf > 0)
    ), ranked AS (
      SELECT doc_id, idx,
             row_number() OVER (PARTITION BY h ORDER BY doc_id, idx) AS rn
      FROM sp
    ), k AS (
      SELECT doc_id,
             list(idx ORDER BY idx) FILTER (WHERE rn = 1) AS kept
      FROM ranked GROUP BY doc_id
    ), f AS (
      SELECT b.doc_id, b.toks, b.n, b.nf,
             coalesce(k.kept, CAST([] AS BIGINT[])) AS kept
      FROM b LEFT JOIN k USING (doc_id)
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           CAST(nf AS BIGINT) AS n_spans,
           CAST(nf - len(kept) AS BIGINT) AS n_spans_removed,
           CAST(len(kept) * 20 + (n - nf * 20) AS BIGINT) AS n_tokens_clean,
           md5(coalesce(array_to_string(list_concat(
             list_transform(kept, i -> {span}),
             CASE WHEN n > nf * 20
                  THEN [array_to_string(list_slice(toks, nf * 20 + 1, n), ' ')]
                  ELSE CAST([] AS VARCHAR[]) END), ' '), '')) AS clean_digest
    FROM f
    """


@query("text_remove_duplicate_spans", oracle=_remove_spans_oracle(), category="curation")
def text_remove_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sub-document DEDUP ACTION (Lee et al. ACL 2022) on the
    duplicate-injected corpus: every 20-word block occurring more than
    once corpus-wide is cut from all but its first (min doc, idx)
    occurrence, and the cleaned text reassembles from survivors + tail
    (text/curation.py remove_duplicate_spans). Complements the
    `text_duplicate_span_ratio` MEASUREMENT with the removal itself —
    injected full-copy documents lose all their spans to the originals
    and collapse to their tails. Shuffles carry (doc, idx, hash) scalars;
    text is only touched doc-locally. The oracle replays the hash,
    first-occurrence ranking, and reassembly exactly — clean_digest
    value-checks the rebuilt text."""
    from etl_aws_spark.suite.q_text import _corpus

    return curation.remove_duplicate_spans(
        _corpus(spark, sf_dir), "doc_id", "text", span_words=20
    )


@query(
    "curation_importance_weights_dsir",
    # token log-ratios fold per doc in token-sorted order (the BM25 trick)
    # so the float summation order is engine-identical; add-one smoothing
    # over the shared corpus vocabulary keeps every probability a ratio of
    # exact integers.
    oracle=f"""
    WITH occ AS (
      SELECT doc_id, source, t FROM (
        SELECT doc_id, source, unnest({D.tokens('text', D.DUCK)}) AS t
        FROM documents
      ) WHERE t <> ''
    ), vocab AS (
      SELECT count(DISTINCT t) AS v FROM occ
    ), tgt AS (
      SELECT t, count(*) AS c_t FROM occ WHERE source = 'src0' GROUP BY t
    ), tot AS (
      SELECT sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS n_tgt,
             count(*) AS n_raw
      FROM occ
    ), rawc AS (
      SELECT t, count(*) AS c_r FROM occ GROUP BY t
    ), lr AS (
      SELECT r.t,
             ln((CAST(coalesce(g.c_t, 0) + 1 AS DOUBLE) / (tot.n_tgt + vocab.v)))
             - ln((CAST(r.c_r + 1 AS DOUBLE) / (tot.n_raw + vocab.v))) AS lr
      FROM rawc r LEFT JOIN tgt g ON g.t = r.t
      CROSS JOIN tot CROSS JOIN vocab
    ), per_doc AS (
      SELECT o.doc_id, count(*) AS n_tokens,
             round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(l.lr ORDER BY l.t)), (acc, x) -> acc + x), 4) + 0.0
               AS log_importance
      FROM occ o JOIN lr l ON l.t = o.t
      WHERE o.source <> 'src0'
      GROUP BY o.doc_id
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, log_importance,
           CAST(rnk AS INT) AS rank
    FROM (
      SELECT doc_id, n_tokens, log_importance,
             row_number() OVER (ORDER BY log_importance DESC, doc_id ASC) AS rnk
      FROM per_doc
    ) WHERE rnk <= 20
    """,
    category="curation",
)
def curation_importance_weights_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023),
    hashed-unigram form: every out-of-domain document gets an importance
    weight Σ_tok [ln p_target(tok) − ln p_raw(tok)] — the log-likelihood
    ratio between a target-domain unigram LM (docs from source `src0`,
    add-one smoothed over the shared vocabulary) and the raw-corpus LM —
    and the top-20 most target-like documents are selected. This is the
    standard cheap alternative to classifier-based domain selection
    (`model_naive_bayes_lang` is the classifier counterpart here).

    Shape at 100 TB: token occurrences shuffle once to build the two count
    tables (map-side combined); the per-token log-ratio table is vocabulary-
    sized and joins back to occurrences on the token key — the inverted-
    index plan of `text_bm25_search`. The per-doc sum folds in token-sorted
    order so both engines add the same doubles in the same order; in
    production the full weight column feeds `sample_weighted_reservoir`
    for the actual resampling step."""
    docs = load(spark, sf_dir, "documents")
    occ = docs.select(
        "doc_id",
        "source",
        F.explode(F.expr(D.tokens("text", D.SPARK))).alias("t"),
    ).filter(F.col("t") != "")
    vocab = occ.agg(F.countDistinct("t").alias("v"))
    tgt = occ.filter(F.col("source") == "src0").groupBy("t").agg(
        F.count(F.lit(1)).alias("c_t")
    )
    tot = occ.agg(
        F.sum(F.when(F.col("source") == "src0", 1).otherwise(0)).alias("n_tgt"),
        F.count(F.lit(1)).alias("n_raw"),
    )
    rawc = occ.groupBy("t").agg(F.count(F.lit(1)).alias("c_r"))
    lr = (
        rawc.join(tgt, "t", "left")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(vocab))
        .select(
            "t",
            (
                F.log(
                    (F.coalesce("c_t", F.lit(0)) + 1).cast("double")
                    / (F.col("n_tgt") + F.col("v"))
                )
                - F.log(
                    (F.col("c_r") + 1).cast("double")
                    / (F.col("n_raw") + F.col("v"))
                )
            ).alias("lr"),
        )
    )
    per_doc = (
        occ.filter(F.col("source") != "src0")
        .join(lr, "t")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (
                F.round(
                    F.expr(
                        "aggregate(transform(array_sort(collect_list(struct(t, lr))), "
                        "s -> s.lr), cast(0.0 as double), (acc, x) -> acc + x)"
                    ),
                    4,
                )
                + F.lit(0.0)
            ).alias("log_importance"),
        )
    )
    from pyspark.sql import Window

    # top-20 via orderBy().limit() (TakeOrderedAndProject: mergeable
    # per-partition heaps), then rank attached by the same total order on
    # the 20-row frame — never a single-partition row_number over |docs|
    top = per_doc.orderBy(F.desc("log_importance"), F.asc("doc_id")).limit(20)
    w = Window.orderBy(F.desc("log_importance"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "log_importance",
        F.col("rank").cast("int").alias("rank"),
    )


@query(
    "curation_perplexity_buckets",
    # same LM replay as text_bigram_lm_score; tiers come from ntile(3) over
    # the PRE-ROUNDED score (nudged, so the total order is engine-identical)
    # with doc_id as the unconditional tie-break.
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             list_filter({D.tokens('text', D.DUCK)}, x -> x <> '') AS toks
      FROM documents
    ), big AS (
      SELECT doc_id, i AS pos, toks[i] AS w1, toks[i + 1] AS w2
      FROM (SELECT doc_id, toks,
                   unnest(generate_series(1, len(toks) - 1)) AS i
            FROM t)
    ), uni AS (
      SELECT w, count(*) AS c1 FROM (
        SELECT unnest(toks) AS w FROM t
      ) GROUP BY w
    ), voc AS (SELECT count(*) AS v FROM uni),
    bc AS (SELECT w1, w2, count(*) AS c2 FROM big GROUP BY w1, w2),
    lp AS (
      SELECT big.doc_id, big.pos,
             round(ln(CAST(bc.c2 + 1 AS DOUBLE) / CAST(uni.c1 + voc.v AS DOUBLE)), 6)
               + 0.0 AS lpv
      FROM big
      JOIN bc USING (w1, w2)
      JOIN uni ON uni.w = big.w1
      CROSS JOIN voc
    ), per AS (
      SELECT doc_id, count(*) AS n_bigrams,
             round((list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                             list(lpv ORDER BY pos)),
                                (acc, x) -> acc + x) / count(*))
                   + sign(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                                   list(lpv ORDER BY pos)),
                                      (acc, x) -> acc + x) / count(*)) * 1e-9, 6)
               + 0.0 AS avg_logp
      FROM lp GROUP BY doc_id
    ), tiered AS (
      SELECT doc_id, n_bigrams, avg_logp,
             ntile(3) OVER (ORDER BY avg_logp DESC, doc_id ASC) AS tier
      FROM per
    )
    SELECT CAST(tier AS INT) AS tier,
           CASE tier WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
             AS tier_name,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_bigrams) AS BIGINT) AS sum_bigrams,
           round(min(avg_logp), 6) + 0.0 AS min_logp,
           round(max(avg_logp), 6) + 0.0 AS max_logp,
           round(avg(avg_logp) + sign(avg(avg_logp)) * 1e-9, 6) + 0.0
             AS mean_logp
    FROM tiered GROUP BY tier
    """,
    category="curation",
)
def curation_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity tiers (Wenzek et al. 2020): documents scored
    by the corpus-trained bigram LM (`text_bigram_lm_score`), split into
    head/middle/tail thirds by score, one summary row per tier — the table
    a pretraining mix reads to decide how much of each quality band to keep
    (head-only is the classic CCNet cut; mixing ratios come from
    `curation_rebalance_to_uniform_mix`).

    Shape: the LM is two count aggregates joined back on natural keys; the
    tier split is the HISTOGRAM-EXACT ntile (`_util.exact_ntile`, the
    `stat_mann_whitney_u` formulation): per-row ranks come from a window
    PARTITIONED by a coarse score cell (floor(100·score) — bounded by the
    log-prob DOMAIN, not the corpus), the only unpartitioned window runs
    over the |distinct cells| count frame, and the first-N%3-buckets-get-
    one-extra boundary rule is applied per row against broadcast scalars
    — bit-identical to ntile(3) under the same total order, with no
    single-partition pass over |docs|; the report is a 3-row rollup."""
    from etl_aws_spark.suite._util import exact_ntile, rnd_nudged

    score = analysis.bigram_lm_score(
        load(spark, sf_dir, "documents"), "doc_id", "text"
    ).filter(F.col("n_bigrams") > 0)
    scored = score.select(
        "doc_id", "n_bigrams", rnd_nudged(F.col("avg_logp"), 6).alias("avg_logp")
    )
    # coarse cell floor(100·score) descends with the score, so it is a
    # valid monotone bucket for the DESC ordering
    tiered = exact_ntile(
        scored,
        3,
        "avg_logp",
        "doc_id",
        F.floor(F.col("avg_logp") * 100),
        descending=True,
        out_col="tier",
    )
    return (
        tiered.groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bigrams").alias("sum_bigrams"),
            F.min("avg_logp").alias("min_logp"),
            F.max("avg_logp").alias("max_logp"),
            F.avg("avg_logp").alias("mean_logp"),
        )
        .select(
            F.col("tier").cast("int").alias("tier"),
            F.when(F.col("tier") == 1, "head")
            .when(F.col("tier") == 2, "middle")
            .otherwise("tail")
            .alias("tier_name"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("sum_bigrams").cast("long").alias("sum_bigrams"),
            rnd(F.col("min_logp"), 6).alias("min_logp"),
            rnd(F.col("max_logp"), 6).alias("max_logp"),
            rnd_nudged(F.col("mean_logp"), 6).alias("mean_logp"),
        )
    )


@query(
    "curation_mix_temperature_sampling",
    # temperature-scaled sampling weights w_i ∝ n_i^τ (the multilingual /
    # multi-domain mixing law: τ=1 is proportional, τ→0 is uniform). pow()
    # on exact integer counts is engine-identical; shares cross the
    # rounding bridge. Oversample factor = effective epochs of the domain
    # under the mix at the corpus's own total token budget.
    oracle="""
    WITH d AS (
      SELECT source, count(*) AS n_docs, sum(n_chars) AS n_chars
      FROM documents GROUP BY source
    ), tau AS (SELECT unnest([0.3e0, 0.7e0, 1.0e0]) AS tau),
    w AS (
      SELECT tau.tau, d.source, d.n_docs, d.n_chars,
             pow(CAST(d.n_chars AS DOUBLE), tau.tau) AS wraw
      FROM d CROSS JOIN tau
    ), z AS (
      SELECT tau, sum(wraw) AS zsum, sum(n_chars) AS total_chars FROM w GROUP BY tau
    )
    SELECT round(w.tau, 2) + 0.0 AS tau,
           w.source,
           CAST(w.n_docs AS BIGINT) AS n_docs,
           CAST(w.n_chars AS BIGINT) AS n_chars,
           round(w.wraw / z.zsum, 6) + 0.0 AS mix_share,
           round((w.wraw / z.zsum) * z.total_chars / w.n_chars, 4) + 0.0
             AS effective_epochs
    FROM w JOIN z USING (tau)
    """,
    category="curation",
)
def curation_mix_temperature_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixing (the multilingual-sampling law of
    mBERT/XLM-R, w_i ∝ n_i^τ): per-source sampling shares at τ ∈
    {0.3, 0.7, 1.0} plus the effective-epochs each share implies — >1 means
    the mix re-reads that domain (upsampling a small high-value source),
    the number a budgeted pretraining run checks before committing to a
    mix. Generalizes `curation_rebalance_to_uniform_mix` (τ→0) and raw
    proportional sampling (τ=1) into one dial.

    Shape: ONE groupBy to |sources| rows; the τ fan-out and both ratios
    live on that tiny frame. pow() on exact integer counts is the only
    transcendental and is engine-identical for these inputs; shares are
    rounding-bridged."""
    docs = load(spark, sf_dir, "documents")
    d = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("n_chars")
    )
    tau = spark.createDataFrame([(0.3,), (0.7,), (1.0,)], "tau double")
    w = d.crossJoin(F.broadcast(tau)).withColumn(
        "wraw", F.pow(F.col("n_chars").cast("double"), F.col("tau"))
    )
    z = w.groupBy("tau").agg(
        F.sum("wraw").alias("zsum"), F.sum("n_chars").alias("total_chars")
    )
    return w.join(z, "tau").select(
        rnd(F.col("tau"), 2).alias("tau"),
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_chars").cast("long").alias("n_chars"),
        rnd(F.col("wraw") / F.col("zsum"), 6).alias("mix_share"),
        rnd(
            (F.col("wraw") / F.col("zsum")) * F.col("total_chars") / F.col("n_chars"),
            4,
        ).alias("effective_epochs"),
    )


@query(
    "curation_rater_agreement_kappa",
    # 2x2 confusion of two deterministic quality raters -> Cohen's kappa.
    # Pure integer counts until the three final divisions, identical op
    # order on both engines.
    oracle="""
    WITH r AS (
      SELECT CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS a,
             CASE WHEN length(text) - length(replace(text, '.', '')) >= 2
                  THEN 1 ELSE 0 END AS b
      FROM documents
    ), c AS (
      SELECT count(*) AS n,
             sum(a * b) AS n11,
             sum(a * (1 - b)) AS n10,
             sum((1 - a) * b) AS n01,
             sum((1 - a) * (1 - b)) AS n00,
             sum(a) AS na, sum(b) AS nb
      FROM r
    ), p AS (
      SELECT n, n11, n10, n01, n00,
             (n11 + n00) / CAST(n AS DOUBLE) AS po,
             (CAST(na AS DOUBLE) * nb + CAST((n - na) AS DOUBLE) * (n - nb))
               / (CAST(n AS DOUBLE) * n) AS pe
      FROM c
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
           CAST(n11 AS BIGINT) AS both_keep,
           CAST(n10 AS BIGINT) AS only_len,
           CAST(n01 AS BIGINT) AS only_punct,
           CAST(n00 AS BIGINT) AS both_drop,
           round(po, 6) + 0.0 AS p_observed,
           round(pe, 6) + 0.0 AS p_expected,
           round((po - pe) / (1.0 - pe), 6) + 0.0 AS kappa
    FROM p
    """,
    category="curation",
)
def curation_rater_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two independent document-quality raters —
    a length rule (n_chars >= 200) and a structure rule (>= 2 sentence
    terminators). Kappa corrects raw agreement for chance: two filters
    that each keep 90% of a corpus agree 82% by luck alone, so curation
    pipelines report kappa, not overlap, when deciding whether a cheap
    heuristic can replace an expensive classifier. po and pe come from
    ONE map-side-combined aggregate over the 2x2 confusion counts —
    integer-exact until three scalar divisions.

    Scale shape (100 TB): a single full-scan aggregate with no shuffle
    beyond the 1-row combine; both raters are codegen-resident character
    arithmetic. Adding raters = adding columns, not passes."""
    docs = load(spark, sf_dir, "documents")
    r = docs.select(
        F.when(F.col("n_chars") >= 200, 1).otherwise(0).alias("a"),
        F.when(
            F.length("text") - F.length(F.regexp_replace("text", "\\.", ""))
            >= 2,
            1,
        )
        .otherwise(0)
        .alias("b"),
    )
    c = r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("a") * F.col("b")).alias("n11"),
        F.sum(F.col("a") * (1 - F.col("b"))).alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).alias("n01"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).alias("n00"),
        F.sum("a").alias("na"),
        F.sum("b").alias("nb"),
    )
    p = c.select(
        "n", "n11", "n10", "n01", "n00",
        ((F.col("n11") + F.col("n00")) / F.col("n").cast("double")).alias("po"),
        (
            (
                F.col("na").cast("double") * F.col("nb")
                + (F.col("n") - F.col("na")).cast("double")
                * (F.col("n") - F.col("nb"))
            )
            / (F.col("n").cast("double") * F.col("n"))
        ).alias("pe"),
    )
    return p.select(
        F.col("n").cast("long").alias("n_docs"),
        F.col("n11").cast("long").alias("both_keep"),
        F.col("n10").cast("long").alias("only_len"),
        F.col("n01").cast("long").alias("only_punct"),
        F.col("n00").cast("long").alias("both_drop"),
        (F.round(F.col("po"), 6) + F.lit(0.0)).alias("p_observed"),
        (F.round(F.col("pe"), 6) + F.lit(0.0)).alias("p_expected"),
        (
            F.round((F.col("po") - F.col("pe")) / (1.0 - F.col("pe")), 6)
            + F.lit(0.0)
        ).alias("kappa"),
    )
