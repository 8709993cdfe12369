"""North-star text-corpus queries (SURVEY §2.13): dedup family, fingerprint,
language ID, quality, token stats — over the `documents` fixture.

Duplicates are injected deterministically (every 10th doc re-appended with
doc_id+1,000,000) so the dedup operators have real work; the oracle CTE
performs the identical injection. All hash math comes from
`text/_dialect.py`, rendered per engine — the oracles are bit-exact mirrors,
so every dedup query gets a full value-hash check, not rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_aws_spark.registry import load, query
from etl_aws_spark.suite._util import cache_dir as _cache_dir, rnd
from etl_aws_spark.text import _dialect as D
from etl_aws_spark.text import analysis, dedup
from etl_aws_spark.text import bpe as bpe_mod

_CORPUS_SQL = """
    corpus AS (
      SELECT * FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text, lang, source, n_chars
      FROM documents WHERE doc_id % 10 = 0
    )
"""


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT fanned out via operators.scale (r13 opt measured it a wash
    # here, unlike the PQ chains): every consumer shuffles within its
    # first stage or two, so the HOF signature work is already wide and
    # the extra exchange only bought plan noise.
    docs = load(spark, sf_dir, "documents")
    dups = docs.filter(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    return docs.unionByName(dups)


@query(
    "text_dedup_exact",
    oracle=f"""
    WITH {_CORPUS_SQL}, h AS (
      SELECT doc_id,
             md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS hh
      FROM corpus
    )
    SELECT doc_id,
           min(doc_id) OVER (PARTITION BY hh) AS canonical_id,
           CAST(doc_id <> min(doc_id) OVER (PARTITION BY hh) AS INT) AS is_dup
    FROM h
    """,
    category="text",
)
def text_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by normalized-text digest; min-id survivor."""
    out = dedup.exact_dedup(_corpus(spark, sf_dir), "doc_id", "text")
    return out.select("doc_id", "canonical_id", "is_dup")


def _minhash_bands_sql(bands: int = 4, r: int = 4) -> str:
    # mirror of dedup.minhash_signature: explode distinct tokens, one md5
    # base hash per token, n min-aggregated linear permutations mod 2^31-1
    perms = D.perm_constants(bands * r)
    sigs = ",\n".join(
        f"{D.perm_min('h', a, b)} AS mh{i}" for i, (a, b) in enumerate(perms)
    )
    band_selects = "\n      UNION ALL\n".join(
        "SELECT doc_id, md5(concat_ws('_', "
        + ", ".join(f"mh{b * r + j}" for j in range(r))
        + ")) AS bk FROM sig"
        for b in range(bands)
    )
    return (
        f"toks AS (SELECT doc_id, unnest({D.distinct_tokens('text', D.DUCK)}) AS tok FROM corpus), "
        f"base AS (SELECT doc_id, {D.token_base_hash('tok', D.DUCK)} AS h FROM toks), "
        f"sig AS (SELECT doc_id, {sigs} FROM base GROUP BY doc_id), bands AS ({band_selects})"
    )


@query(
    "text_dedup_near_minhash",
    oracle=f"""
    WITH {_CORPUS_SQL}, {_minhash_bands_sql()},
    bmin AS (SELECT bk, min(doc_id) AS bm FROM bands GROUP BY bk),
    canon AS (
      SELECT b.doc_id, min(bm) AS canonical_id
      FROM bands b JOIN bmin USING (bk) GROUP BY b.doc_id
    )
    SELECT doc_id, canonical_id,
           CAST(doc_id <> canonical_id AS INT) AS is_dup
    FROM canon
    """,
    category="text",
)
def text_dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + LSH(4 bands × 4 rows) near-dup canonicalization.
    Signatures fold per-row (no explode); only (band_key, id) shuffles."""
    out = dedup.minhash_lsh_dedup(_corpus(spark, sf_dir), "doc_id", "text")
    return out.select("doc_id", "canonical_id", "is_dup")


_MH_EST = "(" + " + ".join(
    f"CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END" for i in range(16)
) + ") / 16.0"


@query(
    "text_dedup_minhash_quality",
    oracle=f"""
    WITH {_CORPUS_SQL}, {_minhash_bands_sql()},
    bands_c AS (
      SELECT doc_id, bk FROM (
        SELECT doc_id, bk, count(*) OVER (PARTITION BY bk) AS _bn FROM bands
      ) WHERE _bn <= 50
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands_c a JOIN bands_c b USING (bk)
      WHERE a.doc_id < b.doc_id
    ),
    ts AS (SELECT doc_id, {D.distinct_tokens('text', D.DUCK)} AS tok_set FROM corpus),
    scored AS (
      SELECT p.id_a, p.id_b,
             {_MH_EST} AS est,
             CAST(len(list_intersect(ta.tok_set, tb.tok_set)) AS DOUBLE)
               / nullif(len(ta.tok_set) + len(tb.tok_set)
                        - len(list_intersect(ta.tok_set, tb.tok_set)), 0) AS tru
      FROM pairs p
      JOIN sig sa ON sa.doc_id = p.id_a
      JOIN sig sb ON sb.doc_id = p.id_b
      JOIN ts ta ON ta.doc_id = p.id_a
      JOIN ts tb ON tb.doc_id = p.id_b
    )
    SELECT id_a, id_b,
           round(est, 6) + 0.0 AS est_jaccard,
           round(tru, 6) + 0.0 AS true_jaccard,
           round(abs(est - tru), 6) + 0.0 AS abs_err
    FROM scored
    """,
    category="text",
)
def text_dedup_minhash_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) Jaccard-estimate quality over the LSH candidate pairs —
    the dedup-family analogue of `similarity_ann_recall_at_k`: est vs true
    Jaccard + absolute error per candidate pair, quantifying the
    ``num_hashes`` accuracy knob. Band buckets are capped at 50 members
    (r8) — the same guard every sibling dedup query applies: an uncapped
    hot band made the pair OUTPUT quadratic in bucket size (7.3M rows /
    153 s at sf0.1; oversized buckets are exact-dup territory with no
    estimator signal anyway)."""
    out = dedup.minhash_estimate_quality(
        _corpus(spark, sf_dir), "doc_id", "text", max_bucket=50
    )
    return out.select(
        "id_a",
        "id_b",
        rnd(F.col("est_jaccard"), 6).alias("est_jaccard"),
        rnd(F.col("true_jaccard"), 6).alias("true_jaccard"),
        rnd(F.col("abs_err"), 6).alias("abs_err"),
    )


@query(
    "text_dedup_simhash",
    oracle=f"""
    WITH {_CORPUS_SQL}, s AS (
      SELECT doc_id,
             {D.simhash_bits(D.hashed_token_array('text', 'x', D.DUCK), 16, D.DUCK)} AS simhash
      FROM corpus
    )
    SELECT doc_id, simhash,
           min(doc_id) OVER (PARTITION BY simhash) AS canonical_id,
           CAST(doc_id <> min(doc_id) OVER (PARTITION BY simhash) AS INT) AS is_dup
    FROM s
    """,
    category="text",
)
def text_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash signatures with exact-signature canonicalization."""
    out = dedup.simhash(_corpus(spark, sf_dir), "doc_id", "text")
    return out.select("doc_id", "simhash", "canonical_id", "is_dup")


@query(
    "text_dedup_ngram_jaccard",
    # sh MATERIALIZED (both join legs reuse the shingling) and the
    # intersection staged once per pair (it appeared 3x: SELECT + twice
    # in WHERE) — same expressions, ~29 s -> ~2 s at sf0.1.
    oracle=f"""
    WITH {_CORPUS_SQL}, sh AS MATERIALIZED (
      SELECT doc_id, source, n_chars // 100 AS len_bucket,
             {D.word_shingles('text', 2, D.DUCK)} AS sg
      FROM corpus
    ), cand AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.sg, b.sg)) AS inter,
             len(a.sg) AS la, len(b.sg) AS lb
      FROM sh a JOIN sh b
        ON a.source = b.source AND a.len_bucket = b.len_bucket
       AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           round(inter / CAST(la + lb - inter AS DOUBLE), 6) + 0.0 AS jaccard
    FROM cand
    WHERE inter / CAST(la + lb - inter AS DOUBLE) >= 0.8
    """,
    category="text",
)
def text_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 2-gram Jaccard ≥ 0.8 over (source, length-bucket)-blocked
    candidate pairs. The length bucket shrinks blocks ~5× (near-dups have
    near-equal lengths; exact dups identical ones) — pair count, the
    quadratic term, drops ~25×. For unblockable corpora the scale path is
    MinHash-LSH candidates + this exact verify (text_dedup_near_minhash)."""
    corpus = _corpus(spark, sf_dir).withColumn(
        "len_bucket", F.floor(F.col("n_chars") / 100)
    )
    out = dedup.ngram_jaccard_pairs(
        corpus, "doc_id", "text", block_cols=["source", "len_bucket"], n=2, threshold=0.8
    )
    return out.select("id_a", "id_b", rnd(F.col("jaccard"), 6).alias("jaccard"))


@query(
    "text_dedup_simhash_hamming",
    oracle=f"""
    WITH {_CORPUS_SQL}, s AS (
      SELECT doc_id,
             {D.simhash_bits(D.hashed_token_array('text', 'x', D.DUCK), 32, D.DUCK)} AS simhash
      FROM corpus
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM s a JOIN s b
      ON a.doc_id < b.doc_id
     AND ((a.simhash % 65536) = (b.simhash % 65536)
          OR (a.simhash // 65536) = (b.simhash // 65536))
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
    """,
    category="text",
)
def text_dedup_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(32) near-dup pairs at Hamming distance ≤ 2, candidate-blocked
    on half-signature bands (a ≤2-bit difference must leave one half intact)
    — the banded join the oracle mirrors with the same half-key predicate.
    32 bits (vs 16 for the exact-signature query) keeps buckets small on
    homogeneous corpora: 16-bit signatures of same-vocabulary docs collide
    massively (measured 9× slower with 7× the output pairs)."""
    out = dedup.simhash_hamming_pairs(
        _corpus(spark, sf_dir), "doc_id", "text", nbits=32, max_distance=2
    )
    return out.select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


@query(
    "text_fingerprint",
    # staged CTEs (tokens → gram hashes → window mins): inlining the nested
    # list expression makes DuckDB re-tokenize the doc per window (~100 s at
    # sf0.01); staged runs in ~1 s. Same expressions as _dialect.winnow_*.
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {D.tokens('text', D.DUCK)} AS toks FROM documents
    ), g AS (
      SELECT doc_id,
             list_transform(range(0, len(toks) - 2),
               i -> {D.hash60("toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3]", D.DUCK)})
               AS hts
      FROM t
    ), f AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(hts) - 2),
               i -> list_min(hts[i:i + 3]))) AS fps
      FROM g
    )
    SELECT doc_id, unnest(fps) AS fingerprint FROM f
    """,
    category="text",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (3-gram rolling hash, window 4) — the standard
    shared-passage sketch."""
    return dedup.winnow_fingerprint(load(spark, sf_dir, "documents"), "doc_id", "text")


def _lang_score_sql(markers: tuple[str, ...]) -> str:
    toks = D.tokens("text", D.DUCK)
    quoted = ", ".join(f"'{m}'" for m in markers)
    return (
        f"list_sum(list_transform({toks}, t -> CASE WHEN t IN ({quoted}) THEN 1 ELSE 0 END))"
        f" / CAST(len({toks}) AS DOUBLE)"
    )


@query(
    "text_lang_id",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, lang,
             {", ".join(f"{_lang_score_sql(m)} AS sc_{lang}" for lang, m in analysis.LANG_MARKERS.items())}
      FROM documents
    ), b AS (
      SELECT *, greatest(sc_de, sc_en, sc_es, sc_fr, sc_pt) AS best FROM s
    )
    SELECT doc_id, lang,
           CASE WHEN sc_de = best THEN 'de' WHEN sc_en = best THEN 'en'
                WHEN sc_es = best THEN 'es' WHEN sc_fr = best THEN 'fr'
                ELSE 'pt' END AS pred_lang,
           round(best, 6) + 0.0 AS lang_score
    FROM b
    """,
    category="text",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-lexicon language ID: fraction-of-tokens score per language,
    argmax with alphabetical tie-break."""
    out = analysis.lang_id(load(spark, sf_dir, "documents"), "text")
    return out.select(
        "doc_id", "lang", "pred_lang", rnd(F.col("lang_score"), 6).alias("lang_score")
    )


@query(
    "text_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len({D.tokens('text', D.DUCK)}) AS BIGINT) AS n_tokens_ws,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)
             AS n_tokens_bpe
    FROM documents
    """,
    category="text",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish pre-token counts."""
    out = analysis.token_counts(load(spark, sf_dir, "documents"), "text")
    return out.select("doc_id", "n_tokens_ws", "n_tokens_bpe")


def _bpe_count_oracle() -> str:
    from etl_aws_spark.text import bpe

    return f"""
    SELECT doc_id, {bpe.doc_token_count_sql('text', bpe.DUCK)} AS n_tokens_bpe
    FROM documents
    """


@query("text_token_count_bpe", oracle=_bpe_count_oracle(), category="text")
def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKENIZER-faithful token counts: the GPT-2-style BPE apply step
    (pre-token regex split, then pair fusion in merge-rank order) run
    entirely as JVM string expressions — a word wraps to one-symbol-per-
    bracket form and each merge is one replace('<a><b>'→'<ab>'), so the
    whole tokenizer stays inside whole-stage codegen with no shuffle and
    no Python (text/bpe.py; the mapInPandas twin covers production-size
    merge tables). The oracle replays the identical chain in DuckDB;
    equivalence to the textbook min-rank merge loop is property-tested."""
    return bpe_mod.bpe_token_count(load(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "text_quality_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, {D.tokens('text', D.DUCK)} AS toks,
             len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct
      FROM documents
    ), m AS (
      SELECT doc_id,
             len(toks) AS n_tokens,
             list_sum(list_transform(toks, t -> length(t))) / CAST(len(toks) AS DOUBLE) AS mean_token_len,
             list_sum(list_transform(toks, t -> CASE WHEN t IN ({", ".join(f"'{s}'" for s in analysis.STOPWORDS)}) THEN 1 ELSE 0 END))
               / CAST(len(toks) AS DOUBLE) AS stopword_ratio,
             len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE) AS uniq_token_ratio,
             n_punct / CAST(greatest(length(text), 1) AS DOUBLE) AS punct_ratio
      FROM t
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           round(mean_token_len, 6) + 0.0 AS mean_token_len,
           round(stopword_ratio, 6) + 0.0 AS stopword_ratio,
           round(uniq_token_ratio, 6) + 0.0 AS uniq_token_ratio,
           round(punct_ratio, 6) + 0.0 AS punct_ratio,
           round(0.25 * least(n_tokens / 100.0, 1.0)
                 + 0.25 * least(stopword_ratio * 5.0, 1.0)
                 + 0.25 * uniq_token_ratio
                 + 0.25 * (1.0 - least(punct_ratio * 10.0, 1.0)), 6) + 0.0 AS quality_score
    FROM m
    """,
    category="text",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style heuristic quality profile + composite score."""
    out = analysis.quality_score(load(spark, sf_dir, "documents"), "text")
    return out.select(
        "doc_id", "n_tokens",
        rnd(F.col("mean_token_len"), 6).alias("mean_token_len"),
        rnd(F.col("stopword_ratio"), 6).alias("stopword_ratio"),
        rnd(F.col("uniq_token_ratio"), 6).alias("uniq_token_ratio"),
        rnd(F.col("punct_ratio"), 6).alias("punct_ratio"),
        rnd(F.col("quality_score"), 6).alias("quality_score"),
    )


@query(
    "text_tfidf_top_terms",
    oracle=f"""
    WITH terms AS (
      SELECT doc_id, unnest({D.tokens('text', D.DUCK)}) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term
    ), n AS (
      SELECT count(DISTINCT doc_id) AS n_docs FROM documents
    ), idf AS (
      SELECT term, ln((n_docs + 1.0) / (count(DISTINCT doc_id) + 1.0)) + 1.0 AS idf
      FROM tf CROSS JOIN n GROUP BY term, n_docs
    ), scored AS (
      SELECT tf.doc_id, tf.term, tf.tf * idf.idf AS tfidf
      FROM tf JOIN idf USING (term)
    ), ranked AS (
      SELECT doc_id, term, tfidf,
             CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC)
                  AS INTEGER) AS rank
      FROM scored
    )
    SELECT doc_id, term, round(tfidf, 6) + 0.0 AS tfidf, rank
    FROM ranked WHERE rank <= 3
    """,
    category="text",
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per doc by smoothed TF-IDF — the corpus
    profiling op behind keyword extraction / quality triage."""
    out = analysis.tfidf_top_terms(load(spark, sf_dir, "documents"), "doc_id", "text", k=3)
    return out.select("doc_id", "term", rnd(F.col("tfidf"), 6).alias("tfidf"), "rank")


@query(
    "text_stats",
    oracle=f"""
    SELECT source,
           count(*) AS n_docs,
           round(avg(n_chars), 4) + 0.0 AS avg_chars,
           CAST(sum(len({D.tokens('text', D.DUCK)})) AS BIGINT) AS n_tokens,
           count(DISTINCT lang) AS n_langs
    FROM documents GROUP BY source
    """,
    category="text",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profile per source: doc count, mean length, token volume,
    language spread."""
    docs = load(spark, sf_dir, "documents")
    toks = D.tokens("text", D.SPARK)
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        rnd(F.avg("n_chars")).alias("avg_chars"),
        F.sum(F.expr(f"size({toks})").cast("bigint")).alias("n_tokens"),
        F.countDistinct("lang").alias("n_langs"),
    )


@query(
    "text_dedup_connected_components",
    oracle=f"""
    WITH RECURSIVE {_CORPUS_SQL}, {_minhash_bands_sql()},

    bands_c AS (
      SELECT doc_id, bk FROM (
        SELECT doc_id, bk, count(*) OVER (PARTITION BY bk) AS _bn FROM bands
      ) WHERE _bn <= 50
    ),
    edges AS (
      SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
      FROM bands_c a JOIN bands_c b USING (bk) WHERE a.doc_id < b.doc_id
    ),
    verts AS (SELECT DISTINCT doc_id FROM corpus),
    sym AS (
      SELECT src AS u, dst AS v FROM edges
      UNION SELECT dst AS u, src AS v FROM edges
    ),
    reach AS (
      SELECT doc_id AS id, doc_id AS r FROM verts
      UNION
      SELECT s.u AS id, reach.r FROM reach JOIN sym s ON s.v = reach.id
    )
    SELECT id AS doc_id, min(r) AS component_id,
           CAST(id <> min(r) AS INT) AS is_dup
    FROM reach GROUP BY id
    """,
    category="text",
)
def text_dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full dedup-group closure: LSH band candidate pairs → distributed
    connected components (operators/graph.py — alternating min-label
    propagation + pointer jumping), labeling every doc with its component's
    min id. Strictly stronger than the one-round `text_dedup_near_minhash`
    canonicalization: chains A~B~C linked through DIFFERENT bands collapse
    here. The oracle computes TRUE components via a recursive-CTE
    reachability closure over the identical edge set — a completely
    different algorithm that must agree on every label."""
    corpus = _corpus(spark, sf_dir)
    from etl_aws_spark.operators import graph

    edges = dedup.minhash_band_edges(corpus, "doc_id", "text", max_bucket=50)
    verts = corpus.select("doc_id").distinct()
    comp = graph.connected_components(
        verts, edges, id_col="doc_id", edges_subset_of_vertices=True
    )
    return comp.select(
        "doc_id",
        "component_id",
        (F.col("doc_id") != F.col("component_id")).cast("int").alias("is_dup"),
    )


@query(
    "text_dedup_keep_best",
    oracle=f"""
    WITH RECURSIVE {_CORPUS_SQL}, {_minhash_bands_sql()},

    bands_c AS (
      SELECT doc_id, bk FROM (
        SELECT doc_id, bk, count(*) OVER (PARTITION BY bk) AS _bn FROM bands
      ) WHERE _bn <= 50
    ),
    edges AS (
      SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
      FROM bands_c a JOIN bands_c b USING (bk) WHERE a.doc_id < b.doc_id
    ),
    verts AS (SELECT DISTINCT doc_id FROM corpus),
    sym AS (
      SELECT src AS u, dst AS v FROM edges
      UNION SELECT dst AS u, src AS v FROM edges
    ),
    reach AS (
      SELECT doc_id AS id, doc_id AS r FROM verts
      UNION
      SELECT s.u AS id, reach.r FROM reach JOIN sym s ON s.v = reach.id
    ),
    cc AS (SELECT id AS doc_id, min(r) AS component_id FROM reach GROUP BY id),
    lab AS (
      SELECT c.doc_id, CAST(c.n_chars AS BIGINT) AS n_chars, cc.component_id
      FROM corpus c JOIN cc USING (doc_id)
    ),
    ranked AS (
      SELECT *,
             row_number() OVER (PARTITION BY component_id
                                ORDER BY n_chars DESC, doc_id ASC) AS rn,
             count(*) OVER (PARTITION BY component_id) AS cluster_size
      FROM lab
    )
    SELECT component_id, doc_id AS kept_doc_id, cluster_size, n_chars
    FROM ranked WHERE rn = 1
    """,
    category="text",
)
def text_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-dedup END STATE: near-dup clusters (LSH bands → full
    connected-components closure) reduced to one survivor each — the
    longest doc, ties to the smallest id (the keep-best rule every
    production pipeline applies after clustering; length standing in for
    the quality score). Cluster size rides along so downstream can weight
    survivors by their duplication count. Survivor pick and size share one
    (component_id) window partitioning — a single Exchange after the
    closure. The oracle replays the whole composition: recursive-CTE
    components + the same keep-best window."""
    from pyspark.sql import Window

    from etl_aws_spark.operators import graph

    corpus = _corpus(spark, sf_dir)
    edges = dedup.minhash_band_edges(corpus, "doc_id", "text", max_bucket=50)
    verts = corpus.select("doc_id").distinct()
    comp = graph.connected_components(
        verts, edges, id_col="doc_id", edges_subset_of_vertices=True
    )
    lab = corpus.select("doc_id", F.col("n_chars").cast("long").alias("n_chars")).join(
        comp, "doc_id"
    )
    w = Window.partitionBy("component_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    ws = Window.partitionBy("component_id")
    ranked = lab.select(
        "component_id",
        F.col("doc_id").alias("kept_doc_id"),
        "n_chars",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(ws).alias("cluster_size"),
    )
    return ranked.filter(F.col("_rn") == 1).select(
        "component_id", "kept_doc_id", "cluster_size", "n_chars"
    )


@query(
    "text_zipf_rank_frequency",
    oracle=f"""
    WITH toks AS (
      SELECT unnest({D.tokens('text', D.DUCK)}) AS tok FROM documents
    ), freq AS (
      SELECT tok, count(*) AS n FROM toks GROUP BY tok
    ), ranked AS (
      SELECT tok, n,
             CAST(row_number() OVER (ORDER BY n DESC, tok ASC) AS BIGINT) AS rnk
      FROM freq QUALIFY rnk <= 100
    ), fit AS (
      SELECT round(regr_slope(ln(CAST(n AS DOUBLE)), ln(CAST(rnk AS DOUBLE))), 6)
               + 0.0 AS zipf_slope
      FROM ranked
    )
    SELECT r.rnk, r.tok, r.n, f.zipf_slope
    FROM ranked r CROSS JOIN fit f
    """,
    category="text",
)
def text_zipf_rank_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency head of the corpus vocabulary (top 100 tokens)
    with the fitted log-log slope attached (slope ≈ -1 is the Zipf
    signature; a flat slope flags synthetic or templated text — a corpus
    health check). One explode + one (token) aggregate over the corpus;
    ranking and the regression run on the 100-row head, and the 1-row fit
    broadcasts back onto it."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.expr(D.tokens("text", D.SPARK))).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    # top-100 via orderBy().limit() (TakeOrderedAndProject — the vocab
    # grows with the corpus under Heaps' law, so no global row_number over
    # it); rank attached by the same total order on the 100-row head
    head = freq.orderBy(F.desc("n"), F.asc("tok")).limit(100)
    w = Window.orderBy(F.desc("n"), F.asc("tok"))
    ranked = head.withColumn("rnk", F.row_number().over(w).cast("long"))
    fit = ranked.agg(
        rnd(
            F.regr_slope(
                F.log(F.col("n").cast("double")), F.log(F.col("rnk").cast("double"))
            ),
            6,
        ).alias("zipf_slope")
    )
    return ranked.crossJoin(F.broadcast(fit)).select(
        "rnk", "tok", "n", "zipf_slope"
    )


@query(
    "text_dedup_ngram_containment",
    oracle=f"""
    WITH {_CORPUS_SQL}, sh AS (
      SELECT DISTINCT doc_id AS id, unnest({D.shingle_hashes('text', 3, D.DUCK)}) AS h
      FROM corpus
    ), live AS (
      SELECT sh.id, sh.h FROM sh
      JOIN (SELECT h FROM sh GROUP BY h HAVING count(*) <= 50) f USING (h)
    ), sizes AS (
      SELECT id, count(*) AS sz FROM live GROUP BY id
    ), shared AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_shared
      FROM live a JOIN live b ON a.h = b.h AND a.id < b.id
      GROUP BY a.id, b.id
    ), scored AS (
      SELECT s.id_a, s.id_b, s.n_shared,
             s.n_shared / CAST(least(sa.sz, sb.sz) AS DOUBLE) AS containment,
             s.n_shared / CAST(sa.sz + sb.sz - s.n_shared AS DOUBLE) AS jaccard
      FROM shared s
      JOIN sizes sa ON s.id_a = sa.id
      JOIN sizes sb ON s.id_b = sb.id
    )
    SELECT id_a, id_b, CAST(n_shared AS BIGINT) AS n_shared,
           round(containment, 6) + 0.0 AS containment,
           round(jaccard, 6) + 0.0 AS jaccard
    FROM scored WHERE containment >= 0.9
    """,
    category="text",
)
def text_dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment dedup (near-superset detection): 3-gram
    shingle containment >= 0.9 via a corpus-wide inverted index with a
    df <= 50 stop-shingle cut — the quote-inclusion signal that symmetric
    Jaccard and its length-bucket blocking structurally miss. On the test
    corpus the planted exact dups surface at containment 1.0; the fan-out
    bound Σ df² ≤ |shingles|·max_df is the documented scale contract."""
    corpus = _corpus(spark, sf_dir)
    out = dedup.ngram_containment_pairs(
        corpus, "doc_id", "text", n=3, threshold=0.9, max_df=50
    )
    return out.select(
        "id_a", "id_b", "n_shared",
        rnd(F.col("containment"), 6).alias("containment"),
        rnd(F.col("jaccard"), 6).alias("jaccard"),
    )


@query(
    "text_bigram_lm_score",
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
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                      list(lpv ORDER BY pos)),
                         (acc, x) -> acc + x) AS s
      FROM lp GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(per.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           round((per.s / per.n_bigrams)
                 + sign(per.s / per.n_bigrams) * 1e-9, 6) + 0.0 AS avg_logp
    FROM (SELECT doc_id FROM documents) d LEFT JOIN per USING (doc_id)
    """,
    category="text",
)
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained add-one-smoothed bigram LM scoring (the CCNet-shaped
    quality signal): P(w2|w1) = (c(w1,w2)+1)/(c(w1)+V), documents scored
    by mean log-prob. The 'model' is two aggregates joined back on their
    natural keys — no collected state, no UDF. Per-bigram log-probs are
    pre-rounded and summed in position order (sort-collect-fold), so the
    mean is engine-exact; the final rounding uses the house half-boundary
    nudge."""
    from etl_aws_spark.suite._util import rnd_nudged

    out = analysis.bigram_lm_score(load(spark, sf_dir, "documents"), "doc_id", "text")
    return out.select(
        "doc_id", "n_bigrams", rnd_nudged(F.col("avg_logp"), 6).alias("avg_logp")
    )


def _bpe_train_oracle(n_merges: int = 12) -> str:
    pre = bpe_mod.PRETOKEN_RE
    parts = [f"""
    w0 AS MATERIALIZED (
      SELECT cnt, regexp_replace(w, '(.)', '<\\1>', 'g') AS s FROM (
        SELECT lower(w) AS w, count(*) AS cnt FROM (
          SELECT unnest(regexp_extract_all(text, '{pre}')) AS w FROM documents
        ) WHERE regexp_full_match(w, '[A-Za-z]+') GROUP BY lower(w)
      )
    )"""]
    for r in range(1, n_merges + 1):
        parts.append(f"""
    p{r} AS (
      SELECT sym[i] AS a, sym[i + 1] AS b, sum(cnt) AS c
      FROM (
        SELECT cnt, sym, unnest(generate_series(1, len(sym) - 1)) AS i
        FROM (SELECT cnt, regexp_extract_all(s, '[^<>]+') AS sym FROM w{r - 1})
      ) GROUP BY 1, 2
    ),
    m{r} AS MATERIALIZED (SELECT a, b, c FROM p{r} ORDER BY c DESC, a ASC, b ASC LIMIT 1),
    w{r} AS MATERIALIZED (
      SELECT w.cnt,
             replace(w.s, '<' || m.a || '><' || m.b || '>',
                     '<' || m.a || m.b || '>') AS s
      FROM w{r - 1} w CROSS JOIN m{r} m
    )""")
    finals = "\n      UNION ALL\n".join(
        f"SELECT {r} AS merge_rank, a, b, CAST(c AS BIGINT) AS pair_count FROM m{r}"
        for r in range(1, n_merges + 1)
    )
    return "WITH " + ",".join(parts) + "\n    " + finals


@query("tokenizer_train_bpe", oracle=_bpe_train_oracle(12), category="text")
def tokenizer_train_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge-table TRAINING on the corpus (Sennrich 2016) — the
    learning half of the tokenizer whose apply half is
    `text_token_count_bpe`. The corpus collapses once to the word-type
    frequency table (narrow shuffle, localCheckpoint-ed); each of 12
    rounds is one map-side-combined weighted pair aggregate plus a
    one-row argmax collect (bounded model state, the kmeans pattern), and
    the learned merge applies as a single literal replace on the wrapped
    representation. Ties break lexicographically, no data-dependent early
    stop — so the oracle replays ALL 12 training rounds in unrolled SQL,
    argmax and merge application included, making tokenizer training
    itself a value-hash-checked query."""
    merges = bpe_mod.train_merges(
        load(spark, sf_dir, "documents"), "text", n_merges=12
    )
    rows = [(i + 1, a, b, c) for i, (a, b, c) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "merge_rank int, a string, b string, pair_count bigint"
    )


_BPE_SAMPLE_MOD = 4


def _bpe_sampled_oracle(n_merges: int = 12) -> str:
    """Unrolled SQL replay of SAMPLED BPE training + one corpus-wide
    apply pass: the w-chain trains the merges on the hash-sampled
    documents only; the full-corpus word-type table f0 is then scored
    once, with the cumulative token count after each learned merge
    computed as nested replaces parameterized by the m{r} rows."""
    pre = bpe_mod.PRETOKEN_RE
    samp = (
        "('0x' || substr(md5('bpesample:' || CAST(doc_id AS VARCHAR)), 1, 15))"
        f"::BIGINT % {_BPE_SAMPLE_MOD} = 0"
    )
    word_table = """
      SELECT cnt, regexp_replace(w, '(.)', '<\\1>', 'g') AS s FROM (
        SELECT lower(w) AS w, count(*) AS cnt FROM (
          SELECT unnest(regexp_extract_all(text, '{pre}')) AS w
          FROM documents{where}
        ) WHERE regexp_full_match(w, '[A-Za-z]+') GROUP BY lower(w)
      )"""
    parts = [
        "w0 AS MATERIALIZED ("
        + word_table.format(pre=pre, where=f" WHERE {samp}")
        + "\n    )",
        "f0 AS MATERIALIZED ("
        + word_table.format(pre=pre, where="")
        + "\n    )",
    ]
    for r in range(1, n_merges + 1):
        parts.append(f"""
    p{r} AS (
      SELECT sym[i] AS a, sym[i + 1] AS b, sum(cnt) AS c
      FROM (
        SELECT cnt, sym, unnest(generate_series(1, len(sym) - 1)) AS i
        FROM (SELECT cnt, regexp_extract_all(s, '[^<>]+') AS sym FROM w{r - 1})
      ) GROUP BY 1, 2
    ),
    m{r} AS MATERIALIZED (SELECT a, b, c FROM p{r} ORDER BY c DESC, a ASC, b ASC LIMIT 1),
    w{r} AS MATERIALIZED (
      SELECT w.cnt,
             replace(w.s, '<' || m.a || '><' || m.b || '>',
                     '<' || m.a || m.b || '>') AS s
      FROM w{r - 1} w CROSS JOIN m{r} m
    )""")
    # one corpus-wide pass: all cumulative post-merge token counts from f0
    chain = "f0.s"
    t_cols = []
    for r in range(1, n_merges + 1):
        chain = (
            f"replace({chain}, '<' || m{r}.a || '><' || m{r}.b || '>', "
            f"'<' || m{r}.a || m{r}.b || '>')"
        )
        t_cols.append(
            f"sum(f0.cnt * (length({chain}) - length(replace({chain}, '<', ''))))"
            f" AS t{r}"
        )
    crosses = " ".join(f"CROSS JOIN m{r}" for r in range(1, n_merges + 1))
    parts.append(
        "\n    tot AS MATERIALIZED (\n      SELECT "
        + ",\n             ".join(t_cols)
        + f"\n      FROM f0 {crosses}\n    )"
    )
    finals = "\n      UNION ALL\n".join(
        f"SELECT {r} AS merge_rank, a, b, CAST(c AS BIGINT) AS pair_count,"
        f" CAST((SELECT t{r} FROM tot) AS BIGINT) AS corpus_tokens_after"
        f" FROM m{r}"
        for r in range(1, n_merges + 1)
    )
    return "WITH " + ",".join(parts) + "\n    " + finals


@query("tokenizer_train_bpe_sampled", oracle=_bpe_sampled_oracle(12), category="text")
def tokenizer_train_bpe_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE training on a deterministic md5 hash-sample of the corpus
    (~1/4 of documents), learned merges applied CORPUS-WIDE in one pass —
    the production posture for tokenizer training at 100 TB: each merge
    round re-scans the training word-type table, so you train on a
    content-independent document sample (standard practice; pair
    statistics concentrate fast) and only the final apply touches every
    document. Output per learned merge: the sample pair count plus the
    full-corpus token count after applying merges 1..r (the compression
    curve). The corpus-wide counts come from ONE aggregate over the full
    word-type frequency table with the 12 cumulative replace chains as
    columns — one job, no per-round corpus re-scan. The oracle replays
    sampled training AND the corpus apply in unrolled SQL, so
    sample-trained tokenization is value-hash-checked end to end.
    `tokenizer_train_bpe` keeps the full-corpus training path."""
    h = (
        "cast(conv(substr(md5(concat('bpesample:', cast(doc_id as string))),"
        " 1, 15), 16, 10) as bigint)"
    )
    docs = load(spark, sf_dir, "documents")
    sample = docs.filter(F.expr(f"pmod({h}, {_BPE_SAMPLE_MOD}) = 0"))
    merges = bpe_mod.train_merges(sample, "text", n_merges=12)

    pre = bpe_mod.PRETOKEN_RE.replace(chr(92), chr(92) * 2)
    words = (
        docs.select(
            F.explode(
                F.expr(f"regexp_extract_all(text, '{pre}', 0)")
            ).alias("w")
        )
        .filter(F.expr("w rlike '^[A-Za-z]+$'"))
        .select(F.lower("w").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("cnt", F.expr("regexp_replace(w, '(.)', '<$1>')").alias("s"))
    )
    chain = "s"
    aggs = []
    for r, (a, b, _) in enumerate(merges, 1):
        chain = f"replace({chain}, '<{a}><{b}>', '<{a}{b}>')"
        aggs.append(
            F.sum(
                F.expr(
                    f"cnt * (length({chain}) - length(replace({chain}, '<', '')))"
                )
            ).alias(f"t{r}")
        )
    tot = words.agg(*aggs).first()
    rows = [
        (r, a, b, c, int(tot[f"t{r}"]))
        for r, (a, b, c) in enumerate(merges, 1)
    ]
    return spark.createDataFrame(
        rows,
        "merge_rank int, a string, b string, pair_count bigint,"
        " corpus_tokens_after bigint",
    )


_RAKE_STOPS = ("a", "the")


@query(
    "text_keyword_rake",
    # the full RAKE replay: stop-split islands -> per-doc word freq/degree
    # -> phrase score = sum(deg(w)/freq(w)) -> top phrase per doc. Every
    # count is exact integer arithmetic; only the final score crosses the
    # rounding bridge.
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, u.w AS word, u.pos,
             CASE WHEN u.w IN {_RAKE_STOPS} THEN 1 ELSE 0 END AS is_stop
      FROM (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS w,
               unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
        FROM documents
      ) u
    ), isl AS (
      SELECT doc_id, word, pos, is_stop,
             sum(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS phrase_id
      FROM toks
    ), pw AS (
      SELECT doc_id, phrase_id, word, pos FROM isl WHERE is_stop = 0
    ), plen AS (
      SELECT doc_id, phrase_id, count(*) AS plen,
             string_agg(word, ' ' ORDER BY pos) AS phrase
      FROM pw GROUP BY doc_id, phrase_id
    ), wstat AS (
      SELECT pw.doc_id, pw.word,
             count(*) AS freq,
             sum(plen.plen) AS deg
      FROM pw JOIN plen USING (doc_id, phrase_id)
      GROUP BY pw.doc_id, pw.word
    ), pscore AS (
      SELECT pw.doc_id, pw.phrase_id,
             round(sum(CAST(w.deg AS DOUBLE) / w.freq)
                   + sign(sum(CAST(w.deg AS DOUBLE) / w.freq)) * 1e-9, 6)
               + 0.0 AS score
      FROM pw JOIN wstat w ON pw.doc_id = w.doc_id AND pw.word = w.word
      GROUP BY pw.doc_id, pw.phrase_id
    )
    SELECT doc_id, phrase AS keyphrase,
           CAST(plen AS BIGINT) AS n_words, score
    FROM (
      SELECT p.doc_id, l.phrase, l.plen, p.score,
             row_number() OVER (PARTITION BY p.doc_id
                                ORDER BY p.score DESC, l.phrase ASC) AS rk
      FROM pscore p JOIN plen l USING (doc_id, phrase_id)
    ) WHERE rk = 1
    """,
    category="text",
)
def text_keyword_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    maximal stopword-free runs, each scored by Σ degree(w)/freq(w) over
    its words (degree = total length of the doc's phrases containing w),
    top phrase per document. All per-doc: one doc_id-keyed window pass
    builds the phrase islands (lag-free cumsum over stop flags), then
    word and phrase aggregates ride the same partitioning — the shuffle
    carries (doc, phrase, word) scalar rows only, never re-reading text.
    Scores are exact-integer ratios summed per phrase; the one derived
    double crosses the nudged bridge. Duplicate-word scoring (freq > 1
    inside a phrase counts each occurrence) matches the published
    formulation; the oracle replays the identical pipeline."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos0", "word"),
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        "word",
        F.when(F.col("word").isin(*_RAKE_STOPS), 1).otherwise(0).alias("is_stop"),
    )
    w_isl = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pw = (
        toks.withColumn("phrase_id", F.sum("is_stop").over(w_isl))
        .filter(F.col("is_stop") == 0)
        .select("doc_id", "phrase_id", "word", "pos")
    )
    plen = pw.groupBy("doc_id", "phrase_id").agg(
        F.count(F.lit(1)).alias("plen"),
        F.array_join(
            F.array_sort(
                F.collect_list(F.struct("pos", "word"))
            ).getField("word"),
            " ",
        ).alias("phrase"),
    )
    wstat = (
        pw.join(plen.select("doc_id", "phrase_id", "plen"), ["doc_id", "phrase_id"])
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("deg"))
    )
    score_raw = F.sum(F.col("deg").cast("double") / F.col("freq"))
    pscore = (
        pw.join(wstat, ["doc_id", "word"])
        .groupBy("doc_id", "phrase_id")
        .agg(
            (
                F.round(score_raw + F.signum(score_raw) * F.lit(1e-9), 6)
                + F.lit(0.0)
            ).alias("score")
        )
    )
    w_rk = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("phrase"))
    return (
        pscore.join(plen, ["doc_id", "phrase_id"])
        .withColumn("rk", F.row_number().over(w_rk))
        .filter(F.col("rk") == 1)
        .select(
            "doc_id",
            F.col("phrase").alias("keyphrase"),
            F.col("plen").cast("long").alias("n_words"),
            "score",
        )
    )


@query(
    "text_hashing_trick_vectorize",
    # identical md5-derived dims/signs on both engines (_dialect.hash60);
    # counts are exact integers, so only the final normalize crosses the
    # nudged bridge.
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({D.tokens('text', D.DUCK)}) AS t
      FROM documents
    ), hashed AS (
      SELECT doc_id,
             {D.hash60("concat('fh:', t)", D.DUCK)} % 64 AS pos,
             CASE WHEN ({D.hash60("concat('fh:', t)", D.DUCK)} // 64) % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM toks
    ), cells AS (
      SELECT doc_id, pos, sum(sgn) AS c
      FROM hashed GROUP BY doc_id, pos
      HAVING sum(sgn) <> 0
    ), nrm AS (
      SELECT doc_id, sqrt(sum(c * c)) AS nm FROM cells GROUP BY doc_id
    )
    SELECT c.doc_id, CAST(c.pos AS INT) AS pos,
           round(c.c / nrm.nm + sign(c.c / nrm.nm) * 1e-9, 6) + 0.0 AS val
    FROM cells c JOIN nrm USING (doc_id)
    """,
    category="text",
)
def text_hashing_trick_vectorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing ('hashing trick', Weinberger 2009 / VW) document
    vectorizer: every token hashes to one of 64 dimensions with an
    md5-derived ±1 sign, signed counts accumulate per cell, and the
    vector is L2-normalized — text becomes an embedding with NO model,
    no vocabulary build, no second pass. This is the bridge between the
    text layer and the vector layer: the output rides the same sparse
    (doc, pos, val) scalar shape as `embedding_label_centroids`, ready
    for the cosine/LSH dedup family. One explode + two keyed aggregates;
    the hash is the shared `_dialect.hash60` both engines replay
    bit-for-bit; state per doc is ≤64 cells however long the text."""
    docs = load(spark, sf_dir, "documents")
    h = D.hash60("concat('fh:', t)", D.SPARK)
    hashed = docs.select(
        "doc_id",
        F.explode(F.expr(D.tokens("text", D.SPARK))).alias("t"),
    ).select(
        "doc_id",
        F.expr(f"{h} % 64").alias("pos"),
        F.expr(
            f"CASE WHEN ({h} div 64) % 2 = 0 THEN 1 ELSE -1 END"
        ).alias("sgn"),
    )
    cells = (
        hashed.groupBy("doc_id", "pos")
        .agg(F.sum("sgn").alias("c"))
        .filter(F.col("c") != 0)
    )
    nrm = cells.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("nm")
    )
    val = F.col("c") / F.col("nm")
    return cells.join(nrm, "doc_id").select(
        "doc_id",
        F.col("pos").cast("int").alias("pos"),
        (F.round(val + F.signum(val) * F.lit(1e-9), 6) + F.lit(0.0)).alias("val"),
    )


_FH_CELLS_SQL = f"""
    toks AS (
      SELECT doc_id, unnest({D.tokens('text', D.DUCK)}) AS t
      FROM documents
    ), hashed AS (
      SELECT doc_id,
             {D.hash60("concat('fh:', t)", D.DUCK)} % 64 AS pos,
             CASE WHEN ({D.hash60("concat('fh:', t)", D.DUCK)} // 64) % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM toks
    ), rawcells AS (
      SELECT doc_id, pos, sum(sgn) AS c
      FROM hashed GROUP BY doc_id, pos
      HAVING sum(sgn) <> 0
    ), nrm AS (
      SELECT doc_id, sqrt(sum(c * c)) AS nm FROM rawcells GROUP BY doc_id
    ), cells AS (
      SELECT r.doc_id, r.pos,
             round(r.c / nrm.nm + sign(r.c / nrm.nm) * 1e-9, 6) + 0.0 AS val
      FROM rawcells r JOIN nrm USING (doc_id)
    )
"""


def _fh_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized feature-hash cells (doc_id, pos, val) — the Spark twin
    of `_FH_CELLS_SQL`; components rounded so downstream dot products
    start from engine-identical values."""
    return text_hashing_trick_vectorize(spark, sf_dir)


@query(
    "text_hashed_nearest_docs",
    oracle=f"""
    WITH {_FH_CELLS_SQL}
    SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rank, cos
    FROM (
      SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id,
             round(sum(q.val * c.val), 6) + 0.0 AS cos,
             row_number() OVER (
               PARTITION BY q.doc_id
               ORDER BY round(sum(q.val * c.val), 6) DESC, c.doc_id ASC
             ) AS rnk
      FROM cells q JOIN cells c
        ON q.pos = c.pos AND q.doc_id <> c.doc_id
      WHERE q.doc_id < 5
      GROUP BY q.doc_id, c.doc_id
    ) WHERE rnk <= 5
    """,
    category="text",
)
def text_hashed_nearest_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-free semantic search: top-5 nearest documents per query doc
    by cosine over the feature-hashed vectors — executed in the SPARSE
    inverted-index form: cells join on the DIMENSION (a 64-key posting
    list), partial products aggregate per pair, and since the vectors
    are pre-normalized the dot IS the cosine. No dense 64-wide arrays
    ever materialize and pairs sharing no dimension are never generated
    — the same posting-list shape a production sparse-retrieval engine
    (BM25/SPLADE) uses. The query side is 5 docs, so the dimension join
    broadcasts it. Ranking on the rounded score keeps the cut
    deterministic (both engines round the summed products identically
    because cells are engine-identical rounded values)."""
    from pyspark.sql import Window

    cells = _fh_cells(spark, sf_dir)
    q = cells.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"),
        F.col("pos").alias("pos"),
        F.col("val").alias("qval"),
    )
    pair = (
        cells.join(F.broadcast(q), "pos")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", F.col("doc_id").alias("neighbor_id"))
        .agg((F.round(F.sum(F.col("qval") * F.col("val")), 6) + F.lit(0.0)).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        pair.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("query_id", "neighbor_id", F.col("rnk").cast("int").alias("rank"), "cos")
    )


@query(
    "text_dedup_incremental_minhash",
    oracle=f"""
    WITH corpus AS (SELECT * FROM documents), {_minhash_bands_sql()},
    hist AS (
      SELECT bk, min(doc_id) AS bucket_min
      FROM bands WHERE doc_id % 7 <> 3 GROUP BY bk
    ),
    newb AS (SELECT bk, doc_id FROM bands WHERE doc_id % 7 = 3),
    hit AS (
      SELECT n.doc_id, min(h.bucket_min) AS dup_of
      FROM newb n JOIN hist h USING (bk)
      GROUP BY n.doc_id
    )
    SELECT d.doc_id,
           CAST(hit.dup_of IS NOT NULL AS INT) AS matched,
           coalesce(hit.dup_of, CAST(-1 AS BIGINT)) AS dup_of
    FROM (SELECT DISTINCT doc_id FROM newb) d
    LEFT JOIN hit USING (doc_id)
    """,
    category="text",
)
def text_dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL near-dup dedup against a PERSISTED index — the shape a
    rolling crawl actually runs: the historical corpus's MinHash/LSH band
    table (band_key, doc_id — 2 scalar columns however long the docs)
    is written ONCE as the index-at-rest; each new batch (doc_id % 7 = 3
    here) computes only ITS OWN signatures and equi-joins the stored
    buckets — no historical text is ever re-read or re-hashed, which is
    the whole point at 100 TB (re-signaturing a petabyte corpus per
    crawl is the naive alternative). A new doc sharing ANY band with
    history reports the minimum matching historical id. Same md5/
    permutation math as `text_dedup_near_minhash`, so the oracle replays
    the full index build + probe exactly."""
    import os as _os

    docs = load(spark, sf_dir, "documents")
    bands, r = 4, 4
    sig = dedup.minhash_signature(docs, "doc_id", "text", bands * r)
    band_keys = [
        F.md5(
            F.concat_ws("_", *[F.col(f"mh{b * r + j}") for j in range(r)])
        ).alias(f"bk{b}")
        for b in range(bands)
    ]
    keyed = sig.select("doc_id", *band_keys)
    exploded = keyed.select(
        "doc_id",
        F.explode(F.array(*[F.col(f"bk{b}") for b in range(bands)])).alias("bk"),
    )
    index = _cache_dir(sf_dir, "minhash_band_index2")
    if not _os.path.exists(_os.path.join(index, "_SUCCESS")):
        # the index stores the per-bucket MINIMUM, not raw postings: the
        # probe's aggregate (min over shared buckets) distributes over the
        # per-bucket min, so reduced state is lossless here — and it makes
        # the probe join 1:1 per bucket. With raw postings, degenerate
        # buckets (many near-identical docs) blow the join up quadratically
        # — measured 34.7x wall at 10x data before this reduction, 
        # linear after (BASELINE.md r6 third-wave row).
        (
            exploded.filter(F.col("doc_id") % 7 != 3)
            .groupBy("bk")
            .agg(F.min("doc_id").alias("bucket_min"))
            .write.mode("overwrite")
            .parquet(index)
        )
    newb = exploded.filter(F.col("doc_id") % 7 == 3)
    hist = spark.read.parquet(index)
    hit = (
        newb.join(hist, "bk")
        .groupBy("doc_id")
        .agg(F.min("bucket_min").alias("dup_of"))
    )
    return (
        newb.select("doc_id")
        .distinct()
        .join(hit, "doc_id", "left")
        .select(
            "doc_id",
            F.col("dup_of").isNotNull().cast("int").alias("matched"),
            F.coalesce("dup_of", F.lit(-1).cast("long")).alias("dup_of"),
        )
    )


@query(
    "text_dedup_scorecard",
    oracle=f"""
    WITH {_CORPUS_SQL}, {_minhash_bands_sql()},
    eh AS (
      SELECT doc_id,
             md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS hh
      FROM corpus
    ), exact_flags AS (
      SELECT doc_id,
             CAST(doc_id <> min(doc_id) OVER (PARTITION BY hh) AS INT)
               AS is_dup,
             min(doc_id) OVER (PARTITION BY hh) AS canon
      FROM eh
    ),
    bmin AS (SELECT bk, min(doc_id) AS bm FROM bands GROUP BY bk),
    mh_flags AS (
      SELECT b.doc_id, min(bm) AS canon,
             CAST(b.doc_id <> min(bm) AS INT) AS is_dup
      FROM bands b JOIN bmin USING (bk) GROUP BY b.doc_id
    )
    SELECT 'exact' AS method,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(is_dup) AS BIGINT) AS n_dups,
           CAST(count(DISTINCT canon) AS BIGINT) AS n_clusters,
           round(sum(is_dup) / CAST(count(*) AS DOUBLE), 6) + 0.0 AS dup_rate
    FROM exact_flags
    UNION ALL
    SELECT 'minhash_lsh',
           CAST(count(*) AS BIGINT),
           CAST(sum(is_dup) AS BIGINT),
           CAST(count(DISTINCT canon) AS BIGINT),
           round(sum(is_dup) / CAST(count(*) AS DOUBLE), 6) + 0.0
    FROM mh_flags
    """,
    category="text",
)
def text_dedup_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-method scorecard: exact-hash and MinHash/LSH run over the
    SAME corpus and report side-by-side (docs, dups flagged, clusters,
    dup rate) — the comparison table a data-curation run publishes
    before anyone picks thresholds, and the sanity invariant that
    near-dup ⊇ exact-dup (MinHash's rate must be ≥ exact's: identical
    texts share all bands). Both methods reduce to per-doc flags before
    the 2-row rollup, so the added cost over running either method alone
    is two tiny aggregates; full replay on the oracle side."""
    corpus = _corpus(spark, sf_dir)

    def summarize(flags: DataFrame, method: str) -> DataFrame:
        return flags.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("is_dup").cast("long").alias("n_dups"),
            F.countDistinct("canonical_id").cast("long").alias("n_clusters"),
            rnd(
                F.sum("is_dup") / F.count(F.lit(1)).cast("double"), 6
            ).alias("dup_rate"),
        ).select(F.lit(method).alias("method"), "n_docs", "n_dups", "n_clusters", "dup_rate")

    exact = summarize(dedup.exact_dedup(corpus, "doc_id", "text"), "exact")
    mh = summarize(dedup.minhash_lsh_dedup(corpus, "doc_id", "text"), "minhash_lsh")
    return exact.unionByName(mh)


@query(
    "text_collocations_pmi",
    # PMI = ln(n_ab·N / (n_a·n_b)); each ln crosses the nudged-8 bridge
    # before ranking (libm ulp drift), rank on the rounded score
    oracle="""
    WITH toks AS (
      SELECT doc_id, u.w AS word, u.pos FROM (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS w,
               unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
        FROM documents
      ) u
    ), bi AS (
      SELECT a.word AS w1, b.word AS w2, count(*) AS n_ab
      FROM toks a JOIN toks b
        ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      GROUP BY 1, 2 HAVING count(*) >= 5
    ), uni AS (
      SELECT word, count(*) AS n FROM toks GROUP BY word
    ), tot AS (
      SELECT CAST(sum(n) AS DOUBLE) AS t FROM uni
    ), scored AS (
      SELECT bi.w1, bi.w2, bi.n_ab,
             round(ln(bi.n_ab * tot.t / (ua.n * CAST(ub.n AS DOUBLE)))
                   + sign(ln(bi.n_ab * tot.t / (ua.n * CAST(ub.n AS DOUBLE))))
                     * 1e-9, 8) + 0.0 AS pmi
      FROM bi
      JOIN uni ua ON bi.w1 = ua.word
      JOIN uni ub ON bi.w2 = ub.word
      CROSS JOIN tot
    )
    SELECT w1, w2, CAST(n_ab AS BIGINT) AS n_ab, pmi
    FROM (
      SELECT *, row_number() OVER (ORDER BY pmi DESC, w1, w2) AS rk
      FROM scored
    ) WHERE rk <= 20
    """,
    category="text",
)
def text_collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by pointwise mutual information: adjacent word
    pairs occurring ≥5 times, scored ln(P(ab)/(P(a)P(b))) — the classic
    signal for multiword expressions ('new york'-style units) that
    tokenizer vocabularies and stop-phrase lists are built from. One
    positional self-join per doc builds bigrams (the `text_bigram_lm`
    shape), unigram counts join back by word, and the top-20 ranks the
    already count-thresholded pair frame on the nudge-rounded score —
    raw text is tokenized exactly once."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "word")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "word")
    a, b = toks.alias("a"), toks.alias("b")
    bi = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.pos") == F.col("a.pos") + 1),
        )
        .groupBy(F.col("a.word").alias("w1"), F.col("b.word").alias("w2"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 5)
    )
    uni = toks.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    tot = uni.agg(F.sum("n").cast("double").alias("t"))
    ua = uni.select(F.col("word").alias("w1"), F.col("n").alias("na"))
    ub = uni.select(F.col("word").alias("w2"), F.col("n").alias("nb"))
    ratio = F.col("n_ab") * F.col("t") / (F.col("na") * F.col("nb").cast("double"))
    pmi = F.round(F.log(ratio) + F.signum(F.log(ratio)) * F.lit(1e-9), 8) + F.lit(0.0)
    scored = (
        bi.join(F.broadcast(ua), "w1")
        .join(F.broadcast(ub), "w2")
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", "n_ab", pmi.alias("pmi"))
    )
    # top-20 via orderBy().limit() (TakeOrderedAndProject) — never a
    # single-partition row_number over the min-count-pruned bigram frame
    return (
        scored.orderBy(F.desc("pmi"), "w1", "w2")
        .limit(20)
        .select("w1", "w2", F.col("n_ab").cast("long").alias("n_ab"), "pmi")
    )


@query(
    "text_dedup_cluster_size_dist",
    oracle=f"""
    WITH {_CORPUS_SQL}, {_minhash_bands_sql()},
    bmin AS (SELECT bk, min(doc_id) AS bm FROM bands GROUP BY bk),
    canon AS (
      SELECT b.doc_id, min(bm) AS canonical_id
      FROM bands b JOIN bmin USING (bk) GROUP BY b.doc_id
    ), sizes AS (
      SELECT canonical_id, count(*) AS cluster_size
      FROM canon GROUP BY canonical_id
    )
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(cluster_size * count(*) AS BIGINT) AS n_docs,
           CAST((cluster_size - 1) * count(*) AS BIGINT) AS n_removable
    FROM sizes GROUP BY cluster_size
    """,
    category="text",
)
def text_dedup_cluster_size_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster SIZE distribution of the MinHash dedup — the
    histogram a curation run publishes before deleting anything: how
    many singletons, pairs, triples…, total docs per size class, and the
    removable count (size−1 per cluster) that forecasts the corpus
    shrinkage. Two tiny aggregates past the existing canonicalization;
    the size histogram also feeds capacity planning for the closure step
    (CC rounds scale with the largest cluster's diameter)."""
    out = dedup.minhash_lsh_dedup(_corpus(spark, sf_dir), "doc_id", "text")
    sizes = out.groupBy("canonical_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        (F.col("cluster_size") * F.count(F.lit(1))).cast("long").alias("n_docs"),
        ((F.col("cluster_size") - 1) * F.count(F.lit(1)))
        .cast("long")
        .alias("n_removable"),
    ).select(
        F.col("cluster_size").cast("long").alias("cluster_size"),
        "n_clusters",
        "n_docs",
        "n_removable",
    )


_BM25_QUERIES = [
    (0, "spark join stream"),
    (1, "window sort fast"),
    (2, "customer query zeppelin"),  # one out-of-vocabulary term
]
_BM25_K1, _BM25_B = 1.2, 0.75


@query(
    "text_bm25_search",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, t FROM (
        SELECT doc_id, unnest({D.tokens('text', D.DUCK)}) AS t FROM documents
      ) WHERE t <> ''
    ), dl AS (
      SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
    ), tf AS (
      SELECT doc_id, t, count(*) AS tf FROM toks GROUP BY doc_id, t
    ), stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
      FROM dl
    ), df AS (
      SELECT t, count(*) AS df FROM tf GROUP BY t
    ), qt AS (
      SELECT qid, unnest(string_split(terms, ' ')) AS t
      FROM (VALUES {', '.join(f"({qid}, '{terms}')" for qid, terms in [(0, 'spark join stream'), (1, 'window sort fast'), (2, 'customer query zeppelin')])}) v(qid, terms)
    ), ts AS (
      SELECT q.qid, f.doc_id, q.t,
             ln(1.0 + (CAST(s.n - d.df AS DOUBLE) + 0.5) / (CAST(d.df AS DOUBLE) + 0.5))
             * (CAST(f.tf AS DOUBLE) * ({_BM25_K1} + 1.0))
             / (CAST(f.tf AS DOUBLE) + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B}
                * (CAST(l.dl AS DOUBLE) / s.avgdl))) AS ts
      FROM qt q
      JOIN tf f ON f.t = q.t
      JOIN dl l ON l.doc_id = f.doc_id
      JOIN df d ON d.t = q.t
      CROSS JOIN stats s
    ), scored AS (
      SELECT qid, doc_id,
             round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(ts ORDER BY t)), (acc, x) -> acc + x), 6) + 0.0 AS score
      FROM ts GROUP BY qid, doc_id
    )
    SELECT CAST(qid AS BIGINT) AS query_id, doc_id, score,
           CAST(rnk AS INT) AS rank
    FROM (
      SELECT qid, doc_id, score,
             row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC) AS rnk
      FROM scored
    ) WHERE rnk <= 10
    """,
    category="text",
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 ranked retrieval (Robertson & Zaragoza 2009; Lucene's
    non-negative idf variant) — the lexical-search complement to the
    hashed-cosine `text_hashed_nearest_docs`: three fixed term queries
    (one with an out-of-vocabulary term, which must simply contribute
    nothing) score against the corpus through the inverted-index shape —
    the query terms prune the posting lists at the join, docs sharing no
    query term are never touched, and the per-(query, doc) score is an
    ascending-term left fold so the double summation is engine-exact.
    Corpus statistics (tf, df, dl, N, avgdl) are exact integer aggregates;
    ranking on the rounded score keeps the top-10 cut deterministic.
    At 100 TB: posting lists shuffle as (term, doc, tf) scalars, the
    query side is a literal frame, df/stats are broadcast — the standard
    sparse-retrieval plan."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.expr(D.tokens("text", D.SPARK))).alias("t")
    ).filter(F.col("t") != "")
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    tf = toks.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("tf"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    df = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    qt = spark.createDataFrame(
        [(qid, t) for qid, terms in _BM25_QUERIES for t in terms.split()],
        "qid long, t string",
    )
    k1, b = _BM25_K1, _BM25_B
    ts = (
        tf.join(F.broadcast(qt), "t")
        .join(dl, "doc_id")
        .join(F.broadcast(df), "t")
        .crossJoin(F.broadcast(stats))
        .select(
            "qid",
            "doc_id",
            "t",
            (
                F.log(
                    1.0
                    + ((F.col("n") - F.col("df")).cast("double") + 0.5)
                    / (F.col("df").cast("double") + 0.5)
                )
                * (F.col("tf").cast("double") * F.lit(k1 + 1.0))
                / (
                    F.col("tf").cast("double")
                    + F.lit(k1)
                    * (
                        F.lit(1.0)
                        - F.lit(b)
                        + F.lit(b) * (F.col("dl").cast("double") / F.col("avgdl"))
                    )
                )
            ).alias("ts"),
        )
    )
    scored = ts.groupBy("qid", "doc_id").agg(
        (
            F.round(
                F.expr(
                    "aggregate(transform(array_sort(collect_list(struct(t, ts))), "
                    "s -> s.ts), cast(0.0 as double), (acc, x) -> acc + x)"
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("score")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select(
            F.col("qid").cast("long").alias("query_id"),
            "doc_id",
            "score",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def _agreement_oracle() -> str:
    from etl_aws_spark.suite.q_similarity import _duck_bucket, _duck_cos, _duck_plane_cte

    return f"""
    WITH common AS (
      SELECT doc_id FROM (
        SELECT d.doc_id,
               row_number() OVER (
                 ORDER BY ('0x' || substr(md5('agree:' || CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT,
                          d.doc_id) AS hrn
        FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
      ) WHERE hrn <= 2000
    ),
    corpus AS (
      SELECT doc_id, text FROM documents
      WHERE doc_id IN (SELECT doc_id FROM common)
    ),
    {_minhash_bands_sql()},
    bands_c AS (
      SELECT doc_id, bk FROM (
        SELECT doc_id, bk, count(*) OVER (PARTITION BY bk) AS _bn FROM bands
      ) WHERE _bn <= 50
    ),
    lex AS (
      SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
      FROM bands_c a JOIN bands_c b USING (bk) WHERE a.doc_id < b.doc_id
    ),
    {_duck_plane_cte(6)},
    vc AS (
      SELECT vec_id, embedding, {_duck_bucket('embedding', 6)} AS bucket
      FROM embeddings CROSS JOIN pls
      WHERE vec_id IN (SELECT doc_id FROM common)
    ),
    sem AS (
      SELECT a.vec_id AS src, b.vec_id AS dst
      FROM vc a JOIN vc b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      WHERE round({_duck_cos('a.embedding', 'b.embedding')}, 6) + 0.0 >= 0.9
    ),
    onlyboth AS (SELECT src, dst FROM lex INTERSECT SELECT src, dst FROM sem),
    k AS (
      SELECT (SELECT count(*) FROM common) AS n_docs,
             (SELECT count(*) FROM lex) AS n_lex,
             (SELECT count(*) FROM sem) AS n_sem,
             (SELECT count(*) FROM onlyboth) AS n_both
    )
    SELECT CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_lex AS BIGINT) AS n_lex_pairs,
           CAST(n_sem AS BIGINT) AS n_sem_pairs,
           CAST(n_both AS BIGINT) AS n_agree,
           CAST(n_lex - n_both AS BIGINT) AS n_lex_only,
           CAST(n_sem - n_both AS BIGINT) AS n_sem_only,
           round(CAST(n_both AS DOUBLE)
                 / nullif(n_lex + n_sem - n_both, 0), 6) + 0.0
             AS pair_set_jaccard
    FROM k
    """


@query(
    "text_dedup_semantic_agreement",
    oracle=_agreement_oracle(),
    category="text",
)
def text_dedup_semantic_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modality dedup agreement audit: do LEXICAL near-dup candidates
    (MinHash/LSH band collisions over text, `text_dedup_near_minhash`'s
    edge set) and SEMANTIC near-dup pairs (embedding cosine ≥ 0.9 in LSH
    buckets, `embedding_cosine_dedup_lsh`) flag the same pairs? Lexical
    dedup misses paraphrases, semantic dedup misses boilerplate-with-
    different-topics — the pair-set Jaccard and the two one-sided counts
    quantify exactly that complementarity, which is why production
    pipelines run BOTH passes (doc/vec alignment: the fixture's shared id
    domain, enforced by a semi-join on both sides, capped at a FIXED
    2000-id salted-hash audit budget — agreement is a sampling question,
    and the uncapped semantic pair side is bucket-quadratic on a clustered
    corpus: measured 14.8x wall at 10x data before the budget).

    Shape: each side is its own bucketed pair plan (Σ|bucket|², never N²);
    the audit itself joins two pair lists on their composite key and folds
    to one row. Set algebra over candidate sets — the same posture as
    `text_dedup_scorecard`, one modality further."""
    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    h = "cast(conv(substr(md5(concat('agree:', cast(doc_id as string))), 1, 15), 16, 10) as bigint)"
    # 2000 smallest salted hashes via orderBy().limit() — mergeable
    # per-partition top-k, never a global single-partition row_number
    common = (
        docs.join(emb.select(F.col("vec_id").alias("doc_id")), "doc_id", "left_semi")
        .orderBy(F.expr(h).asc(), F.col("doc_id"))
        .limit(2000)
    )
    lex = dedup.minhash_band_edges(common, "doc_id", "text", max_bucket=50)
    from etl_aws_spark.similarity import knn

    vecs = emb.join(
        common.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    sem = knn.cosine_dedup_pairs(
        vecs, "vec_id", "embedding", 64, block_col=None, threshold=0.9, n_planes=6
    ).select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    both = lex.join(sem, ["src", "dst"])
    k = (
        common.agg(F.count(F.lit(1)).alias("n_docs"))
        .crossJoin(F.broadcast(lex.agg(F.count(F.lit(1)).alias("n_lex"))))
        .crossJoin(F.broadcast(sem.agg(F.count(F.lit(1)).alias("n_sem"))))
        .crossJoin(F.broadcast(both.agg(F.count(F.lit(1)).alias("n_both"))))
    )
    return k.select(
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_lex").cast("long").alias("n_lex_pairs"),
        F.col("n_sem").cast("long").alias("n_sem_pairs"),
        F.col("n_both").cast("long").alias("n_agree"),
        (F.col("n_lex") - F.col("n_both")).cast("long").alias("n_lex_only"),
        (F.col("n_sem") - F.col("n_both")).cast("long").alias("n_sem_only"),
        rnd(
            F.col("n_both").cast("double")
            / F.nullif(
                (F.col("n_lex") + F.col("n_sem") - F.col("n_both")).cast("double"),
                F.lit(0.0),
            ),
            6,
        ).alias("pair_set_jaccard"),
    )


@query(
    "text_vocab_growth_heaps",
    # first-occurrence attribution: a token's vocab contribution lands on
    # the min doc_id containing it; cumulative windows then give V(n) and
    # N(n) per doc prefix without any prefix re-scan. The Heaps fit
    # ln V = ln k + β ln N is OLS over |docs| exact integer points.
    oracle=f"""
    WITH occ AS (
      SELECT doc_id, t FROM (
        SELECT doc_id, unnest({D.tokens('text', D.DUCK)}) AS t FROM documents
      ) WHERE t <> ''
    ), per_doc AS (
      SELECT doc_id, count(*) AS n_tok FROM occ GROUP BY doc_id
    ), firsts AS (
      SELECT min(doc_id) AS doc_id, count(*) AS n_new FROM (
        SELECT t, min(doc_id) AS doc_id FROM occ GROUP BY t
      ) GROUP BY doc_id
    ), curve AS (
      SELECT p.doc_id,
             sum(p.n_tok) OVER (ORDER BY p.doc_id) AS cum_tokens,
             sum(coalesce(f.n_new, 0)) OVER (ORDER BY p.doc_id) AS cum_vocab
      FROM per_doc p LEFT JOIN firsts f ON f.doc_id = p.doc_id
    ), pts AS (
      SELECT ln(CAST(cum_tokens AS DOUBLE)) AS x,
             ln(CAST(cum_vocab AS DOUBLE)) AS y
      FROM curve
    ), mom AS (
      SELECT count(*) AS n_pts, avg(x) AS mx, avg(y) AS my,
             avg(x * y) AS mxy, avg(x * x) AS mxx, avg(y * y) AS myy
      FROM pts
    ), fit AS (
      SELECT n_pts,
             (mxy - mx * my) / (mxx - mx * mx) AS beta,
             exp(my - (mxy - mx * my) / (mxx - mx * mx) * mx) AS k,
             (mxy - mx * my) * (mxy - mx * my)
               / ((mxx - mx * mx) * (myy - my * my)) AS r2
      FROM mom
    ), tot AS (
      SELECT max(cum_tokens) AS total_tokens, max(cum_vocab) AS total_vocab
      FROM curve
    )
    SELECT CAST(tot.total_tokens AS BIGINT) AS total_tokens,
           CAST(tot.total_vocab AS BIGINT) AS total_vocab,
           CAST(fit.n_pts AS BIGINT) AS n_curve_points,
           round(fit.beta, 4) + 0.0 AS heaps_beta,
           round(fit.k, 4) + 0.0 AS heaps_k,
           round(fit.r2, 6) + 0.0 AS r_squared
    FROM fit CROSS JOIN tot
    """,
    category="text",
)
def text_vocab_growth_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth audit: the corpus's V(N) curve (distinct tokens
    vs tokens scanned, in doc order) fitted to Heaps' law V = k·N^β — the
    number that sizes a tokenizer vocabulary and predicts how much new
    text keeps paying (natural corpora: β ≈ 0.4–0.6; the fixture's closed
    40-word vocabulary must show β ≈ 0 past saturation, which is exactly
    what the audit should report for synthetic data). Companion to
    `text_zipf_rank_frequency` — Zipf and Heaps are the two sides of the
    same corpus statistic.

    Shape: NO prefix re-scan — each token's novelty lands on its
    first-occurrence doc (one min aggregate); the two running counts come
    from the bucketed two-phase cumsum (`_util.bucketed_cumsum`):
    per-id-block subtotals cumulate in the only unpartitioned window
    (|docs|/65536 rows), within-block counts cumulate partitioned by
    block — exact integers, identical to a global window, with no
    single-partition pass over |docs|; the fit is closed-form moments."""
    from etl_aws_spark.suite._util import bucketed_cumsum

    docs = load(spark, sf_dir, "documents")
    occ = docs.select(
        "doc_id", F.explode(F.expr(D.tokens("text", D.SPARK))).alias("t")
    ).filter(F.col("t") != "")
    per_doc = occ.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    firsts = (
        occ.groupBy("t")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    joined = per_doc.join(firsts, "doc_id", "left").select(
        "doc_id", "n_tok", F.coalesce("n_new", F.lit(0)).alias("n_new")
    )
    curve = bucketed_cumsum(
        joined,
        "doc_id",
        ["n_tok", "n_new"],
        F.expr("doc_id div 65536"),
        out_cols=["cum_tokens", "cum_vocab"],
    ).select("doc_id", "cum_tokens", "cum_vocab")
    pts = curve.select(
        F.log(F.col("cum_tokens").cast("double")).alias("x"),
        F.log(F.col("cum_vocab").cast("double")).alias("y"),
    )
    mom = pts.agg(
        F.count(F.lit(1)).alias("n_pts"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.avg(F.col("x") * F.col("y")).alias("mxy"),
        F.avg(F.col("x") * F.col("x")).alias("mxx"),
        F.avg(F.col("y") * F.col("y")).alias("myy"),
    )
    slope = (F.col("mxy") - F.col("mx") * F.col("my")) / (
        F.col("mxx") - F.col("mx") * F.col("mx")
    )
    fit = mom.select(
        "n_pts",
        slope.alias("beta"),
        F.exp(F.col("my") - slope * F.col("mx")).alias("k"),
        (
            (F.col("mxy") - F.col("mx") * F.col("my"))
            * (F.col("mxy") - F.col("mx") * F.col("my"))
            / (
                (F.col("mxx") - F.col("mx") * F.col("mx"))
                * (F.col("myy") - F.col("my") * F.col("my"))
            )
        ).alias("r2"),
    )
    tot = curve.agg(
        F.max("cum_tokens").alias("total_tokens"),
        F.max("cum_vocab").alias("total_vocab"),
    )
    return fit.crossJoin(F.broadcast(tot)).select(
        F.col("total_tokens").cast("long").alias("total_tokens"),
        F.col("total_vocab").cast("long").alias("total_vocab"),
        F.col("n_pts").cast("long").alias("n_curve_points"),
        rnd(F.col("beta"), 4).alias("heaps_beta"),
        rnd(F.col("k"), 4).alias("heaps_k"),
        rnd(F.col("r2"), 6).alias("r_squared"),
    )


def _fertility_oracle() -> str:
    from etl_aws_spark.text import bpe

    return f"""
    WITH per_doc AS (
      SELECT source, n_chars,
             {bpe.doc_token_count_sql('text', bpe.DUCK)} AS n_bpe,
             len(list_filter({D.tokens('text', D.DUCK)}, x -> x <> '')) AS n_words
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(sum(n_bpe) AS BIGINT) AS sum_bpe_tokens,
           round(CAST(sum(n_chars) AS DOUBLE) / sum(n_bpe), 4) + 0.0
             AS chars_per_token,
           round(CAST(sum(n_bpe) AS DOUBLE) / sum(n_words), 4) + 0.0
             AS fertility
    FROM per_doc GROUP BY source
    """


@query("tokenizer_fertility_by_source", oracle=_fertility_oracle(), category="text")
def tokenizer_fertility_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit per source: BPE tokens per word and chars
    per BPE token — the compression numbers that decide whether a tokenizer
    fits a domain (fertility ≫ 1 on a source means its text fragments into
    many subwords: wasted context window and skewed per-domain token
    budgets; the multilingual-tokenizer fairness metric). Reads straight
    into `curation_token_budget_bpe` (budgets) and
    `curation_mix_temperature_sampling` (mix shares move when measured in
    tokens, not chars).

    Shape: the BPE apply is the codegen-resident replace chain of
    `text_token_count_bpe` — no shuffle, no Python — and the rollup is one
    |sources|-row aggregate; integer-exact until the two final ratios."""
    from etl_aws_spark.text import bpe as _bpe

    docs = load(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source",
        "n_chars",
        F.expr(_bpe.doc_token_count_sql("text", _bpe.SPARK)).alias("n_bpe"),
        F.size(
            F.filter(
                F.expr(D.tokens("text", D.SPARK)), lambda x: x != F.lit("")
            )
        ).alias("n_words"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.sum("n_bpe").cast("long").alias("sum_bpe_tokens"),
        rnd(F.sum("n_chars").cast("double") / F.sum("n_bpe"), 4).alias(
            "chars_per_token"
        ),
        rnd(F.sum("n_bpe").cast("double") / F.sum("n_words"), 4).alias("fertility"),
    )


# (bands, rows-per-band, S-curve crossover (1/b)^(1/r)) for the 16-hash
# family — crossovers precomputed so no runtime pow()
_LSH_SWEEP_CFGS = [
    (2, 8, 0.9170040432046712),
    (4, 4, 0.7071067811865476),
    (8, 2, 0.3535533905932738),
]


def _lsh_band_sweep_oracle() -> str:
    parts = []
    for b, r, s_star in _LSH_SWEEP_CFGS:
        band_selects = "\n        UNION ALL\n        ".join(
            "SELECT doc_id, md5(concat_ws('_', "
            + ", ".join(f"mh{i * r + j}" for j in range(r))
            + ")) AS bk FROM sig"
            for i in range(b)
        )
        parts.append(f"""
    bands_{b} AS ({band_selects}),
    bc_{b} AS (
      SELECT doc_id, bk FROM (
        SELECT doc_id, bk, count(*) OVER (PARTITION BY bk) AS _bn FROM bands_{b}
      ) WHERE _bn <= 50
    ),
    pairs_{b} AS (
      SELECT DISTINCT a.doc_id AS src, b2.doc_id AS dst
      FROM bc_{b} a JOIN bc_{b} b2 USING (bk) WHERE a.doc_id < b2.doc_id
    ),
    row_{b} AS (
      SELECT {b} AS bands, {r} AS rows_per_band,
             CAST({s_star!r} AS DOUBLE) AS s_crossover,
             (SELECT count(*) FROM pairs_{b}) AS n_candidate_pairs,
             (SELECT count(*) FROM (
                SELECT src AS id FROM pairs_{b}
                UNION SELECT dst AS id FROM pairs_{b})) AS n_docs_in_pairs
    )""")
    union = "\n      UNION ALL ".join(f"SELECT * FROM row_{b}" for b, _, _ in _LSH_SWEEP_CFGS)
    return (
        f"WITH {_CORPUS_SQL}, {_minhash_bands_sql()},{','.join(parts)}\n"
        f"    SELECT CAST(bands AS INT) AS bands,\n"
        f"           CAST(rows_per_band AS INT) AS rows_per_band,\n"
        f"           round(s_crossover, 4) + 0.0 AS s_crossover,\n"
        f"           CAST(n_candidate_pairs AS BIGINT) AS n_candidate_pairs,\n"
        f"           CAST(n_docs_in_pairs AS BIGINT) AS n_docs_in_pairs\n"
        f"    FROM ({union})"
    )


@query(
    "text_dedup_lsh_band_sweep",
    oracle=_lsh_band_sweep_oracle(),
    category="text",
)
def text_dedup_lsh_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH band-parameter tuning table: the same 16-hash MinHash family
    sliced as 2×8 / 4×4 / 8×2 bands, reporting each configuration's
    theoretical S-curve crossover (1/b)^(1/r) — the Jaccard where
    candidate probability hits 50% — beside its MEASURED candidate-pair
    and flagged-doc counts on this corpus (bucket cap 50, the house
    guard). This is the design table behind every banded dedup here:
    8×2 recalls weak similarity but floods candidates, 2×8 is surgical —
    the sweep quantifies that tradeoff on real data instead of folklore
    (Leskovec/Rajaraman/Ullman ch. 3 theory, measured).

    Shape (r9): the expensive shingle→minhash lineage runs ONCE — the
    16-hash signature frame (id + 16 ints, ~136 B/row) is
    localCheckpointed and every band configuration slices it
    (dedup.band_edges_from_signature), so three configs cost one corpus
    tokenization + three bounded capped Σ|bucket|² pair stages instead
    of three full signature derivations."""
    corpus = _corpus(spark, sf_dir)
    sig = dedup.minhash_signature(
        corpus, "doc_id", "text", num_hashes=16
    ).localCheckpoint(eager=True)
    rows = []
    for b, r, s_star in _LSH_SWEEP_CFGS:
        pairs = dedup.band_edges_from_signature(
            sig, "doc_id", num_hashes=16, bands=b, max_bucket=50
        )
        n_pairs = pairs.agg(F.count(F.lit(1)).alias("n"))
        n_docs = (
            pairs.select(F.col("src").alias("id"))
            .unionByName(pairs.select(F.col("dst").alias("id")))
            .distinct()
            .agg(F.count(F.lit(1)).alias("d"))
        )
        rows.append(
            n_pairs.crossJoin(F.broadcast(n_docs)).select(
                F.lit(b).cast("int").alias("bands"),
                F.lit(r).cast("int").alias("rows_per_band"),
                rnd(F.lit(s_star), 4).alias("s_crossover"),
                F.col("n").cast("long").alias("n_candidate_pairs"),
                F.col("d").cast("long").alias("n_docs_in_pairs"),
            )
        )
    out = rows[0]
    for fr in rows[1:]:
        out = out.unionByName(fr)
    return out


@query(
    "text_readability_flesch",
    # per-source readability from EXACT integer totals (words, sentences,
    # syllable groups) — ratios computed once per source row, never
    # averaged over per-doc doubles, so no summation-order jitter exists.
    oracle="""
    WITH per AS (
      SELECT source,
             len(list_filter(string_split(text, ' '), x -> x <> ''))
               AS n_words,
             greatest(1, len(regexp_extract_all(text, '[.!?]+')))
               AS n_sentences,
             len(regexp_extract_all(lower(text), '[aeiouy]+'))
               AS n_syllables
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS sum_words,
           CAST(sum(n_sentences) AS BIGINT) AS sum_sentences,
           CAST(sum(n_syllables) AS BIGINT) AS sum_syllables,
           round(206.835
                 - 1.015 * (CAST(sum(n_words) AS DOUBLE) / sum(n_sentences))
                 - 84.6 * (CAST(sum(n_syllables) AS DOUBLE) / sum(n_words)),
                 4) + 0.0 AS flesch_ease,
           round(0.39 * (CAST(sum(n_words) AS DOUBLE) / sum(n_sentences))
                 + 11.8 * (CAST(sum(n_syllables) AS DOUBLE) / sum(n_words))
                 - 15.59, 4) + 0.0 AS fk_grade
    FROM per GROUP BY source
    """,
    category="text",
)
def text_readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease and Flesch–Kincaid grade per source — the
    classic readability gate a curation pipeline runs beside the Gopher
    rules (a source whose grade drifts is template/spam churn; extreme
    ease/difficulty flags boilerplate or OCR noise). Syllables are
    approximated as maximal vowel groups (the standard public heuristic);
    sentences as terminal-punctuation runs with a floor of 1.

    Scale shape: one scan computes three INTEGER counts per doc (regex
    count + split — codegen, no UDF); the rollup is a |sources|-row
    aggregate and both scores derive from the per-source integer TOTALS
    (exact, order-free) rather than averaging per-doc floats — the same
    totals-not-means determinism rule as `tokenizer_fertility_by_source`."""
    docs = load(spark, sf_dir, "documents")
    per = docs.select(
        "source",
        F.size(
            F.filter(F.split("text", " "), lambda x: x != F.lit(""))
        ).alias("n_words"),
        F.greatest(
            F.lit(1), F.size(F.expr("regexp_extract_all(text, '[.!?]+', 0)"))
        ).alias("n_sentences"),
        F.size(
            F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)")
        ).alias("n_syllables"),
    )
    w = F.sum("n_words").cast("double")
    s = F.sum("n_sentences").cast("double")
    y = F.sum("n_syllables").cast("double")
    return per.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("sum_words"),
        F.sum("n_sentences").cast("long").alias("sum_sentences"),
        F.sum("n_syllables").cast("long").alias("sum_syllables"),
        rnd(F.lit(206.835) - F.lit(1.015) * (w / s) - F.lit(84.6) * (y / w), 4).alias(
            "flesch_ease"
        ),
        rnd(
            F.lit(0.39) * (w / s) + F.lit(11.8) * (y / w) - F.lit(15.59), 4
        ).alias("fk_grade"),
    )


@query(
    "text_dedup_boundary_overlap",
    # shard-boundary overlap: doc A's 64-char TAIL hash equals doc B's
    # 64-char HEAD hash — the signature of one crawl document split (or
    # re-concatenated) across shard boundaries, which whole-doc and
    # shingle dedup both under-weight. Inverted-index join on 32 B
    # digests with the house frequency cap.
    oracle="""
    WITH aug AS (
      SELECT doc_id, text, n_chars FROM documents
      UNION ALL
      -- planted positives (r11 audit): the synthetic corpus has no
      -- boundary-split doc pairs, so the join only ever verified
      -- empty-vs-empty. Every doc with doc_id % 101 = 0 plants a
      -- "continuation shard" whose HEAD is the donor's 64-char TAIL —
      -- derived by the identical expression in both engines.
      SELECT doc_id + 100000000 AS doc_id,
             substring(text, n_chars - 63, 64)
               || substring(text, 1, 40) AS text,
             CAST(104 AS BIGINT) AS n_chars
      FROM documents WHERE n_chars >= 128 AND doc_id % 101 = 0
    ), base AS (
      SELECT doc_id, n_chars,
             md5(substring(text, 1, 64)) AS head_h,
             md5(substring(text, n_chars - 63, 64)) AS tail_h
      FROM aug WHERE n_chars >= 64
    ), heads AS (
      SELECT head_h AS h, doc_id FROM base
      QUALIFY count(*) OVER (PARTITION BY head_h) <= 50
    ), tails AS (
      SELECT tail_h AS h, doc_id FROM base
      QUALIFY count(*) OVER (PARTITION BY tail_h) <= 50
    )
    SELECT t.doc_id AS src, h2.doc_id AS dst, t.h AS overlap_hash
    FROM tails t JOIN heads h2 USING (h)
    WHERE t.doc_id <> h2.doc_id
    """,
    category="text",
)
def text_dedup_boundary_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boundary-overlap detection: pairs where one document's last 64
    characters hash-match another's first 64 — the split/concatenation
    artifact of sharded crawls (WARC re-assembly, pagination stitching)
    that whole-document hashing misses entirely and shingle Jaccard
    under-scores when the docs are long. The production fix-up pass runs
    this before span dedup so stitched halves rejoin.

    Scale shape: the corpus shuffles only (digest, id) pairs — 32 B
    regardless of document size (the `text_dedup_exact` narrow-payload
    law); both sides drop digests shared by >50 docs before the join
    (the house Σ|bucket|² cap — a hot boundary hash is boilerplate, not
    a split), so the join output is bounded per bucket."""
    from pyspark.sql import Window

    src = load(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    # planted continuation shards (r11 audit — see the oracle's `aug`
    # CTE): head = donor's 64-char tail, so the tails⋈heads join has
    # guaranteed, engine-identical positives at every SF.
    planted = src.filter(
        (F.col("n_chars") >= 128) & (F.col("doc_id") % 101 == 0)
    ).select(
        (F.col("doc_id") + F.lit(100000000)).alias("doc_id"),
        F.expr(
            "concat(substring(text, n_chars - 63, 64), substring(text, 1, 40))"
        ).alias("text"),
        F.lit(104).cast("long").alias("n_chars"),
    )
    docs = src.unionByName(planted).filter(F.col("n_chars") >= 64)
    base = docs.select(
        "doc_id",
        F.md5(F.substring("text", 1, 64)).alias("head_h"),
        F.md5(F.expr("substring(text, n_chars - 63, 64)")).alias("tail_h"),
    )
    wh = Window.partitionBy("head_h")
    wt = Window.partitionBy("tail_h")
    heads = (
        base.withColumn("_c", F.count(F.lit(1)).over(wh))
        .filter(F.col("_c") <= 50)
        .select(F.col("head_h").alias("h"), F.col("doc_id").alias("dst"))
    )
    tails = (
        base.withColumn("_c", F.count(F.lit(1)).over(wt))
        .filter(F.col("_c") <= 50)
        .select(F.col("tail_h").alias("h"), F.col("doc_id").alias("src"))
    )
    return (
        tails.join(heads, "h")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst", F.col("h").alias("overlap_hash"))
    )


@query(
    "curation_soft_dedup_weights",
    # soft dedup: instead of deleting duplicates, weight every doc by
    # 1/cluster_size so each near-dup CLUSTER contributes one effective
    # document to the training mix — the repetition-control alternative
    # to hard removal. Weights are exact rationals reported at 6 digits;
    # per-source effective size is the sum of those rationals computed
    # as one double expression from integer counts (order-free because
    # each cluster contributes size·(1/size) through a two-level exact
    # aggregate).
    oracle=f"""
    WITH {_CORPUS_SQL}, {_minhash_bands_sql()},
    bmin AS (SELECT bk, min(doc_id) AS bm FROM bands GROUP BY bk),
    canon AS (
      SELECT b.doc_id, min(bm) AS canonical_id
      FROM bands b JOIN bmin USING (bk) GROUP BY b.doc_id
    ), sizes AS (
      SELECT canonical_id, count(*) AS cs FROM canon GROUP BY canonical_id
    ), per_doc AS (
      SELECT c.doc_id, corpus.source, s.cs
      FROM canon c JOIN sizes s USING (canonical_id)
      JOIN corpus ON corpus.doc_id = c.doc_id
    ), per_cluster_source AS (
      SELECT source, cs, count(*) AS n_in
      FROM per_doc GROUP BY source, cs
    )
    SELECT source,
           CAST(sum(n_in) AS BIGINT) AS n_docs,
           round(sum(CAST(n_in AS DOUBLE) / cs), 6) + 0.0 AS effective_docs,
           round(sum(CAST(n_in AS DOUBLE) / cs) / sum(n_in), 6) + 0.0
             AS effective_ratio
    FROM per_cluster_source GROUP BY source
    """,
    category="text",
)
def curation_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOFT deduplication weights: every document in a MinHash near-dup
    cluster gets sampling weight 1/cluster_size, so the cluster as a
    whole contributes exactly one effective document to the pretraining
    mix — the repetition-control alternative to hard removal (keeps
    coverage, kills over-representation). Reported per source: raw docs,
    effective docs (Σ 1/size), and the effective ratio — the number a
    mix designer compares against `curation_mix_temperature_sampling`
    shares to see which sources are secretly duplicate-inflated.

    Scale shape: rides the existing canonicalization (banded LSH +
    per-doc min — digest-only shuffles), then ONE (source, cluster_size)
    aggregate; the weight sum folds size·(1/size) from exact integer
    counts, so no per-doc float summation order exists. Summing weights
    per (source, size) cell — not per doc — is what makes the double
    arithmetic deterministic."""
    out = dedup.minhash_lsh_dedup(_corpus(spark, sf_dir), "doc_id", "text")
    sizes = out.groupBy("canonical_id").agg(F.count(F.lit(1)).alias("cs"))
    corpus = _corpus(spark, sf_dir).select("doc_id", "source")
    per_doc = (
        out.select("doc_id", "canonical_id")
        .join(sizes, "canonical_id")
        .join(corpus, "doc_id")
    )
    cells = per_doc.groupBy("source", "cs").agg(F.count(F.lit(1)).alias("n_in"))
    return cells.groupBy("source").agg(
        F.sum("n_in").cast("long").alias("n_docs"),
        rnd(F.sum(F.col("n_in").cast("double") / F.col("cs")), 6).alias(
            "effective_docs"
        ),
        rnd(
            F.sum(F.col("n_in").cast("double") / F.col("cs"))
            / F.sum("n_in"),
            6,
        ).alias("effective_ratio"),
    )


@query(
    "tokenizer_fragmentation_oov",
    # vocabulary-coverage audit: the share of BPE output tokens that are
    # UNMERGED single characters — the fragmentation/OOV signal that
    # tells a tokenizer team which sources the merge table fails on.
    # Integer counts fold per doc, ratios derive from per-source totals.
    oracle=f"""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum({bpe_mod.doc_token_count_sql('text', bpe_mod.DUCK)}) AS BIGINT)
             AS sum_tokens,
           CAST(sum({bpe_mod.doc_single_count_sql('text', bpe_mod.DUCK)}) AS BIGINT)
             AS sum_single_char,
           round(CAST(sum({bpe_mod.doc_single_count_sql('text', bpe_mod.DUCK)})
                      AS DOUBLE)
                 / sum({bpe_mod.doc_token_count_sql('text', bpe_mod.DUCK)}), 6)
             + 0.0 AS fragmentation_ratio
    FROM documents GROUP BY source
    """,
    category="text",
)
def tokenizer_fragmentation_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FRAGMENTATION / OOV audit per source: the share of BPE
    output tokens that are unmerged single characters after the full
    merge chain — `tokenizer_fertility_by_source` says how many tokens a
    source costs, this says how many of them are the vocabulary FAILING
    (a rising single-char share on a new source = retrain the merges or
    add coverage; the multilingual-tokenizer fairness metric's second
    axis).

    Scale shape: both counts are codegen-resident replace-chain
    expressions folded per document (no shuffle, no Python — the
    `text_token_count_bpe` posture); the rollup is a |sources|-row
    aggregate and the ratio derives from exact integer TOTALS."""
    docs = load(spark, sf_dir, "documents")
    per = docs.select(
        "source",
        F.expr(bpe_mod.doc_token_count_sql("text", bpe_mod.SPARK)).alias("n_tok"),
        F.expr(bpe_mod.doc_single_count_sql("text", bpe_mod.SPARK)).alias("n_single"),
    )
    return per.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("sum_tokens"),
        F.sum("n_single").cast("long").alias("sum_single_char"),
        rnd(
            F.sum("n_single").cast("double") / F.sum("n_tok"), 6
        ).alias("fragmentation_ratio"),
    )


@query(
    "text_cross_source_ngram_overlap",
    # cross-source redundancy matrix: for every ordered source pair,
    # |shingles(A) ∩ shingles(B)| / |shingles(A)| over DISTINCT 3-gram
    # hashes — the mix-design signal that says which sources are copies
    # of which (asymmetric: a small feed inside a big crawl scores high
    # A→B, low B→A). Set algebra on distinct 60-bit hashes; exact counts.
    oracle=f"""
    WITH sh AS (
      SELECT DISTINCT source, h FROM (
        SELECT source, unnest({D.shingle_hashes('text', 3, D.DUCK)}) AS h
        FROM documents
      )
    ), sizes AS (
      SELECT source, count(*) AS n_shingles FROM sh GROUP BY source
    ), inter AS (
      SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.h = b.h AND a.source <> b.source
      GROUP BY a.source, b.source
    )
    SELECT i.src_a, i.src_b,
           CAST(sa.n_shingles AS BIGINT) AS n_shingles_a,
           CAST(i.n_common AS BIGINT) AS n_common,
           round(CAST(i.n_common AS DOUBLE) / sa.n_shingles, 6) + 0.0
             AS overlap_of_a
    FROM inter i JOIN sizes sa ON i.src_a = sa.source
    """,
    category="text",
)
def text_cross_source_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source n-gram REDUNDANCY matrix: for every ordered source
    pair, the fraction of A's distinct 3-gram shingles that also appear
    in B — the asymmetric containment that exposes one source being a
    re-crawl/mirror of another (high A→B with low B→A = A is inside B).
    `text_contamination_ngram` runs this against a benchmark; this runs
    it source-against-source for the pretraining mix itself, feeding
    `curation_soft_dedup_weights` with WHICH sources are duplicate-
    coupled.

    Scale shape: the corpus collapses to DISTINCT (source, hash60) rows
    first (the only text-derived shuffle — 8 B hashes, the dedup
    narrow-payload law); the pair intersection is one self-equi-join on
    the hash whose fan-out per hash is bounded by |sources|, and the
    matrix is |sources|² rows. No doc-level pairs anywhere."""
    docs = load(spark, sf_dir, "documents")
    sh = (
        docs.select(
            "source", F.explode(F.expr(D.shingle_hashes("text", 3, D.SPARK))).alias("h")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n_shingles"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.source") != F.col("b.source")))
        .groupBy(F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return inter.join(
        F.broadcast(sizes.withColumnRenamed("source", "src_a")), "src_a"
    ).select(
        "src_a",
        "src_b",
        F.col("n_shingles").cast("long").alias("n_shingles_a"),
        F.col("n_common").cast("long").alias("n_common"),
        rnd(F.col("n_common").cast("double") / F.col("n_shingles"), 6).alias(
            "overlap_of_a"
        ),
    )


@query(
    "text_goodturing_bigram_smoothing",
    # Good-Turing frequency re-estimation over word bigrams (the
    # smoothing inside Katz backoff): adjusted count r* = (r+1)N_{r+1}/N_r
    # from the count-of-counts histogram, unseen mass P0 = N_1/N. The
    # corpus collapses to bigram counts, then to |distinct counts| cells
    # - every downstream frame is histogram-sized.
    oracle=f"""
    WITH toks AS (
      SELECT list_filter({D.tokens('text', D.DUCK)}, t -> t <> '') AS tk
      FROM documents
    ), bg AS (
      SELECT tk[i] AS w1, tk[i + 1] AS w2,
             count(*) AS c
      FROM (SELECT tk, unnest(generate_series(1, len(tk) - 1)) AS i FROM toks)
      GROUP BY tk[i], tk[i + 1]
    ), cc AS (
      SELECT c AS r, count(*) AS n_r FROM bg GROUP BY c
    ), tot AS (
      SELECT sum(CAST(r AS HUGEINT) * n_r) AS n_tok,
             sum(n_r) AS n_types FROM cc
    )
    SELECT a.r, CAST(a.n_r AS BIGINT) AS n_r,
           round((a.r + 1.0) * b.n_r / a.n_r, 6) + 0.0 AS r_star,
           round(((a.r + 1.0) * b.n_r / a.n_r) / CAST(tot.n_tok AS DOUBLE), 12)
             + 0.0 AS p_gt,
           CAST(tot.n_tok AS BIGINT) AS total_bigrams,
           CAST(tot.n_types AS BIGINT) AS distinct_bigrams,
           round((SELECT coalesce(sum(CASE WHEN r = 1 THEN n_r END), 0)
                  FROM cc) / CAST(tot.n_tok AS DOUBLE), 8) + 0.0
             AS p0_unseen_mass
    FROM cc a LEFT JOIN cc b ON b.r = a.r + 1 CROSS JOIN tot
    WHERE a.r <= 10
    """,
    category="text",
)
def text_goodturing_bigram_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GOOD-TURING frequency re-estimation over word bigrams — the
    smoothing engine inside Katz backoff and the classic answer to 'how
    much probability mass belongs to bigrams we have never seen?'
    (P0 = N_1/N, the singleton share): for each observed count r the
    adjusted count is r* = (r+1)*N_{r+1}/N_r, read straight off the
    count-of-counts histogram. Complements `text_bigram_lm_score`
    (add-one smoothing) with the estimator actually used when singleton
    structure matters.

    Scale shape: the token stream collapses to per-bigram counts (one
    token-scale shuffle — the same posture as every LM query here),
    then to the |distinct count values| histogram, which is
    log-bounded (counts follow Zipf; a few hundred cells at any corpus
    size). The r-to-r+1 join, totals and output rows all live on that
    histogram frame; output is capped at r <= 10 where the estimator
    is actually used (higher counts back off to raw r)."""
    toks = load(spark, sf_dir, "documents").select(
        F.expr(f"filter({D.tokens('text', D.SPARK)}, t -> t <> '')").alias("tk")
    )
    bg = (
        toks.select(
            F.expr(
                "explode(zip_with(slice(tk, 1, greatest(size(tk) - 1, 0)), "
                "slice(tk, 2, greatest(size(tk) - 1, 0)), "
                "(a, b) -> struct(a as w1, b as w2)))"
            ).alias("bg")
        )
        .groupBy(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cc = bg.groupBy(F.col("c").alias("r")).agg(F.count(F.lit(1)).alias("n_r"))
    tot = cc.agg(
        F.sum(F.col("r").cast("decimal(38,0)") * F.col("n_r")).alias("n_tok"),
        F.sum("n_r").alias("n_types"),
    )
    n1 = cc.agg(
        F.coalesce(
            F.sum(F.when(F.col("r") == 1, F.col("n_r"))), F.lit(0)
        ).alias("n1")
    )
    a = cc.alias("a")
    b = cc.select(F.col("r").alias("rb"), F.col("n_r").alias("n_rb"))
    r_star = (F.col("a.r") + F.lit(1.0)) * F.col("n_rb") / F.col("a.n_r")
    return (
        a.filter(F.col("a.r") <= 10)
        .join(b, F.col("rb") == F.col("a.r") + 1, "left")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(n1))
        .select(
            F.col("a.r").alias("r"),
            F.col("a.n_r").cast("long").alias("n_r"),
            (F.round(r_star, 6) + F.lit(0.0)).alias("r_star"),
            (
                F.round(r_star / F.col("n_tok").cast("double"), 12) + F.lit(0.0)
            ).alias("p_gt"),
            F.col("n_tok").cast("long").alias("total_bigrams"),
            F.col("n_types").cast("long").alias("distinct_bigrams"),
            rnd(
                F.col("n1").cast("double") / F.col("n_tok").cast("double"), 8
            ).alias("p0_unseen_mass"),
        )
    )


@query(
    "text_js_divergence_sources",
    # pairwise Jensen-Shannon divergence between source unigram
    # distributions: probabilities are ratios of exact counts, log2
    # crosses the nudged bridge once per term, and each term is then
    # SCALED TO AN INTEGER (x1e9) so the per-pair sum is order-free
    # exact integer arithmetic - the unbounded-domain answer to the
    # ordered-fold pattern (you cannot collect-sort a corpus vocabulary).
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest(list_filter({D.tokens('text', D.DUCK)},
             t -> t <> '')) AS t
      FROM documents
    ), c AS (
      SELECT source, t, count(*) AS n FROM tok GROUP BY source, t
    ), ns AS (
      SELECT source, sum(n) AS nt FROM c GROUP BY source
    ), vocab AS (
      SELECT DISTINCT t FROM c
    ), dense AS (
      SELECT ns.source, vocab.t,
             coalesce(c.n, 0) AS n, ns.nt
      FROM ns CROSS JOIN vocab
      LEFT JOIN c ON c.source = ns.source AND c.t = vocab.t
    ), pairs AS (
      SELECT a.source AS sa, b.source AS sb, a.t,
             CAST(a.n AS DOUBLE) / a.nt AS p,
             CAST(b.n AS DOUBLE) / b.nt AS q
      FROM dense a JOIN dense b ON a.t = b.t AND a.source < b.source
    ), terms AS (
      SELECT sa, sb,
             CASE WHEN p > 0 THEN CAST(round(
               p * (round(log2(2.0 * p / (p + q))
                    + sign(log2(2.0 * p / (p + q))) * 1e-9, 8) + 0.0) * 1e9
               + sign(p * (round(log2(2.0 * p / (p + q))
                    + sign(log2(2.0 * p / (p + q))) * 1e-9, 8) + 0.0)) * 0.001)
               AS BIGINT) ELSE 0 END AS tp,
             CASE WHEN q > 0 THEN CAST(round(
               q * (round(log2(2.0 * q / (p + q))
                    + sign(log2(2.0 * q / (p + q))) * 1e-9, 8) + 0.0) * 1e9
               + sign(q * (round(log2(2.0 * q / (p + q))
                    + sign(log2(2.0 * q / (p + q))) * 1e-9, 8) + 0.0)) * 0.001)
               AS BIGINT) ELSE 0 END AS tq,
             CASE WHEN p > 0 AND q > 0 THEN 1 ELSE 0 END AS com
      FROM pairs
    )
    SELECT sa AS source_a, sb AS source_b,
           CAST(sum(com) AS BIGINT) AS n_common_tokens,
           round((sum(tp) + sum(tq)) / 2.0 / 1e9, 6) + 0.0 AS js_divergence,
           round(sqrt(greatest((sum(tp) + sum(tq)) / 2.0 / 1e9, 0.0)), 6)
             + 0.0 AS js_distance
    FROM terms GROUP BY sa, sb
    """,
    category="text",
)
def text_js_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise JENSEN-SHANNON divergence between source unigram
    distributions — the symmetric, bounded [0,1] drift measure behind
    'which crawls are interchangeable and which bring new text'
    (mixture-weight design, dedup-aware source selection). Extends
    `stat_population_stability_index` (fixed buckets) to the FULL
    vocabulary and `text_cross_source_ngram_overlap` (set overlap) to
    distribution shape; sqrt(JS) is a proper metric.

    Scale shape: token streams collapse to (source, token) counts; the
    pair stage is |sources|² x |vocab| rows (sources are few — the
    quadratic factor is in the SMALL dimension; the vocab factor
    shuffles on the token key and is top-K prunable in production).
    Determinism without ordered folds: each p·log2(2p/(p+q)) term
    crosses the nudged log bridge, then is SCALED TO AN INTEGER (x1e9)
    so per-pair sums are exact integer arithmetic in ANY order — the
    unbounded-domain variant of the house sort-collect-fold, which
    cannot collect a corpus vocabulary."""
    tok = load(spark, sf_dir, "documents").select(
        "source",
        F.explode(
            F.expr(f"filter({D.tokens('text', D.SPARK)}, t -> t <> '')")
        ).alias("t"),
    )
    c = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("n"))
    ns = c.groupBy("source").agg(F.sum("n").alias("nt"))
    vocab = c.select("t").distinct()
    dense = (
        ns.crossJoin(vocab)
        .join(c, ["source", "t"], "left")
        .select("source", "t", F.coalesce(F.col("n"), F.lit(0)).alias("n"), "nt")
    )
    a = dense.alias("a")
    b = dense.alias("b")
    pairs = a.join(
        b,
        (F.col("a.t") == F.col("b.t")) & (F.col("a.source") < F.col("b.source")),
    ).select(
        F.col("a.source").alias("sa"),
        F.col("b.source").alias("sb"),
        (F.col("a.n").cast("double") / F.col("a.nt")).alias("p"),
        (F.col("b.n").cast("double") / F.col("b.nt")).alias("q"),
    )
    from etl_aws_spark.suite._util import rnd_nudged

    def term(x, y):
        lg = rnd_nudged(F.log2(F.lit(2.0) * x / (x + y)), 8)
        t = x * lg
        return (
            F.when(
                x > 0,
                F.round(t * F.lit(1e9) + F.signum(t) * F.lit(0.001)).cast("long"),
            ).otherwise(F.lit(0))
        )

    terms = pairs.select(
        "sa",
        "sb",
        term(F.col("p"), F.col("q")).alias("tp"),
        term(F.col("q"), F.col("p")).alias("tq"),
        F.when((F.col("p") > 0) & (F.col("q") > 0), 1).otherwise(0).alias("com"),
    )
    js = (F.sum("tp") + F.sum("tq")) / F.lit(2.0) / F.lit(1e9)
    return terms.groupBy(
        F.col("sa").alias("source_a"), F.col("sb").alias("source_b")
    ).agg(
        F.sum("com").cast("long").alias("n_common_tokens"),
        (F.round(js, 6) + F.lit(0.0)).alias("js_divergence"),
        (F.round(F.sqrt(F.greatest(js, F.lit(0.0))), 6) + F.lit(0.0)).alias(
            "js_distance"
        ),
    )


_LPA_ROUNDS = 4


def _duck_lpa_round(k: int) -> str:
    """One synchronous label-propagation round: each node adopts the most
    frequent label among its neighbors (ties -> MIN label); nodes with no
    neighbors keep their label. Deterministic via the (count DESC, label
    ASC) rank."""
    p = k - 1
    return f"""
    votes{k} AS (
      SELECT s.u AS id, l.lab, count(*) AS c
      FROM sym s JOIN lab{p} l ON l.id = s.v
      GROUP BY s.u, l.lab
    ),
    pick{k} AS (
      SELECT id, lab FROM (
        SELECT id, lab,
               row_number() OVER (PARTITION BY id ORDER BY c DESC, lab ASC)
                 AS rk
        FROM votes{k}
      ) WHERE rk = 1
    ),
    lab{k} AS MATERIALIZED (
      SELECT l.id, coalesce(p.lab, l.lab) AS lab
      FROM lab{p} l LEFT JOIN pick{k} p ON l.id = p.id
    )"""


@query(
    "text_dedup_label_propagation",
    # synchronous label propagation (Raghavan et al. 2007) over the SAME
    # capped LSH band edge set as the CC query: 4 rounds of
    # most-frequent-neighbor-label voting with deterministic (count DESC,
    # label ASC) tie-breaks. Where CC answers "which docs are connected
    # at all", LPA splits weakly-bridged chains into densely-linked
    # communities - the two labelings are compared downstream.
    oracle=f"""
    WITH RECURSIVE {_CORPUS_SQL}, {_minhash_bands_sql()},
    bands_c AS (
      SELECT doc_id, bk FROM (
        SELECT doc_id, bk, count(*) OVER (PARTITION BY bk) AS _bn FROM bands
      ) WHERE _bn <= 50
    ),
    edges AS (
      SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
      FROM bands_c a JOIN bands_c b USING (bk) WHERE a.doc_id < b.doc_id
    ),
    verts AS (SELECT DISTINCT doc_id FROM corpus),
    sym AS (
      SELECT src AS u, dst AS v FROM edges
      UNION SELECT dst AS u, src AS v FROM edges
    ),
    deg AS (
      SELECT u AS id, count(*) AS d FROM sym GROUP BY u
    ),
    lab0 AS (SELECT doc_id AS id, doc_id AS lab FROM verts),
    {','.join(_duck_lpa_round(k) for k in range(1, _LPA_ROUNDS + 1))},
    sizes AS (
      SELECT lab, count(*) AS csize FROM lab{_LPA_ROUNDS} GROUP BY lab
    )
    SELECT l.id AS doc_id, l.lab AS community_id,
           CAST(s.csize AS BIGINT) AS community_size,
           CAST(coalesce(d.d, 0) AS BIGINT) AS n_neighbors
    FROM lab{_LPA_ROUNDS} l
    JOIN sizes s ON l.lab = s.lab
    LEFT JOIN deg d ON l.id = d.id
    """,
    category="text",
)
def text_dedup_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMMUNITY DETECTION by synchronous label propagation (Raghavan
    et al. 2007) on the near-dup candidate graph — the densely-linked
    refinement of `text_dedup_connected_components`: CC merges any two
    docs joined by ANY path (one weak bridge fuses two big template
    families), LPA lets each node adopt its neighborhood's majority
    label, so weakly-bridged chains split into communities that
    actually share most of their text. {K} synchronous rounds,
    most-frequent neighbor label, ties broken by MIN label — fully
    deterministic, no RNG ordering games.

    Scale shape: the edge set is the SAME capped LSH band frame as the
    CC/keep-best family (Σ|bucket|² with the max_bucket=50 guard,
    32 B/row digests); each round is one |E| vote shuffle + one
    per-node rank window PARTITIONED BY node (scales with parallelism)
    + one |V| left join, localCheckpointed so no round re-derives the
    lineage. The oracle replays all {K} rounds with the identical
    tie-break."""
    from pyspark.sql import Window

    corpus = _corpus(spark, sf_dir)
    edges = dedup.minhash_band_edges(corpus, "doc_id", "text", max_bucket=50)
    verts = corpus.select("doc_id").distinct()
    sym = (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .union(edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = sym.groupBy(F.col("u").alias("id")).agg(F.count(F.lit(1)).alias("d"))
    lab = verts.select(
        F.col("doc_id").alias("id"), F.col("doc_id").alias("lab")
    ).localCheckpoint(eager=True)
    wv = Window.partitionBy("id").orderBy(F.col("c").desc(), F.col("lab").asc())
    for _ in range(_LPA_ROUNDS):
        votes = (
            sym.join(
                lab.select(F.col("id").alias("v_id"), F.col("lab")),
                F.col("v") == F.col("v_id"),
            )
            .groupBy(F.col("u").alias("id"), "lab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        pick = (
            votes.withColumn("rk", F.row_number().over(wv))
            .filter(F.col("rk") == 1)
            .select("id", F.col("lab").alias("new_lab"))
        )
        lab = (
            lab.join(pick, "id", "left")
            .select(
                "id", F.coalesce(F.col("new_lab"), F.col("lab")).alias("lab")
            )
            .localCheckpoint(eager=True)
        )
    sizes = lab.groupBy("lab").agg(F.count(F.lit(1)).alias("csize"))
    return (
        lab.join(sizes, "lab")
        .join(deg, "id", "left")
        .select(
            F.col("id").alias("doc_id"),
            F.col("lab").alias("community_id"),
            F.col("csize").cast("long").alias("community_size"),
            F.coalesce(F.col("d"), F.lit(0)).cast("long").alias("n_neighbors"),
        )
    )


@query(
    "text_phonetic_confusion_sets",
    # vocab-level phonetic blocking: |vocab| is Heaps-bounded, the code is
    # an identical string-op chain in both dialects, and groups collapse
    # by exact count — no floats anywhere.
    oracle=f"""
    WITH w0 AS (
      SELECT DISTINCT t AS word
      FROM documents, unnest({D.tokens('text', D.DUCK)}) AS u(t)
      WHERE regexp_matches(t, '^[a-z]{{3,}}$')
    ), w AS (
      -- planted positives (r11 audit): the synthetic lexicon has no
      -- naturally confusable pairs, so the HAVING >= 2 head was empty
      -- at every SF. Rotating the NON-LEADING vowels of each word
      -- (a->e->i->o->u->a) plants a distinct word with the IDENTICAL
      -- simplified-soundex code by construction: vowels all map to
      -- class '0' and the first letter is untouched.
      SELECT word FROM w0
      UNION
      SELECT substr(word, 1, 1)
             || translate(substr(word, 2), 'aeiou', 'eioua') AS word
      FROM w0
      WHERE substr(word, 1, 1)
            || translate(substr(word, 2), 'aeiou', 'eioua') <> word
    ), c AS (
      SELECT word, {D.soundex_simplified('word', D.DUCK)} AS code FROM w
    )
    SELECT code, CAST(count(*) AS BIGINT) AS n_words,
           min(word) AS first_word, max(word) AS last_word
    FROM c GROUP BY code HAVING count(*) >= 2
    """,
    category="text",
)
def text_phonetic_confusion_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phonetic confusion sets over the corpus vocabulary: every
    simplified-soundex code shared by >= 2 distinct words — the phonetic
    blocking key of classic entity resolution (Robert/Rupert -> R163),
    and the spelling-variant detector a text-normalization pass runs
    before token-level dedup. The code is one translate + 6 run-collapse
    regexes + pad (`_dialect.soundex_simplified`), an IDENTICAL
    deterministic chain in Spark and DuckDB, so the grouped sets match
    exactly; h/w/y map to the vowel class (the documented simplified
    variant -- full soundex's h/w separator rule needs backreferences
    RE2 lacks).

    Scale shape (100 TB): tokens collapse to the DISTINCT vocabulary
    first (Heaps-bounded, corpus-size-free), the code is codegen-resident
    string arithmetic on |vocab| rows, and the group-by shuffles only
    (code, word) pairs. No pair join at all — phonetic blocking IS the
    bucket."""
    docs = load(spark, sf_dir, "documents")
    w0 = (
        docs.select(
            F.explode(F.expr(D.tokens("text", D.SPARK))).alias("word")
        )
        .filter(F.col("word").rlike("^[a-z]{3,}$"))
        .distinct()
    )
    # planted positives (r11 audit: no naturally confusable pairs in the
    # synthetic lexicon): rotate non-leading vowels — same simplified-
    # soundex code (vowels are all class '0', first letter untouched),
    # different word. Mirrors the oracle's `w` CTE exactly.
    variant = F.expr(
        "concat(substr(word, 1, 1), "
        "translate(substr(word, 2), 'aeiou', 'eioua'))"
    )
    w = w0.unionByName(
        w0.filter(variant != F.col("word")).select(variant.alias("word"))
    ).distinct()
    c = w.select(
        "word", F.expr(D.soundex_simplified("word", D.SPARK)).alias("code")
    )
    return (
        c.groupBy("code")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.min("word").alias("first_word"),
            F.max("word").alias("last_word"),
        )
        .filter(F.col("n_words") >= 2)
    )


def _textrank_oracle() -> str:
    from etl_aws_spark.suite.q_graph import _duck_pr_round

    toks = D.tokens("text", D.DUCK)
    return f"""
    WITH f AS (
      SELECT doc_id,
             list_filter({toks},
                         t -> regexp_matches(t, '^[a-z]{{5,12}}$')) AS w
      FROM documents
    ), adj AS (
      SELECT DISTINCT
             CASE WHEN w[i.i] < w[i.i + 1] THEN w[i.i] ELSE w[i.i + 1] END AS s,
             CASE WHEN w[i.i] < w[i.i + 1] THEN w[i.i + 1] ELSE w[i.i] END AS d
      FROM f JOIN (SELECT unnest(generate_series(1, 2000)) AS i) i
        ON i.i < len(w)
      WHERE w[i.i] <> w[i.i + 1]
    ), pairs AS (
      SELECT s, d FROM adj UNION ALL SELECT d AS s, s AS d FROM adj
    ), deg AS (
      SELECT s, count(*) AS outdeg FROM pairs GROUP BY s
    ), n AS (
      SELECT CAST(count(*) AS DOUBLE) AS nv FROM deg
    ), r0 AS (
      SELECT s AS id, 1.0 / n.nv AS rank FROM deg CROSS JOIN n
    ),{_duck_pr_round('0', '1')},{_duck_pr_round('1', '2')},{_duck_pr_round('2', '3')}
    SELECT id AS keyword, round(rank, 8) + 0.0 AS rank
    FROM r3
    ORDER BY round(rank, 8) DESC, id ASC
    LIMIT 20
    """


@query(
    "text_keyword_textrank",
    # TextRank = PageRank on the window-2 co-occurrence word graph
    # (Mihalcea & Tarau 2004). The oracle unrolls the same 3 damped
    # rounds over the identical symmetric edge set; ranking on the
    # ROUNDED score keeps the top-20 cut deterministic across engines'
    # float summation orders (the graph_pagerank_parts rule).
    oracle=_textrank_oracle(),
    category="text",
)
def text_keyword_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank KEYWORD EXTRACTION (Mihalcea & Tarau 2004): PageRank on
    the window-2 co-occurrence graph of content words (5-12 lowercase
    letters), 3 damped rounds, top 20 — the graph-centrality member of
    the keyword family beside RAKE (degree/frequency scores) and TF-IDF
    (corpus statistics): TextRank surfaces words that glue many contexts
    together even at moderate frequency. Adjacency is computed in the
    FILTERED token sequence (both engines replay the same filter-then-
    pair rule), edges are distinct undirected pairs, and the rank
    recursion reuses `operators.graph.pagerank` — the same code path as
    `graph_pagerank_parts`, so one verified iteration kernel serves both
    the entity graph and the text graph.

    Scale shape (100 TB): tokens collapse to distinct word-pair edges
    (vocab²-bounded in principle, Heaps-bounded in practice); each round
    moves (src, dst, rank/deg) scalars; the top-20 is orderBy().limit()
    on the rounded score. No per-document state after the edge build."""
    docs = load(spark, sf_dir, "documents")
    f = docs.select(
        F.expr(
            "filter(" + D.tokens("text", D.SPARK)
            + ", t -> t rlike '^[a-z]{5,12}$')"
        ).alias("w")
    )
    adj = (
        f.filter(F.expr("size(w) >= 2"))
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 1), i -> "
                    "struct(element_at(w, i) as x, element_at(w, i + 1) as y))"
                )
            ).alias("p")
        )
        .filter(F.col("p.x") != F.col("p.y"))
        .select(
            F.least("p.x", "p.y").alias("src"),
            F.greatest("p.x", "p.y").alias("dst"),
        )
        .distinct()
    )
    from etl_aws_spark.operators import graph

    ranks = graph.pagerank(adj, damping=0.85, n_iter=3, undirected=True)
    return (
        ranks.select(
            F.col("id").alias("keyword"), rnd(F.col("rank"), 8).alias("rank")
        )
        .orderBy(F.desc("rank"), F.asc("keyword"))
        .limit(20)
    )


def _burrows_oracle() -> str:
    toks = D.tokens("text", D.DUCK)
    return f"""
    WITH t AS (
      SELECT source, unnest({toks}) AS tok FROM documents
    ), tot AS (
      SELECT source, count(*) AS n_tok FROM t GROUP BY source
    ), gc AS (
      SELECT tok, count(*) AS c FROM t GROUP BY tok
    ), topk AS (
      SELECT tok FROM gc ORDER BY c DESC, tok ASC LIMIT 30
    ), cells AS (
      SELECT tot.source, topk.tok,
             CAST(coalesce(sc.c, 0) AS DOUBLE) / tot.n_tok AS f
      FROM tot CROSS JOIN topk
      LEFT JOIN (
        SELECT source, tok, count(*) AS c FROM t GROUP BY source, tok
      ) sc ON sc.source = tot.source AND sc.tok = topk.tok
    ), mu AS (
      SELECT tok, count(*) AS ns,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(f ORDER BY source)), (a, x) -> a + x) / count(*) AS m
      FROM cells GROUP BY tok
    ), sd AS (
      SELECT c.tok, mu.m,
             sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list((c.f - mu.m) * (c.f - mu.m) ORDER BY c.source)),
               (a, x) -> a + x) / mu.ns) AS s
      FROM cells c JOIN mu ON c.tok = mu.tok
      GROUP BY c.tok, mu.m, mu.ns
    ), z AS (
      SELECT c.source, c.tok,
             CASE WHEN sd.s > 0.0 THEN (c.f - sd.m) / sd.s ELSE 0.0 END AS z
      FROM cells c JOIN sd ON c.tok = sd.tok
    ), pairs AS (
      SELECT a.source AS source_a, b.source AS source_b, a.tok,
             abs(a.z - b.z) AS dz
      FROM z a JOIN z b ON a.tok = b.tok AND a.source < b.source
    )
    SELECT source_a, source_b,
           CAST(count(*) AS INT) AS n_words,
           round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(dz ORDER BY tok)), (a, x) -> a + x) / count(*), 6)
             + 0.0 AS delta
    FROM pairs GROUP BY source_a, source_b
    """


@query(
    "text_burrows_delta_stylometry",
    # all frames are bounded: 30 marker words (top-k by integer count with
    # tok tie-break), |sources| cells per word, source-ordered and
    # word-ordered folds — every z-score replays exactly.
    oracle=_burrows_oracle(),
    category="text",
)
def text_burrows_delta_stylometry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BURROWS' DELTA between sources (the classic stylometric /
    authorship-attribution distance, Burrows 2002): z-score the relative
    frequencies of the 30 most common words across sources, Delta(a,b) =
    mean |z_a − z_b| — function-word profiles separate writing styles
    where topic models can't, and a curation pipeline uses the matrix to
    detect near-duplicate *sources* (mirrors, scrapes of the same site)
    rather than near-duplicate documents. The marker set is a global
    top-30 by integer count (tok tie-break — deterministic cut), every
    frequency is an integer ratio, and the μ/σ/Delta folds run
    source-ordered / word-ordered over ≤|sources| and ≤30 elements.

    Scale shape (100 TB): one token scan produces both the global and
    per-source counts (map-side combined); everything after lives on
    |sources|×30 cells. The pair stage is |sources|² — sources are a
    catalog, not a corpus."""
    docs = load(spark, sf_dir, "documents")
    t = docs.select(
        "source", F.explode(F.expr(D.tokens("text", D.SPARK))).alias("tok")
    )
    tot = t.groupBy("source").agg(F.count(F.lit(1)).alias("n_tok"))
    topk = (
        t.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("tok"))
        .limit(30)
        .select("tok")
    )
    sc = t.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    cells = (
        tot.crossJoin(F.broadcast(topk))
        .join(sc, ["source", "tok"], "left")
        .select(
            "source",
            "tok",
            (
                F.coalesce(F.col("c"), F.lit(0)).cast("double")
                / F.col("n_tok")
            ).alias("f"),
        )
    )
    fold_src = (
        "aggregate(transform(array_sort(collect_list(struct(source, {t} as tv))), "
        "x -> x.tv), cast(0.0 as double), (a, y) -> a + y)"
    )
    mu = cells.groupBy("tok").agg(
        F.count(F.lit(1)).alias("ns"),
        (F.expr(fold_src.format(t="f")) / F.count(F.lit(1))).alias("m"),
    )
    sd = (
        cells.join(mu, "tok")
        .groupBy("tok", "m", "ns")
        .agg(
            F.sqrt(
                F.expr(fold_src.format(t="(f - m) * (f - m)")) / F.first("ns")
            ).alias("s")
        )
    )
    z = cells.join(sd.select("tok", "m", "s"), "tok").select(
        "source",
        "tok",
        F.when(F.col("s") > 0.0, (F.col("f") - F.col("m")) / F.col("s"))
        .otherwise(0.0)
        .alias("z"),
    )
    a = z.select(
        F.col("source").alias("source_a"), "tok", F.col("z").alias("za")
    )
    b = z.select(
        F.col("source").alias("source_b"), "tok", F.col("z").alias("zb")
    )
    pairs = a.join(b, "tok").filter(F.col("source_a") < F.col("source_b")).select(
        "source_a", "source_b", "tok",
        F.abs(F.col("za") - F.col("zb")).alias("dz"),
    )
    fold_tok = (
        "aggregate(transform(array_sort(collect_list(struct(tok, dz))), "
        "x -> x.dz), cast(0.0 as double), (a, y) -> a + y)"
    )
    return pairs.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("int").alias("n_words"),
        (
            F.round(F.expr(fold_tok) / F.count(F.lit(1)), 6) + F.lit(0.0)
        ).alias("delta"),
    )


@query(
    "quality_split_leakage_lsh",
    # identical corpus, band keys, bucket cap, and edge set as the CC
    # family; the split rule is one md5 hex compare replayed verbatim
    oracle=f"""
    WITH {_CORPUS_SQL}, {_minhash_bands_sql()},
    bands_c AS (
      SELECT doc_id, bk FROM (
        SELECT doc_id, bk, count(*) OVER (PARTITION BY bk) AS _bn FROM bands
      ) WHERE _bn <= 50
    ),
    edges AS (
      SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
      FROM bands_c a JOIN bands_c b USING (bk) WHERE a.doc_id < b.doc_id
    ),
    split AS (
      SELECT doc_id, source,
             CAST(md5('split:' || CAST(doc_id AS VARCHAR)) < '2' AS INT) AS is_test
      FROM corpus
    ),
    leaked AS (
      SELECT DISTINCT CASE WHEN s1.is_test = 1 THEN e.src ELSE e.dst END AS doc_id
      FROM edges e
      JOIN split s1 ON e.src = s1.doc_id
      JOIN split s2 ON e.dst = s2.doc_id
      WHERE s1.is_test <> s2.is_test
    )
    SELECT s.source,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(count(l.doc_id) AS BIGINT) AS n_leaked,
           round(count(l.doc_id) / CAST(count(*) AS DOUBLE), 6) + 0.0 AS leak_ratio
    FROM split s LEFT JOIN leaked l ON s.doc_id = l.doc_id
    WHERE s.is_test = 1
    GROUP BY s.source
    """,
    category="text",
)
def quality_split_leakage_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAIN/TEST SPLIT LEAKAGE AUDIT — the eval pitfall exact
    contamination checks miss: a doc-level hash split puts NEAR-DUPLICATES
    of training docs into the test set (the corpus here contains a
    re-delivered 10% slice, so cross-split near-dup pairs exist by
    construction). The audit splits by salted md5 (~12.5% test), reuses
    the EXACT LSH candidate edge set of the dedup family
    (minhash_band_edges, max_bucket=50 — Σ|bucket|², never N²), and
    reports, per source, how many test docs have at least one train-side
    near-dup — the docs whose eval scores are memorization, not
    generalization. The production fix is split-by-CLUSTER
    (`text_dedup_connected_components` canonical ids), and this query is
    the monitor proving why.

    Scale shape (100 TB): the edge list is the bounded LSH join the
    dedup family already pays; the split decoration is two |E|-row hash
    joins carrying (id, bit); the report is a |sources| aggregate."""
    corpus = _corpus(spark, sf_dir)
    split = corpus.select(
        "doc_id",
        "source",
        (
            F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string")))
            < F.lit("2")
        )
        .cast("int")
        .alias("is_test"),
    )
    edges = dedup.minhash_band_edges(corpus, "doc_id", "text", max_bucket=50)
    e2 = (
        edges.join(
            split.select(
                F.col("doc_id").alias("src"), F.col("is_test").alias("st")
            ),
            "src",
        )
        .join(
            split.select(
                F.col("doc_id").alias("dst"), F.col("is_test").alias("dt")
            ),
            "dst",
        )
        .filter(F.col("st") != F.col("dt"))
    )
    leaked = e2.select(
        F.when(F.col("st") == 1, F.col("src")).otherwise(F.col("dst")).alias("doc_id")
    ).distinct()
    test = split.filter(F.col("is_test") == 1)
    return (
        test.join(leaked.withColumn("_l", F.lit(1)), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.count("_l").cast("long").alias("n_leaked"),
            (
                F.round(F.count("_l") / F.count(F.lit(1)).cast("double"), 6)
                + F.lit(0.0)
            ).alias("leak_ratio"),
        )
    )


_STOP_IN_REL = ", ".join(f"'{s}'" for s in analysis.STOPWORDS)


@query(
    "pipeline_corpus_release",
    # the full chain mirrored CTE-for-stage: gopher metrics, exact-dup
    # survivors, LSH bands/cap/edges over THE SURVIVOR SET (the bands SQL
    # reads the CTE literally named `corpus`), recursive-CTE true
    # components, cluster-keyed split, per-(source, split) release report
    oracle=f"""
    WITH RECURSIVE raw AS (
      SELECT * FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text, lang, source, n_chars
      FROM documents WHERE doc_id % 10 = 0
    ), t0 AS (
      SELECT doc_id, {D.tokens('text', D.DUCK)} AS toks FROM raw
    ), m0 AS (
      SELECT doc_id,
             len(toks) AS n_tok,
             list_sum(list_transform(toks, t -> length(t))) / CAST(len(toks) AS DOUBLE) AS mean_len,
             len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE) AS uniq_ratio,
             list_sum(list_transform(toks, t -> CASE WHEN t IN ({_STOP_IN_REL}) THEN 1 ELSE 0 END))
               / CAST(len(toks) AS DOUBLE) AS stop_ratio
      FROM t0
    ), keepers AS (
      SELECT doc_id FROM m0
      WHERE n_tok >= 10 AND n_tok <= 100000 AND mean_len >= 2.0 AND mean_len <= 12.0
        AND uniq_ratio > 0.3 AND stop_ratio >= 0.02
    ), gs AS (
      SELECT r.* FROM raw r JOIN keepers USING (doc_id)
    ), hh AS (
      SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS h
      FROM gs
    ), es AS (
      SELECT doc_id FROM (
        SELECT doc_id, min(doc_id) OVER (PARTITION BY h) AS mn FROM hh
      ) WHERE doc_id = mn
    ), corpus AS (
      SELECT g.* FROM gs g JOIN es USING (doc_id)
    ), {_minhash_bands_sql()},
    bands_c AS (
      SELECT doc_id, bk FROM (
        SELECT doc_id, bk, count(*) OVER (PARTITION BY bk) AS _bn FROM bands
      ) WHERE _bn <= 50
    ),
    edges AS (
      SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
      FROM bands_c a JOIN bands_c b USING (bk) WHERE a.doc_id < b.doc_id
    ),
    verts AS (SELECT doc_id FROM corpus),
    sym AS (
      SELECT src AS u, dst AS v FROM edges
      UNION SELECT dst AS u, src AS v FROM edges
    ),
    reach AS (
      SELECT doc_id AS id, doc_id AS r FROM verts
      UNION
      SELECT s.u AS id, reach.r FROM reach JOIN sym s ON s.v = reach.id
    ),
    cc AS (SELECT id AS doc_id, min(r) AS cid FROM reach GROUP BY id),
    spl AS (
      SELECT doc_id, cid,
             CAST(md5('csplit:' || CAST(cid AS VARCHAR)) < '2' AS INT) AS is_test
      FROM cc
    ),
    tokn AS (
      SELECT doc_id, len({D.tokens('text', D.DUCK)}) AS nt FROM corpus
    )
    SELECT c.source, s.is_test,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT s.cid) AS BIGINT) AS n_clusters,
           CAST(sum(tokn.nt) AS BIGINT) AS n_tokens
    FROM corpus c JOIN spl s USING (doc_id) JOIN tokn USING (doc_id)
    GROUP BY c.source, s.is_test
    """,
    category="pipeline",
)
def pipeline_corpus_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE CORPUS-RELEASE PIPELINE end to end in ONE plan — the
    composition every stage of this suite exists for: quality filter
    (Gopher rules) -> exact dedup (normalized digest, min-id survivor)
    -> near-dup closure (LSH bands, bucket cap, distributed CC) ->
    CLUSTER-KEYED train/test split (whole near-dup clusters move
    together — the fix `quality_split_leakage_lsh` motivates: a doc-level
    split leaks near-dups across the boundary, a cluster split CANNOT)
    -> per-(source, split) release report with doc/cluster/token counts.

    Scale shape (100 TB): each stage keeps its own documented posture —
    the filter is one token-metrics pass, exact dedup shuffles 32 B
    digests, the LSH pair stage is bucket-capped, CC shuffles 2-column
    frames on checkpointed lineage, and the report is a |sources|x2
    aggregate. Nothing new is invented here; the value IS the
    composition, and the oracle replays every stage CTE-for-stage
    including the recursive-CTE true components."""
    from etl_aws_spark.operators import graph
    from etl_aws_spark.text import curation

    raw = _corpus(spark, sf_dir)
    gs = curation.gopher_rules(raw, "text").filter(F.col("keep")).select(
        "doc_id", "text", "source"
    )
    es = (
        dedup.exact_dedup(gs, "doc_id", "text")
        .filter(F.col("is_dup") == 0)
        .select("doc_id", "text", "source")
        .localCheckpoint(eager=True)
    )
    edges = dedup.minhash_band_edges(es, "doc_id", "text", max_bucket=50)
    cc = graph.connected_components(
        es.select("doc_id").distinct(), edges, id_col="doc_id",
        edges_subset_of_vertices=True,
    )
    spl = cc.select(
        "doc_id",
        "component_id",
        (
            F.md5(F.concat(F.lit("csplit:"), F.col("component_id").cast("string")))
            < F.lit("2")
        )
        .cast("int")
        .alias("is_test"),
    )
    toks = D.tokens("text", D.SPARK)
    tokn = es.select("doc_id", F.expr(f"size({toks})").cast("long").alias("nt"))
    return (
        es.select("doc_id", "source")
        .join(spl, "doc_id")
        .join(tokn, "doc_id")
        .groupBy("source", "is_test")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("component_id").cast("long").alias("n_clusters"),
            F.sum("nt").cast("long").alias("n_tokens"),
        )
    )


@query(
    "text_ngram_novelty_decay",
    # novelty = shingle instances whose global first occurrence (min
    # doc_id) is this doc; pure integer counts until one final ratio.
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, unnest({D.shingle_hashes('text', 3, D.DUCK)}) AS h
      FROM documents
    ), novel AS (
      SELECT first_doc AS doc_id, count(*) AS n_novel
      FROM (SELECT h, min(doc_id) AS first_doc FROM sh GROUP BY h)
      GROUP BY first_doc
    ), per AS (
      SELECT doc_id, len({D.word_shingles('text', 3, D.DUCK)}) AS n_sh
      FROM documents
    ), mx AS (
      SELECT max(doc_id) AS maxd FROM documents
    ), b AS (
      SELECT CAST((p.doc_id * 10) // (mx.maxd + 1) AS INT) AS decile,
             greatest(p.n_sh, 0) AS n_sh, coalesce(v.n_novel, 0) AS n_novel
      FROM per p CROSS JOIN mx
      LEFT JOIN novel v ON v.doc_id = p.doc_id
    )
    SELECT CAST(decile AS INT) AS decile,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_sh) AS BIGINT) AS n_shingles,
           CAST(sum(n_novel) AS BIGINT) AS n_novel,
           round(CAST(sum(n_novel) AS DOUBLE) / sum(n_sh), 6) + 0.0
             AS novelty_rate
    FROM b GROUP BY decile
    """,
    category="text",
)
def text_ngram_novelty_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram NOVELTY DECAY across the corpus in ingestion order (doc_id
    deciles): what fraction of each decile's distinct 3-word shingles is
    seen here for the FIRST time corpus-wide. The standard diminishing-
    returns curve for data collection (novelty falls as the corpus grows
    — Heaps' law seen from the marginal side; `text_vocab_growth_heaps`
    fits the cumulative side) and the signal curation teams watch to
    decide when another crawl of the same sources stops paying.

    Scale shape: NO join back to the exploded pairs — the per-doc
    shingle total is doc-LOCAL (the distinct-shingle array size, zero
    shuffle), and the per-doc novel count falls straight out of the
    first-occurrence aggregate: min(doc_id) per hash, then count per
    winning doc (two narrow 16 B shuffles, the second over |distinct
    hashes| map-side-combined to |docs| rows). The r10 rewrite halved
    the shuffled volume vs the naive hash-keyed join-back (measured
    7.0x -> see BASELINE.md). The decile key is integer arithmetic off
    a broadcast max — no global sort, no window over the corpus. All
    counts exact integers; the one ratio divides at the end."""
    docs = load(spark, sf_dir, "documents")
    # shingle the corpus ONCE (the dominant CPU — measured 5.8 s of the
    # 10.6 s sf1 wall) and materialize the 16 B (doc, hash) pairs; both
    # aggregates below read the checkpoint instead of re-tokenizing
    sh = docs.select(
        "doc_id",
        F.explode(F.expr(D.shingle_hashes("text", 3, D.SPARK))).alias("h"),
    ).localCheckpoint(eager=True)
    per_doc = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    novel = (
        sh.groupBy("h")
        .agg(F.min("doc_id").alias("first_doc"))
        .groupBy("first_doc")
        .agg(F.count(F.lit(1)).alias("n_novel"))
        .withColumnRenamed("first_doc", "doc_id")
    )
    mx = docs.agg(F.max("doc_id").alias("maxd"))
    b = (
        docs.select("doc_id")
        .crossJoin(F.broadcast(mx))
        .join(per_doc, "doc_id", "left")
        .join(novel, "doc_id", "left")
        .select(
            F.expr("CAST((doc_id * 10) div (maxd + 1) AS INT)").alias("decile"),
            F.coalesce(F.col("n_sh"), F.lit(0)).alias("n_sh"),
            F.coalesce(F.col("n_novel"), F.lit(0)).alias("n_novel"),
        )
    )
    return b.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_sh").cast("long").alias("n_shingles"),
        F.sum("n_novel").cast("long").alias("n_novel"),
        rnd(
            F.sum("n_novel").cast("double") / F.sum("n_sh").cast("double"), 6
        ).alias("novelty_rate"),
    )
