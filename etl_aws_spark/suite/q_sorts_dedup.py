"""SURVEY §2.6 (sort/limit/top-k/sample) and §2.9 (dedup).

Determinism: every limit carries a total-order tie-break; sampling is
pseudo-random via md5 of the row key — identical hex in both engines, so
even the "random" sample is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_aws_spark.operators.dedup import dedup_canonical
from etl_aws_spark.registry import load, query


@query(
    "sort_multi_col",
    oracle="""
    SELECT event_id, user_id, ts, value FROM events
    ORDER BY user_id, ts, event_id LIMIT 100
    """,
    category="sort",
)
def sort_multi_col(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column sort (`preprocessing.py:82,322`). In the engine, sorts
    before windowing are folded into window specs; a global orderBy exists
    only at the output boundary, planned as TakeOrderedAndProject here."""
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    return ev.orderBy("user_id", "ts", "event_id").limit(100)


@query(
    "sort_desc_topn",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice FROM part
    ORDER BY p_retailprice DESC, p_partkey LIMIT 20
    """,
    category="sort",
)
def sort_desc_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N by value desc (`model_evaluation.ipynb` cell 54) with an
    explicit tie-break. Spark plans TakeOrderedAndProject: per-partition
    heaps + a driver merge of N·partitions rows — no global sort."""
    return (
        load(spark, sf_dir, "part")
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy(F.desc("p_retailprice"), "p_partkey")
        .limit(20)
    )


@query(
    "limit_show_head",
    oracle="SELECT o_orderkey, o_custkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 5",
    category="sort",
)
def limit_show_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head inspection (`glue.py:91`). A bare limit(n) is whatever-task-
    finishes-first; the engine canonicalizes with an ordering."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(5)
    )


@query(
    "sample_rows",
    oracle="""
    SELECT event_id, user_id, value FROM events
    ORDER BY md5(CAST(event_id AS VARCHAR)) LIMIT 200
    """,
    category="sort",
)
def sample_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-n pseudo-random sample (`preprocessing.py:17-19`).

    Ordering by md5(key) is uniform-ish, seedable (prepend a salt), and —
    unlike rand() — reproducible across engines and partitionings, which
    upgrades the driver check from rows-only to a full value hash."""
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
    return ev.orderBy(F.md5(F.col("event_id").cast("string"))).limit(200)


@query(
    "dedup_by_key",
    oracle="""
    WITH r AS (
      SELECT user_id, event_type, event_id, ts, value,
             row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT user_id, event_type, event_id, ts, value FROM r WHERE rn = 1
    """,
    category="dedup",
)
def dedup_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key dedup with a DETERMINISTIC survivor (`glue.py:226` uses
    dropDuplicates — arbitrary survivor; the engine pins first-by-(ts,id))."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "event_id", "ts", "value")
    return dedup_canonical(ev, ["user_id", "event_type"], ["ts", "event_id"])


@query(
    "dedup_keep_first_ordered",
    oracle="""
    WITH r AS (
      SELECT lang, doc_id, n_chars,
             row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      FROM documents
    )
    SELECT lang, doc_id, n_chars FROM r WHERE rn = 1
    """,
    category="dedup",
)
def dedup_keep_first_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep first occurrence per key in a defined order
    (`preprocessing.py:22-25`)."""
    docs = load(spark, sf_dir, "documents").select("lang", "doc_id", "n_chars")
    return dedup_canonical(docs, ["lang"], ["doc_id"])


@query(
    "dedup_names_levenshtein",
    oracle="""
    WITH c AS (
      SELECT c_custkey, c_name, substr(c_name, 10, 7) AS blk FROM customer
    )
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           a.c_name AS name_a, b.c_name AS name_b,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
    FROM c a JOIN c b ON a.blk = b.blk AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
    category="dedup",
)
def dedup_names_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution candidate pairs by edit distance ≤ 1, blocked on a
    shared name prefix so the pair join is a per-block equi-join
    (Σ|block|², never N² — the same blocking discipline as the text/
    embedding dedup family). Spark's built-in ``levenshtein`` and DuckDB's
    implement the same DP, so distances — and the kept pair set — match
    exactly."""
    from etl_aws_spark.operators.scale import (
        HEAVY_BYTES_PER_PART,
        fan_out_small_scan,
    )

    # the Σ|block|² levenshtein DPs run map-side of a broadcast join at
    # gate SFs, i.e. at SCAN parallelism — widen a single-split customer
    # scan (no-op at scale; measured 4.9 s of CPU on 1 task at sf0.1 —
    # ~15 ms/KB, the heavy floor)
    c = fan_out_small_scan(load(spark, sf_dir, "customer"), HEAVY_BYTES_PER_PART).select(
        "c_custkey", "c_name", F.substring("c_name", 10, 7).alias("blk")
    )
    a = c.select(
        F.col("c_custkey").alias("id_a"), F.col("c_name").alias("name_a"),
        F.col("blk").alias("blk_a"),
    )
    b = c.select(
        F.col("c_custkey").alias("id_b"), F.col("c_name").alias("name_b"),
        F.col("blk").alias("blk_b"),
    )
    pairs = a.join(
        b, (F.col("blk_a") == F.col("blk_b")) & (F.col("id_a") < F.col("id_b")), "inner"
    ).withColumn("dist", F.levenshtein("name_a", "name_b").cast("long"))
    return pairs.filter(F.col("dist") <= 1).select("id_a", "id_b", "name_a", "name_b", "dist")


@query(
    "sample_weighted_reservoir",
    # Efraimidis-Spirakis A-Res keys: key = ln(u)/w with u an md5-uniform
    # in (0,1) — deterministic, RNG-free, identical on both engines; the
    # top-k by key is a weighted-without-replacement sample. ln crosses
    # the nudged-8 bridge before the rank.
    oracle="""
    WITH w AS (
      SELECT doc_id, CAST(n_chars AS DOUBLE) AS wt,
             (('0x' || substr(md5(concat('wr:', CAST(doc_id AS VARCHAR))),
                              1, 15))::BIGINT + 1) / 1152921504606846977.0
               AS u
      FROM documents
    ), keyed AS (
      SELECT doc_id, wt,
             round(ln(u) / wt + sign(ln(u) / wt) * 1e-9, 8) + 0.0 AS k
      FROM w
    )
    SELECT doc_id, CAST(wt AS BIGINT) AS weight, k AS sample_key
    FROM (
      SELECT *, row_number() OVER (ORDER BY k DESC, doc_id) AS rk
      FROM keyed
    ) WHERE rk <= 25
    """,
    category="sample",
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED sampling without replacement, deterministic and
    distributed — the Efraimidis-Spirakis reservoir (key = u^(1/w),
    computed in the equivalent ln(u)/w order): each doc draws its
    'uniform' from md5 of its id (RNG-free — identical on every engine,
    every run, every partitioning), keys fold per-row, and the top-25 by
    key IS a probability-∝-weight sample (longer docs here, weight =
    n_chars — the quality-weighted corpus draw a curation pipeline
    runs). At 100 TB this is one scan + a top-k — the keys are mergeable
    (max-heap per partition, AQE's TakeOrdered), no global shuffle of
    the corpus; contrast `sample_rows`/`sample_stratified_by_source`
    which are unweighted."""
    docs = load(spark, sf_dir, "documents")
    h = "cast(conv(substr(md5(concat('wr:', cast(doc_id as string))), 1, 15), 16, 10) as bigint)"
    u = F.expr(f"({h} + 1) / 1152921504606846977.0")
    wt = F.col("n_chars").cast("double")
    k_raw = F.log(u) / wt
    keyed = docs.select(
        "doc_id",
        wt.alias("wt"),
        (F.round(k_raw + F.signum(k_raw) * F.lit(1e-9), 8) + F.lit(0.0)).alias("k"),
    )
    # top-25 as orderBy().limit() — TakeOrderedAndProject (per-partition
    # heaps + driver merge), NOT a single-partition global row_number sort
    return (
        keyed.orderBy(F.desc("k"), "doc_id")
        .limit(25)
        .select(
            "doc_id",
            F.col("wt").cast("long").alias("weight"),
            F.col("k").alias("sample_key"),
        )
    )


@query(
    "sort_skyline_pareto",
    # 2-D strict-dominance skyline via the cumulative-min law: x is
    # dominated iff some strictly-cheaper part is no larger (m_lt <= size)
    # or some equal-price part is strictly smaller (m_eq < size). Both
    # minima live on the |distinct prices| frame; no pair join anywhere.
    oracle="""
    WITH pp AS (
      SELECT p_partkey, p_retailprice, p_size FROM part
    ), per_price AS (
      SELECT p_retailprice, min(p_size) AS m_eq FROM pp GROUP BY p_retailprice
    ), runmin AS (
      SELECT p_retailprice, m_eq,
             min(m_eq) OVER (ORDER BY p_retailprice
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m_lt
      FROM per_price
    )
    SELECT pp.p_partkey, pp.p_retailprice, pp.p_size
    FROM pp JOIN runmin r ON r.p_retailprice = pp.p_retailprice
    WHERE (r.m_lt IS NULL OR r.m_lt > pp.p_size) AND r.m_eq >= pp.p_size
    """,
    category="sort",
)
def sort_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-frontier) query over parts — cheapest-AND-smallest
    strict dominance (Börzsönyi et al. 2001, the classic operator relational
    engines bolt on as SKYLINE OF): a part survives iff no other part is
    ≤ on both price and size with at least one strict. Multi-objective
    shortlisting (supplier choice, config search) that naive SQL writes as
    an O(N²) NOT EXISTS self-join.

    Shape: the 2-D case collapses to ONE cumulative minimum — per distinct
    price take min size, running-min over ascending price, then each part
    checks two scalars (strictly-cheaper min and same-price min). Two
    narrow shuffles on the |distinct prices| frame and a broadcast-size
    join back; no pair join, no N² anywhere — the sort IS the algorithm.
    Duplicate (price, size) points both survive (neither strictly
    dominates), which the equality branch preserves exactly."""
    from pyspark.sql import Window

    pp = load(spark, sf_dir, "part").select("p_partkey", "p_retailprice", "p_size")
    per_price = pp.groupBy("p_retailprice").agg(F.min("p_size").alias("m_eq"))
    w = Window.orderBy("p_retailprice").rowsBetween(Window.unboundedPreceding, -1)
    runmin = per_price.withColumn("m_lt", F.min("m_eq").over(w))
    return (
        pp.join(runmin, "p_retailprice")
        .filter(
            (F.col("m_lt").isNull() | (F.col("m_lt") > F.col("p_size")))
            & (F.col("m_eq") >= F.col("p_size"))
        )
        .select("p_partkey", "p_retailprice", "p_size")
    )


@query(
    "dedup_blocking_reduction_audit",
    # Σ|b|(|b|-1)/2 per candidate blocking scheme — the quantity every
    # blocked pair join in this repo is budgeted by, measured instead of
    # assumed. Pure integer arithmetic until the final ratio.
    oracle="""
    WITH keys AS (
      SELECT 'length_bucket' AS scheme,
             CAST(n_chars // 100 AS VARCHAR) AS bk
      FROM documents
      UNION ALL
      SELECT 'source_lang' AS scheme, source || ':' || lang AS bk
      FROM documents
      UNION ALL
      SELECT 'prefix8' AS scheme, substr(trim(lower(text)), 1, 8) AS bk
      FROM documents
    ), blocks AS (
      SELECT scheme, bk, count(*) AS c FROM keys GROUP BY scheme, bk
    ), agg AS (
      SELECT scheme,
             sum(c) AS n_items,
             count(*) AS n_blocks,
             max(c) AS max_block_size,
             sum(c * (c - 1) / 2) AS cand_pairs
      FROM blocks GROUP BY scheme
    )
    SELECT scheme,
           CAST(n_items AS BIGINT) AS n_items,
           CAST(n_blocks AS BIGINT) AS n_blocks,
           CAST(max_block_size AS BIGINT) AS max_block_size,
           CAST(cand_pairs AS BIGINT) AS cand_pairs,
           round(1.0 - CAST(cand_pairs AS DOUBLE)
                 / (CAST(n_items AS DOUBLE) * (n_items - 1) / 2.0), 6) + 0.0
             AS reduction_ratio
    FROM agg
    """,
    category="dedup",
)
def dedup_blocking_reduction_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-scheme REDUCTION-RATIO audit: for three candidate block
    keys (length bucket, source:lang, 8-char text prefix), the exact
    candidate-pair budget Σ|b|(|b|-1)/2 each scheme would feed a pair
    join, versus the N(N-1)/2 unblocked quadratic — the pre-flight audit
    every blocked dedup in this repo (`dedup_names_levenshtein`, the LSH
    band family, `text_phonetic_confusion_sets`) implicitly budgets by,
    here measured instead of assumed. max_block_size is the skew
    headline: one hot block dominates the pair stage exactly the way one
    hot key dominates a shuffle.

    Shape: one scan fans out to (scheme, key) rows, one map-side-combined
    count per block, one tiny per-scheme rollup. The audit costs a scan
    regardless of corpus size — the pair joins it prices NEVER run here.
    Integer-exact until the final ratio."""
    docs = load(spark, sf_dir, "documents")
    keys = (
        docs.select(
            F.lit("length_bucket").alias("scheme"),
            F.expr("cast(n_chars div 100 as string)").alias("bk"),
        )
        .unionAll(
            docs.select(
                F.lit("source_lang").alias("scheme"),
                F.concat_ws(":", "source", "lang").alias("bk"),
            )
        )
        .unionAll(
            docs.select(
                F.lit("prefix8").alias("scheme"),
                F.substring(F.trim(F.lower(F.col("text"))), 1, 8).alias("bk"),
            )
        )
    )
    blocks = keys.groupBy("scheme", "bk").agg(F.count(F.lit(1)).alias("c"))
    agg = blocks.groupBy("scheme").agg(
        F.sum("c").alias("n_items"),
        F.count(F.lit(1)).alias("n_blocks"),
        F.max("c").alias("max_block_size"),
        F.sum(F.col("c") * (F.col("c") - 1) / 2).cast("long").alias("cand_pairs"),
    )
    return agg.select(
        "scheme",
        F.col("n_items").cast("long").alias("n_items"),
        F.col("n_blocks").cast("long").alias("n_blocks"),
        F.col("max_block_size").cast("long").alias("max_block_size"),
        F.col("cand_pairs").cast("long").alias("cand_pairs"),
        (
            F.round(
                F.lit(1.0)
                - F.col("cand_pairs").cast("double")
                / (F.col("n_items").cast("double") * (F.col("n_items") - 1) / 2.0),
                6,
            )
            + F.lit(0.0)
        ).alias("reduction_ratio"),
    )


@query(
    "dedup_symspell_deletions",
    # SymSpell (Garbe): the 1-deletion neighborhood of a word is a
    # COMPLETE blocking key for edit distance 1 — substitution pairs share
    # the deletion at the edited position, ins/del pairs share the shorter
    # word itself — so the exact-verify join runs over Σ|bucket|², never
    # |vocab|². Both engines build the identical variant set and the same
    # levenshtein DP.
    oracle="""
    WITH w0 AS (
      SELECT DISTINCT t AS word
      FROM documents,
           unnest(string_split_regex(trim(lower(text)), '\\s+')) AS u(t)
      WHERE regexp_matches(t, '^[a-z]{4,10}$')
    ), w AS (
      -- planted positives (r11 audit): the synthetic lexicon has no
      -- edit-distance-1 pairs, so the pair stage only ever verified
      -- empty-vs-empty. Each vocab word of length >= 5 plants its
      -- last-char deletion — a guaranteed distance-1 partner derived
      -- identically in both engines.
      SELECT word FROM w0
      UNION
      SELECT substr(word, 1, length(word) - 1) AS word
      FROM w0 WHERE length(word) >= 5
    ), k AS (
      SELECT word,
             unnest(list_distinct(list_concat([word],
               list_transform(range(1, length(word) + 1),
                 i -> substr(word, 1, i - 1) || substr(word, i + 1)))))
               AS key
      FROM w
    ), p AS (
      SELECT DISTINCT a.word AS word_a, b.word AS word_b
      FROM k a JOIN k b ON a.key = b.key AND a.word < b.word
    )
    SELECT word_a, word_b,
           CAST(levenshtein(word_a, word_b) AS INT) AS dist
    FROM p WHERE levenshtein(word_a, word_b) <= 1
    """,
    category="dedup",
)
def dedup_symspell_deletions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SymSpell DELETION-NEIGHBORHOOD spelling-variant detection over the
    corpus vocabulary: every word keys on itself plus its 1-deletion
    variants, words sharing a key are candidates, and an exact
    levenshtein pass keeps true distance-1 pairs. The 1-deletion index is
    PROVABLY COMPLETE for edit distance 1 (a substitution pair shares the
    deletion at the edited position; an insertion/deletion pair shares
    the shorter word), so unlike the phonetic or prefix blocks this one
    misses nothing — the lossless blocking key of the family, at the cost
    of |word| keys per word instead of 1.

    Scale shape (100 TB): tokens collapse to the Heaps-bounded DISTINCT
    vocabulary first; the key explode is |vocab|·avg_len rows of short
    strings; the pair join is per-key (Σ|bucket|², bucket = words sharing
    one deletion — naturally tiny); exact verify runs only on candidates.
    Reference analogue: the typo-normalization step ahead of
    `dedup_names_levenshtein`'s entity resolution, at corpus scale."""
    docs = load(spark, sf_dir, "documents")
    from etl_aws_spark.text import _dialect as D

    w0 = (
        docs.select(F.explode(F.expr(D.tokens("text", D.SPARK))).alias("word"))
        .filter(F.col("word").rlike("^[a-z]{4,10}$"))
        .distinct()
    )
    # planted positives (r11 audit: the synthetic lexicon has no natural
    # distance-1 pairs): every word of length >= 5 contributes its
    # last-char deletion, derived by the identical expression in the
    # oracle's `w` CTE, so the pair stage is exercised on real rows.
    w = w0.unionByName(
        w0.filter(F.length("word") >= 5).select(
            F.expr("substr(word, 1, length(word) - 1)").alias("word")
        )
    ).distinct()
    k = w.select(
        "word",
        F.explode(
            F.expr(
                "array_distinct(concat(array(word), "
                "transform(sequence(1, length(word)), "
                "i -> concat(substr(word, 1, i - 1), substr(word, i + 1)))))"
            )
        ).alias("key"),
    )
    a = k.select(F.col("word").alias("word_a"), "key")
    b = k.select(F.col("word").alias("word_b"), "key")
    p = (
        a.join(b, "key")
        .filter(F.col("word_a") < F.col("word_b"))
        .select("word_a", "word_b")
        .distinct()
    )
    return p.filter(F.levenshtein("word_a", "word_b") <= 1).select(
        "word_a",
        "word_b",
        F.levenshtein("word_a", "word_b").cast("int").alias("dist"),
    )
