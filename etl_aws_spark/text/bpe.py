"""Byte-pair-encoding token counting with an engine/oracle-shared merge
chain.

Real training-data budgeting is tokenizer-based, not whitespace-based
(reference analogue: none — the reference never tokenizes; this is the
LLM-pipeline extension tier). The algorithm is the public GPT-2-style BPE
apply step: pre-tokenize with the word/number/punct regex, then fuse
adjacent symbol pairs in merge-rank order.

The engine representation is chosen so the WHOLE apply step stays
JVM-side and SQL-replayable: a word is wrapped one-symbol-per-bracket
(``the`` → ``<t><h><e>``) and each merge ``(a, b)`` is one string
``replace('<a><b>' → '<ab>')``. Because fusions can only DESTROY pair
adjacencies, never create operands of earlier-ranked merges (operands of
merge k are always products of merges < k in a well-formed table), one
left-to-right replace pass per merge in rank order is exactly the
classic min-rank merge loop — the property test checks this against the
reference per-word loop implementation. Token count = number of ``<``
markers left.

Scale shape: per-row string expressions inside whole-stage codegen — no
shuffle, no Python, no broadcast state. The replace chain embeds the
merge table into the plan (O(|merges|) expression nodes), which is the
right trade at the tens-to-hundreds-of-merges scale used here; for a
production 50k-merge vocabulary, switch to :func:`bpe_token_count_pandas`
— an Arrow-batched mapInPandas with the merges dict broadcast per worker
(same algorithm, same counts; equality unit-tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SPARK = "spark"
DUCK = "duckdb"

# Pre-token split, the GPT-2 shape: letter runs, digit runs, single
# non-space punctuation. Only letter runs go through the merge chain
# (lowercased); digit runs and punctuation count 1 symbol each — their
# wrapped form could collide with the '<'/'>' markers otherwise.
PRETOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Deterministic merge table in rank order (operands of every merge are
# single chars or products of strictly earlier merges — well-formed).
MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("e", "r"),
    ("o", "n"), ("r", "e"), ("a", "t"), ("e", "n"), ("o", "r"),
    ("an", "d"), ("t", "o"), ("o", "u"), ("i", "s"), ("e", "d"),
    ("in", "g"), ("a", "r"), ("o", "f"), ("e", "s"), ("s", "t"),
    ("i", "t"), ("a", "l"), ("l", "e"), ("c", "h"), ("r", "o"),
    ("a", "s"), ("w", "h"), ("o", "m"), ("th", "at"), ("w", "as"),
    ("e", "a"), ("h", "a"), ("ha", "t"), ("u", "s"), ("e", "l"),
]


def wrapped_word_sql(word_expr: str, dialect: str) -> str:
    """``the`` → ``<t><h><e>`` (lowercased), via a global single-char
    regexp_replace in either dialect."""
    if dialect == SPARK:
        return f"regexp_replace(lower({word_expr}), '(.)', '<$1>')"
    return f"regexp_replace(lower({word_expr}), '(.)', '<\\1>', 'g')"


def merge_chain_sql(expr: str, dialect: str) -> str:
    """Apply the whole merge table as nested replaces, rank order
    innermost-first. Identical text shape in both dialects."""
    for a, b in MERGES:
        expr = f"replace({expr}, '<{a}><{b}>', '<{a}{b}>')"
    return expr


def word_token_count_sql(word_expr: str, dialect: str) -> str:
    """BPE token count of one alphabetic word: '<' markers remaining
    after the merge chain."""
    merged = merge_chain_sql(wrapped_word_sql(word_expr, dialect), dialect)
    return f"(length({merged}) - length(replace({merged}, '<', '')))"


def doc_token_count_sql(text_col: str, dialect: str) -> str:
    """Total BPE token count of a document: fold the pre-token list;
    alphabetic words run the merge chain, everything else counts 1."""
    alpha = "w rlike '^[A-Za-z]+$'" if dialect == SPARK else "regexp_full_match(w, '[A-Za-z]+')"
    per_word = f"CASE WHEN {alpha} THEN {word_token_count_sql('w', dialect)} ELSE 1 END"
    if dialect == SPARK:
        # Spark SQL string literals consume backslash escapes; DuckDB's
        # standard-SQL strings do not — double it for Spark only.
        words = f"regexp_extract_all({text_col}, '{PRETOKEN_RE.replace(chr(92), chr(92) * 2)}', 0)"
        return (
            f"aggregate({words}, cast(0 as bigint), "
            f"(acc, w) -> acc + cast({per_word} as bigint))"
        )
    words = f"regexp_extract_all({text_col}, '{PRETOKEN_RE}')"
    return (
        f"CAST(coalesce(list_sum(list_transform({words}, "
        f"w -> {per_word})), 0) AS BIGINT)"
    )


def word_single_count_sql(word_expr: str, dialect: str) -> str:
    """Count of UNMERGED single-character tokens left in one alphabetic
    word after the merge chain — the `<c>` groups. A high share means the
    vocabulary fails to cover the word (the OOV/fragmentation signal)."""
    merged = merge_chain_sql(wrapped_word_sql(word_expr, dialect), dialect)
    if dialect == SPARK:
        return f"size(regexp_extract_all({merged}, '<[^<>]>', 0))"
    return f"len(regexp_extract_all({merged}, '<[^<>]>'))"


def doc_single_count_sql(text_col: str, dialect: str) -> str:
    """Total unmerged single-char token count of a document (alphabetic
    words only; digit/punct pre-tokens are atomic by construction)."""
    alpha = "w rlike '^[A-Za-z]+$'" if dialect == SPARK else "regexp_full_match(w, '[A-Za-z]+')"
    per_word = f"CASE WHEN {alpha} THEN {word_single_count_sql('w', dialect)} ELSE 0 END"
    if dialect == SPARK:
        words = f"regexp_extract_all({text_col}, '{PRETOKEN_RE.replace(chr(92), chr(92) * 2)}', 0)"
        return (
            f"aggregate({words}, cast(0 as bigint), "
            f"(acc, w) -> acc + cast({per_word} as bigint))"
        )
    words = f"regexp_extract_all({text_col}, '{PRETOKEN_RE}')"
    return (
        f"CAST(coalesce(list_sum(list_transform({words}, "
        f"w -> {per_word})), 0) AS BIGINT)"
    )


def bpe_token_count(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_tokens_bpe) per document — the pure-expression path."""
    return df.select(
        F.col(id_col),
        F.expr(doc_token_count_sql(text_col, SPARK)).alias("n_tokens_bpe"),
    )


# --- reference per-word merge loop (the textbook GPT-2 apply step) --------


def _bpe_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Classic min-rank merge loop on one lowercased word."""
    symbols = list(word)
    while len(symbols) > 1:
        best_rank, best = None, None
        for pair in zip(symbols, symbols[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, pair
        if best is None:
            break
        a, b = best
        out, i = [], 0
        while i < len(symbols):
            if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(symbols[i])
                i += 1
        symbols = out
    return symbols


def bpe_token_count_pandas(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """mapInPandas twin of :func:`bpe_token_count` for production-size
    merge tables: the merges dict ships once per worker (closure
    broadcast), counts computed with the classic loop. Same counts as the
    expression path by the rank-order/replace equivalence (unit-tested)."""
    import re

    ranks = {pair: i for i, pair in enumerate(MERGES)}
    pat = re.compile(PRETOKEN_RE)
    alpha = re.compile(r"[A-Za-z]+\Z")

    def run(batches):
        import pandas as pd

        for pdf in batches:
            counts = []
            for text in pdf[text_col]:
                n = 0
                for w in pat.findall(text or ""):
                    n += len(_bpe_word(w.lower(), ranks)) if alpha.match(w) else 1
                counts.append(n)
            yield pd.DataFrame({id_col: pdf[id_col].values, "n_tokens_bpe": counts})

    return df.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} bigint, n_tokens_bpe bigint"
    )


# --- BPE merge-table TRAINING (the learning half of the tokenizer) --------


def train_merges(
    df: DataFrame,
    text_col: str,
    n_merges: int = 12,
) -> list[tuple[str, str, int]]:
    """Learn a BPE merge table from the corpus — the training half that
    :data:`MERGES` (and any production tokenizer) comes from. Classic
    Sennrich 2016 algorithm on the word-frequency table: repeatedly count
    weighted adjacent symbol pairs and fuse the most frequent one.

    Scale shape is the textbook distributed form: the corpus collapses
    ONCE to the word-TYPE frequency table (one narrow (word, count)
    shuffle — at 100 TB this is ~10M rows however big the corpus), which
    is localCheckpoint-ed; each round is then one map-side-combined pair
    aggregate over that small frame plus a ONE-ROW argmax collect (the
    bounded-model-state pattern — driver traffic is one (a, b, count)
    triple per round). The evolving segmentation rides the same
    bracket-wrapped string representation as the apply step, so each
    learned merge is applied with one literal replace — no re-tokenize.

    Determinism: ties on pair count break lexicographically on (a, b) in
    both engines. Fixed n_merges, no data-dependent early stop, so an
    unrolled SQL oracle can replay training exactly.

    Returns [(a, b, weighted_count), ...] in learned rank order.
    """
    words = (
        df.select(
            F.explode(
                F.expr(
                    f"regexp_extract_all({text_col}, "
                    f"'{PRETOKEN_RE.replace(chr(92), chr(92) * 2)}', 0)"
                )
            ).alias("w")
        )
        .filter(F.expr("w rlike '^[A-Za-z]+$'"))
        .select(F.lower("w").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "cnt",
            F.expr("regexp_replace(w, '(.)', '<$1>')").alias("s"),
        )
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str, int]] = []
    cur = words
    for _ in range(n_merges):
        pairs = (
            cur.select(
                "cnt", F.expr("regexp_extract_all(s, '[^<>]+', 0)").alias("_sym")
            )
            .select(
                "cnt",
                F.explode(
                    F.expr(
                        "zip_with(slice(_sym, 1, greatest(size(_sym) - 1, 0)), "
                        "slice(_sym, 2, greatest(size(_sym) - 1, 0)), "
                        "(x, y) -> struct(x as a, y as b))"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("c"))
        )
        top = pairs.orderBy(F.desc("c"), F.asc("a"), F.asc("b")).limit(1).collect()
        if not top:
            break
        a, b, c = top[0]["a"], top[0]["b"], int(top[0]["c"])
        merges.append((a, b, c))
        cur = cur.select(
            "cnt",
            F.expr(f"replace(s, '<{a}><{b}>', '<{a}{b}>')").alias("s"),
        ).localCheckpoint(eager=True)
    return merges
