"""Render identical text-hash expressions for Spark SQL and DuckDB.

Every near-dup operator needs token/shingle hashes that agree across the
engine (Spark) and the oracle (DuckDB). md5 hex is identical in both; the
first 15 hex chars parse into a non-negative 60-bit BIGINT in both. These
helpers emit the dialect-specific SQL text for the shared computation, so
the operator and its oracle can never drift.
"""

from __future__ import annotations

SPARK = "spark"
DUCK = "duckdb"


def tokens(col: str, dialect: str) -> str:
    """Whitespace tokens of lowercased trimmed text (the corpus is
    space-separated; `\\s+` covers stray tabs/newlines)."""
    if dialect == SPARK:
        return f"split(trim(lower({col})), '\\\\s+')"
    return f"string_split_regex(trim(lower({col})), '\\s+')"


def distinct_tokens(col: str, dialect: str) -> str:
    fn = "array_distinct" if dialect == SPARK else "list_distinct"
    return f"{fn}({tokens(col, dialect)})"


def hash60(expr: str, dialect: str) -> str:
    """60-bit integer hash of a string expression, identical across engines."""
    if dialect == SPARK:
        return f"cast(conv(substr(md5({expr}), 1, 15), 16, 10) as bigint)"
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def hashed_token_array(col: str, seed: str, dialect: str) -> str:
    """Distinct tokens → 60-bit hashes, salted with ``seed``."""
    fn = "transform" if dialect == SPARK else "list_transform"
    h = hash60(f"concat('{seed}:', t)", dialect)
    return f"{fn}({distinct_tokens(col, dialect)}, t -> {h})"


def minhash(col: str, seed: str, dialect: str) -> str:
    """Min of the salted token hashes — one MinHash signature component.
    No explode: the min folds inside the row. (Educational form — it
    re-hashes every token per seed; `minhash_perms` is the production
    form: one md5 per token + cheap linear permutations.)"""
    fn = "array_min" if dialect == SPARK else "list_min"
    return f"{fn}({hashed_token_array(col, seed, dialect)})"


# Universal-hash permutation family over the Mersenne prime 2^31-1:
# h_i(x) = (a_i·x + b_i) mod p with md5-derived constants. a_i·x stays
# below 2^62, so the arithmetic is exact in both engines' BIGINTs.
MERSENNE_P = (1 << 31) - 1


def perm_constants(n: int) -> list[tuple[int, int]]:
    import hashlib

    out = []
    for i in range(n):
        a = int.from_bytes(hashlib.md5(f"perm_a{i}".encode()).digest()[:8], "big")
        b = int.from_bytes(hashlib.md5(f"perm_b{i}".encode()).digest()[:8], "big")
        out.append((a % (MERSENNE_P - 1) + 1, b % MERSENNE_P))
    return out


def token_base_hash(tok_expr: str, dialect: str) -> str:
    """One 31-bit base hash per token (single md5); permutations are
    integer arithmetic on top."""
    return f"({hash60(tok_expr, dialect)} % {MERSENNE_P})"


def perm_min(base_col: str, a: int, b: int) -> str:
    """min over rows of (a·h + b) mod p — identical text in both dialects."""
    return f"min(({a} * {base_col} + {b}) % {MERSENNE_P})"


def _shingle_array(col: str, n: int, dialect: str) -> str:
    """n-word shingles (space-joined) in document order, with duplicates.

    Spark form: nested ``zip_with`` over shifted slices — the token array
    expression appears a constant number of times (Catalyst re-inlines
    subexpressions into lambdas, so an ``element_at(toks, i+j)`` formulation
    re-tokenizes the document once per shingle element; measured ~10× slower
    on 300-shingle docs)."""
    toks = tokens(col, dialect)
    if dialect == SPARK:
        # slice k (1-based shift k-1): exactly size-n+1 elements each, so
        # zip_with never null-pads
        def sl(k: int) -> str:
            return f"slice({toks}, {k}, size({toks}) - {n} + 1)"

        acc = sl(1)
        for k in range(2, n + 1):
            acc = f"zip_with({acc}, {sl(k)}, (x, y) -> concat(x, ' ', y))"
        return acc
    parts = " || ' ' || ".join(f"({toks})[i + {j + 1}]" for j in range(n))
    return f"list_transform(range(0, len({toks}) - {n} + 1), i -> {parts})"


def word_shingles(col: str, n: int, dialect: str) -> str:
    """Array of n-word shingles (space-joined), distinct."""
    fn = "array_distinct" if dialect == SPARK else "list_distinct"
    return f"{fn}({_shingle_array(col, n, dialect)})"


def shingle_hashes(col: str, n: int, dialect: str) -> str:
    """Distinct n-word shingles → 60-bit hashes."""
    fn = "transform" if dialect == SPARK else "list_transform"
    return f"{fn}({word_shingles(col, n, dialect)}, s -> {hash60('s', dialect)})"


def simhash_bits(hts_expr: str, nbits: int, dialect: str) -> str:
    """SimHash over a hashed-token-array expression: per bit j, sum ±1 over
    tokens by bit j of the token hash; assemble the sign bits into an
    integer. Rendered as ``nbits`` independent (non-nested) aggregates."""
    terms = []
    for j in range(nbits):
        if dialect == SPARK:
            vote = (
                f"aggregate({hts_expr}, 0, "
                f"(acc, h) -> acc + IF(((shiftright(h, {j}) & 1) = 1), 1, -1))"
            )
        else:
            vote = (
                f"list_sum(list_transform({hts_expr}, "
                f"h -> CASE WHEN ((h >> {j}) & 1) = 1 THEN 1 ELSE -1 END))"
            )
        terms.append(f"CASE WHEN {vote} > 0 THEN {1 << j} ELSE 0 END")
    total = " + ".join(terms)
    return f"cast({total} as bigint)" if dialect == SPARK else f"CAST({total} AS BIGINT)"


def winnow_fingerprints(col: str, k: int, w: int, dialect: str) -> str:
    """Winnowing fingerprint set: hash k-word shingles (in document order,
    NOT distinct), take the min hash of every length-w window, dedupe."""
    grams = _shingle_array(col, k, dialect)
    if dialect == SPARK:
        hts = f"transform({grams}, s -> {hash60('s', dialect)})"
        return (
            f"array_distinct(transform(sequence(1, size({hts}) - {w} + 1), "
            f"i -> array_min(slice({hts}, i, {w}))))"
        )
    hts = f"list_transform({grams}, s -> {hash60('s', dialect)})"
    return (
        f"list_distinct(list_transform(range(1, len({hts}) - {w} + 2), "
        f"i -> list_min(({hts})[i:i + {w} - 1])))"
    )


def soundex_simplified(col: str, dialect: str) -> str:
    """Simplified soundex code of a lowercase alphabetic word — IDENTICAL
    string-op chain in both dialects (the h/w separator rule of full
    soundex is deliberately dropped: h/w/y map to the vowel class, the
    common 'simplified soundex' variant), so the code is an exact
    cross-engine phonetic blocking key. translate() maps letters to the
    standard digit classes, runs of the same consonant class collapse
    (regexp, no backreferences — RE2-safe), the vowel class is stripped,
    the first letter's own class digit is dropped, and the code pads to
    letter + 3 digits."""
    m = (
        f"translate({col}, 'abcdefghijklmnopqrstuvwxyz', "
        f"'01230120022455012623010202')"
    )
    g = ", 'g'" if dialect == DUCK else ""
    mc = m
    for d in "123456":
        mc = f"regexp_replace({mc}, '{d}+', '{d}'{g})"
    return (
        f"(upper(substr({col}, 1, 1)) || substr(rpad("
        f"CASE WHEN substr({m}, 1, 1) <> '0' "
        f"THEN substr(replace({mc}, '0', ''), 2) "
        f"ELSE replace({mc}, '0', '') END, 3, '0'), 1, 3))"
    )
