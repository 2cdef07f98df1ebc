"""Text-analysis primitives for large-scale training-data pipelines:
tokenization, portable token hashing, shingling, language-ID heuristic,
quality scoring, fingerprinting.

Everything is JVM-side column expressions (split/transform/filter/
aggregate — whole-stage where possible); the token hash is md5-based so
a DuckDB oracle can reproduce it bit-for-bit:
    h(t) = bigint(hex_prefix_15(md5(t)))  in [0, 2^60)
    h'(t) = h(t) % MERSENNE31             for overflow-safe permutations
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MERSENNE31 = 2147483647  # 2^31 - 1

# (a, b) permutation constants for minhash (fixed, shared with oracles).
# a < 2^20 so a * h' (h' < 2^31) stays far below 2^63 under ANSI mode.
MINHASH_PERMS: list[tuple[int, int]] = [
    (876847, 1284865837), (225739, 2038074743), (604541, 961748927),
    (214467, 1500450271), (847539, 982451653), (587883, 1413431699),
    (491317, 2147483629), (203161, 122949823), (451707, 86028121),
    (650939, 433024223), (419813, 533000389), (651349, 472882027),
    (707777, 105097513), (28157, 715225741), (74751, 492876863),
    (748941, 334214459),
]


def tokens_col(text: str = "text") -> Column:
    """Whitespace tokens, empties removed (BPE-ish splitting is regex
    here; swap the pattern for a real tokenizer's pre-tokenize rule)."""
    return F.expr(f"filter(split(trim({text}), '\\\\s+'), t -> t != '')")


def token_hash_expr(tok_expr: str) -> str:
    """SQL fragment: portable 60-bit md5-prefix hash of a token."""
    return f"cast(conv(substr(md5({tok_expr}), 1, 15), 16, 10) as bigint)"


def token_hashes_col(text: str = "text", mod: int = MERSENNE31) -> Column:
    """Array of h'(token) for minhash/simhash (order preserved)."""
    return F.expr(
        f"transform(filter(split(trim({text}), '\\\\s+'), t -> t != ''), "
        f"t -> {token_hash_expr('t')} % {mod})"
    )


def shingles_col(text: str = "text", k: int = 3) -> Column:
    """Word k-gram shingle strings (space-joined). Spark arrays are
    0-indexed via element_at(arr, i+1); we use bracket-free element_at
    so the DuckDB twin (1-indexed lists) lines up with i+1..i+k."""
    toks = f"filter(split(trim({text}), '\\\\s+'), t -> t != '')"
    parts = ", ' ', ".join(f"element_at({toks}, i + {j})" for j in range(1, k + 1))
    return F.expr(
        f"CASE WHEN size({toks}) >= {k} THEN "
        f"transform(sequence(0, size({toks}) - {k}), i -> concat({parts})) "
        f"ELSE array() END"
    )


def minhash_signature_col(text: str = "text", n_perms: int = 16) -> Column:
    """Array of n_perms minhash values over token hashes:
    sig_i = min over tokens of (a_i * h'(t) + b_i) % M31.
    Empty docs get M31 (sentinel) in every slot."""
    hashes = f"transform(filter(split(trim({text}), '\\\\s+'), t -> t != ''), " \
             f"t -> {token_hash_expr('t')} % {MERSENNE31})"
    parts = []
    for a, b in MINHASH_PERMS[:n_perms]:
        parts.append(
            f"coalesce(array_min(transform({hashes}, "
            f"h -> (h * {a} + {b}) % {MERSENNE31})), {MERSENNE31})"
        )
    return F.expr("array(" + ", ".join(parts) + ")")


def simhash_col(text: str = "text", bits: int = 16) -> Column:
    """bits-wide simhash over token hashes: bit b set iff
    sum over tokens of (2*bit_b(h') - 1) >= 0 (ties -> set, empty -> 0)."""
    hashes = f"transform(filter(split(trim({text}), '\\\\s+'), t -> t != ''), " \
             f"t -> {token_hash_expr('t')} % {MERSENNE31})"
    terms = []
    for b in range(bits):
        vote = (
            f"aggregate({hashes}, 0, "
            f"(acc, h) -> acc + CASE WHEN (h >> {b}) % 2 = 1 THEN 1 ELSE -1 END)"
        )
        terms.append(f"CASE WHEN size({hashes}) > 0 AND {vote} >= 0 THEN {1 << b} ELSE 0 END")
    return F.expr("(" + " + ".join(terms) + ")").cast("long")


# Language-ID heuristic: stopword-marker votes (deterministic; a real
# pipeline would use fastText — this is the n-gram-heuristic stand-in).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "es": ("el", "la", "de", "y"),
    "fr": ("le", "la", "de", "et"),
    "de": ("der", "die", "das", "und"),
    "zh": ("zh0", "zh1", "zh2", "zh3"),
}


def lang_guess_col(text: str = "text") -> Column:
    toks = f"filter(split(trim({text}), '\\\\s+'), t -> t != '')"
    scores = []
    for lang, markers in LANG_MARKERS.items():
        marks = ", ".join(f"'{m}'" for m in markers)
        scores.append(
            f"named_struct('score', size(filter({toks}, t -> array_contains(array({marks}), t))), "
            f"'lang', '{lang}')"
        )
    # max by (score, lang) — lang desc tie-break is arbitrary but fixed
    arr = "array(" + ", ".join(scores) + ")"
    return F.expr(
        f"aggregate({arr}, named_struct('score', -1, 'lang', ''), "
        f"(acc, s) -> CASE WHEN s.score > acc.score THEN s ELSE acc END).lang"
    )


def quality_cols(df: DataFrame, text: str = "text") -> DataFrame:
    """Integer quality components + a deterministic integer score:
    n_tokens, n_uniq, total token chars, stopword hits."""
    toks = tokens_col(text)
    out = df.withColumn("_toks", toks)
    stop = "array('the','a','of','and','in','to')"
    return (
        out.withColumn("n_tokens", F.size("_toks"))
        .withColumn("n_uniq", F.size(F.array_distinct("_toks")))
        .withColumn("tok_chars", F.expr("aggregate(_toks, 0, (acc, t) -> acc + length(t))"))
        .withColumn("stop_hits", F.expr(f"size(filter(_toks, t -> array_contains({stop}, t)))"))
        .withColumn(
            "quality_score",
            F.col("n_tokens") + 2 * F.col("n_uniq") + F.col("stop_hits")
            - F.floor(F.col("tok_chars") / 10).cast("int"),
        )
        .drop("_toks")
    )


def fingerprint_cols(df: DataFrame, text: str = "text", k: int = 3) -> DataFrame:
    """Document fingerprints: full-text md5 (exact dup key) + min-shingle
    hash (winnowing-style content fingerprint robust to reordering at
    the edges)."""
    sh = shingles_col(text, k)
    out = df.withColumn("_sh", sh)
    return (
        out.withColumn("fp_md5", F.md5(F.col(text)))
        .withColumn(
            "fp_shingle",
            F.expr(
                f"coalesce(array_min(transform(_sh, s -> {token_hash_expr('s')})), -1)"
            ),
        )
        .drop("_sh")
    )
