"""DuckDB oracle SQL builders for the text/dedup/similarity queries —
generated from the SAME constants as the engine expressions
(functions/text.py) so both sides stay in lockstep.

Portability bridge (verified bit-exact):
  Spark: cast(conv(substr(md5(t),1,15),16,10) as bigint)
  Duck:  CAST(('0x'||substr(md5(t),1,15)) AS BIGINT)
"""

from __future__ import annotations

from ..functions.text import LANG_MARKERS, MERSENNE31, MINHASH_PERMS

M31 = MERSENNE31

TOKS = "list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '')"
H60 = "CAST(('0x' || substr(md5({v}), 1, 15)) AS BIGINT)"
HP = f"({H60} % {M31})"


def token_hashes() -> str:
    return f"list_transform({TOKS}, t -> {HP.format(v='t')})"


def shingles(k: int = 3) -> str:
    parts = " || ' ' || ".join(f"tk[i + {j}]" for j in range(k))
    return (
        f"CASE WHEN len({TOKS}) >= {k} THEN "
        f"list_transform(generate_series(1, len({TOKS}) - {k - 1}), "
        f"i -> (SELECT {parts} FROM (SELECT {TOKS} AS tk))) "
        f"ELSE [] END"
    )


def shingles_inline(k: int = 3, toks_expr: str | None = None) -> str:
    """Shingle list without correlated subquery (portable form)."""
    t = toks_expr or TOKS
    parts = " || ' ' || ".join(f"({t})[i + {j}]" for j in range(k))
    return (
        f"CASE WHEN len({t}) >= {k} THEN "
        f"list_transform(generate_series(1, len({t}) - {k - 1}), i -> {parts}) "
        f"ELSE [] END"
    )


def minhash_exprs(n_perms: int = 16, k: int = 3) -> list[str]:
    """Minhash slots over word k-gram shingles — the same domain the
    engine signs (functions/text.minhash_signature_col)."""
    sh = f"list_transform({shingles_inline(k)}, s -> {HP.format(v='s')})"
    out = []
    for a, b in MINHASH_PERMS[:n_perms]:
        out.append(
            f"coalesce(list_min(list_transform({sh}, h -> (h * {a} + {b}) % {M31})), {M31})"
        )
    return out


def minhash_rows_sql() -> str:
    """(doc_id, perm_id, mh) — one row per signature slot."""
    entries = ", ".join(
        f"{{'perm_id': {i}, 'mh': {e}}}" for i, e in enumerate(minhash_exprs())
    )
    return f"""
        SELECT doc_id, s.perm_id AS perm_id, s.mh AS mh
        FROM (SELECT doc_id, unnest([{entries}]) AS s FROM documents)
    """


def simhash_sql(bits: int = 16) -> str:
    th = token_hashes()
    terms = []
    for b in range(bits):
        vote = (
            f"list_aggregate(list_transform({th}, "
            f"h -> CASE WHEN (h >> {b}) % 2 = 1 THEN 1 ELSE -1 END), 'sum')"
        )
        terms.append(
            f"CASE WHEN len({th}) > 0 AND {vote} >= 0 THEN {1 << b} ELSE 0 END"
        )
    total = " + ".join(terms)
    return f"SELECT doc_id, CAST({total} AS BIGINT) AS sh FROM documents"


def lang_guess_sql() -> str:
    score_cols = []
    for lang, markers in LANG_MARKERS.items():
        marks = ", ".join(f"'{m}'" for m in markers)
        score_cols.append(
            f"len(list_filter({TOKS}, t -> list_contains([{marks}], t))) AS s_{lang}"
        )
    langs = list(LANG_MARKERS)
    # first max wins, in declaration order (matches the engine fold's
    # strictly-greater update rule)
    cases = []
    for i, lang in enumerate(langs):
        conds = [f"s_{lang} >= s_{other}" for other in langs[i + 1:]]
        prev = [f"s_{lang} > s_{other}" for other in langs[:i]]
        cond = " AND ".join(prev + conds) or "TRUE"
        cases.append(f"WHEN {cond} THEN '{lang}'")
    return f"""
        SELECT doc_id, CASE {' '.join(cases)} END AS lg
        FROM (SELECT doc_id, {', '.join(score_cols)} FROM documents)
    """


def band_hash_expr(sig_slice: list[str]) -> str:
    """Fold ((acc * 1048573 + x) % M31) over explicit expressions."""
    acc = "CAST(7 AS BIGINT)"
    for e in sig_slice:
        acc = f"(({acc}) * 1048573 + ({e})) % {M31}"
    return acc
