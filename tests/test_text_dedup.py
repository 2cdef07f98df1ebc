"""Text analysis + dedup operators vs pure-Python oracles."""

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from optimizing_spark.functions import text as TX
from optimizing_spark.operators import dedup

DOCS = pd.DataFrame({
    "doc_id": list(range(8)),
    "text": [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",      # near-dup of 0
        "completely different words entirely here now",
        "the quick brown fox jumps over the lazy dog",      # exact dup of 0
        "data table scan filter join group sort merge",
        "data table scan filter join group sort merge now", # near-dup of 4
        "",                                                  # empty
        "one",                                               # single token
    ],
})


def _h60(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)


def _hp(tok: str) -> int:
    return _h60(tok) % TX.MERSENNE31


def _toks(s: str) -> list[str]:
    return [t for t in s.strip().split() if t]


def _shingles(s: str, k: int = 3) -> list[str]:
    t = _toks(s)
    return [" ".join(t[i:i + k]) for i in range(len(t) - k + 1)] if len(t) >= k else []


def _minhash(s: str, n: int = 16) -> list[int]:
    # shingle-domain minhash (same sets the exact-jaccard verify uses)
    hs = [_hp(t) for t in _shingles(s)]
    out = []
    for a, b in TX.MINHASH_PERMS[:n]:
        out.append(min(((a * h + b) % TX.MERSENNE31 for h in hs), default=TX.MERSENNE31))
    return out


def _simhash(s: str, bits: int = 16) -> int:
    hs = [_hp(t) for t in _toks(s)]
    if not hs:
        return 0
    v = 0
    for b in range(bits):
        vote = sum(1 if (h >> b) & 1 else -1 for h in hs)
        if vote >= 0:
            v |= 1 << b
    return v


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS)


def test_minhash_signature_matches_oracle(spark, docs_df):
    got = dedup.minhash_signatures(docs_df).select("doc_id", "mh_sig").toPandas() \
        .set_index("doc_id").mh_sig
    for did in DOCS.doc_id:
        assert list(got[did]) == _minhash(DOCS.text[did]), f"doc {did}"


def test_simhash_matches_oracle(spark, docs_df):
    got = docs_df.select("doc_id", TX.simhash_col().alias("sh")).toPandas() \
        .set_index("doc_id").sh
    for did in DOCS.doc_id:
        assert got[did] == _simhash(DOCS.text[did]), f"doc {did}"


def test_shingles_match_oracle(spark, docs_df):
    got = docs_df.select("doc_id", TX.shingles_col().alias("sh")).toPandas() \
        .set_index("doc_id").sh
    for did in DOCS.doc_id:
        assert list(got[did]) == _shingles(DOCS.text[did]), f"doc {did}"


def test_exact_dedup(spark, docs_df):
    out = dedup.exact_dedup(docs_df).toPandas()
    assert sorted(out.doc_id) == [0, 1, 2, 4, 5, 6, 7]  # doc 3 removed (dup of 0)


def test_minhash_lsh_finds_near_dups(spark, docs_df):
    pairs = dedup.minhash_lsh_pairs(docs_df, jaccard_num=5, jaccard_den=10) \
        .toPandas()
    got = set(zip(pairs.a, pairs.b))
    # exact dup pair must be found; near-dups (0,1) and (4,5) share most shingles
    assert (0, 3) in got
    for a, b in got:
        sa, sb = set(_shingles(DOCS.text[a])), set(_shingles(DOCS.text[b]))
        inter = len(sa & sb)
        uni = len(sa | sb)
        assert inter * 10 >= uni * 5  # every reported pair really passes
    # verified counts are exact
    for r in pairs.itertuples():
        sa, sb = set(_shingles(DOCS.text[r.a])), set(_shingles(DOCS.text[r.b]))
        assert r.inter == len(sa & sb) and r.uni == len(sa | sb)


def test_simhash_pairs(spark, docs_df):
    out = dedup.simhash_pairs(docs_df, max_hamming=4).toPandas()
    got = {(r.a, r.b): r.hamming for r in out.itertuples()}
    assert got[(0, 3)] == 0  # identical text -> identical simhash
    for (a, b), ham in got.items():
        assert bin(_simhash(DOCS.text[a]) ^ _simhash(DOCS.text[b])).count("1") == ham


def test_quality_and_lang(spark, docs_df):
    q = TX.quality_cols(docs_df).toPandas().set_index("doc_id")
    for did in DOCS.doc_id:
        toks = _toks(DOCS.text[did])
        assert q.loc[did, "n_tokens"] == len(toks)
        assert q.loc[did, "n_uniq"] == len(set(toks))
        assert q.loc[did, "tok_chars"] == sum(len(t) for t in toks)
    lang = docs_df.select("doc_id", TX.lang_guess_col().alias("lg")).toPandas()
    assert (lang.lg != "").all()
    # doc 0 contains 'the' twice and 'over' -> english markers dominate
    assert lang.set_index("doc_id").lg[0] == "en"


def test_repetition_cols(spark, docs_df):
    from collections import Counter
    rep = TX.repetition_cols(docs_df, k=2).toPandas().set_index("doc_id")
    for did in DOCS.doc_id:
        grams = _shingles(DOCS.text[did], 2)
        c = Counter(grams)
        dup = sum(v for v in c.values() if v >= 2)
        assert rep.loc[did, "n_grams"] == len(grams)
        assert rep.loc[did, "top_gram_n"] == (max(c.values()) if c else 0)
        assert rep.loc[did, "dup_gram_n"] == dup
        want = round(dup / len(grams), 6) if grams else 0.0
        assert abs(rep.loc[did, "dup_frac_r6"] - want) < 1e-9
    # a genuinely repetitive doc: 'spam spam' x3 of 4 bigrams
    boiler = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": ["spam spam spam spam ham"]}))
    r = TX.repetition_cols(boiler, k=2).toPandas().iloc[0]
    assert (r.n_grams, r.top_gram_n, r.dup_gram_n) == (4, 3, 3)
    assert abs(r.dup_frac_r6 - 0.75) < 1e-9


def test_curate_corpus(spark, docs_df):
    STOP = {"the", "a", "of", "and", "in", "to"}

    def qual(s):
        t = _toks(s)
        return (len(t) + 2 * len(set(t)) + sum(x in STOP for x in t)
                - sum(len(x) for x in t) // 10)

    lg = docs_df.select("doc_id", TX.lang_guess_col().alias("lg")) \
        .toPandas().set_index("doc_id").lg
    out = dedup.curate_corpus(
        docs_df, min_tokens=8, min_quality=10, lang="en",
        jaccard_num=5, jaccard_den=10).toPandas()
    # python oracle for the composition: gates -> exact dedup -> drop b of
    # every near-dup pair (pairs from the independently-tested LSH op)
    keep = [d for d in DOCS.doc_id
            if len(_toks(DOCS.text[d])) >= 8 and qual(DOCS.text[d]) >= 10
            and lg[d] == "en"]
    first_per_text = {}
    for d in keep:
        first_per_text.setdefault(DOCS.text[d], d)
    ded = set(first_per_text.values())
    pairs = dedup.minhash_lsh_pairs(
        docs_df, jaccard_num=5, jaccard_den=10).toPandas()
    expected = ded - set(pairs.b)
    assert set(out.doc_id) == expected
    assert expected, "gates must leave survivors or the test is vacuous"
    byid = out.set_index("doc_id")  # itertuples mangles the _lg name
    for d in expected:
        assert byid.loc[d, "n_tokens"] == len(_toks(DOCS.text[d]))
        assert byid.loc[d, "quality_score"] == qual(DOCS.text[d])
        assert byid.loc[d, "_lg"] == lg[d]


def test_fingerprints(spark, docs_df):
    fp = TX.fingerprint_cols(docs_df).toPandas().set_index("doc_id")
    assert fp.fp_md5[0] == fp.fp_md5[3] != fp.fp_md5[1]
    assert fp.fp_md5[0] == hashlib.md5(DOCS.text[0].encode()).hexdigest()
    sh = _shingles(DOCS.text[0])
    assert fp.fp_shingle[0] == min(_h60(s) for s in sh)
    assert fp.fp_shingle[6] == -1  # empty doc sentinel


def _uf_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min id per component
    roots = [find(i) for i in range(n_nodes)]
    comp_min = {}
    for i, r in enumerate(roots):
        comp_min[r] = min(comp_min.get(r, i), i)
    return {i: comp_min[roots[i]] for i in range(n_nodes)}


@pytest.mark.parametrize("edges,n", [
    ([], 5),                                        # no pairs: all isolated
    ([(0, 1), (1, 2), (3, 4)], 6),                  # two components + isolate
    ([(i, i + 1) for i in range(49)], 50),          # 50-chain: pointer jumping
    ([(9, 4), (4, 7), (2, 8), (8, 9), (0, 5)], 12), # shuffled merge order
])
def test_connected_components_matches_union_find(spark, edges, n):
    pairs = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges] or [(0, 0)], "a long, b long")
    if not edges:
        pairs = pairs.limit(0)
    verts = spark.range(n).withColumnRenamed("id", "doc_id")
    got = dedup.connected_components(
        pairs, vertices=verts, key="doc_id").toPandas()
    want = _uf_components(n, edges)
    assert dict(zip(got.doc_id, got.cluster_id)) == want
    # a 50-link chain must converge well under the O(diameter) bound —
    # pointer jumping halves depth per round (log2(50) ~ 6 rounds);
    # max_iter=10 would NOT suffice for plain propagation
    if len(edges) == 49:
        got2 = dedup.connected_components(
            pairs, vertices=verts, key="doc_id", max_iter=10).toPandas()
        assert set(got2.cluster_id) == {0}


def test_curate_corpus_bloom_prune_identical(spark, docs_df):
    """bloom_prune=True must be a pure physical-plan change: the
    survivor set equals the default anti-join path exactly."""
    base = dedup.curate_corpus(
        docs_df, min_tokens=8, min_quality=10, lang="en",
        jaccard_num=5, jaccard_den=10)
    pruned = dedup.curate_corpus(
        docs_df, min_tokens=8, min_quality=10, lang="en",
        bloom_prune=True, jaccard_num=5, jaccard_den=10)
    a = sorted(r["doc_id"] for r in base.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in pruned.select("doc_id").collect())
    assert a == b and len(a) > 0
