"""functions/sketches.py — portable HLL distinct-count.

The sketch is deterministic (md5-derived registers, integer
arithmetic), so the Spark column pipeline must match a pure-Python
replica of the same algorithm exactly — not just statistically — and
must be invariant to partitioning (register min-agg is order-free).
"""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from optimizing_spark.functions import sketches as SK


def _py_hll(keys) -> float:
    """Pure-Python replica of hll_distinct for one group (unrounded)."""
    m = SK.HLL_M
    regs: dict[int, int] = {}
    for k in keys:
        h = int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16)
        j = h % m
        w = h >> SK.HLL_P
        regs[j] = min(regs.get(j, 1 << 62), w)
    s = 0
    for j in range(m):
        if j in regs:
            mw = regs[j]
            s += 1 if mw == 0 else (1 << mw.bit_length())
        else:
            s += 1 << SK.RHO_MAX
    e_raw = SK.HLL_EST_NUM / float(s)
    v = m - len(regs)
    if e_raw <= 2.5 * m and v > 0:
        return float(m) * math.log(float(m) / v)
    return e_raw


@pytest.fixture(scope="module")
def groups_df(spark):
    # group 'lc': 100 distinct keys x3 copies  -> linear-counting branch
    # group 'raw': 5000 distinct keys          -> raw harmonic-mean branch
    lc = spark.range(300).select(
        F.lit("lc").alias("g"), (F.col("id") % 100).alias("k"))
    raw = spark.range(5000).select(
        F.lit("raw").alias("g"), F.col("id").alias("k"))
    return lc.unionByName(raw)


def test_hll_matches_python_replica_exactly(spark, groups_df):
    got = {r["g"]: r["hll_distinct"]
           for r in SK.hll_distinct(groups_df, ["g"], "k").collect()}
    want = {"lc": _py_hll(range(100)), "raw": _py_hll(range(5000))}
    assert set(got) == set(want)
    for g in want:
        # spark side rounds to 6; the only FP divergence allowed is
        # that rounding plus ln ulps (~1e-13 relative)
        assert got[g] == pytest.approx(want[g], abs=1e-6), g


def test_hll_branches_and_accuracy(spark, groups_df):
    got = {r["g"]: r["hll_distinct"]
           for r in SK.hll_distinct(groups_df, ["g"], "k").collect()}
    # lc group: 100 << 2.5m -> linear counting, typically ~1-3% error
    assert abs(got["lc"] / 100.0 - 1) < 0.10
    # raw group: 5000 >= 2.5m -> harmonic mean, sigma = 1.04/sqrt(256)
    assert abs(got["raw"] / 5000.0 - 1) < 0.20
    # and the branches really differ: raw estimate can't equal the
    # LC formula's range (sanity that the CASE is live)
    assert got["raw"] > 2.5 * SK.HLL_M


def _py_cms(items, probes, d, w):
    """Pure-Python Count-Min replica (build + point queries)."""
    counters: dict[tuple[int, int], int] = {}
    def bucket(i, it):
        h = int(hashlib.md5(f"{i}:{it}".encode()).hexdigest()[:15], 16)
        return h % w
    for it in items:
        for i in range(d):
            c = (i, bucket(i, it))
            counters[c] = counters.get(c, 0) + 1
    return {p: min(counters.get((i, bucket(i, p)), 0) for i in range(d))
            for p in probes}


def test_cms_matches_python_replica_and_overestimates(spark):
    # zipf-ish: item k appears (200 // (k+1)) times, 200 distinct items
    # over w=64 buckets -> real collisions
    rows = [(f"item{k}",) for k in range(200) for _ in range(200 // (k + 1))]
    df = spark.createDataFrame(rows, ["it"])
    exact = {}
    for (it,) in rows:
        exact[it] = exact.get(it, 0) + 1
    counters = SK.cms_build(df, "it", d=4, w=64)
    probes = df.select("it").distinct()
    got = {r["it"]: r["cms_est"]
           for r in SK.cms_estimate(counters, probes, "it", d=4, w=64)
           .collect()}
    want = _py_cms([r[0] for r in rows], list(exact), 4, 64)
    assert got == want
    # the CMS lower bound holds for EVERY item, collisions or not
    assert all(got[it] >= exact[it] for it in exact)
    # and with 200 items in 64 buckets some cell must collide
    assert any(got[it] > exact[it] for it in exact)


def test_cms_absent_item_reports_zero(spark):
    df = spark.createDataFrame([("a",), ("b",)], ["it"])
    counters = SK.cms_build(df, "it", d=4, w=1024)
    probes = spark.createDataFrame([("zzz-not-present",)], ["it"])
    got = SK.cms_estimate(counters, probes, "it", d=4, w=1024).collect()
    assert got[0]["cms_est"] == 0


def test_hll_partitioning_invariance(spark, groups_df):
    a = SK.hll_distinct(groups_df.repartition(1), ["g"], "k").collect()
    b = SK.hll_distinct(groups_df.repartition(17, "k"), ["g"], "k").collect()
    assert sorted((r["g"], r["hll_distinct"]) for r in a) \
        == sorted((r["g"], r["hll_distinct"]) for r in b)


def test_cms_null_items_excluded(spark):
    """NULL items must not reach the hash: Spark's concat_ws would
    silently drop the NULL (hashing the bare row prefix) while the SQL
    twin's string concat propagates NULL — the counters must match the
    NULL-free build exactly."""
    with_nulls = spark.createDataFrame(
        [("a",), (None,), ("b",), (None,), ("a",)], ["it"])
    clean = spark.createDataFrame([("a",), ("b",), ("a",)], ["it"])
    cn = {(r["i"], r["bucket"]): r["n"]
          for r in SK.cms_build(with_nulls, "it", d=4, w=64).collect()}
    cc = {(r["i"], r["bucket"]): r["n"]
          for r in SK.cms_build(clean, "it", d=4, w=64).collect()}
    assert cn == cc


def test_hll_null_keys_excluded(spark):
    """NULL keys must not create a phantom register (COUNT DISTINCT
    semantics): the estimate with NULLs mixed in equals the estimate
    on the non-NULL rows alone."""
    base = spark.range(400).select(
        F.lit("g").alias("g"), F.col("id").alias("k").cast("string"))
    with_nulls = base.unionByName(
        spark.range(37).select(
            F.lit("g").alias("g"), F.lit(None).cast("string").alias("k")))
    a = SK.hll_distinct(base, ["g"], "k").collect()[0]["hll_distinct"]
    b = SK.hll_distinct(with_nulls, ["g"], "k").collect()[0]["hll_distinct"]
    assert a == b
    # all-NULL group: no registers -> no output row for that group
    # (matches SQL COUNT(DISTINCT) over an empty set being groupless
    # here; callers needing 0-rows join back to the dim)
    only_null = spark.range(5).select(
        F.lit("z").alias("g"), F.lit(None).cast("string").alias("k"))
    assert SK.hll_distinct(only_null, ["g"], "k").count() == 0


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------

def _py_bloom_words(keys, k=SK.BLOOM_K, words=SK.BLOOM_WORDS):
    """Pure-Python replica of bloom_build's packed words."""
    n_bits = words * 64
    out = [0] * words
    for key in keys:
        for i in range(k):
            h = int(hashlib.md5(f"B{i}:{key}".encode()).hexdigest()[:15], 16)
            p = h % n_bits
            out[p >> 6] |= 1 << (p & 63)
    # Python ints are unbounded; fold to signed int64 like Spark's long
    return [w - (1 << 64) if w >= (1 << 63) else w for w in out]


def test_bloom_words_match_python_replica(spark):
    keys = list(range(0, 4000, 3))
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = SK.bloom_assemble(SK.bloom_build(df, "k")).collect()[0]["bloom"]
    assert list(got) == _py_bloom_words(keys)


def test_bloom_no_false_negatives_and_fp_rate(spark):
    small = spark.range(0, 3000).select((F.col("id") * 7).alias("k"))
    bl = SK.bloom_assemble(SK.bloom_build(small, "k"))
    # every build key passes
    hits = (small.join(F.broadcast(bl))
            .filter(SK.bloom_might_contain(F.col("k"), F.col("bloom"))))
    assert hits.count() == 3000
    # disjoint probe keys: fp rate near (1 - e^(-kn/m))^k, never huge
    probe = spark.range(0, 20000).select((F.col("id") * 7 + 3).alias("k"))
    fp = (probe.join(F.broadcast(bl))
          .filter(SK.bloom_might_contain(F.col("k"), F.col("bloom")))
          .count())
    n, m, k = 3000, SK.BLOOM_WORDS * 64, SK.BLOOM_K
    expected = (1.0 - math.exp(-k * n / m)) ** k
    assert fp / 20000 < max(4 * expected, 0.01)


def test_bloom_mergeable_by_bit_or(spark):
    """bloom(A ∪ B) == elementwise OR of bloom(A), bloom(B) — the
    property that lets per-partition / per-day blooms roll up."""
    a = spark.range(0, 500).select(F.col("id").alias("k"))
    b = spark.range(400, 900).select(F.col("id").alias("k"))
    wa = SK.bloom_assemble(SK.bloom_build(a, "k")).collect()[0]["bloom"]
    wb = SK.bloom_assemble(SK.bloom_build(b, "k")).collect()[0]["bloom"]
    wu = SK.bloom_assemble(
        SK.bloom_build(a.unionByName(b), "k")).collect()[0]["bloom"]
    assert [x | y for x, y in zip(wa, wb)] == list(wu)


def test_bloom_semi_join_exact_and_prunes_before_exchange(spark):
    """Same rows as the plain left-semi join, and — with auto-broadcast
    off, forcing the exact join onto a shuffle — the bloom prefilter
    sits BELOW the big side's Exchange in the plan (rows are dropped
    map-side before they shuffle: the entire point at 100 TB)."""
    big = spark.range(0, 50000).select((F.col("id") % 9973).alias("k"),
                                       F.col("id").alias("payload"))
    small = spark.range(0, 400).select((F.col("id") * 13).alias("k"))
    expect = sorted(r["payload"]
                    for r in big.join(small, "k", "left_semi").collect())
    with_bloom = SK.bloom_semi_join(big, small, "k")
    assert sorted(r["payload"] for r in with_bloom.collect()) == expect
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = SK.bloom_semi_join(big, small, "k") \
            ._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # the big-side branch that feeds the semi join's Exchange must
    # already contain the bloom membership filter (shiftrightunsigned
    # bit test) — i.e. pruning happens before the shuffle
    exch = plan.find("Exchange hashpartitioning(k#")
    flt = plan.find("shiftrightunsigned")
    assert exch != -1 and flt != -1 and flt > exch, plan[:2000]


def test_bloom_null_keys(spark):
    """NULL build keys set no bits; NULL probe keys never pass (a NULL
    can't equi-join, so the prefilter must not let it through)."""
    small = spark.createDataFrame([(1,), (None,)], "k long")
    bl_words = SK.bloom_assemble(SK.bloom_build(small, "k")).collect()[0]["bloom"]
    assert bl_words == _py_bloom_words([1])
    probe = spark.createDataFrame([(1,), (None,)], "k long")
    bl = SK.bloom_assemble(SK.bloom_build(small, "k"))
    passed = (probe.join(F.broadcast(bl))
              .filter(SK.bloom_might_contain(F.col("k"), F.col("bloom"))))
    assert [r["k"] for r in passed.collect()] == [1]


def test_bloom_anti_join_exact_and_routes_around_exchange(spark):
    """Same rows as the plain left-anti join; with auto-broadcast off,
    the exact anti join's exchange sees only the bloom-POSITIVE
    residue while bloom-negative rows ride the union's shuffle-free
    branch (no false negatives -> provably safe to keep)."""
    big = spark.range(0, 50000).select((F.col("id") % 9973).alias("k"),
                                       F.col("id").alias("payload"))
    small = spark.range(0, 400).select((F.col("id") * 13).alias("k"))
    expect = sorted(r["payload"]
                    for r in big.join(small, "k", "left_anti").collect())
    with_bloom = SK.bloom_anti_join(big, small, "k")
    assert sorted(r["payload"] for r in with_bloom.collect()) == expect
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = SK.bloom_anti_join(big, small, "k") \
            ._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # a Union must exist (the negative branch bypasses the join
    # entirely), and the anti join's big-side Exchange must sit above
    # a bloom bit test (only maybe-members shuffle) — i.e. some
    # shiftrightunsigned filter prints BELOW the first Exchange
    exch = plan.find("Exchange hashpartitioning(k#")
    assert "Union" in plan and exch != -1 \
        and plan.find("shiftrightunsigned", exch) != -1, plan[:2000]


def test_bloom_auto_sizes_to_key_count(spark):
    """A bloom sized for the 8 KB default SATURATES at ~65k keys and
    prunes nothing (the round-5 bench caught exactly this at a 1.3M
    drop set); the join wrappers must auto-size m to the measured key
    count so the prune fraction survives. 60k keys >> 65536 bits/10."""
    assert SK.bloom_size_words(100) == SK.BLOOM_WORDS
    assert SK.bloom_size_words(1_307_552) == 1 << 18  # 2 MB, not 8 KB
    assert SK.bloom_size_words(10**9) == SK.BLOOM_MAX_WORDS  # capped
    small = spark.range(0, 60_000).select(F.col("id").alias("k"))
    big = spark.range(60_000, 260_000).select(F.col("id").alias("k"))
    bloom_lit, words = SK._bloom_literal(small, "k", SK.BLOOM_K, None)
    assert words > SK.BLOOM_WORDS
    passed = big.filter(
        SK.bloom_might_contain_bin(F.col("k"), bloom_lit, SK.BLOOM_K, words)
    ).count()
    # disjoint keys: everything passing is a false positive; at ~10
    # bits/key the fp rate is ~1%, so >95% of the big side is pruned
    assert passed < 0.05 * 200_000, passed
    # and the saturated default would NOT have pruned: sanity-check the
    # regression by forcing the old fixed size
    bl_sat, w_sat = SK._bloom_literal(small, "k", SK.BLOOM_K, SK.BLOOM_WORDS)
    sat_passed = big.filter(
        SK.bloom_might_contain_bin(F.col("k"), bl_sat, SK.BLOOM_K, w_sat)
    ).count()
    assert sat_passed > 0.9 * 200_000, sat_passed


def test_bloom_join_mixed_key_dtypes(spark):
    """xxhash64 (and the md5 path's string render) are DTYPE-sensitive:
    an INT 5 and a LONG 5 hash differently, while the exact join they
    guard coerces the sides and matches — so without a common hash
    cast, true members test bloom-negative and the wrappers silently
    return wrong rows. The wrappers must unify numeric key dtypes for
    hashing (join results stay identical to the plain joins) and
    refuse non-numeric mismatches loudly."""
    big = spark.range(0, 20000).selectExpr(
        "CAST(id % 4973 AS INT) AS k", "id AS payload")
    small = spark.range(0, 300).selectExpr("CAST(id * 13 AS BIGINT) AS k")
    for how, fn in (("left_semi", SK.bloom_semi_join),
                    ("left_anti", SK.bloom_anti_join)):
        expect = sorted(r["payload"]
                        for r in big.join(small, "k", how).collect())
        got = sorted(r["payload"]
                     for r in fn(big, small, "k").collect())
        assert got == expect, how
    # int/double pair unifies through double the same way
    smalld = spark.range(0, 300).selectExpr("CAST(id * 13 AS DOUBLE) AS k")
    expect = sorted(r["payload"]
                    for r in big.join(smalld, "k", "left_semi").collect())
    got = sorted(r["payload"]
                 for r in SK.bloom_semi_join(big, smalld, "k").collect())
    assert got == expect and len(got) > 0
    # non-numeric mismatch: loud error, never silent false negatives
    smalls = spark.range(0, 300).selectExpr("CAST(id * 13 AS STRING) AS k")
    with pytest.raises(ValueError, match="incompatible dtypes"):
        SK.bloom_semi_join(big, smalls, "k")


def test_bloom_small_side_evaluated_once(spark):
    """The wrappers localCheckpoint small's distinct key set, so an
    expensive small-side plan (curate's LSH drop set at 100 TB) runs
    once — not once each for the auto-size count, the bloom build and
    the exact join. Evidence: a non-deterministic small side still
    yields a CONSISTENT join (every use sees the same materialized
    keys)."""
    big = spark.range(0, 2000).selectExpr("id AS k", "id AS payload")
    small = (spark.range(0, 3000)
             .selectExpr("CAST(rand(7) * 2000 AS BIGINT) AS k"))
    out = SK.bloom_anti_join(big, small, "k")
    keys = {r["k"] for r in out.collect()}
    # rerunning the RESULT plan reuses the checkpointed keys: stable
    assert {r["k"] for r in out.collect()} == keys
    # and the two branches partition big exactly (no row lost/duped)
    assert out.count() + big.join(
        out.select("k"), "k", "left_anti").count() == 2000
