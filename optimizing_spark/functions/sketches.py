"""Portable sketches: HyperLogLog distinct-count and Count-Min
frequency as pure column expressions, deterministic and
engine-portable.

Spark's own ``approx_count_distinct`` is an HLL++ whose register
hashing is JVM-private — fine for one engine, but a training-data
pipeline that audits its corpus stats across engines (Spark job vs
warehouse SQL) needs the SAME estimate from the same rows. This
sketch derives everything from the portable md5-prefix uniform the
engine already uses for sampling/LSH (operators/sampling.uniform_hash
convention), so DuckDB reproduces the registers — and therefore the
estimate — bit-for-bit (see __spark_entry__.q_hll's oracle twin).

Algorithm (Flajolet et al. 2007, "HyperLogLog: the analysis of a
near-optimal cardinality estimation algorithm" — public literature),
with the classic small-range linear-counting correction:

- 60-bit hash h; register ``j = h mod m`` (m = 2^p), rho-source
  ``w = h >> p`` (60-p bits).
- Register value ``M_j = max rho(w)`` where rho = leading zeros of w
  + 1. rho is monotone in w, so ``max rho == rho(min w)`` — the
  per-register aggregate is a plain integer ``min``, which Spark
  executes with map-side partial aggregation (the sketch is mergeable
  by construction: merging two sketches = elementwise min of w).
- Estimate ``E = alpha_m * m^2 / sum_j 2^(-M_j)``. Scaled by 2^(60-p+1)
  the denominator is an INTEGER: a present register contributes
  ``2^bitlen(min_w)`` (since 2^(RHO_MAX - rho) == 2^bitlen(w) for
  w > 0, and 1 for w == 0) and an absent register ``2^RHO_MAX`` —
  so the whole sketch is exact integer arithmetic with ONE final
  double division. ``bitlen`` is ``length(bin(w))`` in both engines.
- If E <= 2.5m and V = #zero registers > 0: E = m * ln(m / V)
  (linear counting). The branch condition compares bit-identical
  doubles, so both engines take the same branch; ln is the only
  libm call and is bridged by the caller's round-6.

At 100 TB: one narrow projection + two hash aggregations whose keys
are (group, register) then (group) — the first is bounded by
|groups| * m rows after map-side combine regardless of input size,
which is the entire point of sketching the distinct count instead of
``count(distinct)`` (whose exact expand-shuffle moves every key).

Standard error ~1.04/sqrt(m) = 6.5% at the default p=8.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_P = 8
HLL_M = 1 << HLL_P
_WBITS = 60 - HLL_P          # rho-source width
RHO_MAX = _WBITS + 1         # rho when w == 0
_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
# E = HLL_EST_NUM / S_int, S_int = sum_j 2^(RHO_MAX - M_j)  (integer)
HLL_EST_NUM = _ALPHA * HLL_M * HLL_M * float(1 << RHO_MAX)
_LC_BOUND = 2.5 * HLL_M      # small-range correction threshold


def hash60(key) -> Column:
    """The engine's portable 60-bit uniform — the CANONICAL definition
    (operators/sampling.uniform_hash delegates here). DuckDB twin:
    CAST(('0x'||substr(md5(CAST(k AS VARCHAR)),1,15)) AS BIGINT)."""
    c = key if not isinstance(key, str) else F.col(key)
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10) \
        .cast("long")


CMS_D = 4      # hash rows
CMS_W = 1024   # buckets per row


def _cms_bucket(item: Column, i: int, w: int) -> Column:
    """Row-i bucket of an item: md5("i:item") % w (portable)."""
    return hash60(F.concat_ws(":", F.lit(str(i)), item)) % w


def _cms_keys(item: Column, d: int, w: int) -> Column:
    """array<struct<i,bucket>> — the d (row, bucket) cells an item
    touches."""
    return F.array(*[
        F.struct(F.lit(i).cast("int").alias("i"),
                 _cms_bucket(item, i, w).alias("bucket"))
        for i in range(d)
    ])


def cms_build(df: DataFrame, item: str, d: int = CMS_D, w: int = CMS_W) -> DataFrame:
    """Count-Min sketch counters (Cormode & Muthukrishnan 2005, "An
    improved data stream summary: the count-min sketch" — public
    literature) over the rows of ``df``: one (i, bucket, n) row per
    touched cell, at most CMS_D * CMS_W rows TOTAL regardless of input
    size. All integer md5-derived hashing, so the sketch is
    bit-reproducible in any engine (the DuckDB twin in __spark_entry__
    rebuilds it exactly — no FP anywhere).

    Scale shape: explode to CMS_D cells -> hash agg on (i, bucket);
    map-side partial combine bounds every task's shuffle output at
    d*w counters, which is the point of sketching frequencies instead
    of materializing the full item histogram. Sketches merge by
    elementwise ADD (the agg is a sum), so per-partition /
    per-day sketches roll up for free.

    NULL items are excluded (SQL semantics: the DuckDB twin's string
    concat propagates NULL; Spark's concat_ws would silently DROP the
    NULL and hash the bare row prefix — the one expression divergence
    between the engines, so it must never reach the hash)."""
    return (
        df.filter(F.col(item).isNotNull())
        .select(F.explode(_cms_keys(F.col(item), d, w)).alias("_c"))
        .groupBy(F.col("_c.i").alias("i"), F.col("_c.bucket").alias("bucket"))
        .agg(F.count("*").alias("n"))
    )


def cms_estimate(counters: DataFrame, probes: DataFrame, item: str,
                 d: int = CMS_D, w: int = CMS_W) -> DataFrame:
    """Point queries: for each probe item, est = min over the CMS_D
    counters it hashes to. Guaranteed >= the true count (collisions
    only ever inflate); within eps*N with the classic (d, w) bounds.
    The counter table is tiny (<= d*w rows) — broadcast join."""
    keyed = probes.filter(F.col(item).isNotNull()).select(
        item, F.explode(_cms_keys(F.col(item), d, w)).alias("_c")
    ).select(item, F.col("_c.i").alias("i"), F.col("_c.bucket").alias("bucket"))
    return (
        keyed.join(F.broadcast(counters), ["i", "bucket"], "left")
        .groupBy(item).agg(
            F.min(F.coalesce("n", F.lit(0))).alias("cms_est"))
    )  # untouched cell -> 0: an item absent from the stream reports 0


def hll_registers(df: DataFrame, groups: list[str], key: str) -> DataFrame:
    """The sketch's state table: (groups..., _j, _mw) — register j's
    min rho-source per group. This IS the mergeable representation
    (merge = min per (group, register)), which makes it the
    streaming-friendly form too: a windowed streaming min-agg keeps
    exactly this state (streaming/cells_stream.streaming_hll_registers)
    and ``hll_finalize`` turns any register table — one job's, or the
    min-union of many — into the estimate."""
    h = hash60(key)
    # NULL keys contribute nothing to a distinct count (SQL COUNT
    # DISTINCT semantics) but would hash to a phantom (_j NULL,
    # _mw NULL) register row that hll_finalize counts in _np while
    # adding nothing to _sp — inflating the estimate and shrinking
    # the zero-register count v by one. Exclude them, matching
    # cms_build's convention.
    return (
        df.filter(F.col(key).isNotNull())
        .select(*groups,
                (h % HLL_M).alias("_j"),
                F.shiftright(h, HLL_P).alias("_w"))
        .groupBy(*groups, "_j")
        .agg(F.min("_w").alias("_mw"))
    )


def hll_finalize(
    reg: DataFrame, groups: list[str], est_col: str = "hll_distinct"
) -> DataFrame:
    """Estimate from a register table (see hll_registers)."""
    # scaled register term: 2^(RHO_MAX - rho) == 2^bitlen(w) for w>0
    term = F.when(F.col("_mw") == 0, F.lit(1).cast("long")).otherwise(
        F.expr("shiftleft(cast(1 as bigint), length(bin(_mw)))"))
    s = reg.groupBy(*groups).agg(
        F.count("*").alias("_np"),
        F.sum(term).alias("_sp"),
    )
    s_int = (F.col("_sp")
             + (F.lit(HLL_M) - F.col("_np")) * F.lit(1 << RHO_MAX))
    v = F.lit(HLL_M) - F.col("_np")
    e_raw = F.lit(HLL_EST_NUM) / s_int.cast("double")
    est = F.when(
        (e_raw <= F.lit(_LC_BOUND)) & (v > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v.cast("double")),
    ).otherwise(e_raw)
    return s.select(*groups, F.round(est, 6).alias(est_col))


def hll_distinct(
    df: DataFrame,
    groups: list[str],
    key: str,
    est_col: str = "hll_distinct",
) -> DataFrame:
    """Per-group HLL distinct-count estimate of ``key`` (one row per
    group, estimate rounded to 6 decimals)."""
    return hll_finalize(hll_registers(df, groups, key), groups, est_col)


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970, "Space/time trade-offs in hash coding with
# allowable errors" — public literature): the shuffle-pruning sketch.
#
# The 100 TB use case is the bloom-pruned semi join: the build side's
# keys are too many to broadcast as a hash relation, but their bloom
# (BLOOM_WORDS int64 words — 8 KB at the default) always is. The big
# probe side filters MAP-SIDE against the broadcast bloom BEFORE the
# join exchange, so non-matching rows (all but the fp rate) never
# shuffle. Spark has a JVM-private runtime version of this
# (spark.sql.optimizer.runtime.bloomFilter.*); this one is portable +
# deterministic (md5-derived bits, same hash60 convention as CMS/HLL)
# so a warehouse SQL engine reproduces the EXACT same bit array and
# pass set — see __spark_entry__.q_bloom_prune's DuckDB twin.
# ---------------------------------------------------------------------------

BLOOM_K = 5        # hash functions
BLOOM_WORDS = 1024  # int64 words -> 65536 bits (8 KB broadcast)
BLOOM_MAX_WORDS = 1 << 21  # 16 MB literal cap for auto-sizing


def bloom_size_words(n_keys: int, bits_per_key: int = 10,
                     max_words: int = BLOOM_MAX_WORDS) -> int:
    """Power-of-two word count sized to ~bits_per_key bits per distinct
    key (fp ~1% at k=5 and 10 bits/key). A bloom sized for a small set
    SATURATES on a big one — at n/m >= 1 every bit is set and the
    filter passes everything (prunes nothing) — so the semi/anti join
    wrappers size m to the measured key count instead of trusting the
    8 KB default. Capped at ``max_words`` (16 MB literal): past that
    (~13M keys at 10 bits/key) a single in-plan literal stops being
    the right carrier — shard the bloom per key range or fall back to
    the plain join."""
    import math as _math

    need = max(BLOOM_WORDS, (n_keys * bits_per_key + 63) // 64)
    return min(max_words, 1 << _math.ceil(_math.log2(need)))


def _bloom_pos(key: Column, i: int, n_bits: int,
               hash: str = "md5") -> Column:
    """Bit position i of a key. hash='md5': hash60("B<i>:key") % n_bits
    — engine-PORTABLE (the "B" namespace keeps bloom bits independent
    of the CMS buckets of the same values); a warehouse SQL engine
    reproduces the bits (q_bloom_prune's DuckDB twin). hash='xx':
    pmod(xxhash64(i, key), n_bits) — JVM-native, ~10x cheaper per row;
    bits are Spark-specific, which join PRUNING never needs (the exact
    join removes fps either way) — Spark's own InjectRuntimeFilter
    blooms use xxhash for the same reason."""
    if hash == "xx":
        return F.pmod(F.xxhash64(F.lit(i), key), F.lit(n_bits))
    return hash60(F.concat_ws(":", F.lit(f"B{i}"), key.cast("string"))) % n_bits


def bloom_build(df: DataFrame, key: str, k: int = BLOOM_K,
                words: int = BLOOM_WORDS, hash: str = "md5") -> DataFrame:
    """Sparse bloom filter over ``df[key]``: one (word_idx, word) row
    per touched 64-bit word — at most ``words`` rows TOTAL regardless
    of input size. The agg is bit_or, so map-side partial combine
    bounds every task's shuffle output at ``words`` rows and two
    sketches merge by elementwise OR (per-partition / per-day blooms
    roll up for free). NULL keys are excluded (a NULL can't equi-join
    anyway, so it must not set bits)."""
    n_bits = words * 64
    kc = F.col(key)
    pos = (
        df.filter(kc.isNotNull())
        .select(F.explode(F.array(
            *[_bloom_pos(kc, i, n_bits, hash) for i in range(k)])).alias("_p"))
    )
    return (
        pos.select(
            F.shiftrightunsigned(F.col("_p"), 6).alias("word_idx"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"),
                F.col("_p").bitwiseAND(F.lit(63)).cast("int")).alias("_bit"),
        )
        .groupBy("word_idx").agg(F.bit_or("_bit").alias("word"))
    )


def bloom_assemble(counters: DataFrame, words: int = BLOOM_WORDS) -> DataFrame:
    """Dense 1-row array<long> of length ``words`` from bloom_build's
    sparse rows (untouched words -> 0) — the broadcastable form.

    NOTE: the transform's ``_m[i]`` map lookup is a linear scan in
    Catalyst (O(words^2) total) — fine at the default 1024 words (used
    by the q_bloom_prune oracle twin at gate scale), but for
    auto-sized blooms use _bloom_literal's driver-side densify."""
    return (
        counters.agg(F.map_from_entries(
            F.collect_list(F.struct("word_idx", "word"))).alias("_m"))
        .select(F.expr(
            f"transform(sequence(0, {words - 1}), "
            f"i -> coalesce(_m[i], CAST(0 AS BIGINT)))").alias("bloom"))
    )


def bloom_might_contain(key: Column, bloom: Column, k: int = BLOOM_K,
                        words: int = BLOOM_WORDS) -> Column:
    """True iff every one of the key's k bits is set — no false
    negatives; false positives at the classic (1 - e^(-kn/m))^k rate.
    Pure JVM bit arithmetic (whole-stage codegen'd)."""
    n_bits = words * 64
    test = F.lit(True)
    for i in range(k):
        p = _bloom_pos(key, i, n_bits)
        word = F.element_at(
            bloom, F.shiftrightunsigned(p, 6).cast("int") + F.lit(1))
        bit = F.call_function(
            "shiftrightunsigned", word, p.bitwiseAND(F.lit(63)).cast("int"))
        test = test & (bit.bitwiseAND(F.lit(1)) == F.lit(1))
    return test


def _bloom_literal(small: DataFrame, key: str, k: int,
                   words: int | None, hash: str = "md5") -> tuple:
    """Materialize small[key]'s bloom and return (BINARY-literal
    column, words). words=None auto-sizes via bloom_size_words (one
    extra tiny count job — the execute-then-inject shape already pays
    a bloom job).

    Carrier choice, measured: an array<long> literal via F.lit is
    built element-by-element over py4j (~40 s at 2^18 words) and
    bloom_assemble's SQL densify is O(words^2) in Catalyst's map
    lookup — so the words densify DRIVER-SIDE in numpy and ship as
    ONE bytes literal (py4j binary transfer, milliseconds at 2 MB).
    Little-endian uint64 packing puts global bit p at byte p>>3, bit
    p&7 — see bloom_might_contain_bin."""
    import numpy as np

    if words is None:
        words = bloom_size_words(small.select(key).distinct().count())
    arr = np.zeros(words, dtype=np.uint64)
    for r in bloom_build(small, key, k, words, hash).collect():
        arr[r["word_idx"]] = np.uint64(r["word"] & ((1 << 64) - 1))
    return F.lit(arr.astype("<u8").tobytes()), words


def bloom_might_contain_bin(key: Column, bloom_bin: Column,
                            k: int = BLOOM_K,
                            words: int = BLOOM_WORDS,
                            hash: str = "md5") -> Column:
    """bloom_might_contain over a BINARY bloom (little-endian uint64
    words, as packed by _bloom_literal): bit p lives at byte p>>3
    (1-based substring index p>>3 + 1), bit p&7 within it. The byte is
    read via substring -> hex -> conv — all whole-stage-codegen'd JVM
    string ops, negligible next to the k md5 hashes _bloom_pos already
    computes per key."""
    n_bits = words * 64
    test = F.lit(True)
    for i in range(k):
        p = _bloom_pos(key, i, n_bits, hash)
        byte = F.substring(
            bloom_bin, (F.shiftrightunsigned(p, 3) + 1).cast("int"), 1)
        val = F.conv(F.hex(byte), 16, 10).cast("int")
        bit = F.call_function(
            "shiftrightunsigned", val, p.bitwiseAND(F.lit(7)).cast("int"))
        test = test & (bit.bitwiseAND(F.lit(1)) == F.lit(1))
    return test


def _bloom_cast_type(big: DataFrame, small: DataFrame, key: str) -> str | None:
    """Common hash dtype for a bloom-pruned join's two key columns.

    Both _bloom_pos modes are DTYPE-sensitive: xxhash64 hashes an INT
    5 and a LONG 5 to different values, and the md5 path's string cast
    renders 5 and 5.0 differently — while the exact join they guard
    coerces the sides and matches. Hashing the build side with small's
    dtype and probing with big's would then yield bloom FALSE
    NEGATIVES for true members: silently wrong join results. So when
    the dtypes differ, both sides cast (for HASHING ONLY — the exact
    join still sees the original columns) to the same type: long for
    integral/integral (lossless), double for any other numeric pair
    (what Spark's join coercion compares anyway). Any other mismatch
    (string vs numeric, etc.) raises — cast the keys explicitly or use
    the plain join; a loud error beats a silent wrong answer."""
    from pyspark.sql.types import IntegralType, NumericType

    bt, st = big.schema[key].dataType, small.schema[key].dataType
    if bt == st:
        return None
    if isinstance(bt, IntegralType) and isinstance(st, IntegralType):
        return "long"
    if isinstance(bt, NumericType) and isinstance(st, NumericType):
        return "double"
    raise ValueError(
        f"bloom join key {key!r} has incompatible dtypes "
        f"(big={bt.simpleString()}, small={st.simpleString()}): the "
        f"bloom hash is dtype-sensitive, so mixed non-numeric key "
        f"types would produce false negatives (wrong join results). "
        f"Cast both sides to a common type first, or use the plain "
        f"join.")


def _bloom_keys(big: DataFrame, small: DataFrame, key: str) -> tuple:
    """(distinct key set localCheckpointed, probe cast type) shared by
    the semi/anti wrappers. The checkpoint means small's upstream plan
    runs ONCE — not once for the auto-size count, once for the bloom
    build, and once for the exact join (an expensive small side, e.g.
    curate_corpus's LSH drop set, would otherwise run 3x)."""
    t = _bloom_cast_type(big, small, key)
    keys = small.select(key).distinct().localCheckpoint()
    return keys, t


def bloom_semi_join(big: DataFrame, small: DataFrame, key: str,
                    k: int = BLOOM_K, words: int | None = None,
                    hash: str = "xx") -> DataFrame:
    """Exact left-semi join of ``big`` against ``small[key]`` with a
    bloom prefilter: big rows whose key provably isn't in small (all
    but the fp rate) are dropped map-side BEFORE the exact join's
    exchange. Same rows as big.join(small, key, "left_semi") — the
    bloom only ever passes a superset (no false negatives), and the
    exact semi join removes the false positives.

    The bloom is MATERIALIZED (one tiny extra job: <= ``words`` rows,
    8 KB at the default) and injected as a literal predicate — the
    same execute-then-inject shape as Spark's own runtime bloom join
    (InjectRuntimeFilter's BloomFilterSubquery executes before the
    main query). A lazy crossJoin-against-the-1-row-bloom form exists
    (q_bloom_prune uses it for the oracle gate) but is NOT safe here:
    Catalyst's PushDownLeftSemiAntiJoin reorders the exact semi join
    BELOW that join-shaped filter, shuffling the unpruned big side —
    the literal predicate pins the filter under the exchange (and lets
    it ride down to the scan with the other pushed filters).

    ``words=None`` (default) sizes the bloom to the measured distinct
    key count (bloom_size_words) — a fixed-size bloom saturates and
    prunes NOTHING once n_keys ~ n_bits.

    The small side's distinct key set is localCheckpointed up front
    (this call is already eager — it runs the bloom jobs — and the
    checkpoint keeps an expensive small-side plan from running 3x);
    mismatched numeric key dtypes hash through a common cast, other
    mismatches raise (_bloom_cast_type)."""
    keys, t = _bloom_keys(big, small, key)
    build = keys if t is None else keys.select(F.col(key).cast(t).alias(key))
    bloom_lit, words = _bloom_literal(build, key, k, words, hash)
    probe = F.col(key) if t is None else F.col(key).cast(t)
    pre = big.filter(
        bloom_might_contain_bin(probe, bloom_lit, k, words, hash))
    return pre.join(keys, key, "left_semi")


def bloom_anti_join(big: DataFrame, small: DataFrame, key: str,
                    k: int = BLOOM_K, words: int | None = None,
                    hash: str = "xx") -> DataFrame:
    """Exact left-ANTI join of ``big`` against ``small[key]`` with a
    bloom route-around: rows whose key is provably NOT in small (bloom
    negative — no false negatives, so provably safe to keep) bypass
    the join entirely and never enter its exchange; only the bloom-
    POSITIVE residue (~|small| + the fp rate of |big|) goes through
    the exact anti join that removes true members. Union of the two
    branches == big.join(small, key, "left_anti") row-for-row.

    This is the anti-join shape Spark's own InjectRuntimeFilter never
    produces (it only prefilters semi/inner joins, where bloom
    negatives are DROPPED; for anti joins negatives must be KEPT, so
    pruning the exchange requires routing them around the join, not
    filtering them out). Both branches are scan + map-side filter —
    no shuffle on the negative branch — but they DO evaluate ``big``'s
    upstream plan twice: persist/checkpoint the input first if it is
    an expensive subplan rather than a table scan (the 100 TB pattern
    is to run this straight off the stored gated table). ``small``'s
    plan, by contrast, runs ONCE: its distinct key set is
    localCheckpointed (this call is already eager — it runs the bloom
    jobs) and reused for the auto-size count, the bloom build, and the
    exact join.

    ``words=None`` (default) sizes the bloom to the measured distinct
    key count (bloom_size_words) — a fixed-size bloom saturates and
    routes NOTHING around the exchange once n_keys ~ n_bits.
    Mismatched numeric key dtypes hash through a common cast, other
    mismatches raise (_bloom_cast_type).
    """
    keys, t = _bloom_keys(big, small, key)
    build = keys if t is None else keys.select(F.col(key).cast(t).alias(key))
    bloom_lit, words = _bloom_literal(build, key, k, words, hash)
    probe = F.col(key) if t is None else F.col(key).cast(t)
    maybe = bloom_might_contain_bin(probe, bloom_lit, k, words, hash)
    neg = big.filter(~maybe)
    pos = big.filter(maybe).join(keys, key, "left_anti")
    return neg.unionByName(pos)
