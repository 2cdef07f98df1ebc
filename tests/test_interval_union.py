"""interval_union (gaps-and-islands merge) vs a brute sequential
oracle: exact merged islands on random keyed intervals, the
closed-adjacency convention, duplicates/containment/point intervals,
and partition invariance."""

import numpy as np

from optimizing_spark.operators.temporal import interval_union


def _ivals(n, keys=7, salt=0, span=10_000, max_len=400):
    ids = np.arange(n, dtype=np.int64)
    k = (ids * 31 + salt) % keys
    t0 = (ids * 48271 + salt * 7919 + 11) % span
    t1 = t0 + (ids * 16807 + salt) % max_len
    return k, t0, t1


def _oracle(k, t0, t1):
    out = set()
    for key in np.unique(k):
        iv = sorted((int(a), int(b))
                    for a, b in zip(t0[k == key], t1[k == key]))
        cur0, cur1, cnt = iv[0][0], iv[0][1], 1
        for a, b in iv[1:]:
            if a > cur1 + 1:
                out.add((int(key), cur0, cur1, cnt))
                cur0, cur1, cnt = a, b, 1
            else:
                cur1 = max(cur1, b)
                cnt += 1
        out.add((int(key), cur0, cur1, cnt))
    return out


def _run(spark, k, t0, t1, parts=None):
    df = spark.createDataFrame(
        [(int(a), int(b), int(c)) for a, b, c in zip(k, t0, t1)],
        "user_id long, t0 long, t1 long")
    if parts:
        df = df.repartition(parts)
    rows = interval_union(df, "user_id").collect()
    return {(r["user_id"], r["m_t0"], r["m_t1"], r["n_merged"])
            for r in rows}


def test_interval_union_vs_brute_and_partition_invariance(spark):
    k, t0, t1 = _ivals(500)
    want = _oracle(k, t0, t1)
    assert _run(spark, k, t0, t1) == want
    assert _run(spark, k, t0, t1, parts=13) == want
    # non-trivial merging happened
    assert len(want) < 500
    assert any(c > 1 for (_, _, _, c) in want)


def test_interval_union_adjacency_convention(spark):
    k = np.array([0, 0, 0, 1, 1])
    t0 = np.array([1, 6, 20, 5, 5])
    t1 = np.array([5, 9, 20, 9, 7])
    got = _run(spark, k, t0, t1)
    # [1,5]+[6,9] adjacent -> one island; [20,20] point island;
    # duplicates/containment fold into one island of 2
    assert got == {(0, 1, 9, 2), (0, 20, 20, 1), (1, 5, 9, 2)}


def test_interval_union_gap_of_one_instant_splits(spark):
    k = np.array([0, 0])
    t0 = np.array([1, 7])
    t1 = np.array([5, 9])  # instant 6 uncovered
    assert _run(spark, k, t0, t1) == {(0, 1, 5, 1), (0, 7, 9, 1)}
