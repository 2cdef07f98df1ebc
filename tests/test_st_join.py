"""st_pair_join (spatio-temporal distance band) vs a brute NumPy
oracle: exact pair set + dist2/gap, closed boundaries on BOTH axes,
bucket-edge pairs (gap == t straddling a bucket boundary), each pair
exactly once, and the fan-out guard."""

import numpy as np
import pytest

from optimizing_spark.config import Box2
from optimizing_spark.operators.joins import st_pair_join

WORLD = Box2(0.0, 0.0, 65536.0, 65536.0)
E = 65536


def _events(n, salt=0, tspan=2_000_000):
    ids = np.arange(n, dtype=np.int64)
    x = (ids * 48271 + salt * 7919 + 11) % E
    y = (ids * 69621 + salt * 104729 + 3) % E
    ts = (ids * 16807 + salt * 31) % tspan
    return ids, x, y, ts


def _oracle(ids, x, y, ts, d, t):
    got = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d2 = int((x[i] - x[j]) ** 2 + (y[i] - y[j]) ** 2)
            gap = int(abs(ts[i] - ts[j]))
            if d2 <= d * d and gap <= t:
                got.add((int(ids[i]), int(ids[j]), d2, gap))
    return got


def _run(spark, ids, x, y, ts, d, t, **kw):
    df = spark.createDataFrame(
        [(int(a), int(b), int(c), int(e))
         for a, b, c, e in zip(ids, x, y, ts)],
        "event_id long, x long, y long, tsec long")
    rows = st_pair_join(df, d, t, WORLD, **kw).collect()
    pairs = [(r["id_a"], r["id_b"], r["dist2"], r["gap"]) for r in rows]
    assert len(pairs) == len(set(pairs)), "pair emitted more than once"
    return set(pairs)


def test_st_vs_brute(spark):
    ids, x, y, ts = _events(400)
    want = _oracle(ids, x, y, ts, 4000, 200_000)
    got = _run(spark, ids, x, y, ts, 4000, 200_000)
    assert got == want
    assert len(want) > 50  # non-trivial


def test_st_closed_boundaries_and_bucket_edge(spark):
    # pair at exactly d and exactly t, straddling a bucket boundary
    # (ts 995 and 1995 with t=1000 sit in buckets 0 and 1)
    ids = np.array([0, 1, 2, 3])
    x = np.array([100, 130, 500, 500])
    y = np.array([100, 140, 500, 500])
    ts = np.array([995, 1995, 10, 1011])
    # ids 0-1: dist2 = 900+1600 = 2500 = 50^2, gap = 1000 = t
    got = _run(spark, ids, x, y, ts, 50, 1000)
    assert (0, 1, 2500, 1000) in got
    assert (2, 3, 0, 1001) not in got  # gap t+1 excluded
    # widen t by one: now 2-3 joins too
    got2 = _run(spark, ids, x, y, ts, 50, 1001)
    assert (2, 3, 0, 1001) in got2


def test_st_explicit_depth_matches_auto(spark):
    ids, x, y, ts = _events(300, salt=3)
    auto = _run(spark, ids, x, y, ts, 3000, 100_000)
    deep = _run(spark, ids, x, y, ts, 3000, 100_000, depth=6)
    assert auto == deep


def test_st_fanout_guard(spark):
    ids, x, y, ts = _events(10)
    df = None
    with pytest.raises(ValueError, match="fan-out"):
        _run(spark, ids, x, y, ts, 30000, 1000, depth=8)
