"""Skyline (Pareto frontier) vs brute-force dominance oracles."""

import numpy as np
from pyspark.sql import functions as F

from optimizing_spark.operators import skyline


def _brute_skyline(pts, maximize=False):
    """O(N^2) dominance filter over distinct points, pure Python."""
    s = 1 if not maximize else -1
    uniq = sorted({(s * x, s * y) for x, y in pts})
    out = set()
    for (ax, ay) in uniq:
        dominated = any(
            bx <= ax and by <= ay and (bx < ax or by < ay)
            for bx, by in uniq)
        if not dominated:
            out.add((s * ax, s * ay))
    return out


def _rand_pts(rng, n, hi=10000):
    return [(int(a), int(b)) for a, b in
            zip(rng.integers(0, hi, n), rng.integers(0, hi, n))]


def test_grouped_skyline_matches_brute(spark):
    rng = np.random.default_rng(3)
    rows, want = [], {}
    for g in range(5):
        n = [150, 40, 3, 1, 80][g]
        # group 4: tight cluster (dense dominance)
        pts = _rand_pts(rng, n) if g != 4 else _rand_pts(rng, n, 30)
        rows += [(g, x, y) for x, y in pts]
        want[g] = _brute_skyline(pts)
    got = skyline.skyline(
        spark.createDataFrame(rows, "grp long, x long, y long"),
        "grp").toPandas()
    for g, sub in got.groupby("grp"):
        assert set(zip(sub.x, sub.y)) == want[g], f"grp {g}"
    assert set(got.grp) == set(want)


def test_global_skyline_partition_invariant_and_antichain(spark):
    rng = np.random.default_rng(17)
    pts = _rand_pts(rng, 5000, 100000)
    df = spark.createDataFrame(pts, "x long, y long")
    ref = None
    for parts in (1, 9, 32):
        got = skyline.skyline(df.repartition(parts)).toPandas()
        cur = set(zip(got.x, got.y))
        assert (got.grp == 0).all()
        ref = cur if ref is None else ref
        assert cur == ref, parts
    # frontier is an antichain: sorted by x, y strictly decreases
    fr = sorted(ref)
    assert all(fr[i + 1][1] < fr[i][1] for i in range(len(fr) - 1))
    # and nothing in the input dominates a frontier point
    for fx, fy in ref:
        assert not any(px <= fx and py <= fy and (px < fx or py < fy)
                       for px, py in pts)


def test_skyline_maximize_and_ties(spark):
    # duplicate points, x-ties, y-ties
    pts = [(1, 9), (1, 9), (1, 5), (2, 5), (3, 3), (3, 3), (4, 3), (0, 99)]
    df = spark.createDataFrame([(0, x, y) for x, y in pts],
                               "grp long, x long, y long")
    got_min = skyline.skyline(df, "grp").toPandas()
    assert set(zip(got_min.x, got_min.y)) == _brute_skyline(pts)
    got_max = skyline.skyline(df, "grp", maximize=True).toPandas()
    assert set(zip(got_max.x, got_max.y)) == _brute_skyline(
        pts, maximize=True)


def test_skyline_single_point_and_chain(spark):
    # a strictly increasing chain minimize-skyline = only its first pt
    chain = [(i, i) for i in range(10)]
    df = spark.createDataFrame([(0, x, y) for x, y in chain],
                               "grp long, x long, y long")
    got = skyline.skyline(df, "grp").toPandas()
    assert set(zip(got.x, got.y)) == {(0, 0)}
    # an anti-chain survives whole
    anti = [(i, 9 - i) for i in range(10)]
    df2 = spark.createDataFrame([(0, x, y) for x, y in anti],
                                "grp long, x long, y long")
    got2 = skyline.skyline(df2, "grp").toPandas()
    assert set(zip(got2.x, got2.y)) == set(anti)
