"""Closest-pair operators vs brute-force NumPy oracles."""

import numpy as np
from pyspark.sql import functions as F

from optimizing_spark.config import Box2
from optimizing_spark.operators import closest

WORLD = Box2(0.0, 0.0, 65536.0, 65536.0)


def _brute_min_d2(pts):
    arr = np.array(pts, dtype=np.int64)
    dx = arr[:, 0][:, None] - arr[:, 0][None, :]
    dy = arr[:, 1][:, None] - arr[:, 1][None, :]
    d2 = dx * dx + dy * dy
    np.fill_diagonal(d2, np.iinfo(np.int64).max)
    return int(d2.min())


def _rand_pts(rng, n, hi=65536):
    return [(int(a), int(b)) for a, b in
            zip(rng.integers(0, hi, n), rng.integers(0, hi, n))]


def test_global_closest_pair_matches_brute(spark):
    rng = np.random.default_rng(23)
    pts = _rand_pts(rng, 3000)
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)],
        "point_id long, x long, y long")
    got = closest.closest_pair_global(df, WORLD).collect()
    assert len(got) == 1
    r = got[0]
    assert r.min_d2 == _brute_min_d2(pts)
    # the returned ids actually realize the min
    ax, ay = pts[r.id_a]
    bx, by = pts[r.id_b]
    assert (ax - bx) ** 2 + (ay - by) ** 2 == r.min_d2
    assert r.id_a < r.id_b


def test_global_closest_pair_doubling_loop_and_duplicates(spark):
    # two far points: a tiny d0 forces several doubling rounds
    df = spark.createDataFrame(
        [(0, 100, 100), (1, 60000, 60000)], "point_id long, x long, y long")
    r = closest.closest_pair_global(df, WORLD, d0=1).collect()[0]
    assert (r.id_a, r.id_b) == (0, 1)
    assert r.min_d2 == 2 * 59900 ** 2
    # planted duplicate -> 0, found in round one
    df2 = spark.createDataFrame(
        [(0, 5, 5), (1, 40000, 2), (2, 5, 5)],
        "point_id long, x long, y long")
    r2 = closest.closest_pair_global(df2, WORLD).collect()[0]
    assert (r2.id_a, r2.id_b, r2.min_d2) == (0, 2, 0)
    # < 2 rows -> empty
    assert closest.closest_pair_global(
        df2.limit(1), WORLD).count() == 0


def test_grouped_closest_matches_brute(spark):
    rng = np.random.default_rng(31)
    rows, want = [], {}
    for g in range(6):
        n = [200, 50, 2, 1, 90, 40][g]
        pts = _rand_pts(rng, n)
        if g == 4:  # planted duplicate
            pts[7] = pts[3]
        if g == 5:  # degenerate same-x column (sweep worst case)
            pts = [(777, int(v)) for v in rng.integers(0, 65536, n)]
        rows += [(g, x, y) for x, y in pts]
        want[g] = _brute_min_d2(pts) if n >= 2 else None
    got = closest.closest_pair_grouped(
        spark.createDataFrame(rows, "grp long, x long, y long"),
        "grp").toPandas()
    assert len(got) == 6
    for _, r in got.iterrows():
        w = want[int(r.grp)]
        if w is None:
            assert r.min_d2 is None or np.isnan(r.min_d2)
        else:
            assert int(r.min_d2) == w, int(r.grp)
