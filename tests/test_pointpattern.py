"""Point-pattern statistics (operators/pointpattern) vs a brute-force
all-pairs NumPy oracle: exact pair/NN counts per radius, the IEEE
epilogue recomputed independently, zero-count radii present, and
partition invariance."""

import numpy as np
import pytest

from optimizing_spark.config import Box2
from optimizing_spark.operators.pointpattern import point_pattern

WORLD = Box2(0.0, 0.0, 65536.0, 65536.0)


def _pts(n, salt=0, spread=65536):
    ids = np.arange(n, dtype=np.int64)
    x = (ids * 48271 + salt * 7919 + 11) % spread
    y = (ids * 69621 + salt * 104729 + 3) % spread
    return ids, x, y


def _oracle(x, y, radii):
    n = len(x)
    dx = x[:, None] - x[None, :]
    dy = y[:, None] - y[None, :]
    d2 = dx * dx + dy * dy
    np.fill_diagonal(d2, np.iinfo(np.int64).max)
    nn = d2.min(axis=1)
    area = (WORLD.max_x - WORLD.min_x) * (WORLD.max_y - WORLD.min_y)
    rows = {}
    for r in radii:
        pairs = int((d2 <= r * r).sum())  # ordered pairs
        nn_le = int((nn <= r * r).sum())
        rows[r] = (
            pairs,
            float(np.float64(pairs) * np.float64(area))
            / np.float64(n * (n - 1)),
            nn_le,
            float(np.float64(nn_le) / np.float64(n)),
        )
    return rows


@pytest.mark.parametrize("spread,radii", [
    (65536, (100, 500, 2000, 8000)),   # sparse: small radii hit zero
    (4000, (64, 256, 1024)),           # dense cluster in one corner
])
def test_matches_bruteforce(spark, spread, radii):
    ids, x, y = _pts(400, salt=spread, spread=spread)
    df = spark.createDataFrame(
        list(zip(ids.tolist(), x.tolist(), y.tolist())),
        "point_id long, x long, y long")
    want = _oracle(x, y, radii)
    got = point_pattern(df, radii=radii, world=WORLD).collect()
    assert [r.r for r in got] == sorted(radii)
    for row in got:
        pairs, k_hat, nn_le, g_hat = want[row.r]
        assert row.pairs_le_r == pairs, row.r
        assert row.k_hat == k_hat, row.r
        assert row.nn_le_r == nn_le, row.r
        assert row.g_hat == g_hat, row.r
        assert row.n_points == 400


def test_zero_count_radii_present(spark):
    # three mutually distant points: r=1 counts nothing but still rows
    df = spark.createDataFrame(
        [(0, 0, 0), (1, 30000, 0), (2, 0, 30000)],
        "point_id long, x long, y long")
    got = {r.r: r for r in
           point_pattern(df, radii=(1, 50000), world=WORLD).collect()}
    assert got[1].pairs_le_r == 0 and got[1].nn_le_r == 0
    assert got[1].k_hat == 0.0 and got[1].g_hat == 0.0
    assert got[50000].pairs_le_r == 6  # all 3 unordered pairs, ordered x2
    assert got[50000].nn_le_r == 3


def test_partition_invariance(spark):
    ids, x, y = _pts(300, salt=1)
    rows = list(zip(ids.tolist(), x.tolist(), y.tolist()))
    df = spark.createDataFrame(rows, "point_id long, x long, y long")
    radii = (500, 4000)
    base = sorted(map(tuple, point_pattern(
        df.coalesce(1), radii=radii, world=WORLD).collect()))
    for parts in (3, 16):
        got = sorted(map(tuple, point_pattern(
            df.repartition(parts), radii=radii, world=WORLD).collect()))
        assert got == base, parts
