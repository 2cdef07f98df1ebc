"""Point-pattern statistics (operators/pointpattern) vs a brute-force
all-pairs NumPy oracle: exact pair/NN counts per radius for BOTH the
naive and border-corrected (minus-sampling) estimators, the IEEE
epilogues recomputed independently, zero-count radii present,
NULL-when-no-centers, and partition invariance."""

import numpy as np
import pytest

from optimizing_spark.config import Box2
from optimizing_spark.operators.pointpattern import point_pattern

WORLD = Box2(0.0, 0.0, 65536.0, 65536.0)
E = 65536


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
        inter = (x >= r) & (x <= E - r) & (y >= r) & (y <= E - r)
        pairs = int((d2 <= r * r).sum())  # ordered pairs
        pairs_b = int((d2[inter] <= r * r).sum())
        nn_le = int((nn <= r * r).sum())
        nn_b = int((nn[inter] <= r * r).sum())
        nc = int(inter.sum())
        rows[r] = {
            "pairs_le_r": pairs,
            "k_hat": float(np.float64(pairs) * np.float64(area))
            / np.float64(n * (n - 1)),
            "nn_le_r": nn_le,
            "g_hat": float(np.float64(nn_le) / np.float64(n)),
            "centers_border": nc,
            "pairs_border": pairs_b,
            "k_hat_border": None if nc == 0 else
            float(np.float64(pairs_b) * np.float64(area))
            / np.float64(nc * (n - 1)),
            "nn_border": nn_b,
            "g_hat_border": None if nc == 0 else
            float(np.float64(nn_b) / np.float64(nc)),
        }
    return rows


@pytest.mark.parametrize("spread,radii", [
    (65536, (100, 500, 2000, 8000)),   # sparse: small radii hit zero
    (4000, (64, 256, 1024)),           # dense cluster hugging a corner
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
        w = want[row.r]
        for k, v in w.items():
            assert getattr(row, k) == v, (row.r, k)
        assert row.n_points == 400


def test_zero_counts_and_null_border(spark):
    # three mutually distant points: r=1 counts nothing but still rows;
    # at r=40000 NO point is interior (corner points) -> border stats
    # NULL while naive stats saturate
    df = spark.createDataFrame(
        [(0, 5, 5), (1, 30005, 5), (2, 5, 30005)],
        "point_id long, x long, y long")
    got = {r.r: r for r in
           point_pattern(df, radii=(1, 40000), world=WORLD).collect()}
    assert got[1].pairs_le_r == 0 and got[1].nn_le_r == 0
    assert got[1].k_hat == 0.0 and got[1].g_hat == 0.0
    assert got[1].centers_border == 3  # everyone interior at r=1...
    # at 40000: the two axis pairs (dist 30000) are in, the diagonal
    # pair (dist ~42426) is out -> 2 unordered = 4 ordered
    assert got[40000].pairs_le_r == 4
    assert got[40000].nn_le_r == 3
    assert got[40000].centers_border == 0
    assert got[40000].k_hat_border is None
    assert got[40000].g_hat_border is None


def test_border_removes_clipping_bias(spark):
    """On a uniform scatter, the naive K under-counts (circles clipped
    by the window) while minus-sampling centers see their full circle:
    K_border must be >= naive K at the largest radius and closer to
    the CSR expectation pi*r^2."""
    rng = np.random.default_rng(3)
    rng_ids = np.arange(3000, dtype=np.int64)
    x = rng.integers(0, E, 3000).astype(np.int64)
    y = rng.integers(0, E, 3000).astype(np.int64)
    df = spark.createDataFrame(
        list(zip(rng_ids.tolist(), x.tolist(), y.tolist())),
        "point_id long, x long, y long")
    r = 8000
    row = point_pattern(df, radii=(r,), world=WORLD).collect()[0]
    csr = np.pi * r * r
    assert row.centers_border > 0
    assert row.k_hat_border >= row.k_hat
    assert abs(row.k_hat_border - csr) < abs(row.k_hat - csr)


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
