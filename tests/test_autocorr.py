"""Moran's I / Geary's C (operators/autocorr) vs the textbook float
formulas in NumPy, plus the sign conventions that make the statistics
meaningful (checkerboard → dispersed, blocks → clustered) and the
degenerate NULLs."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from optimizing_spark.operators.autocorr import (
    NEIGHBOR_OFFSETS,
    spatial_autocorr,
)


def _textbook(cells):
    """Float Moran/Geary straight from the definitions (binary
    8-adjacency, ordered pairs)."""
    vals = {(cx, cy): x for cx, cy, x in cells}
    xs = np.array([x for _, _, x in cells], dtype=np.float64)
    n = len(xs)
    mean = xs.mean()
    den = ((xs - mean) ** 2).sum()
    w = num_i = num_c = 0.0
    for (cx, cy), xi in vals.items():
        for dx, dy in NEIGHBOR_OFFSETS:
            xj = vals.get((cx + dx, cy + dy))
            if xj is None:
                continue
            w += 1
            num_i += (xi - mean) * (xj - mean)
            num_c += (xi - xj) ** 2
    if w == 0 or den == 0:
        return None, None
    return (n / w) * num_i / den, ((n - 1) / (2 * w)) * num_c / den


def _run(spark, cells):
    df = spark.createDataFrame(cells, "cx long, cy long, n long")
    return spatial_autocorr(df, val="n").collect()[0]


def test_matches_textbook_random(spark):
    rng = np.random.default_rng(5)
    pts = {(int(cx), int(cy)) for cx, cy in
           zip(rng.integers(0, 12, 90), rng.integers(0, 12, 90))}
    cells = [(cx, cy, int(rng.integers(1, 50))) for cx, cy in sorted(pts)]
    row = _run(spark, cells)
    want_i, want_c = _textbook(cells)
    assert row.moran_i == pytest.approx(want_i, rel=1e-12)
    assert row.geary_c == pytest.approx(want_c, rel=1e-12)
    assert row.n_cells == len(cells)
    # components really are the multiplied-through integers
    xs = np.array([x for _, _, x in cells], dtype=object)
    assert row.den1 == len(cells) * int((xs * xs).sum()) - int(xs.sum()) ** 2


def test_checkerboard_dispersed_blocks_clustered(spark):
    # checkerboard: negative autocorrelation — only mildly so under
    # QUEEN weights (the 4 diagonal neighbors share the color; rook
    # contiguity would give I near -1)
    board = [(cx, cy, 10 if (cx + cy) % 2 == 0 else 1)
             for cx in range(8) for cy in range(8)]
    r = _run(spark, board)
    assert r.moran_i < 0 and r.geary_c > 1
    # two homogeneous blocks: strong positive autocorrelation
    blocks = [(cx, cy, 10 if cx < 4 else 1)
              for cx in range(8) for cy in range(8)]
    r2 = _run(spark, blocks)
    assert r2.moran_i > 0.5 and 0 <= r2.geary_c < 0.5
    # textbook parity on both patterned fields too
    for cells, row in ((board, r), (blocks, r2)):
        wi, wc = _textbook(cells)
        assert row.moran_i == pytest.approx(wi, rel=1e-12)
        assert row.geary_c == pytest.approx(wc, rel=1e-12)


def test_degenerate_null_constant_field(spark):
    cells = [(cx, cy, 7) for cx in range(4) for cy in range(4)]
    r = _run(spark, cells)
    assert r.den1 == 0 and r.moran_i is None and r.geary_c is None
    assert r.w_pairs > 0  # pairs exist, variance doesn't


def test_degenerate_null_no_neighbors(spark):
    # cells spaced 3 apart: no 8-adjacency anywhere -> W = 0
    cells = [(3 * i, 0, i + 1) for i in range(5)]
    r = _run(spark, cells)
    assert r.w_pairs == 0 and r.moran_i is None and r.geary_c is None
    assert r.n_cells == 5 and r.num_moran == 0 and r.num_geary == 0
