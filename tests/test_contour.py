"""contour_edges (raster -> vector boundary) vs a brute NumPy
oracle: exact boundary edge set on random sparse rasters, perimeter
identities (single cell, solid block, plus-shape with concavities),
threshold semantics with absent-cells-are-zero, and the closed-loop
property (every region boundary has equal counts of N/S and E/W
edges)."""

import numpy as np

from optimizing_spark.operators.raster import contour_edges

W = 64


def _raster(n, salt=0):
    ids = np.arange(n, dtype=np.int64)
    cx = (ids * 48271 + salt * 7919 + 11) % W
    cy = (ids * 69621 + salt * 104729 + 3) % W
    v = (ids * 16807 + salt) % 30
    # collapse duplicates by summing (sparse raster contract)
    agg = {}
    for a, b, c in zip(cx, cy, v):
        agg[(int(a), int(b))] = agg.get((int(a), int(b)), 0) + int(c)
    return agg


def _oracle(agg, thr):
    inside = {k for k, v in agg.items() if v >= thr}
    edges = set()
    for (cx, cy) in inside:
        for dx, dy, side in ((1, 0, "E"), (-1, 0, "W"),
                             (0, 1, "N"), (0, -1, "S")):
            if (cx + dx, cy + dy) not in inside:
                x1 = cx + 1 if side == "E" else cx
                y1 = cy + 1 if side == "N" else cy
                x2 = cx if side == "W" else cx + 1
                y2 = cy if side == "S" else cy + 1
                edges.add((cx, cy, side, x1, y1, x2, y2))
    return edges


def _run(spark, agg, thr):
    df = spark.createDataFrame(
        [(k[0], k[1], v) for k, v in agg.items()],
        "px long, py long, n long")
    rows = contour_edges(df, thr).collect()
    got = {(r["cx"], r["cy"], r["side"], r["x1"], r["y1"], r["x2"],
            r["y2"]) for r in rows}
    assert len(got) == len(rows), "duplicate edges"
    return got


def test_contour_vs_brute(spark):
    agg = _raster(900)
    want = _oracle(agg, 15)
    got = _run(spark, agg, 15)
    assert got == want
    assert len(want) > 100  # non-trivial boundary
    # closed loops: boundary crossings balance in both axes
    assert (sum(1 for e in want if e[2] == "N")
            == sum(1 for e in want if e[2] == "S"))
    assert (sum(1 for e in want if e[2] == "E")
            == sum(1 for e in want if e[2] == "W"))


def test_contour_shapes(spark):
    # single cell: perimeter 4
    got = _run(spark, {(5, 5): 9}, 1)
    assert len(got) == 4
    # 3x3 solid block: perimeter 12, interior emits nothing
    block = {(x, y): 9 for x in range(3) for y in range(3)}
    got = _run(spark, block, 1)
    assert len(got) == 12
    assert not any(e[0] == 1 and e[1] == 1 for e in got)
    # plus shape: concave corners counted correctly (perimeter 12)
    plus = {(1, 0): 9, (0, 1): 9, (1, 1): 9, (2, 1): 9, (1, 2): 9}
    assert len(_run(spark, plus, 1)) == 12


def test_contour_threshold_and_absent_cells(spark):
    # below-threshold neighbor counts as outside; absent cell too
    agg = {(0, 0): 10, (1, 0): 3, (0, 1): 10}
    got = _run(spark, agg, 5)
    want = _oracle(agg, 5)
    assert got == want
    # the (0,0)-(1,0) border IS a boundary edge (neighbor below thr)
    assert any(e[0] == 0 and e[1] == 0 and e[2] == "E" for e in got)
