"""distance_transform (geodesic BFS over the cell lattice) vs a
brute NumPy BFS oracle: exact (cell, dist) sets on random lattices
with holes, unreachable components absent, the max_rounds cap,
sources outside the occupied set ignored, and early frontier drain."""

from collections import deque

import numpy as np

from optimizing_spark.operators.raster import distance_transform

W = 24


def _lattice(p_occ=0.6, salt=0):
    ids = np.arange(W * W, dtype=np.int64)
    h = (ids * 48271 + salt * 7919 + 11) % 100
    occ = {(int(i % W), int(i // W)) for i, v in zip(ids, h)
           if v < p_occ * 100}
    seeds = {(cx, cy) for (cx, cy) in occ if (cx * 31 + cy) % 23 == 0}
    return occ, seeds


def _oracle(occ, seeds, cap):
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        cx, cy = q.popleft()
        d = dist[(cx, cy)]
        if d >= cap:
            continue
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            n = (cx + dx, cy + dy)
            if n in occ and n not in dist:
                dist[n] = d + 1
                q.append(n)
    return {(c[0], c[1], d) for c, d in dist.items()}


def _run(spark, occ, seeds, cap):
    odf = spark.createDataFrame(list(occ), "px long, py long")
    sdf = spark.createDataFrame(list(seeds), "px long, py long")
    rows = distance_transform(odf, sdf, max_rounds=cap).collect()
    got = {(r["px"], r["py"], r["dist"]) for r in rows}
    assert len(got) == len(rows), "duplicate cells"
    return got


def test_distance_transform_vs_bfs(spark):
    occ, seeds = _lattice(p_occ=0.45)
    # plant a seedless island separated from the lattice by a moat
    occ -= {(cx, cy) for (cx, cy) in occ if cx >= W or cy >= W}
    island = {(W + 3, W + 3), (W + 4, W + 3), (W + 4, W + 4)}
    occ |= island
    seeds -= island
    want = _oracle(occ, seeds, 24)
    got = _run(spark, occ, seeds, 24)
    assert got == want
    assert any(d >= 3 for (_, _, d) in want)  # non-trivial depths
    # the island is occupied but unreachable
    assert len({(a, b) for a, b, _ in want}) < len(occ)


def test_distance_transform_cap(spark):
    # a 1-wide corridor: dist = x; cap cuts the tail exactly
    occ = {(i, 0) for i in range(12)}
    seeds = {(0, 0)}
    got = _run(spark, occ, seeds, 5)
    assert got == {(i, 0, i) for i in range(6)}


def test_distance_transform_seed_hygiene(spark):
    # seeds not in the occupied set are ignored entirely
    occ = {(0, 0), (1, 0)}
    seeds = {(0, 0), (9, 9)}
    got = _run(spark, occ, seeds, 24)
    assert got == {(0, 0, 0), (1, 0, 1)}
