"""Convex hull + farthest-pair diameter vs brute-force oracles.

The Spark side runs Andrew monotone chain (with the Akl-Toussaint
prefilter); the oracle here re-derives the strict vertex set by the
independent hull-EDGE characterization (no third point strictly right,
no collinear point outside the closed segment) — the same declarative
form as the DuckDB twin of q_hull, so pytest and the driver gate agree
on the semantics by construction."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from optimizing_spark.operators import hull


def _brute_strict_hull(pts):
    """Strict hull vertex set via the edge characterization, O(N^3)
    pure-Python ints — algorithm-independent of the monotone chain."""
    pts = sorted(set(pts))
    n = len(pts)
    if n <= 2:
        return set(pts)
    verts = set()
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            ax, ay = pts[i]
            bx, by = pts[j]
            ok = True
            for k in range(n):
                if k in (i, j):
                    continue
                px, py = pts[k]
                cr = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
                if cr < 0:
                    ok = False
                    break
                if cr == 0 and not (min(ax, bx) <= px <= max(ax, bx)
                                    and min(ay, by) <= py <= max(ay, by)):
                    ok = False
                    break
            if ok:
                verts.add((ax, ay))
                break
    return verts


def _rand_pts(rng, n, lo=0, hi=65536):
    return [(int(x), int(y)) for x, y in
            zip(rng.integers(lo, hi, n), rng.integers(lo, hi, n))]


def _mk_df(spark, rows, schema="grp long, x long, y long"):
    return spark.createDataFrame(rows, schema)


def test_grouped_hull_matches_edge_characterization(spark):
    rng = np.random.default_rng(42)
    rows, want = [], {}
    for g in range(6):
        # mix: uniform, clustered (hull ~tiny), small-n
        n = [60, 120, 9, 3, 2, 1][g]
        pts = _rand_pts(rng, n) if g < 2 else _rand_pts(rng, n, 30000, 30200)
        rows += [(g, x, y) for x, y in pts]
        want[g] = _brute_strict_hull(pts)
    got = hull.convex_hull(_mk_df(spark, rows), "grp").toPandas()
    for g, sub in got.groupby("grp"):
        assert set(zip(sub.x, sub.y)) == want[g], f"grp {g}"
        # seq is 0..h-1
        assert sorted(sub.seq) == list(range(len(sub)))
    assert set(got.grp) == set(want)


def test_hull_ccw_order_from_lexmin_and_convex(spark):
    rng = np.random.default_rng(7)
    pts = _rand_pts(rng, 200)
    got = hull.convex_hull(
        _mk_df(spark, [(0, x, y) for x, y in pts]), "grp").toPandas()
    got = got.sort_values("seq")
    ring = list(zip(got.x, got.y))
    assert ring[0] == min(set(pts))  # starts at lexicographic min
    h = len(ring)
    assert h >= 3
    for i in range(h):
        ax, ay = ring[i]
        bx, by = ring[(i + 1) % h]
        cx, cy = ring[(i + 2) % h]
        # strictly convex (collinear mid-edge points dropped)
        assert (bx - ax) * (cy - ay) - (by - ay) * (cx - ax) > 0
    # every input point inside or on the hull
    for px, py in pts:
        for i in range(h):
            ax, ay = ring[i]
            bx, by = ring[(i + 1) % h]
            assert (bx - ax) * (py - ay) - (by - ay) * (px - ax) >= 0


def test_global_hull_partition_invariant(spark):
    rng = np.random.default_rng(11)
    pts = _rand_pts(rng, 3000)
    df = spark.createDataFrame(pts, "x long, y long")
    ref = None
    for parts in (1, 7, 32):
        got = hull.convex_hull(df.repartition(parts)).toPandas() \
            .sort_values("seq")
        ring = list(zip(got.x, got.y))
        assert (got.grp == 0).all()
        if ref is None:
            ref = ring
        else:
            assert ring == ref, f"partitioning changed the hull ({parts})"
    # spot-check against grouped path (same algorithm, different plan)
    grouped = hull.convex_hull(
        _mk_df(spark, [(0, x, y) for x, y in pts]), "grp").toPandas()
    assert set(zip(grouped.x, grouped.y)) == set(ref)


def test_hull_degenerate_collinear_and_duplicates(spark):
    # all points on y = 2x, with duplicates: strict hull = 2 endpoints
    rows = [(0, x, 2 * x) for x in (5, 1, 9, 3, 1, 9, 7)]
    got = hull.convex_hull(_mk_df(spark, rows), "grp").toPandas()
    assert set(zip(got.x, got.y)) == {(1, 2), (9, 18)}
    # single point
    got1 = hull.convex_hull(_mk_df(spark, [(1, 4, 4)]), "grp").toPandas()
    assert set(zip(got1.x, got1.y)) == {(4, 4)}


def test_diameter_matches_brute_pair_max(spark):
    rng = np.random.default_rng(99)
    rows = []
    want = {}
    for g in range(5):
        n = [80, 40, 3, 2, 1][g]
        pts = _rand_pts(rng, n)
        rows += [(g, x, y) for x, y in pts]
        arr = np.array(pts, dtype=np.int64)
        if n >= 2:
            dx = arr[:, 0][:, None] - arr[:, 0][None, :]
            dy = arr[:, 1][:, None] - arr[:, 1][None, :]
            want[g] = (n, int((dx * dx + dy * dy).max()),
                       len(_brute_strict_hull(pts)))
        else:
            want[g] = (n, 0, 1)
    got = hull.diameter(_mk_df(spark, rows), "grp").toPandas()
    assert len(got) == len(want)
    for _, r in got.iterrows():
        n, d2, hs = want[int(r.grp)]
        assert (int(r.n_pts), int(r.max_d2), int(r.hull_size)) == (n, d2, hs)


def test_akl_toussaint_keeps_all_hull_vertices():
    # adversarial: dense interior blob + sparse extremes near corners
    rng = np.random.default_rng(5)
    pts = _rand_pts(rng, 500, 20000, 45000) + \
        [(3, 7), (65000, 12), (64990, 65012), (9, 65500), (2, 32000)]
    x = np.array([p[0] for p in pts], dtype=np.int64)
    y = np.array([p[1] for p in pts], dtype=np.int64)
    keep = hull._akl_toussaint(x, y)
    survivors = {(int(a), int(b)) for a, b in zip(x[keep], y[keep])}
    assert _brute_strict_hull(pts) <= survivors
    # and the filter actually prunes the blob
    assert keep.sum() < len(pts) * 0.2
