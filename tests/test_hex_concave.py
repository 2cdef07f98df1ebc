"""Non-convex point-in-polygon (crossing number) and hexagonal cell
index (H3-analog two-lattice binning) vs NumPy oracles."""

import numpy as np
from pyspark.sql import functions as F

from optimizing_spark.functions import cells, geometry
from optimizing_spark.operators import joins

RNG = np.random.default_rng(42)


# ---------------------------------------------------------------------------
# NumPy oracles
# ---------------------------------------------------------------------------

def _crossing_inside(px, py, ring):
    """Even-odd crossing number, integer multiply-through — the exact
    reference semantics of geometry.point_in_polygon_crossing."""
    n = len(ring)
    c = 0
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        lhs = (px - x1) * (y2 - y1)
        rhs = (x2 - x1) * (py - y1)
        if y1 <= py < y2 and lhs < rhs:
            c += 1
        elif y2 <= py < y1 and lhs > rhs:
            c += 1
    return c % 2 == 1


def _star(cx, cy, ex, ey):
    ix, iy = 1 + ex // 4, 1 + ey // 4
    return [
        (cx + ex, cy), (cx + ix, cy + iy), (cx, cy + ey),
        (cx - ix, cy + iy), (cx - ex, cy), (cx - ix, cy - iy),
        (cx, cy - ey), (cx + ix, cy - iy),
    ]


def _hex_oracle(x, y, w, h):
    """Nearest center over the combined lattice, brute force, with the
    engine's exact tie rules: cross-lattice tie -> lattice A (even
    parity); same-lattice tie (point exactly midway between two
    centers of one lattice) -> the upper center, because the closed
    form rounds via floor((v + half) / pitch)."""
    cands = []
    for q in range(x // w - 3, x // w + 4):
        for r in range(y // h - 3, y // h + 4):
            if q % 2 != r % 2:
                continue
            d = (x - w * q) ** 2 + (y - h * r) ** 2
            cands.append((d, q % 2, -q, -r))
    cands.sort()
    d, parity, nq, nr = cands[0]
    return -nq, -nr


# ---------------------------------------------------------------------------
# Crossing-number PIP
# ---------------------------------------------------------------------------

def test_crossing_join_matches_numpy_oracle(spark):
    stars = [(1, 500, 400, 300, 200), (2, 900, 800, 250, 350),
             (3, 200, 900, 150, 120)]
    pts = [(int(i), int(RNG.integers(0, 1300)), int(RNG.integers(0, 1300)))
           for i in range(400)]

    polys = spark.createDataFrame(
        [(qid, [{"x": x, "y": y} for x, y in _star(cx, cy, ex, ey)])
         for qid, cx, cy, ex, ey in stars],
        "query_id long, vertices array<struct<x:long,y:long>>")
    p = spark.createDataFrame(pts, "point_id long, x long, y long")

    got = joins.polygon_join(p, polys, method="broadcast", test="crossing") \
        .select("query_id", "point_id").toPandas()
    got_pairs = set(zip(got.query_id, got.point_id))

    want = {
        (qid, pid)
        for qid, cx, cy, ex, ey in stars
        for pid, px, py in pts
        if _crossing_inside(px, py, _star(cx, cy, ex, ey))
    }
    assert got_pairs == want
    assert len(want) > 0


def test_crossing_rejects_concave_notch(spark):
    """A point inside the star's convex hull but inside a notch must be
    rejected by the crossing test and accepted by the half-plane test
    run on the hull — the case that motivates the operator."""
    ring = _star(0, 0, 400, 300)
    # deep in the NE notch: on the hull (diamond) but outside the star
    px, py = 180, 140
    hull = [(400, 0), (0, 300), (-400, 0), (0, -300)]
    assert not _crossing_inside(px, py, ring)
    assert _crossing_inside(px, py, hull)

    df = spark.range(1).select(
        F.lit(px).alias("x"), F.lit(py).alias("y"))
    star_lit = F.array(*[
        F.struct(F.lit(x).alias("x"), F.lit(y).alias("y")) for x, y in ring])
    hull_lit = F.array(*[
        F.struct(F.lit(x).alias("x"), F.lit(y).alias("y")) for x, y in hull])
    row = df.select(
        geometry.point_in_polygon_crossing("x", "y", star_lit).alias("in_star"),
        geometry.point_in_polygon_crossing("x", "y", hull_lit).alias("in_hull"),
        geometry.point_in_convex_polygon("x", "y", hull_lit).alias("in_hull_hp"),
    ).collect()[0]
    assert not row.in_star
    assert row.in_hull and row.in_hull_hp


def test_crossing_equals_halfplane_on_strict_interior(spark):
    """On a CONVEX ring the two predicates agree for every point not
    exactly on the boundary (they differ only in boundary convention:
    half-plane is closed, crossing is half-open)."""
    hull = [(400, 100), (100, 350), (-350, 0), (0, -300)]
    pts = [(int(RNG.integers(-500, 500)), int(RNG.integers(-500, 500)))
           for _ in range(500)]

    def on_edge(px, py):
        n = len(hull)
        for i in range(n):
            x1, y1 = hull[i]
            x2, y2 = hull[(i + 1) % n]
            cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
            if cross == 0 and min(x1, x2) <= px <= max(x1, x2) \
                    and min(y1, y2) <= py <= max(y1, y2):
                return True
        return False

    interior_pts = [(px, py) for px, py in pts if not on_edge(px, py)]
    df = spark.createDataFrame(interior_pts, "x long, y long")
    ring = F.array(*[
        F.struct(F.lit(x).alias("x"), F.lit(y).alias("y")) for x, y in hull])
    out = df.select(
        geometry.point_in_polygon_crossing("x", "y", ring).alias("a"),
        geometry.point_in_convex_polygon("x", "y", ring).alias("b"),
    ).toPandas()
    assert (out.a == out.b).all()


# ---------------------------------------------------------------------------
# Hex cells
# ---------------------------------------------------------------------------

def test_hex_cell_is_nearest_lattice_center(spark):
    w, h = cells.HEX_W, cells.HEX_H
    pts = [(int(RNG.integers(-65536, 65536)), int(RNG.integers(-65536, 65536)))
           for _ in range(300)]
    # exact same-lattice midpoints (x = w mod 2w / y = h mod 2h) and
    # lattice centers themselves — the tie-rule edge cases — plus
    # negative-quadrant mirrors
    pts += [(w, h), (3 * w, 5 * h), (2 * w, 2 * h), (5 * w, 16 * h),
            (w, 4 * h), (6 * w, 3 * h),
            (-w, -h), (-3 * w, 5 * h), (-2 * w, -2 * h), (-5 * w, -16 * h)]
    df = spark.createDataFrame(pts, "x long, y long")
    hq, hr = cells.hex_cell(F.col("x"), F.col("y"))
    got = df.select("x", "y", hq.alias("hq"), hr.alias("hr")).toPandas()

    for _, row in got.iterrows():
        q, r = _hex_oracle(int(row.x), int(row.y), w, h)
        assert (row.hq, row.hr) == (q, r), (row.x, row.y)
        assert row.hq % 2 == row.hr % 2


def test_hex_neighbors_tile_the_plane(spark):
    """Every point's cell is either the query cell or one of its 6
    neighbors when the point lies within one pitch of the cell center
    — the kring property the hex ring join relies on."""
    w, h = cells.HEX_W, cells.HEX_H
    cx, cy = 16 * w, 16 * h  # a lattice-A center (q=16, r=16)
    offs = {(0, 0), (2, 0), (-2, 0), (1, 1), (1, -1), (-1, 1), (-1, -1)}
    pts = [(cx + int(RNG.integers(-w, w + 1)), cy + int(RNG.integers(-h, h + 1)))
           for _ in range(300)]
    df = spark.createDataFrame(pts, "x long, y long")
    hq, hr = cells.hex_cell(F.col("x"), F.col("y"))
    got = df.select(hq.alias("hq"), hr.alias("hr")).toPandas()
    for _, row in got.iterrows():
        assert (row.hq - 16, row.hr - 16) in offs


def test_hex_cells_partition_exclusively(spark):
    """Each point maps to exactly one cell and the SQL twin expression
    (cells.hex_cell_sql) agrees bit-for-bit via Spark's own SQL
    engine parsing the DuckDB-shaped expression."""
    import duckdb

    w, h = cells.HEX_W, cells.HEX_H
    # negative coordinates included: DuckDB `//` truncates toward zero,
    # so the SQL twin must emit true floor division to stay bit-exact
    # on the signed domain (segments' coords are documented to go
    # negative).
    pts = [(int(RNG.integers(-65536, 65536)), int(RNG.integers(-65536, 65536)))
           for _ in range(500)]
    pts += [(-3000, -5000), (-1, -1), (-w, -h), (-2 * w, 2 * h), (0, -65536)]
    df = spark.createDataFrame(pts, "x long, y long")
    hq, hr = cells.hex_cell(F.col("x"), F.col("y"))
    got = df.select("x", "y", hq.alias("hq"), hr.alias("hr")).toPandas()

    con = duckdb.connect()
    con.register("pts", got[["x", "y"]])
    qsql, rsql = cells.hex_cell_sql("x", "y", w, h)
    want = con.execute(
        f"SELECT x, y, {qsql} AS hq, {rsql} AS hr FROM pts ORDER BY x, y"
    ).df()
    g = got.sort_values(["x", "y"]).reset_index(drop=True)
    assert (g.hq.to_numpy() == want.hq.to_numpy()).all()
    assert (g.hr.to_numpy() == want.hr.to_numpy()).all()


# ---------------------------------------------------------------------------
# Segment-segment + polygon-polygon overlap
# ---------------------------------------------------------------------------

def _on_seg(px, py, x1, y1, x2, y2):
    return ((x2 - x1) * (py - y1) - (y2 - y1) * (px - x1) == 0
            and min(x1, x2) <= px <= max(x1, x2)
            and min(y1, y2) <= py <= max(y1, y2))


def _frac_seg_intersect(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2):
    """Independent exact oracle: solve the parametric line system in
    Fractions (a different algorithm from the engine's orientation
    SAT), closed semantics, degenerate/collinear cases explicit."""
    from fractions import Fraction

    if (ax1, ay1) == (ax2, ay2) and (bx1, by1) == (bx2, by2):
        return (ax1, ay1) == (bx1, by1)
    if (ax1, ay1) == (ax2, ay2):
        return _on_seg(ax1, ay1, bx1, by1, bx2, by2)
    if (bx1, by1) == (bx2, by2):
        return _on_seg(bx1, by1, ax1, ay1, ax2, ay2)
    d1x, d1y = ax2 - ax1, ay2 - ay1
    d2x, d2y = bx2 - bx1, by2 - by1
    denom = d1x * d2y - d1y * d2x
    if denom != 0:
        # a + t*d1 = b + s*d2
        t = Fraction((bx1 - ax1) * d2y - (by1 - ay1) * d2x, denom)
        s = Fraction((bx1 - ax1) * d1y - (by1 - ay1) * d1x, denom)
        return 0 <= t <= 1 and 0 <= s <= 1
    if d1x * (by1 - ay1) - d1y * (bx1 - ax1) != 0:
        return False  # parallel, distinct lines
    # collinear: 1D interval overlap (both axes = bbox overlap)
    return (min(ax1, ax2) <= max(bx1, bx2) and max(ax1, ax2) >= min(bx1, bx2)
            and min(ay1, ay2) <= max(by1, by2)
            and max(ay1, ay2) >= min(by1, by2))


def test_segments_intersect_matches_rational_oracle(spark):
    cases = []
    for _ in range(600):
        a = [int(RNG.integers(0, 120)) for _ in range(4)]
        b = [int(RNG.integers(0, 120)) for _ in range(4)]
        cases.append(tuple(a + b))
    # constructed: touching at endpoint, T-touch, collinear overlap,
    # collinear disjoint, degenerate point on / off segment
    cases += [
        (0, 0, 10, 10, 10, 10, 20, 0),        # endpoint touch
        (0, 0, 10, 0, 5, 0, 5, 8),            # T-touch on interior
        (0, 0, 10, 0, 4, 0, 20, 0),           # collinear overlap
        (0, 0, 10, 0, 11, 0, 20, 0),          # collinear disjoint
        (0, 0, 10, 0, 3, 0, 3, 0),            # point on segment
        (0, 0, 10, 0, 3, 1, 3, 1),            # point off segment
        (0, 0, 0, 0, 0, 0, 0, 0),             # two equal points
    ]
    df = spark.createDataFrame(
        cases, "ax1 long, ay1 long, ax2 long, ay2 long, "
               "bx1 long, by1 long, bx2 long, by2 long")
    got = df.select(
        "*",
        geometry.segments_intersect(
            "ax1", "ay1", "ax2", "ay2", "bx1", "by1", "bx2", "by2"
        ).alias("hit")).toPandas()
    n_hits = 0
    for _, r in got.iterrows():
        want = _frac_seg_intersect(r.ax1, r.ay1, r.ax2, r.ay2,
                                   r.bx1, r.by1, r.bx2, r.by2)
        assert bool(r.hit) == want, tuple(r)
        n_hits += want
    assert n_hits >= 5  # constructed positives all present


def _py_polys_overlap(ring_a, ring_b):
    na, nb = len(ring_a), len(ring_b)
    for i in range(na):
        for j in range(nb):
            a0, a1 = ring_a[i], ring_a[(i + 1) % na]
            b0, b1 = ring_b[j], ring_b[(j + 1) % nb]
            if _frac_seg_intersect(*a0, *a1, *b0, *b1):
                return True
    return (_crossing_inside(*ring_a[0], ring_b)
            or _crossing_inside(*ring_b[0], ring_a))


def _diamond(cx, cy, ex, ey):
    return [(cx, cy - ey), (cx + ex, cy), (cx, cy + ey), (cx - ex, cy)]


def test_polygon_polygon_join_matches_python_oracle(spark):
    stars = [(1, 1000, 1000, 400, 300), (2, 2500, 800, 250, 350),
             (3, 600, 2400, 150, 120)]
    dias = []
    for i in range(120):
        dias.append((i, int(RNG.integers(0, 3200)), int(RNG.integers(0, 3200)),
                     int(RNG.integers(40, 400)), int(RNG.integers(40, 300))))
    # constructed: diamond fully inside a star spike, star notch case,
    # vertex-touching diamond (east spike tip = west diamond vertex)
    dias.append((200, 1000, 1000, 30, 30))        # inside star core
    dias.append((201, 1000 + 400 + 50, 1000, 50, 40))  # touches east tip
    a_df = spark.createDataFrame(
        [(qid, [{"x": x, "y": y} for x, y in _star(cx, cy, ex, ey)])
         for qid, cx, cy, ex, ey in stars],
        "query_id long, vertices_a array<struct<x:long,y:long>>")
    b_df = spark.createDataFrame(
        [(pid, [{"x": x, "y": y} for x, y in _diamond(cx, cy, ex, ey)])
         for pid, cx, cy, ex, ey in dias],
        "poly_id long, vertices_b array<struct<x:long,y:long>>")
    got = joins.polygon_polygon_join(a_df, b_df, method="broadcast") \
        .select("query_id", "poly_id").toPandas()
    got_pairs = set(zip(got.query_id, got.poly_id))
    want = {
        (qid, pid)
        for qid, cx, cy, ex, ey in stars
        for pid, dx_, dy_, dex, dey in dias
        if _py_polys_overlap(_star(cx, cy, ex, ey), _diamond(dx_, dy_, dex, dey))
    }
    assert got_pairs == want
    assert (1, 200) in got_pairs   # containment (no edge intersections)
    assert (1, 201) in got_pairs   # vertex-touch counts (closed)


def test_polygon_polygon_join_cells_equals_broadcast(spark):
    from optimizing_spark.config import Box2

    stars, dias = [], []
    for i in range(25):
        stars.append((i, int(RNG.integers(2000, 63000)),
                      int(RNG.integers(2000, 63000)),
                      int(RNG.integers(500, 2000)), int(RNG.integers(400, 1500))))
    for i in range(800):
        dias.append((i, int(RNG.integers(0, 65536)), int(RNG.integers(0, 65536)),
                     int(RNG.integers(100, 600)), int(RNG.integers(80, 500))))
    a_df = spark.createDataFrame(
        [(qid, [{"x": x, "y": y} for x, y in _star(cx, cy, ex, ey)])
         for qid, cx, cy, ex, ey in stars],
        "query_id long, vertices_a array<struct<x:long,y:long>>")
    b_df = spark.createDataFrame(
        [(pid, [{"x": x, "y": y} for x, y in _diamond(cx, cy, ex, ey)])
         for pid, cx, cy, ex, ey in dias],
        "poly_id long, vertices_b array<struct<x:long,y:long>>")
    world = Box2(0.0, 0.0, 65536.0, 65536.0)
    a = joins.polygon_polygon_join(a_df, b_df, method="broadcast") \
        .select("query_id", "poly_id").toPandas()
    b = joins.polygon_polygon_join(a_df, b_df, method="cells",
                                   world=world, depth=5) \
        .select("query_id", "poly_id").toPandas()
    assert len(b) == len(set(zip(b.query_id, b.poly_id)))
    assert set(zip(a.query_id, a.poly_id)) == set(zip(b.query_id, b.poly_id))
    assert len(a) > 0
