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
    pts = [(int(RNG.integers(0, 65536)), int(RNG.integers(0, 65536)))
           for _ in range(300)]
    # exact same-lattice midpoints (x = w mod 2w / y = h mod 2h) and
    # lattice centers themselves — the tie-rule edge cases
    pts += [(w, h), (3 * w, 5 * h), (2 * w, 2 * h), (5 * w, 16 * h),
            (w, 4 * h), (6 * w, 3 * h)]
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
    pts = [(int(RNG.integers(0, 65536)), int(RNG.integers(0, 65536)))
           for _ in range(500)]
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
