"""O4/O5: box ctor normalize + center/size accessors vs NumPy
(BoundaryBox.hpp:18-38, 58-66)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from optimizing_spark.functions import geometry as G


def test_normalized_box_swap_fix(spark):
    """Negative sizes swap min/max exactly like the BoundaryBox ctor."""
    pdf = pd.DataFrame({
        "x": [0.0, 5.0, -3.0, 7.5],
        "y": [1.0, -2.0, 4.0, 0.0],
        "w": [2.0, -5.0, 0.0, -7.5],
        "h": [3.0, -1.0, -4.0, 2.5],
    })
    df = spark.createDataFrame(pdf)
    mnx, mny, mxx, mxy = G.normalized_box("x", "y", "w", "h")
    got = df.select(mnx.alias("a"), mny.alias("b"), mxx.alias("c"), mxy.alias("d")) \
        .toPandas()
    ex, ey = pdf.x + pdf.w, pdf.y + pdf.h
    assert np.allclose(got.a, np.minimum(pdf.x, ex))
    assert np.allclose(got.b, np.minimum(pdf.y, ey))
    assert np.allclose(got.c, np.maximum(pdf.x, ex))
    assert np.allclose(got.d, np.maximum(pdf.y, ey))
    # normalized: min <= max always
    assert (got.a <= got.c).all() and (got.b <= got.d).all()


def test_box_center_size_roundtrip(spark):
    """center/size reproduce (min+max)*0.5 and max-min; 2D and 3D."""
    pdf = pd.DataFrame({
        "min_x": [0.0, -8.0], "min_y": [1.0, 2.0], "min_z": [-1.0, 0.5],
        "max_x": [4.0, -2.0], "max_y": [9.0, 2.0], "max_z": [3.0, 0.5],
    })
    df = spark.createDataFrame(pdf)
    box3 = G.BoxCols.prefixed("", dims=3)
    cx, cy, cz = G.box_center(box3)
    sx, sy, sz = G.box_size(box3)
    got = df.select(cx.alias("cx"), cy.alias("cy"), cz.alias("cz"),
                    sx.alias("sx"), sy.alias("sy"), sz.alias("sz")).toPandas()
    assert np.allclose(got.cx, (pdf.min_x + pdf.max_x) * 0.5)
    assert np.allclose(got.cy, (pdf.min_y + pdf.max_y) * 0.5)
    assert np.allclose(got.cz, (pdf.min_z + pdf.max_z) * 0.5)
    assert np.allclose(got.sx, pdf.max_x - pdf.min_x)
    assert np.allclose(got.sy, pdf.max_y - pdf.min_y)
    assert np.allclose(got.sz, pdf.max_z - pdf.min_z)

    box2 = G.BoxCols.prefixed("", dims=2)
    c2 = G.box_center(box2)
    s2 = G.box_size(box2)
    assert len(c2) == 2 and len(s2) == 2
    got2 = df.select(c2[0].alias("cx"), s2[1].alias("sy")).toPandas()
    assert np.allclose(got2.cx, (pdf.min_x + pdf.max_x) * 0.5)
    assert np.allclose(got2.sy, pdf.max_y - pdf.min_y)


def test_shoelace_matches_numpy(spark):
    """geometry.shoelace_cols vs the NumPy shoelace on random simple
    (star-shaped, angle-sorted) integer polygons: area2 / centroid
    numerators exact, CW negation symmetric, triangle closed form."""
    import numpy as np
    from pyspark.sql import functions as F

    from optimizing_spark.functions import geometry as G

    rng = np.random.default_rng(13)
    rows = []
    want = {}
    for pid in range(12):
        n = int(rng.integers(3, 12))
        # star-shaped around an INTERIOR center: one angle per sector
        # (stratified), so the ring is simple AND CCW for any radii
        cx, cy = rng.integers(2000, 60000, 2)
        ang = 2 * np.pi * (np.arange(n) + rng.uniform(0.05, 0.95, n)) / n
        rad = rng.integers(100, 1900, n)
        xs = (cx + rad * np.cos(ang)).astype(np.int64)
        ys = (cy + rad * np.sin(ang)).astype(np.int64)
        x2 = np.roll(xs, -1)
        y2 = np.roll(ys, -1)
        cross = xs * y2 - x2 * ys
        want[pid] = (int(cross.sum()),
                     int(((xs + x2) * cross).sum()),
                     int(((ys + y2) * cross).sum()))
        assert want[pid][0] > 0  # CCW by construction
        rows.append((pid, [(int(a), int(b)) for a, b in zip(xs, ys)]))
    df = spark.createDataFrame(
        rows, "pid long, vertices array<struct<x: long, y: long>>")
    a2, cx6, cy6 = G.shoelace_cols(F.col("vertices"))
    got = df.select("pid", a2.alias("a2"), cx6.alias("cx6"),
                    cy6.alias("cy6")).toPandas()
    for _, r in got.iterrows():
        assert (int(r.a2), int(r.cx6), int(r.cy6)) == want[int(r.pid)]
    # reversing the ring negates all three sums
    rev = df.select("pid", F.reverse("vertices").alias("vertices"))
    a2r, cx6r, cy6r = G.shoelace_cols(F.col("vertices"))
    gotr = rev.select("pid", a2r.alias("a2"), cx6r.alias("cx6"),
                      cy6r.alias("cy6")).toPandas()
    for _, r in gotr.iterrows():
        w = want[int(r.pid)]
        assert (int(r.a2), int(r.cx6), int(r.cy6)) == \
            (-w[0], -w[1], -w[2])
    # unit right triangle: area2 = 1, centroid numerators 1, 1
    tri = spark.createDataFrame(
        [(0, [(0, 0), (1, 0), (0, 1)])],
        "pid long, vertices array<struct<x: long, y: long>>")
    a2t, cxt, cyt = G.shoelace_cols(F.col("vertices"))
    r = tri.select(a2t.alias("a"), cxt.alias("x"), cyt.alias("y")) \
        .collect()[0]
    assert (r.a, r.x, r.y) == (1, 1, 1)
