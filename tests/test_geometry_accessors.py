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
