"""Property-based tests (hypothesis): the engine's assignment rules
hold for arbitrary boxes, not just the fixture distributions."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from optimizing_spark.config import QT_BENCH_WORLD, QT_MAX_DEPTH
from optimizing_spark.operators import tiling
from tests.oracles import spatial as oracle

coord = st.floats(min_value=0.0, max_value=100_000.0,
                  allow_nan=False, allow_infinity=False)
size = st.floats(min_value=0.0, max_value=5_000.0,
                 allow_nan=False, allow_infinity=False)


@st.composite
def boxes(draw, n=st.integers(min_value=1, max_value=40)):
    k = draw(n)
    return [(draw(coord), draw(coord), draw(size), draw(size)) for _ in range(k)]


_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from optimizing_spark.session import get_spark
        _spark = get_spark("props", cores=4, shuffle_partitions=4)
    return _spark


@settings(max_examples=12, deadline=None)
@given(boxes())
def test_static_assignment_matches_oracle_on_arbitrary_boxes(bs):
    spark = _get_spark()
    pdf = pd.DataFrame(bs, columns=["x", "y", "size_x", "size_y"])
    pdf["obj_id"] = np.arange(len(pdf))
    df = tiling.with_box_cols(spark.createDataFrame(pdf), dims=2)
    got = tiling.tile_static_quadtree(df).select("obj_id", "qt_depth", "qt_code") \
        .toPandas().sort_values("obj_id")
    min_x = pdf.x.to_numpy()
    min_y = pdf.y.to_numpy()
    g_depth, g_code = oracle.static_quadtree_assign(
        min_x, min_y, min_x + pdf.size_x.to_numpy(), min_y + pdf.size_y.to_numpy(),
        (QT_BENCH_WORLD.min_x, QT_BENCH_WORLD.min_y,
         QT_BENCH_WORLD.max_x, QT_BENCH_WORLD.max_y),
        QT_MAX_DEPTH,
    )
    assert (got.qt_depth.to_numpy() == g_depth).all()
    assert (got.qt_code.to_numpy() == g_code).all()


@settings(max_examples=8, deadline=None)
@given(boxes())
def test_assignment_depth_cell_consistency(bs):
    """Structural invariants independent of the oracle: depth in
    [0, max-1]; code < 4^depth; the cell's box (decoded from the path)
    CONTAINS the item box whenever depth > 0 (min-closed/max-strict)."""
    spark = _get_spark()
    pdf = pd.DataFrame(bs, columns=["x", "y", "size_x", "size_y"])
    pdf["obj_id"] = np.arange(len(pdf))
    df = tiling.with_box_cols(spark.createDataFrame(pdf), dims=2)
    got = tiling.tile_static_quadtree(df).toPandas().sort_values("obj_id")
    w = QT_BENCH_WORLD
    for r in got.itertuples():
        assert 0 <= r.qt_depth <= QT_MAX_DEPTH - 1
        assert 0 <= r.qt_code < 4 ** r.qt_depth or r.qt_depth == 0
        # decode cell bounds by recursive halving of the path digits
        c0x, c0y, c1x, c1y = w.min_x, w.min_y, w.max_x, w.max_y
        for lvl in range(r.qt_depth - 1, -1, -1):
            digit = (r.qt_code >> (2 * lvl)) & 3
            mx = c0x + (c1x - c0x) * 0.5
            my = c0y + (c1y - c0y) * 0.5
            c0x, c1x = (mx, c1x) if digit & 1 else (c0x, mx)
            c0y, c1y = (my, c1y) if digit & 2 else (c0y, my)
        if r.qt_depth > 0:
            assert r.min_x >= c0x and r.max_x < c1x
            assert r.min_y >= c0y and r.max_y < c1y


@st.composite
def int_boxes3(draw):
    n = draw(st.integers(min_value=2, max_value=60))
    c = st.integers(min_value=0, max_value=(1 << 16) - 1)
    s = st.integers(min_value=1, max_value=5000)
    return [(draw(c), draw(c), draw(c), draw(s), draw(s), draw(s)) for _ in range(n)]


@settings(max_examples=8, deadline=None)
@given(int_boxes3())
def test_capacity_octree_invariants(bs):
    """Capacity-rule invariants on arbitrary integer boxes: depth <=
    static fitting depth; every non-leaf node holds at most CAPACITY
    items PLUS straddlers (items whose dmax equals that depth); the
    node prefix matches the item's Morton path."""
    from optimizing_spark.functions import cells as C

    spark = _get_spark()
    pdf = pd.DataFrame(bs, columns=["ix", "iy", "iz", "sx", "sy", "sz"])
    pdf["obj_id"] = np.arange(len(pdf))
    df = spark.createDataFrame(pdf).repartition(3)
    got = C.assign_octree_capacity_pow2(df, capacity=4, max_depth=5) \
        .toPandas().sort_values("obj_id").reset_index(drop=True)
    static = C.assign_octree_pow2(spark.createDataFrame(pdf)) \
        .select("obj_id", "oct_depth", "oct_code").toPandas() \
        .sort_values("obj_id").reset_index(drop=True)
    assert (got.oct_depth.to_numpy() <= static.oct_depth.to_numpy()).all()
    # node prefix consistency: capacity code == static deepest code
    # shifted up to the assigned depth (cells nest)
    for r, s in zip(got.itertuples(), static.itertuples()):
        assert r.oct_code == (s.oct_code >> (3 * (s.oct_depth - r.oct_depth)))
    # per-node occupancy: <= capacity + straddlers-at-that-depth (+ leaves free)
    merged = got.merge(static.rename(columns={"oct_depth": "dmax"})[["obj_id", "dmax"]],
                       on="obj_id")
    for (d, code), g in merged.groupby(["oct_depth", "oct_code"]):
        if d < 5:
            n_deeper = (g.dmax > d).sum()
            assert n_deeper <= 4, f"node ({d},{code}) holds {n_deeper} non-straddlers"
