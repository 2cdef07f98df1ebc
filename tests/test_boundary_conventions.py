"""Deliberate boundary fixtures: the two interval conventions differ
exactly on cell edges — these pin the sign-for-sign behavior.

2D rect (strict max): a box whose max touches the midline does NOT fit
the lower child. 3D box (closed): a box whose max touches the midplane
DOES fit the lower child; ties prefer the lower (first-enum) child.
"""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from optimizing_spark.config import Box2, Box3
from optimizing_spark.functions import cells as C
from optimizing_spark.operators import joins, tiling
from tests.oracles import spatial as oracle


def test_2d_strict_max_on_midline(spark):
    world = Box2(0.0, 0.0, 1024.0, 1024.0)
    cases = pd.DataFrame({
        "obj_id": [0, 1, 2, 3],
        # box [0,512]x[0,512]: max touches mid -> strict fails -> root
        "min_x": [0.0, 0.0, 512.0, 100.0],
        "min_y": [0.0, 0.0, 512.0, 100.0],
        "max_x": [512.0, 511.0, 1000.0, 101.0],
        "max_y": [512.0, 511.0, 1000.0, 101.0],
    })
    df = spark.createDataFrame(cases)
    got = C.assign_static_quadtree(df, world, max_depth=5) \
        .select("obj_id", "qt_depth", "qt_code").toPandas().set_index("obj_id")
    # oracle agrees
    g_depth, g_code = oracle.static_quadtree_assign(
        cases.min_x.to_numpy(), cases.min_y.to_numpy(),
        cases.max_x.to_numpy(), cases.max_y.to_numpy(),
        (0.0, 0.0, 1024.0, 1024.0), 5)
    assert (got.qt_depth.to_numpy() == g_depth).all()
    assert (got.qt_code.to_numpy() == g_code).all()
    # pinned semantics
    assert got.loc[0, "qt_depth"] == 0          # max == mid -> stays at root
    assert got.loc[1, "qt_depth"] >= 1          # max just inside -> descends
    assert got.loc[2, "qt_depth"] >= 1          # upper-right child ok
    assert got.loc[3, "qt_depth"] == 4          # tiny box -> deepest node


def test_3d_closed_max_on_midplane_prefers_lower(spark):
    """Closed 3D: box ending exactly at the midplane fits the LOWER
    child (contains is <=); degenerate box exactly on the plane fits
    both -> SWD-first enum order wins (lower)."""
    world = Box3(0.0, 0.0, 0.0, 1024.0, 1024.0, 1024.0)
    cases = pd.DataFrame({
        "obj_id": [0, 1, 2],
        "min_x": [0.0, 512.0, 512.0],
        "min_y": [0.0, 0.0, 0.0],
        "min_z": [0.0, 0.0, 0.0],
        # 0: [0,512] closed -> fits lower child; 1: [512,1024] upper;
        # 2: degenerate x=[512,512] on the plane -> both contain -> lower
        "max_x": [512.0, 1024.0, 512.0],
        "max_y": [100.0, 100.0, 100.0],
        "max_z": [100.0, 100.0, 100.0],
    })
    boxes = cases[["min_x", "min_y", "min_z", "max_x", "max_y", "max_z"]].to_numpy()
    g_depth, g_code = oracle.octree_capacity_assign(
        boxes, (0, 0, 0, 1024, 1024, 1024), capacity=100, max_depth=5)
    # capacity 100 -> nothing descends (first 100 stay at root)
    assert (g_depth == 0).all()
    # capacity 0 -> pure containment descent
    g_depth0, g_code0 = oracle.octree_capacity_assign(
        boxes, (0, 0, 0, 1024, 1024, 1024), capacity=0, max_depth=1)
    assert g_depth0.tolist() == [1, 1, 1]
    assert [c & 1 for c in g_code0.tolist()] == [0, 1, 0]  # lower, upper, LOWER

    df = tiling.with_box_cols(
        spark.createDataFrame(cases.assign(
            x=cases.min_x, y=cases.min_y, z=cases.min_z,
            size_x=cases.max_x - cases.min_x,
            size_y=cases.max_y - cases.min_y,
            size_z=cases.max_z - cases.min_z)),
        dims=3)
    got = tiling.tile_octree_capacity(df, world, capacity=0, max_depth=1,
                                      seq_col="obj_id") \
        .select("obj_id", "oct_depth", "oct_code").toPandas().set_index("obj_id")
    assert got.oct_depth.tolist() == [1, 1, 1]
    assert [c & 1 for c in got.oct_code.tolist()] == [0, 1, 0]


def test_rect_overlap_asymmetry(spark):
    """search() overlap: q.min < i.max strict, q.max >= i.min closed —
    touching at the query's max edge counts, at the query's min edge
    does not."""
    q = pd.DataFrame({"query_id": [0], "min_x": [100.0], "min_y": [100.0],
                      "max_x": [200.0], "max_y": [200.0]})
    items = pd.DataFrame({
        "obj_id": [0, 1],
        # 0: item max touches query's min (i.max == q.min) -> NO match
        "min_x": [50.0, 200.0], "min_y": [120.0, 120.0],
        "max_x": [100.0, 250.0], "max_y": [150.0, 150.0],
        # 1: item min touches query's max (i.min == q.max) -> match
    })
    out = joins.linear_scan(
        spark.createDataFrame(items), spark.createDataFrame(q), convention="rect"
    ).select("obj_id").toPandas()
    assert out.obj_id.tolist() == [1]
