"""E1 parity: the reference's main demo loop (SURVEY §3) end to end —
100k-style world, a player walking through it, per frame: 3x3 ring of
coarse cells loaded (WorldPartition::update, hpp:194-213) and a
50x10x50 viewport search over the loaded cells (Partition::draw,
hpp:100-141). Engine results must equal the NumPy oracle per frame.

The reference searches only LOADED cells, so the result is
ring-filtered: an object is drawn iff (a) its coarse cell is within
Chebyshev distance 1 of the player's cell and (b) its box overlaps the
viewport (closed 3D overlap). We replicate exactly that composition:
coarse_grid -> ring semi-join -> overlap predicate.
"""

import numpy as np
from pyspark.sql import functions as F

from optimizing_spark.config import COARSE_CELL, DEMO_WORLD
from optimizing_spark.functions import geometry as G
from optimizing_spark.operators import tiling
from optimizing_spark.sources import datagen

N = 8000
FRAMES = [(120.0, 25.0, 90.0), (260.0, 25.0, 200.0), (400.0, 10.0, 300.0),
          (401.0, 10.0, 301.0), (790.0, 45.0, 590.0)]
VIEW = (50.0, 10.0, 50.0)  # WorldPartition.hpp:105-106


def test_frame_loop_matches_oracle(spark):
    objs = tiling.with_box_cols(
        datagen.spark_table(spark, "spatial_objects", N, partitions=8), dims=3)
    objs = tiling.coarse_grid(objs, COARSE_CELL).localCheckpoint()

    pdf = datagen.spatial_objects_pandas(N)
    o_min = pdf[["x", "y", "z"]].to_numpy()
    o_max = o_min + pdf[["size_x", "size_y", "size_z"]].to_numpy()
    ocell_x = np.trunc(o_min[:, 0] / COARSE_CELL)
    ocell_z = np.trunc(o_min[:, 2] / COARSE_CELL)

    for px, py, pz in FRAMES:
        pcx, pcz = np.trunc(px / COARSE_CELL), np.trunc(pz / COARSE_CELL)
        vmin = np.array([px - VIEW[0] / 2, py - VIEW[1] / 2, pz - VIEW[2] / 2])
        vmax = np.array([px + VIEW[0] / 2, py + VIEW[1] / 2, pz + VIEW[2] / 2])
        in_ring = (np.abs(ocell_x - pcx) <= 1) & (np.abs(ocell_z - pcz) <= 1)
        overlap = np.ones(N, dtype=bool)
        for ax in range(3):
            overlap &= (vmin[ax] <= o_max[:, ax]) & (vmax[ax] >= o_min[:, ax])
        want = set(np.nonzero(in_ring & overlap)[0].tolist())

        # engine: ring filter on the coarse cell + closed 3D overlap
        view = G.BoxCols(F.lit(vmin[0]), F.lit(vmin[1]), F.lit(vmax[0]),
                         F.lit(vmax[1]), F.lit(vmin[2]), F.lit(vmax[2]))
        obox = G.BoxCols.prefixed("", dims=3)
        got_df = objs.filter(
            (F.abs(F.col("cell_x") - F.lit(float(pcx))) <= 1)
            & (F.abs(F.col("cell_z") - F.lit(float(pcz))) <= 1)
            & G.overlaps(view, obox)
        ).select("obj_id")
        got = {r.obj_id for r in got_df.collect()}
        assert got == want, f"frame at ({px},{py},{pz}): {len(got)} vs {len(want)}"


def test_e2_delete_under_box(spark):
    """E2's Backspace flow (.Test/QuadTree.cpp:410-417): search the box,
    remove every hit, producing a new table version — engine result
    must equal the oracle's surviving set."""
    import pandas as pd
    from optimizing_spark.config import QT_BENCH_WORLD
    from optimizing_spark.operators import joins

    objs = tiling.with_box_cols(
        datagen.spark_table(spark, "quadtree_objects", 3000, partitions=4), dims=2)
    objs = objs.localCheckpoint()
    box = pd.DataFrame({"query_id": [0], "min_x": [20000.0], "min_y": [30000.0],
                        "max_x": [45000.0], "max_y": [60000.0]})
    hits = joins.range_join(objs, spark.createDataFrame(box), QT_BENCH_WORLD, depth=5)
    survivors = tiling.remove_objects(objs, hits.select("obj_id"))

    pdf = datagen.quadtree_objects_pandas(3000)
    q = box.iloc[0]
    i_min_x = pdf.x.to_numpy(); i_min_y = pdf.y.to_numpy()
    i_max_x = i_min_x + pdf.size_x.to_numpy(); i_max_y = i_min_y + pdf.size_y.to_numpy()
    hit_mask = (q.min_x < i_max_x) & (q.max_x >= i_min_x) \
        & (q.min_y < i_max_y) & (q.max_y >= i_min_y)
    want = set(pdf.obj_id[~hit_mask].tolist())
    got = {r.obj_id for r in survivors.select("obj_id").collect()}
    assert got == want
    assert len(got) < 3000  # the box really deleted something
