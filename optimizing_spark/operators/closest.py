"""Closest-pair queries — the near-field complement of hull.diameter.

The spatial-join family's last member: range (joins.range_join), kNN
(joins.knn_join), distance band (joins.distance_join), farthest pair
(hull.diameter) — and here the exact nearest pair, motivated by the
reference's neighbor-ring searches (WorldPartition.hpp:194-213,
DynamicOctree.hpp:146-171).

Scale design:
- GLOBAL: iterative band doubling over joins.distance_join. A band
  query at distance d returns ALL pairs within d exactly, so if the
  band is non-empty its minimum IS the global minimum; if empty, the
  true minimum exceeds d and the band doubles. The starting band is
  the uniform-density pitch sqrt(area / n) (expected ~pi candidates
  per ball), so the loop certifies in 1-2 rounds on spread data, and
  every round is the distance_join plan: ONE (cell_x, cell_y)
  equi-shuffle with a fixed 9-cell fan-out — never an all-pairs
  product. 100 TB shape at any skew the band survives.
- GROUPED: applyInPandas per key with an x-sweep (sorted by x,
  backtrack while dx^2 < best) — exact for any input, near-linear on
  spread data, O(n^2) only on degenerate same-x columns (the global
  path is the scale answer there).

Integer-exact throughout: squared distances of coords < 2^31 fit
int64; duplicates yield min_d2 = 0 (a pair of identical points is a
closest pair).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import Box2
from .joins import distance_join


def closest_pair_global(
    points: DataFrame,
    world: Box2,
    id_col: str = "point_id",
    d0: int | None = None,
    max_rounds: int = 40,
) -> DataFrame:
    """Exact global closest pair: returns a 1-row DataFrame
    (id_a, id_b, min_d2) — the lexicographically-first argmin pair.
    Empty result iff the input has < 2 rows. ``d0`` overrides the
    density-derived starting band (tests use a tiny d0 to force the
    doubling loop). Runs one distance_join job per round; each round's
    plan is the certified band shape, so the driver loop is O(log)
    rounds of bounded Spark jobs, not a driver-side scan."""
    n = points.count()
    if n < 2:
        return points.sparkSession.createDataFrame(
            [], "id_a long, id_b long, min_d2 long")
    if d0 is None:
        area = (world.max_x - world.min_x) * (world.max_y - world.min_y)
        d0 = max(1, int(math.sqrt(area / n)))
    d = int(d0)
    diag2 = (world.max_x - world.min_x) ** 2 \
        + (world.max_y - world.min_y) ** 2
    for _ in range(max_rounds):
        band = distance_join(points, d=d, world=world, id_col=id_col)
        hit = (band.orderBy("dist2", "id_a", "id_b").limit(1)
               .select("id_a", "id_b", F.col("dist2").alias("min_d2")))
        got = hit.collect()
        if got:
            return points.sparkSession.createDataFrame(got, hit.schema)
        if d * d > diag2:  # no pair within the world diagonal: n<2 dups
            break
        d *= 2
    raise RuntimeError(
        f"closest_pair_global failed to certify within {max_rounds} "
        f"doublings (last band {d})")


def _closest_d2_sweep(x: np.ndarray, y: np.ndarray) -> int | None:
    """Exact x-sweep closest pair over raw rows (duplicates count)."""
    n = len(x)
    if n < 2:
        return None
    order = np.lexsort((y, x))
    xs, ys = x[order], y[order]
    best: int | None = None
    for i in range(1, n):
        xi, yi = int(xs[i]), int(ys[i])
        for j in range(i - 1, -1, -1):
            dx = xi - int(xs[j])
            if best is not None and dx * dx >= best:
                break
            dy = yi - int(ys[j])
            d2 = dx * dx + dy * dy
            if best is None or d2 < best:
                best = d2
                if best == 0:
                    return 0
    return best


CLOSEST_SCHEMA = T.StructType([
    T.StructField("grp", T.LongType()),
    T.StructField("n_pts", T.LongType()),
    T.StructField("min_d2", T.LongType()),
])


def closest_pair_grouped(points: DataFrame, group_col: str) -> DataFrame:
    """Per-group closest pair (grp, n_pts, min_d2); min_d2 is NULL for
    single-row groups. One hash shuffle on the key."""
    g = points.select(F.col(group_col).cast("long").alias("grp"),
                      F.col("x").cast("long"), F.col("y").cast("long"))

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        best = _closest_d2_sweep(pdf.x.to_numpy(np.int64),
                                 pdf.y.to_numpy(np.int64))
        return pd.DataFrame({
            "grp": pd.array([int(pdf.grp.iloc[0])], dtype="Int64"),
            "n_pts": pd.array([len(pdf)], dtype="Int64"),
            "min_d2": pd.array([best], dtype="Int64"),
        })

    return g.groupBy("grp").applyInPandas(per_group, CLOSEST_SCHEMA)
