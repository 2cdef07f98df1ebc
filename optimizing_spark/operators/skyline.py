"""Skyline (Pareto frontier) over 2D integer point sets.

The dominance-pruning sibling of the convex hull (operators/hull.py):
where the hull keeps the geometric shell, the skyline keeps the
Pareto-optimal set — point p survives iff no other point is <= in
both coordinates and < in at least one (minimize-both convention;
``maximize=True`` flips both axes by negation, exact for integers).
The reference's recursive prune-and-descend searches
(WorldPartition.hpp:113-150, DynamicOctree.hpp:146-171) motivate the
same two-phase distributed shape:

- GLOBAL skyline: skyline(union) == skyline(union of partial
  skylines) — a dominated point is dominated inside its own partition
  too, so a mapInPandas pass reduces each Arrow batch to its partial
  skyline (an O(n log n) sort + single sweep in NumPy) and only those
  survivors reach the single final reduce. One scan, zero shuffles.
- GROUPED skyline: applyInPandas per key — one hash shuffle, Python
  cost bounded by the group.

Duplicate coordinates collapse (the skyline is a SET of distinct
points); ties on x keep only the smallest y (the larger-y twin is
dominated). All comparisons are int64 — bit-exact vs the DuckDB
NOT-EXISTS-dominator twin at any scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _skyline_arrays(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Indices-free exact 2D minimize-skyline: returns the (n, 2)
    int64 array of surviving distinct points, sorted by x asc."""
    if len(x) == 0:
        return np.empty((0, 2), dtype=np.int64)
    pts = np.unique(np.stack([x, y], axis=1), axis=0)  # sorts (x, y)
    # first row per distinct x == min y at that x (np.unique sorted)
    first = np.ones(len(pts), dtype=bool)
    first[1:] = pts[1:, 0] != pts[:-1, 0]
    cand = pts[first]
    # keep while y strictly decreases (running min over ascending x)
    ymin = np.minimum.accumulate(cand[:, 1])
    keep = np.ones(len(cand), dtype=bool)
    keep[1:] = cand[1:, 1] < ymin[:-1]
    return cand[keep]


SKYLINE_SCHEMA = T.StructType([
    T.StructField("grp", T.LongType()),
    T.StructField("x", T.LongType()),
    T.StructField("y", T.LongType()),
])


def skyline(points: DataFrame, group_col: str | None = None,
            maximize: bool = False) -> DataFrame:
    """Pareto frontier (grp, x, y) of the (x, y) columns.
    group_col=None computes ONE global skyline (grp = 0) with the
    two-phase partial reduce; otherwise one frontier per group.
    maximize=True returns the maximize-both frontier (negation trick,
    exact for integers)."""
    sgn = -1 if maximize else 1
    xcol = (F.col("x") * sgn).cast("long").alias("x")
    ycol = (F.col("y") * sgn).cast("long").alias("y")

    def emit(grp_val, pts):
        return pd.DataFrame({
            "grp": np.full(len(pts), grp_val, dtype=np.int64),
            "x": sgn * pts[:, 0],
            "y": sgn * pts[:, 1],
        })

    if group_col is not None:
        g = points.select(F.col(group_col).cast("long").alias("grp"),
                          xcol, ycol)

        def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
            pts = _skyline_arrays(pdf.x.to_numpy(np.int64),
                                  pdf.y.to_numpy(np.int64))
            return emit(np.int64(pdf.grp.iloc[0]), pts)

        return g.groupBy("grp").applyInPandas(per_group, SKYLINE_SCHEMA)

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            pts = _skyline_arrays(b.x.to_numpy(np.int64),
                                  b.y.to_numpy(np.int64))
            yield pd.DataFrame({"x": pts[:, 0], "y": pts[:, 1]})

    def final(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        got = [b for b in batches if len(b)]
        if not got:
            return
        all_b = pd.concat(got, ignore_index=True)
        pts = _skyline_arrays(all_b.x.to_numpy(np.int64),
                              all_b.y.to_numpy(np.int64))
        yield emit(0, pts)

    small = T.StructType([T.StructField("x", T.LongType()),
                          T.StructField("y", T.LongType())])
    partials = points.select(xcol, ycol).mapInPandas(partial, small)
    return partials.coalesce(1).mapInPandas(final, SKYLINE_SCHEMA)
