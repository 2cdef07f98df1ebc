"""Z-order range pruning: arbitrary-box scans over a Morton-clustered
table that read only the row groups the box can touch.

``morton_ranges`` decomposes an integer query box into a small set of
contiguous full-resolution Morton-code ranges (quadtree descent: a
cell fully inside the box emits its whole code interval; a boundary
cell recurses until ``split_depth``, below which its interval is
emitted as a superset; adjacent intervals are merged). This is the
classic Z-region decomposition (Tropf & Herzog 1981, public
literature) — the distributed analog of the reference's
contains-fast-path subtree prune (DynamicOctree.hpp:161-170), executed
at PLAN time on scalars, never over data.

``read_morton_box`` turns the ranges into OR-of-BETWEEN pushdown
filters on the Morton sort key plus the exact bbox residual on (ix,
iy). On a table written Morton-sorted (plans/layout.write_clustered
with the full-resolution key), parquet min/max stats skip every row
group outside the ranges — at 100 TB a viewport box reads
O(perimeter) row groups instead of the table. The ranges are a strict
superset of the box cells, so the residual keeps the result exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from optimizing_spark.functions import cells as C


def _interleave2(x: int, y: int, bits: int) -> int:
    # x takes the even bits, y the odd — cells.morton2d's convention
    m = 0
    for b in range(bits):
        m |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
    return m


def morton_ranges(
    x0: int,
    y0: int,
    x1: int,
    y1: int,
    world_bits: int = 16,
    split_depth: int = 8,
) -> list[tuple[int, int]]:
    """Merged [lo, hi] full-resolution Morton ranges covering the
    closed integer box [x0,x1] x [y0,y1]. Superset guarantee: every
    (x, y) in the box has morton2d(x, y) inside some range."""
    out: list[tuple[int, int]] = []

    def descend(cx: int, cy: int, d: int) -> None:
        # cell = [cx, cx+e) x [cy, cy+e) at depth d, edge e
        e = 1 << (world_bits - d)
        if cx > x1 or cy > y1 or cx + e - 1 < x0 or cy + e - 1 < y0:
            return
        lo = _interleave2(cx, cy, world_bits)
        if (x0 <= cx and cx + e - 1 <= x1 and y0 <= cy and cy + e - 1 <= y1) \
                or d >= split_depth:
            out.append((lo, lo + e * e - 1))
            return
        h = e >> 1
        # child digit = 2*by + bx: this visit order keeps emitted
        # ranges sorted by code, so a single merge pass suffices
        descend(cx, cy, d + 1)
        descend(cx + h, cy, d + 1)
        descend(cx, cy + h, d + 1)
        descend(cx + h, cy + h, d + 1)

    descend(0, 0, 0)
    merged: list[tuple[int, int]] = []
    for lo, hi in out:
        if merged and lo <= merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
        else:
            merged.append((lo, hi))
    return merged


def box_scan_filter(
    x0: int, y0: int, x1: int, y1: int,
    morton_col: str = "m",
    world_bits: int = 16,
    split_depth: int = 8,
):
    """Pushdown filter Column: OR-of-BETWEEN on the Morton key (prunes
    row groups) AND the exact bbox residual on ix/iy."""
    ranges = morton_ranges(x0, y0, x1, y1, world_bits, split_depth)
    m = F.col(morton_col)
    cover = None
    for lo, hi in ranges:
        r = m.between(F.lit(lo), F.lit(hi))
        cover = r if cover is None else (cover | r)
    exact = (
        (F.col("ix") >= x0) & (F.col("ix") <= x1)
        & (F.col("iy") >= y0) & (F.col("iy") <= y1)
    )
    return (cover & exact) if cover is not None else F.lit(False)


def with_morton_key(df: DataFrame, morton_col: str = "m") -> DataFrame:
    """Full-resolution sort key for write_clustered(order_col='m')."""
    return df.withColumn(morton_col, C.morton2d(F.col("ix"), F.col("iy")))


def prefix_values(
    ranges: list[tuple[int, int]], world_bits: int, prefix_depth: int
) -> list[int]:
    """Distinct depth-``prefix_depth`` Morton prefixes intersecting the
    ranges — the partition-directory pruning set (<= 4^prefix_depth)."""
    sh = 2 * (world_bits - prefix_depth)
    vals: set[int] = set()
    for lo, hi in ranges:
        vals.update(range(lo >> sh, (hi >> sh) + 1))
    return sorted(vals)


def read_morton_box(
    spark: SparkSession,
    path: str,
    x0: int, y0: int, x1: int, y1: int,
    morton_col: str = "m",
    world_bits: int = 16,
    split_depth: int = 8,
    prefix_col: str | None = None,
    prefix_depth: int = 2,
) -> DataFrame:
    """Exact bbox read over a Morton-clustered table. With
    ``prefix_col`` (the write_clustered partition column = m >>
    2*(world_bits - prefix_depth)), the ranges also become an IN-list
    of partition directories, so whole directories prune before any
    file is opened; the BETWEENs then skip row groups inside the
    survivors via min/max stats."""
    df = spark.read.parquet(path)
    if prefix_col is not None:
        ranges = morton_ranges(x0, y0, x1, y1, world_bits, split_depth)
        pv = prefix_values(ranges, world_bits, prefix_depth)
        df = df.filter(F.col(prefix_col).isin(pv))
    return df.filter(
        box_scan_filter(x0, y0, x1, y1, morton_col, world_bits, split_depth))
