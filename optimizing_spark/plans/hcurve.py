"""Hilbert-range pruning: arbitrary-box scans over a Hilbert-clustered
table that read only the row groups the box can touch — the
locality-optimal twin of plans/zorder (same quadtree-descent range
decomposition, Tropf & Herzog 1981, but on the Hilbert key from
cells.with_hilbert2d instead of the Morton key).

Why a second curve: consecutive Hilbert codes are ALWAYS grid-adjacent
(Morton jumps a row/column boundary every other step), so the same box
decomposes into FEWER merged code ranges (Moon et al., TKDE 2001) —
fewer OR-of-BETWEEN disjuncts pushed to parquet, fewer contiguous runs
of row groups read. bench --hilbert measured ~3x fewer runs per
viewport at sf-scale; test_hcurve re-certifies the range-count win on
a box ensemble.

The decomposition leans on the block property of the curve: every
depth-d ALIGNED quadtree cell occupies one contiguous Hilbert interval
of exactly e^2 codes, aligned to a multiple of e^2 (points in the cell
share the top 2d code bits — the per-level digit 3*rx^ry is a function
of the ancestor quadrants only). So a cell's interval base is the code
of ANY of its points with the low 2*(world_bits-d) bits cleared; no
entry/exit-corner bookkeeping needed. Distributed analog of the
reference's contains-fast-path subtree prune (DynamicOctree.hpp:161-170)
executed at PLAN time on scalars, never over data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from optimizing_spark.functions import cells as C


def hilbert_index(x: int, y: int, bits: int) -> int:
    """Scalar xy2d, the same canonical per-bit descend-and-rotate as
    cells.with_hilbert2d (flip uses the FULL-grid constant n-1), so
    plan-time range endpoints agree bit-for-bit with the column."""
    n = 1 << bits
    d = 0
    for k in range(bits - 1, -1, -1):
        rx = (x >> k) & 1
        ry = (y >> k) & 1
        d += (1 << (2 * k)) * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
    return d


def hilbert_ranges(
    x0: int,
    y0: int,
    x1: int,
    y1: int,
    world_bits: int = 16,
    split_depth: int = 8,
) -> list[tuple[int, int]]:
    """Merged [lo, hi] full-resolution Hilbert ranges covering the
    closed integer box [x0,x1] x [y0,y1]. Superset guarantee: every
    (x, y) in the box has hilbert_index(x, y) inside some range.
    Same descent/cutoff policy as zorder.morton_ranges; the emitted
    blocks are geometric-order, not code-order (the curve reorders
    quadrants per level), so sort before the merge pass."""
    out: list[tuple[int, int]] = []

    def descend(cx: int, cy: int, d: int) -> None:
        # cell = [cx, cx+e) x [cy, cy+e) at depth d, edge e
        e = 1 << (world_bits - d)
        if cx > x1 or cy > y1 or cx + e - 1 < x0 or cy + e - 1 < y0:
            return
        if (x0 <= cx and cx + e - 1 <= x1 and y0 <= cy and cy + e - 1 <= y1) \
                or d >= split_depth:
            blk = e * e
            lo = (hilbert_index(cx, cy, world_bits) // blk) * blk
            out.append((lo, lo + blk - 1))
            return
        h = e >> 1
        descend(cx, cy, d + 1)
        descend(cx + h, cy, d + 1)
        descend(cx, cy + h, d + 1)
        descend(cx + h, cy + h, d + 1)

    descend(0, 0, 0)
    out.sort()
    merged: list[tuple[int, int]] = []
    for lo, hi in out:
        if merged and lo <= merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
        else:
            merged.append((lo, hi))
    return merged


def box_scan_filter(
    x0: int, y0: int, x1: int, y1: int,
    hilbert_col: str = "h",
    world_bits: int = 16,
    split_depth: int = 8,
):
    """Pushdown filter Column: OR-of-BETWEEN on the Hilbert key (prunes
    row groups) AND the exact bbox residual on ix/iy."""
    ranges = hilbert_ranges(x0, y0, x1, y1, world_bits, split_depth)
    h = F.col(hilbert_col)
    cover = None
    for lo, hi in ranges:
        r = h.between(F.lit(lo), F.lit(hi))
        cover = r if cover is None else (cover | r)
    exact = (
        (F.col("ix") >= x0) & (F.col("ix") <= x1)
        & (F.col("iy") >= y0) & (F.col("iy") <= y1)
    )
    return (cover & exact) if cover is not None else F.lit(False)


def with_hilbert_key(
    df: DataFrame, hilbert_col: str = "h", world_bits: int = 16
) -> DataFrame:
    """Full-resolution sort key for write_clustered(order_col='h')."""
    return C.with_hilbert2d(df, out=hilbert_col, bits=world_bits)


def prefix_values(
    ranges: list[tuple[int, int]], world_bits: int, prefix_depth: int
) -> list[int]:
    """Distinct depth-``prefix_depth`` Hilbert prefixes intersecting
    the ranges — the partition-directory pruning set (<=
    4^prefix_depth). Valid for the same block-alignment reason as the
    ranges themselves: a depth-p aligned cell IS the code block
    [v << sh, (v+1) << sh)."""
    sh = 2 * (world_bits - prefix_depth)
    vals: set[int] = set()
    for lo, hi in ranges:
        vals.update(range(lo >> sh, (hi >> sh) + 1))
    return sorted(vals)


def read_hilbert_box(
    spark: SparkSession,
    path: str,
    x0: int, y0: int, x1: int, y1: int,
    hilbert_col: str = "h",
    world_bits: int = 16,
    split_depth: int = 8,
    prefix_col: str | None = None,
    prefix_depth: int = 2,
) -> DataFrame:
    """Exact bbox read over a Hilbert-clustered table. With
    ``prefix_col`` (the write_clustered partition column = h >>
    2*(world_bits - prefix_depth)), the ranges also become an IN-list
    of partition directories, so whole directories prune before any
    file is opened; the BETWEENs then skip row groups inside the
    survivors via min/max stats."""
    df = spark.read.parquet(path)
    if prefix_col is not None:
        ranges = hilbert_ranges(x0, y0, x1, y1, world_bits, split_depth)
        pv = prefix_values(ranges, world_bits, prefix_depth)
        df = df.filter(F.col(prefix_col).isin(pv))
    return df.filter(
        box_scan_filter(x0, y0, x1, y1, hilbert_col, world_bits,
                        split_depth))
