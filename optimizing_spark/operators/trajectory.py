"""Trajectory simplification: Douglas-Peucker (Douglas & Peucker 1973)
per trajectory, with EXACT integer split decisions — the standard
pre-processing step for GPS tracks / roads / contour lines before
tiling or rendering (the raster↔vector family's vector-thinning
counterpart).

Exactness: the classic test "max perpendicular distance > eps" is
evaluated division- and sqrt-free. For chord A→B and interior point P,

    dist²(P, AB) = cross² / len²,  cross = (B−A) × (P−A)

so the argmax over an interval is argmax |cross| (len is constant per
chord) and the split test is the integer comparison

    cross² > eps² · len²        (degenerate A == B: |P−A|² > eps²)

computed in arbitrary-precision Python ints inside the per-group
kernel (cross can reach 2·2^32 for 16-bit worlds, so its square
overflows int64 — NumPy computes the int64-safe parts, Python ints do
the one squaring per interval). Ties at the argmax break to the LOWEST
sequence index; the DuckDB twin (a recursive CTE that splits every
live interval per iteration — level-synchronous divide-and-conquer)
implements the identical rule in HUGEINT, so kept-point sets match
exactly.

DP's guarantee (and the pytest property): every ORIGINAL point lies
within eps of the simplified polyline; endpoints always survive;
eps = 0 keeps every point that is not exactly collinear-between its
chord.

Scale shape: ONE hash shuffle on the trajectory key into
applyInPandas; each group costs O(n·depth) with NumPy doing the
per-interval cross scan. Trajectories are bounded (a GPS track, a road
segment) — the 100 TB axis is the NUMBER of trajectories, which is
exactly what the single group-key shuffle distributes.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Coordinate span (max-min per axis) below which the per-interval cross
# scan is int64-safe: |cross| <= 2*span² and the degenerate-chord point
# distance <= 2*span², both < 2^63 for span <= 2^30.
_NP_SAFE_SPAN = 1 << 30


def _dp_keep_mask(xs, ys, eps: int):
    """Boolean keep-mask for one trajectory (sequence-ordered ints).
    Exact integer decisions throughout: the per-interval |cross| /
    point-distance² argmax runs vectorized in NumPy int64 (first-max =
    lowest-index tie-break, same as the scalar loop), and the one
    squaring per interval that can exceed int64 — cross² vs
    eps²·len² — is done in Python ints. Trajectories whose coordinate
    span exceeds 2^30 fall back to the all-Python-int scalar path."""
    n = len(xs)
    if n <= 2:
        return np.ones(n, dtype=bool)
    xa = np.asarray(xs, dtype=np.int64)
    ya = np.asarray(ys, dtype=np.int64)
    if (
        int(xa.max()) - int(xa.min()) > _NP_SAFE_SPAN
        or int(ya.max()) - int(ya.min()) > _NP_SAFE_SPAN
    ):
        return np.asarray(
            _dp_keep_mask_scalar([int(v) for v in xs],
                                 [int(v) for v in ys], eps),
            dtype=bool,
        )
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    e2 = eps * eps
    stack = [(0, n - 1)]
    while stack:
        lo, hi = stack.pop()
        if hi - lo < 2:
            continue
        ax, ay = int(xa[lo]), int(ya[lo])
        dx, dy = int(xa[hi]) - ax, int(ya[hi]) - ay
        sx = xa[lo + 1:hi]
        sy = ya[lo + 1:hi]
        if dx == 0 and dy == 0:
            c = (sx - ax) ** 2 + (sy - ay) ** 2
            i = int(np.argmax(c))
            beyond = int(c[i]) > e2
        else:
            c = np.abs(dx * (sy - ay) - dy * (sx - ax))
            i = int(np.argmax(c))
            best_c = int(c[i])
            beyond = best_c * best_c > e2 * (dx * dx + dy * dy)
        if beyond:
            best = lo + 1 + i
            keep[best] = True
            stack.append((lo, best))
            stack.append((best, hi))
    return keep


def _dp_keep_mask_scalar(xs, ys, eps: int):
    """Arbitrary-precision fallback: the same algorithm with Python-int
    scalars end to end (no magnitude limit)."""
    n = len(xs)
    keep = [False] * n
    keep[0] = keep[-1] = True
    e2 = eps * eps
    stack = [(0, n - 1)]
    while stack:
        lo, hi = stack.pop()
        if hi - lo < 2:
            continue
        ax, ay, bx, by = xs[lo], ys[lo], xs[hi], ys[hi]
        dx, dy = bx - ax, by - ay
        best, best_c = -1, -1
        if dx == 0 and dy == 0:
            for i in range(lo + 1, hi):
                c = (xs[i] - ax) ** 2 + (ys[i] - ay) ** 2
                if c > best_c:
                    best_c, best = c, i
            beyond = best_c > e2
        else:
            for i in range(lo + 1, hi):
                c = abs(dx * (ys[i] - ay) - dy * (xs[i] - ax))
                if c > best_c:
                    best_c, best = c, i
            beyond = best_c * best_c > e2 * (dx * dx + dy * dy)
        if beyond:
            keep[best] = True
            stack.append((lo, best))
            stack.append((best, hi))
    return keep


def simplify_trajectories(
    df: DataFrame,
    eps: int,
    group: str = "traj_id",
    seq: str = "seq",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Douglas-Peucker per trajectory: returns the kept subset of rows
    (same columns), one applyInPandas pass after a single hash shuffle
    on ``group``."""
    import pandas as pd

    schema = df.select(group, seq, x, y).schema

    def _one(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(seq).reset_index(drop=True)
        xs = pdf[x].to_numpy(dtype=np.int64)
        ys = pdf[y].to_numpy(dtype=np.int64)
        return pdf[_dp_keep_mask(xs, ys, eps)]

    return (
        df.select(group, seq, x, y)
        .groupBy(group)
        .applyInPandas(_one, schema)
    )


def simplify_sql(
    pts_sql: str,
    eps: int,
    group: str = "traj_id",
    seq: str = "seq",
    x: str = "x",
    y: str = "y",
) -> str:
    """DuckDB twin: level-synchronous Douglas-Peucker as a recursive
    CTE. Each iteration joins every live interval back to its interior
    points, takes the lowest-seq argmax of |cross| (point distance for
    degenerate chords), and splits when the exact integer test says
    the point is beyond eps. Kept points = all interval endpoints ever
    produced. HUGEINT arithmetic keeps cross² exact."""
    return f"""
        WITH RECURSIVE pts AS (
            SELECT CAST({group} AS BIGINT) AS g, CAST({seq} AS BIGINT) AS s,
                   CAST({x} AS BIGINT) AS x, CAST({y} AS BIGINT) AS y
            FROM ({pts_sql}) base
        ),
        segs(g, lo, hi) AS (
            SELECT g, min(s), max(s) FROM pts GROUP BY g
            UNION ALL
            SELECT w.g,
                   CASE WHEN e.side = 0 THEN w.lo ELSE w.best END,
                   CASE WHEN e.side = 0 THEN w.best ELSE w.hi END
            FROM (
                SELECT c.g, c.lo, c.hi, c.s AS best
                FROM (
                    SELECT sg.g, sg.lo, sg.hi, p.s,
                           row_number() OVER (
                               PARTITION BY sg.g, sg.lo, sg.hi
                               ORDER BY
                                   CASE WHEN a.x = b.x AND a.y = b.y
                                        THEN (p.x - a.x) * (p.x - a.x)
                                             + (p.y - a.y) * (p.y - a.y)
                                        ELSE abs((b.x - a.x) * (p.y - a.y)
                                                 - (b.y - a.y)
                                                   * (p.x - a.x))
                                   END DESC, p.s ASC) AS rn,
                           CASE WHEN a.x = b.x AND a.y = b.y
                                THEN CAST((p.x - a.x) * (p.x - a.x)
                                          + (p.y - a.y) * (p.y - a.y)
                                          AS HUGEINT)
                                     > CAST({eps * eps} AS HUGEINT)
                                ELSE CAST((b.x - a.x) * (p.y - a.y)
                                          - (b.y - a.y) * (p.x - a.x)
                                          AS HUGEINT)
                                     * CAST((b.x - a.x) * (p.y - a.y)
                                            - (b.y - a.y) * (p.x - a.x)
                                            AS HUGEINT)
                                     > CAST({eps * eps} AS HUGEINT)
                                       * CAST((b.x - a.x) * (b.x - a.x)
                                              + (b.y - a.y) * (b.y - a.y)
                                              AS HUGEINT)
                           END AS beyond
                    FROM segs sg
                    JOIN pts a ON a.g = sg.g AND a.s = sg.lo
                    JOIN pts b ON b.g = sg.g AND b.s = sg.hi
                    JOIN pts p ON p.g = sg.g AND p.s > sg.lo
                               AND p.s < sg.hi
                ) c
                WHERE c.rn = 1 AND c.beyond
            ) w
            CROSS JOIN (SELECT * FROM (VALUES (0), (1)) v(side)) e
        ),
        kept AS (
            SELECT DISTINCT g, s FROM (
                SELECT g, lo AS s FROM segs
                UNION ALL
                SELECT g, hi AS s FROM segs
            ) u
        )
        SELECT p.g AS {group}, p.s AS {seq}, p.x AS {x}, p.y AS {y}
        FROM kept k JOIN pts p ON p.g = k.g AND p.s = k.s
    """


def label_trips(
    df: DataFrame,
    gap: int,
    group: str = "traj_id",
    seq: str = "seq",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Per-POINT trip labeling: (group, seq, x, y) plus a ``trip``
    column — the running sum of exact-integer break flags
    ((x−x_prev)² + (y−y_prev)² > gap², NULL lag → 0, so a trajectory's
    first point opens trip 0). Both window passes (lag + running sum)
    share ONE hash shuffle on ``group``. The labeled points are the
    building block for segment_trips summaries and any custom per-trip
    aggregate (OD matrices, per-trip joins); ``seq`` must be unique
    per trajectory."""
    w = Window.partitionBy(group).orderBy(seq)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dx = F.col(x) - F.lag(x).over(w)
    dy = F.col(y) - F.lag(y).over(w)
    brk = F.when(dx * dx + dy * dy > F.lit(gap) * F.lit(gap),
                 F.lit(1)).otherwise(F.lit(0))  # NULL lag -> 0
    return (
        df.select(group, seq, x, y)
        .withColumn("_brk", brk)
        .withColumn("trip", F.sum("_brk").over(run).cast("long"))
        .drop("_brk")
    )


def segment_trips(
    df: DataFrame,
    gap: int,
    group: str = "traj_id",
    seq: str = "seq",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Trip segmentation: split each trajectory into trips wherever the
    squared step distance to the PREVIOUS point exceeds gap² (GPS
    signal loss / teleport — the standard track-cleaning step before
    simplification or map rendering; Zheng 2015 survey's gap-based
    segmentation). A trajectory's first point always opens trip 0.

    Exactness: the break test (x−x_prev)² + (y−y_prev)² > gap² is pure
    BIGINT arithmetic; trip ids are a running sum of 0/1 break flags;
    every per-trip summary column is an integer min/max/count or the
    exact net-displacement² between the trip's first and last point
    (min_by/max_by on the unique seq). No floating point anywhere, so
    the DuckDB twin is bit-for-bit.

    Scale shape: ONE hash shuffle on the trajectory key drives both
    window passes (lag + running sum share the same WindowExec); the
    per-trip groupBy partial-aggregates to a few rows per trip before
    its exchange. The 100 TB axis is trajectory count, same as
    simplify_trajectories. ``seq`` must be unique per trajectory.

    Returns one row per (group, trip): n_points, seq_lo, seq_hi,
    min_x, max_x, min_y, max_y, net_disp2.
    """
    pts = label_trips(df, gap, group, seq, x, y)
    ex, sx = F.max_by(x, seq), F.min_by(x, seq)
    ey, sy = F.max_by(y, seq), F.min_by(y, seq)
    return pts.groupBy(group, "trip").agg(
        F.count("*").alias("n_points"),
        F.min(seq).alias("seq_lo"),
        F.max(seq).alias("seq_hi"),
        F.min(x).alias("min_x"),
        F.max(x).alias("max_x"),
        F.min(y).alias("min_y"),
        F.max(y).alias("max_y"),
        ((ex - sx) * (ex - sx) + (ey - sy) * (ey - sy))
        .alias("net_disp2"),
    )


def segment_trips_sql(
    pts_sql: str,
    gap: int,
    group: str = "traj_id",
    seq: str = "seq",
    x: str = "x",
    y: str = "y",
) -> str:
    """DuckDB twin of segment_trips: identical lag + running-sum
    windows and integer aggregates (max_by/min_by on the unique seq)."""
    return f"""
        WITH pts AS (
            SELECT CAST({group} AS BIGINT) AS g, CAST({seq} AS BIGINT) AS s,
                   CAST({x} AS BIGINT) AS x, CAST({y} AS BIGINT) AS y
            FROM ({pts_sql}) base
        ),
        flagged AS (
            SELECT g, s, x, y,
                   CASE WHEN lag(x) OVER w IS NULL THEN 0
                        WHEN (x - lag(x) OVER w) * (x - lag(x) OVER w)
                             + (y - lag(y) OVER w) * (y - lag(y) OVER w)
                             > {gap * gap} THEN 1
                        ELSE 0 END AS brk
            FROM pts
            WINDOW w AS (PARTITION BY g ORDER BY s)
        ),
        tripped AS (
            SELECT g, s, x, y,
                   CAST(sum(brk) OVER (PARTITION BY g ORDER BY s
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS trip
            FROM flagged
        )
        SELECT g AS {group}, trip,
               CAST(count(*) AS BIGINT) AS n_points,
               min(s) AS seq_lo, max(s) AS seq_hi,
               min(x) AS min_x, max(x) AS max_x,
               min(y) AS min_y, max(y) AS max_y,
               (max_by(x, s) - min_by(x, s)) * (max_by(x, s) - min_by(x, s))
               + (max_by(y, s) - min_by(y, s)) * (max_by(y, s) - min_by(y, s))
               AS net_disp2
        FROM tripped
        GROUP BY g, trip
    """


def od_matrix(
    df: DataFrame,
    gap: int,
    cell_shift: int = 11,
    group: str = "traj_id",
    seq: str = "seq",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Origin-destination flow matrix — the classic trip-analytics
    rollup over gap-segmented trips: each trip contributes one flow
    from the grid cell of its FIRST point to the cell of its LAST
    point (cell = coordinate >> cell_shift, the engine's pow-2 grid).
    Pure integer algebra end to end: label_trips' exact break test,
    min_by/max_by on the unique seq for the endpoints, shiftright for
    the cells, count + count_distinct for the flow weights.

    Plan: the label_trips window shuffle, a per-(group, trip) partial
    aggregate (a few rows per trip leave each partition), then one
    hash agg on the 4-part cell key — flows, not points, cross the
    final exchange. Returns (src_cx, src_cy, dst_cx, dst_cy, n_trips,
    n_trajs)."""
    pts = label_trips(df, gap, group, seq, x, y)
    trips = pts.groupBy(group, "trip").agg(
        F.min_by(x, seq).alias("_sx"),
        F.min_by(y, seq).alias("_sy"),
        F.max_by(x, seq).alias("_ex"),
        F.max_by(y, seq).alias("_ey"),
    )
    return trips.groupBy(
        F.shiftright("_sx", cell_shift).alias("src_cx"),
        F.shiftright("_sy", cell_shift).alias("src_cy"),
        F.shiftright("_ex", cell_shift).alias("dst_cx"),
        F.shiftright("_ey", cell_shift).alias("dst_cy"),
    ).agg(
        F.count("*").alias("n_trips"),
        F.count_distinct(group).alias("n_trajs"),
    )


def od_sql(
    pts_sql: str,
    gap: int,
    cell_shift: int = 11,
    group: str = "traj_id",
    seq: str = "seq",
    x: str = "x",
    y: str = "y",
) -> str:
    """DuckDB twin of od_matrix: identical lag + running-sum windows,
    min_by/max_by endpoints, >> cells (coordinates must be
    non-negative so >> matches Spark's shiftright as floor division)."""
    return f"""
        WITH pts AS (
            SELECT CAST({group} AS BIGINT) AS g, CAST({seq} AS BIGINT) AS s,
                   CAST({x} AS BIGINT) AS x, CAST({y} AS BIGINT) AS y
            FROM ({pts_sql}) base
        ),
        flagged AS (
            SELECT g, s, x, y,
                   CASE WHEN lag(x) OVER w IS NULL THEN 0
                        WHEN (x - lag(x) OVER w) * (x - lag(x) OVER w)
                             + (y - lag(y) OVER w) * (y - lag(y) OVER w)
                             > {gap * gap} THEN 1
                        ELSE 0 END AS brk
            FROM pts
            WINDOW w AS (PARTITION BY g ORDER BY s)
        ),
        tripped AS (
            SELECT g, s, x, y,
                   CAST(sum(brk) OVER (PARTITION BY g ORDER BY s
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS trip
            FROM flagged
        ),
        trips AS (
            SELECT g, trip,
                   min_by(x, s) AS sx2, min_by(y, s) AS sy2,
                   max_by(x, s) AS ex2, max_by(y, s) AS ey2
            FROM tripped GROUP BY g, trip
        )
        SELECT sx2 >> {cell_shift} AS src_cx, sy2 >> {cell_shift} AS src_cy,
               ex2 >> {cell_shift} AS dst_cx, ey2 >> {cell_shift} AS dst_cy,
               CAST(count(*) AS BIGINT) AS n_trips,
               CAST(count(DISTINCT g) AS BIGINT) AS n_trajs
        FROM trips
        GROUP BY sx2 >> {cell_shift}, sy2 >> {cell_shift},
                 ex2 >> {cell_shift}, ey2 >> {cell_shift}
    """
