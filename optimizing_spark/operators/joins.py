"""Spatial joins: the reference's tree traversals as DataFrame joins.

- ``pip_join``: O11/O1 — point-in-box. Broadcast variant for small box
  sets (query geometries are typically tiny vs the object table), and a
  cell-bucketed equi-join variant for large box sets.
- ``range_join``: O10/O2 — box-overlap join. Both sides are exploded to
  the fixed-depth grid cells they cover; the equi-join on the cell key
  is the tree pruning, a residual exact overlap predicate reproduces
  search() semantics, and duplicate pairs are eliminated WITHOUT a
  dedup shuffle via the reporting-cell trick (emit a pair only in the
  unique cell containing the overlap region's min corner).
- ``knn_join``: O17/O22 — cell-local kNN: ring-expansion candidate
  generation (the 3x3 load ring of WorldPartition::update,
  hpp:198-204), a fast path when the k-th-distance disc provably fits
  the searched ring, a bound pass otherwise, and a plan-side starved
  path whose per-query radius comes from a broadcast occupied-cell
  summary (no driver loop, no nested-loop join over the objects).
  Provably exact; checkpoint mode prunes empty branches at runtime.
- ``ring_semi_join``: O17 — objects residing in the Chebyshev-<=k ring
  of each query's cell.
- ``nearest_hit``: O22 — argmin join via min_by (k=1 fast path).
- ``linear_scan``: O29 — the un-pruned control (plain theta-join).

Scale notes: all joins are equi-joins on integer cell keys (shuffle
hash / sort-merge with AQE skew split) except the deliberately-naive
linear_scan and the broadcast pip path (BroadcastNestedLoopJoin is the
right plan when one side is a handful of query geometries).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import Box2
from ..functions import geometry as G
from .tiling import explode_covering_cells


def _grid(world: Box2, depth: int) -> tuple[int, float, float]:
    n = 1 << depth
    return n, (world.max_x - world.min_x) / n, (world.max_y - world.min_y) / n


def _gcoord(v: Column, wmin: float, s: float, n: int) -> Column:
    return F.greatest(F.lit(0), F.least(F.lit(n - 1), F.floor((v - wmin) / s))).cast("int")


def pip_join(
    points: DataFrame,
    boxes: DataFrame,
    dims: int = 3,
    closed: bool = True,
    broadcast_boxes: bool = True,
) -> DataFrame:
    """Point-in-box join (O11). `closed=True` = 3D BoundaryBox convention
    (closed both ends, BoundaryBox.hpp:42-46); False = 2D rect
    convention (min-closed/max-strict, .Test/QuadTree.cpp:36-42)."""
    box = G.BoxCols.prefixed("", dims=dims)
    if closed:
        pred = G.contains_point(box, F.col("x"), F.col("y"), F.col("z") if dims == 3 else None)
    else:
        pred = G.rect_contains_point(box, F.col("x"), F.col("y"))
    rhs = F.broadcast(boxes) if broadcast_boxes else boxes
    return points.join(rhs, pred)


def range_join(
    objects: DataFrame,
    queries: DataFrame,
    world: Box2,
    depth: int = 6,
    convention: str = "rect",
) -> DataFrame:
    """Box-overlap join (O10). Output: one row per (query, object) pair
    whose boxes overlap under the chosen convention:
    - 'rect': asymmetric 2D search() semantics (.Test/QuadTree.cpp:58-69)
    - 'closed': 3D closed overlap on x/y (BoundaryBox.hpp:47-51)

    Both sides explode to covered fixed-depth cells; pairs are emitted
    only in the reporting cell = cell of the overlap region's min
    corner, so no dedup pass is needed. Expected candidates per cell
    stay O(density); the equi-join shuffles on (cell_x, cell_y).
    """
    n, sx, sy = _grid(world, depth)
    o = explode_covering_cells(
        objects.select(
            F.col("obj_id"),
            F.col("min_x").alias("o_min_x"), F.col("min_y").alias("o_min_y"),
            F.col("max_x").alias("o_max_x"), F.col("max_y").alias("o_max_y"),
        ),
        world, depth, "o_min_x", "o_min_y", "o_max_x", "o_max_y",
    )
    q = explode_covering_cells(
        queries.select(
            F.col("query_id"),
            F.col("min_x").alias("q_min_x"), F.col("min_y").alias("q_min_y"),
            F.col("max_x").alias("q_max_x"), F.col("max_y").alias("q_max_y"),
        ),
        world, depth, "q_min_x", "q_min_y", "q_max_x", "q_max_y",
    )
    qbox = G.BoxCols("q_min_x", "q_min_y", "q_max_x", "q_max_y")
    obox = G.BoxCols("o_min_x", "o_min_y", "o_max_x", "o_max_y")
    if convention == "rect":
        pred = G.rect_overlaps(qbox, obox)
    else:
        pred = G.overlaps(qbox, obox)
    joined = q.join(o, ["cell_x", "cell_y"]).filter(pred)
    # reporting-cell dedup: overlap-region min corner must lie in this cell
    rx = F.greatest(F.col("q_min_x"), F.col("o_min_x"))
    ry = F.greatest(F.col("q_min_y"), F.col("o_min_y"))
    report = (
        (_gcoord(rx, world.min_x, sx, n) == F.col("cell_x"))
        & (_gcoord(ry, world.min_y, sy, n) == F.col("cell_y"))
    )
    return joined.filter(report).drop("cell_x", "cell_y")


def linear_scan(objects: DataFrame, queries: DataFrame, convention: str = "rect") -> DataFrame:
    """O29 control: full theta-join, no cell pruning (broadcast the
    queries; .Test/vectorQuadTree.cpp:399-415)."""
    qbox = G.BoxCols("q_min_x", "q_min_y", "q_max_x", "q_max_y")
    obox = G.BoxCols("min_x", "min_y", "max_x", "max_y")
    pred = G.rect_overlaps(qbox, obox) if convention == "rect" else G.overlaps(qbox, obox)
    q = queries.select(
        "query_id",
        F.col("min_x").alias("q_min_x"), F.col("min_y").alias("q_min_y"),
        F.col("max_x").alias("q_max_x"), F.col("max_y").alias("q_max_y"),
    )
    return objects.join(F.broadcast(q), pred)


def polygon_join(
    points: DataFrame,
    polygons: DataFrame,
    method: str = "broadcast",
    world: Box2 | None = None,
    depth: int = 6,
    test: str = "convex",
) -> DataFrame:
    """Point-in-convex-polygon join — the north star's "broadcast
    point-in-polygon join", generalizing pip_join (O1/O11) from AABBs
    to convex vertex rings. points(point_id, x, y) x polygons(
    query_id, vertices: array<struct<x,y>>), boundary-inclusive CCW
    half-plane test (functions/geometry.point_in_convex_polygon).

    method='broadcast' (default, the small-dim case): broadcast the
    polygons; the join condition puts the O(1) AABB reject BEFORE the
    per-edge fold so codegen short-circuits non-candidates cheaply.

    method='cells' (the both-sides-large case): polygons explode to
    the fixed-depth grid cells their bbox covers, points hash to their
    single cell, and candidates meet in an equi-join on (cell_x,
    cell_y) — same shuffle shape as range_join; each point lives in
    exactly one cell so no dedup pass is needed. At 100 TB this is the
    plan: shuffle keyed on uniform integer cells, exact predicate only
    on co-located candidates.

    test='convex' (default) uses the boundary-inclusive CCW half-plane
    fold (geometry.point_in_convex_polygon); test='crossing' uses the
    even-odd crossing-number rule (geometry.point_in_polygon_crossing)
    and handles arbitrary SIMPLE rings — concave stars included — with
    the same integer-exact guarantee and the same bbox prefilter /
    broadcast / cell-join plans.
    """
    bx0, by0, bx1, by1 = G.polygon_bbox(F.col("vertices"))
    polys = polygons.select(
        "query_id", "vertices",
        bx0.alias("_bx0"), by0.alias("_by0"),
        bx1.alias("_bx1"), by1.alias("_by1"),
    )
    in_box = (
        (F.col("x") >= F.col("_bx0")) & (F.col("x") <= F.col("_bx1"))
        & (F.col("y") >= F.col("_by0")) & (F.col("y") <= F.col("_by1"))
    )
    if test == "convex":
        in_poly = G.point_in_convex_polygon(
            F.col("x"), F.col("y"), F.col("vertices"))
    elif test == "crossing":
        in_poly = G.point_in_polygon_crossing(
            F.col("x"), F.col("y"), F.col("vertices"))
    else:
        raise ValueError(f"unknown test {test!r}")
    if method == "broadcast":
        out = points.join(F.broadcast(polys), in_box & in_poly)
    elif method == "cells":
        if world is None:
            raise ValueError("method='cells' needs a world box")
        n, sx, sy = _grid(world, depth)
        pc = explode_covering_cells(
            polys, world, depth, "_bx0", "_by0", "_bx1", "_by1")
        pt = points.withColumn(
            "cell_x", _gcoord(F.col("x"), world.min_x, sx, n)
        ).withColumn("cell_y", _gcoord(F.col("y"), world.min_y, sy, n))
        out = pt.join(pc, ["cell_x", "cell_y"]).filter(in_box & in_poly) \
            .drop("cell_x", "cell_y")
    else:
        raise ValueError(f"unknown method {method!r}")
    return out.drop("_bx0", "_by0", "_bx1", "_by1")


DIST_JOIN_MAX_FANOUT = 81  # (2r+1)^2 at r=4 — the silent-blow-up guard


def _ring_grid(world: Box2, d: int, depth: int | None,
               max_fanout: int = DIST_JOIN_MAX_FANOUT,
               who: str = "distance_join") -> tuple:
    """Shared cell-grid geometry for the distance-band joins (batch
    distance_join and streaming.cells_stream.streaming_distance_join —
    ONE policy so the stream==batch contract can't silently diverge).
    Returns (depth, n, sx, sy, r).

    depth=None auto-picks floor(log2(min_extent / d)) clamped to
    [0, 12] so cell_edge lands in [d, 2d) and r=1. r is then clamped
    to n-1: _gcoord clamps coordinates into [0, n-1], so ring offsets
    with |dx| >= n can never equi-match any real cell — dropping them
    changes nothing and keeps the auto path valid even when d exceeds
    the world extent (depth 0, one cell, r=0: the exact d^2 predicate
    does all the work). The fan-out guard therefore only fires on an
    EXPLICIT deep depth with a large d."""
    if depth is None:
        ext = min(world.max_x - world.min_x, world.max_y - world.min_y)
        depth = max(0, min(12, int(math.floor(
            math.log2(max(ext / max(d, 1), 1.0))))))
    n, sx, sy = _grid(world, depth)
    r = min(int(-(-d // min(sx, sy))), n - 1)  # ceil, clamped to grid
    fanout = (2 * r + 1) ** 2
    if fanout > max_fanout:
        raise ValueError(
            f"{who} ring fan-out (2r+1)^2 = {fanout} exceeds "
            f"max_fanout={max_fanout} (d={d}, cell_edge~{min(sx, sy):.0f} "
            f"at depth={depth}); pass depth=None to auto-size cells to "
            f"~d (r<=1), choose a shallower depth, or raise max_fanout "
            f"explicitly if the blow-up is intended.")
    return depth, n, sx, sy, r


def distance_join(
    points: DataFrame,
    d: int,
    world: Box2,
    depth: int | None = None,
    id_col: str = "point_id",
    max_fanout: int = DIST_JOIN_MAX_FANOUT,
) -> DataFrame:
    """Distance-band self-join: all unordered pairs of points within
    Euclidean distance d (closed), each exactly once (id_a < id_b),
    with the exact integer squared distance. The cell-index shape:
    one side keeps its single cell, the other explodes to the
    Chebyshev-<=r ring (r = ceil(d / cell_edge)) around its cell, so
    candidates meet in ONE (cell_x, cell_y) equi-shuffle and the
    exact d^2 predicate runs only on co-located candidates — the
    100 TB plan (cf. ring_semi_join / WorldPartition.hpp:194-213).
    The id_a < id_b filter dedups the symmetric appearance, so no
    distinct pass is needed.

    depth=None (default) auto-picks floor(log2(min_extent / d))
    clamped to [0, 12]: cell_edge lands in [d, 2d) so the ring radius
    is exactly r=1 and the explode fan-out a fixed 9 cells (r clamps
    to the grid width, so even d > world extent degrades gracefully to
    one cell + exact predicate — see _ring_grid). A caller passing an
    explicit deep depth with a large d explodes quadratically —
    (2r+1)^2 — so the fan-out is guarded like the LSH bucket cap
    (dedup.minhash_lsh_pairs max_bucket_rows): exceeding `max_fanout`
    raises instead of silently shuffling r^2 copies."""
    depth, n, sx, sy, r = _ring_grid(world, d, depth, max_fanout)
    # coords cast to long: the d^2 residual squares coordinate deltas,
    # which overflows 32-bit inputs under ANSI mode (the driver's
    # default session) — the cast keeps the operator exact for any
    # integral coordinate dtype
    a = points.select(
        F.col(id_col).alias("id_a"),
        F.col("x").cast("long").alias("ax"),
        F.col("y").cast("long").alias("ay"),
    ).withColumn("cell_x", _gcoord(F.col("ax"), world.min_x, sx, n)) \
     .withColumn("cell_y", _gcoord(F.col("ay"), world.min_y, sy, n))
    b = (
        points.select(
            F.col(id_col).alias("id_b"),
            F.col("x").cast("long").alias("bx"),
            F.col("y").cast("long").alias("by"),
        )
        .withColumn("_bcx", _gcoord(F.col("bx"), world.min_x, sx, n))
        .withColumn("_bcy", _gcoord(F.col("by"), world.min_y, sy, n))
        .withColumn("_dx", F.explode(F.sequence(F.lit(-r), F.lit(r))))
        .withColumn("_dy", F.explode(F.sequence(F.lit(-r), F.lit(r))))
        .select(
            "id_b", "bx", "by",
            (F.col("_bcx") + F.col("_dx")).alias("cell_x"),
            (F.col("_bcy") + F.col("_dy")).alias("cell_y"),
        )
    )
    dist2 = (
        (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
        + (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by"))
    )
    return (
        a.join(b, ["cell_x", "cell_y"])
        .filter((F.col("id_a") < F.col("id_b")) & (dist2 <= F.lit(d * d)))
        .select("id_a", "id_b", dist2.alias("dist2"))
    )


def st_pair_join(
    events: DataFrame,
    d: int,
    t: int,
    world: Box2,
    depth: int | None = None,
    id_col: str = "event_id",
    max_fanout: int = DIST_JOIN_MAX_FANOUT,
) -> DataFrame:
    """Spatio-temporal distance-band self-join: all unordered pairs of
    events within Euclidean distance d AND time gap t (both closed),
    each exactly once (id_a < id_b), with the exact integer squared
    distance and gap — contact tracing / co-occurrence / conflation,
    the time-extended distance_join and the axes-A+B composition the
    interleaved brief centers on.

    events(id, x, y, tsec) with tsec a NON-NEGATIVE integer clock
    (epoch seconds/micros — `div` truncation equals floor only there).
    The 100 TB shape: one side keeps its single (cell_x, cell_y, tb)
    key, the other explodes to the Chebyshev-<=r spatial ring x the
    {-1,0,1} time-bucket ring (bucket width = t, so a qualifying pair
    differs by <= 1 bucket), candidates meet in ONE 3-column
    equi-shuffle, exact residuals run only on co-located candidates.
    Fan-out is (2r+1)^2 * 3 — auto depth keeps r=1 (27 copies),
    guarded by `max_fanout` like distance_join.

    Streaming twin: streaming/cells_stream.streaming_distance_join is
    the stream-stream form of the same semantics (distance band +
    +-bound_seconds), with the watermark+time bound as the
    state-eviction contract."""
    if t < 1:
        raise ValueError("st_pair_join needs t >= 1")
    depth, n, sx, sy, r = _ring_grid(world, d, depth, max_fanout,
                                     who="st_pair_join")
    # HALF-SPACE explode: of the full (2r+1)^2 x 3 offset cube, the
    # probe side only materializes the zero offset plus the
    # lexicographically-POSITIVE half (first nonzero of (dt, dy, dx)
    # > 0). For an unordered pair the key delta D = key_a - key_b
    # satisfies D = -D(swapped), so exactly one orientation finds a
    # positive offset — each pair meets exactly once with NO id-order
    # filter; only same-key pairs (D = 0, both orientations match)
    # dedup by id<. Halves the shuffled fan-out vs the symmetric ring
    # (14 copies instead of 27 at r=1) at identical output.
    offs = [(0, 0, 0)] + [
        (dt, dy, dx)
        for dt in (-1, 0, 1) for dy in range(-r, r + 1)
        for dx in range(-r, r + 1)
        if (dt, dy, dx) > (0, 0, 0)
    ]
    off_arr = F.array(*[
        F.struct(F.lit(dt).alias("dt"), F.lit(dy).alias("dy"),
                 F.lit(dx).alias("dx"),
                 F.lit(dt == 0 and dy == 0 and dx == 0).alias("zero"))
        for dt, dy, dx in offs
    ])
    a = events.select(
        F.col(id_col).alias("id_a"),
        F.col("x").cast("long").alias("ax"),
        F.col("y").cast("long").alias("ay"),
        F.col("tsec").cast("long").alias("ta"),
    ).withColumn("cell_x", _gcoord(F.col("ax"), world.min_x, sx, n)) \
     .withColumn("cell_y", _gcoord(F.col("ay"), world.min_y, sy, n)) \
     .withColumn("tb", F.expr(f"ta div {int(t)}"))
    b = (
        events.select(
            F.col(id_col).alias("id_b"),
            F.col("x").cast("long").alias("bx"),
            F.col("y").cast("long").alias("by"),
            F.col("tsec").cast("long").alias("tbt"),
        )
        .withColumn("_bcx", _gcoord(F.col("bx"), world.min_x, sx, n))
        .withColumn("_bcy", _gcoord(F.col("by"), world.min_y, sy, n))
        .withColumn("_o", F.explode(off_arr))
        .select(
            "id_b", "bx", "by", "tbt", F.col("_o.zero").alias("_zero"),
            (F.col("_bcx") + F.col("_o.dx")).alias("cell_x"),
            (F.col("_bcy") + F.col("_o.dy")).alias("cell_y"),
            (F.expr(f"tbt div {int(t)}") + F.col("_o.dt")).alias("tb"),
        )
    )
    dist2 = (
        (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
        + (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by"))
    )
    gap = F.abs(F.col("ta") - F.col("tbt"))
    # hash, not sort-merge: keys are near-unique (events are sparse in
    # (cell, bucket) space), so SMJ would SORT the 14x-exploded probe
    # side for no merge benefit; hashing the compact kept side builds
    # a per-partition table of N/partitions rows and streams the probe
    return (
        a.hint("shuffle_hash").join(b, ["cell_x", "cell_y", "tb"])
        .filter((~F.col("_zero") | (F.col("id_a") < F.col("id_b")))
                & (F.col("id_a") != F.col("id_b"))
                & (dist2 <= F.lit(int(d) * int(d)))
                & (gap <= F.lit(int(t))))
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            dist2.alias("dist2"), gap.alias("gap"))
    )


def radius_join(
    points: DataFrame,
    queries: DataFrame,
    d: int,
    world: Box2,
    depth: int | None = None,
    method: str = "broadcast",
    max_fanout: int = DIST_JOIN_MAX_FANOUT,
) -> DataFrame:
    """Two-table distance-band join: every (query, point) pair with
    Euclidean distance <= d (closed), each exactly once, with the
    exact integer squared distance — the asymmetric sibling of
    distance_join and the candidate generator for IDW interpolation
    (operators/interpolate.py) and density queries. Same grid policy
    as distance_join (_ring_grid: depth=None auto-sizes cell_edge to
    [d, 2d) so the ring is r=1 and fan-out 9).

    points must carry integral coordinate columns (x, y) — every other
    point column (values, weights, ids) is preserved in the output.
    queries must carry (qx, qy); its other columns are preserved too,
    so callers group directly on their query key with no re-join.

    method='broadcast' (default): the QUERY side explodes to its
    (2r+1)^2 ring cells and broadcasts — the big point table never
    shuffles; candidates are generated by a hash probe per point (the
    hex-ring-join shape). method='cells': both sides shuffle once on
    (cell_x, cell_y) for the both-sides-large case. Each point lives
    in exactly one cell and each query emits each ring cell once, so
    a pair meets at most once — no dedup pass in either mode."""
    if method not in ("broadcast", "cells"):
        raise ValueError(f"unknown radius_join method {method!r}")
    depth, n, sx, sy, r = _ring_grid(world, d, depth, max_fanout,
                                     who="radius_join")
    p = (
        points
        .withColumn("x", F.col("x").cast("long"))
        .withColumn("y", F.col("y").cast("long"))
        .withColumn("cell_x", _gcoord(F.col("x"), world.min_x, sx, n))
        .withColumn("cell_y", _gcoord(F.col("y"), world.min_y, sy, n))
    )
    q = (
        queries
        .withColumn("qx", F.col("qx").cast("long"))
        .withColumn("qy", F.col("qy").cast("long"))
        .withColumn("_qcx", _gcoord(F.col("qx"), world.min_x, sx, n))
        .withColumn("_qcy", _gcoord(F.col("qy"), world.min_y, sy, n))
        .withColumn("_dx", F.explode(F.sequence(F.lit(-r), F.lit(r))))
        .withColumn("_dy", F.explode(F.sequence(F.lit(-r), F.lit(r))))
        .withColumn("cell_x", F.col("_qcx") + F.col("_dx"))
        .withColumn("cell_y", F.col("_qcy") + F.col("_dy"))
        .drop("_qcx", "_qcy", "_dx", "_dy")
    )
    rhs = F.broadcast(q) if method == "broadcast" else q
    dist2 = (
        (F.col("qx") - F.col("x")) * (F.col("qx") - F.col("x"))
        + (F.col("qy") - F.col("y")) * (F.col("qy") - F.col("y"))
    )
    return (
        p.join(rhs, ["cell_x", "cell_y"])
        .filter(dist2 <= F.lit(d * d))
        .withColumn("dist2", dist2)
        .drop("cell_x", "cell_y")
    )


def polygon_polygon_join(
    polys_a: DataFrame,
    polys_b: DataFrame,
    method: str = "broadcast",
    world: Box2 | None = None,
    depth: int = 6,
) -> DataFrame:
    """Polygon-polygon overlap join — the classic spatial join,
    completing the point/segment/box/polygon family. polys_a(a_id,
    vertices_a) x polys_b(b_id, vertices_b), exact closed semantics
    (geometry.polygons_overlap: any edge pair intersects, or either
    vertex-0 containment), integer arithmetic throughout.

    method='broadcast': broadcast polys_b; the join condition runs the
    O(1) bbox reject before the edge-pair fold. method='cells': both
    sides explode their bboxes to fixed-depth grid cells, candidates
    meet in a (cell_x, cell_y) equi-join with reporting-cell dedup —
    the 100 TB shape, same as range_join/segment_box_join.
    """
    abx0, aby0, abx1, aby1 = G.polygon_bbox(F.col("vertices_a"))
    bbx0, bby0, bbx1, bby1 = G.polygon_bbox(F.col("vertices_b"))
    a = polys_a.select(
        "*",
        abx0.alias("_ax0"), aby0.alias("_ay0"),
        abx1.alias("_ax1"), aby1.alias("_ay1"),
    )
    b = polys_b.select(
        "*",
        bbx0.alias("_bx0"), bby0.alias("_by0"),
        bbx1.alias("_bx1"), bby1.alias("_by1"),
    )
    bbox_hit = (
        (F.col("_ax0") <= F.col("_bx1")) & (F.col("_ax1") >= F.col("_bx0"))
        & (F.col("_ay0") <= F.col("_by1")) & (F.col("_ay1") >= F.col("_by0"))
    )
    overlap = G.polygons_overlap(F.col("vertices_a"), F.col("vertices_b"))
    drop = ["_ax0", "_ay0", "_ax1", "_ay1", "_bx0", "_by0", "_bx1", "_by1"]
    if method == "broadcast":
        return a.join(F.broadcast(b), bbox_hit & overlap).drop(*drop)
    if method != "cells":
        raise ValueError(f"unknown method {method!r}")
    if world is None:
        raise ValueError("method='cells' needs a world box")
    n, sx, sy = _grid(world, depth)
    ac = explode_covering_cells(a, world, depth, "_ax0", "_ay0", "_ax1", "_ay1")
    bc = explode_covering_cells(b, world, depth, "_bx0", "_by0", "_bx1", "_by1")
    rx = F.greatest(F.col("_ax0"), F.col("_bx0"))
    ry = F.greatest(F.col("_ay0"), F.col("_by0"))
    report = (
        (_gcoord(rx, world.min_x, sx, n) == F.col("cell_x"))
        & (_gcoord(ry, world.min_y, sy, n) == F.col("cell_y"))
    )
    # cheap integer gates FIRST, the O(|A|*|B|) edge-pair fold LAST:
    # conjunct order survives Catalyst (no cost-based reordering), so a
    # pair sharing k cells pays k cheap report/bbox tests but exactly
    # ONE overlap fold — in its reporting cell (measured 2.0x on the
    # 20M-polygon bench --poly)
    joined = ac.join(bc, ["cell_x", "cell_y"]) \
        .filter(report & bbox_hit).filter(overlap)
    return joined.drop("cell_x", "cell_y", *drop)


def segment_box_join(
    segments: DataFrame,
    boxes: DataFrame,
    method: str = "broadcast",
    world: Box2 | None = None,
    depth: int = 6,
) -> DataFrame:
    """Segment-vs-box intersection join — 1D geometry (roads,
    trajectories, network edges) against query tiles, completing the
    point/box/polygon/ray family. segments(seg_id, x1, y1, x2, y2) x
    boxes(query_id, q_min_x..q_max_y), exact integer SAT predicate
    (geometry.segment_intersects_box; the batch-join form of the
    reference's per-ray slab walk, Raytracing.hpp:267-289).

    method='broadcast': broadcast the boxes, stream segments through.
    method='cells': both sides explode to fixed-depth grid cells of
    their bboxes and candidates meet in a (cell_x, cell_y) equi-join —
    the 100 TB shape (same as range_join); pairs are emitted only in
    the reporting cell = cell of the bbox-overlap region's min corner,
    so no dedup pass is needed.
    """
    qbox = G.BoxCols("q_min_x", "q_min_y", "q_max_x", "q_max_y")
    pred = G.segment_intersects_box(
        F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2"), qbox)
    if method == "broadcast":
        return segments.join(F.broadcast(boxes), pred)
    if method != "cells":
        raise ValueError(f"unknown method {method!r}")
    if world is None:
        raise ValueError("method='cells' needs a world box")
    n, sx, sy = _grid(world, depth)
    s = explode_covering_cells(
        segments
        .withColumn("_s_min_x", F.least("x1", "x2"))
        .withColumn("_s_min_y", F.least("y1", "y2"))
        .withColumn("_s_max_x", F.greatest("x1", "x2"))
        .withColumn("_s_max_y", F.greatest("y1", "y2")),
        world, depth, "_s_min_x", "_s_min_y", "_s_max_x", "_s_max_y",
    )
    q = explode_covering_cells(
        boxes, world, depth, "q_min_x", "q_min_y", "q_max_x", "q_max_y")
    rx = F.greatest(F.col("_s_min_x"), F.col("q_min_x"))
    ry = F.greatest(F.col("_s_min_y"), F.col("q_min_y"))
    report = (
        (_gcoord(rx, world.min_x, sx, n) == F.col("cell_x"))
        & (_gcoord(ry, world.min_y, sy, n) == F.col("cell_y"))
    )
    # cheap integer reporting-cell gate BEFORE the SAT fold (same
    # conjunct-ordering rationale as polygon_polygon_join)
    joined = s.join(q, ["cell_x", "cell_y"]).filter(report).filter(pred)
    return joined.drop(
        "cell_x", "cell_y", "_s_min_x", "_s_min_y", "_s_max_x", "_s_max_y")


def segment_segment_join(
    left: DataFrame,
    right: DataFrame,
    method: str = "broadcast",
    world: Box2 | None = None,
    depth: int = 6,
) -> DataFrame:
    """Segment-vs-segment CROSSING join — map overlay / road-network
    intersection detection, the 1D×1D member completing the
    point/box/segment/polygon join family (extends the reference's O10
    range search, DynamicOctree.hpp:146-171, to pair-of-polyline-edge
    workloads). left(a_id, ax1, ay1, ax2, ay2) × right(b_id, bx1, by1,
    bx2, by2); the predicate is geometry.segments_intersect — exact
    integer mutual non-strict straddle + bbox overlap, so collinear
    overlaps and endpoint touches count (closed sets).

    method='broadcast': broadcast the right side, stream the left.
    method='cells': both sides explode to fixed-depth grid cells of
    their bboxes and candidates meet in ONE (cell_x, cell_y)
    equi-join; a pair is emitted only in its reporting cell (the cell
    of the bbox-overlap region's min corner), so no distinct pass —
    the 100 TB shape shared with range_join / segment_box_join."""
    pred = G.segments_intersect(
        F.col("ax1"), F.col("ay1"), F.col("ax2"), F.col("ay2"),
        F.col("bx1"), F.col("by1"), F.col("bx2"), F.col("by2"))
    if method == "broadcast":
        return left.join(F.broadcast(right), pred)
    if method != "cells":
        raise ValueError(f"unknown method {method!r}")
    if world is None:
        raise ValueError("method='cells' needs a world box")
    n, sx, sy = _grid(world, depth)
    a = explode_covering_cells(
        left
        .withColumn("_a_min_x", F.least("ax1", "ax2"))
        .withColumn("_a_min_y", F.least("ay1", "ay2"))
        .withColumn("_a_max_x", F.greatest("ax1", "ax2"))
        .withColumn("_a_max_y", F.greatest("ay1", "ay2")),
        world, depth, "_a_min_x", "_a_min_y", "_a_max_x", "_a_max_y",
    )
    b = explode_covering_cells(
        right
        .withColumn("_b_min_x", F.least("bx1", "bx2"))
        .withColumn("_b_min_y", F.least("by1", "by2"))
        .withColumn("_b_max_x", F.greatest("bx1", "bx2"))
        .withColumn("_b_max_y", F.greatest("by1", "by2")),
        world, depth, "_b_min_x", "_b_min_y", "_b_max_x", "_b_max_y",
    )
    rx = F.greatest(F.col("_a_min_x"), F.col("_b_min_x"))
    ry = F.greatest(F.col("_a_min_y"), F.col("_b_min_y"))
    report = (
        (_gcoord(rx, world.min_x, sx, n) == F.col("cell_x"))
        & (_gcoord(ry, world.min_y, sy, n) == F.col("cell_y"))
    )
    # cheap integer reporting-cell gate BEFORE the 4-orientation fold
    # (same conjunct ordering as segment_box_join / polygon joins)
    joined = a.join(b, ["cell_x", "cell_y"]).filter(report).filter(pred)
    return joined.drop(
        "cell_x", "cell_y", "_a_min_x", "_a_min_y", "_a_max_x",
        "_a_max_y", "_b_min_x", "_b_min_y", "_b_max_x", "_b_max_y")


def snap_join(
    points: DataFrame,
    segments: DataFrame,
    max_d: int,
    world: Box2,
    depth: int | None = None,
    method: str = "cells",
) -> DataFrame:
    """Map-matching primitive: snap each point to its NEAREST segment
    within ``max_d`` — the GPS-trace-to-road-network assignment, the
    point-to-1D member of the nearest family (O22's argmin,
    Raytracing.hpp nearest-hit, over O10's range candidates,
    DynamicOctree.hpp:146-171).

    points(point_id, px, py) x segments(seg_id, x1, y1, x2, y2) ->
    (point_id, seg_id, d2): the winning segment per point and its
    squared point-to-segment distance. Points with no segment within
    max_d are absent (inner semantics). Ties and the argmin are
    decided by lexicographic (d2, seg_id), so the result is a
    deterministic function of the input SET.

    Exactness and engine portability: the clamped-projection distance
    is the rational num/den with num = |w|^2*len2 - dot^2, den = len2
    (endpoint branches den = 1), all BIGINT-exact — the max_d gate is
    the EXACT integer comparison num <= max_d^2 * den, and only the
    ORDERING value d2 is the IEEE double num/den, which is
    bit-identical in any IEEE-754 engine (num, den < 2^53 exact, one
    correctly-rounded divide) — the same portability argument as the
    Gi* z-scores. Caller contract: |w|^2 * len2 < 2^63 (coords and
    segment lengths up to ~2^17 are safe).

    method='cells' (the 100 TB shape): segment bboxes dilate by max_d
    and explode to covering cells (auto depth sizes cell_edge to
    ~max_d, so the dilation adds <= 1 ring); each point lands in its
    ONE home cell, so every qualifying (point, segment) pair meets
    exactly once — no dedup pass — in ONE (cell_x, cell_y)
    equi-shuffle, then a hash argmin per point. method='broadcast':
    crossJoin against the broadcast segment side — the linear-scan
    control (O29) and the small-network fast path."""
    if method == "broadcast":
        cand = points.crossJoin(F.broadcast(segments))
    elif method == "cells":
        cand = snap_candidates_raw(points, segments, max_d, world, depth)
    else:
        raise ValueError(f"unknown method {method!r}")
    keep, d2 = snap_exprs(max_d)
    scored = cand.select(
        *[c for c in points.columns], d2.alias("_d2"), "seg_id",
    ).filter(keep)
    return (
        scored.groupBy("point_id")
        .agg(F.min(F.struct(F.col("_d2"), F.col("seg_id"))).alias("_m"))
        .select("point_id", F.col("_m.seg_id").alias("seg_id"),
                F.col("_m._d2").alias("d2"))
    )


def snap_exprs(max_d: int):
    """(keep, d2) column pair of the snap distance algebra over the
    joined (px, py, x1, y1, x2, y2) columns: `keep` is the EXACT
    integer rational max_d gate, `d2` the IEEE-portable ordering
    double — shared by snap_join and streaming.streaming_snap_join so
    stream and batch can't diverge."""
    max_d2 = int(max_d) * int(max_d)
    vx = F.col("x2") - F.col("x1")
    vy = F.col("y2") - F.col("y1")
    wx = F.col("px") - F.col("x1")
    wy = F.col("py") - F.col("y1")
    ux = F.col("px") - F.col("x2")
    uy = F.col("py") - F.col("y2")
    dot = wx * vx + wy * vy
    len2 = vx * vx + vy * vy
    w2 = wx * wx + wy * wy
    u2 = ux * ux + uy * uy
    keep = (
        F.when(dot <= 0, w2 <= F.lit(max_d2))
        .when(dot >= len2, u2 <= F.lit(max_d2))
        .otherwise(w2 * len2 - dot * dot <= F.lit(max_d2) * len2)
    )
    d2 = (
        F.when(dot <= 0, w2.cast("double"))
        .when(dot >= len2, u2.cast("double"))
        .otherwise((w2 * len2 - dot * dot).cast("double")
                   / len2.cast("double"))
    )
    return keep, d2


def snap_candidates_raw(
    points: DataFrame,
    segments: DataFrame,
    max_d: int,
    world: Box2,
    depth: int | None = None,
) -> DataFrame:
    """The cells-mode candidate join of snap_join, pre-filter: segment
    bboxes dilate by max_d and explode to covering cells; each point
    keeps its ONE home cell, so every qualifying pair meets exactly
    once. Works unchanged on a STREAMING points side (both projections
    are stateless; the equi-join against the static exploded segment
    side is a stream-static join)."""
    depth, n, sx, sy, _ = _ring_grid(world, max_d, depth, who="snap_join")
    s = explode_covering_cells(
        segments
        .withColumn("_s_min_x", F.least("x1", "x2") - max_d)
        .withColumn("_s_min_y", F.least("y1", "y2") - max_d)
        .withColumn("_s_max_x", F.greatest("x1", "x2") + max_d)
        .withColumn("_s_max_y", F.greatest("y1", "y2") + max_d),
        world, depth, "_s_min_x", "_s_min_y", "_s_max_x", "_s_max_y",
    ).drop("_s_min_x", "_s_min_y", "_s_max_x", "_s_max_y")
    p = (
        points.withColumn("cell_x", _gcoord(F.col("px"), world.min_x, sx, n))
        .withColumn("cell_y", _gcoord(F.col("py"), world.min_y, sy, n))
    )
    return p.join(s, ["cell_x", "cell_y"])


def ring_semi_join(
    objects: DataFrame, queries: DataFrame, world: Box2, depth: int, k: int = 1
) -> DataFrame:
    """O17: all objects whose cell lies in the Chebyshev-<=k ring around
    each query point's cell (the 3x3 load ring). Objects must carry
    (cell_x, cell_y); queries carry point (x, y)."""
    n, sx, sy = _grid(world, depth)
    q = (
        queries.withColumn("_qcx", _gcoord(F.col("x"), world.min_x, sx, n))
        .withColumn("_qcy", _gcoord(F.col("y"), world.min_y, sy, n))
        .withColumn("_dx", F.explode(F.sequence(F.lit(-k), F.lit(k))))
        .withColumn("_dy", F.explode(F.sequence(F.lit(-k), F.lit(k))))
        .withColumn("cell_x", F.col("_qcx") + F.col("_dx"))
        .withColumn("cell_y", F.col("_qcy") + F.col("_dy"))
        .drop("_qcx", "_qcy", "_dx", "_dy")
    )
    return q.join(objects, ["cell_x", "cell_y"])


def knn_join(
    queries: DataFrame,
    objects: DataFrame,
    world: Box2,
    depth: int,
    k: int,
    oversample: int = 8,
    checkpoint: bool = True,
    broadcast_queries: bool = False,
) -> DataFrame:
    """Exact kNN (queries: query_id, x, y; objects: obj_id, x, y).

    1. Starting ring radius derived from data density inside the plan:
       the object count rides in via a broadcast 1-row aggregate, and
       r0 satisfies (2*r0+1)^2 * density >= oversample * k (guarded to
       1 on an empty table — the unguarded division yields Infinity and
       an ANSI overflow at F.ceil).
    2. ONE evaluation of the phase-1 ring join: candidates go through a
       single window pass producing per-row rank, per-query candidate
       count and k-th-candidate distance d_k, then (checkpoint=True)
       an eager localCheckpoint pins the result so the three consumers
       below read it instead of re-executing the join subtree (the
       round-2 plan evaluated it ~3x; candidate volume is
       ~oversample*k rows per query, so the checkpoint is small).
       The checkpoint (plus the pruning-flags 1-row collect below)
       serializes one extra tiny job per call; latency-critical
       callers can pass checkpoint=False to keep the plan fully lazy
       at the cost of re-evaluating the ring join per consumer.
    3. Fast path: queries whose d_k-disc ring bound fits inside r0 are
       provably complete — their top-k is emitted with NO second join.
    4. Bound pass: satisfied queries whose bound exceeds r0 re-ring at
       bound radius (guarantees no closer object outside the searched
       ring is missed).
    5. Starved queries (< k candidates — density-derived r0 defeated by
       local skew): per-query radius from a broadcast OCCUPIED-CELL
       summary (bounded by min(4^depth, #objects) rows — never the
       object table itself, so no BroadcastNestedLoopJoin over a
       non-trivial side): the smallest Chebyshev radius whose
       cumulative cell count reaches k, inflated by the cell-diagonal
       factor so the k-th-distance disc is provably covered, then one
       ring join + top-k. The constant-key equi join keeps the plan on
       BroadcastHashJoin.

    Returns (query_id, obj_id, d2, rank). Ties: obj_id ascending —
    deterministic under any partitioning.
    """
    import math

    from pyspark.sql import Window as W

    n, sx, sy = _grid(world, depth)
    o = objects.select(
        F.col("obj_id"), F.col("x").alias("ox"), F.col("y").alias("oy"),
        _gcoord(F.col("x"), world.min_x, sx, n).alias("cell_x"),
        _gcoord(F.col("y"), world.min_y, sy, n).alias("cell_y"),
    )
    q0 = queries.select(
        "query_id", F.col("x").alias("qx"), F.col("y").alias("qy"),
        _gcoord(F.col("x"), world.min_x, sx, n).alias("qcx"),
        _gcoord(F.col("y"), world.min_y, sy, n).alias("qcy"),
    )

    def ring_candidates(qdf: DataFrame, radius: Column) -> DataFrame:
        keep = [c for c in qdf.columns if c not in ("cell_x", "cell_y")]
        qq = (
            qdf.withColumn("_r", radius)
            .withColumn("cell_x", F.explode(F.sequence(
                F.greatest(F.lit(0), F.col("qcx") - F.col("_r")),
                F.least(F.lit(n - 1), F.col("qcx") + F.col("_r")))))
            .withColumn("cell_y", F.explode(F.sequence(
                F.greatest(F.lit(0), F.col("qcy") - F.col("_r")),
                F.least(F.lit(n - 1), F.col("qcy") + F.col("_r")))))
        )
        # broadcast_queries=True is the fast path for the reference
        # workload (a handful of viewport/player queries vs a huge
        # object table): the exploded query-ring side broadcasts and
        # objects STREAM through a BroadcastHashJoin — zero shuffle of
        # the big side. It is an explicit opt-in, NOT the default: the
        # hint bypasses autoBroadcastJoinThreshold, and a large query
        # set exploded x (2r+1)^2 ring cells would OOM the driver
        # where the default shuffle equi-join on cell keys is safe.
        c = (F.broadcast(qq) if broadcast_queries else qq) \
            .join(o, ["cell_x", "cell_y"])
        ddx = F.col("ox") - F.col("qx")
        ddy = F.col("oy") - F.col("qy")
        return c.select(
            *keep, "obj_id", "ox", "oy",
            (ddx * ddx + ddy * ddy).alias("d2"),
        ).drop("_r")

    # phase 1: density-derived ring radius via a broadcast 1-row count
    ncount = objects.agg(F.count("*").alias("_N"))
    density = F.col("_N").cast("double") / F.lit(float(n * n))
    r0 = F.when(
        F.col("_N") > 0,
        F.ceil((F.sqrt(F.lit(float(oversample * k)) / density) - F.lit(1.0)) / 2),
    ).otherwise(F.lit(1))
    r0 = F.greatest(F.lit(1), F.least(F.lit(n - 1), r0)).cast("int")
    q1 = q0.crossJoin(F.broadcast(ncount)).withColumn("_r0", r0).drop("_N")
    got = ring_candidates(q1, F.col("_r0"))

    wk = W.partitionBy("query_id").orderBy("d2", "obj_id")
    wall = W.partitionBy("query_id")
    cellw = min(sx, sy)
    stats = (
        got.withColumn("_rk", F.row_number().over(wk))
        .withColumn("_cnt", F.count("*").over(wall))
        # d_k = k-th candidate distance (or farthest when _cnt < k)
        .withColumn("_dk2", F.max(
            F.when(F.col("_rk") == F.least(F.lit(k), F.col("_cnt")), F.col("d2"))
        ).over(wall))
    )
    if checkpoint:
        stats = stats.localCheckpoint()
    # Exact disc-cover bound: a point within Euclid distance d of the
    # query lies in a cell whose per-axis index differs by at most
    # floor(d / cell_axis) + 1 (the +1 absorbs the query's intra-cell
    # offset). floor, NOT ceil+1: the looser form can never be <= r0=1,
    # which silently forced the second ring join for EVERY query.
    bnd = F.least(
        F.lit(n), (F.floor(F.sqrt(F.col("_dk2")) / F.lit(cellw)) + 1).cast("int")
    )
    sat = (F.col("_cnt") >= k)

    # fast path: the d_k-disc already fits inside the searched ring
    fast = stats.filter(sat & (bnd <= F.col("_r0")) & (F.col("_rk") <= k)) \
        .select("query_id", "obj_id", "d2", F.col("_rk").alias("rank"))

    # bound pass for satisfied queries whose disc spills past r0
    redo_q = stats.filter(sat & (bnd > F.col("_r0")) & (F.col("_rk") == 1)) \
        .select("query_id", "qx", "qy", "qcx", "qcy", bnd.alias("_r2"))
    redo_cand = ring_candidates(redo_q, F.col("_r2")).drop("_r2")
    redo = redo_cand.withColumn("rank", F.row_number().over(wk)) \
        .filter(F.col("rank") <= k).select("query_id", "obj_id", "d2", "rank")

    # starved path: per-query radius from the occupied-cell summary
    sat_ids = stats.filter(sat & (F.col("_rk") == 1)).select("query_id")
    starved = q0.join(sat_ids, "query_id", "left_anti")
    csum = o.groupBy("cell_x", "cell_y").agg(F.count("*").alias("_cn"))
    # bounded cartesian: every starved query sees every occupied cell.
    # The join key is constant-valued but NOT constant-foldable
    # (pmod(col, 1) == 0 has no simplification rule), which keeps the
    # plan on BroadcastHashJoin — "no BroadcastNestedLoopJoin" stays a
    # mechanically checkable invariant of this operator even though a
    # BNLJ over this bounded build side would cost the same.
    sj = starved.withColumn("_one", F.pmod(F.col("qcx"), F.lit(1))).join(
        F.broadcast(csum.withColumn("_one", F.pmod(F.col("cell_x"), F.lit(1)))),
        "_one").drop("_one")
    cheb = F.greatest(F.abs(F.col("cell_x") - F.col("qcx")),
                      F.abs(F.col("cell_y") - F.col("qcy")))
    sj = sj.withColumn("_cheb", cheb)
    wcum = W.partitionBy("query_id").orderBy("_cheb", "cell_x", "cell_y") \
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    sj = sj.withColumn("_cum", F.sum("_cn").over(wcum))
    rq = sj.groupBy("query_id", "qx", "qy", "qcx", "qcy").agg(
        F.min(F.when(F.col("_cum") >= k, F.col("_cheb"))).alias("_rq"))
    # table smaller than k -> no radius reaches k: full-grid ring
    rq = rq.withColumn("_rq", F.coalesce(F.col("_rq"), F.lit(n - 1)))
    # d_k <= (rq+1) * max_cell * sqrt(2); cells within ceil(d_k/min_cell)+1
    # Chebyshev distance provably cover the d_k disc
    diag = max(sx, sy) * math.sqrt(2.0) / cellw
    rq = rq.withColumn(
        "_rg",
        F.least(F.lit(n),
                (F.floor((F.col("_rq") + 1) * F.lit(diag)) + 1).cast("int")),
    ).drop("_rq")
    starved_cand = ring_candidates(rq, F.col("_rg")).drop("_rg")
    starved_out = starved_cand.withColumn("rank", F.row_number().over(wk)) \
        .filter(F.col("rank") <= k).select("query_id", "obj_id", "d2", "rank")

    if not checkpoint:
        return fast.unionByName(redo).unionByName(starved_out)

    # Runtime branch pruning on the materialized stats — the same
    # empty-relation propagation AQE applies inside a stage, extended
    # across the checkpoint boundary AQE cannot see: one tiny job over
    # the checkpointed candidates decides whether the redo / starved
    # branches exist at all. In the common (near-uniform density) case
    # both counts are 0 and the returned plan makes ZERO further passes
    # over the object table (no occupied-cell summary, no second ring).
    flags = stats.filter(F.col("_rk") == 1).agg(
        F.coalesce(F.sum(F.when(sat & (bnd > F.col("_r0")), 1)), F.lit(0))
        .alias("n_redo"),
        F.coalesce(F.sum(F.when(sat, 1)), F.lit(0)).alias("n_sat"),
    ).collect()[0]
    out = fast
    if flags["n_redo"] > 0:
        out = out.unionByName(redo)
    # starved probe: one anti-join against the checkpointed sat set —
    # exact under duplicate query ids and never re-executes anything
    # beyond the queries scan itself (a queries.count() comparison
    # would miscount duplicates and pay the same scan anyway)
    if not starved.isEmpty():
        out = out.unionByName(starved_out)
    return out


def nearest_hit_xy(queries: DataFrame, objects: DataFrame) -> DataFrame:
    """k=1 fast path (O22 shape): broadcast the queries, min_by over
    squared distance with obj_id tiebreak."""
    j = objects.crossJoin(F.broadcast(queries.select(
        "query_id", F.col("x").alias("qx"), F.col("y").alias("qy"))))
    ddx = F.col("x") - F.col("qx")
    ddy = F.col("y") - F.col("qy")
    j = j.withColumn("d2", ddx * ddx + ddy * ddy)
    return j.groupBy("query_id").agg(
        F.min_by(F.struct("d2", "obj_id"), F.struct("d2", "obj_id")).alias("_best")
    ).select(
        "query_id",
        F.col("_best.obj_id").alias("obj_id"),
        F.col("_best.d2").alias("d2"),
    )
