"""NumPy golden oracles — direct re-implementations of the reference's
tree semantics (float64, same op order as the engine's column exprs).

These are deliberately simple/sequential; they are the ground truth the
distributed engine must match 100% (BASELINE.md targets).
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# Static quadtree (.Test/QuadTree.cpp:131-148; rect semantics :25-69)
# ---------------------------------------------------------------------------

def static_quadtree_assign(
    min_x: np.ndarray, min_y: np.ndarray, max_x: np.ndarray, max_y: np.ndarray,
    world: tuple[float, float, float, float], max_depth: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized: returns (depth, morton-path code) per box.

    Rule: from the root (depth 0), descend into the first child whose
    rect contains the box (min-closed / max-strict) while
    child depth < max_depth. Midpoints by recursive halving
    min + (max-min)*0.5 — identical FP ops to the engine.
    """
    n = len(min_x)
    c0x = np.full(n, world[0]); c0y = np.full(n, world[1])
    c1x = np.full(n, world[2]); c1y = np.full(n, world[3])
    depth = np.zeros(n, dtype=np.int64)
    code = np.zeros(n, dtype=np.int64)
    done = np.zeros(n, dtype=bool)
    for _ in range(max_depth - 1):
        mid_x = c0x + (c1x - c0x) * 0.5
        mid_y = c0y + (c1y - c0y) * 0.5
        low_x = (min_x >= c0x) & (max_x < mid_x)
        high_x = (min_x >= mid_x) & (max_x < c1x)
        low_y = (min_y >= c0y) & (max_y < mid_y)
        high_y = (min_y >= mid_y) & (max_y < c1y)
        has_x = low_x | high_x
        has_y = low_y | high_y
        can = ~done & has_x & has_y
        bx = np.where(low_x, 0, 1)  # lower child checked first
        by = np.where(low_y, 0, 1)
        digit = bx + 2 * by
        code = np.where(can, (code << 2) | digit, code)
        depth = np.where(can, depth + 1, depth)
        up_x = can & (bx == 1); lo_x = can & (bx == 0)
        up_y = can & (by == 1); lo_y = can & (by == 0)
        c0x = np.where(up_x, mid_x, c0x); c1x = np.where(lo_x, mid_x, c1x)
        c0y = np.where(up_y, mid_y, c0y); c1y = np.where(lo_y, mid_y, c1y)
        done = done | ~can
    return depth, code


# ---------------------------------------------------------------------------
# Dynamic octree with capacity (DynamicOctree.hpp:126-144) — sequential,
# order-dependent ground truth
# ---------------------------------------------------------------------------

def octree_capacity_assign(
    boxes: np.ndarray,  # (n, 6): min_x min_y min_z max_x max_y max_z, in insert order
    world: tuple[float, float, float, float, float, float],
    capacity: int = 4,
    max_depth: int = 5,
) -> tuple[np.ndarray, np.ndarray]:
    """Returns (depth, morton3d-path code) per box, simulating the exact
    insert: at each node (root _DEPTH = max_depth, child _DEPTH-1), the
    item STAYS if _DEPTH == 0 or node count < capacity; otherwise it
    descends into the first child (SWD..NEU = x, then y, then z bits)
    whose box contains it (closed intervals); if none contains, it
    stays. Node count includes straddlers (DynamicOctree.hpp:126-144).
    """
    n = len(boxes)
    depth_out = np.zeros(n, dtype=np.int64)
    code_out = np.zeros(n, dtype=np.int64)
    counts: dict[tuple[int, int], int] = {}

    for r in range(n):
        b = boxes[r]
        c0 = [world[0], world[1], world[2]]
        c1 = [world[3], world[4], world[5]]
        d = 0  # levels descended; node _DEPTH = max_depth - d
        code = 0
        while True:
            key = (d, code)
            cnt = counts.get(key, 0)
            if max_depth - d == 0 or cnt < capacity:
                counts[key] = cnt + 1
                break
            digit = 0
            ok = True
            nc0 = list(c0); nc1 = list(c1)
            for ax in range(3):
                mid = c0[ax] + (c1[ax] - c0[ax]) * 0.5
                if b[ax] >= c0[ax] and b[3 + ax] <= mid:
                    nc1[ax] = mid
                elif b[ax] >= mid and b[3 + ax] <= c1[ax]:
                    digit |= 1 << ax
                    nc0[ax] = mid
                else:
                    ok = False
                    break
            if not ok:
                counts[key] = cnt + 1  # straddler stays, still counts
                break
            c0, c1 = nc0, nc1
            code = (code << 3) | digit
            d += 1
        depth_out[r] = d
        code_out[r] = code
    return depth_out, code_out


# ---------------------------------------------------------------------------
# Search / join oracles
# ---------------------------------------------------------------------------

def rect_overlap_pairs(queries: np.ndarray, items: np.ndarray) -> set[tuple[int, int]]:
    """2D search oracle: all (query_id, obj_id) with the reference's
    asymmetric overlap (q.min < i.max strict, q.max >= i.min closed)."""
    out = set()
    for qi in range(len(queries)):
        q = queries[qi]
        m = (q[0] < items[:, 2]) & (q[2] >= items[:, 0]) & (q[1] < items[:, 3]) & (q[3] >= items[:, 1])
        for oi in np.nonzero(m)[0]:
            out.add((qi, int(oi)))
    return out


def box_overlap_pairs_3d(queries: np.ndarray, items: np.ndarray) -> set[tuple[int, int]]:
    """3D closed overlap (BoundaryBox.hpp:47-51): arrays (n,6) ordered
    min_x min_y min_z max_x max_y max_z."""
    out = set()
    for qi in range(len(queries)):
        q = queries[qi]
        m = np.ones(len(items), dtype=bool)
        for ax in range(3):
            m &= (q[ax] <= items[:, 3 + ax]) & (q[3 + ax] >= items[:, ax])
        for oi in np.nonzero(m)[0]:
            out.add((qi, int(oi)))
    return out


def contains_point_pairs_3d(boxes: np.ndarray, px, py, pz) -> set[tuple[int, int]]:
    """Closed point-in-box (BoundaryBox.hpp:42-46)."""
    out = set()
    for qi in range(len(boxes)):
        b = boxes[qi]
        m = (px >= b[0]) & (px <= b[3]) & (py >= b[1]) & (py <= b[4]) & (pz >= b[2]) & (pz <= b[5])
        for oi in np.nonzero(m)[0]:
            out.add((qi, int(oi)))
    return out


def knn_oracle(qx, qy, ox, oy, obj_ids, k: int) -> list[list[int]]:
    """Per query: k nearest objects by squared euclidean distance,
    ties broken by obj_id ascending."""
    res = []
    for i in range(len(qx)):
        d2 = (ox - qx[i]) ** 2 + (oy - qy[i]) ** 2
        order = np.lexsort((obj_ids, d2))
        res.append([int(obj_ids[j]) for j in order[:k]])
    return res


def ray_aabb_t(origin: np.ndarray, direction: np.ndarray, box: np.ndarray) -> float:
    """Slab method (Raytracing.hpp:267-289): returns smallest t >= 0 of
    entry into the box, or inf if missed."""
    with np.errstate(divide="ignore", invalid="ignore"):
        t0 = (box[:3] - origin) / direction
        t1 = (box[3:] - origin) / direction
    tmin = np.nanmax(np.minimum(t0, t1))
    tmax = np.nanmin(np.maximum(t0, t1))
    if tmax < tmin or tmax < 0:
        return np.inf
    return tmin if tmin >= 0 else tmax


def ray_sphere_t(origin: np.ndarray, direction: np.ndarray, center: np.ndarray, radius: float) -> float:
    """Quadratic discriminant (Raytracing.hpp:291-348): nearest positive
    root or inf."""
    oc = origin - center
    b = float(np.dot(oc, direction))
    c = float(np.dot(oc, oc)) - radius * radius
    disc = b * b - c
    if disc < 0:
        return np.inf
    s = np.sqrt(disc)
    t = -b - s
    if t > 1e-9:
        return t
    t = -b + s
    return t if t > 1e-9 else np.inf
