"""Douglas-Peucker trajectory simplification (operators/trajectory) vs
an INDEPENDENT oracle: a classic recursive DP in exact Fractions
(perpendicular distance² as a rational, no integer-algebra shortcuts),
plus the DP guarantee itself — every original point lies within eps of
the simplified polyline — checked in exact arithmetic, plus shape
properties (endpoints survive, eps monotonicity, partition
invariance)."""

from fractions import Fraction

import pytest

from optimizing_spark.operators.trajectory import (
    _dp_keep_mask,
    simplify_trajectories,
)


def _dist2_frac(p, a, b):
    """Exact squared distance from point p to SEGMENT a-b (Fractions).
    The recursive oracle uses infinite-line distance like classic DP;
    this segment version is only for the within-eps guarantee check."""
    ax, ay = a
    bx, by = b
    px, py = p
    dx, dy = bx - ax, by - ay
    if dx == 0 and dy == 0:
        return Fraction((px - ax) ** 2 + (py - ay) ** 2)
    t = Fraction((px - ax) * dx + (py - ay) * dy, dx * dx + dy * dy)
    t = min(max(t, Fraction(0)), Fraction(1))
    cx, cy = ax + t * dx, ay + t * dy
    return (px - cx) ** 2 + (py - cy) ** 2


def _dp_recursive(pts, eps):
    """Textbook recursive Douglas-Peucker in exact rationals.
    Infinite-line perpendicular distance (degenerate chord: point
    distance), argmax ties to the LOWEST index — the documented
    convention of the production kernel, implemented independently."""
    n = len(pts)
    if n <= 2:
        return list(range(n))
    ax, ay = pts[0]
    bx, by = pts[-1]
    dx, dy = bx - ax, by - ay
    best_i, best_d = -1, Fraction(-1)
    for i in range(1, n - 1):
        px, py = pts[i]
        if dx == 0 and dy == 0:
            d2 = Fraction((px - ax) ** 2 + (py - ay) ** 2)
        else:
            cross = dx * (py - ay) - dy * (px - ax)
            d2 = Fraction(cross * cross, dx * dx + dy * dy)
        if d2 > best_d:
            best_d, best_i = d2, i
    if best_d > Fraction(eps * eps):
        left = _dp_recursive(pts[: best_i + 1], eps)
        right = _dp_recursive(pts[best_i:], eps)
        return left + [best_i + j for j in right[1:]]
    return [0, n - 1]


def _walk(traj_id, n):
    """Deterministic wobbly near-linear walk, same family as the gate
    query's synthetic trajectories."""
    return [
        (
            100 * s + (traj_id * 31 + s * 48271) % 41,
            50 * s + (traj_id * 17 + s * 69621) % 41,
        )
        for s in range(n)
    ]


@pytest.mark.parametrize("eps", [0, 1, 5, 12, 40, 10**6])
def test_kernel_matches_fraction_oracle(eps):
    for tid, n in [(0, 1), (1, 2), (2, 3), (3, 30), (4, 200)]:
        pts = _walk(tid, n)
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        keep = _dp_keep_mask(xs, ys, eps)
        want = set(_dp_recursive(pts, eps))
        assert {i for i, k in enumerate(keep) if k} == want, (tid, eps)


def test_kernel_degenerate_chord_and_duplicates():
    # closed loop (first == last) and exact duplicate runs
    pts = [(0, 0), (10, 0), (10, 10), (10, 10), (0, 10), (0, 0)]
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    for eps in (0, 3, 100):
        keep = _dp_keep_mask(xs, ys, eps)
        assert {i for i, k in enumerate(keep) if k} == set(
            _dp_recursive(pts, eps)
        ), eps


@pytest.mark.parametrize("eps", [0, 6, 25])
def test_within_eps_guarantee(eps):
    """Every original point lies within eps of the simplified polyline
    (exact segment distance in Fractions)."""
    pts = _walk(7, 120)
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    keep = _dp_keep_mask(xs, ys, eps)
    kept = [pts[i] for i, k in enumerate(keep) if k]
    assert keep[0] and keep[-1]
    for p in pts:
        d2 = min(
            _dist2_frac(p, kept[j], kept[j + 1])
            for j in range(len(kept) - 1)
        )
        assert d2 <= Fraction(eps * eps), (p, eps)


def test_eps_monotone_point_count():
    pts = _walk(3, 150)
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    counts = [sum(_dp_keep_mask(xs, ys, e)) for e in (0, 2, 8, 20, 80)]
    assert counts == sorted(counts, reverse=True)
    assert counts[-1] >= 2


def test_kernel_big_coordinate_fallback():
    """Coordinate spans beyond the int64-safe window (> 2^30) route to
    the arbitrary-precision scalar path and still match the Fraction
    oracle."""
    base = _walk(5, 60)
    pts = [(x * (1 << 26) + (1 << 40), y * (1 << 26) - (1 << 41))
           for x, y in base]
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    for eps in (0, 1 << 27, 1 << 33):
        keep = _dp_keep_mask(xs, ys, eps)
        assert {i for i, k in enumerate(keep) if k} == set(
            _dp_recursive(pts, eps)
        ), eps


def test_spark_matches_kernel_and_partition_invariance(spark):
    rows = []
    expect = {}
    for tid in range(6):
        pts = _walk(tid, 40 + tid * 13)
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        keep = _dp_keep_mask(xs, ys, 12)
        expect[tid] = {s for s, k in enumerate(keep) if k}
        rows += [(tid, s, x, y) for s, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "traj_id long, seq long, x long, y long")
    for parts in (1, 7):
        got = {}
        out = simplify_trajectories(df.repartition(parts), eps=12).collect()
        for r in out:
            got.setdefault(r.traj_id, set()).add(r.seq)
        assert got == expect, parts


# ---------------------------------------------------------------------------
# segment_trips
# ---------------------------------------------------------------------------

from optimizing_spark.operators.trajectory import segment_trips  # noqa: E402


def _trips_oracle(pts, gap):
    """Sequential reference: split ordered (x, y) lists at step² > gap²,
    emit per-trip summaries."""
    out = []
    trip, start = 0, 0
    for i in range(len(pts)):
        if i > 0:
            dx = pts[i][0] - pts[i - 1][0]
            dy = pts[i][1] - pts[i - 1][1]
            if dx * dx + dy * dy > gap * gap:
                out.append((trip, start, i - 1))
                trip += 1
                start = i
    out.append((trip, start, len(pts) - 1))
    rows = []
    for trip, lo, hi in out:
        seg = pts[lo:hi + 1]
        xs = [p[0] for p in seg]
        ys = [p[1] for p in seg]
        rows.append((trip, hi - lo + 1, lo, hi, min(xs), max(xs),
                     min(ys), max(ys),
                     (xs[-1] - xs[0]) ** 2 + (ys[-1] - ys[0]) ** 2))
    return rows


def test_segment_trips_matches_sequential_oracle(spark):
    rows, expect = [], {}
    for tid in range(5):
        n = 40 + tid * 11
        pts = []
        for s in range(n):
            jump = 500 * ((s + tid) // 9)  # teleport every ~9 steps
            pts.append((10 * s + (tid * 31 + s * 48271) % 7 + jump,
                        5 * s + (tid * 17 + s * 69621) % 7))
        expect[tid] = set(_trips_oracle(pts, gap=60))
        rows += [(tid, s, x, y) for s, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(
        rows, "traj_id long, seq long, x long, y long")
    for parts in (1, 6):
        got = {}
        for r in segment_trips(df.repartition(parts), gap=60).collect():
            got.setdefault(r.traj_id, set()).add(
                (r.trip, r.n_points, r.seq_lo, r.seq_hi, r.min_x,
                 r.max_x, r.min_y, r.max_y, r.net_disp2))
        assert got == expect, parts


def test_segment_trips_edges(spark):
    # single point; exactly-gap step does NOT break (strict >); all
    # steps breaking -> one trip per point
    df = spark.createDataFrame(
        [(0, 0, 0, 0),
         (1, 0, 0, 0), (1, 1, 60, 0),       # step == gap -> same trip
         (2, 0, 0, 0), (2, 1, 0, 1000), (2, 2, 0, 2000)],
        "traj_id long, seq long, x long, y long")
    got = {(r.traj_id, r.trip): r for r in
           segment_trips(df, gap=60).collect()}
    assert got[(0, 0)].n_points == 1 and got[(0, 0)].net_disp2 == 0
    assert got[(1, 0)].n_points == 2 and got[(1, 0)].net_disp2 == 3600
    assert [got[(2, t)].n_points for t in (0, 1, 2)] == [1, 1, 1]


def test_od_matrix_matches_sequential_oracle(spark):
    from collections import Counter

    from optimizing_spark.operators.trajectory import od_matrix

    rows = []
    flows = Counter()
    trajs = {}
    for tid in range(5):
        n = 40 + tid * 11
        pts = []
        for s in range(n):
            jump = 500 * ((s + tid) // 9)
            pts.append((10 * s + (tid * 31 + s * 48271) % 7 + jump,
                        5 * s + (tid * 17 + s * 69621) % 7))
        for trip, lo, hi in [(t, lo, hi) for t, _n, lo, hi, *_ in
                             _trips_oracle(pts, gap=60)]:
            key = (pts[lo][0] >> 4, pts[lo][1] >> 4,
                   pts[hi][0] >> 4, pts[hi][1] >> 4)
            flows[key] += 1
            trajs.setdefault(key, set()).add(tid)
        rows += [(tid, s, x, y) for s, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(
        rows, "traj_id long, seq long, x long, y long")
    got = od_matrix(df, gap=60, cell_shift=4).collect()
    assert {(r.src_cx, r.src_cy, r.dst_cx, r.dst_cy):
            (r.n_trips, r.n_trajs) for r in got} == \
        {k: (v, len(trajs[k])) for k, v in flows.items()}
