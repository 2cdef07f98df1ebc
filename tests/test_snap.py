"""snap_join (map-matching) vs a brute-force NumPy oracle: exact
winner + IEEE d2 on random points/segments, endpoint-projection
branches, degenerate (zero-length) segments, exact max_d boundary,
deterministic tie-break, cells==broadcast plan equivalence, and
out-of-world segments."""

import numpy as np

from optimizing_spark.config import Box2
from optimizing_spark.operators.joins import snap_join

WORLD = Box2(0.0, 0.0, 65536.0, 65536.0)
E = 65536


def _pts(n, salt=0):
    ids = np.arange(n, dtype=np.int64)
    px = (ids * 48271 + salt * 7919 + 11) % E
    py = (ids * 69621 + salt * 104729 + 3) % E
    return ids, px, py


def _segs(n, salt=0, max_len=4000):
    ids = np.arange(n, dtype=np.int64)
    x1 = (ids * 16807 + salt * 31 + 5) % E
    y1 = (ids * 39916801 + salt * 17 + 7) % E
    x2 = x1 + (ids * 131 + salt) % max_len - max_len // 2
    y2 = y1 + (ids * 137 + salt * 3) % max_len - max_len // 2
    # plant a degenerate (point) segment
    x2[0], y2[0] = x1[0], y1[0]
    return ids, x1, y1, x2, y2


def _oracle(pid, px, py, sid, x1, y1, x2, y2, max_d):
    """Brute argmin with the SAME rational/IEEE algebra as snap_join."""
    max_d2 = max_d * max_d
    out = {}
    for i in range(len(pid)):
        best = None
        for j in range(len(sid)):
            vx, vy = int(x2[j] - x1[j]), int(y2[j] - y1[j])
            wx, wy = int(px[i] - x1[j]), int(py[i] - y1[j])
            ux, uy = int(px[i] - x2[j]), int(py[i] - y2[j])
            dot = wx * vx + wy * vy
            len2 = vx * vx + vy * vy
            if dot <= 0:
                num, den = wx * wx + wy * wy, 1
            elif dot >= len2:
                num, den = ux * ux + uy * uy, 1
            else:
                num, den = (wx * wx + wy * wy) * len2 - dot * dot, len2
            if num > max_d2 * den:
                continue
            d2 = float(num) / float(den)
            key = (d2, int(sid[j]))
            if best is None or key < best:
                best = key
        if best is not None:
            out[int(pid[i])] = best
    return out


def _run(spark, pid, px, py, sid, x1, y1, x2, y2, max_d, **kw):
    p = spark.createDataFrame(
        [(int(a), int(b), int(c)) for a, b, c in zip(pid, px, py)],
        "point_id long, px long, py long")
    s = spark.createDataFrame(
        [(int(a), int(b), int(c), int(d), int(e))
         for a, b, c, d, e in zip(sid, x1, y1, x2, y2)],
        "seg_id long, x1 long, y1 long, x2 long, y2 long")
    rows = snap_join(p, s, max_d, WORLD, **kw).collect()
    return {r["point_id"]: (r["d2"], r["seg_id"]) for r in rows}


def test_snap_vs_brute_and_plan_equivalence(spark):
    pid, px, py = _pts(300)
    sid, x1, y1, x2, y2 = _segs(80)
    want = _oracle(pid, px, py, sid, x1, y1, x2, y2, 3000)
    got = _run(spark, pid, px, py, sid, x1, y1, x2, y2, 3000)
    ctl = _run(spark, pid, px, py, sid, x1, y1, x2, y2, 3000,
               method="broadcast")
    assert got == want and ctl == want
    assert len(want) > 100  # non-trivial coverage


def test_snap_branches_exact():
    # left endpoint, right endpoint, interior projection — sanity on
    # the oracle algebra itself (hand values)
    want = _oracle(
        np.array([0, 1, 2]), np.array([-10, 110, 50]),
        np.array([5, 5, 7]),
        np.array([9]), np.array([0]), np.array([0]),
        np.array([100]), np.array([0]), 100)
    assert want[0] == (125.0, 9)      # |(-10,5)|^2
    assert want[1] == (125.0, 9)      # |(10,5)|^2
    assert want[2] == (49.0, 9)       # interior: dy^2


def test_snap_max_d_boundary_exact(spark):
    # point exactly at distance max_d from a horizontal segment: kept;
    # one unit farther: dropped (exact integer gate, not IEEE)
    pid = np.array([0, 1])
    px = np.array([50, 50])
    py = np.array([130, 131])
    sid, x1, y1 = np.array([7]), np.array([0]), np.array([100])
    x2, y2 = np.array([100]), np.array([100])
    got = _run(spark, pid, px, py, sid, x1, y1, x2, y2, 30)
    assert got == {0: (900.0, 7)}


def test_snap_tie_break_lowest_seg_id(spark):
    # two identical segments: lowest seg_id wins everywhere
    pid = np.array([0])
    px, py = np.array([50]), np.array([60])
    sid = np.array([9, 3])
    x1 = np.array([0, 0]); y1 = np.array([0, 0])
    x2 = np.array([100, 100]); y2 = np.array([0, 0])
    got = _run(spark, pid, px, py, sid, x1, y1, x2, y2, 100)
    assert got == {0: (3600.0, 3)}


def test_snap_degenerate_and_out_of_world(spark):
    # zero-length segment is a point; segments may run out of world
    pid = np.array([0, 1])
    px, py = np.array([10, 65530]), np.array([10, 65530])
    sid = np.array([1, 2])
    x1 = np.array([13, 65530]); y1 = np.array([14, 65000])
    x2 = np.array([13, 65530]); y2 = np.array([14, 70000])
    got = _run(spark, pid, px, py, sid, x1, y1, x2, y2, 600)
    assert got == {0: (25.0, 1), 1: (0.0, 2)}
