"""operators/clustering.grid_dbscan vs a pure-Python replica.

Deterministic by construction (counts, min labels, component ids are
order-free), so the Spark plan must match the replica exactly on a
blobs+noise fixture — including the core/border/noise kinds and the
min-component border tie-break — and be partitioning-invariant.
"""

import pytest
from pyspark.sql import functions as F

from optimizing_spark.operators.clustering import grid_dbscan

WB, DEPTH, MIN_PTS = 16, 6, 4
SHIFT, SIDE = WB - DEPTH, 1 << DEPTH


def _blobs():
    """Two dense blobs (one L-shaped via touching cells), a sparse
    dust field, and a far-away pair below min_pts."""
    pts = []
    pid = 0

    def put(x, y, n):
        nonlocal pid
        for i in range(n):
            pts.append((pid, x + (i * 37) % 900, y + (i * 53) % 900))
            pid += 1

    put(10_000, 10_000, 12)          # blob A cell(s)
    put(11_100, 10_000, 9)           # adjacent cell -> same cluster as A
    put(40_000, 40_000, 15)          # blob B
    put(60_000, 20_000, 2)           # pair: below min_pts -> not dense
    for i in range(25):              # dust: 1 pt / far-apart cells
        pts.append((pid, (i * 2_521) % 65_536, (i * 1_759 + 30_000) % 65_536))
        pid += 1
    return pts


def _py_dbscan(pts):
    from collections import Counter, defaultdict

    cells = {p: (x >> SHIFT, y >> SHIFT) for p, x, y in pts}
    counts = Counter(cells.values())
    dense = {c for c, n in counts.items() if n >= MIN_PTS}
    cid = {c: c[0] * SIDE + c[1] for c in dense}
    # union components over 8-adjacency
    parent = {c: c for c in dense}

    def find(c):
        while parent[c] != c:
            parent[c] = parent[parent[c]]
            c = parent[c]
        return c

    for (cx, cy) in dense:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nb = (cx + dx, cy + dy)
                if nb in dense:
                    ra, rb = find((cx, cy)), find(nb)
                    if ra != rb:
                        parent[ra] = rb
    comp = defaultdict(list)
    for c in dense:
        comp[find(c)].append(cid[c])
    lbl = {}
    for root, ids in comp.items():
        m = min(ids)
        for c in dense:
            if find(c) == root:
                lbl[c] = m
    out = {}
    for p, x, y in pts:
        c = cells[p]
        if c in dense:
            out[p] = ("core", lbl[c])
            continue
        ring = [lbl[(c[0] + dx, c[1] + dy)]
                for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                if (c[0] + dx, c[1] + dy) in dense]
        out[p] = ("border", min(ring)) if ring else ("noise", -1)
    return out


@pytest.fixture(scope="module")
def pts_df(spark):
    return spark.createDataFrame(_blobs(), ["point_id", "px", "py"])


def test_grid_dbscan_matches_replica(spark, pts_df):
    got = {r["point_id"]: (r["kind"], r["cluster_id"])
           for r in grid_dbscan(pts_df, DEPTH, MIN_PTS,
                                world_bits=WB).collect()}
    want = _py_dbscan(_blobs())
    assert got == want
    kinds = {k for k, _ in got.values()}
    assert kinds == {"core", "border", "noise"}  # fixture hits all three
    # the two adjacent blob-A cells merged into ONE cluster
    a_ids = {c for k, c in (got[p] for p in range(21)) if k == "core"}
    assert len(a_ids) == 1
    # blob B is a different cluster
    b_ids = {c for k, c in (got[p] for p in range(21, 36)) if k == "core"}
    assert len(b_ids) == 1 and b_ids != a_ids
    # the below-threshold pair is not core
    assert got[36][0] != "core" and got[37][0] != "core"


def test_grid_dbscan_partitioning_invariance(spark, pts_df):
    a = sorted(map(tuple, grid_dbscan(
        pts_df.repartition(1), DEPTH, MIN_PTS, world_bits=WB).collect()))
    b = sorted(map(tuple, grid_dbscan(
        pts_df.repartition(13, "px"), DEPTH, MIN_PTS,
        world_bits=WB).collect()))
    assert a == b
