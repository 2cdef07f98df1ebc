"""radius_join + IDW interpolation: exact pair sets and estimates vs
brute-force NumPy oracles (BASELINE.md: identical join result rows)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from optimizing_spark.config import Box2
from optimizing_spark.operators import interpolate, joins

WORLD = Box2(0.0, 0.0, 65536.0, 65536.0)


def _fixture(spark, n_pts=900, n_q=40, seed=71):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 65536, size=n_pts)
    py = rng.integers(0, 65536, size=n_pts)
    val = rng.integers(0, 1000, size=n_pts)
    qx = rng.integers(0, 65536, size=n_q)
    qy = rng.integers(0, 65536, size=n_q)
    # plant a coincident site on query 0 (dist2 = 0 -> max weight)
    px[0], py[0] = qx[0], qy[0]
    pts = spark.createDataFrame(
        [(int(i), int(px[i]), int(py[i]), int(val[i])) for i in range(n_pts)],
        "point_id long, x long, y long, val long")
    qs = spark.createDataFrame(
        [(int(i), int(qx[i]), int(qy[i])) for i in range(n_q)],
        "query_id long, qx long, qy long")
    return pts, qs, px, py, val, qx, qy


def _brute_pairs(px, py, qx, qy, d):
    dx = qx[:, None].astype(np.int64) - px[None, :].astype(np.int64)
    dy = qy[:, None].astype(np.int64) - py[None, :].astype(np.int64)
    d2 = dx * dx + dy * dy
    return {(q, p): int(d2[q, p])
            for q in range(len(qx)) for p in range(len(px))
            if d2[q, p] <= d * d}


def test_radius_join_matches_brute_force_both_methods(spark):
    pts, qs, px, py, val, qx, qy = _fixture(spark)
    d = 4000
    want = _brute_pairs(px, py, qx, qy, d)
    assert len(want) > 0
    for method in ("broadcast", "cells"):
        got = joins.radius_join(pts, qs, d=d, world=WORLD,
                                method=method).toPandas()
        got_pairs = {(q, p): dd for q, p, dd in
                     zip(got.query_id, got.point_id, got.dist2)}
        assert got_pairs == want, method
        # exactly-once + point payload columns preserved
        assert len(got) == len(got_pairs)
        assert "val" in got.columns


def test_radius_join_broadcast_plan_never_shuffles_points(spark):
    pts, qs, *_ = _fixture(spark)
    plan = joins.radius_join(pts, qs, d=4000, world=WORLD,
                             method="broadcast") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "Cartesian" not in plan
    with pytest.raises(ValueError, match="fan-out"):
        joins.radius_join(pts, qs, d=2500, world=WORLD, depth=12)


def test_idw_quantized_matches_integer_oracle(spark):
    pts, qs, px, py, val, qx, qy = _fixture(spark)
    d = 4000
    got = interpolate.idw(pts, qs, d=d, world=WORLD).toPandas() \
        .set_index("query_id").sort_index()
    K = interpolate.IDW_SCALE
    pairs = _brute_pairs(px, py, qx, qy, d)
    for q in range(len(qx)):
        ws = [(K // (1 + d2), int(val[p]))
              for (qq, p), d2 in pairs.items() if qq == q]
        row = got.loc[q]
        assert row.n_pts == len(ws)
        wsum = sum(w * v for w, v in ws)
        wtot = sum(w for w, _ in ws)
        assert row.wsum == wsum and row.wtot == wtot
        assert wtot > 0 and row.idw_val == wsum // wtot
    # deterministic zero-neighbor site: far query, tiny radius — the
    # left join must keep the row with zero counts and a NULL estimate
    far_q = spark.createDataFrame([(99, 60000, 60000)],
                                  "query_id long, qx long, qy long")
    lone = spark.createDataFrame([(0, 100, 200, 5)],
                                 "point_id long, x long, y long, val long")
    z = interpolate.idw(lone, far_q, d=50, world=WORLD).toPandas()
    assert z.n_pts[0] == 0 and z.wsum[0] == 0 and z.wtot[0] == 0
    assert np.isnan(z.idw_val[0])
    # the planted coincident site dominates query 0's estimate
    q0 = got.loc[0]
    assert q0.n_pts >= 1 and q0.wtot >= K
    # estimates stay inside the value range
    est = got.idw_val.dropna()
    assert ((est >= 0) & (est <= 999)).all()


def test_idw_float_mode_tracks_quantized(spark):
    pts, qs, *_ = _fixture(spark)
    qz = interpolate.idw(pts, qs, d=4000, world=WORLD,
                         mode="quantized").toPandas().set_index("query_id")
    fl = interpolate.idw(pts, qs, d=4000, world=WORLD,
                         mode="float").toPandas().set_index("query_id")
    assert (qz.n_pts == fl.n_pts).all()
    both = qz.join(fl, lsuffix="_q", rsuffix="_f").dropna(
        subset=["idw_val_q", "idw_val_f"])
    assert len(both) > 0
    # floor(quantized) vs float: the floor contributes up to 1.0; the
    # 2^30 weight quantization adds ~1/w_min relative (w_min =
    # K/(1+d^2) ~ 67 at d=4000), so estimates track within ~2 units
    # of the 0..999 value range
    diff = (both.idw_val_q - both.idw_val_f).abs()
    assert (diff <= 2.0).all()
    with pytest.raises(ValueError, match="idw mode"):
        interpolate.idw(pts, qs, d=4000, world=WORLD, mode="exact")
