"""O23 stretch: path tracer determinism + radiance sanity."""

import numpy as np
import pandas as pd

from optimizing_spark.operators import raster
from optimizing_spark.sources import datagen


def _scene():
    # a floor-ish big sphere, a lit sphere, and a plain one
    return pd.DataFrame({
        "obj_id": [0, 1, 2],
        "cx": [50.0, 50.0, 30.0],
        "cy": [-1000.0, 70.0, 40.0],
        "cz": [150.0, 150.0, 150.0],
        "radius": [1000.0, 10.0, 12.0],
        "emit": [0.0, 5.0, 0.0],
        "albedo": [0.7, 0.0, 0.5],
    })



def _dot3(a, b):
    """Left-associated 3-component dot, matching the engine's column
    fold exactly (np.dot may route through BLAS ddot, whose FMA /
    vectorization differs in the last ulp — enough to flip a grazing
    hit on a 1e5-radius wall sphere)."""
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _np_trace(rays_pd, scene_pd, uvals, max_depth, eps_hit=1e-9,
              roulette_from=None, u4vals=None):
    """Literal NumPy replay of raster.pathtrace: same nearest-hit rule
    (spheres + CUBE slab boxes), same material branches
    (Raytracing.hpp:566-635), same jitter streams (taken as input —
    the hash itself is a Spark built-in).
    Returns (radiance per ray_id, material-branch hit counts)."""
    IOR = 1.5
    R0 = ((IOR - 1.0) ** 2) / ((IOR + 1.0) ** 2)
    eps_off = 1e-6
    S = scene_pd.reset_index(drop=True)
    if "shape" not in S.columns:
        S = S.assign(shape="SPHERE")
    out = {}
    branch_hits = {"DIFFUSE": 0, "SPECULAR": 0, "REFRACTION": 0}
    roulette_deaths = 0
    for _, r in rays_pd.iterrows():
        o = np.array([r.origin_x, r.origin_y, r.origin_z], dtype=np.float64)
        d = np.array([r.dir_x, r.dir_y, r.dir_z], dtype=np.float64)
        thr, rad = 1.0, 0.0
        for bounce in range(max_depth):
            best = None  # (t, obj_id)
            for i, s in S.iterrows():
                c = np.array([s.cx, s.cy, s.cz])
                if s["shape"] == "CUBE":  # bracket access: Series.shape is the ndarray shape
                    # slab entry distance, exactly raster.ray_aabb_t
                    with np.errstate(divide="ignore"):
                        t0 = (c - o) / d
                        t1 = (c + s.radius - o) / d
                    tmin = float(np.max(np.minimum(t0, t1)))
                    tmax = float(np.min(np.maximum(t0, t1)))
                    if not (tmax >= tmin and tmax >= 0):
                        continue
                    t = tmin if tmin >= 0 else tmax
                else:
                    oc = o - c
                    b = _dot3(oc, d)
                    cq = _dot3(oc, oc) - s.radius * s.radius
                    disc = b * b - cq
                    if disc < 0:
                        continue
                    sq = np.sqrt(disc)
                    t = -b - sq if -b - sq > eps_hit else (-b + sq if -b + sq > eps_hit else None)
                if t is None:
                    continue
                if best is None or (t, s.obj_id) < best:
                    best = (t, int(s.obj_id))
            if best is None:
                break  # miss -> background 0
            t, oid = best
            s = S[S.obj_id == oid].iloc[0]
            rad += thr * s.emit
            if bounce == max_depth - 1:
                break
            if roulette_from is not None and bounce >= roulette_from:
                # colour roulette: survive iff u4 < gray albedo; the
                # survivor's albedo weight rescales to exactly 1
                if not (u4vals[(int(r.ray_id), bounce)] < s.albedo):
                    roulette_deaths += 1
                    break
                alb = 1.0
            else:
                alb = s.albedo
            h = o + d * t
            c = np.array([s.cx, s.cy, s.cz])
            if s["shape"] == "CUBE":
                cd = h - (c + s.radius / 2.0)
                ax, ay, az = abs(cd[0]), abs(cd[1]), abs(cd[2])
                n = np.zeros(3)
                if ax > ay and ax > az:
                    n[0] = 1.0 if cd[0] > 0 else -1.0
                elif ay > az:
                    n[1] = 1.0 if cd[1] > 0 else -1.0
                else:
                    n[2] = 1.0 if cd[2] > 0 else -1.0
            else:
                n = (h - c) / s.radius
            dot = _dot3(d, n)
            nl = n if dot < 0 else -n
            u1, u2, u3 = uvals[(int(r.ray_id), bounce)][:3]
            branch_hits[s.material] += 1
            if s.material == "SPECULAR":
                nd = d - 2.0 * dot * n
                w = alb
            elif s.material == "REFRACTION":
                refl = d - 2.0 * dot * n
                into = dot < 0
                nnt = 1.0 / IOR if into else IOR
                ddn = _dot3(d, nl)
                cos2t = 1.0 - nnt * nnt * (1.0 - ddn * ddn)
                if cos2t < 0:
                    nd, w = refl, alb
                else:
                    sgn = 1.0 if into else -1.0
                    td = d * nnt - n * (sgn * (ddn * nnt + np.sqrt(cos2t)))
                    td = td / np.sqrt(_dot3(td, td))
                    c1 = 1.0 - (-ddn if into else _dot3(td, n))
                    # engine folds left-to-right from the (1-R0) factor;
                    # libm pow(c1, 5) differs in the last ulp
                    re = R0 + (1.0 - R0) * c1 * c1 * c1 * c1 * c1
                    p = 0.25 + 0.5 * re
                    if u3 < p:
                        nd, w = refl, alb * (re / p)
                    else:
                        nd, w = td, alb * ((1.0 - re) / (1.0 - p))
            else:  # DIFFUSE
                theta = u1 * 2.0 * np.pi
                rr = np.sqrt(u2)
                vals = uvals[(int(r.ray_id), bounce)]
                if len(vals) == 5:
                    # engine-exported cos/sin: libm and the JVM differ
                    # in the last ulp, so bit-exact replay feeds the
                    # engine's trig values (same argument as feeding it
                    # the hash streams); all other math is replayed raw
                    _, _, _, ct, st = vals
                else:
                    ct, st = np.cos(theta), np.sin(theta)
                a = np.array([0.0, 1.0, 0.0]) if abs(nl[0]) > 0.9 else np.array([1.0, 0.0, 0.0])
                u = np.cross(a, nl); u = u / np.sqrt(_dot3(u, u))
                v = np.cross(nl, u)
                nd = u * ct * rr + v * st * rr + nl * np.sqrt(max(0.0, 1.0 - u2))
                w = alb
            thr *= w
            o = h + nd * eps_off
            d = nd
        out[int(r.ray_id)] = rad
    if roulette_from is not None:
        return out, branch_hits, roulette_deaths
    return out, branch_hits


def test_pathtrace_materials_match_numpy_oracle(spark):
    """Cornell-ish scene: diffuse floor + walls, mirror ball, glass
    ball, sphere light — engine radiance must equal the NumPy replay
    bit-for-bit (same jitter streams)."""
    from pyspark.sql import functions as F

    from optimizing_spark.operators.raster import jitter_u

    md = 4
    scene_pd = pd.DataFrame({
        "obj_id": [0, 1, 2, 3, 4],
        "cx": [50.0, 50.0, 27.0, 73.0, -1e4],
        "cy": [-1e4, 90.0, 16.5, 16.5, 40.0],
        "cz": [100.0, 100.0, 47.0, 78.0, 100.0],
        "radius": [1e4, 12.0, 16.5, 16.5, 1e4 - 60.0],
        "emit": [0.0, 12.0, 0.0, 0.0, 0.0],
        "albedo": [0.75, 0.0, 0.999, 0.999, 0.75],
        "material": ["DIFFUSE", "DIFFUSE", "SPECULAR", "REFRACTION", "DIFFUSE"],
    })
    rays_pd = datagen.rays_pandas(width=6, height=6, samples=1)
    rays = spark.createDataFrame(rays_pd)
    scene = spark.createDataFrame(scene_pd)

    # export the jitter streams the engine will use
    ucols = []
    for b in range(md - 1):
        ucols += [jitter_u(b, 42, 0).alias(f"u1_{b}"),
                  jitter_u(b, 42, 100).alias(f"u2_{b}"),
                  jitter_u(b, 42, 200).alias(f"u3_{b}")]
    updf = rays.select("ray_id", *ucols).toPandas()
    uvals = {}
    for _, row in updf.iterrows():
        for b in range(md - 1):
            uvals[(int(row.ray_id), b)] = (row[f"u1_{b}"], row[f"u2_{b}"], row[f"u3_{b}"])

    got = raster.pathtrace(rays, scene, max_depth=md).toPandas() \
        .sort_values("ray_id").reset_index(drop=True)
    want, branch_hits = _np_trace(rays_pd, scene_pd, uvals, md)
    got_v = got.radiance.to_numpy()
    want_v = np.array([want[int(i)] for i in got.ray_id])
    assert np.allclose(got_v, want_v, rtol=1e-9, atol=1e-12), \
        f"max diff {np.max(np.abs(got_v - want_v))}"
    # every material branch actually exercised in the replayed paths
    assert min(branch_hits.values()) > 0, branch_hits


def test_pathtrace_deterministic_and_sane(spark):
    rays_pd = datagen.rays_pandas(width=8, height=8, samples=2)
    rays = spark.createDataFrame(rays_pd)
    scene = spark.createDataFrame(_scene())
    a = raster.pathtrace(rays, scene, max_depth=3).toPandas() \
        .sort_values("ray_id").reset_index(drop=True)
    assert len(a) == len(rays_pd)
    assert (a.radiance >= 0).all()
    assert a.radiance.max() > 0  # something sees the light
    b = raster.pathtrace(rays.repartition(7), scene, max_depth=3).toPandas() \
        .sort_values("ray_id").reset_index(drop=True)
    assert np.allclose(a.radiance.to_numpy(), b.radiance.to_numpy())

    img = raster.render_raster(
        spark.createDataFrame(a), ["radiance"])
    assert img.count() == 64


def test_diffuse_bounce_query_matches_numpy_replay(spark):
    """q_diffuse_bounce (the driver-visible DIFFUSE branch) vs an
    independent NumPy float64 replay of Raytracing.hpp:566-580: same
    md5 uniforms, same hemisphere basis, same nearest-hit rule. The
    discrete second-hit object and the exact 0.5*emit radiance must
    match exactly; the sampled direction to 1e-9 (libm vs JVM ulps)."""
    import hashlib
    import math
    import sys

    sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = entry.q_diffuse_bounce(spark, sf).toPandas().set_index("query_id")

    spheres = [((k * 37 % 101) - 50.0, (k * 53 % 101) - 50.0, 25.0 + 3 * k,
                12.0, float(k + 1), k) for k in range(5)]
    spheres.append((0.0, 0.0, -10001.0, 10000.0, 0.0, 1000))

    def u01(stream, qid):
        h = int(hashlib.md5(f"{stream}:{qid}".encode()).hexdigest()[:15], 16)
        return (h % 1048576) / 1048576.0

    def hit(o, d):
        best = None
        for cx, cy, cz, r, emit, oid in spheres:
            oc = (o[0] - cx, o[1] - cy, o[2] - cz)
            b = oc[0] * d[0] + oc[1] * d[1] + oc[2] * d[2]
            cc = oc[0] ** 2 + oc[1] ** 2 + oc[2] ** 2 - r * r
            disc = b * b - cc
            if disc < 0:
                continue
            s = math.sqrt(disc)
            t = -b - s if -b - s > 1e-9 else (-b + s if -b + s > 1e-9 else None)
            if t is None:
                continue
            if best is None or (t, oid) < (best[0], best[1]):
                best = (t, oid, (cx, cy, cz), r, emit)
        return best

    for k in range(25):
        ox = float((k * 104729 + 12345) % 101 - 50)
        oy = float((k * 48271 + 54321) % 101 - 50)
        t, oid, c, r, _ = hit((ox, oy, 10.0), (0.0, 0.0, -1.0))
        p = (ox, oy, 10.0 - t)
        nl = tuple((p[i] - c[i]) / r for i in range(3))
        th = u01("d1", k) * 2.0 * math.pi
        r2 = u01("d2", k)
        r2s, sq = math.sqrt(r2), math.sqrt(1.0 - r2)
        ax = 0.0 if abs(nl[0]) > 0.1 else 1.0
        ay = 1.0 - ax
        cu = (ay * nl[2], -(ax * nl[2]), ax * nl[1] - ay * nl[0])
        ul = math.sqrt(sum(x * x for x in cu))
        u = tuple(x / ul for x in cu)
        v = (nl[1] * u[2] - nl[2] * u[1], nl[2] * u[0] - nl[0] * u[2],
             nl[0] * u[1] - nl[1] * u[0])
        raw = tuple(u[i] * math.cos(th) * r2s + v[i] * math.sin(th) * r2s
                    + nl[i] * sq for i in range(3))
        dl = math.sqrt(sum(x * x for x in raw))
        df = tuple(x / dl for x in raw)
        o2 = tuple(p[i] + df[i] * 1e-6 for i in range(3))
        h2 = hit(o2, df)
        row = got.loc[k]
        assert abs(row.dfx_r6 - df[0]) < 1e-9 + 5e-7, k
        assert abs(row.dfy_r6 - df[1]) < 1e-9 + 5e-7, k
        assert abs(row.dfz_r6 - df[2]) < 1e-9 + 5e-7, k
        if h2 is None:
            assert row.obj2 == -1 and row.radiance == 0.0, k
        else:
            assert row.obj2 == h2[1], k
            assert row.radiance == 0.5 * h2[4], k
    assert (got.obj2 >= 0).sum() >= 3  # non-vacuous: real emitter hits


def test_refract_chain_query_matches_python_replay_exactly(spark):
    """q_refract_chain vs an independent Python float replay of the
    refraction branch (Raytracing.hpp:588-635). No trig anywhere, so
    all three implementations (JVM, DuckDB, CPython) are correctly-
    rounded IEEE double — equality is EXACT, including the roulette
    decisions, TIR, and the final radiance."""
    import hashlib
    import math
    import sys

    sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = entry.q_refract_chain(spark, sf).toPandas().set_index("query_id")

    spheres = []
    for k in range(5):
        cx = 0.0 if k == 0 else float((k * 97 % 401) - 200)
        cy = 0.0 if k == 0 else float((k * 61 % 401) - 200)
        cz = 250.0 if k == 0 else -250.0
        spheres.append((cx, cy, cz, 120.0, float(k + 1), k))
    spheres.append((0.0, 0.0, 0.0, 30.0, 0.0, 1000))
    R0 = (0.5 * 0.5) / (2.5 * 2.5)

    def u01(stream, qid):
        h = int(hashlib.md5(f"{stream}:{qid}".encode()).hexdigest()[:15], 16)
        return (h % 1048576) / 1048576.0

    def hit(o, d):
        best = None
        for cx, cy, cz, r, emit, oid in spheres:
            oc = (o[0] - cx, o[1] - cy, o[2] - cz)
            b = oc[0] * d[0] + oc[1] * d[1] + oc[2] * d[2]
            cc = oc[0] * oc[0] + oc[1] * oc[1] + oc[2] * oc[2] - r * r
            disc = b * b - cc
            if disc < 0:
                continue
            s = math.sqrt(disc)
            t = -b - s if -b - s > 1e-9 else (-b + s if -b + s > 1e-9 else None)
            if t is None:
                continue
            if best is None or (t, oid) < (best[0], best[1]):
                best = (t, oid, (cx, cy, cz), r, emit)
        return best

    n_tir = 0
    for k in range(25):
        if k % 2 == 0:
            o = (float((k * 7) % 41 - 20), float((k * 11) % 41 - 20), 100.0)
            d = (0.0, 0.0, -1.0)
        else:
            w = tuple(u01(s, k) - 0.5 for s in ("r1", "r2", "r3"))
            wl = math.sqrt(w[0] * w[0] + w[1] * w[1] + w[2] * w[2])
            o = (float(24 + k % 5), float((k * 13) % 9 - 4), 0.0)
            d = (w[0] / wl, w[1] / wl, w[2] / wl)
        tp, path, hit_obj, radiance = 1.0, "", -1, 0.0
        for seg in (1, 2, 3):
            hb = hit(o, d)
            if hb is None:
                path += "M"
                break
            t, oid, c, r, emit = hb
            if oid < 1000:
                path += "E"
                hit_obj, radiance = oid, tp * emit
                break
            if seg == 3:
                path += "C"
                break
            p = tuple(o[i] + d[i] * t for i in range(3))
            n = tuple((p[i] - c[i]) / r for i in range(3))
            dot = d[0] * n[0] + d[1] * n[1] + d[2] * n[2]
            into = dot < 0
            nl = n if into else tuple(-x for x in n)
            ddn = d[0] * nl[0] + d[1] * nl[1] + d[2] * nl[2]
            nnt = (1.0 / 1.5) if into else 1.5
            cos2t = 1.0 - nnt * nnt * (1.0 - ddn * ddn)
            rd = tuple(d[i] - 2.0 * dot * n[i] for i in range(3))
            tcoef = (1.0 if into else -1.0) * (ddn * nnt + math.sqrt(max(0.0, cos2t)))
            tr = tuple(d[i] * nnt - n[i] * tcoef for i in range(3))
            tl = math.sqrt(tr[0] * tr[0] + tr[1] * tr[1] + tr[2] * tr[2])
            td = tuple(x / tl for x in tr)
            cdot = td[0] * n[0] + td[1] * n[1] + td[2] * n[2]
            c1 = 1.0 - (-ddn if into else cdot)
            re = R0 + (1.0 - R0) * c1 * c1 * c1 * c1 * c1
            pr = 0.25 + 0.5 * re
            u = u01(f"g{seg}", k)
            if cos2t < 0:
                nd, w_, lbl = rd, 1.0, "T"
                n_tir += 1
            elif u < pr:
                nd, w_, lbl = rd, re / pr, "R"
            else:
                nd, w_, lbl = td, (1.0 - re) / (1.0 - pr), "F"
            o = tuple(p[i] + nd[i] * 1e-6 for i in range(3))
            d, tp, path = nd, tp * w_, path + lbl
        row = got.loc[k]
        assert row.path == path, (k, row.path, path)
        assert row.hit_obj == hit_obj, k
        assert row.radiance == radiance, (k, row.radiance, radiance)
    assert n_tir >= 2  # TIR genuinely exercised


def test_render_reference_scene_matches_numpy_replay(spark):
    """E3 end-to-end at a reduced config: the reference Cornell scene
    (all 10 objects incl. the CUBE), the reference camera model, tent
    jitter, depth 5, the reference's eps=1e-4 hit tolerance, and the
    reference's pixel accumulation (per-subpixel sample mean -> clamp
    -> quarter-weighted pixel sum -> gamma tone map) — the engine's
    one-lazy-plan render vs a literal NumPy replay. The bench runs the
    SAME code path at the full 256x256 x 2x2 x 16 config
    (bench.py --render)."""
    from pyspark.sql import functions as F

    from optimizing_spark.operators.raster import jitter_u, render_scene

    W = H = 10
    SUB, S, MD = 2, 2, 5
    scene_pd = datagen.cornell_scene_pandas()
    rays_pd = datagen.camera_rays_pandas(W, H, subpixels=SUB, samples=S)
    rays = spark.createDataFrame(rays_pd)
    scene = spark.createDataFrame(scene_pd)

    # the distributed ray source equals the pandas definition
    dist = datagen.camera_rays_spark(spark, W, H, subpixels=SUB, samples=S,
                                     partitions=5).toPandas() \
        .sort_values("ray_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(dist, rays_pd.reset_index(drop=True))

    ucols = []
    for b in range(MD - 1):
        theta = jitter_u(b, 42, 0) * 2.0 * 3.141592653589793
        ucols += [jitter_u(b, 42, 0).alias(f"u1_{b}"),
                  jitter_u(b, 42, 100).alias(f"u2_{b}"),
                  jitter_u(b, 42, 200).alias(f"u3_{b}"),
                  F.cos(theta).alias(f"ct_{b}"),
                  F.sin(theta).alias(f"st_{b}")]
    updf = rays.select("ray_id", *ucols).toPandas()
    uvals = {}
    for _, row in updf.iterrows():
        for b in range(MD - 1):
            uvals[(int(row.ray_id), b)] = (
                row[f"u1_{b}"], row[f"u2_{b}"], row[f"u3_{b}"],
                row[f"ct_{b}"], row[f"st_{b}"])

    got = render_scene(rays, scene, samples_per_subpixel=S, max_depth=MD) \
        .toPandas().sort_values(["py", "px"]).reset_index(drop=True)
    assert len(got) == W * H

    want_rad, branch_hits = _np_trace(rays_pd, scene_pd, uvals, MD,
                                      eps_hit=1e-4)
    # replay the pixel accumulation
    acc = {}
    for _, r in rays_pd.iterrows():
        sp = int(r.sample_id) // S
        acc.setdefault((int(r.px), int(r.py)), {}).setdefault(sp, []) \
            .append(want_rad[int(r.ray_id)])
    want = {}
    for (px, py), subs in acc.items():
        v = sum(min(max(np.mean(rs), 0.0), 1.0) for rs in subs.values()) \
            / len(subs)
        want[(px, py)] = v
    got_v = got.value.to_numpy()
    want_v = np.array([want[(int(r.px), int(r.py))]
                       for _, r in got.iterrows()])
    assert np.allclose(got_v, want_v, rtol=1e-9, atol=1e-12), \
        f"max diff {np.max(np.abs(got_v - want_v))}"
    # tone map matches the replayed values
    tone = np.floor(np.clip(want_v, 0.0, 1.0) ** (1 / 2.2) * 255 + 0.5)
    assert (got.tone.to_numpy() == tone.astype(int)).all()
    # the Cornell fixture exercises every material branch, and some
    # paths reach the light (nonzero image)
    assert min(branch_hits.values()) > 0, branch_hits
    assert got_v.max() > 0


def test_colour_roulette_matches_numpy_replay(spark):
    """O23 colour-roulette variant (Raytracing.hpp:552-564): past
    roulette_from, a path survives with probability = its hit's max
    colour component (gray albedo) and the survivor's colour weight
    rescales to exactly 1; a dead path keeps the emission it already
    accumulated. Engine (flag on) must equal the NumPy replay, and the
    replay must actually kill some paths."""
    from pyspark.sql import functions as F

    from optimizing_spark.operators.raster import jitter_u, pathtrace

    MD, RF = 6, 2
    scene_pd = datagen.cornell_scene_pandas()
    rays_pd = datagen.camera_rays_pandas(8, 8, subpixels=2, samples=2)
    rays = spark.createDataFrame(rays_pd)
    scene = spark.createDataFrame(scene_pd)

    ucols = []
    for b in range(MD - 1):
        theta = jitter_u(b, 42, 0) * 2.0 * 3.141592653589793
        ucols += [jitter_u(b, 42, 0).alias(f"u1_{b}"),
                  jitter_u(b, 42, 100).alias(f"u2_{b}"),
                  jitter_u(b, 42, 200).alias(f"u3_{b}"),
                  F.cos(theta).alias(f"ct_{b}"),
                  F.sin(theta).alias(f"st_{b}"),
                  jitter_u(b, 42, 300).alias(f"u4_{b}")]
    updf = rays.select("ray_id", *ucols).toPandas()
    uvals, u4vals = {}, {}
    for _, row in updf.iterrows():
        for b in range(MD - 1):
            uvals[(int(row.ray_id), b)] = (
                row[f"u1_{b}"], row[f"u2_{b}"], row[f"u3_{b}"],
                row[f"ct_{b}"], row[f"st_{b}"])
            u4vals[(int(row.ray_id), b)] = row[f"u4_{b}"]

    got = pathtrace(rays, scene, max_depth=MD, hit_eps=1e-4,
                    inline_scene=True, roulette_from=RF).toPandas() \
        .sort_values("ray_id").reset_index(drop=True)
    assert len(got) == len(rays_pd)  # dead rays keep their 0/partial rows

    want, _, deaths = _np_trace(rays_pd, scene_pd, uvals, MD,
                                eps_hit=1e-4, roulette_from=RF,
                                u4vals=u4vals)
    got_v = got.radiance.to_numpy()
    want_v = np.array([want[int(i)] for i in got.ray_id])
    assert np.allclose(got_v, want_v, rtol=1e-9, atol=1e-12), \
        f"max diff {np.max(np.abs(got_v - want_v))}"
    assert deaths > 0  # the roulette genuinely terminates paths
    # survivors carry weight 1 (not albedo) past RF: radiance can
    # exceed the hard-capped variant's for the same rays
    capped = pathtrace(rays, scene, max_depth=MD, hit_eps=1e-4,
                       inline_scene=True).toPandas() \
        .sort_values("ray_id").reset_index(drop=True)
    assert not np.array_equal(got_v, capped.radiance.to_numpy())
