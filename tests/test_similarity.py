"""Similarity search: brute-force cosine top-k oracle vs engine, LSH
recall, near-dup pairs."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from optimizing_spark.operators import similarity as SIM

DIM = 16
N = 300


def _vectors(n=N, dim=DIM, seed=3, clusters=15):
    """Clustered vectors (ANN's actual regime): center + small noise, so
    true neighbors sit at high cosine and hyperplane LSH has signal."""
    rng = np.arange(clusters * dim, dtype=np.uint64)
    from optimizing_spark.sources.datagen import _u01
    centers = (_u01(rng, seed, 1) * 2 - 1).reshape(clusters, dim)
    noise = (_u01(np.arange(n * dim, dtype=np.uint64), seed, 2) * 2 - 1).reshape(n, dim)
    m = centers[np.arange(n) % clusters] + noise * 0.15
    # plant near-duplicates: vec 1 = vec 0 + tiny noise, vec 11 = vec 10 scaled
    m[1] = m[0] + 0.01
    m[11] = m[10] * 2.5
    return m


def _topk_oracle(m, probes_idx, k):
    norms = np.linalg.norm(m, axis=1)
    out = {}
    for pi in probes_idx:
        cos = (m @ m[pi]) / (norms * norms[pi])
        cos_r = np.round(cos, 6)
        order = np.lexsort((np.arange(len(m)), -cos_r))
        out[pi] = [int(j) for j in order[:k]]
    return out


@pytest.fixture(scope="module")
def vec_df(spark):
    m = _vectors()
    pdf = pd.DataFrame({
        "vec_id": np.arange(N, dtype=np.int64),
        "embedding": [row.astype(np.float64).tolist() for row in m],
    })
    return spark.createDataFrame(pdf)


def _probes_df(spark, m, idx):
    pdf = pd.DataFrame({
        "probe_id": idx,
        "p_embedding": [m[i].astype(np.float64).tolist() for i in idx],
    })
    return spark.createDataFrame(pdf)


def test_brute_topk_matches_oracle(spark, vec_df):
    m = _vectors()
    probes = [0, 5, 10, 42]
    got = SIM.brute_topk(vec_df, _probes_df(spark, m, probes), k=5) \
        .toPandas().sort_values(["probe_id", "rank"])
    want = _topk_oracle(m, probes, 5)
    for pi in probes:
        assert got[got.probe_id == pi].vec_id.tolist() == want[pi], f"probe {pi}"


def test_lsh_topk_recall(spark, vec_df):
    m = _vectors()
    probes = list(range(0, 50, 5))
    k = 5
    got = SIM.lsh_topk(vec_df, _probes_df(spark, m, probes), k=k, dim=DIM, n_planes=8) \
        .toPandas()
    want = _topk_oracle(m, probes, k)
    hits = total = 0
    for pi in probes:
        g = set(got[got.probe_id == pi].vec_id.tolist())
        w = set(want[pi])
        hits += len(g & w)
        total += len(w)
    recall = hits / total
    assert recall >= 0.6, f"LSH recall too low: {recall}"
    # rank-1 self-hit must survive bucketing (a vector shares its own bucket)
    for pi in probes:
        g = got[got.probe_id == pi]
        assert g[g["rank"] == 1].vec_id.iloc[0] == pi


def test_lsh_topk_starved_probe_fallback(spark, vec_df):
    """A probe far from every bucketed vector (buckets empty or thin)
    must still return exactly k rows, equal to the brute-force answer
    — the anti-join fallback path."""
    m = _vectors()
    # adversarial probe: orthogonal-ish direction unlikely to share a
    # bucket with any table vector
    weird = np.zeros(DIM); weird[0] = 1.0; weird[1] = -1.0
    pdf = pd.DataFrame({"probe_id": [999], "p_embedding": [weird.tolist()]})
    probes = spark.createDataFrame(pdf)
    k = 5
    got = SIM.lsh_topk(vec_df, probes, k=k, dim=DIM, n_planes=8, multiprobe=False) \
        .toPandas().sort_values("rank")
    assert len(got) == k
    brute = SIM.brute_topk(vec_df, probes, k=k).toPandas().sort_values("rank")
    # fallback equals the exact answer whenever the buckets held < k
    bucket_hit = got.vec_id.tolist() == brute.vec_id.tolist()
    assert bucket_hit or len(got) == k  # always k rows; exact when starved
    # and with every vector filtered out of its bucket (k > table slice),
    # the result must be identical to brute force
    tiny = vec_df.filter(F.col("vec_id") < 3)
    got2 = SIM.lsh_topk(tiny, probes, k=3, dim=DIM, n_planes=8, multiprobe=False) \
        .toPandas().sort_values("rank")
    brute2 = SIM.brute_topk(tiny, probes, k=3).toPandas().sort_values("rank")
    assert got2.vec_id.tolist() == brute2.vec_id.tolist()


def test_embedding_neardup_pairs(spark, vec_df):
    out = SIM.embedding_neardup_pairs(vec_df, dim=DIM, threshold_millis=990) \
        .toPandas()
    got = set(zip(out.a, out.b))
    assert (0, 1) in got    # planted near-dup
    assert (10, 11) in got  # scaled copy: cosine == 1
    m = _vectors()
    norms = np.linalg.norm(m, axis=1)
    for a, b in got:
        cos = float(m[a] @ m[b] / (norms[a] * norms[b]))
        assert round(cos, 6) >= 0.990


def test_lsh_topk_banding_grows_candidates(spark, vec_df):
    """The sound banding invariant: band 0 of the n_bands=4 index IS
    the n_bands=1 index (same plane stream), so the 4-band CANDIDATE
    set is a superset of the single-band one per probe — banding adds
    independent chances to collide. (Final top-k recall is NOT
    monotonic in general: the brute fallback hands starved probes
    exact answers, and fewer bands starve more probes.)"""
    probes_df = vec_df.select(F.col("vec_id").alias("probe_id"),
                              F.col("embedding").alias("p_embedding")) \
        .filter(F.col("probe_id") < 20)

    def cand_pairs(n_bands):
        vk = SIM._banded_keys(vec_df, "vec_id", "embedding", DIM, 8, n_bands)
        pk = SIM._banded_keys(probes_df, "probe_id", "p_embedding",
                              DIM, 8, n_bands, multiprobe=True)
        got = pk.join(vk, ["band", "h"]).select("probe_id", "vec_id") \
            .distinct().toPandas()
        return set(zip(got.probe_id, got.vec_id))

    c1, c4 = cand_pairs(1), cand_pairs(4)
    assert c1 <= c4
    assert len(c4) > len(c1)  # the extra bands genuinely add candidates


def test_ivf_topk_recall_and_exactness(spark, vec_df):
    """IVF scale path: recall floor on clustered vectors, exactly k
    rows per probe (fallback covers starved lists), and the rank-1
    self-hit (a vector's own inverted list is always probed)."""
    m = _vectors()
    probes = list(range(0, 50, 5))
    k = 5
    got = SIM.ivf_topk(vec_df, _probes_df(spark, m, probes), k=k,
                       n_centroids=16, n_probe=4).toPandas()
    want = _topk_oracle(m, probes, k)
    hits = total = 0
    for pi in probes:
        g = got[got.probe_id == pi]
        assert len(g) == k
        hits += len(set(g.vec_id) & set(want[pi]))
        total += len(want[pi])
        assert g[g["rank"] == 1].vec_id.iloc[0] == pi
    assert hits / total >= 0.6, f"IVF recall too low: {hits / total}"


def test_pq_topk_recall_and_exactness(spark, vec_df):
    """PQ compression path: recall floor on clustered vectors, exactly
    k rows per probe, rank-1 self-hit (a vector reconstructs closest to
    its own codes, and the exact re-rank restores the true cosine), and
    output cosines EXACT (they come from the shared re-rank tail, not
    the ADC approximation)."""
    m = _vectors()
    probes = list(range(0, 50, 5))
    k = 5
    got = SIM.pq_topk(vec_df, _probes_df(spark, m, probes), k=k,
                      dim=DIM, n_sub=4, n_codes=16, rerank=3).toPandas()
    want = _topk_oracle(m, probes, k)
    norms = np.linalg.norm(m, axis=1)
    hits = total = 0
    for pi in probes:
        g = got[got.probe_id == pi]
        assert len(g) == k
        hits += len(set(g.vec_id) & set(want[pi]))
        total += len(want[pi])
        assert g[g["rank"] == 1].vec_id.iloc[0] == pi
        for _, row in g.iterrows():
            j = int(row.vec_id)
            true_cos = round(float(m[j] @ m[pi] / (norms[j] * norms[pi])), 6)
            assert abs(row.cos - true_cos) < 1e-9
    assert hits / total >= 0.6, f"PQ recall too low: {hits / total}"


def _np_lloyd(m: np.ndarray, n_cent: int, iters: int):
    """NumPy replica of SIM.train_centroids' deterministic rule:
    round-6 cosine argmax assignment (lowest cent_id tie-break),
    round-6 element-wise mean update, empty clusters keep previous."""
    cents = m[:n_cent].astype(np.float64).copy()
    for _ in range(iters):
        nv = (m.astype(np.float64) ** 2).sum(axis=1)
        nc = (cents ** 2).sum(axis=1)
        cos = np.round(
            (m @ cents.T) / np.sqrt(nv[:, None] * nc[None, :]), 6)
        assign = np.argmax(cos, axis=1)  # first max = lowest cent_id
        for c in range(n_cent):
            members = m[assign == c]
            if len(members):
                cents[c] = np.round(members.astype(np.float64).mean(axis=0), 6)
    return cents


def test_train_centroids_matches_numpy_replica(spark, vec_df):
    m = _vectors()
    got = {r.cent_id: r.cent
           for r in SIM.train_centroids(vec_df, 8, iters=2).collect()}
    want = _np_lloyd(m, 8, 2)
    assert sorted(got) == list(range(8))
    for c in range(8):
        assert got[c] == pytest.approx(list(want[c]), abs=0), f"cent {c}"


def test_train_centroids_empty_cluster_keeps_previous(spark):
    # cent 1 duplicates cent 0 -> every tie resolves to 0 -> cluster 1
    # is empty each iteration and must keep its init centroid
    rows = [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [1.0, 0.1]),
            (3, [0.8, 0.02])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.cent_id: r.cent
           for r in SIM.train_centroids(df, 3, iters=2).collect()}
    assert got[1] == [1.0, 0.0]  # kept, not NULLed or dropped
    m = np.array([r[1] for r in rows])
    want = _np_lloyd(m, 3, 2)
    for c in range(3):
        assert got[c] == pytest.approx(list(want[c]), abs=0), f"cent {c}"


def test_trained_ivf_recall_not_worse_than_untrained(spark, vec_df):
    m = _vectors()
    probes = list(range(0, 60, 6))
    pdf = _probes_df(spark, m, probes)
    want = _topk_oracle(m, probes, 5)
    truth = {(pi, j) for pi in probes for j in want[pi]}

    def recall(iters):
        got = SIM.ivf_topk(vec_df, pdf, k=5, n_centroids=8, n_probe=2,
                           train_iters=iters).collect()
        hits = {(r.probe_id, r.vec_id) for r in got}
        return len(hits & truth) / len(truth)

    r0, r2 = recall(0), recall(2)
    assert r2 >= r0  # training must not hurt on the clustered fixture
    assert r2 >= 0.5
