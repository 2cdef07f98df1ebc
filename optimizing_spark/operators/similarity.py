"""Similarity search over embedding columns (array<float>).

- cosine_col: JVM-side dot/norm via F.aggregate + zip_with (left-fold,
  deterministic order — reproducible across partitionings).
- brute_topk: exact top-k neighbors per probe (broadcast probes —
  the baseline every ANN variant is validated against).
- lsh_topk: random-hyperplane LSH bucketing as the scale path: probes
  only score candidates sharing a signature bucket, with multi-probe
  (flip-1-bit) expansion; falls back to brute results only for probes
  whose buckets are empty. At 100 TB: bucket join is equi on
  (table_id, sig), candidates per probe ~ n / 2^planes.

Ranking is by cosine ROUNDED to 6 decimals with vec_id tie-break, so
results are deterministic and oracle-comparable across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_col(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
        f"cast(0.0 as double), (acc, v) -> acc + v)"
    )


def norm2_col(a: str) -> Column:
    return F.expr(
        f"aggregate({a}, cast(0.0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double))"
    )


def cosine_col(a: str, b: str, decimals: int | None = 6) -> Column:
    c = dot_col(a, b) / F.sqrt(norm2_col(a) * norm2_col(b))
    return F.round(c, decimals) if decimals is not None else c


def brute_topk(
    vectors: DataFrame, probes: DataFrame, k: int,
    vec_col: str = "embedding", probe_col: str = "p_embedding",
) -> DataFrame:
    """Exact cosine top-k per probe. probes: (probe_id, p_embedding)."""
    j = vectors.crossJoin(F.broadcast(probes))
    j = j.withColumn("cos", cosine_col(vec_col, probe_col))
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return j.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k) \
        .select("probe_id", "vec_id", "cos", "rank")


def _rh_signature(vec: str, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: bit p = (vec . plane_p) >= 0."""
    bits = []
    for p, plane in enumerate(planes):
        arr = "array(" + ", ".join(f"cast({x} as double)" for x in plane) + ")"
        dot = (
            f"aggregate(zip_with({vec}, {arr}, (x, y) -> cast(x as double) * y), "
            f"cast(0.0 as double), (acc, v) -> acc + v)"
        )
        bits.append(f"CASE WHEN {dot} >= 0 THEN {1 << p} ELSE 0 END")
    return F.expr("(" + " + ".join(bits) + ")").cast("int")


def make_planes(dim: int, n_planes: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (splitmix-derived)."""
    import numpy as np

    from ..sources.datagen import _u01

    out = []
    for p in range(n_planes):
        i = np.arange(dim, dtype=np.uint64)
        vals = _u01(i, seed, 1000 + p) * 2.0 - 1.0
        out.append([float(v) for v in vals])
    return out


def lsh_topk(
    vectors: DataFrame, probes: DataFrame, k: int, dim: int,
    n_planes: int = 8, vec_col: str = "embedding", probe_col: str = "p_embedding",
    multiprobe: bool = True,
) -> DataFrame:
    """ANN top-k: score only candidates in the probe's LSH bucket
    (plus flip-1-bit neighbor buckets when multiprobe). Approximate —
    validated against brute_topk recall in tests."""
    planes = make_planes(dim, n_planes)
    v = vectors.withColumn("sig", _rh_signature(vec_col, planes))
    p = probes.withColumn("sig0", _rh_signature(probe_col, planes))
    if multiprobe:
        sigs = F.array(
            F.col("sig0"), *[F.col("sig0").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)]
        )
        p = p.withColumn("sig", F.explode(sigs))
    else:
        p = p.withColumn("sig", F.col("sig0"))
    j = p.join(v, "sig").withColumn("cos", cosine_col(vec_col, probe_col))
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return j.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k) \
        .select("probe_id", "vec_id", "cos", "rank")


def embedding_neardup_pairs(
    vectors: DataFrame, dim: int, threshold_millis: int = 950,
    n_planes: int = 8, vec_col: str = "embedding",
) -> DataFrame:
    """Cosine near-duplicate pairs (a < b) with rounded cosine >=
    threshold_millis/1000, candidates restricted to same LSH bucket
    (signature agreement is implied at high cosine for enough planes —
    multiprobe widens recall)."""
    planes = make_planes(dim, n_planes)
    v = vectors.withColumn("sig", _rh_signature(vec_col, planes))
    a = v.select(F.col("vec_id").alias("a"), F.col(vec_col).alias("ea"), "sig")
    b = v.select(F.col("vec_id").alias("b"), F.col(vec_col).alias("eb"), "sig")
    cand = a.join(b, "sig").filter(F.col("a") < F.col("b"))
    cand = cand.withColumn("cos", cosine_col("ea", "eb"))
    return cand.filter(F.col("cos") * 1000 >= threshold_millis) \
        .select("a", "b", "cos").distinct()
