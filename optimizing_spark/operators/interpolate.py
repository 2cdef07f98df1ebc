"""Spatial interpolation: inverse-distance weighting (IDW) over the
cell index — the raster<->vector estimation staple (Shepard 1968).

Estimates a value at each query site from the sample points within a
radius d: sum(w_i * v_i) / sum(w_i) with w ~ 1/d^2 (Shepard's
power-2 weights). Candidate generation is joins.radius_join — the
kring cell equi-join, never an all-pairs product — so the plan is the
distance-band shape that survives 100 TB: the sample table never
shuffles in broadcast mode, and the aggregation is a partial-agg
groupBy on the query key (cf. the reference's neighbor-ring load,
WorldPartition.hpp:194-213, which this generalizes from counting to
weighted estimation).

Two weight modes:
- mode='quantized' (default, the oracle-exact form): integer weights
  w = K div (1 + dist2) with K = 2^30. Everything stays BIGINT, so
  Spark and DuckDB agree bit-for-bit at ANY accumulation order — the
  engine's standard trick for making a floating-point-natured
  operator driver-gateable. The +1 regularizer makes coincident
  sites (dist2 = 0) well-defined with the maximum weight K.
- mode='float': literal Shepard weights 1.0 / (1 + dist2) as doubles
  — what a production caller would use; identical plan shape. The
  pytest proves the quantized estimate tracks it to ~1e-5 relative.

Zero-neighbor queries survive with n_pts = 0 and a NULL estimate via
the zero-preserving left join (broadcast: the aggregate is bounded by
the query count, never by the sample count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import Box2
from .joins import DIST_JOIN_MAX_FANOUT, radius_join

IDW_SCALE = 1 << 30  # quantized-weight numerator K: keeps w >= 1 out to
# dist2 < 2^30 (d ~ 32k, half the world edge) and leaves 2^63 / (K *
# max_val) ~ 2^23 neighbors-per-query of ANSI BIGINT headroom in wsum


def idw(
    points: DataFrame,
    queries: DataFrame,
    d: int,
    world: Box2,
    value_col: str = "val",
    query_id: str = "query_id",
    mode: str = "quantized",
    method: str = "broadcast",
    depth: int | None = None,
    max_fanout: int = DIST_JOIN_MAX_FANOUT,
) -> DataFrame:
    """IDW estimate per query site. points(x, y, value_col [,...]),
    queries(query_id, qx, qy). Returns one row per query:
    (query_id, qx, qy, n_pts, wsum, wtot, idw_val) where
    wsum = sum(w * v), wtot = sum(w) and idw_val = wsum / wtot
    (integer floor division in quantized mode — exact and
    ANSI-overflow-safe: w <= 2^30 and val < 2^10, leaving ~2^23
    neighbors per query before BIGINT wsum could saturate)."""
    if mode not in ("quantized", "float"):
        raise ValueError(f"unknown idw mode {mode!r}")
    pairs = radius_join(
        points.select("x", "y", value_col),
        queries.select(query_id, "qx", "qy"),
        d, world, depth=depth, method=method, max_fanout=max_fanout)
    if mode == "quantized":
        w = F.expr(f"CAST({IDW_SCALE} AS BIGINT) div (1 + dist2)")
        val = F.col(value_col).cast("long")
        est = F.expr("wsum div wtot")
    else:
        w = F.lit(1.0) / (F.lit(1.0) + F.col("dist2").cast("double"))
        val = F.col(value_col).cast("double")
        est = F.col("wsum") / F.col("wtot")
    agg = pairs.groupBy(query_id).agg(
        F.count("*").alias("n_pts"),
        F.sum(w * val).alias("wsum"),
        F.sum(w).alias("wtot"),
    )
    # the aggregate has at most one row per query — broadcast the
    # zero-preserving left join (the hex-ring-join pattern)
    return (
        queries.select(query_id, "qx", "qy")
        .join(F.broadcast(agg), query_id, "left")
        .select(
            query_id, "qx", "qy",
            F.coalesce("n_pts", F.lit(0)).alias("n_pts"),
            F.coalesce("wsum", F.lit(0)).alias("wsum"),
            F.coalesce("wtot", F.lit(0)).alias("wtot"),
            F.when(F.col("wtot") > 0, est).alias("idw_val"),
        )
    )
