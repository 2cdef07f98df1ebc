"""Point-pattern statistics: Ripley's K and the nearest-neighbour
G-function over a planar point set — the classic second-order /
first-order pair of "is this pattern clustered, random, or regular?"
diagnostics (Ripley 1977; Diggle 2003). They complement the LATTICE
statistics in operators/autocorr (Moran/Geary/Gi* summarize a
cell-count surface; K and G interrogate the raw points), i.e. the
same progression the reference's demo pipeline makes from per-cell
counts to per-object queries (DynamicOctree.hpp:146-171 range search
feeding aggregate summaries).

Estimators (naive / uncorrected — no edge correction; documented so
the DuckDB twin is a pure re-statement, not a approximation):

    K_hat(r) = area * pairs_le_r / (n * (n - 1))
    G_hat(r) = nn_le_r / n

where pairs_le_r counts ORDERED pairs i != j with dist(i,j) <= r and
nn_le_r counts points whose nearest neighbour lies within r. Both
counts are exact integers: candidate pairs come from ONE
distance-band self-join at r_max = max(radii) (the 9-cell ring-join
shape of operators/joins.distance_join — never all-pairs), dist² is
exact BIGINT arithmetic, and each radius threshold is the integer
comparison dist² <= r². For r <= r_max the band join is lossless for
BOTH statistics: every pair counted by K(r) has dist <= r <= r_max,
and if a point has any neighbour within r_max its true nearest
neighbour is also within r_max. The only floating-point is the one
fixed-order IEEE epilogue per row (integer→double conversion, one
multiply, one divide — each correctly rounded, so cross-engine
bit-equal, same argument as autocorr.getis_ord_gstar).

Scale shape: the self-join is the distance_join plan (single
(cell_x, cell_y) equi-shuffle, fan-out-guarded ring explode); the
per-radius fan-out is a broadcast nested-loop against a literal
len(radii)-row table, so downstream rows are at most |pairs| × |radii|
with |pairs| bounded by the density within r_max — cost never touches
n² at any scale.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from optimizing_spark.config import Box2
from optimizing_spark.operators.joins import distance_join


def point_pattern(
    points: DataFrame,
    radii: Sequence[int],
    world: Box2,
    depth: int | None = None,
    id_col: str = "point_id",
) -> DataFrame:
    """K_hat and G_hat at each radius in ``radii`` (ints, ascending not
    required). ``points`` needs columns (id_col, x, y). Returns one row
    per radius: (r, pairs_le_r, k_hat, nn_le_r, g_hat, n_points)."""
    radii = [int(r) for r in radii]
    rmax = max(radii)
    spark = points.sparkSession
    area = float(
        (world.max_x - world.min_x) * (world.max_y - world.min_y))

    pairs = distance_join(points, rmax, world, depth=depth,
                          id_col=id_col).localCheckpoint()
    nn = (
        pairs.select(F.col("id_a").alias("pid"), "dist2")
        .unionAll(pairs.select(F.col("id_b").alias("pid"), "dist2"))
        .groupBy("pid").agg(F.min("dist2").alias("nn_d2"))
    )
    rdf = spark.createDataFrame([(r,) for r in radii], "r long")
    # inner BNLJ against the broadcast literal radii (the big side
    # streams, never broadcasts), then recover zero-count radii by a
    # left join on the <= len(radii)-row aggregate
    pc = rdf.join(
        pairs.join(F.broadcast(rdf),
                   F.col("dist2") <= F.col("r") * F.col("r"))
        .groupBy("r")
        .agg((F.lit(2) * F.count(F.lit(1))).alias("_pc")),
        "r", "left",
    ).select("r", F.coalesce("_pc", F.lit(0)).cast("long")
             .alias("pairs_le_r"))
    gc = rdf.join(
        nn.join(F.broadcast(rdf),
                F.col("nn_d2") <= F.col("r") * F.col("r"))
        .groupBy("r").agg(F.count(F.lit(1)).alias("_gc")),
        "r", "left",
    ).select("r", F.coalesce("_gc", F.lit(0)).cast("long")
             .alias("nn_le_r"))
    n1 = points.agg(F.count("*").alias("n_points"))
    return (
        pc.join(gc, "r")
        .crossJoin(F.broadcast(n1))
        .select(
            "r",
            "pairs_le_r",
            ((F.col("pairs_le_r").cast("double") * F.lit(area))
             / (F.col("n_points")
                * (F.col("n_points") - F.lit(1))).cast("double"))
            .alias("k_hat"),
            "nn_le_r",
            (F.col("nn_le_r").cast("double")
             / F.col("n_points").cast("double")).alias("g_hat"),
            "n_points",
        )
        .orderBy("r")
    )


def point_pattern_sql(
    pts_sql: str,
    radii: Sequence[int],
    world: Box2,
    id_col: str = "point_id",
) -> str:
    """DuckDB twin: the same counts from an explicit band self-join
    (|dx|, |dy| <= r_max pre-filter + exact dist² predicate) and the
    identical fixed-order IEEE epilogue. LEFT JOIN + count(expr) keeps
    zero-count radii present, mirroring Spark's left broadcast join."""
    radii = [int(r) for r in radii]
    rmax = max(radii)
    area = float(
        (world.max_x - world.min_x) * (world.max_y - world.min_y))
    values = ", ".join(f"({r})" for r in radii)
    return f"""
        WITH pts AS (
            SELECT CAST({id_col} AS BIGINT) AS pid,
                   CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y
            FROM ({pts_sql}) base
        ),
        prs AS (
            SELECT a.pid AS ia, b.pid AS ib,
                   (a.x - b.x) * (a.x - b.x)
                   + (a.y - b.y) * (a.y - b.y) AS dist2
            FROM pts a JOIN pts b
              ON a.pid < b.pid
             AND abs(a.x - b.x) <= {rmax} AND abs(a.y - b.y) <= {rmax}
             AND (a.x - b.x) * (a.x - b.x)
                 + (a.y - b.y) * (a.y - b.y) <= {rmax * rmax}
        ),
        nn AS (
            SELECT pid, min(dist2) AS nn_d2 FROM (
                SELECT ia AS pid, dist2 FROM prs
                UNION ALL
                SELECT ib AS pid, dist2 FROM prs
            ) sym GROUP BY pid
        ),
        radii(r) AS (VALUES {values}),
        pc AS (
            SELECT r.r, 2 * count(p.dist2) AS pairs_le_r
            FROM radii r LEFT JOIN prs p ON p.dist2 <= r.r * r.r
            GROUP BY r.r
        ),
        gc AS (
            SELECT r.r, count(nn.nn_d2) AS nn_le_r
            FROM radii r LEFT JOIN nn ON nn.nn_d2 <= r.r * r.r
            GROUP BY r.r
        ),
        n1 AS (SELECT count(*) AS n_points FROM pts)
        SELECT CAST(pc.r AS BIGINT) AS r,
               CAST(pc.pairs_le_r AS BIGINT) AS pairs_le_r,
               (CAST(pc.pairs_le_r AS DOUBLE) * {area!r})
               / CAST(n1.n_points * (n1.n_points - 1) AS DOUBLE)
               AS k_hat,
               CAST(gc.nn_le_r AS BIGINT) AS nn_le_r,
               CAST(gc.nn_le_r AS DOUBLE)
               / CAST(n1.n_points AS DOUBLE) AS g_hat,
               CAST(n1.n_points AS BIGINT) AS n_points
        FROM pc JOIN gc ON pc.r = gc.r CROSS JOIN n1
        ORDER BY r
    """
