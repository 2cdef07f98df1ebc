"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the engine's operators (SURVEY.md §2) over spatial
tables derived deterministically from the driver parquet with
integer-exact arithmetic (optimizing_spark/sources/derived.py), so the
DuckDB ``oracle_sql()`` twins agree bit-for-bit: integer coordinates,
squared distances, integer-valued sums, power-of-two world.

Operator coverage map (reference file:line cites in the module docs):
- O6/O16 cell assign + counts  -> q_cell_counts
- O27 Morton encode            -> q_morton
- O8 static quadtree assign    -> q_qt_assign
- O1/O11 point-in-box join     -> q_pip_join
- O2/O10 range join            -> q_range_join
- O29 linear-scan control      -> q_linear_control
- O17/O22 kNN / neighbor ring  -> q_knn, q_ring_count, q_nearest
- O12 remove (anti-join)       -> q_remove
- O14 relocate (re-encode)     -> q_relocate
- O24 raster aggregation       -> q_raster
- O25 tone-map                 -> q_tonemap
- window top-k                 -> q_topk_per_cell
- partial aggregation          -> q_agg_wide
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from optimizing_spark.config import POW2_WORLD_2D, POW2_WORLD_EDGE
from optimizing_spark.functions import cells as C
from optimizing_spark.operators import joins as J
from optimizing_spark.sources import derived as D

E = POW2_WORLD_EDGE
_MAX_ND = 4  # deepest static-quadtree node (QT_MAX_DEPTH - 1)


# ---------------------------------------------------------------------------
# shared building blocks
# ---------------------------------------------------------------------------

def _qt_tiled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """objects2d + closed-form static-quadtree (qt_depth, qt_code)."""
    o = D.objects2d(spark, sf_dir)
    o = o.withColumn("qt_depth", D.qt_depth_col(_MAX_ND))
    m4 = C.morton2d(F.shiftright(F.col("ix"), 16 - _MAX_ND),
                    F.shiftright(F.col("iy"), 16 - _MAX_ND))
    o = o.withColumn("_m4", m4)
    code = F.lit(0).cast("long")
    for d in range(1, _MAX_ND + 1):
        code = F.when(F.col("qt_depth") == d,
                      F.shiftright(F.col("_m4"), 2 * (_MAX_ND - d))).otherwise(code)
    return o.withColumn("qt_code", code).drop("_m4")


_SQL_QT_TILED = f"""
    SELECT *,
           CASE qt_depth
                WHEN 4 THEN m4 WHEN 3 THEN m4 >> 2 WHEN 2 THEN m4 >> 4
                WHEN 1 THEN m4 >> 6 ELSE 0 END AS qt_code
    FROM (
        SELECT *,
               {D.qt_fits_depth_sql(_MAX_ND)} AS qt_depth,
               {D.morton2d_sql('ix >> 12', 'iy >> 12')} AS m4
        FROM objs
    )
"""


def _objects_boxes(spark, sf_dir):
    o = D.objects2d(spark, sf_dir)
    return o.select(
        "obj_id",
        F.col("ix").alias("min_x"), F.col("iy").alias("min_y"),
        (F.col("ix") + F.col("sx")).alias("max_x"),
        (F.col("iy") + F.col("sy")).alias("max_y"),
    )


def _query_boxes_named(spark, sf_dir):
    return D.query_boxes(spark, sf_dir).select(
        "query_id",
        F.col("q_min_x").alias("min_x"), F.col("q_min_y").alias("min_y"),
        F.col("q_max_x").alias("max_x"), F.col("q_max_y").alias("max_y"),
    )


# rect-convention overlap in SQL (asymmetric: q.min < o.max, q.max >= o.min;
# .Test/QuadTree.cpp:58-69)
_SQL_RANGE_PAIRS = f"""
    WITH objs AS ({D.SQL_OBJECTS}), qb AS ({D.SQL_QUERY_BOXES})
    SELECT qb.query_id, objs.obj_id
    FROM qb JOIN objs
      ON qb.q_min_x < objs.ix + objs.sx AND qb.q_max_x >= objs.ix
     AND qb.q_min_y < objs.iy + objs.sy AND qb.q_max_y >= objs.iy
"""


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_cell_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6+O16: per-cell row counts at the assigned quadtree node."""
    return _qt_tiled(spark, sf_dir).groupBy("qt_depth", "qt_code") \
        .agg(F.count("*").alias("n"))


def q_morton(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O27: full-resolution 2D Morton code per object."""
    o = D.objects2d(spark, sf_dir)
    return o.select("obj_id", C.morton2d(F.col("ix"), F.col("iy")).alias("m"))


def q_qt_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O8: static-quadtree node per object."""
    return _qt_tiled(spark, sf_dir).select("obj_id", "qt_depth", "qt_code")


def q_pip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O11: broadcast point-in-box join (closed intervals)."""
    p = D.points(spark, sf_dir).select(
        F.col("point_id"), F.col("px").alias("x"), F.col("py").alias("y"))
    b = _query_boxes_named(spark, sf_dir)
    out = J.pip_join(p, b, dims=2, closed=True)
    return out.select("query_id", "point_id")


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2/O10: cell-pruned spatial range join (reporting-cell dedup)."""
    o = _objects_boxes(spark, sf_dir)
    q = _query_boxes_named(spark, sf_dir)
    return J.range_join(o, q, POW2_WORLD_2D, depth=6, convention="rect") \
        .select("query_id", "obj_id")


def q_linear_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O29: un-pruned control — must equal q_range_join."""
    o = _objects_boxes(spark, sf_dir)
    q = _query_boxes_named(spark, sf_dir)
    return J.linear_scan(o, q, convention="rect").select("query_id", "obj_id")


def q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O17+O22: exact k=5 nearest objects per query (ring expansion +
    bound pass); squared integer distances, obj_id tiebreak."""
    o = D.objects2d(spark, sf_dir).select(
        "obj_id", F.col("ix").alias("x"), F.col("iy").alias("y"))
    q = D.knn_queries(spark, sf_dir).select(
        "query_id", F.col("qx").alias("x"), F.col("qy").alias("y"))
    return J.knn_join(q, o, POW2_WORLD_2D, depth=6, k=5)


def q_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O22: argmin join (nearest point per query)."""
    p = D.points(spark, sf_dir).select(
        F.col("point_id").alias("obj_id"), F.col("px").alias("x"), F.col("py").alias("y"))
    q = D.knn_queries(spark, sf_dir).select(
        "query_id", F.col("qx").alias("x"), F.col("qy").alias("y"))
    return J.nearest_hit_xy(q, p)


def q_ring_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O17: objects in the 3x3 cell ring around each query (depth-6 grid)."""
    o = D.objects2d(spark, sf_dir).select(
        "obj_id",
        F.shiftright(F.col("ix"), 10).cast("int").alias("cell_x"),
        F.shiftright(F.col("iy"), 10).cast("int").alias("cell_y"),
    )
    q = D.knn_queries(spark, sf_dir).select(
        "query_id", F.col("qx").alias("x"), F.col("qy").alias("y"))
    hits = J.ring_semi_join(o, q, POW2_WORLD_2D, depth=6, k=1)
    return hits.groupBy("query_id").agg(F.count("*").alias("n"))


def q_remove(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O12: anti-join removal of every 7th object."""
    o = D.objects2d(spark, sf_dir)
    dead = o.filter(F.col("obj_id") % 7 == 0).select("obj_id")
    from optimizing_spark.operators.tiling import remove_objects

    return remove_objects(o, dead).select("obj_id", "ix", "iy")


def q_relocate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O14: every 5th object shifts +3000 in x (mod world); re-encode
    cells only for moved rows; emit final assignment for all rows."""
    t = _qt_tiled(spark, sf_dir)
    keep = t.filter(F.col("obj_id") % 5 != 0)
    moved = t.filter(F.col("obj_id") % 5 == 0) \
        .withColumn("ix", (F.col("ix") + 3000) % E) \
        .drop("qt_depth", "qt_code", "m4", "_m4")
    # re-derive for moved rows only (incremental re-tile)
    moved = moved.withColumn("qt_depth", D.qt_depth_col(_MAX_ND))
    m4 = C.morton2d(F.shiftright(F.col("ix"), 16 - _MAX_ND),
                    F.shiftright(F.col("iy"), 16 - _MAX_ND))
    moved = moved.withColumn("_m4", m4)
    code = F.lit(0).cast("long")
    for d in range(1, _MAX_ND + 1):
        code = F.when(F.col("qt_depth") == d,
                      F.shiftright(F.col("_m4"), 2 * (_MAX_ND - d))).otherwise(code)
    moved = moved.withColumn("qt_code", code).drop("_m4")
    return keep.select("obj_id", "qt_depth", "qt_code").unionByName(
        moved.select("obj_id", "qt_depth", "qt_code"))


def q_raster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O24: raster-tile aggregation (128x128 tile grid): integer-exact
    sums + a single deterministic division for the mean."""
    o = D.objects2d(spark, sf_dir)
    t = o.groupBy(
        F.shiftright(F.col("ix"), 9).alias("tile_x"),
        F.shiftright(F.col("iy"), 9).alias("tile_y"),
    ).agg(
        F.sum("qty").alias("sum_qty"),
        F.count("*").alias("n"),
        F.sum("weight_c").alias("sum_w"),
    )
    return t.select(
        "tile_x", "tile_y", "sum_qty", "n",
        (F.col("sum_w").cast("double") / F.col("n")).alias("avg_weight_c"),
    )


def q_tonemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O25: clamp -> gamma 1/2.2 -> 255-scale -> floor(+0.5), the
    format_color_component chain (Raytracing.hpp:250-265), applied to
    tile mean weight normalized by the global max."""
    t = q_raster(spark, sf_dir)
    mx = t.agg(F.max("avg_weight_c")).collect()[0][0]
    v = F.col("avg_weight_c") / F.lit(float(mx))
    tone = F.floor(F.pow(F.least(F.greatest(v, F.lit(0.0)), F.lit(1.0)),
                         F.lit(1.0 / 2.2)) * 255 + 0.5).cast("long")
    return t.select("tile_x", "tile_y", tone.alias("tone"))


def q_topk_per_cell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window top-k: 3 heaviest objects per coarse cell (depth-4 grid)."""
    o = D.objects2d(spark, sf_dir).select(
        "obj_id", "weight_c",
        F.shiftright(F.col("ix"), 12).alias("cell_x"),
        F.shiftright(F.col("iy"), 12).alias("cell_y"),
    )
    w = Window.partitionBy("cell_x", "cell_y").orderBy(
        F.col("weight_c").desc(), F.col("obj_id"))
    return o.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 3) \
        .select("cell_x", "cell_y", "obj_id", "weight_c", "rk")


def q_agg_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-aggregation sanity (TPC-H Q1 shape, integer-exact sums)."""
    li = D.load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("sum_price_c"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: tile + range join + per-query hit counts at sf0.001."""
    sf = "/root/testdata/sf0.001"
    o = _objects_boxes(spark, sf)
    q = _query_boxes_named(spark, sf)
    hits = J.range_join(o, q, POW2_WORLD_2D, depth=6, convention="rect")
    return hits.groupBy("query_id").agg(F.count("*").alias("n"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q_cell_counts": q_cell_counts,
        "q_morton": q_morton,
        "q_qt_assign": q_qt_assign,
        "q_pip_join": q_pip_join,
        "q_range_join": q_range_join,
        "q_linear_control": q_linear_control,
        "q_knn": q_knn,
        "q_nearest": q_nearest,
        "q_ring_count": q_ring_count,
        "q_remove": q_remove,
        "q_relocate": q_relocate,
        "q_raster": q_raster,
        "q_tonemap": q_tonemap,
        "q_topk_per_cell": q_topk_per_cell,
        "q_agg_wide": q_agg_wide,
    }


def oracle_sql() -> dict[str, str]:
    objs = D.SQL_OBJECTS
    qb = D.SQL_QUERY_BOXES
    pts = D.SQL_POINTS
    knnq = D.SQL_KNN_QUERIES
    tiled = f"WITH objs AS ({objs}), tiled AS ({_SQL_QT_TILED})"

    return {
        "q_cell_counts": f"""
            {tiled}
            SELECT qt_depth, qt_code, count(*) AS n FROM tiled
            GROUP BY qt_depth, qt_code
        """,
        "q_morton": f"""
            WITH objs AS ({objs})
            SELECT obj_id, {D.morton2d_sql('ix', 'iy')} AS m FROM objs
        """,
        "q_qt_assign": f"""
            {tiled}
            SELECT obj_id, qt_depth, qt_code FROM tiled
        """,
        "q_pip_join": f"""
            WITH pts AS ({pts}), qb AS ({qb})
            SELECT qb.query_id, pts.point_id
            FROM qb JOIN pts
              ON pts.px >= qb.q_min_x AND pts.px <= qb.q_max_x
             AND pts.py >= qb.q_min_y AND pts.py <= qb.q_max_y
        """,
        "q_range_join": _SQL_RANGE_PAIRS,
        "q_linear_control": _SQL_RANGE_PAIRS,
        "q_knn": f"""
            WITH objs AS ({objs}), kq AS ({knnq}), d AS (
                SELECT kq.query_id, objs.obj_id,
                       (objs.ix - kq.qx) * (objs.ix - kq.qx)
                       + (objs.iy - kq.qy) * (objs.iy - kq.qy) AS d2
                FROM kq CROSS JOIN objs
            ), r AS (
                SELECT *, row_number() OVER (PARTITION BY query_id
                                             ORDER BY d2, obj_id) AS rank
                FROM d
            )
            SELECT query_id, obj_id, d2, CAST(rank AS INTEGER) AS rank
            FROM r WHERE rank <= 5
        """,
        "q_nearest": f"""
            WITH pts AS ({pts}), kq AS ({knnq}), d AS (
                SELECT kq.query_id, pts.point_id AS obj_id,
                       (pts.px - kq.qx) * (pts.px - kq.qx)
                       + (pts.py - kq.qy) * (pts.py - kq.qy) AS d2
                FROM kq CROSS JOIN pts
            ), r AS (
                SELECT *, row_number() OVER (PARTITION BY query_id
                                             ORDER BY d2, obj_id) AS rk
                FROM d
            )
            SELECT query_id, obj_id, d2 FROM r WHERE rk = 1
        """,
        "q_ring_count": f"""
            WITH objs AS ({objs}), kq AS ({knnq})
            SELECT kq.query_id, count(*) AS n
            FROM kq JOIN objs
              ON abs((objs.ix >> 10) - (kq.qx >> 10)) <= 1
             AND abs((objs.iy >> 10) - (kq.qy >> 10)) <= 1
            GROUP BY kq.query_id
        """,
        "q_remove": f"""
            WITH objs AS ({objs})
            SELECT obj_id, ix, iy FROM objs WHERE obj_id % 7 <> 0
        """,
        "q_relocate": f"""
            WITH objs0 AS ({objs}), objs AS (
                SELECT obj_id,
                       CASE WHEN obj_id % 5 = 0 THEN (ix + 3000) % {E} ELSE ix END AS ix,
                       iy, sx, sy, weight_c, qty
                FROM objs0
            ), tiled AS ({_SQL_QT_TILED})
            SELECT obj_id, qt_depth, qt_code FROM tiled
        """,
        "q_raster": f"""
            WITH objs AS ({objs})
            SELECT ix >> 9 AS tile_x, iy >> 9 AS tile_y,
                   sum(qty) AS sum_qty, count(*) AS n,
                   CAST(sum(weight_c) AS DOUBLE) / count(*) AS avg_weight_c
            FROM objs GROUP BY tile_x, tile_y
        """,
        "q_tonemap": f"""
            WITH objs AS ({objs}), t AS (
                SELECT ix >> 9 AS tile_x, iy >> 9 AS tile_y,
                       CAST(sum(weight_c) AS DOUBLE) / count(*) AS avg_weight_c
                FROM objs GROUP BY tile_x, tile_y
            ), mx AS (SELECT max(avg_weight_c) AS m FROM t)
            SELECT tile_x, tile_y,
                   CAST(floor(pow(least(greatest(avg_weight_c / mx.m, 0.0), 1.0),
                                  1.0 / 2.2) * 255 + 0.5) AS BIGINT) AS tone
            FROM t, mx
        """,
        "q_topk_per_cell": f"""
            WITH objs AS ({objs}), r AS (
                SELECT ix >> 12 AS cell_x, iy >> 12 AS cell_y, obj_id, weight_c,
                       row_number() OVER (PARTITION BY ix >> 12, iy >> 12
                                          ORDER BY weight_c DESC, obj_id) AS rk
                FROM objs
            )
            SELECT cell_x, cell_y, obj_id, weight_c, CAST(rk AS INTEGER) AS rk
            FROM r WHERE rk <= 3
        """,
        "q_agg_wide": """
            SELECT l_returnflag, l_linestatus,
                   sum(CAST(l_quantity AS BIGINT)) AS sum_qty,
                   sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sum_price_c,
                   count(*) AS n
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
    }
