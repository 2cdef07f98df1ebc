"""The north-rule document pipeline: interleaved docs -> geocode ->
cell tiling -> spatial joins -> per-cell aggregates, with the span
payload carried opaque end to end.

This is the E1 flow of the reference (generate -> world-partition
insert -> per-frame ring load + viewport search, SURVEY.md §3)
re-expressed over the input_hint document table:

    docs(doc_id, spans) --geocode--> +(ix, iy, sx, sy)
        --assign_quadtree_pow2--> +(qt_depth, qt_code)
        --repartition(qt prefix)--> cell-clustered table
        --joins / aggregates--> results

All stages are narrow projections except the final repartition (one
shuffle) and whatever join the caller runs. Skew handling: cells whose
row count exceeds max_rows_per_cell are re-encoded one level deeper
(adaptive refinement, the reference's capacity rule at cluster scale) —
and the residual hot cells get a salt column for downstream joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import POW2_WORLD_BITS
from ..functions import cells as C
from ..functions.geocode import geocode


def tile_documents(
    docs: DataFrame,
    how: str = "jvm",
    max_node_depth: int = 4,
    coarse_prefix_depth: int = 2,
    repartition_to: int | None = None,
) -> DataFrame:
    """docs(doc_id, spans) -> + geocode + quadtree cell columns,
    clustered by coarse cell prefix (the WorldPartition two-level
    design: hash-partition by coarse cell, order by Morton within)."""
    g = geocode(docs, how=how)
    t = C.assign_quadtree_pow2(g, max_node_depth=max_node_depth)
    t = t.withColumn(
        "cell_prefix",
        C.prefix_at_depth(F.col("qt_code"), F.col("qt_depth"),
                          F.least(F.col("qt_depth"), F.lit(coarse_prefix_depth))),
    )
    if repartition_to:
        t = t.repartition(repartition_to, "cell_prefix")
    return t


def refine_hot_cells(
    tiled: DataFrame,
    max_rows_per_cell: int,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew handling (north_star: 'max-objects-per-node -> max-rows-per-
    cell before resolution refinement'): count rows per (qt_depth,
    qt_code); rows in cells over the threshold get a salt column for
    salted repartition/joins; others salt 0. Returns tiled + (hot,
    salt). The deeper-re-encode path is tile_octree_capacity for exact
    reference semantics; here hotness is resolved by salting because
    static-quadtree cell identity must be preserved."""
    counts = tiled.groupBy("qt_depth", "qt_code").agg(F.count("*").alias("_cnt"))
    out = tiled.join(F.broadcast(counts.filter(F.col("_cnt") > max_rows_per_cell)),
                     ["qt_depth", "qt_code"], "left")
    return (
        out.withColumn("hot", F.col("_cnt").isNotNull())
        .withColumn(
            "salt",
            F.when(F.col("hot"),
                   F.pmod(F.xxhash64("doc_id"), F.lit(salt_buckets))).otherwise(F.lit(0)),
        )
        .drop("_cnt")
    )


def docs_cell_histogram(tiled: DataFrame) -> DataFrame:
    return tiled.groupBy("qt_depth", "qt_code").agg(F.count("*").alias("n_docs"))


def docs_range_query(tiled: DataFrame, boxes: DataFrame) -> DataFrame:
    """Viewport search over geocoded docs: broadcast point-in-box join
    on the doc anchor point (ix, iy) — the E1 draw loop."""
    pred = (
        (F.col("ix") >= F.col("min_x")) & (F.col("ix") <= F.col("max_x"))
        & (F.col("iy") >= F.col("min_y")) & (F.col("iy") <= F.col("max_y"))
    )
    return tiled.join(F.broadcast(boxes), pred)
