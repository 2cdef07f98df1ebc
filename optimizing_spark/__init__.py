"""optimizing_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch re-expression of the query semantics of the reference
spatial-index project (quadtree/octree world partitioner, see SURVEY.md)
as distributed DataFrame transforms:

- hierarchical Morton/Z-order cell index (quadtree depth ≈ H3 resolution,
  octree z-levels ≈ S2 level column)  -> functions.cells
- AABB predicates (closed 3D / half-open 2D conventions of the reference)
  -> functions.geometry
- point-in-polygon broadcast joins, spatial range joins, cell-local kNN
  via neighbor-ring expansion, nearest-hit argmin -> operators.joins
- capacity-gated adaptive refinement (reference max-objects-per-node rule
  as max-rows-per-cell before resolution refinement) -> operators.tiling
- raster-tile <-> vector aggregation (ray-AABB/sphere, per-pixel mean,
  tone-map) -> operators.raster
- training-data pipeline ops: dedup (exact / minhash-LSH / simhash /
  n-gram jaccard / embedding cosine), ANN similarity search, text
  analysis, multimodal binary plumbing -> operators.dedup/similarity/
  multimodal, functions.text/vectors
- checkpoint/lineage manifests with resume -> plans.checkpoint
- structured-streaming cell lifecycle -> streaming

Everything is pyspark.sql DataFrame + vectorized Arrow/pandas UDFs; no
RDDs, no per-row Python UDFs in hot paths.
"""

__version__ = "0.1.0"
