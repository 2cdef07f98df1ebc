"""North-rule pipeline over interleaved documents: span-sequence
invariant, geocode determinism/partition-invariance, tiling + skew."""

import pandas as pd
from pyspark.sql import functions as F

from optimizing_spark.functions.geocode import geocode
from optimizing_spark.plans import pipeline
from optimizing_spark.sources import datagen

N = 1000


def _docs(spark, n=N, parts=5):
    return datagen.spark_table(spark, "documents", n, partitions=parts)


def test_span_sequence_invariant(spark):
    """(kind, text, media_ref, order) preserved bit-for-bit through
    geocode -> tile -> join (input_hint invariant)."""
    docs = _docs(spark)
    tiled = pipeline.tile_documents(docs, how="jvm")
    boxes = spark.createDataFrame(pd.DataFrame({
        "query_id": [0], "min_x": [0], "min_y": [0],
        "max_x": [1 << 16], "max_y": [1 << 16]}))
    joined = pipeline.docs_range_query(tiled, boxes)

    inp = docs.select("doc_id", "spans").toPandas().set_index("doc_id").spans
    out = joined.select("doc_id", "spans").toPandas().set_index("doc_id").spans
    assert len(out) == N
    def tup(s):
        if isinstance(s, dict):
            return (s["kind"], s["text"], s["media_ref"], s["offset"])
        return (s.kind, s.text, s.media_ref, s.offset)

    for doc_id, spans in out.items():
        got = [tup(s) for s in spans]
        exp = [tup(s) for s in inp[doc_id]]
        assert got == exp, f"span sequence broken for {doc_id}"


def test_geocode_deterministic_and_partition_invariant(spark):
    a = geocode(_docs(spark, parts=1), how="jvm") \
        .select("doc_id", "ix", "iy", "sx", "sy").toPandas().sort_values("doc_id")
    b = geocode(_docs(spark, parts=11), how="jvm") \
        .select("doc_id", "ix", "iy", "sx", "sy").toPandas().sort_values("doc_id")
    assert (a.to_numpy() == b.to_numpy()).all()
    assert a.ix.between(0, (1 << 16) - 1).all()
    assert a.sx.between(1, 97).all()


def test_geocode_arrow_matches_own_rerun(spark):
    """Arrow geocoder: deterministic, valid ranges, same schema as jvm."""
    a = geocode(_docs(spark, parts=3), how="arrow") \
        .select("doc_id", "ix", "iy", "sx", "sy").toPandas().sort_values("doc_id")
    b = geocode(_docs(spark, parts=7), how="arrow") \
        .select("doc_id", "ix", "iy", "sx", "sy").toPandas().sort_values("doc_id")
    assert (a.to_numpy() == b.to_numpy()).all()
    assert a.ix.between(0, (1 << 16) - 1).all()
    jvm_cols = geocode(_docs(spark, parts=2), how="jvm").columns
    assert sorted(jvm_cols) == sorted(b.columns.tolist() + ["spans"])


def test_geocode_sensitive_to_span_order(spark):
    """Swapping two spans must change the geocode (order is load-bearing)."""
    docs = _docs(spark, n=200).filter(F.size("spans") >= 2)
    swapped = docs.withColumn(
        "spans",
        F.concat(
            F.array(F.col("spans")[1], F.col("spans")[0]),
            F.slice("spans", 3, 1000),
        ),
    )
    a = geocode(docs, how="jvm").select("doc_id", "ix", "iy")
    b = geocode(swapped, how="jvm").select(
        "doc_id", F.col("ix").alias("jx"), F.col("iy").alias("jy"))
    j = a.join(b, "doc_id").filter((F.col("ix") == F.col("jx")) & (F.col("iy") == F.col("jy")))
    assert j.count() == 0


def test_tile_and_refine_hot_cells(spark):
    tiled = pipeline.tile_documents(_docs(spark, n=2000), how="jvm").localCheckpoint()
    hist = pipeline.docs_cell_histogram(tiled).toPandas()
    assert hist.n_docs.sum() == 2000
    refined = pipeline.refine_hot_cells(tiled, max_rows_per_cell=5, salt_buckets=8)
    pdf = refined.select("qt_depth", "qt_code", "hot", "salt").toPandas()
    counts = pdf.groupby(["qt_depth", "qt_code"]).size()
    hot_cells = set(counts[counts > 5].index)
    got_hot = set(map(tuple, pdf[pdf.hot][["qt_depth", "qt_code"]].drop_duplicates().to_numpy()))
    assert got_hot == hot_cells
    assert (pdf[~pdf.hot].salt == 0).all()
    assert pdf[pdf.hot].salt.between(0, 7).all()
