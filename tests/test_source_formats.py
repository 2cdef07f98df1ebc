"""Source-format breadth: the docs pipeline is format-agnostic.

The engine's operators consume DataFrames, so any Spark source that
reproduces the input_hint schema feeds the same plans. This pins that
claim: the same documents written as parquet, ORC, and JSON tile to
IDENTICAL (doc_id, qt_depth, qt_code) assignments — format changes
the scan node only, never results. (JSON needs an explicit schema:
inference would widen offset to long and lose the struct order.)
"""

import pytest
from pyspark.sql import functions as F

from optimizing_spark.functions import cells as C
from optimizing_spark.functions.geocode import geocode
from optimizing_spark.sources import datagen


@pytest.fixture(scope="module")
def format_dirs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("fmt")
    docs = datagen.spark_table(spark, "documents", 500, partitions=3)
    paths = {}
    for fmt in ("parquet", "orc", "json"):
        p = str(base / fmt)
        docs.write.format(fmt).save(p)
        paths[fmt] = p
    return paths


def _tile(spark, fmt, path):
    reader = spark.read.format(fmt)
    if fmt == "json":
        reader = reader.schema(datagen.DOCS_SCHEMA)
    df = reader.load(path)
    return (
        C.assign_quadtree_pow2(geocode(df, how="jvm"))
        .select("doc_id", "qt_depth", "qt_code")
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )


def test_docs_pipeline_identical_across_formats(spark, format_dirs):
    ref = _tile(spark, "parquet", format_dirs["parquet"])
    assert len(ref) == 500
    for fmt in ("orc", "json"):
        got = _tile(spark, fmt, format_dirs[fmt])
        assert (got.doc_id.to_numpy() == ref.doc_id.to_numpy()).all(), fmt
        assert (got.qt_code.to_numpy() == ref.qt_code.to_numpy()).all(), fmt
        assert (got.qt_depth.to_numpy() == ref.qt_depth.to_numpy()).all(), fmt
