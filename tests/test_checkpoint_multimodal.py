"""Checkpoint/lineage/resume + multimodal plumbing tests."""

import json
import os

from pyspark.sql import functions as F

from optimizing_spark.operators import multimodal as MM
from optimizing_spark.plans import checkpoint as CP
from optimizing_spark.plans import pipeline
from optimizing_spark.sources import datagen


def test_checkpoint_and_resume(spark, tmp_path):
    root = str(tmp_path / "ckpt")
    docs = datagen.spark_table(spark, "documents", 500, partitions=4)
    tiled = pipeline.tile_documents(docs, how="jvm")

    r1 = CP.checkpoint_stage(spark, tiled, root, "tiled",
                             partition_by=["qt_depth"], fingerprint="v1")
    assert not r1.resumed and r1.rows == 500 and r1.bytes > 0
    assert len(r1.partitions) >= 2  # partitioned layout with stats
    m = CP.load_manifest(root, "tiled")
    assert m["rows"] == 500 and m["stage"] == "tiled"

    # resume: same fingerprint -> no recompute, stats from manifest
    r2 = CP.checkpoint_stage(spark, tiled, root, "tiled",
                             partition_by=["qt_depth"], fingerprint="v1")
    assert r2.resumed and r2.rows == 500

    # changed fingerprint -> recompute
    r3 = CP.checkpoint_stage(spark, tiled, root, "tiled",
                             partition_by=["qt_depth"], fingerprint="v2")
    assert not r3.resumed

    # corrupt manifest -> recompute instead of blind resume
    with open(os.path.join(root, "tiled", CP.MANIFEST), "w") as f:
        f.write("{not json")
    r4 = CP.checkpoint_stage(spark, tiled, root, "tiled", fingerprint="v2")
    assert not r4.resumed

    back = CP.read_stage(spark, root, "tiled")
    assert back.count() == 500
    # lineage chaining
    fp = CP.stage_fingerprint(root, "tiled")
    hist = pipeline.docs_cell_histogram(back)
    r5 = CP.checkpoint_stage(spark, hist, root, "hist", inputs=[fp], fingerprint="v1")
    assert r5.inputs == [fp]


def test_checkpoint_crash_mid_overwrite_cannot_resume(spark, tmp_path):
    """The stale manifest must be invalidated BEFORE the data overwrite
    starts: a crash mid-write then must recompute, never 'resume' from
    partially-rewritten parquet under the old manifest."""
    root = str(tmp_path / "ckpt2")
    docs = datagen.spark_table(spark, "documents", 200, partitions=2)
    tiled = pipeline.tile_documents(docs, how="jvm")
    CP.checkpoint_stage(spark, tiled, root, "t", fingerprint="v1")
    assert CP.load_manifest(root, "t") is not None

    # simulate a crash: writer raises after checkpoint_stage has begun
    class Boom(RuntimeError):
        pass

    bad = tiled.withColumn("_x", F.expr("raise_error('boom')"))
    try:  # new fingerprint -> takes the overwrite path, then crashes
        CP.checkpoint_stage(spark, bad, root, "t", fingerprint="v2")
    except Exception:  # noqa: BLE001 (Py4J wraps the raise_error)
        pass
    # old manifest is gone -> a later run with the original fingerprint
    # recomputes instead of silently resuming from corrupt data
    assert CP.load_manifest(root, "t") is None
    r = CP.checkpoint_stage(spark, tiled, root, "t", fingerprint="v1")
    assert not r.resumed and r.rows == 200


def test_media_features_and_frames(spark):
    docs = datagen.spark_table(spark, "documents", 300, partitions=3)
    media = MM.synthetic_media(spark, docs).localCheckpoint()
    n = media.count()
    assert n > 0
    assert media.filter(F.col("payload").isNull()).count() == 0

    feats = MM.extract_features(media).localCheckpoint()
    assert feats.count() == n
    pdf = feats.toPandas()
    assert pdf.mean_px.between(0, 255).all()
    assert (pdf.phash >= 0).all()
    # determinism: same refs -> same features
    feats2 = MM.extract_features(media)
    joined = feats.select("media_ref", "phash").join(
        feats2.select("media_ref", F.col("phash").alias("p2")), "media_ref")
    assert joined.filter(F.col("phash") != F.col("p2")).count() == 0

    frames = MM.sample_frames(media, every_ms=1000, max_frames=8)
    fp = frames.toPandas()
    if len(fp):
        assert (fp.frame_ts_ms == fp.frame_idx * 1000).all()
        assert fp.groupby("media_ref").frame_idx.max().max() <= 7
