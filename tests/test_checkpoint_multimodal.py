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


def _encode_bmp_24(img):
    """Minimal test-side 24-bit BI_RGB BMP encoder (bottom-up, padded
    rows) so the engine's decoder is validated against an independent
    byte layout, not its own inverse."""
    import numpy as np
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w, _ = img.shape
    row_bytes = (w * 3 + 3) // 4 * 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = img[y, :, ::-1].astype(np.uint8).tobytes()  # BGR
        body += row + b"\x00" * (row_bytes - len(row))
    data_off = 14 + 40
    size = data_off + len(body)
    hdr = (b"BM" + size.to_bytes(4, "little") + b"\x00\x00\x00\x00"
           + data_off.to_bytes(4, "little")
           + (40).to_bytes(4, "little")
           + w.to_bytes(4, "little") + h.to_bytes(4, "little")
           + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
           + (0).to_bytes(4, "little") + len(body).to_bytes(4, "little")
           + (2835).to_bytes(4, "little") * 2
           + (0).to_bytes(4, "little") * 2)
    return bytes(hdr) + bytes(body)


def test_ppm_bmp_real_decode_roundtrip():
    import numpy as np
    rng = (np.arange(19 * 23, dtype=np.uint32) * 2654435761 % 256) \
        .astype(np.uint8).reshape(23, 19)  # odd width exercises padding
    # PPM roundtrip: gray-replicated RGB -> luminance is exact
    assert (MM.decode_ppm(MM.encode_ppm(rng)) == rng).all()
    # PPM with comments + RGB: luminance = integer mean
    rgb = np.stack([rng, (rng + 3) % 256, (rng + 7) % 256], axis=2)
    ppm = MM.encode_ppm(rgb)
    ppm_c = b"P6\n# a comment\n19 23\n255\n" + ppm.split(b"255\n", 1)[1]
    want = (rgb.astype(np.uint16).sum(axis=2) // 3).astype(np.uint8)
    assert (MM.decode_ppm(ppm_c) == want).all()
    # BMP roundtrip against the independent test encoder
    assert (MM.decode_bmp(_encode_bmp_24(rng)) == rng).all()
    assert (MM.decode_bmp(_encode_bmp_24(rgb)) == want).all()
    # round 5: JPEG now decodes for real (tests/test_jpeg.py); a
    # truncated/garbage JPEG payload still refuses loudly
    import pytest as _pytest
    with _pytest.raises(ValueError):
        MM.decode_image(b"\xff\xd8\xff\xe0....", 4, 4)


def test_png_real_decode_roundtrip():
    """Pure-NumPy PNG codec: encode->decode is exact for gray and RGB
    with BOTH filter strategies ('cycle' hits every RFC 2083 unfilter
    branch: None/Sub/Up/Average/Paeth); RGBA and gray+alpha payloads
    built chunk-by-chunk (independent of the encoder) decode to the
    color-channel luminance with alpha ignored."""
    import struct
    import zlib as _zlib

    import numpy as np
    import pytest as _pytest

    rng = (np.arange(19 * 23, dtype=np.uint32) * 2654435761 % 256) \
        .astype(np.uint8).reshape(23, 19)
    rgb = np.stack([rng, (rng + 3) % 256, (rng + 7) % 256], axis=2)
    want = (rgb.astype(np.uint16).sum(axis=2) // 3).astype(np.uint8)
    for filt in ("none", "cycle"):
        assert (MM.decode_png(MM.encode_png(rng, filters=filt)) == rng).all()
        assert (MM.decode_png(MM.encode_png(rgb, filters=filt)) == want).all()
    # gradient image: Sub/Up/Paeth rows actually change the bytes
    g = np.add.outer(np.arange(50), np.arange(40)).astype(np.uint8)
    assert (MM.decode_png(MM.encode_png(g)) == g).all()

    def _chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", _zlib.crc32(typ + data)))

    def _manual_png(px, colortype):
        h, w, c = px.shape
        raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
        ihdr = struct.pack(">II", w, h) + bytes([8, colortype, 0, 0, 0])
        return (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
                + _chunk(b"IDAT", _zlib.compress(raw))
                + _chunk(b"IEND", b""))

    alpha = ((rng.astype(np.uint16) * 3) % 256).astype(np.uint8)
    rgba = np.concatenate([rgb, alpha[:, :, None]], axis=2).astype(np.uint8)
    assert (MM.decode_png(_manual_png(rgba, 6)) == want).all()
    ga = np.stack([rng, alpha], axis=2)
    assert (MM.decode_png(_manual_png(ga, 4)) == rng).all()
    # unsupported variants refuse loudly: 16-bit and palette
    ihdr16 = struct.pack(">II", 4, 4) + bytes([16, 0, 0, 0, 0])
    bad = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr16)
           + _chunk(b"IDAT", _zlib.compress(b"\x00" * 36))
           + _chunk(b"IEND", b""))
    with _pytest.raises(NotImplementedError):
        MM.decode_png(bad)


def test_media_features_real_ppm_payloads_end_to_end(spark):
    """The feature pipeline decodes REAL image bytes: PPM payloads
    whose pixels equal the deterministic grid must produce features
    identical to the opaque-payload path, through the same Arrow
    mapInPandas plumbing."""
    from optimizing_spark.sources import datagen

    docs = datagen.documents_spark_fast(spark, 120, partitions=3) \
        .select("doc_id", "spans").localCheckpoint()
    raw = MM.synthetic_media(spark, docs).localCheckpoint()
    ppm = MM.synthetic_media(spark, docs, fmt="ppm").localCheckpoint()
    assert ppm.count() == raw.count() > 0
    head = ppm.select("payload").first().payload
    assert bytes(head[:2]) == b"P6"  # genuinely real image bytes
    fa = {r.media_ref: (r.mean_px, r.std_px, r.phash)
          for r in MM.extract_features(raw).collect()}
    fb = {r.media_ref: (r.mean_px, r.std_px, r.phash)
          for r in MM.extract_features(ppm).collect()}
    assert fa == fb


def test_media_features_real_png_payloads_end_to_end(spark):
    """Round 5: the feature pipeline decodes real COMPRESSED bytes —
    zlib-deflated PNG payloads (cycling all five scanline filters)
    must produce features identical to the opaque-payload path,
    through the same Arrow mapInPandas plumbing."""
    from optimizing_spark.sources import datagen

    docs = datagen.documents_spark_fast(spark, 120, partitions=3) \
        .select("doc_id", "spans").localCheckpoint()
    raw = MM.synthetic_media(spark, docs).localCheckpoint()
    png = MM.synthetic_media(spark, docs, fmt="png").localCheckpoint()
    assert png.count() == raw.count() > 0
    head = png.select("payload").first().payload
    assert bytes(head[:8]) == b"\x89PNG\r\n\x1a\n"  # real PNG bytes
    fa = {r.media_ref: (r.mean_px, r.std_px, r.phash)
          for r in MM.extract_features(raw).collect()}
    fb = {r.media_ref: (r.mean_px, r.std_px, r.phash)
          for r in MM.extract_features(png).collect()}
    assert fa == fb
