"""Multimodal columns: image/audio/video payloads as opaque binary with
typed metadata, processed via Arrow-batched mapInPandas.

The decode step is STUBBED (no image/audio libs in this container —
clearly marked below); everything Spark-side is real and tested:
schemas, batching, partitioning, deterministic fake feature extraction,
and the frame-sampling plumbing. Swapping `_decode_image_stub` for a
Pillow/ffmpeg call changes one function body.

Data model: media_ref strings in document spans resolve to rows of a
`media` table (media_ref, kind, payload binary, meta struct). The
synthetic payload generator derives bytes from the ref hash so tests
are deterministic.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_ref", T.StringType()),
    T.StructField("kind", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ])),
])


def synthetic_media(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """One media row per media span: deterministic fake payload bytes
    (md5-chain of the ref) + typed metadata derived from the ref hash."""
    refs = docs.select(
        F.explode("spans").alias("s")
    ).filter(F.col("s.kind") != "text").select(
        F.col("s.media_ref").alias("media_ref"), F.col("s.kind").alias("kind")
    ).distinct()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            payloads, metas = [], []
            for ref in b["media_ref"]:
                seedb = hashlib.md5(ref.encode()).digest()
                payloads.append((seedb * 8)[:128])
                h = int.from_bytes(seedb[:4], "big")
                metas.append({
                    "width": 16 + h % 256,
                    "height": 16 + (h >> 8) % 256,
                    "duration_ms": (h >> 4) % 60000,
                })
            yield pd.DataFrame({
                "media_ref": b["media_ref"],
                "kind": b["kind"],
                "payload": payloads,
                "meta": metas,
            })

    return refs.mapInPandas(gen, MEDIA_SCHEMA)


def _decode_image_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decode — deterministic fake pixel grid from the payload.

    Production: `PIL.Image.open(io.BytesIO(payload))`. No imaging libs
    exist in this container; raise if someone expects real decoding.
    """
    if payload[:4] in (b"\x89PNG", b"\xff\xd8\xff\xe0"):
        raise NotImplementedError("real image decode not available in this sandbox")
    h = zlib.crc32(payload)
    rng = np.arange(width * height, dtype=np.uint32)
    return ((rng * 2654435761 + h) % 256).astype(np.uint8).reshape(height, width)


FEATURES_SCHEMA = T.StructType([
    T.StructField("media_ref", T.StringType()),
    T.StructField("kind", T.StringType()),
    T.StructField("mean_px", T.DoubleType()),
    T.StructField("std_px", T.DoubleType()),
    T.StructField("phash", T.LongType()),
])


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads: decode
    (stub) -> mean/std pixel + an 8x8-DCT-free perceptual-hash-style
    bit signature (mean-threshold on an 8x8 downsample)."""

    def fx(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples():
                meta = r.meta
                w = int(meta["width"]) if isinstance(meta, dict) else int(meta.width)
                h = int(meta["height"]) if isinstance(meta, dict) else int(meta.height)
                img = _decode_image_stub(bytes(r.payload), w, h)
                small = img[:: max(1, h // 8), :: max(1, w // 8)][:8, :8]
                bits = (small >= small.mean()).flatten()
                phash = 0
                for i, v in enumerate(bits[:63]):
                    phash |= int(v) << i
                rows.append({
                    "media_ref": r.media_ref,
                    "kind": r.kind,
                    "mean_px": float(img.mean()),
                    "std_px": float(img.std()),
                    "phash": phash,
                })
            yield pd.DataFrame(rows)

    return media.mapInPandas(fx, FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000, max_frames: int = 32) -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per
    sampled timestamp (JVM-side explode; the decode of each frame would
    plug into extract_features)."""
    v = media.filter(F.col("kind") == "video")
    n_frames = F.least(
        F.lit(max_frames),
        F.greatest(F.lit(1), (F.col("meta.duration_ms") / every_ms).cast("int")),
    )
    return v.withColumn(
        "frame_idx", F.explode(F.sequence(F.lit(0), n_frames - 1))
    ).withColumn("frame_ts_ms", F.col("frame_idx") * every_ms) \
        .select("media_ref", "frame_idx", "frame_ts_ms", "meta")
