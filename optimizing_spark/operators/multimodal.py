"""Multimodal columns: image/audio/video payloads as opaque binary with
typed metadata, processed via Arrow-batched mapInPandas.

Decoding: REAL pure-NumPy decoders for binary PPM (P6), 24-bit BI_RGB
BMP (round 4), non-interlaced 8-bit PNG via stdlib zlib, and — round 5
— baseline sequential JPEG (operators/jpeg.py: T.81 Huffman entropy
decode, dequantize, vectorized IDCT, 4:4:4/4:2:0 chroma, restart
markers). Every format the synthetic pipeline emits decodes for real;
only progressive/arithmetic JPEG variants remain behind a loud
NotImplementedError. Everything Spark-side is real and tested:
schemas, batching, partitioning, feature extraction, and the
frame-sampling plumbing.

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


def synthetic_media(spark: SparkSession, docs: DataFrame,
                    fmt: str = "raw") -> DataFrame:
    """One media row per media span: deterministic payload bytes
    (md5-chain of the ref) + typed metadata derived from the ref hash.

    fmt='raw' (legacy): 128 opaque bytes, decoded by the deterministic
    fake grid. fmt='ppm': a REAL binary PPM (P6) whose pixels ARE that
    same grid; fmt='png': the same grid zlib-compressed into a real
    non-interlaced 8-bit PNG (cycling the full filter set) — so the
    feature pipeline decodes real (compressed) image bytes end-to-end
    and must produce identical features to the raw path. fmt='jpeg':
    the grid as a REAL baseline grayscale JPEG (quality 95) — decode
    is lossy by spec, so features are close-but-not-equal to the raw
    path (the DC/mean is preserved to quantization error)."""
    if fmt not in ("raw", "ppm", "png", "jpeg"):
        raise ValueError(f"unknown media fmt {fmt!r}")
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
                raw = (seedb * 8)[:128]
                h = int.from_bytes(seedb[:4], "big")
                w_px = 16 + h % 256
                h_px = 16 + (h >> 8) % 256
                if fmt == "ppm":
                    payloads.append(
                        encode_ppm(_decode_image_stub(raw, w_px, h_px)))
                elif fmt == "png":
                    payloads.append(
                        encode_png(_decode_image_stub(raw, w_px, h_px)))
                elif fmt == "jpeg":
                    from optimizing_spark.operators.jpeg import encode_jpeg
                    payloads.append(
                        encode_jpeg(_decode_image_stub(raw, w_px, h_px),
                                    quality=95))
                else:
                    payloads.append(raw)
                metas.append({
                    "width": w_px,
                    "height": h_px,
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
    """STUB decode — deterministic fake pixel grid from an OPAQUE
    legacy payload. All real image formats the pipeline emits (PPM,
    BMP, PNG, baseline JPEG) are dispatched to real decoders before
    this fallback — see decode_image."""
    h = zlib.crc32(payload)
    rng = np.arange(width * height, dtype=np.uint32)
    return ((rng * 2654435761 + h) % 256).astype(np.uint8).reshape(height, width)


def encode_ppm(img: np.ndarray) -> bytes:
    """Binary PPM (P6, maxval 255) from an HxW (gray, replicated to
    RGB) or HxWx3 uint8 array — the uncompressed interchange format
    whose codec is pure header + bytes (public spec: netpbm P6)."""
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w, _ = img.shape
    return f"P6\n{w} {h}\n255\n".encode() + img.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Real decode of a binary PPM (P6): returns HxW uint8 LUMINANCE
    (integer mean of the RGB channels — exact for gray-replicated
    pixels). Pure NumPy; whitespace/comment-tolerant header parse."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval tokens (comments start '#')
    toks, i = [], 2
    while len(toks) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while payload[i : i + 1] not in (b"\n", b""):
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        toks.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = toks
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
    rgb = px.reshape(h, w, 3).astype(np.uint16)
    return (rgb.sum(axis=2) // 3).astype(np.uint8)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Real decode of an uncompressed 24-bit BI_RGB Windows BMP:
    returns HxW uint8 luminance. Pure NumPy: little-endian header
    fields, 4-byte-padded bottom-up (or top-down, negative height)
    BGR rows — the public BITMAPINFOHEADER layout."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")

    def u32(off):
        return int.from_bytes(payload[off:off + 4], "little")

    def s32(off):
        return int.from_bytes(payload[off:off + 4], "little", signed=True)

    data_off = u32(10)
    w, h_signed = s32(18), s32(22)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = u32(30)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})")
    h = abs(h_signed)
    row_bytes = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * h,
                         offset=data_off).reshape(h, row_bytes)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    if h_signed > 0:
        bgr = bgr[::-1]  # bottom-up storage -> top-down image
    rgb = bgr[:, :, ::-1].astype(np.uint16)
    return (rgb.sum(axis=2) // 3).astype(np.uint8)


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def encode_png(img: np.ndarray, filters: str = "cycle") -> bytes:
    """PNG encoder (8-bit grayscale or RGB, non-interlaced) from an
    HxW or HxWx3 uint8 array — public RFC 2083 layout: IHDR + one
    zlib IDAT + IEND, CRC-32 per chunk. filters='none' emits filter-0
    rows; 'cycle' rotates through the full filter set
    (None/Sub/Up/Average/Paeth) per row so a decoder round-trip
    exercises every unfilter branch."""
    gray = img.ndim == 2
    arr = img[:, :, None] if gray else img
    h, w, c = arr.shape
    colortype = 0 if gray else 2
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.uint8)
    for y in range(h):
        row = arr[y].reshape(-1)
        f = 0 if filters == "none" else y % 5
        left = np.concatenate([np.zeros(c, np.uint8), row[:-c]])
        upleft = np.concatenate([np.zeros(c, np.uint8), prev[:-c]])
        if f == 0:
            enc = row
        elif f == 1:
            enc = row - left
        elif f == 2:
            enc = row - prev
        elif f == 3:
            enc = row - ((left.astype(np.uint16) + prev) // 2).astype(np.uint8)
        else:
            a, b, cc = (left.astype(np.int32), prev.astype(np.int32),
                        upleft.astype(np.int32))
            p = a + b - cc
            pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - cc)
            pred = np.where((pa <= pb) & (pa <= pc), a,
                            np.where(pb <= pc, b, cc)).astype(np.uint8)
            enc = row - pred
        raw += bytes([f]) + enc.astype(np.uint8).tobytes()
        prev = row

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (len(data).to_bytes(4, "big") + typ + data
                + zlib.crc32(typ + data).to_bytes(4, "big"))

    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, colortype, 0, 0, 0]))
    return (_PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """REAL decode of a non-interlaced 8-bit PNG (grayscale,
    gray+alpha, RGB, RGBA): returns HxW uint8 luminance (integer mean
    of the color channels, alpha ignored — the decode_ppm/decode_bmp
    convention). Pure stdlib zlib + NumPy: chunk walk, IDAT concat,
    zlib.decompress, per-scanline unfilter of the public RFC 2083
    filter set (None/Sub/Up/Average/Paeth). The None/Up rows are
    whole-row vectorized; Sub/Average/Paeth carry an intra-row
    left-pixel dependency, so they run the sequential reference
    recurrence. Only palette/16-bit/interlaced PNGs and JPEG remain
    undecodable in this container."""
    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        ln = int.from_bytes(payload[pos:pos + 4], "big")
        typ = payload[pos + 4:pos + 8]
        if typ == b"IHDR":
            ihdr = payload[pos + 8:pos + 8 + ln]
        elif typ == b"IDAT":
            idat.append(payload[pos + 8:pos + 8 + ln])
        elif typ == b"IEND":
            break
        pos += 12 + ln  # len + type + data + CRC
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    bitdepth, colortype, _comp, _filt, interlace = ihdr[8:13]
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(colortype)
    if bitdepth != 8 or interlace != 0 or channels is None:
        raise NotImplementedError(
            f"only non-interlaced 8-bit gray/RGB/alpha PNG supported "
            f"(bitdepth={bitdepth}, colortype={colortype}, "
            f"interlace={interlace})")
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) < (stride + 1) * h:
        raise ValueError("truncated PNG scanline data")
    bpp = channels  # bytes per pixel at bitdepth 8
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        rec = np.frombuffer(raw, np.uint8, stride, pos + 1).copy()
        pos += stride + 1
        if ftype == 0:
            pass
        elif ftype == 2:  # Up — vectorized, uint8 wraps mod 256
            rec += prev
        elif ftype == 1:  # Sub
            for i in range(bpp, stride):
                rec[i] = (int(rec[i]) + int(rec[i - bpp])) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = int(rec[i - bpp]) if i >= bpp else 0
                rec[i] = (int(rec[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = int(rec[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[i] = (int(rec[i]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = rec
        prev = rec
    px = out.reshape(h, w, channels)
    if colortype == 0:
        return px[:, :, 0]
    if colortype == 4:  # gray + alpha: luminance is the gray channel
        return px[:, :, 0]
    rgb = px[:, :, :3].astype(np.uint16)
    return (rgb.sum(axis=2) // 3).astype(np.uint8)


def decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Dispatch decode: REAL pure-NumPy decoders for PPM P6, 24-bit
    BMP, non-interlaced 8-bit PNG (stdlib zlib), and — round 5 —
    baseline sequential JPEG (operators/jpeg.py, full T.81 Huffman +
    IDCT path); the deterministic fake grid only for legacy opaque
    synthetic payloads — so the Spark-side plumbing (schema,
    batching, features) is exercised with real pixel bytes
    end-to-end for every emitted format."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == _PNG_MAGIC:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from optimizing_spark.operators.jpeg import decode_jpeg
        return decode_jpeg(payload)
    return _decode_image_stub(payload, width, height)


FEATURES_SCHEMA = T.StructType([
    T.StructField("media_ref", T.StringType()),
    T.StructField("kind", T.StringType()),
    T.StructField("mean_px", T.DoubleType()),
    T.StructField("std_px", T.DoubleType()),
    T.StructField("phash", T.LongType()),
])


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads: decode
    (REAL pure-NumPy for PPM/BMP payloads, deterministic fake grid for
    opaque ones) -> mean/std pixel + an 8x8-DCT-free perceptual-hash-
    style bit signature (mean-threshold on an 8x8 downsample)."""

    def fx(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples():
                meta = r.meta
                w = int(meta["width"]) if isinstance(meta, dict) else int(meta.width)
                h = int(meta["height"]) if isinstance(meta, dict) else int(meta.height)
                img = decode_image(bytes(r.payload), w, h)
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
