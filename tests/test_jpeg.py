"""Baseline JPEG codec tests (operators/jpeg.py).

Independence strategy (the BMP/PNG test pattern): the engine's tables
and transforms are checked against spec-derived literals and a
direct-formula reimplementation written HERE, not against the
engine's own inverse — then the full codec is proven
entropy-lossless by matching a quantize-only NumPy pipeline exactly,
so the ONLY loss in the codec is the spec's quantization step.
"""

import numpy as np
import pytest

from optimizing_spark.operators import jpeg as J
from optimizing_spark.operators import multimodal as MM

# T.81 Figure 5 zigzag sequence as flat row*8+col indices — spec
# literal, independent of the engine's diagonal-walk generator.
_SPEC_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]


def _noise(h, w):
    return (np.arange(h * w, dtype=np.uint32) * 2654435761 % 256) \
        .astype(np.uint8).reshape(h, w)


def test_zigzag_matches_spec_literal():
    assert J.ZIGZAG.tolist() == _SPEC_ZIGZAG
    assert sorted(J.ZIGZAG.tolist()) == list(range(64))
    assert (J.ZIGZAG[J.UNZIGZAG] == np.arange(64)).all()


def test_dct_matrix_matches_direct_formula_and_is_orthonormal():
    # A.3.3 written as the raw quadruple-free direct formula here
    d = np.empty((8, 8))
    for u in range(8):
        for x in range(8):
            cu = 1.0 / np.sqrt(2.0) if u == 0 else 1.0
            d[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16.0)
    assert np.abs(J._D - d).max() < 1e-12
    assert np.abs(J._D @ J._D.T - np.eye(8)).max() < 1e-12
    # forward-then-inverse on a block is identity (float roundtrip)
    x = _noise(8, 8).astype(np.float64) - 128.0
    f = J._D @ x @ J._D.T
    assert np.abs(J._D.T @ f @ J._D - x).max() < 1e-9


def test_huffman_codes_canonical_and_prefix_free():
    for bits, vals in [(J._DC_LUM_BITS, J._DC_LUM_VALS),
                       (J._DC_CHROM_BITS, J._DC_CHROM_VALS),
                       (J._AC_LUM_BITS, J._AC_LUM_VALS),
                       (J._AC_CHROM_BITS, J._AC_CHROM_VALS)]:
        codes = J.huffman_codes(bits, vals)
        assert len(codes) == len(vals)
        as_bits = {format(c, f"0{ln}b") for c, ln in codes.values()}
        assert len(as_bits) == len(codes)
        for a in as_bits:  # prefix-free: no code is a prefix of another
            for b in as_bits:
                assert a == b or not b.startswith(a)
        # decoder table is the exact inverse
        dec = J._decode_table(bits, vals)
        assert all(dec[(ln, c)] == sym for sym, (c, ln) in codes.items())
    # the AC tables cover every emittable symbol: EOB, ZRL, all
    # (run 0..15) x (size 1..10)
    for bits, vals in [(J._AC_LUM_BITS, J._AC_LUM_VALS),
                       (J._AC_CHROM_BITS, J._AC_CHROM_VALS)]:
        need = {0x00, 0xF0} | {(r << 4) | s
                               for r in range(16) for s in range(1, 11)}
        assert need <= set(vals)
    with pytest.raises(ValueError):
        J.huffman_codes([16] + [0] * 15, list(range(16)))  # overflow


def test_flat_and_gradient_roundtrip():
    for v in (0, 7, 77, 128, 200, 255):
        img = np.full((24, 17), v, np.uint8)  # odd width: pad + crop
        dec = J.decode_jpeg(J.encode_jpeg(img, quality=95))
        assert dec.shape == (24, 17)
        assert np.abs(dec.astype(int) - v).max() <= 1
    g = np.add.outer(np.arange(40), np.arange(33)).astype(np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg(g, quality=95))
    assert np.abs(dec.astype(int) - g.astype(int)).max() <= 2


def _quantize_only_reference(img, quality):
    """Independent decode oracle: DCT -> quantize -> dequantize ->
    IDCT with a direct-formula basis, no entropy coding at all. If the
    codec's output equals this, its Huffman/bitstream layer is
    verifiably lossless."""
    d = np.empty((8, 8))
    for u in range(8):
        for x in range(8):
            cu = 1.0 / np.sqrt(2.0) if u == 0 else 1.0
            d[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16.0)
    q = min(100, max(1, quality))
    s = 5000 // q if q < 50 else 200 - 2 * q
    qtbl = np.clip((J.QUANT_LUM * s + 50) // 100, 1, 255).astype(np.float64)
    h, w = img.shape
    hp, wp = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    pad = np.pad(img.astype(np.float64), ((0, hp - h), (0, wp - w)),
                 mode="edge") - 128.0
    out = np.empty_like(pad)
    for by in range(hp // 8):
        for bx in range(wp // 8):
            blk = pad[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
            coef = np.round((d @ blk @ d.T) / qtbl) * qtbl
            out[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = d.T @ coef @ d
    return np.clip(np.round(out[:h, :w] + 128.0), 0, 255).astype(np.uint8)


def test_entropy_and_bitstream_layer_is_lossless():
    """decode(encode(img)) must EXACTLY equal the engine's own
    quantize->dequantize->IDCT pipeline run with no entropy coding in
    between (byte-identical float expressions) — proving the Huffman /
    DC-prediction / byte-stuffing / marker layer loses nothing. The
    transform itself is independently verified in the DCT/zigzag tests
    and the direct-formula oracle test below."""
    rng = _noise(48, 37)  # worst case: dense AC coefficients
    for quality in (50, 75, 95):
        dec = J.decode_jpeg(J.encode_jpeg(rng, quality=quality))
        lum_q, _ = J._scaled_quant(quality)
        pad = np.pad(rng.astype(np.float64), ((0, 0), (0, 3)), mode="edge")
        zz = J._forward_component(pad, lum_q)
        nat = zz[:, :, J.UNZIGZAG]
        deq = (nat * lum_q.reshape(64)[None, None, :]).astype(np.float64)
        blocks = deq.reshape(nat.shape[0], nat.shape[1], 8, 8)
        pix = np.einsum("ux,abuv,vy->abxy", J._D, blocks, J._D) + 128.0
        plane = pix.swapaxes(1, 2).reshape(nat.shape[0] * 8, nat.shape[1] * 8)
        want = np.clip(np.round(np.clip(plane[:48, :37], 0.0, 255.0)),
                       0, 255).astype(np.uint8)
        assert (dec == want).all()
    # and quantization error itself is small at q95 even on noise
    dec95 = J.decode_jpeg(J.encode_jpeg(rng, quality=95))
    assert np.abs(dec95.astype(int) - rng.astype(int)).mean() < 3.0
    assert abs(float(dec95.mean()) - float(rng.mean())) < 0.1  # DC preserved


def test_codec_matches_independent_oracle_up_to_exact_ties():
    """Against the direct-formula @-matmul oracle, quantized
    coefficients may legitimately differ ONLY where the unquantized
    ratio is an exact k+0.5 rounding tie (summation order flips
    np.round there — e.g. coefficient -24 over quant 16 = -1.5); every
    mismatch must be such a tie, off by exactly 1."""
    rng = _noise(48, 37)
    d = np.empty((8, 8))
    for u in range(8):
        for x in range(8):
            cu = 1.0 / np.sqrt(2.0) if u == 0 else 1.0
            d[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16.0)
    for quality in (50, 75, 95):
        lum_q, _ = J._scaled_quant(quality)
        qtbl = lum_q.astype(np.float64)
        pad = np.pad(rng.astype(np.float64), ((0, 0), (0, 3)), mode="edge")
        eng = J._forward_component(pad, lum_q)
        n_tie = 0
        for by in range(6):
            for bx in range(5):
                blk = pad[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
                ratio = (d @ blk @ d.T) / qtbl
                oracle = np.round(ratio).astype(np.int64).reshape(64)[J.ZIGZAG]
                m = oracle != eng[by, bx]
                for i in np.nonzero(m)[0]:
                    val = ratio.reshape(64)[J.ZIGZAG[i]]
                    doubled = val * 2.0
                    assert abs(doubled - round(doubled)) < 1e-6 \
                        and round(doubled) % 2 != 0, \
                        f"non-tie coefficient mismatch at q{quality}: {val}"
                    assert abs(int(oracle[i]) - int(eng[by, bx][i])) == 1
                    n_tie += 1
        # ties are rare; a flood would mean a real divergence
        assert n_tie < 30, n_tie


def test_color_subsampling_and_luminance_convention():
    g = np.add.outer(np.arange(40), np.arange(33)).astype(np.uint8)
    rgb = np.stack([g, (g + 30) % 256, (g + 60) % 256], axis=2)
    d444 = J.decode_jpeg(J.encode_jpeg(rgb, quality=95, subsample="444"),
                         rgb=True)
    assert d444.shape == (40, 33, 3)
    assert np.abs(d444.astype(int) - rgb.astype(int)).max() <= 2
    d420 = J.decode_jpeg(J.encode_jpeg(rgb, quality=95, subsample="420"),
                         rgb=True)
    assert np.abs(d420.astype(int) - rgb.astype(int)).max() <= 4
    # default output = integer mean of RGB (decode_ppm/bmp convention)
    lum = J.decode_jpeg(J.encode_jpeg(rgb, quality=95, subsample="444"))
    want = (d444.astype(np.uint16).sum(axis=2) // 3).astype(np.uint8)
    assert (lum == want).all()


def test_restart_markers_decode_identically():
    rng = _noise(33, 26)
    base = J.decode_jpeg(J.encode_jpeg(rng, quality=80))
    for ri in (1, 2, 5):
        withr = J.encode_jpeg(rng, quality=80, restart_interval=ri)
        assert b"\xff\xdd" in withr  # DRI segment present
        assert (J.decode_jpeg(withr) == base).all()


def test_unsupported_variants_refuse_loudly():
    rng = _noise(16, 16)
    payload = bytearray(J.encode_jpeg(rng, quality=90))
    sof = payload.index(b"\xff\xc0")
    payload[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError):
        J.decode_jpeg(bytes(payload))
    with pytest.raises(ValueError):
        J.decode_jpeg(b"\xff\xd8\xff\xe0....")  # truncated garbage
    with pytest.raises(ValueError):
        J.decode_jpeg(b"not a jpeg")
    with pytest.raises(ValueError):
        J.encode_jpeg(rng, subsample="422")


def test_media_features_real_jpeg_payloads_end_to_end(spark):
    """The feature pipeline decodes REAL DCT-compressed bytes through
    the same Arrow mapInPandas plumbing. JPEG is lossy by spec, so
    instead of exact feature equality (the PPM/PNG bar) the invariant
    is the spec's own: the block-DC (hence the image mean) survives
    quantization — per-image mean_px within 1.0 of the raw path."""
    from pyspark.sql import functions as F

    from optimizing_spark.sources import datagen

    docs = datagen.documents_spark_fast(spark, 60, partitions=3) \
        .select("doc_id", "spans").localCheckpoint()
    raw = MM.synthetic_media(spark, docs).localCheckpoint()
    jpg = MM.synthetic_media(spark, docs, fmt="jpeg").localCheckpoint()
    assert jpg.count() == raw.count() > 0
    head = jpg.select("payload").first().payload
    assert bytes(head[:2]) == b"\xff\xd8"  # real JPEG bytes
    assert jpg.filter(~F.expr("substring(payload, -2, 2) = X'FFD9'")) \
              .count() == 0  # every payload carries EOI
    fa = {r.media_ref: r.mean_px for r in MM.extract_features(raw).collect()}
    fb = {r.media_ref: r.mean_px for r in MM.extract_features(jpg).collect()}
    assert fa.keys() == fb.keys()
    worst = max(abs(fa[k] - fb[k]) for k in fa)
    assert worst < 1.0, f"DC drift {worst}"
