"""Baseline JPEG codec — pure NumPy + stdlib, no imaging libraries.

Public-spec implementation of ITU-T T.81 baseline sequential DCT
(8-bit samples, Huffman entropy coding, JFIF YCbCr or single-component
grayscale, 4:4:4 or 4:2:0 chroma subsampling, optional restart
markers). This closes the engine's last media-format gap: decode_image
(operators/multimodal.py) previously raised NotImplementedError for
JPEG payloads; round 5 decodes them for real.

Reference relevance: the reference treats media strictly as opaque
payload bytes (main.cpp:16-35 generates synthetic objects only); the
media pipeline including this codec is part of the brief's
training-data-pipeline mandate, not a port of reference code.

Design notes:
- The DECODER builds its Huffman and quantization tables from the
  file's own DHT/DQT segments (as the spec requires), so decoding is
  not coupled to the encoder's table choices.
- Entropy decode is sequential Python over a 32-bit bit-buffer (a
  bitstream is inherently serial); everything block-shaped — DCT,
  quantization, dequantization, level shift, upsampling, color
  conversion — is vectorized NumPy over all blocks at once. At Spark
  scale the parallelism axis is rows-per-partition via mapInPandas
  (each image decodes independently), so per-image decode being
  Python-sequential does not serialize the job.
- Only baseline/extended-sequential Huffman (SOF0/SOF1) is supported;
  progressive (SOF2), lossless, hierarchical, and arithmetic-coded
  frames raise NotImplementedError loudly.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- tables

def _zigzag_order() -> np.ndarray:
    """The spec's zigzag scan as 64 flat (row*8+col) indices, generated
    from the diagonal-walk definition: anti-diagonals in increasing
    order of row+col; odd sums walk row-ascending, even sums
    row-descending (T.81 Figure 5)."""
    order = []
    for s in range(15):
        cells = [(r, s - r) for r in range(8) if 0 <= s - r < 8]
        if s % 2 == 0:
            cells.reverse()
        order.extend(r * 8 + c for r, c in cells)
    return np.array(order, dtype=np.int64)


ZIGZAG = _zigzag_order()
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1/K.2 example quantization tables (the de-facto standard).
QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64).reshape(8, 8)
QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64).reshape(8, 8)

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL). Any valid
# prefix code would round-trip (tables travel in DHT); these are the
# interoperable defaults.
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROM_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]
_AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]


def huffman_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment per T.81 Annex C: codes of each
    length are consecutive, starting from (prev_start + count) << 1.
    Returns {symbol: (code, length)}. Validates that BITS matches the
    value count and the code is prefix-complete (never overflows)."""
    if sum(bits) != len(vals):
        raise ValueError("BITS/HUFFVAL length mismatch")
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            if code >= (1 << ln):
                raise ValueError("invalid Huffman BITS: code overflow")
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Decoder-side inverse: {(length, code): symbol}."""
    return {(ln, code): sym for sym, (code, ln) in huffman_codes(bits, vals).items()}


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis D (D @ D.T == I): forward block
    transform F = D X Dᵀ, inverse X = Dᵀ F D (T.81 A.3.3)."""
    d = np.zeros((8, 8))
    for u in range(8):
        cu = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            d[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return d


_D = _dct_matrix()


def _scaled_quant(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg-convention quality scaling of the Annex K tables."""
    q = min(100, max(1, int(quality)))
    s = 5000 // q if q < 50 else 200 - 2 * q
    lum = np.clip((QUANT_LUM * s + 50) // 100, 1, 255)
    chrom = np.clip((QUANT_CHROM * s + 50) // 100, 1, 255)
    return lum.astype(np.int64), chrom.astype(np.int64)


# ---------------------------------------------------------------- encoder

class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing inside entropy-coded data
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad final byte with 1s


def _blockify(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane with H, W multiples of 8 -> (H//8, W//8, 8, 8)."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).swapaxes(1, 2)


def _pad_to(plane: np.ndarray, h: int, w: int) -> np.ndarray:
    """Edge-replicate pad a plane up to (h, w)."""
    return np.pad(plane, ((0, h - plane.shape[0]), (0, w - plane.shape[1])),
                  mode="edge")


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int,
                  dc: dict[int, tuple[int, int]],
                  ac: dict[int, tuple[int, int]]) -> int:
    diff = int(zz[0]) - pred
    size = abs(diff).bit_length()
    bw.write(*dc[size])
    if size:
        bw.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.write(*ac[0xF0])  # ZRL: 16 zeros
            run -= 16
        s = abs(v).bit_length()
        if s > 10:
            raise ValueError("AC coefficient out of baseline range")
        bw.write(*ac[(run << 4) | s])
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        bw.write(*ac[0x00])  # EOB
    return int(zz[0])


def _forward_component(plane: np.ndarray, qtbl: np.ndarray) -> np.ndarray:
    """Level-shift, 2-D DCT and quantize every 8x8 block of a padded
    plane; returns int64 (by, bx, 64) coefficients in zigzag order."""
    blocks = _blockify(plane.astype(np.float64) - 128.0)
    coef = np.einsum("ux,abxy,vy->abuv", _D, blocks, _D)
    q = np.round(coef / qtbl.astype(np.float64)).astype(np.int64)
    return q.reshape(q.shape[0], q.shape[1], 64)[:, :, ZIGZAG]


def encode_jpeg(img: np.ndarray, quality: int = 75, subsample: str = "444",
                restart_interval: int = 0) -> bytes:
    """Baseline sequential JPEG from an HxW uint8 grayscale or HxWx3
    uint8 RGB array. subsample: '444' (no chroma subsampling) or '420'
    (2x2 chroma average). restart_interval: MCUs between RSTn markers
    (0 = none). Emits SOI/APP0(JFIF)/DQT/SOF0/DHT/[DRI]/SOS/EOI with
    the Annex K example tables scaled libjpeg-style by `quality`."""
    if subsample not in ("444", "420"):
        raise ValueError(f"unsupported subsample {subsample!r}")
    gray = img.ndim == 2
    h_img, w_img = img.shape[:2]
    lum_q, chrom_q = _scaled_quant(quality)

    if gray:
        planes = [img.astype(np.float64)]
        samps = [(1, 1)]
        qids = [0]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample == "420":
            he, we = (h_img + 1) // 2 * 2, (w_img + 1) // 2 * 2
            cb = _pad_to(cb, he, we).reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            cr = _pad_to(cr, he, we).reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            samps = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qids = [0, 1, 1]

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcus_x = (w_img + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h_img + 8 * vmax - 1) // (8 * vmax)

    coefs = []
    for plane, (sh, sv), qid in zip(planes, samps, qids):
        padded = _pad_to(np.clip(plane, 0.0, 255.0), mcus_y * sv * 8, mcus_x * sh * 8)
        coefs.append(_forward_component(padded, lum_q if qid == 0 else chrom_q))

    dc_enc = [huffman_codes(_DC_LUM_BITS, _DC_LUM_VALS),
              huffman_codes(_DC_CHROM_BITS, _DC_CHROM_VALS)]
    ac_enc = [huffman_codes(_AC_LUM_BITS, _AC_LUM_VALS),
              huffman_codes(_AC_CHROM_BITS, _AC_CHROM_VALS)]
    hids = [0] + [1] * (len(planes) - 1)

    bw = _BitWriter()
    preds = [0] * len(planes)
    mcu_i = 0
    out = bytearray()
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw.flush()
                out += bw.buf
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + (mcu_i // restart_interval - 1) % 8])
                preds = [0] * len(planes)
            for ci, (sh, sv) in enumerate(samps):
                for by in range(sv):
                    for bx in range(sh):
                        zz = coefs[ci][my * sv + by, mx * sh + bx]
                        preds[ci] = _encode_block(bw, zz, preds[ci],
                                                  dc_enc[hids[ci]], ac_enc[hids[ci]])
            mcu_i += 1
    bw.flush()
    out += bw.buf

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    hdr = bytearray(b"\xff\xd8")  # SOI
    hdr += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = bytes([0x00]) + bytes(lum_q.reshape(64)[ZIGZAG].astype(np.uint8))
    if not gray:
        dqt += bytes([0x01]) + bytes(chrom_q.reshape(64)[ZIGZAG].astype(np.uint8))
    hdr += seg(0xDB, dqt)
    sof = bytes([8]) + h_img.to_bytes(2, "big") + w_img.to_bytes(2, "big") \
        + bytes([len(planes)])
    for ci, ((sh, sv), qid) in enumerate(zip(samps, qids)):
        sof += bytes([ci + 1, (sh << 4) | sv, qid])
    hdr += seg(0xC0, sof)
    dht = bytes([0x00]) + bytes(_DC_LUM_BITS) + bytes(_DC_LUM_VALS) \
        + bytes([0x10]) + bytes(_AC_LUM_BITS) + bytes(_AC_LUM_VALS)
    if not gray:
        dht += bytes([0x01]) + bytes(_DC_CHROM_BITS) + bytes(_DC_CHROM_VALS) \
            + bytes([0x11]) + bytes(_AC_CHROM_BITS) + bytes(_AC_CHROM_VALS)
    hdr += seg(0xC4, dht)
    if restart_interval:
        hdr += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, (hids[ci] << 4) | hids[ci]])
    sos += bytes([0, 63, 0])
    hdr += seg(0xDA, sos)
    return bytes(hdr) + bytes(out) + b"\xff\xd9"  # EOI


# ---------------------------------------------------------------- decoder

class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 destuffing.
    Stops (feeds an error) at any real marker; restart() byte-aligns,
    consumes the expected RSTn and clears the buffer."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.d = data
        self.p = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        while self.n <= 24 and self.p < len(self.d):
            b = self.d[self.p]
            if b == 0xFF:
                nxt = self.d[self.p + 1] if self.p + 1 < len(self.d) else 0xD9
                if nxt != 0x00:
                    break  # a real marker: stop feeding bits
                self.p += 2
            else:
                self.p += 1
            self.acc = (self.acc << 8) | b
            self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
            if self.n == 0:
                raise ValueError("truncated JPEG entropy data")
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, size: int) -> int:
        v = 0
        for _ in range(size):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self, idx: int) -> None:
        self.acc = 0
        self.n = 0
        while self.p + 1 < len(self.d) and self.d[self.p] != 0xFF:
            self.p += 1  # skip any pad to the marker
        m = self.d[self.p + 1]
        if not (0xD0 <= m <= 0xD7) or m != 0xD0 + idx % 8:
            raise ValueError(f"expected RST{idx % 8} marker, got {m:#x}")
        self.p += 2


def _decode_huff(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(payload: bytes, rgb: bool = False) -> np.ndarray:
    """REAL decode of a baseline/extended-sequential Huffman JPEG
    (SOF0/SOF1): marker walk, DQT (8- or 16-bit), DHT, DRI, SOS,
    entropy decode with byte destuffing + restart markers, dequantize,
    un-zigzag, vectorized IDCT over all blocks, nearest-neighbor
    chroma upsample, YCbCr->RGB. Returns HxW uint8 luminance — the
    decode_ppm/decode_bmp convention, integer mean of the RGB channels
    (the Y plane directly for 1-component grayscale) — or the HxWx3
    RGB array when rgb=True. Progressive/arithmetic frames raise
    NotImplementedError."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict[tuple[int, int], int]] = {}
    ac_tabs: dict[int, dict[tuple[int, int], int]] = {}
    frame = None  # (H, W, [(comp_id, sh, sv, tq)])
    restart_interval = 0
    scan = None  # ([(comp_idx, dc_id, ac_id)], entropy_start)

    while pos + 1 < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1  # fill bytes before a marker
        m = payload[pos + 1]
        pos += 2
        if m == 0xD9:  # EOI
            break
        if m in (0x01,) or 0xD0 <= m <= 0xD7:
            continue  # standalone markers
        ln = int.from_bytes(payload[pos:pos + 2], "big")
        seg = payload[pos + 2:pos + ln]
        if m in (0xC0, 0xC1):  # SOF0 baseline / SOF1 extended sequential
            h_img = int.from_bytes(seg[1:3], "big")
            w_img = int.from_bytes(seg[3:5], "big")
            if seg[0] != 8:
                raise NotImplementedError("only 8-bit JPEG samples supported")
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (h_img, w_img, comps)
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG frame type SOF marker {m:#x} "
                "(progressive/lossless/arithmetic)")
        elif m == 0xC4:  # DHT — may hold several tables
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17:i + 17 + nv])
                tab = _decode_table(bits, vals)
                (ac_tabs if tc else dc_tabs)[th] = tab
                i += 17 + nv
        elif m == 0xDB:  # DQT — may hold several tables, 8/16-bit
            i = 0
            while i < len(seg):
                pq, tq_id = seg[i] >> 4, seg[i] & 0xF
                if pq:
                    raw = np.frombuffer(seg, ">u2", 64, i + 1).astype(np.int64)
                    i += 1 + 128
                else:
                    raw = np.frombuffer(seg, np.uint8, 64, i + 1).astype(np.int64)
                    i += 1 + 64
                tbl = np.empty(64, dtype=np.int64)
                tbl[ZIGZAG] = raw  # DQT stores zigzag order
                qt[tq_id] = tbl
        elif m == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[:2], "big")
        elif m == 0xDA:  # SOS
            ns = seg[0]
            sel = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                sel.append((cs, tt >> 4, tt & 0xF))
            scan = (sel, pos + ln)
            break
        pos += ln

    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    h_img, w_img, comps = frame
    sel, entropy_start = scan
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (w_img + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h_img + 8 * vmax - 1) // (8 * vmax)

    order = []  # per scan component: (comp_idx, sh, sv, coef array, dc, ac)
    for cs, dci, aci in sel:
        ci = next(i for i, c in enumerate(comps) if c[0] == cs)
        _, sh, sv, _tq = comps[ci]
        coef = np.zeros((mcus_y * sv, mcus_x * sh, 64), dtype=np.int64)
        order.append((ci, sh, sv, coef, dc_tabs[dci], ac_tabs[aci]))

    br = _BitReader(payload, entropy_start)
    preds = [0] * len(order)
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                br.restart(mcu_i // restart_interval - 1)
                preds = [0] * len(order)
            for oi, (_ci, sh, sv, coef, dct, act) in enumerate(order):
                for by in range(sv):
                    for bx in range(sh):
                        blk = coef[my * sv + by, mx * sh + bx]
                        size = _decode_huff(br, dct)
                        preds[oi] += _extend(br.receive(size), size)
                        blk[0] = preds[oi]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(br, act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past end of block")
                            blk[k] = _extend(br.receive(s), s)
                            k += 1
            mcu_i += 1

    planes = []
    for ci, sh, sv, coef, _dct, _act in order:
        _cid, _sh, _sv, tq_id = comps[ci]
        nat = coef[:, :, UNZIGZAG]  # zigzag -> natural order FIRST
        deq = (nat * qt[tq_id][None, None, :]).astype(np.float64)
        blocks = deq.reshape(coef.shape[0], coef.shape[1], 8, 8)
        pix = np.einsum("ux,abuv,vy->abxy", _D, blocks, _D) + 128.0
        plane = pix.swapaxes(1, 2).reshape(coef.shape[0] * 8, coef.shape[1] * 8)
        plane = np.repeat(np.repeat(plane, vmax // sv, axis=0), hmax // sh, axis=1)
        planes.append(np.clip(plane[:h_img, :w_img], 0.0, 255.0))

    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        if rgb:
            return np.repeat(y[:, :, None], 3, axis=2)
        return y
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)
    if rgb:
        return out
    return (out.astype(np.uint16).sum(axis=2) // 3).astype(np.uint8)
