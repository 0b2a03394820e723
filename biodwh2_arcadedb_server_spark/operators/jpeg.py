"""Pure-Python/numpy JPEG codec (round 14, VERDICT r13 #5 — the last
[C5] lossy-codec seam, `multimodal.extract_features`): baseline
sequential (SOF0/SOF1) plus progressive (SOF2), both directions.

Scope — ITU-T T.81 baseline sequential DCT, the profile every real
JPEG decoder must support and ~all web JPEGs use:

- **decoder** (`decode_baseline`): SOI/APPn/COM/DQT/SOF0/DHT/DRI/SOS
  segment walk, canonical Huffman tables built from any DHT (not just
  the ones our encoder writes), 0xFF00 byte-unstuffing, restart
  markers, per-component DC prediction, zig-zag + dequant, exact
  float64 2-D IDCT (separable DCT-III matrix), nearest-neighbor
  chroma upsampling for subsampled scans, BT.601 YCbCr→RGB. Returns
  uint8 (h, w) for 1-component scans or (h, w, 3) RGB.
- **encoder** (`encode_baseline`): grayscale or RGB input, optional
  2×2 chroma subsampling (averaged), Annex K default quantization
  tables scaled by the libjpeg quality curve (or caller tables), the
  Annex K Huffman tables, interleaved MCU scan with byte stuffing.
  Exists to MAKE fixtures and probe payloads — decode is the product.

Progressive (T.81 Annex G, Huffman) is implemented too — see
`decode_progressive` / `encode_progressive` at the bottom of the
module; `decode()` dispatches on the SOF marker. Arithmetic coding,
12-bit precision, hierarchical, and lossless processes raise
NotImplementedError with the profile named: they are different
entropy-coding pipelines, not gaps in this one.

Numerical contract the q194 probe leans on: a block whose spatial
domain is CONSTANT has only a DC coefficient; with a quant table
whose DC entry divides 8·(v−128) exactly, quantize→dequantize→IDCT
reproduces v bit-exactly (the IDCT of a DC-only block is the constant
dc/8, exact in float64). The probe builds such blocks, so its decoded
stats are deterministic and a SQL oracle can replay them — lossy
format, lossless fixture path.

Design notes: numpy does the per-block math (vectorized IDCT over all
blocks of a component at once); the bit-level Huffman walk is a
Python loop over the entropy-coded bytes — fine at probe scale,
Arrow-batched under mapInPandas, and the documented plug-point for
libjpeg-turbo when the container gains one. No reference-repo lineage:
the reference (BioDWH2 server) has no media surface at all; this is
driver-mandate [C5].
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- constants
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# Annex K Table K.1/K.2 (natural order, row-major)
QTABLE_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QTABLE_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K Huffman specs: (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix D: forward = D@X@D.T,
    inverse = D.T@Y@D (exact float64 transpose-inverse)."""
    n = 8
    d = np.zeros((n, n))
    for k in range(n):
        for i in range(n):
            d[k, i] = np.cos((2 * i + 1) * k * np.pi / (2 * n)) * (
                np.sqrt(1.0 / n) if k == 0 else np.sqrt(2.0 / n)
            )
    return d


_D = _dct_matrix()


def idct2_blocks(coefs: np.ndarray) -> np.ndarray:
    """Vectorized 2-D inverse DCT over a (n_blocks, 8, 8) stack."""
    return np.einsum("ij,njk,kl->nil", _D.T, coefs, _D)


def dct2_blocks(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ij,njk,kl->nil", _D, blocks, _D.T)


# JPEG's DCT convention is the orthonormal one scaled so that
# DC = sum(x)/8 (i.e. our orthonormal transform already matches:
# D row 0 is 1/sqrt(8), so DC_orthonormal = sum/sqrt(8); T.81 wants
# S00 = sum/8). Scale factor between orthonormal and T.81: T.81's
# FDCT is 0.25*C(u)C(v)*sum — equal to the orthonormal transform for
# 8x8. (C(0)=1/sqrt(2): 0.25/ (1/sqrt(8)*1/sqrt(8)) = 2 ... verified
# numerically in tests: both conventions coincide for 8-point.)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._nbits += length
        while self._nbits >= 8:
            self._nbits -= 8
            b = (self._acc >> self._nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self._nbits:
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per T.81


class _BitReader:
    """Entropy-coded-segment reader: unstuffs 0xFF00, stops at any
    other marker (caller handles RSTn)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG: entropy data ends mid-scan")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError(
                    "truncated JPEG: entropy data ends mid-scan"
                )
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise EOFError("marker inside entropy-coded segment")
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._nbits += 8

    def bit(self) -> int:
        if self._nbits == 0:
            self._fill()
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_and_consume_rst(self) -> None:
        """Drop partial byte, consume the RSTn marker at the cursor."""
        self._acc = 0
        self._nbits = 0
        if (
            self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _build_huffman(bits: list[int], vals: list[int]):
    """(encode_map value->(code,len), decode_map (len,code)->value)
    from the canonical BITS/HUFFVAL form (T.81 C.2)."""
    enc: dict[int, tuple[int, int]] = {}
    dec: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            enc[vals[k]] = (code, length)
            dec[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return enc, dec


def _decode_huff(r: _BitReader, dec) -> int:
    code, length = 0, 0
    while True:
        code = (code << 1) | r.bit()
        length += 1
        if (length, code) in dec:
            return dec[(length, code)]
        if length > 16:
            raise ValueError("invalid Huffman code (corrupt JPEG?)")


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t-bit magnitude to signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """(category t, t-bit code) for a signed DC/AC value."""
    if v == 0:
        return 0, 0
    t = int(abs(v)).bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1)


# ---------------------------------------------------------------- encoder
def quality_tables(quality: int = 75) -> tuple[np.ndarray, np.ndarray]:
    """Annex K tables scaled by the libjpeg quality curve (1..100)."""
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - q * 2
    def s(tbl):
        out = (tbl * scale + 50) // 100
        return np.clip(out, 1, 255).astype(np.int64)
    return s(QTABLE_LUMA), s(QTABLE_CHROMA)


def encode_baseline(
    img: np.ndarray,
    quality: int = 75,
    qtables: tuple[np.ndarray, np.ndarray] | None = None,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JPEG bytes from a uint8 (h, w) grayscale or (h, w, 3)
    RGB array. ``subsample=True`` writes 4:2:0 (2×2-averaged chroma).
    ``qtables`` overrides the quality-scaled Annex K tables — the
    probe passes an all-8 luma table for the DC-exact contract."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    ql, qc = qtables if qtables is not None else quality_tables(quality)

    if gray:
        comps = [img.astype(np.float64) - 128.0]
        samp = [(1, 1)]
        qsel = [0]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            # pad to even, average 2x2
            ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            def pad(c):
                return np.pad(c, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = pad(cb).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = pad(cr).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        comps = [y - 128.0, cb - 128.0, cr - 128.0]
        qsel = [0, 1, 1]

    hmax = max(sx for sx, _ in samp)
    vmax = max(sy for _, sy in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # pad each component to its MCU-aligned size
    padded = []
    for ci, c in enumerate(comps):
        sx, sy = samp[ci]
        cw, ch = mcus_x * 8 * sx, mcus_y * 8 * sy
        pc = np.zeros((ch, cw))
        ih, iw = c.shape
        pc[:ih, :iw] = c
        if iw < cw:
            pc[:ih, iw:] = c[:, -1:]
        if ih < ch:
            pc[ih:, :] = pc[ih - 1 : ih, :]
        padded.append(pc)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    # APP0 JFIF
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    # DQT (natural order -> zigzag order on the wire)
    for tid, tbl in ((0, ql), (1, qc))[: 1 if gray else 2]:
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(tbl[ZIGZAG[i]]) for i in range(64))
    # SOF0
    nc = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        sx, sy = samp[ci]
        out += bytes([ci + 1, (sx << 4) | sy, qsel[ci]])
    # DHT
    tables = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS), (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
    if not gray:
        tables += [(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS), (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)]
    for tclass_id, bits, vals in tables:
        out += b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(vals)) + bytes([tclass_id])
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += b"\x00\x3f\x00"

    dc_enc_l, _ = _build_huffman(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_enc_l, _ = _build_huffman(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_enc_c, _ = _build_huffman(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_enc_c, _ = _build_huffman(AC_CHROMA_BITS, AC_CHROMA_VALS)

    wtr = _BitWriter()
    pred = [0] * nc

    def encode_block(block: np.ndarray, q: np.ndarray, dc_enc, ac_enc, ci: int) -> None:
        coefs = dct2_blocks(block[None, :, :])[0]
        quant = np.round(coefs / q.reshape(8, 8)).astype(np.int64)
        zz = quant.flatten()[ZIGZAG]
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        t, code = _magnitude(diff)
        hc, hl = dc_enc[t]
        wtr.write(hc, hl)
        if t:
            wtr.write(code, t)
        run = 0
        for idx in range(1, 64):
            v = int(zz[idx])
            if v == 0:
                run += 1
                continue
            while run > 15:
                hc, hl = ac_enc[0xF0]  # ZRL
                wtr.write(hc, hl)
                run -= 16
            t, code = _magnitude(v)
            hc, hl = ac_enc[(run << 4) | t]
            wtr.write(hc, hl)
            wtr.write(code, t)
            run = 0
        if run:
            hc, hl = ac_enc[0x00]  # EOB
            wtr.write(hc, hl)

    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                wtr.flush()
                out += wtr.out
                out += bytes(
                    [0xFF, 0xD0 + (mcu_i // restart_interval - 1) % 8]
                )
                wtr = _BitWriter()
                pred[:] = [0] * nc
            for ci in range(nc):
                sx, sy = samp[ci]
                q = ql if qsel[ci] == 0 else qc
                dc_e = dc_enc_l if ci == 0 else dc_enc_c
                ac_e = ac_enc_l if ci == 0 else ac_enc_c
                for by in range(sy):
                    for bx in range(sx):
                        y0 = (my * sy + by) * 8
                        x0 = (mx * sx + bx) * 8
                        encode_block(
                            padded[ci][y0 : y0 + 8, x0 : x0 + 8],
                            q, dc_e, ac_e, ci,
                        )
            mcu_i += 1
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder
def decode_baseline(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG to uint8 (h, w) or (h, w, 3) RGB."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    while True:
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("EOI before SOS")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq == 0:
                    raw = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int64)
                    p += 64
                else:
                    raw = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int64)
                    p += 128
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = raw  # wire is zigzag order
                qtables[tq] = tbl
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1 (baseline/ext seq)
            prec, fh, fw, nc = seg[0], struct.unpack(">H", seg[1:3])[0], struct.unpack(">H", seg[3:5])[0], seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit precision baseline JPEG")
            comps = []
            for i in range(nc):
                cid, sf, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                comps.append({"id": cid, "sx": sf >> 4, "sy": sf & 0xF, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker == 0xC2:
            raise NotImplementedError(
                "progressive JPEG (SOF2) — baseline sequential only; plug "
                "libjpeg-turbo here for the full matrix"
            )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"unsupported JPEG process (SOF marker 0x{marker:02x})")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                nvals = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nvals])
                _, dec = _build_huffman(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = dec
                p += 17 + nvals
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append({"id": cs, "td": tt >> 4, "ta": tt & 0xF})
            pos += seglen
            break
        pos += seglen
    if frame is None:
        raise ValueError("SOS before SOF")

    if len(scan) != len(frame["comps"]):
        raise NotImplementedError(
            "non-interleaved multi-scan baseline JPEG (one SOS per "
            "component) — single interleaved scan only"
        )
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["sx"] for c in comps)
    vmax = max(c["sy"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    order = [by_id[s["id"]] | {"td": s["td"], "ta": s["ta"]} for s in scan]

    # coefficient stacks per component
    stacks = []
    for c in order:
        nb = (mcus_x * c["sx"]) * (mcus_y * c["sy"])
        stacks.append(np.zeros((nb, 64), dtype=np.int64))

    r = _BitReader(data, pos)
    pred = [0] * len(order)
    mcu_count = 0
    n_mcus = mcus_x * mcus_y

    def decode_block(ci: int, bidx: int) -> None:
        c = order[ci]
        dc_dec, ac_dec = huff_dc[c["td"]], huff_ac[c["ta"]]
        t = _decode_huff(r, dc_dec)
        diff = _extend(r.bits(t), t) if t else 0
        pred[ci] += diff
        zz = stacks[ci][bidx]
        zz[0] = pred[ci]
        k = 1
        while k < 64:
            rs = _decode_huff(r, ac_dec)
            rr, ss = rs >> 4, rs & 0xF
            if ss == 0:
                if rr == 15:
                    k += 16  # ZRL
                    continue
                break  # EOB
            k += rr
            if k > 63:
                raise ValueError("AC run past block end")
            zz[k] = _extend(r.bits(ss), ss)
            k += 1

    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                r.align_and_consume_rst()
                pred = [0] * len(order)
            try:
                for ci, c in enumerate(order):
                    for by in range(c["sy"]):
                        for bx in range(c["sx"]):
                            row = my * c["sy"] + by
                            col = mx * c["sx"] + bx
                            decode_block(ci, row * (mcus_x * c["sx"]) + col)
            except _RestartMarker:
                raise ValueError("unexpected restart marker") from None
            mcu_count += 1

    return _stacks_to_image(
        order, stacks, qtables, h, w, mcus_x, mcus_y, hmax, vmax
    )


def _stacks_to_image(
    order, stacks, qtables, h, w, mcus_x, mcus_y, hmax, vmax
) -> np.ndarray:
    """Dequantize + IDCT + upsample + crop + color-convert: the shared
    reconstruction tail of the sequential and progressive decoders
    (the two differ only in how the zigzag coefficient stacks fill)."""
    planes = []
    for ci, c in enumerate(order):
        q = qtables[c["tq"]]
        zz = stacks[ci]
        nat = np.zeros_like(zz)
        nat[:, ZIGZAG] = zz  # un-zigzag
        coefs = (nat * q).reshape(-1, 8, 8).astype(np.float64)
        px = idct2_blocks(coefs) + 128.0
        bw = mcus_x * c["sx"]
        bh = mcus_y * c["sy"]
        plane = (
            px.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        # upsample to full MCU grid (nearest), then crop
        ry, rx = vmax // c["sy"], hmax // c["sx"]
        if ry > 1 or rx > 1:
            plane = plane.repeat(ry, axis=0).repeat(rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r_ = y + 1.402 * cr
    g_ = y - 0.344136 * cb - 0.714136 * cr
    b_ = y + 1.772 * cb
    rgb = np.stack([r_, g_, b_], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- progressive
# T.81 Annex G (progressive DCT, Huffman): the same coefficient model
# as sequential, delivered as multiple SOS scans — spectral selection
# (a band Ss..Se per scan) and successive approximation (coefficients
# arrive Al bits at a time: a "first" scan at precision Al, then
# refinement scans each adding one bit). DC scans may interleave all
# components; AC scans are single-component by spec. EOB runs (EOBn
# symbols) amortize end-of-band across up to 2^14 blocks.


def _pt_ac(v: int, al: int) -> int:
    """AC point transform: divide by 2^al rounding TOWARD ZERO
    (T.81 G.1.1.2.2 — DC uses an arithmetic shift instead)."""
    return v >> al if v >= 0 else -((-v) >> al)


def decode_progressive(data: bytes) -> np.ndarray:
    """Decode a progressive (SOF2) JPEG to uint8 (h, w) or (h, w, 3).

    Every scan accumulates into per-component zigzag coefficient
    stacks (values stored pre-shifted by their Al, so refinement bits
    OR/add in place); reconstruction at EOI is the shared
    ``_stacks_to_image`` tail. Handles interleaved and single-
    component DC scans, banded AC first scans with EOB runs, AC/DC
    refinement (G.1.2.3 correction-bit protocol), DHT/DQT/DRI
    redefinition between scans, restart markers inside any scan, and
    0xFF fill bytes before markers."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    stacks: list[np.ndarray] = []
    geom = None  # (mcus_x, mcus_y, hmax, vmax)

    def scan_blocks_meta(comp):
        """(true blocks wide, true blocks high, padded row stride) for
        a NON-interleaved scan of one component (T.81 A.2.2: ceil of
        the component's own sampling-scaled size, NOT the MCU-padded
        grid)."""
        mcus_x, mcus_y, hmax, vmax = geom
        cw = -(-frame["w"] * comp["sx"] // hmax)
        ch = -(-frame["h"] * comp["sy"] // vmax)
        return -(-cw // 8), -(-ch // 8), mcus_x * comp["sx"]

    def decode_scan(scan, ss, se, ah, al, start: int) -> int:
        mcus_x, mcus_y, hmax, vmax = geom
        by_id = {c["id"]: i for i, c in enumerate(frame["comps"])}
        order = [
            (by_id[s["id"]], frame["comps"][by_id[s["id"]]], s)
            for s in scan
        ]
        r = _BitReader(data, start)
        pred = [0] * len(order)
        eobrun = 0
        p1 = 1 << al

        def dc_first(ci_s, zz):
            t = _decode_huff(r, huff_dc[order[ci_s][2]["td"]])
            diff = _extend(r.bits(t), t) if t else 0
            pred[ci_s] += diff
            zz[0] = pred[ci_s] << al

        def dc_refine(zz):
            if r.bit():
                zz[0] |= p1

        def ac_first(zz):
            nonlocal eobrun
            if eobrun:
                eobrun -= 1
                return
            ac_dec = huff_ac[order[0][2]["ta"]]
            k = ss
            while k <= se:
                rs = _decode_huff(r, ac_dec)
                rr, s_ = rs >> 4, rs & 0xF
                if s_ == 0:
                    if rr == 15:
                        k += 16  # ZRL
                        continue
                    eobrun = (1 << rr) - 1
                    if rr:
                        eobrun += r.bits(rr)
                    break
                k += rr
                if k > se:
                    raise ValueError("AC run past band end")
                zz[k] = _extend(r.bits(s_), s_) << al
                k += 1

        def _correct(zz, k):
            """Read one correction bit for a history-nonzero coef."""
            if r.bit() and (zz[k] & p1) == 0:
                zz[k] += p1 if zz[k] > 0 else -p1

        def ac_refine(zz):
            nonlocal eobrun
            ac_dec = huff_ac[order[0][2]["ta"]]
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _decode_huff(r, ac_dec)
                    rr, s_ = rs >> 4, rs & 0xF
                    if s_ == 0 and rr != 15:
                        eobrun = 1 << rr
                        if rr:
                            eobrun += r.bits(rr)
                        break
                    if s_ == 0:
                        val = 0  # ZRL: pass 16 zero-history coefs
                    else:
                        if s_ != 1:
                            raise ValueError(
                                "invalid magnitude in AC refinement scan"
                            )
                        val = p1 if r.bit() else -p1
                    while k <= se:
                        if zz[k] != 0:
                            _correct(zz, k)
                        else:
                            if rr == 0:
                                break
                            rr -= 1
                        k += 1
                    if val and k <= se:
                        zz[k] = val
                    k += 1
            if eobrun > 0:
                while k <= se:
                    if zz[k] != 0:
                        _correct(zz, k)
                    k += 1
                eobrun -= 1

        def maybe_restart(unit_i: int) -> None:
            nonlocal eobrun
            if restart_interval and unit_i and unit_i % restart_interval == 0:
                r.align_and_consume_rst()
                pred[:] = [0] * len(order)
                eobrun = 0

        if ss == 0 and se == 0:  # DC scan
            if len(order) > 1:  # interleaved: MCU order
                for mi in range(mcus_x * mcus_y):
                    maybe_restart(mi)
                    my, mx = divmod(mi, mcus_x)
                    for ci_s, (_, c, _s) in enumerate(order):
                        for by in range(c["sy"]):
                            for bx in range(c["sx"]):
                                row = my * c["sy"] + by
                                col = mx * c["sx"] + bx
                                zz = stacks[order[ci_s][0]][
                                    row * (mcus_x * c["sx"]) + col
                                ]
                                if ah == 0:
                                    dc_first(ci_s, zz)
                                else:
                                    dc_refine(zz)
            else:
                bw_t, bh_t, stride = scan_blocks_meta(order[0][1])
                for bi in range(bw_t * bh_t):
                    maybe_restart(bi)
                    row, col = divmod(bi, bw_t)
                    zz = stacks[order[0][0]][row * stride + col]
                    if ah == 0:
                        dc_first(0, zz)
                    else:
                        dc_refine(zz)
        else:  # AC scan
            if len(order) != 1:
                raise ValueError(
                    "progressive AC scan must be single-component (T.81 G.1)"
                )
            bw_t, bh_t, stride = scan_blocks_meta(order[0][1])
            for bi in range(bw_t * bh_t):
                maybe_restart(bi)
                row, col = divmod(bi, bw_t)
                zz = stacks[order[0][0]][row * stride + col]
                if ah == 0:
                    ac_first(zz)
                else:
                    ac_refine(zz)
        return r.pos

    while True:
        if pos + 1 >= len(data):
            raise ValueError("truncated JPEG: no EOI")
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        if data[pos + 1] == 0xFF:  # fill byte
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq == 0:
                    raw = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int64)
                    p += 64
                else:
                    raw = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int64)
                    p += 128
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = raw
                qtables[tq] = tbl
        elif marker == 0xC2:  # SOF2
            prec = seg[0]
            fh, fw, nc = (
                struct.unpack(">H", seg[1:3])[0],
                struct.unpack(">H", seg[3:5])[0],
                seg[5],
            )
            if prec != 8:
                raise NotImplementedError("only 8-bit precision JPEG")
            comps = []
            for i in range(nc):
                cid, sf, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                comps.append({"id": cid, "sx": sf >> 4, "sy": sf & 0xF, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
            hmax = max(c["sx"] for c in comps)
            vmax = max(c["sy"] for c in comps)
            mcus_x = -(-fw // (8 * hmax))
            mcus_y = -(-fh // (8 * vmax))
            geom = (mcus_x, mcus_y, hmax, vmax)
            stacks = [
                np.zeros(
                    ((mcus_x * c["sx"]) * (mcus_y * c["sy"]), 64),
                    dtype=np.int64,
                )
                for c in comps
            ]
        elif marker in (0xC0, 0xC1):
            raise ValueError("sequential SOF in decode_progressive — use decode()")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"unsupported JPEG process (SOF marker 0x{marker:02x})")
        elif marker == 0xC4:  # DHT (may redefine between scans)
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                nvals = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nvals])
                _, dec = _build_huffman(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = dec
                p += 17 + nvals
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — one scan
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            if len(seg) < 4 + 2 * ns:
                raise ValueError("truncated JPEG: SOS header cut short")
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append({"id": cs, "td": tt >> 4, "ta": tt & 0xF})
            ss_, se_ = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah_, al_ = ahal >> 4, ahal & 0xF
            if ss_ == 0 and se_ != 0:
                raise ValueError("progressive DC scan must have Se=0")
            pos = decode_scan(scan, ss_, se_, ah_, al_, pos + seglen)
            # resync to the next marker (skip pad bits / stray bytes)
            while pos + 1 < len(data) and not (
                data[pos] == 0xFF and data[pos + 1] != 0x00
            ):
                pos += 1
            continue
        pos += seglen
    if frame is None:
        raise ValueError("EOI before SOF")
    mcus_x, mcus_y, hmax, vmax = geom
    return _stacks_to_image(
        frame["comps"], stacks, qtables,
        frame["h"], frame["w"], mcus_x, mcus_y, hmax, vmax,
    )


def decode(data: bytes) -> np.ndarray:
    """Decode a JPEG, dispatching on the frame type: SOF0/SOF1 →
    ``decode_baseline``, SOF2 → ``decode_progressive``. This is the
    entry the media pipeline uses; the per-profile functions stay
    strict (``decode_baseline`` still rejects SOF2 by name)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    while pos + 1 < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        if data[pos + 1] == 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        if marker in (0xC0, 0xC1):
            return decode_baseline(data)
        if marker == 0xC2:
            return decode_progressive(data)
        if marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG process (SOF marker 0x{marker:02x})"
            )
        if marker in (0xD9, 0xDA):
            raise ValueError("no SOF before scan/EOI")
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        pos += seglen
    raise ValueError("truncated JPEG: no SOF marker found")


def _flat_huffman(symbols):
    """A minimal VALID Huffman table for a known symbol set: every
    symbol at the same code length L (smallest L with 2^L − 1 ≥ n, so
    the all-ones code stays unused as T.81 C.2 prefers). Deliberately
    not frequency-optimal — the progressive encoder exists to make
    fixtures, and a flat table exercises the decoder's any-DHT path
    rather than the Annex-K shortcut."""
    uniq = sorted(set(symbols))
    L = 1
    while (1 << L) - 1 < len(uniq):
        L += 1
    bits = [0] * 16
    bits[L - 1] = len(uniq)
    enc, _ = _build_huffman(bits, uniq)
    return bits, uniq, enc


def encode_progressive(
    img: np.ndarray,
    quality: int = 75,
    qtables: tuple[np.ndarray, np.ndarray] | None = None,
    subsample: bool = False,
    al_dc: int = 1,
    al_ac: int = 1,
    restart_interval: int = 0,
) -> bytes:
    """Progressive (SOF2) JPEG bytes from uint8 (h, w) grayscale or
    (h, w, 3) RGB. Scan script: interleaved DC first scan at Al=al_dc;
    per component, banded AC first scans at Al=al_ac (luma split 1–5 /
    6–63 to exercise spectral selection); per component, AC refinement
    scans stepping Al down to 0 (G.1.2.3 correction-bit protocol with
    EOB-run buffering); finally DC refinement scans. Each scan writes
    its own flat DHT (two-pass: collect symbols, then code), so EOBn
    symbols — absent from the Annex-K baseline tables — are covered.
    ``restart_interval`` applies per scan (MCUs for the interleaved DC
    scan, blocks for the rest). Exists to MAKE fixtures; decode is the
    product."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    ql, qc = qtables if qtables is not None else quality_tables(quality)

    if gray:
        comps = [img.astype(np.float64) - 128.0]
        samp = [(1, 1)]
        qsel = [0]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            def pad(c):
                return np.pad(c, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = pad(cb).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = pad(cr).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        comps = [y - 128.0, cb - 128.0, cr - 128.0]
        qsel = [0, 1, 1]

    nc = len(comps)
    hmax = max(sx for sx, _ in samp)
    vmax = max(sy for _, sy in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # quantized zigzag coefficient stacks over the padded MCU grid
    stacks = []
    true_grid = []
    for ci, c in enumerate(comps):
        sx, sy = samp[ci]
        cw, ch = mcus_x * 8 * sx, mcus_y * 8 * sy
        pc = np.zeros((ch, cw))
        ih, iw = c.shape
        pc[:ih, :iw] = c
        if iw < cw:
            pc[:ih, iw:] = c[:, -1:]
        if ih < ch:
            pc[ih:, :] = pc[ih - 1 : ih, :]
        blocks = (
            pc.reshape(ch // 8, 8, cw // 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8)
        )
        q = (ql if qsel[ci] == 0 else qc).reshape(8, 8)
        quant = np.round(dct2_blocks(blocks) / q).astype(np.int64)
        stacks.append(quant.reshape(-1, 64)[:, ZIGZAG])
        tw = -(-(-(-w * sx // hmax)) // 8)
        th = -(-(-(-h * sy // vmax)) // 8)
        true_grid.append((tw, th, cw // 8))

    out = bytearray()
    out += b"\xff\xd8"
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    for tid, tbl in ((0, ql), (1, qc))[: 1 if gray else 2]:
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(tbl[ZIGZAG[i]]) for i in range(64))
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        sx, sy = samp[ci]
        out += bytes([ci + 1, (sx << 4) | sy, qsel[ci]])
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    def emit_scan(comp_ids, ss, se, ah, al, tokens, tclass) -> None:
        syms = [t[1] for t in tokens if t[0] == "sym"]
        if syms:
            bits, vals, enc = _flat_huffman(syms)
            out.extend(
                b"\xff\xc4"
                + struct.pack(">H", 3 + 16 + len(vals))
                + bytes([(tclass << 4) | 0])
                + bytes(bits)
                + bytes(vals)
            )
        else:
            enc = {}
        ns = len(comp_ids)
        out.extend(b"\xff\xda" + struct.pack(">HB", 6 + 2 * ns, ns))
        for cid in comp_ids:
            out.extend(bytes([cid, 0x00]))
        out.extend(bytes([ss, se, (ah << 4) | al]))
        wtr = _BitWriter()
        rstn = 0
        for t in tokens:
            if t[0] == "sym":
                c_, l_ = enc[t[1]]
                wtr.write(c_, l_)
            elif t[0] == "bits":
                wtr.write(t[1], t[2])
            else:  # ("rst",)
                wtr.flush()
                out.extend(wtr.out)
                out.extend(bytes([0xFF, 0xD0 + rstn % 8]))
                rstn += 1
                wtr = _BitWriter()
        wtr.flush()
        out.extend(wtr.out)

    # ---- scan 1: DC first, interleaved, point transform = arithmetic shift
    tokens: list[tuple] = []
    pred = [0] * nc
    for mi in range(mcus_x * mcus_y):
        if restart_interval and mi and mi % restart_interval == 0:
            tokens.append(("rst",))
            pred = [0] * nc
        my, mx = divmod(mi, mcus_x)
        for ci in range(nc):
            sx, sy = samp[ci]
            for by in range(sy):
                for bx in range(sx):
                    row = my * sy + by
                    col = mx * sx + bx
                    v = int(stacks[ci][row * (mcus_x * sx) + col][0]) >> al_dc
                    diff = v - pred[ci]
                    pred[ci] = v
                    t, code = _magnitude(diff)
                    tokens.append(("sym", t))
                    if t:
                        tokens.append(("bits", code, t))
    emit_scan(list(range(1, nc + 1)), 0, 0, 0, al_dc, tokens, 0)

    # ---- AC first scans (banded for luma), per component
    def ac_first_tokens(ci, ss, se, al):
        tokens = []
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                n = eobrun.bit_length() - 1
                tokens.append(("sym", n << 4))
                if n:
                    tokens.append(("bits", eobrun - (1 << n), n))
                eobrun = 0

        tw, th, stride = true_grid[ci]
        for bi in range(tw * th):
            if restart_interval and bi and bi % restart_interval == 0:
                flush_eob()
                tokens.append(("rst",))
            row, col = divmod(bi, tw)
            zz = stacks[ci][row * stride + col]
            run = 0
            any_sig = False
            for k in range(ss, se + 1):
                v = _pt_ac(int(zz[k]), al)
                if v == 0:
                    run += 1
                    continue
                any_sig = True
                while run > 15:
                    flush_eob()
                    tokens.append(("sym", 0xF0))
                    run -= 16
                t, code = _magnitude(v)
                flush_eob()
                tokens.append(("sym", (run << 4) | t))
                tokens.append(("bits", code, t))
                run = 0
            if run or not any_sig:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
        flush_eob()
        return tokens

    # ---- AC refinement scans (G.1.2.3): correction bits attach to the
    # symbol that passes over them; trailing bits ride the EOB run
    def ac_refine_tokens(ci, ss, se, ah, al):
        tokens = []
        eobrun = 0
        be: list[int] = []

        def flush_eob_be():
            nonlocal eobrun, be
            if eobrun:
                n = eobrun.bit_length() - 1
                tokens.append(("sym", n << 4))
                if n:
                    tokens.append(("bits", eobrun - (1 << n), n))
                for b_ in be:
                    tokens.append(("bits", b_, 1))
                eobrun = 0
                be = []

        tw, th, stride = true_grid[ci]
        for bi in range(tw * th):
            if restart_interval and bi and bi % restart_interval == 0:
                flush_eob_be()
                tokens.append(("rst",))
            row, col = divmod(bi, tw)
            zz = stacks[ci][row * stride + col]
            a = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
            eobpos = -1
            for i, t in enumerate(a):
                if t == 1:
                    eobpos = i
            run = 0
            br: list[int] = []
            for i, t in enumerate(a):
                if t == 0:
                    run += 1
                    continue
                while run > 15 and i <= eobpos:
                    flush_eob_be()
                    tokens.append(("sym", 0xF0))
                    run -= 16
                    for b_ in br:
                        tokens.append(("bits", b_, 1))
                    br = []
                if t > 1:
                    br.append(t & 1)
                    continue
                flush_eob_be()
                tokens.append(("sym", (run << 4) | 1))
                tokens.append(
                    ("bits", 1 if int(zz[ss + i]) > 0 else 0, 1)
                )
                for b_ in br:
                    tokens.append(("bits", b_, 1))
                br = []
                run = 0
            if run > 0 or br:
                eobrun += 1
                be.extend(br)
                if eobrun == 0x7FFF:
                    flush_eob_be()
        flush_eob_be()
        return tokens

    for ci in range(nc):
        bands = [(1, 5), (6, 63)] if ci == 0 else [(1, 63)]
        for ss, se in bands:
            emit_scan(
                [ci + 1], ss, se, 0, al_ac,
                ac_first_tokens(ci, ss, se, al_ac), 1,
            )
    for ci in range(nc):
        for a in range(al_ac, 0, -1):
            emit_scan(
                [ci + 1], 1, 63, a, a - 1,
                ac_refine_tokens(ci, 1, 63, a, a - 1), 1,
            )

    # ---- DC refinement scans: raw bits, no Huffman table
    for a in range(al_dc, 0, -1):
        tokens = []
        for mi in range(mcus_x * mcus_y):
            if restart_interval and mi and mi % restart_interval == 0:
                tokens.append(("rst",))
            my, mx = divmod(mi, mcus_x)
            for ci in range(nc):
                sx, sy = samp[ci]
                for by in range(sy):
                    for bx in range(sx):
                        row = my * sy + by
                        col = mx * sx + bx
                        v = int(stacks[ci][row * (mcus_x * sx) + col][0])
                        tokens.append(("bits", (v >> (a - 1)) & 1, 1))
        emit_scan(list(range(1, nc + 1)), 0, 0, a, a - 1, tokens, 0)

    out += b"\xff\xd9"
    return bytes(out)
