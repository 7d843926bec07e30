"""Baseline JPEG codec in pure numpy + stdlib — no codec libraries.

The reference validates/compresses JPEG images with sharp
(/root/reference/src/services/image.service.js:186-240); this module gives the
Spark multimodal operators (operators/multimodal.py) a REAL pixel path for
image/jpeg, same as the BMP and PNG codecs beside it.

Scope (honest, loudly gated):

* **decode**: baseline sequential DCT (SOF0/1) AND progressive DCT (SOF2 —
  spectral selection + successive approximation per ITU T.81 Annex G,
  round 4: full sharp/libjpeg-default parity for the reference's JPEG
  intake), 8-bit AND 12-bit precision (12-bit output downscaled to the
  8-bit domain, libjpeg-style), 1-component grayscale, 3-component YCbCr
  or Adobe-marked stored-RGB, 4-component Adobe CMYK / YCCK (APP14
  transform byte; no APP14 = plain CMYK) — every color layout sharp's
  libjpeg accepts. Any sampling factors 1-2 (4:4:4, 4:2:2, 4:2:0, ...),
  multiple DQT/DHT segments, restart markers (DRI/RSTn) in both modes,
  interleaved and non-interleaved scans. Arithmetic coding and
  hierarchical/lossless processes raise ValueError with a clear message.
* **encode**: baseline sequential, quality-scaled Annex-K quantization
  tables, Annex-K Huffman tables, 4:4:4 (subsample=False) or 4:2:0
  (subsample=True), grayscale for 2-D input, JFIF APP0 header. Plus
  encode_jpeg_progressive: the libjpeg-style 10-scan script (DC + AC
  spectral bands with successive approximation) — primarily the test
  vector generator for the progressive decoder; its AC scans use a flat
  fixed Huffman table (every (run,size) + EOBn symbol at 8 bits) rather
  than per-scan optimal tables, trading compression for simplicity.
  Plus encode_jpeg_cmyk (Adobe APP14 CMYK / YCCK) and encode_jpeg_12bit
  (extended 12-bit Huffman tables), the test-vector generators for the
  matching decode paths and honest standalone encoders for those shapes.

Everything operates on HxWx3 (RGB) or HxW (gray) uint8 numpy arrays. The DCT
is the exact orthonormal 8x8 transform as two matrix products; entropy coding
is the canonical Annex-F procedure. Designed for correctness on the
validation/compression path (documents-scale images), not for codec-grade
throughput: at 100 TB scale these run Arrow-batched inside mapInPandas where
the per-image Python cost is amortized per batch and fully data-parallel.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Constants: zigzag order, Annex-K quantization + Huffman tables
# ---------------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
UNZIGZAG = np.argsort(ZIGZAG)

# ITU T.81 Annex K.1 — luminance / chrominance quantization (natural order)
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 Huffman table specs: (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8x8 DCT-II matrix: dct(X) = C @ X @ C.T ; idct(Y) = C.T @ Y @ C
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = np.cos((2 * _x + 1) * _u * np.pi / 16) * (
            np.sqrt(1 / 8) if _u == 0 else 0.5
        )


def dct2_blocks(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) float spatial -> (n, 8, 8) DCT coefficients."""
    return np.einsum("ux,nxy,vy->nuv", _C, blocks, _C, optimize=True)


def idct2_blocks(coefs: np.ndarray) -> np.ndarray:
    """(n, 8, 8) DCT coefficients -> (n, 8, 8) float spatial."""
    return np.einsum("ux,nuv,vy->nxy", _C, coefs, _C, optimize=True)


# ---------------------------------------------------------------------------
# Huffman tables (canonical, Annex C/F)
# ---------------------------------------------------------------------------

def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecoder:
    """Canonical Huffman decode state per T.81 F.2.2.3 (MINCODE/MAXCODE)."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code, k = 0, 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1

    def decode(self, br: "_BitReader") -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            if self.maxcode[length] >= code >= self.mincode[length]:
                return self.vals[self.valptr[length] + code - self.mincode[length]]
        raise ValueError("invalid JPEG Huffman code")


class _BitReader:
    """MSB-first bit reader over unstuffed entropy bytes."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy data")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s

    def write_marker(self, byte: int) -> None:
        """Byte-align then emit a marker (markers are never stuffed)."""
        self.align()
        self.out += bytes([0xFF, byte])

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """signed value -> (ssss category, magnitude bits per T.81 F.1.2.1.1)."""
    if v == 0:
        return 0, 0
    t = int(abs(v)).bit_length()
    return t, v if v >= 0 else v + (1 << t) - 1


# ---------------------------------------------------------------------------
# Color transforms (JFIF / BT.601 full-range)
# ---------------------------------------------------------------------------

def rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    f = arr.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb_f(ycc: np.ndarray) -> np.ndarray:
    """Float YCbCr -> float RGB, unclipped (shared by the uint8 wrapper and
    the YCCK branch of the 4-component decode path)."""
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    return np.clip(_ycbcr_to_rgb_f(ycc).round(), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling of an Annex-K table."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int64)


def _to_blocks(plane: np.ndarray, level: float = 128.0) -> tuple[np.ndarray, int, int]:
    """Edge-pad a 2-D plane to 8-multiples -> ((by*bx), 8, 8) float blocks."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hh, ww = plane.shape
    by, bx = hh // 8, ww // 8
    blocks = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return blocks.astype(np.float64) - level, by, bx


def _encode_plane_coefs(
    plane: np.ndarray, qtab: np.ndarray, level: float = 128.0
) -> tuple[np.ndarray, int, int]:
    """-> (quantized zigzag coefs (n, 64) int, blocks_y, blocks_x)."""
    blocks, by, bx = _to_blocks(plane, level)
    coefs = dct2_blocks(blocks).reshape(-1, 64)
    q = np.round(coefs / qtab[UNZIGZAG].reshape(1, 64))  # qtab is zigzag order
    return q[:, ZIGZAG].astype(np.int64), by, bx  # reorder natural -> zigzag


def _huff_encode_block(
    bw: _BitWriter,
    zz: np.ndarray,
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    diff = int(zz[0]) - pred
    t, bits_ = _magnitude(diff)
    code, ln = dc_codes[t]
    bw.write(code, ln)
    if t:
        bw.write(bits_, t)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        t, bits_ = _magnitude(v)
        code, ln = ac_codes[(run << 4) | t]
        bw.write(code, ln)
        bw.write(bits_, t)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return int(zz[0])


def _dht_segment(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_segment(tq: int, qtab_zz: np.ndarray) -> bytes:
    body = bytes([tq]) + bytes(int(v) for v in qtab_zz)
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """HxWx3 uint8 RGB (or HxW gray) -> baseline JFIF JPEG bytes.

    subsample=False emits 4:4:4; subsample=True emits 4:2:0 (chroma halved
    with 2x2 box averaging, the common camera/sharp default).
    restart_interval > 0 emits a DRI segment and RSTn markers every that
    many MCUs (DC predictors reset, bitstream byte-aligned)."""
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if h < 1 or w < 1:
        raise ValueError("empty image")
    ql = _quality_scale(QUANT_LUMA, quality)[ZIGZAG]  # zigzag order for DQT
    qc = _quality_scale(QUANT_CHROMA, quality)[ZIGZAG]

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes([1, 1, 0]) +
        struct.pack(">HH", 1, 1) + bytes([0, 0])
    )
    out += _dqt_segment(0, ql)
    if not gray:
        out += _dqt_segment(1, qc)

    # SOF0
    ncomp = 1 if gray else 3
    sf_luma = (2, 2) if (subsample and not gray) else (1, 1)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    sof += bytes([1, sf_luma[0] << 4 | sf_luma[1], 0])
    if not gray:
        sof += bytes([2, 0x11, 1, 3, 0x11, 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof

    out += _dht_segment(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += _dht_segment(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        out += _dht_segment(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += _dht_segment(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    # SOS
    sos = bytes([ncomp, 1, 0x00])
    if not gray:
        sos += bytes([2, 0x11, 3, 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    dc_l = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    # Build the per-MCU block sequence: list of (zigzag_coefs, comp) where
    # comp 0 = luma, 1/2 = chroma — one flat list drives entropy + RST logic
    # for every mode (gray, 4:4:4, 4:2:0).
    mcus: list[list[tuple[np.ndarray, int]]] = []
    if gray:
        zz, by, bx = _encode_plane_coefs(arr.astype(np.float64), ql)
        mcus = [[(zz[i], 0)] for i in range(by * bx)]
    else:
        ycc = rgb_to_ycbcr(arr)
        y_p, cb_p, cr_p = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsample:
            # pad to even then 2x2 box-average the chroma planes
            ph, pw = -h % 2, -w % 2
            if ph or pw:
                cb_p = np.pad(cb_p, ((0, ph), (0, pw)), mode="edge")
                cr_p = np.pad(cr_p, ((0, ph), (0, pw)), mode="edge")
            hh, ww = cb_p.shape
            cb_p = cb_p.reshape(hh // 2, 2, ww // 2, 2).mean(axis=(1, 3))
            cr_p = cr_p.reshape(hh // 2, 2, ww // 2, 2).mean(axis=(1, 3))
            # luma MCU is 16x16: pad luma block grid to even block counts
            zz_y, by, bx = _encode_plane_coefs(y_p, ql)
            if by % 2 or bx % 2:
                grid = zz_y.reshape(by, bx, 64)
                grid = np.pad(grid, ((0, by % 2), (0, bx % 2), (0, 0)), mode="edge")
                by, bx = grid.shape[:2]
                zz_y = grid.reshape(-1, 64)
            zz_cb, cby, cbx = _encode_plane_coefs(cb_p, qc)
            zz_cr, _, _ = _encode_plane_coefs(cr_p, qc)
            for my in range(by // 2):
                for mx in range(bx // 2):
                    blocks = [
                        (zz_y[(my * 2 + dy) * bx + (mx * 2 + dx)], 0)
                        for dy in range(2)
                        for dx in range(2)
                    ]
                    j = my * cbx + mx
                    blocks += [(zz_cb[j], 1), (zz_cr[j], 2)]
                    mcus.append(blocks)
        else:
            zz_y, by, bx = _encode_plane_coefs(y_p, ql)
            zz_cb, _, _ = _encode_plane_coefs(cb_p, qc)
            zz_cr, _, _ = _encode_plane_coefs(cr_p, qc)
            mcus = [
                [(zz_y[i], 0), (zz_cb[i], 1), (zz_cr[i], 2)] for i in range(by * bx)
            ]

    bw = _BitWriter()
    preds = [0, 0, 0]
    rst = 0
    for m, blocks in enumerate(mcus):
        if restart_interval and m and m % restart_interval == 0:
            bw.write_marker(0xD0 + rst % 8)
            rst += 1
            preds = [0, 0, 0]
        for zz_blk, comp in blocks:
            dc, ac = (dc_l, ac_l) if comp == 0 else (dc_c, ac_c)
            preds[comp] = _huff_encode_block(bw, zz_blk, preds[comp], dc, ac)

    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _encode_planes_baseline(
    planes: list[np.ndarray],
    tbl_group: list[int],
    quality: int = 90,
    precision: int = 8,
    adobe_transform: int | None = None,
) -> bytes:
    """Shared baseline encoder over explicit stored-sample planes.

    ``planes``: 2-D float64 arrays of identical shape, values already in the
    STORED domain (0..2^precision-1); ``tbl_group[i]`` in {0 (luma), 1
    (chroma)} picks the quantization/Huffman table pair per component.
    Always 4:4:4, one interleaved scan, component ids 1..n.
    ``adobe_transform`` is not None -> an Adobe APP14 segment is written
    (how CMYK/YCCK 4-component and RGB-stored 3-component streams are
    marked in the wild). ``precision`` 12 switches to the extended Huffman
    tables (DC categories <=15, AC sizes <=14), a 2048 level shift and
    coefficient clipping to the T.81 12-bit AC range.
    Test-vector generator for decode_jpeg's CMYK/YCCK/RGB/12-bit paths and
    an honest standalone encoder for those stream shapes."""
    if precision not in (8, 12):
        raise ValueError(f"unsupported JPEG precision {precision}")
    if len(planes) != len(tbl_group) or not planes:
        raise ValueError("planes/tbl_group mismatch")
    h, w = planes[0].shape
    if h < 1 or w < 1:
        raise ValueError("empty image")
    level = float(1 << (precision - 1))
    ql = _quality_scale(QUANT_LUMA, quality)[ZIGZAG]
    qc = _quality_scale(QUANT_CHROMA, quality)[ZIGZAG]
    use_chroma = any(g == 1 for g in tbl_group)

    out = bytearray(b"\xff\xd8")  # SOI
    if adobe_transform is not None:
        app14 = b"Adobe" + struct.pack(">HHHB", 100, 0, 0, adobe_transform)
        out += b"\xff\xee" + struct.pack(">H", len(app14) + 2) + app14
    elif precision == 8:
        out += (
            b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes([1, 1, 0]) +
            struct.pack(">HH", 1, 1) + bytes([0, 0])
        )
    out += _dqt_segment(0, ql)
    if use_chroma:
        out += _dqt_segment(1, qc)

    sof = bytes([precision]) + struct.pack(">HH", h, w) + bytes([len(planes)])
    for i, g in enumerate(tbl_group):
        sof += bytes([i + 1, 0x11, g])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof

    if precision == 12:
        out += _dht_segment(0, 0, DC12_BITS, DC12_VALS)
        out += _dht_segment(1, 0, AC12_BITS, AC12_VALS)
        dc_codes = [_build_codes(DC12_BITS, DC12_VALS)] * 2
        ac_codes = [_build_codes(AC12_BITS, AC12_VALS)] * 2
        huff_ids = [0] * len(planes)  # one table pair serves every component
    else:
        out += _dht_segment(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
        out += _dht_segment(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
        if use_chroma:
            out += _dht_segment(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
            out += _dht_segment(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
        dc_codes = [
            _build_codes(DC_LUMA_BITS, DC_LUMA_VALS),
            _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS),
        ]
        ac_codes = [
            _build_codes(AC_LUMA_BITS, AC_LUMA_VALS),
            _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS),
        ]
        huff_ids = list(tbl_group)

    sos = bytes([len(planes)])
    for i, hid in enumerate(huff_ids):
        sos += bytes([i + 1, hid << 4 | hid])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    zzs = []
    nblocks = 0
    for p, g in zip(planes, tbl_group):
        zz, by, bx = _encode_plane_coefs(
            p.astype(np.float64), ql if g == 0 else qc, level
        )
        if precision == 12:
            zz = np.clip(zz, -16383, 16383)  # T.81 12-bit AC coefficient range
        zzs.append(zz)
        nblocks = by * bx

    bw = _BitWriter()
    preds = [0] * len(planes)
    for m in range(nblocks):
        for ci, zz in enumerate(zzs):
            hid = huff_ids[ci]
            preds[ci] = _huff_encode_block(
                bw, zz[m], preds[ci], dc_codes[hid], ac_codes[hid]
            )
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_cmyk(cmyk: np.ndarray, quality: int = 90, transform: int = 0) -> bytes:
    """HxWx4 uint8 CMYK ink values (0 = no ink) -> Adobe APP14 JPEG bytes.

    transform=0 stores the Adobe-inverted CMYK planes directly; transform=2
    stores YCCK (the inverted CMY run through the YCbCr transform, K as-is)
    — the two 4-component layouts Adobe products emit and sharp/libjpeg
    accept (/root/reference/src/services/image.service.js:186-240 takes any
    JPEG sharp can open)."""
    if cmyk.ndim != 3 or cmyk.shape[2] != 4:
        raise ValueError("encode_jpeg_cmyk expects an HxWx4 array")
    stored = 255.0 - cmyk.astype(np.float64)  # Adobe stores inverted ink
    if transform == 2:
        ycc = rgb_to_ycbcr(stored[..., :3])
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2], stored[..., 3]]
        groups = [0, 1, 1, 0]
    elif transform == 0:
        planes = [stored[..., i] for i in range(4)]
        groups = [0, 0, 0, 0]
    else:
        raise ValueError(f"unsupported Adobe transform {transform}")
    return _encode_planes_baseline(planes, groups, quality, adobe_transform=transform)


def encode_jpeg_12bit(arr: np.ndarray, quality: int = 90) -> bytes:
    """HxW (gray) or HxWx3 (RGB) samples 0..4095 -> 12-bit baseline JPEG."""
    f = arr.astype(np.float64)
    if arr.ndim == 2:
        return _encode_planes_baseline([f], [0], quality, precision=12)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_jpeg_12bit expects HxW or HxWx3")
    ycc = rgb_to_ycbcr(f / 16.0) * 16.0  # BT.601 at 12-bit amplitude
    return _encode_planes_baseline(
        [ycc[..., 0], ycc[..., 1], ycc[..., 2]], [0, 1, 1], quality, precision=12
    )


# ---------------------------------------------------------------------------
# Progressive encoder (T.81 Annex G) — the test-vector generator for the
# progressive decoder below; also a valid standalone encoder.
# ---------------------------------------------------------------------------

# Flat AC Huffman table for progressive scans: every symbol a progressive AC
# scan can emit — (run 0-15, size 1-11), EOBn (run 0-14, size 0) and ZRL —
# at a uniform 8-bit code length (208 of 256 codepoints; the table is
# deliberately incomplete, which T.81 permits). The Annex-K sequential AC
# tables lack the EOBn symbols 0x10..0xE0, so they cannot express EOB runs;
# real progressive encoders build per-scan optimal tables, this one trades
# compression ratio for a fixed, trivially correct table.
AC_PROG_VALS = sorted(
    {(r << 4) | s for r in range(16) for s in range(1, 12)}
    | {r << 4 for r in range(15)}
    | {0xF0}
)
AC_PROG_BITS = [0, 0, 0, 0, 0, 0, 0, len(AC_PROG_VALS), 0, 0, 0, 0, 0, 0, 0, 0]

# Extended Huffman tables for 12-bit precision frames (T.81 tables F.6/F.7
# ranges: DC categories 0..15, AC sizes 1..14). Like AC_PROG these trade
# compression for a fixed, trivially-correct table — the canonical code
# assignment leaves the all-ones prefix unused at every length.
DC12_BITS = [0, 0, 0, 0, 15, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
DC12_VALS = list(range(16))
AC12_VALS = sorted({(r << 4) | s for r in range(16) for s in range(1, 15)} | {0x00, 0xF0})
AC12_BITS = [0, 0, 0, 0, 0, 0, 0, len(AC12_VALS), 0, 0, 0, 0, 0, 0, 0, 0]


def _flush_eobrun(bw: _BitWriter, ac_codes, state: dict) -> None:
    """Emit the accumulated EOB run (EOBn symbol + extension bits) followed
    by the refinement correction bits buffered inside that run."""
    e = state["eobrun"]
    if e > 0:
        r = e.bit_length() - 1
        code, ln = ac_codes[r << 4]
        bw.write(code, ln)
        if r:
            bw.write(e - (1 << r), r)
        state["eobrun"] = 0
    for b in state["pending"]:
        bw.write(b, 1)
    state["pending"] = []


def _enc_dc_first(bw, dc_codes, blk, ci, preds, al) -> None:
    v = int(blk[0]) >> al  # DC point transform: arithmetic shift (G.1.2.1)
    diff = v - preds[ci]
    preds[ci] = v
    t, bits_ = _magnitude(diff)
    code, ln = dc_codes[t]
    bw.write(code, ln)
    if t:
        bw.write(bits_, t)


def _enc_ac_first(bw, ac_codes, blk, ss, se, al, state) -> None:
    """AC first scan for one block (G.1.2.2: magnitudes truncated toward
    zero by the point transform; EOB runs accumulated across blocks)."""
    r = 0
    for k in range(ss, se + 1):
        v = int(blk[k])
        av = (v if v >= 0 else -v) >> al
        if av == 0:
            r += 1
            continue
        _flush_eobrun(bw, ac_codes, state)
        while r > 15:
            code, ln = ac_codes[0xF0]
            bw.write(code, ln)
            r -= 16
        t, bits_ = _magnitude(av if v >= 0 else -av)
        code, ln = ac_codes[(r << 4) | t]
        bw.write(code, ln)
        bw.write(bits_, t)
        r = 0
    if r > 0:
        state["eobrun"] += 1
        if state["eobrun"] == 0x7FFF:
            _flush_eobrun(bw, ac_codes, state)


def _enc_ac_refine(bw, ac_codes, blk, ss, se, al, state) -> None:
    """AC refinement scan for one block (G.1.2.3): newly-nonzero coefs get
    a (run,1) symbol + sign bit; already-nonzero coefs contribute one
    correction bit each, buffered so they land after the symbol (or EOBn)
    that covers their position."""
    p1 = 1 << al
    absvals = [0] * (se + 1 - ss)
    eobpos = ss - 1  # position of the LAST newly-nonzero coef in band
    for k in range(ss, se + 1):
        v = int(blk[k])
        av = (v if v >= 0 else -v) >> al
        absvals[k - ss] = av
        if av == 1:
            eobpos = k
    r = 0
    br_bits: list[int] = []
    for k in range(ss, se + 1):
        temp = absvals[k - ss]
        if temp == 0:
            r += 1
            continue
        while r > 15 and k <= eobpos:
            _flush_eobrun(bw, ac_codes, state)
            code, ln = ac_codes[0xF0]
            bw.write(code, ln)
            r -= 16
            for b in br_bits:
                bw.write(b, 1)
            br_bits = []
        if temp > 1:  # already nonzero at the previous precision
            br_bits.append(temp & 1)
            continue
        _flush_eobrun(bw, ac_codes, state)
        code, ln = ac_codes[(r << 4) | 1]
        bw.write(code, ln)
        bw.write(1 if int(blk[k]) >= 0 else 0, 1)
        for b in br_bits:
            bw.write(b, 1)
        br_bits = []
        r = 0
    if r > 0 or br_bits:
        state["eobrun"] += 1
        state["pending"].extend(br_bits)
        if state["eobrun"] == 0x7FFF or len(state["pending"]) > 937:
            _flush_eobrun(bw, ac_codes, state)


def encode_jpeg_progressive(
    arr: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """HxWx3 uint8 RGB (or HxW gray) -> PROGRESSIVE (SOF2) JFIF JPEG bytes.

    Scan script mirrors libjpeg's default simple progression: interleaved
    DC at Al=1; luma AC 1-5 then 6-63 at Al=2; chroma AC 1-63 at Al=1; AC
    refinements down to Al=0; one DC refinement — so a decode exercises
    every Annex-G procedure (DC/AC x first/refine, EOB runs, ZRL) and the
    complete progression reconstructs the coefficients EXACTLY, making the
    output pixel-identical to the baseline encoding of the same image
    (asserted by tests/test_jpeg.py)."""
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if h < 1 or w < 1:
        raise ValueError("empty image")
    ql = _quality_scale(QUANT_LUMA, quality)[ZIGZAG]
    qc = _quality_scale(QUANT_CHROMA, quality)[ZIGZAG]

    # --- per-component coefficient grids -----------------------------------
    # comps: (comp_index, grid(by,bx,64), nby, nbx) where (nby,nbx) are the
    # NON-interleaved block dims (ceil of the component's true size); the
    # grid may be larger (MCU padding) and the extra blocks are only coded
    # by the interleaved DC scan.
    if gray:
        zz, by, bx = _encode_plane_coefs(arr.astype(np.float64), ql)
        comps = [(0, zz.reshape(by, bx, 64), by, bx)]
        mcuy, mcux = by, bx
        sf = [(1, 1)]
    else:
        ycc = rgb_to_ycbcr(arr)
        y_p, cb_p, cr_p = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsample:
            ph, pw = -h % 2, -w % 2
            if ph or pw:
                cb_p = np.pad(cb_p, ((0, ph), (0, pw)), mode="edge")
                cr_p = np.pad(cr_p, ((0, ph), (0, pw)), mode="edge")
            hh, ww = cb_p.shape
            cb_p = cb_p.reshape(hh // 2, 2, ww // 2, 2).mean(axis=(1, 3))
            cr_p = cr_p.reshape(hh // 2, 2, ww // 2, 2).mean(axis=(1, 3))
            zz_y, by, bx = _encode_plane_coefs(y_p, ql)
            nby, nbx = by, bx  # true luma block dims before MCU padding
            if by % 2 or bx % 2:
                grid = zz_y.reshape(by, bx, 64)
                grid = np.pad(grid, ((0, by % 2), (0, bx % 2), (0, 0)), mode="edge")
                by, bx = grid.shape[:2]
                zz_y = grid.reshape(-1, 64)
            zz_cb, cby, cbx = _encode_plane_coefs(cb_p, qc)
            zz_cr, _, _ = _encode_plane_coefs(cr_p, qc)
            comps = [
                (0, zz_y.reshape(by, bx, 64), nby, nbx),
                (1, zz_cb.reshape(cby, cbx, 64), cby, cbx),
                (2, zz_cr.reshape(cby, cbx, 64), cby, cbx),
            ]
            mcuy, mcux = by // 2, bx // 2
            sf = [(2, 2), (1, 1), (1, 1)]
        else:
            zz_y, by, bx = _encode_plane_coefs(y_p, ql)
            zz_cb, _, _ = _encode_plane_coefs(cb_p, qc)
            zz_cr, _, _ = _encode_plane_coefs(cr_p, qc)
            comps = [
                (0, zz_y.reshape(by, bx, 64), by, bx),
                (1, zz_cb.reshape(by, bx, 64), by, bx),
                (2, zz_cr.reshape(by, bx, 64), by, bx),
            ]
            mcuy, mcux = by, bx
            sf = [(1, 1)] * 3

    # --- headers ------------------------------------------------------------
    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes([1, 1, 0]) +
        struct.pack(">HH", 1, 1) + bytes([0, 0])
    )
    out += _dqt_segment(0, ql)
    if not gray:
        out += _dqt_segment(1, qc)
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        hf, vf = sf[ci]
        sof += bytes([ci + 1, hf << 4 | vf, 0 if ci == 0 else 1])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof  # SOF2
    out += _dht_segment(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += _dht_segment(1, 0, AC_PROG_BITS, AC_PROG_VALS)
    if not gray:
        out += _dht_segment(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    dc_codes = [
        _build_codes(DC_LUMA_BITS, DC_LUMA_VALS),
        _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS),
    ]
    ac_codes = _build_codes(AC_PROG_BITS, AC_PROG_VALS)

    # --- scan script (libjpeg jcparam.c simple progression) -----------------
    if gray:
        script = [
            ([0], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
        ]
    else:
        script = [
            ([0, 1, 2], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([1], 1, 63, 0, 1),
            ([2], 1, 63, 0, 1),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0, 1, 2], 0, 0, 1, 0),
            ([1], 1, 63, 1, 0),
            ([2], 1, 63, 1, 0),
            ([0], 1, 63, 1, 0),
        ]

    for members, ss, se, ah, al in script:
        # DC scans use DC table 0 (luma) / 1 (chroma); every AC scan uses
        # AC table 0 — the flat progressive table emitted above
        sos = bytes([len(members)])
        for ci in members:
            td = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (td << 4) | 0])
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

        bw = _BitWriter()
        state = {"eobrun": 0, "pending": []}
        preds = [0, 0, 0]
        rst = 0
        interleaved = len(members) > 1
        if interleaved:
            total = mcuy * mcux
        else:
            _, _, nby, nbx = comps[members[0]]
            total = nby * nbx
        for u in range(total):
            if restart_interval and u and u % restart_interval == 0:
                _flush_eobrun(bw, ac_codes, state)
                bw.write_marker(0xD0 + rst % 8)
                rst += 1
                preds = [0, 0, 0]
            if interleaved:
                my, mx = divmod(u, mcux)
                for ci in members:
                    _, grid, _, _ = comps[ci]
                    hf, vf = sf[ci]
                    for dy in range(vf):
                        for dx in range(hf):
                            blk = grid[my * vf + dy, mx * hf + dx]
                            if ah == 0:
                                _enc_dc_first(bw, dc_codes[min(ci, 1)], blk, ci, preds, al)
                            else:
                                bw.write((int(blk[0]) >> al) & 1, 1)
            else:
                ci = members[0]
                _, grid, nby, nbx = comps[ci]
                blk = grid[u // nbx, u % nbx]
                if ss == 0:
                    if ah == 0:
                        _enc_dc_first(bw, dc_codes[min(ci, 1)], blk, ci, preds, al)
                    else:
                        bw.write((int(blk[0]) >> al) & 1, 1)
                elif ah == 0:
                    _enc_ac_first(bw, ac_codes, blk, ss, se, al, state)
                else:
                    _enc_ac_refine(bw, ac_codes, blk, ss, se, al, state)
        _flush_eobrun(bw, ac_codes, state)
        out += bw.flush()

    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def _decode_block(
    br: _BitReader, dc: _HuffDecoder, ac: _HuffDecoder, pred: int
) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, np.int64)
    t = dc.decode(br)
    diff = _extend(br.receive(t), t) if t else 0
    pred += diff
    zz[0] = pred
    k = 1
    while k < 64:
        rs = ac.decode(br)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC coefficient index out of range")
        zz[k] = _extend(br.receive(s), s)
        k += 1
    return zz, pred


def _split_entropy(entropy: bytes, dri: int) -> list[bytes]:
    """Split entropy data at RSTn markers and unstuff FF00 per segment."""
    if not dri:
        return [entropy.replace(b"\xff\x00", b"\xff")]
    parts, cur, i = [], bytearray(), 0
    while i < len(entropy):
        if entropy[i] == 0xFF and i + 1 < len(entropy):
            nxt = entropy[i + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                parts.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
        cur.append(entropy[i])
        i += 1
    parts.append(bytes(cur))
    return parts


# --- progressive block procedures (T.81 Annex G.2) --------------------------


def _dc_first_block(br, dc: _HuffDecoder, blk, cid, preds, al: int) -> None:
    t = dc.decode(br)
    diff = _extend(br.receive(t), t) if t else 0
    preds[cid] += diff
    blk[0] = preds[cid] << al


def _ac_first_block(br, ac: _HuffDecoder, blk, ss, se, al, eobrun: int) -> int:
    """AC first scan (G.2.1): band [ss,se], values scaled by 2^al; EOBn
    symbols start a run of end-of-band blocks that persists across blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = ac.decode(br)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.receive(r)
            break
        k += r
        if k > se:
            raise ValueError("JPEG AC coefficient index out of band")
        blk[k] = _extend(br.receive(s), s) << al
        k += 1
    return eobrun


def _ac_refine_block(br, ac: _HuffDecoder, blk, ss, se, al, eobrun: int) -> int:
    """AC refinement scan (G.2.2): one correction bit per already-nonzero
    coefficient, new coefficients appear as +-2^al; EOB runs still carry
    the correction bits of the blocks they cover."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = ac.decode(br)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.receive(r)
                    break
                # r == 15: ZRL — advance over 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("invalid JPEG AC refinement magnitude")
                val = p1 if br.read_bit() else m1
            while k <= se:
                if blk[k] != 0:
                    if br.read_bit() and (int(blk[k]) & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0:
                if br.read_bit() and (int(blk[k]) & p1) == 0:
                    blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_one_scan(
    entropy: bytes,
    order: list,
    grids: dict,
    geom: tuple,
    dc_tabs: dict,
    ac_tabs: dict,
    dri: int,
    progressive: bool,
    ss: int,
    se: int,
    ah: int,
    al: int,
) -> None:
    """Execute one scan (sequential full-band, or any progressive scan)
    against the coefficient grids. ``order``: (cid, hf, vf, td, ta) per
    scan component; interleaved scans iterate MCUs, single-component scans
    iterate the component's own (non-MCU-padded) block raster."""
    fh, fw, hmax, vmax, mcuy, mcux = geom
    interleaved = len(order) > 1
    if interleaved:
        total = mcuy * mcux
        nbx = 0
    else:
        cid0, hf0, vf0, _, _ = order[0]
        cw = -(-(fw * hf0) // hmax)
        ch = -(-(fh * vf0) // vmax)
        nbx = -(-cw // 8)
        total = nbx * (-(-ch // 8))

    # table presence: only what this scan actually uses
    for _, _, _, td, ta in order:
        needs_dc = not progressive or (ss == 0 and ah == 0)
        needs_ac = not progressive or ss > 0
        if needs_dc and td not in dc_tabs:
            raise ValueError("JPEG scan references missing Huffman table")
        if needs_ac and ta not in ac_tabs:
            raise ValueError("JPEG scan references missing Huffman table")
    if progressive and ss > 0 and interleaved:
        raise ValueError("progressive AC scan must be non-interleaved")

    unit = 0
    per_seg = dri if dri else total
    for seg in _split_entropy(entropy, dri):
        br = _BitReader(seg)
        preds = {cid: 0 for cid, *_ in order}  # RST resets DC predictors
        eobrun = 0  # and EOB runs
        for _ in range(min(per_seg, total - unit)):
            if interleaved:
                my, mx = divmod(unit, mcux)
                for cid, hf, vf, td, ta in order:
                    for dy in range(vf):
                        for dx in range(hf):
                            blk = grids[cid][my * vf + dy, mx * hf + dx]
                            eobrun = _decode_block_any(
                                br, blk, cid, preds, dc_tabs, ac_tabs, td, ta,
                                progressive, ss, se, ah, al, eobrun,
                            )
            else:
                cid, hf, vf, td, ta = order[0]
                blk = grids[cid][unit // nbx, unit % nbx]
                eobrun = _decode_block_any(
                    br, blk, cid, preds, dc_tabs, ac_tabs, td, ta,
                    progressive, ss, se, ah, al, eobrun,
                )
            unit += 1
        if unit >= total:
            break
    if unit < total:
        raise ValueError("truncated JPEG entropy data (incomplete scan)")


def _decode_block_any(
    br, blk, cid, preds, dc_tabs, ac_tabs, td, ta,
    progressive, ss, se, ah, al, eobrun,
) -> int:
    if not progressive:
        zz, preds[cid] = _decode_block(br, dc_tabs[td], ac_tabs[ta], preds[cid])
        blk[:] = zz
        return 0
    if ss == 0:
        if ah == 0:
            _dc_first_block(br, dc_tabs[td], blk, cid, preds, al)
        elif br.read_bit():  # DC refinement: one bit onto position al
            blk[0] = int(blk[0]) | (1 << al)
        return 0
    if ah == 0:
        return _ac_first_block(br, ac_tabs[ta], blk, ss, se, al, eobrun)
    return _ac_refine_block(br, ac_tabs[ta], blk, ss, se, al, eobrun)


def decode_jpeg(payload: bytes) -> tuple[int, int, np.ndarray]:
    """JPEG bytes -> (width, height, HxWx3 uint8 RGB).

    Baseline sequential (SOF0/1) and progressive (SOF2, spectral selection
    + successive approximation, Annex G) Huffman processes; 8-bit and
    12-bit precision (12-bit output downscaled to 8-bit like libjpeg);
    1-component grayscale (expanded to RGB), 3-component YCbCr or
    Adobe-marked stored-RGB, and 4-component Adobe CMYK / YCCK (APP14
    transform byte; no APP14 = plain non-inverted CMYK) converted to RGB.
    Arithmetic-coded and hierarchical/lossless streams raise ValueError."""
    import re

    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _HuffDecoder] = {}
    ac_tabs: dict[int, _HuffDecoder] = {}
    frame = None  # (h, w, comps, prec) ; comps: list of (cid, hf, vf, tq)
    progressive = False
    adobe_transform: int | None = None
    dri = 0
    grids: dict | None = None
    geom = None
    n_scans = 0
    n_seq_scans_comps = 0

    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker == 0xD8:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        if marker in (0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("arithmetic-coded JPEG not supported")
        if marker in (0xC3, 0xC5, 0xC6, 0xC7):
            raise ValueError("hierarchical/lossless JPEG process not supported")
        (seg_len,) = struct.unpack_from(">H", payload, pos + 2)
        data = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT — possibly multiple tables per segment
            p = 0
            while p < len(data):
                pq, tq = data[p] >> 4, data[p] & 0x0F
                p += 1
                if pq == 0:
                    tab = np.frombuffer(data[p : p + 64], np.uint8).astype(np.int64)
                    p += 64
                else:
                    tab = np.frombuffer(data[p : p + 128], ">u2").astype(np.int64)
                    p += 128
                qtabs[tq] = tab  # zigzag order
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            progressive = marker == 0xC2
            prec, fh, fw, nc = data[0], *struct.unpack_from(">HH", data, 1), data[5]
            if prec not in (8, 12):
                raise ValueError(f"unsupported JPEG precision {prec}")
            if nc not in (1, 3, 4):
                raise ValueError(f"unsupported JPEG component count {nc}")
            comps = []
            for i in range(nc):
                cid, hv, tq = data[6 + 3 * i : 9 + 3 * i]
                hf, vf = hv >> 4, hv & 0x0F
                if not (1 <= hf <= 2 and 1 <= vf <= 2):
                    raise ValueError(f"unsupported sampling factors {hf}x{vf}")
                comps.append((cid, hf, vf, tq))
            frame = (fh, fw, comps, prec)
        elif marker == 0xC4:  # DHT — possibly multiple tables per segment
            p = 0
            while p < len(data):
                tc, th = data[p] >> 4, data[p] & 0x0F
                bits = list(data[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(data[p + 17 : p + 17 + nv])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _HuffDecoder(bits, vals)
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack_from(">H", data, 0)
        elif marker == 0xEE and data[:5] == b"Adobe" and len(data) >= 12:
            adobe_transform = data[11]  # APP14: 0=RGB/CMYK, 1=YCbCr, 2=YCCK
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            fh, fw, comps, _ = frame
            if fh < 1 or fw < 1:
                raise ValueError("empty image")
            if grids is None:
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcux = -(-fw // (8 * hmax))
                mcuy = -(-fh // (8 * vmax))
                geom = (fh, fw, hmax, vmax, mcuy, mcux)
                grids = {
                    cid: np.zeros((mcuy * vf, mcux * hf, 64), np.int64)
                    for cid, hf, vf, _ in comps
                }
            ns = data[0]
            comp_by_id = {c[0]: c for c in comps}
            order = []
            for i in range(ns):
                cs, td_ta = data[1 + 2 * i], data[2 + 2 * i]
                if cs not in comp_by_id:
                    raise ValueError("scan references unknown component")
                cid, hf, vf, _ = comp_by_id[cs]
                order.append((cid, hf, vf, td_ta >> 4, td_ta & 0x0F))
            ss, se, ahal = data[1 + 2 * ns], data[2 + 2 * ns], data[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if not progressive:
                ss, se, ah, al = 0, 63, 0, 0  # baseline scans are full-band
                n_seq_scans_comps += ns
            elif ss == 0 and se != 0:
                raise ValueError("progressive DC scan must have Se=0")
            scan_start = pos + 2 + seg_len
            # end of entropy data = next marker that is not a stuffed zero
            # or an RSTn (regex instead of a per-byte Python loop)
            m = re.search(rb"\xff(?![\x00\xd0-\xd7])", payload[scan_start:])
            p = scan_start + m.start() if m else len(payload)
            _decode_one_scan(
                payload[scan_start:p], order, grids, geom, dc_tabs, ac_tabs,
                dri, progressive, ss, se, ah, al,
            )
            n_scans += 1
            pos = p
            continue
        pos += 2 + seg_len

    if frame is None or n_scans == 0:
        raise ValueError("missing SOF/SOS in JPEG stream")
    fh, fw, comps, prec = frame
    if not progressive and n_seq_scans_comps < len(comps):
        raise ValueError("JPEG scans do not cover all components")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    level = float(1 << (prec - 1))
    # 12-bit precision downscales to the 8-bit output domain (libjpeg-style)
    out_scale = 255.0 / float((1 << prec) - 1)

    # dequantize + IDCT + assemble planes, then upsample to full resolution
    planes = {}
    for cid, hf, vf, tq in comps:
        if tq not in qtabs:
            raise ValueError("JPEG frame references missing quantization table")
        g = grids[cid]
        by, bx = g.shape[:2]
        zz = g.reshape(-1, 64)
        nat = np.zeros_like(zz, dtype=np.float64)
        nat[:, ZIGZAG] = zz * qtabs[tq][np.newaxis, :]  # both in zigzag order
        blocks = idct2_blocks(nat.reshape(-1, 8, 8)) + level
        plane = (
            blocks.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        )
        # upsample by pixel replication to the full MCU-padded frame grid
        ry, rx = vmax // vf, hmax // hf
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        plane = plane[: fh, : fw]
        if prec != 8:
            plane = plane * out_scale
        planes[cid] = plane

    vals = [planes[c[0]] for c in comps]
    if len(vals) == 1:
        y = np.clip(vals[0].round(), 0, 255).astype(np.uint8)
        rgb = np.repeat(y[..., np.newaxis], 3, axis=2)
    elif len(vals) == 3:
        if adobe_transform == 0:  # Adobe transform 0 + 3 comps = stored RGB
            rgb = np.clip(np.stack(vals, axis=-1).round(), 0, 255).astype(np.uint8)
        else:
            rgb = ycbcr_to_rgb(np.stack(vals, axis=-1))
    else:  # 4 components: Adobe CMYK (transform 0 / no marker) or YCCK (2)
        s = np.stack(vals, axis=-1)
        if adobe_transform == 2:  # YCbCr carries the inverted CMY; K rides as-is
            s = np.concatenate([_ycbcr_to_rgb_f(s[..., :3]), s[..., 3:]], axis=-1)
        s = np.clip(s, 0.0, 255.0)
        if adobe_transform is None:
            # no Adobe marker: plain (non-inverted) CMYK ink values
            s = 255.0 - s
        # Adobe stores inverted ink: R = S_C * S_K / 255, etc.
        rgb = np.clip((s[..., :3] * s[..., 3:] / 255.0).round(), 0, 255).astype(
            np.uint8
        )
    return fw, fh, np.ascontiguousarray(rgb)
