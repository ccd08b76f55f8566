"""Image codecs for the binary pixel payload column — pure NumPy + stdlib zlib.

The reference reads raster files through rioxarray/GDAL
(``xcube_stac/accessors/sen2.py:158-169``, ``sen3.py:172-173``,
``hls.py:131-140``); its format dispatch table is
``MAP_FILE_EXTENSION_FORMAT`` (``xcube_stac/constants.py:76-83``). In this
engine pixels arrive INLINE as a ``bytes:binary`` column (BASELINE input_hint)
and are decoded inside Arrow-batched UDFs. No image library is available in
the runtime, so the three formats are self-implemented:

* ``raw``  — little-endian uint16 C-order dump (lossless, zero cost).
* ``png``  — real PNG: 16-bit grayscale, filter 0 scanlines on encode,
  full filter 0-4 (incl. Paeth) support on decode, CRC-checked chunks.
* ``lossy``— 8x8 blockwise DCT-II quantization ("jpeg-core" without the
  entropy coder; zlib for the byte stream). Deterministic; quality chosen
  so reconstruction PSNR is >= 40 dB on natural-ish content, exercising the
  lossy-allclose acceptance rule.

All decoders return ``np.ndarray[uint16]`` shaped (h, w). Decode batches of
images per Arrow record batch — never per row from Python row objects.
"""

from __future__ import annotations

import struct
import zlib
from functools import lru_cache

import numpy as np

# ---------------------------------------------------------------------------
# raw
# ---------------------------------------------------------------------------


def encode_raw(img: np.ndarray) -> bytes:
    return np.ascontiguousarray(img, dtype="<u2").tobytes()


def decode_raw(data: bytes, w: int, h: int) -> np.ndarray:
    return np.frombuffer(data, dtype="<u2").reshape(h, w).astype(np.uint16)


# ---------------------------------------------------------------------------
# png (16-bit grayscale)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """16-bit PNG: grayscale (color type 0) for 2-D input, truecolor RGB
    (color type 2) for channel-major (3, h, w) input."""
    img = np.ascontiguousarray(img, dtype=np.uint16)
    if img.ndim == 3:
        if img.shape[0] != 3:
            raise ValueError(f"RGB PNG input must be (3, h, w), got {img.shape}")
        _, h, w = img.shape
        colortype, ch = 2, 3
        # channel-major → PNG's interleaved sample order
        pix = np.transpose(img, (1, 2, 0))
    else:
        h, w = img.shape
        colortype, ch = 0, 1
        pix = img[:, :, None]
    ihdr = struct.pack(">IIBBBBB", w, h, 16, colortype, 0, 0, 0)
    rows = np.ascontiguousarray(pix).astype(">u2").tobytes()
    stride = w * 2 * ch
    # filter byte 0 (None) prepended per scanline
    raw = b"".join(
        b"\x00" + rows[r * stride : (r + 1) * stride] for r in range(h)
    )
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes, w: int | None = None, h: int | None = None) -> np.ndarray:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG stream")
    pos = 8
    width = height = bitdepth = colortype = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, bitdepth, colortype = struct.unpack(">IIBB", payload[:10])
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if colortype not in (0, 2) or bitdepth not in (8, 16):
        raise ValueError(f"unsupported PNG (colortype={colortype} depth={bitdepth})")
    ch = 3 if colortype == 2 else 1
    bpp = (bitdepth // 8) * ch
    stride = width * bpp
    raw = zlib.decompress(bytes(idat))
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(height):
        f = raw[r * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=r * (stride + 1) + 1
        ).copy()
        if f == 0:
            cur = line
        elif f == 2:  # Up
            cur = (line.astype(np.int32) + prev).astype(np.uint8)
        elif f == 1:  # Sub: per-byte-lane modular cumsum (no Python scan)
            cur = line.copy()
            for lane in range(bpp):
                cur[lane::bpp] = np.cumsum(line[lane::bpp], dtype=np.uint64).astype(np.uint8)
        elif f in (3, 4):  # Average / Paeth need the true left-neighbor scan
            cur = np.zeros(stride, dtype=np.uint8)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                if f == 1:
                    v = line[i] + a
                elif f == 3:
                    v = line[i] + ((int(a) + int(b)) >> 1)
                else:
                    v = line[i] + _paeth(
                        np.uint8(a), np.uint8(b), np.uint8(c)
                    )
                cur[i] = np.uint8(v)
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[r] = cur
        prev = cur
    if bitdepth == 16:
        img = out.reshape(height, width, ch, 2)
        img16 = (img[:, :, :, 0].astype(np.uint16) << 8) | img[:, :, :, 1]
    else:
        img16 = out.reshape(height, width, ch).astype(np.uint16)
    if ch == 1:
        return img16[:, :, 0]
    return np.ascontiguousarray(np.transpose(img16, (2, 0, 1)))  # (3, h, w)


# ---------------------------------------------------------------------------
# lossy: 8x8 DCT quantization
# ---------------------------------------------------------------------------

_B = 8
_DCT = np.zeros((_B, _B))
for _k in range(_B):
    for _n in range(_B):
        _DCT[_k, _n] = np.cos(np.pi * (_n + 0.5) * _k / _B)
_DCT *= np.sqrt(2.0 / _B)
_DCT[0] /= np.sqrt(2.0)
# flat quant table scaled by (1 + k+l): heavier on high frequencies
_Q = np.fromfunction(lambda k, l: 4.0 * (1.0 + k + l), (_B, _B))

_MAGIC = b"LDC1"


def _blockify(img: np.ndarray) -> tuple[np.ndarray, int, int, int, int]:
    h, w = img.shape
    ph = (-h) % _B
    pw = (-w) % _B
    img = np.pad(img, ((0, ph), (0, pw)), mode="edge")
    H, W = img.shape
    blocks = img.reshape(H // _B, _B, W // _B, _B).transpose(0, 2, 1, 3)
    return blocks, h, w, H, W


def encode_lossy(img: np.ndarray) -> bytes:
    img = np.asarray(img, dtype=np.float64)
    blocks, h, w, H, W = _blockify(img)
    # C = D B D^T, batched over blocks (matmul broadcasts leading dims)
    coeff = _DCT @ blocks @ _DCT.T
    q = np.round(coeff / _Q).astype(np.int32)
    payload = zlib.compress(q.astype("<i4").tobytes(), 6)
    return _MAGIC + struct.pack("<II", w, h) + payload


def decode_lossy(data: bytes, w: int | None = None, h: int | None = None) -> np.ndarray:
    if data[:4] != _MAGIC:
        raise ValueError("not an LDC1 stream")
    w, h = struct.unpack("<II", data[4:12])
    H = h + ((-h) % _B)
    W = w + ((-w) % _B)
    q = np.frombuffer(zlib.decompress(data[12:]), dtype="<i4").reshape(
        H // _B, W // _B, _B, _B
    )
    coeff = q.astype(np.float64) * _Q
    # B = D^T C D, batched over blocks (~20x faster than the einsum form)
    blocks = _DCT.T @ coeff @ _DCT
    img = blocks.transpose(0, 2, 1, 3).reshape(H, W)
    return np.clip(np.round(img), 0, 65535).astype(np.uint16)[:h, :w]


# ---------------------------------------------------------------------------
# jpeg: baseline sequential DCT, single-component (grayscale), JFIF
# ---------------------------------------------------------------------------
# Pure-NumPy implementation of the ITU-T T.81 baseline process with the
# spec's example tables (Annex K): K.1 luminance quantization (scaled to
# quality 90), K.3.1/K.3.2 luminance DC/AC Huffman tables. 8-bit precision
# (baseline is 8-bit only): uint16 DN are mapped to 8 bits with v8 =
# round(DN/257) on encode and DN' = v8*257 on decode — lossy by design, the
# real-corpus format the reference opens via GDAL (constants.py:76-83).

# K.1 luminance quantization table, zigzag order NOT applied (natural order)
_JQT_BASE = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float64,
)
_JPEG_QUALITY = 90
_JQT = np.clip(
    np.floor((_JQT_BASE * (200 - 2 * _JPEG_QUALITY) + 50) / 100), 1, 255
)

# zigzag scan order: natural index of each zigzag position
_ZZ = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# Annex K.3.1: luminance DC — BITS (codes per length 1..16) and HUFFVAL
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
# Annex K.3.2: luminance AC
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
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


# Annex K.2 chrominance quantization table (natural order), same
# quality-90 scaling as the luminance table
_JQT_C_BASE = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.float64,
)
_JQT_C = np.clip(
    np.floor((_JQT_C_BASE * (200 - 2 * _JPEG_QUALITY) + 50) / 100), 1, 255
)

# Annex K.3.3: chrominance DC
_DC_C_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_C_VALS = list(range(12))
# Annex K.3.4: chrominance AC
_AC_C_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_C_VALS = [
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


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment (T.81 C.2): symbol -> (code, length)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_ENC = _huff_codes(_DC_BITS, _DC_VALS)
_AC_ENC = _huff_codes(_AC_BITS, _AC_VALS)
_DC_C_ENC = _huff_codes(_DC_C_BITS, _DC_C_VALS)
_AC_C_ENC = _huff_codes(_AC_C_BITS, _AC_C_VALS)


@lru_cache(maxsize=8)
def _huff_lut(bits_vals: tuple) -> tuple[np.ndarray, np.ndarray]:
    """16-bit-peek decode LUT: peek -> (symbol, code length). Every code of
    length L fills 2^(16-L) consecutive entries — one array index decodes a
    symbol (the classic fast-JPEG table trick, no per-bit tree walk)."""
    bits, vals = bits_vals
    sym = np.zeros(1 << 16, dtype=np.int16) - 1
    ln = np.zeros(1 << 16, dtype=np.uint8)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            sym[lo:hi] = vals[k]
            ln[lo:hi] = length
            code += 1
            k += 1
        code <<= 1
    return sym, ln


class _BitWriter:
    def __init__(self):
        self.acc = 0
        self.nbits = 0
        self.out = bytearray()

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _put_block(bw: "_BitWriter", blk: np.ndarray, dc_enc: dict, ac_enc: dict,
               prev_dc: int) -> int:
    """Entropy-code one zigzag block (T.81 F.1.2); returns the block's DC
    for the caller's per-component predictor."""
    dc = int(blk[0])
    diff = dc - prev_dc
    s = _category(diff)
    c, ln = dc_enc[s]
    bw.put(c, ln)
    if s:
        bw.put(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    nz = np.nonzero(blk[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for i in range(1, last + 1):
        v = int(blk[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_enc[0xF0]  # ZRL
            bw.put(c, ln)
            run -= 16
        s = _category(v)
        c, ln = ac_enc[(run << 4) | s]
        bw.put(c, ln)
        bw.put(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        c, ln = ac_enc[0x00]  # EOB
        bw.put(c, ln)
    return dc


def _jseg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _quant_zz(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """(nby, nbx, 64) zigzag-quantized DCT coefficients of a level-shifted
    8-bit plane whose dims are already multiples of 8."""
    H, W = plane.shape
    blocks = plane.reshape(H // _B, _B, W // _B, _B).transpose(0, 2, 1, 3)
    coeff = _DCT @ (blocks - 128.0) @ _DCT.T
    q = np.round(coeff / qt).astype(np.int32)
    return q.reshape(H // _B, W // _B, 64)[:, :, _ZZ]


def encode_jpeg(img: np.ndarray) -> bytes:
    """Baseline JFIF bytes (8-bit mapped, quality 90): 2-D uint16 input →
    single-component grayscale; channel-major (3, h, w) input → YCbCr
    4:2:0 color (the consumer-camera default chroma layout)."""
    if np.asarray(img).ndim == 3:
        return _encode_jpeg_color(img)
    img8 = np.round(np.asarray(img, np.float64) / 257.0)
    blocks, h, w, H, W = _blockify(img8)
    coeff = _DCT @ (blocks - 128.0) @ _DCT.T
    q = np.round(coeff / _JQT).astype(np.int32)
    nby, nbx = q.shape[0], q.shape[1]
    zz = q.reshape(nby * nbx, 64)[:, _ZZ]

    bw = _BitWriter()
    prev_dc = 0
    for blk in zz:
        prev_dc = _put_block(bw, blk, _DC_ENC, _AC_ENC, prev_dc)
    bw.flush()

    qt_zz = _JQT.flatten()[_ZZ].astype(np.uint8).tobytes()
    dht_dc = bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
    dht_ac = bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS)
    return b"".join(
        [
            b"\xff\xd8",  # SOI
            _jseg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"),
            _jseg(0xFFDB, b"\x00" + qt_zz),  # DQT, 8-bit, table 0
            _jseg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00"),  # SOF0
            _jseg(0xFFC4, dht_dc),
            _jseg(0xFFC4, dht_ac),
            _jseg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00"),  # SOS
            bytes(bw.out),
            b"\xff\xd9",  # EOI
        ]
    )


def _encode_jpeg_color(img: np.ndarray) -> bytes:
    """YCbCr 4:2:0 baseline JFIF: Y keeps full resolution (sampling 2x2),
    Cb/Cr are 2x2 box-subsampled (1x1) — one MCU covers 16x16 pixels as
    4 Y + 1 Cb + 1 Cr interleaved blocks (T.81 A.2.3). Chroma uses the
    Annex K.2 quant + K.3.3/K.3.4 Huffman tables."""
    img = np.asarray(img, np.float64)
    if img.shape[0] != 3:
        raise ValueError(f"color JPEG input must be (3, h, w), got {img.shape}")
    R, G, B = np.round(img / 257.0)
    # JFIF YCbCr (BT.601 full-range)
    Y = 0.299 * R + 0.587 * G + 0.114 * B
    Cb = -0.168736 * R - 0.331264 * G + 0.5 * B + 128.0
    Cr = 0.5 * R - 0.418688 * G - 0.081312 * B + 128.0
    h, w = Y.shape
    H = h + ((-h) % 16)
    W = w + ((-w) % 16)

    def pad16(p):
        return np.pad(p, ((0, H - h), (0, W - w)), mode="edge")

    qY = _quant_zz(pad16(Y), _JQT)
    sub = lambda p: pad16(p).reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))
    qCb = _quant_zz(sub(Cb), _JQT_C)
    qCr = _quant_zz(sub(Cr), _JQT_C)

    bw = _BitWriter()
    dcY = dcCb = dcCr = 0
    for my in range(H // 16):
        for mx in range(W // 16):
            for by, bx in ((0, 0), (0, 1), (1, 0), (1, 1)):
                dcY = _put_block(
                    bw, qY[2 * my + by, 2 * mx + bx], _DC_ENC, _AC_ENC, dcY
                )
            dcCb = _put_block(bw, qCb[my, mx], _DC_C_ENC, _AC_C_ENC, dcCb)
            dcCr = _put_block(bw, qCr[my, mx], _DC_C_ENC, _AC_C_ENC, dcCr)
    bw.flush()

    qt0 = _JQT.flatten()[_ZZ].astype(np.uint8).tobytes()
    qt1 = _JQT_C.flatten()[_ZZ].astype(np.uint8).tobytes()
    sof = struct.pack(">BHHB", 8, h, w, 3) + bytes(
        [1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    return b"".join(
        [
            b"\xff\xd8",
            _jseg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"),
            _jseg(0xFFDB, b"\x00" + qt0),
            _jseg(0xFFDB, b"\x01" + qt1),
            _jseg(0xFFC0, sof),
            _jseg(0xFFC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)),
            _jseg(0xFFC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS)),
            _jseg(0xFFC4, bytes([0x01]) + bytes(_DC_C_BITS) + bytes(_DC_C_VALS)),
            _jseg(0xFFC4, bytes([0x11]) + bytes(_AC_C_BITS) + bytes(_AC_C_VALS)),
            _jseg(0xFFDA, b"\x03" + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00"),
            bytes(bw.out),
            b"\xff\xd9",
        ]
    )


def decode_jpeg(data: bytes, w: int | None = None, h: int | None = None) -> np.ndarray:
    """Decode baseline single-component JPEG (the encoder's output and any
    spec-conforming grayscale baseline stream without restart markers)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (no SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, tuple] = {}
    ac_tabs: dict[int, tuple] = {}
    width = height = None
    comp_qt = comp_dc = comp_ac = 0
    ncomp = 1
    comps: list[tuple[int, int, int]] = []
    scan_tabs: dict[int, tuple[int, int]] = {}
    scan = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        # any number of 0xFF fill bytes may precede a marker (T.81 B.1.1.2)
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(data):
            raise ValueError("truncated JPEG (stream ends at a marker byte)")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if pos + 4 > len(data):
            raise ValueError("truncated JPEG marker segment")
        (length,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + length]
        pos += 2 + length
        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported (baseline)")
                tab = np.zeros(64)
                tab[_ZZ] = np.frombuffer(payload[p + 1 : p + 65], np.uint8)
                qts[tq] = tab.reshape(8, 8)
                p += 65
        elif marker == 0xC0:  # SOF0 baseline
            if len(payload) < 6:
                raise ValueError("truncated JPEG SOF header")
            prec, height, width, ncomp = struct.unpack(">BHHB", payload[:6])
            if len(payload) < 6 + 3 * ncomp:
                raise ValueError("truncated JPEG SOF component list")
            if prec != 8 or ncomp not in (1, 3):
                raise ValueError(
                    f"only 8-bit 1- or 3-component baseline supported "
                    f"(got precision={prec}, components={ncomp})"
                )
            comps = [
                (payload[6 + 3 * i], payload[7 + 3 * i], payload[8 + 3 * i])
                for i in range(ncomp)
            ]  # (id, sampling HV, quant table id)
            comp_qt = comps[0][2]
            if ncomp == 3 and [c[1] for c in comps] != [0x22, 0x11, 0x11]:
                raise ValueError(
                    "color JPEG supported for 4:2:0 only (Y 2x2, Cb/Cr 1x1); "
                    f"got sampling {[hex(c[1]) for c in comps]}"
                )
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("non-baseline JPEG process unsupported")
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                # a truncated/mangled DHT can promise more codes than it
                # carries values, or overfill the canonical code space —
                # both would IndexError deep in the LUT builder otherwise
                if len(bits) < 16 or len(vals) < n:
                    raise ValueError("truncated JPEG DHT segment")
                code = 0
                for length in range(1, 17):
                    code = (code + bits[length - 1]) << 1
                    if code > (1 << (length + 1)):
                        raise ValueError("JPEG DHT code lengths overfull")
                (dc_tabs if tc == 0 else ac_tabs)[th] = (tuple(bits), tuple(vals))
                p += 17 + n
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS — entropy data follows until EOI
            if not comps:
                raise ValueError("JPEG SOS marker before SOF (no frame header)")
            if not payload or len(payload) < 1 + 2 * payload[0]:
                raise ValueError("truncated JPEG SOS header")
            ns = payload[0]
            scan_tabs = {
                payload[1 + 2 * i]: (
                    payload[2 + 2 * i] >> 4,
                    payload[2 + 2 * i] & 0xF,
                )
                for i in range(ns)
            }  # component id -> (dc table, ac table)
            if any(cid not in scan_tabs for cid, _, _ in comps):
                raise ValueError("JPEG SOS component ids do not match SOF")
            for cid, _, qi in comps:
                dci, aci = scan_tabs[cid]
                if dci not in dc_tabs or aci not in ac_tabs:
                    raise ValueError("JPEG scan references undefined DHT table")
                if qi not in qts:
                    raise ValueError("JPEG frame references undefined DQT table")
            comp_dc, comp_ac = scan_tabs[comps[0][0]]
            end = data.rfind(b"\xff\xd9")
            scan = data[pos : end if end > pos else len(data)]
            break
    if scan is None or width is None:
        raise ValueError("truncated JPEG (no SOS/SOF)")

    # unstuff 0xFF00 and expand to a bit array (padded with 1s)
    body = scan.replace(b"\xff\x00", b"\xff")
    # next16[p] == "the 16 bits at bit-offset p, MSB-first, as an int" —
    # precomputed in one vectorized byte-arithmetic pass: the symbol loop
    # then reads one scalar instead of paying a slice+dot per Huffman
    # symbol (profiled as the decoder's dominant cost). 4 bytes of 0xFF
    # padding reproduce the 1-bits tail for windows past the stream end,
    # covering every p the truncation guards admit (p <= nbits_total - s).
    _bytes = np.frombuffer(body, np.uint8).astype(np.uint32)
    _bytes = np.concatenate([_bytes, np.full(4, 255, np.uint32)])
    _val24 = (_bytes[:-2] << 16) | (_bytes[1:-1] << 8) | _bytes[2:]
    next16 = (
        (_val24[:, None] >> (8 - np.arange(8, dtype=np.uint32))[None, :]) & 0xFFFF
    ).reshape(-1)
    nbits_total = 8 * len(body) + 16  # stream bits + the 1s padding tail
    if ncomp == 3:
        return _decode_jpeg_color(
            next16, nbits_total, comps, scan_tabs, qts, dc_tabs, ac_tabs,
            width, height,
        )
    dc_sym, dc_len = _huff_lut(dc_tabs[comp_dc])
    ac_sym, ac_len = _huff_lut(ac_tabs[comp_ac])
    qt = qts[comp_qt]

    nbx = -(-width // _B)
    nby = -(-height // _B)
    zz = np.zeros((nby * nbx, 64), np.int32)
    p = 0
    prev_dc = 0
    for bi in range(nby * nbx):
        if p + 16 > nbits_total:
            raise ValueError("JPEG entropy stream truncated")
        peek = int(next16[p])
        s = int(dc_sym[peek])
        if s < 0:
            raise ValueError("bad DC Huffman code")
        p += int(dc_len[peek])
        if s:
            if p + s > nbits_total:
                raise ValueError("JPEG entropy stream truncated")
            v = int(next16[p]) >> (16 - s)
            p += s
            if v < (1 << (s - 1)):
                v -= (1 << s) - 1
            prev_dc += v
        zz[bi, 0] = prev_dc
        k = 1
        while k < 64:
            # a corrupt stream can advance p past the padding mid-block: the
            # peek below must see a full 16-bit window or fail explicitly
            if p + 16 > nbits_total:
                raise ValueError("JPEG entropy stream truncated")
            peek = int(next16[p])
            rs = int(ac_sym[peek])
            if rs < 0:
                raise ValueError("bad AC Huffman code")
            p += int(ac_len[peek])
            if rs == 0x00:  # EOB
                break
            run, s = rs >> 4, rs & 0xF
            k += run
            if s == 0:
                if run != 15:
                    raise ValueError("bad AC run")
                k += 1  # ZRL consumed 16 zeros total
                continue
            if p + s > nbits_total:
                raise ValueError("JPEG entropy stream truncated")
            v = int(next16[p]) >> (16 - s)
            p += s
            if v < (1 << (s - 1)):
                v -= (1 << s) - 1
            if k > 63:
                raise ValueError("AC index overflow")
            zz[bi, k] = v
            k += 1

    blocks = np.zeros((nby * nbx, 64), np.float64)
    blocks[:, _ZZ] = zz
    coeff = blocks.reshape(nby, nbx, 8, 8) * qt
    pix = _DCT.T @ coeff @ _DCT + 128.0
    img8 = np.clip(np.round(pix.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)), 0, 255)
    return (img8[:height, :width] * 257.0).astype(np.uint16)


def _decode_jpeg_color(
    next16: np.ndarray,
    nbits_total: int,
    comps: list[tuple[int, int, int]],
    scan_tabs: dict[int, tuple[int, int]],
    qts: dict[int, np.ndarray],
    dc_tabs: dict[int, tuple],
    ac_tabs: dict[int, tuple],
    width: int,
    height: int,
) -> np.ndarray:
    """Interleaved 4:2:0 scan (T.81 A.2.3): each MCU carries 4 Y blocks in
    raster order then one Cb and one Cr block, each component with its own
    DC predictor and Huffman/quant tables. Returns channel-major (3, h, w)
    uint16 (8-bit samples x257, like every other color decode path)."""
    luts = {}
    for cid, _, _ in comps:
        dci, aci = scan_tabs[cid]
        luts[cid] = (_huff_lut(dc_tabs[dci]), _huff_lut(ac_tabs[aci]))

    def read_block(p: int, prev_dc: int, lut, out_row: np.ndarray) -> tuple[int, int]:
        (dc_sym, dc_len), (ac_sym, ac_len) = lut
        if p + 16 > nbits_total:
            raise ValueError("JPEG entropy stream truncated")
        peek = int(next16[p])
        s = int(dc_sym[peek])
        if s < 0:
            raise ValueError("bad DC Huffman code")
        p += int(dc_len[peek])
        if s:
            if p + s > nbits_total:
                raise ValueError("JPEG entropy stream truncated")
            v = int(next16[p]) >> (16 - s)
            p += s
            if v < (1 << (s - 1)):
                v -= (1 << s) - 1
            prev_dc += v
        out_row[0] = prev_dc
        k = 1
        while k < 64:
            if p + 16 > nbits_total:
                raise ValueError("JPEG entropy stream truncated")
            peek = int(next16[p])
            rs = int(ac_sym[peek])
            if rs < 0:
                raise ValueError("bad AC Huffman code")
            p += int(ac_len[peek])
            if rs == 0x00:  # EOB
                break
            run, s = rs >> 4, rs & 0xF
            k += run
            if s == 0:
                if run != 15:
                    raise ValueError("bad AC run")
                k += 1
                continue
            if p + s > nbits_total:
                raise ValueError("JPEG entropy stream truncated")
            v = int(next16[p]) >> (16 - s)
            p += s
            if v < (1 << (s - 1)):
                v -= (1 << s) - 1
            if k > 63:
                raise ValueError("AC index overflow")
            out_row[k] = v
            k += 1
        return p, prev_dc

    nmx = -(-width // 16)
    nmy = -(-height // 16)
    zzY = np.zeros((2 * nmy, 2 * nmx, 64), np.int32)
    zzCb = np.zeros((nmy, nmx, 64), np.int32)
    zzCr = np.zeros((nmy, nmx, 64), np.int32)
    cidY, cidCb, cidCr = comps[0][0], comps[1][0], comps[2][0]
    p = 0
    dcY = dcCb = dcCr = 0
    for my in range(nmy):
        for mx in range(nmx):
            for by, bx in ((0, 0), (0, 1), (1, 0), (1, 1)):
                p, dcY = read_block(p, dcY, luts[cidY], zzY[2 * my + by, 2 * mx + bx])
            p, dcCb = read_block(p, dcCb, luts[cidCb], zzCb[my, mx])
            p, dcCr = read_block(p, dcCr, luts[cidCr], zzCr[my, mx])

    def plane(zz: np.ndarray, qt: np.ndarray) -> np.ndarray:
        nby, nbx = zz.shape[:2]
        blocks = np.zeros((nby, nbx, 64), np.float64)
        blocks[:, :, _ZZ] = zz
        coeff = blocks.reshape(nby, nbx, 8, 8) * qt
        pix = _DCT.T @ coeff @ _DCT + 128.0
        return pix.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)

    Y = plane(zzY, qts[comps[0][2]])
    Cb = plane(zzCb, qts[comps[1][2]])
    Cr = plane(zzCr, qts[comps[2][2]])
    # nearest-neighbor chroma upsample back to luma resolution
    Cb = np.repeat(np.repeat(Cb, 2, axis=0), 2, axis=1)
    Cr = np.repeat(np.repeat(Cr, 2, axis=0), 2, axis=1)
    R = Y + 1.402 * (Cr - 128.0)
    G = Y - 0.344136 * (Cb - 128.0) - 0.714136 * (Cr - 128.0)
    B = Y + 1.772 * (Cb - 128.0)
    rgb8 = np.clip(
        np.round(np.stack([R, G, B])[:, :height, :width]), 0, 255
    )
    return (rgb8 * 257.0).astype(np.uint16)


# ---------------------------------------------------------------------------
# TIFF — baseline grayscale (TIFF 6.0 §3) plus the COG subset: tile
# organization (TIFF 6.0 §15, tags 322-325), DEFLATE compression (8 /
# legacy 32946 — stdlib zlib) and the horizontal-differencing Predictor 2
# (TIFF 6.0 §14). The reference's primary raster container (GeoTIFF/COG via
# rioxarray, accessors/sen2.py:158-169, accessors/hls.py:131-140; extension
# map constants.py:76-83) — real-world inputs are tile-organized and
# DEFLATE-compressed. Geo tags are catalog metadata in this engine
# (scene_x0/y0/res columns), so the pixel codec needs only II/MM byte
# order, BitsPerSample 8 or 16, strips or tiles, compression 1/8/32946,
# predictor 1/2.
# ---------------------------------------------------------------------------

_TIFF_TYPE = {1: ("B", 1), 3: ("H", 2), 4: ("I", 4)}  # BYTE, SHORT, LONG


def _predict2(img: np.ndarray) -> np.ndarray:
    """Horizontal differencing, modulo-2^16 (uint16 wraparound). For chunky
    multi-sample rows pass (rows, cols, ch): TIFF 6.0 §14 differences each
    sample against the SAME channel of the previous pixel, which is exactly
    the column-axis diff on that shape."""
    d = img.copy()
    d[:, 1:, ...] = img[:, 1:, ...] - img[:, :-1, ...]
    return d


def _tiff_container(
    segs: list[bytes], entries_fixed: list[tuple], off_tag: int, cnt_tag: int
) -> bytes:
    """Assemble header + segment data + IFD (+ overflow arrays)."""
    data_start = 8
    offsets, counts = [], []
    pos = data_start
    for s in segs:
        offsets.append(pos)
        counts.append(len(s))
        pos += len(s)
    ifd_off = pos

    def entry(tag: int, typ: int, cnt: int, value_field: bytes) -> bytes:
        return struct.pack("<HHI", tag, typ, cnt) + value_field

    def short_val(v: int) -> bytes:
        return struct.pack("<HH", v, 0)

    def long_val(v: int) -> bytes:
        return struct.pack("<I", v)

    n_segs = len(segs)
    n_entries = len(entries_fixed) + 2
    overflow_base = ifd_off + 2 + n_entries * 12 + 4
    overflow = b""
    if n_segs == 1:
        off_field, cnt_field = long_val(offsets[0]), long_val(counts[0])
    else:
        off_field = long_val(overflow_base + len(overflow))
        overflow += struct.pack(f"<{n_segs}I", *offsets)
        cnt_field = long_val(overflow_base + len(overflow))
        overflow += struct.pack(f"<{n_segs}I", *counts)
    ents = []
    for tag, typ, cnt, val in sorted(
        entries_fixed
        + [(off_tag, 4, n_segs, None), (cnt_tag, 4, n_segs, None)]
    ):
        if tag == off_tag and val is None:
            ents.append(entry(tag, 4, n_segs, off_field))
        elif tag == cnt_tag and val is None:
            ents.append(entry(tag, 4, n_segs, cnt_field))
        elif isinstance(val, tuple):
            # multi-count value (e.g. BitsPerSample for spp=3): inline when
            # it fits the 4-byte value field, else in the overflow area
            ch, size = _TIFF_TYPE[typ]
            packed = struct.pack(f"<{len(val)}{ch}", *val)
            if len(packed) <= 4:
                ents.append(entry(tag, typ, len(val), packed.ljust(4, b"\x00")))
            else:
                ents.append(
                    entry(tag, typ, len(val), long_val(overflow_base + len(overflow)))
                )
                overflow += packed
        elif typ == 3:
            ents.append(entry(tag, 3, 1, short_val(val)))
        else:
            ents.append(entry(tag, 4, 1, long_val(val)))
    ifd = struct.pack("<H", n_entries) + b"".join(ents) + struct.pack("<I", 0)
    return (
        struct.pack("<2sHI", b"II", 42, ifd_off)
        + b"".join(segs)
        + ifd
        + overflow
    )


def _tiff_chunky(img: np.ndarray) -> tuple[np.ndarray, int, int, int]:
    """(rows-major pixel array, h, w, spp): 2-D grayscale passes through as
    (h, w, 1); channel-major (3, h, w) RGB becomes chunky-interleaved
    (h, w, 3) — PlanarConfiguration=1, the TIFF default."""
    img = np.ascontiguousarray(img, dtype="<u2")
    if img.ndim == 3:
        if img.shape[0] != 3:
            raise ValueError(f"RGB TIFF input must be (3, h, w), got {img.shape}")
        return np.ascontiguousarray(np.transpose(img, (1, 2, 0))), img.shape[1], img.shape[2], 3
    h, w = img.shape
    return img[:, :, None], h, w, 1


def encode_tiff(img: np.ndarray, rows_per_strip: int | None = None) -> bytes:
    """Little-endian uncompressed 16-bit TIFF, strip-organized (libtiff's
    ~8 KiB default strip size unless overridden). 2-D input → grayscale;
    channel-major (3, h, w) input → chunky RGB (Photometric=2, spp=3)."""
    pix, h, w, spp = _tiff_chunky(img)
    if rows_per_strip is None:
        rows_per_strip = max(1, 8192 // max(1, w * 2 * spp))
    rows_per_strip = min(rows_per_strip, h)
    strips = [
        np.ascontiguousarray(pix[r : r + rows_per_strip]).astype("<u2").tobytes()
        for r in range(0, h, rows_per_strip)
    ]
    entries = [
        (256, 4, 1, w),               # ImageWidth
        (257, 4, 1, h),               # ImageLength
        (258, 3, spp, tuple([16] * spp)),  # BitsPerSample
        (259, 3, 1, 1),               # Compression = none
        (262, 3, 1, 2 if spp == 3 else 1),  # Photometric RGB / BlackIsZero
        (277, 3, 1, spp),             # SamplesPerPixel
        (278, 4, 1, rows_per_strip),  # RowsPerStrip
    ]
    if spp == 3:
        entries.append((284, 3, 1, 1))  # PlanarConfiguration = chunky
    return _tiff_container(strips, entries, 273, 279)


def encode_cog(img: np.ndarray, tile_size: int = 256) -> bytes:
    """COG-style grayscale TIFF: tile-organized (tags 322-325),
    DEFLATE-compressed (Compression=8, stdlib zlib), horizontal-differencing
    Predictor=2 — the layout rioxarray/GDAL emit for real Cloud-Optimized
    GeoTIFFs (reference accessors/hls.py:131-140). Edge tiles are padded to
    the full tile size with edge replication (padding bytes are outside
    ImageWidth/Length and ignored on read, TIFF 6.0 §15). 2-D input →
    grayscale; channel-major (3, h, w) input → chunky RGB (spp=3)."""
    pix, h, w, spp = _tiff_chunky(img)
    # tile dims must be multiples of 16 (§15); clamp to the image's own
    # power-of-two envelope so small images don't carry a mostly-padding tile
    ts = int(tile_size)
    envelope = 16
    while envelope < max(h, w) and envelope < ts:
        envelope *= 2
    ts = min(ts, envelope)
    # TIFF 6.0 §15: TileWidth/TileLength MUST be multiples of 16 — round a
    # caller-supplied odd size down so external readers (GDAL/libtiff)
    # accept the file (the envelope values above are already powers of two)
    ts = max(16, (ts // 16) * 16)
    nty = -(-h // ts)
    ntx = -(-w // ts)
    pad = np.pad(pix, ((0, nty * ts - h), (0, ntx * ts - w), (0, 0)), mode="edge")
    tiles = []
    for ty in range(nty):
        for tx in range(ntx):
            t = pad[ty * ts : (ty + 1) * ts, tx * ts : (tx + 1) * ts]
            raw = _predict2(t).astype("<u2").tobytes()
            tiles.append(zlib.compress(raw, 6))
    entries = [
        (256, 4, 1, w),    # ImageWidth
        (257, 4, 1, h),    # ImageLength
        (258, 3, spp, tuple([16] * spp)),  # BitsPerSample
        (259, 3, 1, 8),    # Compression = DEFLATE (Adobe)
        (262, 3, 1, 2 if spp == 3 else 1),  # Photometric RGB / BlackIsZero
        (277, 3, 1, spp),  # SamplesPerPixel
        (317, 3, 1, 2),    # Predictor = horizontal differencing
        (322, 4, 1, ts),   # TileWidth
        (323, 4, 1, ts),   # TileLength
    ]
    if spp == 3:
        entries.append((284, 3, 1, 1))  # PlanarConfiguration = chunky
    return _tiff_container(tiles, entries, 324, 325)


def decode_tiff(data: bytes, w: int | None = None, h: int | None = None) -> np.ndarray:
    """Baseline grayscale TIFF reader: II/MM, 8/16-bit, uncompressed strips.
    Returns uint16 (8-bit samples are scaled x257 like the JPEG path)."""
    if len(data) < 8:
        raise ValueError("truncated TIFF header")
    order = data[:2]
    if order == b"II":
        e = "<"
    elif order == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order mark)")
    magic, ifd_off = struct.unpack(e + "HI", data[2:8])
    if magic != 42:
        raise ValueError("not a TIFF (bad magic)")
    if ifd_off + 2 > len(data):
        raise ValueError("truncated TIFF IFD")
    (n_entries,) = struct.unpack(e + "H", data[ifd_off : ifd_off + 2])
    tags: dict[int, tuple] = {}
    for i in range(n_entries):
        ent = data[ifd_off + 2 + i * 12 : ifd_off + 14 + i * 12]
        if len(ent) < 12:
            raise ValueError("truncated TIFF IFD entry")
        tag, typ, cnt = struct.unpack(e + "HHI", ent[:8])
        if typ not in _TIFF_TYPE:
            continue  # rational/ascii geo tags etc. — not needed for pixels
        ch, size = _TIFF_TYPE[typ]
        total = size * cnt
        if total <= 4:
            raw = ent[8 : 8 + total]
        else:
            (off,) = struct.unpack(e + "I", ent[8:12])
            raw = data[off : off + total]
            if len(raw) < total:
                raise ValueError("truncated TIFF tag array")
        tags[tag] = struct.unpack(e + ch * cnt, raw)

    def one(tag: int, default=None):
        v = tags.get(tag, default)
        if v is None:
            raise ValueError(f"TIFF missing required tag {tag}")
        return v[0]

    width, height = one(256), one(257)
    bits = one(258, (16,))
    comp = one(259, (1,))
    spp = one(277, (1,))
    pred = one(317, (1,))
    if comp not in (1, 8, 32946):
        raise ValueError(f"unsupported TIFF compression={comp} (none/DEFLATE only)")
    if pred not in (1, 2):
        raise ValueError(f"unsupported TIFF predictor={pred}")
    if spp not in (1, 3):
        raise ValueError(f"unsupported TIFF SamplesPerPixel={spp} (1 or 3)")
    planar = one(284, (1,))
    if spp == 3 and planar != 1:
        raise ValueError("planar (separate-plane) RGB TIFF not supported")
    if bits not in (8, 16):
        raise ValueError(f"unsupported BitsPerSample={bits}")
    dtype = np.dtype(e + ("u2" if bits == 16 else "u1"))
    acc = np.uint16 if bits == 16 else np.uint8

    def segment(off: int, cnt: int, n_rows: int, n_cols: int) -> np.ndarray:
        """One strip/tile as (n_rows, n_cols, spp) chunky samples."""
        seg = data[off : off + cnt]
        if len(seg) < cnt:
            raise ValueError("truncated TIFF segment")
        if comp != 1:
            seg = zlib.decompress(seg)
        arr = np.frombuffer(seg, dtype, count=n_rows * n_cols * spp).reshape(
            n_rows, n_cols, spp
        )
        if pred == 2:
            # undo horizontal differencing: per-channel modulo cumsum across
            # the pixel axis (§14 differences same-channel neighbors)
            arr = np.cumsum(arr, axis=1, dtype=acc)
        return arr

    if 322 in tags or 323 in tags:
        # tile-organized (COG): tiles are full tile_w x tile_l blocks; edge
        # padding lies outside ImageWidth/Length and is cropped (§15)
        tile_w, tile_l = one(322), one(323)
        offs = tags.get(324)
        cnts = tags.get(325)
        if offs is None or cnts is None or len(offs) != len(cnts):
            raise ValueError("TIFF missing tile offsets/counts")
        ntx = -(-width // tile_w)
        nty = -(-height // tile_l)
        if len(offs) != ntx * nty:
            raise ValueError("TIFF tile count does not cover the image")
        img = np.empty((height, width, spp), acc)
        for i, (off, cnt) in enumerate(zip(offs, cnts)):
            ty, tx = divmod(i, ntx)
            t = segment(off, cnt, tile_l, tile_w)
            y0, x0 = ty * tile_l, tx * tile_w
            img[y0 : y0 + tile_l, x0 : x0 + tile_w] = t[
                : min(tile_l, height - y0), : min(tile_w, width - x0)
            ]
    else:
        rows_per_strip = one(278, (height,))
        offs = tags.get(273)
        cnts = tags.get(279)
        if offs is None or cnts is None or len(offs) != len(cnts):
            raise ValueError("TIFF missing strip offsets/counts")
        rows = []
        remaining = height
        for off, cnt in zip(offs, cnts):
            n_rows = min(rows_per_strip, remaining)
            rows.append(segment(off, cnt, n_rows, width))
            remaining -= n_rows
        if remaining != 0:
            raise ValueError("TIFF strip rows do not cover ImageLength")
        img = np.vstack(rows)
    img = img.astype(np.uint16)
    if bits == 8:
        img = img * np.uint16(257)
    if spp == 3:
        return np.ascontiguousarray(np.transpose(img, (2, 0, 1)))  # (3, h, w)
    return img[:, :, 0]


# ---------------------------------------------------------------------------
# NetCDF-3 classic (CDF-1) — the reference's Sentinel-3 swath container
# (accessors/sen3.py:172-173 reads geodetic/measurement .nc files via
# xarray). Pure-struct implementation of the public classic format
# (NASA/Unidata spec): big-endian header with dim/attr/var lists, fixed
# (non-record) variables only — exactly what swath granules need.
# ---------------------------------------------------------------------------

_NC_MAGIC = b"CDF\x01"
_NC_DIMENSION, _NC_VARIABLE, _NC_ATTRIBUTE = 10, 11, 12
#: nc_type -> (numpy big-endian dtype, size)
_NC_TYPES = {1: (">i1", 1), 3: (">i2", 2), 4: (">i4", 4), 5: (">f4", 4), 6: (">f8", 8)}
_NC_OF_DTYPE = {"int8": 1, "int16": 3, "int32": 4, "float32": 5, "float64": 6}


def _nc_name(s: str) -> bytes:
    b = s.encode()
    return struct.pack(">I", len(b)) + b + b"\x00" * ((-len(b)) % 4)


def encode_netcdf3(variables: dict[str, np.ndarray]) -> bytes:
    """Minimal CDF-1 writer: one shared dim list (deduped by size), no
    attributes, fixed variables in dict order. Round-trips bit-exactly
    through decode_netcdf3 and through any conforming reader."""
    dims: list[int] = []
    var_dimids: dict[str, list[int]] = {}
    for name, arr in variables.items():
        ids = []
        for size in arr.shape:
            if size not in dims:
                dims.append(size)
            ids.append(dims.index(size))
        var_dimids[name] = ids

    def header(begins: dict[str, int]) -> bytes:
        out = [_NC_MAGIC, struct.pack(">I", 0)]  # numrecs = 0
        out.append(struct.pack(">II", _NC_DIMENSION, len(dims)) if dims else struct.pack(">II", 0, 0))
        for i, size in enumerate(dims):
            out.append(_nc_name(f"dim_{i}") + struct.pack(">I", size))
        out.append(struct.pack(">II", 0, 0))  # no global attrs
        out.append(struct.pack(">II", _NC_VARIABLE, len(variables)))
        for name, arr in variables.items():
            nct = _NC_OF_DTYPE[arr.dtype.name]
            size = _NC_TYPES[nct][1]
            vsize = arr.size * size
            vsize += (-vsize) % 4
            out.append(_nc_name(name))
            out.append(struct.pack(">I", len(var_dimids[name])))
            for d in var_dimids[name]:
                out.append(struct.pack(">I", d))
            out.append(struct.pack(">II", 0, 0))  # no var attrs
            out.append(struct.pack(">III", nct, vsize, begins.get(name, 0)))
        return b"".join(out)

    hlen = len(header({}))
    begins, pos = {}, hlen
    for name, arr in variables.items():
        begins[name] = pos
        nbytes = arr.size * _NC_TYPES[_NC_OF_DTYPE[arr.dtype.name]][1]
        pos += nbytes + ((-nbytes) % 4)
    body = []
    for name, arr in variables.items():
        nct = _NC_OF_DTYPE[arr.dtype.name]
        raw = np.ascontiguousarray(arr).astype(_NC_TYPES[nct][0]).tobytes()
        body.append(raw + b"\x00" * ((-len(raw)) % 4))
    return header(begins) + b"".join(body)


def decode_netcdf3(data: bytes) -> dict[str, np.ndarray]:
    """CDF-1/CDF-2 reader for fixed variables (attributes parsed and
    skipped; record variables rejected). Returns {name: native-order
    ndarray shaped by the variable's dims}. Truncated/corrupt streams
    raise ValueError (never a raw struct/Key/Index error)."""
    try:
        return _decode_netcdf3(data)
    except (struct.error, KeyError, IndexError, UnicodeDecodeError) as e:
        raise ValueError(
            f"truncated or corrupt NetCDF classic stream: {type(e).__name__}: {e}"
        ) from e


def _decode_netcdf3(data: bytes) -> dict[str, np.ndarray]:
    if data[:3] != b"CDF" or data[3] not in (1, 2):
        raise ValueError("not a NetCDF classic stream")
    wide = data[3] == 2  # CDF-2: 64-bit begin offsets
    pos = 8  # magic + numrecs

    def u32() -> int:
        nonlocal pos
        (v,) = struct.unpack(">I", data[pos : pos + 4])
        pos += 4
        return v

    def name() -> str:
        n = u32()
        nonlocal pos
        s = data[pos : pos + n].decode()
        pos += n + ((-n) % 4)
        return s

    def tagged_count(expect: int) -> int:
        tag = u32()
        n = u32()
        if tag not in (0, expect) or (tag == 0 and n != 0):
            raise ValueError(f"malformed NetCDF list (tag={tag})")
        return n

    dims = []
    for _ in range(tagged_count(_NC_DIMENSION)):
        name()
        dims.append(u32())

    def skip_attrs():
        nonlocal pos
        for _ in range(tagged_count(_NC_ATTRIBUTE)):
            name()
            typ = u32()
            n = u32()
            if typ == 2:  # char
                nbytes = n
            else:
                nbytes = n * _NC_TYPES[typ][1]
            pos += nbytes + ((-nbytes) % 4)

    skip_attrs()
    out: dict[str, np.ndarray] = {}
    for _ in range(tagged_count(_NC_VARIABLE)):
        vname = name()
        ndims = u32()
        shape = tuple(dims[u32()] for _ in range(ndims))
        skip_attrs()
        typ = u32()
        u32()  # vsize (padded; recomputed from shape)
        if wide:
            (begin,) = struct.unpack(">Q", data[pos : pos + 8])
            pos += 8
        else:
            begin = u32()
        if shape and shape[0] == 0:
            raise ValueError("record (unlimited-dim) variables not supported")
        dt, size = _NC_TYPES[typ]
        count = int(np.prod(shape)) if shape else 1
        raw = data[begin : begin + count * size]
        if len(raw) < count * size:
            raise ValueError(f"truncated NetCDF variable {vname!r}")
        arr = np.frombuffer(raw, dt, count=count).reshape(shape)
        out[vname] = arr.astype(arr.dtype.newbyteorder("="))
    return out


# ---------------------------------------------------------------------------
# WAV — RIFF PCM16 mono (stdlib struct; the audio modality's container).
# Not in the IMAGE dispatch tables below: audio rows live in their own
# table and flow through operators/multimodal.audio_features.
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Canonical 44-byte RIFF/WAVE header + PCM16LE mono payload."""
    pcm = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * 2
    return b"".join(
        [
            b"RIFF", struct.pack("<I", 36 + len(pcm)), b"WAVE",
            b"fmt ", struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, byte_rate, 2, 16),
            b"data", struct.pack("<I", len(pcm)), pcm,
        ]
    )


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, int16 samples) from a PCM16 mono RIFF/WAVE stream;
    walks the chunk list so extra chunks (LIST/fact) are tolerated."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    rate = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if len(body) < size:
            # a silently-clipped chunk would decode to fewer samples than
            # the header claims — fail loudly like the stdlib parser does
            raise ValueError("truncated WAV chunk")
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("malformed WAV fmt chunk")
            fmt_code, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt_code != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV (fmt={fmt_code} ch={channels} bits={bits}); "
                    "PCM16 mono only"
                )
        elif tag == b"data":
            if size % 2:
                raise ValueError("odd-sized WAV PCM16 data chunk")
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    return int(rate), np.frombuffer(pcm, dtype="<i2")


# ---------------------------------------------------------------------------
# AIFF — IFF FORM/AIFF PCM16 mono (the SECOND audio container next to WAV:
# big-endian samples, COMM sample rate as an 80-bit IEEE extended float —
# the only exotic field, implemented exactly). Pure struct, stdlib-free.
# ---------------------------------------------------------------------------


def _f80_encode(x: float) -> bytes:
    """IEEE 754 80-bit extended big-endian (AIFF COMM sampleRate field)."""
    import math

    if x == 0:
        return b"\x00" * 10
    if x < 0:
        raise ValueError("negative sample rate")
    m, e = math.frexp(x)  # x = m * 2**e, m in [0.5, 1)
    return struct.pack(">HQ", e + 16382, int(m * (1 << 64)))


def _f80_decode(b: bytes) -> float:
    exp, mant = struct.unpack(">HQ", b[:10])
    if exp == 0 and mant == 0:
        return 0.0
    sign = -1.0 if exp & 0x8000 else 1.0
    return sign * mant * 2.0 ** ((exp & 0x7FFF) - 16383 - 63)


def encode_aiff(samples: np.ndarray, sample_rate: int) -> bytes:
    """FORM/AIFF with COMM (mono, 16-bit, f80 rate) + SSND (big-endian)."""
    pcm = np.ascontiguousarray(samples, dtype=">i2").tobytes()
    comm = struct.pack(">HIH", 1, len(pcm) // 2, 16) + _f80_encode(float(sample_rate))
    ssnd = struct.pack(">II", 0, 0) + pcm
    body = (
        b"AIFF"
        + b"COMM" + struct.pack(">I", len(comm)) + comm
        + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd + (b"\x00" * (len(ssnd) & 1))
    )
    return b"FORM" + struct.pack(">I", len(body)) + body


def decode_aiff(data: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, int16 samples) from a PCM16 mono AIFF; chunk-walks so
    extra chunks are tolerated. ValueError on truncation/corruption."""
    try:
        return _decode_aiff(data)
    except struct.error as e:
        raise ValueError(f"truncated or corrupt AIFF stream: {e}") from e


def _decode_aiff(data: bytes) -> tuple[int, np.ndarray]:
    if data[:4] != b"FORM" or data[8:12] != b"AIFF":
        raise ValueError("not a FORM/AIFF stream")
    pos = 12
    rate = None
    n_frames = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack(">I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError("truncated AIFF chunk")
        if tag == b"COMM":
            if size < 18:
                raise ValueError("malformed AIFF COMM chunk")
            channels, n_frames, bits = struct.unpack(">HIH", body[:8])
            rate_f = _f80_decode(body[8:18])
            if channels != 1 or bits != 16:
                raise ValueError(
                    f"unsupported AIFF (ch={channels} bits={bits}); PCM16 mono only"
                )
            if rate_f <= 0 or rate_f != round(rate_f):
                raise ValueError(f"unsupported AIFF sample rate {rate_f}")
            rate = int(round(rate_f))
        elif tag == b"SSND":
            if size < 8:
                raise ValueError("malformed AIFF SSND chunk")
            offset, _block = struct.unpack(">II", body[:8])
            pcm = body[8 + offset :]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or pcm is None or n_frames is None:
        raise ValueError("AIFF missing COMM/SSND chunk")
    if len(pcm) < 2 * n_frames:
        raise ValueError("AIFF SSND shorter than COMM numSampleFrames")
    return rate, np.frombuffer(pcm[: 2 * n_frames], dtype=">i2").astype("<i2")


def sniff_audio(data: bytes) -> str:
    """'wav' | 'aiff' | 'flac' by magic — the container dispatch for audio
    rows."""
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:4] == b"FORM" and data[8:12] == b"AIFF":
        return "aiff"
    if data[:4] == b"fLaC":
        return "flac"
    raise ValueError(
        "unknown audio container (RIFF/WAVE, FORM/AIFF or fLaC expected)"
    )


def decode_audio(data: bytes) -> tuple[int, np.ndarray]:
    kind = sniff_audio(data)
    if kind == "wav":
        return decode_wav(data)
    if kind == "aiff":
        return decode_aiff(data)
    return decode_flac(data)


# ---------------------------------------------------------------------------
# FLAC — free lossless audio codec (mono PCM16 subset), the COMPRESSED
# audio container next to the raw-PCM WAV/AIFF pair. Unlike MPEG audio
# (whose decoder needs normative spec-table data — 32 Huffman tables, the
# 512-tap synthesis window — that cannot be re-derived algorithmically),
# FLAC is fully algorithmic: fixed-order linear prediction + Rice-coded
# residuals + well-known CRC polynomials, so a conforming subset can be
# built and self-oracled from first principles. The encoder emits
# fixed-predictor subframes only (orders 0-4, chosen per frame) with
# single-partition Rice residuals; the decoder parses the full frame
# structure and explicitly rejects the unimplemented subset (LPC
# subframes, stereo, wasted bits) with ValueError. Three in-band
# integrity oracles: CRC-8 over each frame header, CRC-16 over each whole
# frame, and the STREAMINFO MD5 of the decoded signal.
# Reference format-dispatch analogue: constants.py:76-98 (the reference
# has no audio path at all).
# ---------------------------------------------------------------------------

FLAC_BLOCK = 4096

_CRC8_TAB = []
for _b in range(256):
    _c = _b
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07) & 0xFF if _c & 0x80 else (_c << 1) & 0xFF
    _CRC8_TAB.append(_c)

_CRC16_TAB = []
for _b in range(256):
    _c = _b << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x8005) & 0xFFFF if _c & 0x8000 else (_c << 1) & 0xFFFF
    _CRC16_TAB.append(_c)


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8_TAB[c ^ b]
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC16_TAB[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


class _MSBWriter:
    """MSB-first bit writer (no byte stuffing — that's a JPEG-ism)."""

    def __init__(self):
        self.acc = 0
        self.nbits = 0
        self.out = bytearray()

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.out.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def put_signed(self, v: int, length: int):
        self.put(v & ((1 << length) - 1), length)

    def align(self):
        if self.nbits:
            self.put(0, 8 - self.nbits)


def _utf8_number(n: int) -> bytes:
    """FLAC's UTF-8-style coded number (frame index, up to 36 bits)."""
    if n < 0x80:
        return bytes([n])
    for nbytes, lead_bits in ((2, 11), (3, 16), (4, 21), (5, 26), (6, 31), (7, 36)):
        if n < (1 << lead_bits):
            cont = [0x80 | ((n >> (6 * i)) & 0x3F) for i in range(nbytes - 2, -1, -1)]
            lead_mask = (0xFF << (8 - nbytes)) & 0xFF
            lead = lead_mask | (n >> (6 * (nbytes - 1)))
            return bytes([lead] + cont)
    raise ValueError("frame number exceeds 36 bits")


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    return np.diff(x, n=order) if order else x.copy()


def _best_rice_k(u: np.ndarray) -> tuple[int, int]:
    """(k, bits) minimizing the single-partition Rice size."""
    best_k, best_bits = 0, None
    for k in range(15):
        bits = int(np.sum(u >> k)) + len(u) * (k + 1)
        if best_bits is None or bits < best_bits:
            best_k, best_bits = k, bits
    return best_k, best_bits


def encode_flac(pcm: np.ndarray, rate: int) -> bytes:
    """PCM16 mono -> FLAC: STREAMINFO (with the real MD5 signature) +
    fixed-blocksize frames, each a constant or best-fixed-order subframe
    with one Rice partition (escape to raw when Rice loses)."""
    import hashlib

    pcm = np.asarray(pcm)
    if pcm.dtype != np.int16 or pcm.ndim != 1:
        raise ValueError("encode_flac expects 1-D int16 samples")
    if not (1 <= rate < (1 << 20)):
        raise ValueError(f"sample rate {rate} outside FLAC's 20-bit field")
    n = len(pcm)
    md5 = hashlib.md5(pcm.astype("<i2").tobytes()).digest()

    si = _MSBWriter()
    si.put(FLAC_BLOCK, 16)  # min blocksize
    si.put(FLAC_BLOCK, 16)  # max blocksize
    si.put(0, 24)  # min framesize unknown
    si.put(0, 24)  # max framesize unknown
    si.put(rate, 20)
    si.put(0, 3)  # channels - 1
    si.put(15, 5)  # bits per sample - 1
    si.put(n, 36)
    streaminfo = bytes(si.out) + md5
    out = bytearray(b"fLaC")
    out += bytes([0x80, 0, 0, len(streaminfo)])  # last-block | STREAMINFO
    out += streaminfo

    x64 = pcm.astype(np.int64)
    for fi, start in enumerate(range(0, max(n, 1), FLAC_BLOCK)):
        blk = x64[start : start + FLAC_BLOCK]
        bs = len(blk)
        if bs == 0:
            break
        hdr = _MSBWriter()
        hdr.put(0b11111111111110, 14)  # sync
        hdr.put(0, 1)  # reserved
        hdr.put(0, 1)  # fixed-blocksize stream
        hdr.put(0b0111, 4)  # blocksize: 16-bit value-1 follows
        hdr.put(0b0000, 4)  # sample rate: from STREAMINFO
        hdr.put(0b0000, 4)  # channel assignment: mono
        hdr.put(0b100, 3)  # sample size: 16 bit
        hdr.put(0, 1)  # reserved
        header = bytes(hdr.out) + _utf8_number(fi) + struct.pack(">H", bs - 1)
        frame = _MSBWriter()
        frame.out += header
        frame.out.append(_crc8(header))

        if np.all(blk == blk[0]):
            frame.put(0, 1)
            frame.put(0b000000, 6)  # constant
            frame.put(0, 1)  # no wasted bits
            frame.put_signed(int(blk[0]), 16)
        else:
            best = None
            for order in range(0, min(5, bs)):
                resid = _fixed_residual(blk, order)
                u = (resid << 1) ^ (resid >> 63)  # zigzag
                k, bits = _best_rice_k(u.astype(np.uint64))
                if best is None or bits < best[3]:
                    best = (order, resid, k, bits)
            order, resid, k, rice_bits = best
            frame.put(0, 1)
            frame.put(0b001000 | order, 6)  # fixed, order
            frame.put(0, 1)  # no wasted bits
            for w in blk[:order]:
                frame.put_signed(int(w), 16)
            u = ((resid << 1) ^ (resid >> 63)).astype(np.uint64)
            raw_nb = max(1, int(np.max(np.abs(resid))).bit_length() + 1)
            if rice_bits > 5 + len(u) * raw_nb:
                # escape: raw two's-complement residuals
                frame.put(0b00, 2)  # Rice method (escape lives inside)
                frame.put(0, 4)  # partition order 0
                frame.put(0b1111, 4)  # escape code
                frame.put(raw_nb, 5)
                for v in resid:
                    frame.put_signed(int(v), raw_nb)
            else:
                frame.put(0b00, 2)
                frame.put(0, 4)
                frame.put(k, 4)
                for uv in u.tolist():
                    q = uv >> k
                    frame.put(0, q) if q else None
                    frame.put(1, 1)
                    if k:
                        frame.put(uv & ((1 << k) - 1), k)
        frame.align()
        body = bytes(frame.out)
        out += body + struct.pack(">H", _crc16(body))
    return bytes(out)


class _FlacReader:
    """MSB-first bit reader with O(1) unary runs (precomputed 1-bit
    positions) and 16-bit windowed peeks (same vectorized trick as the
    JPEG entropy reader)."""

    def __init__(self, data: bytes):
        self.data = data
        by = np.frombuffer(data, np.uint8).astype(np.uint32)
        by = np.concatenate([by, np.zeros(4, np.uint32)])
        val24 = (by[:-2] << 16) | (by[1:-1] << 8) | by[2:]
        self.next16 = (
            (val24[:, None] >> (8 - np.arange(8, dtype=np.uint32))[None, :]) & 0xFFFF
        ).reshape(-1)
        bits = np.unpackbits(np.frombuffer(data, np.uint8))
        self.ones = np.flatnonzero(bits)
        self.nbits = 8 * len(data)
        self.pos = 0

    def bits(self, k: int) -> int:
        if self.pos + k > self.nbits:
            raise ValueError("truncated FLAC stream")
        v = 0
        p, rem = self.pos, k
        while rem > 16:
            v = (v << 16) | int(self.next16[p])
            p += 16
            rem -= 16
        if rem:
            v = (v << rem) | (int(self.next16[p]) >> (16 - rem))
            p += rem
        self.pos = p
        return v

    def signed(self, k: int) -> int:
        v = self.bits(k)
        return v - (1 << k) if v >= (1 << (k - 1)) else v

    def unary(self) -> int:
        i = int(np.searchsorted(self.ones, self.pos))
        if i >= len(self.ones):
            raise ValueError("truncated FLAC stream (unary run past end)")
        one_pos = int(self.ones[i])
        q = one_pos - self.pos
        self.pos = one_pos + 1
        return q

    def align(self):
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        if self.pos & 7:
            raise ValueError("FLAC reader misaligned at a byte boundary")
        return self.pos >> 3


def _flac_utf8_read(r: "_FlacReader") -> int:
    lead = r.bits(8)
    if lead < 0x80:
        return lead
    nbytes = 0
    for nb in range(2, 8):
        mask = (0xFF << (8 - nb)) & 0xFF
        if (lead & ~((1 << (7 - nb)) - 1)) & 0xFF == mask:
            nbytes = nb
            break
    if not nbytes:
        raise ValueError("bad FLAC UTF-8 coded number lead byte")
    n = lead & ((1 << (7 - nbytes)) - 1)
    for _ in range(nbytes - 1):
        c = r.bits(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad FLAC UTF-8 continuation byte")
        n = (n << 6) | (c & 0x3F)
    return n


def decode_flac(data: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, int16 samples) from the mono/16-bit FLAC subset.
    Verifies all three in-band integrity fields (frame-header CRC-8,
    frame CRC-16, STREAMINFO MD5) and rejects out-of-subset features
    (stereo, LPC subframes, wasted bits) with ValueError."""
    import hashlib

    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated FLAC metadata")
        head = data[pos]
        size = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + size]
        if len(body) < size:
            raise ValueError("truncated FLAC metadata block")
        if head & 0x7F == 0:
            if size != 34:
                raise ValueError("bad FLAC STREAMINFO size")
            streaminfo = body
        pos += 4 + size
        if head & 0x80:
            break
    if streaminfo is None:
        raise ValueError("FLAC missing STREAMINFO")
    si = _FlacReader(streaminfo)
    si.bits(16)  # min blocksize
    si.bits(16)  # max blocksize
    si.bits(24)
    si.bits(24)
    rate = si.bits(20)
    if si.bits(3) != 0:
        raise ValueError("stereo FLAC not supported (mono subset)")
    if si.bits(5) != 15:
        raise ValueError("only 16-bit FLAC supported")
    total = si.bits(36)
    md5_expect = streaminfo[18:34]
    if rate == 0:
        raise ValueError("bad FLAC sample rate")

    r = _FlacReader(data)
    r.pos = pos * 8
    out = []
    got = 0
    while got < total:
        frame_start = r.byte_pos()
        if r.bits(14) != 0b11111111111110:
            raise ValueError("bad FLAC frame sync")
        r.bits(1)  # reserved
        r.bits(1)  # blocking strategy
        bs_code = r.bits(4)
        sr_code = r.bits(4)
        chan = r.bits(4)
        if chan != 0:
            raise ValueError("stereo FLAC frame not supported (mono subset)")
        if r.bits(3) != 0b100:
            raise ValueError("only 16-bit FLAC frames supported")
        r.bits(1)  # reserved
        _flac_utf8_read(r)
        if bs_code == 0b0110:
            bs = r.bits(8) + 1
        elif bs_code == 0b0111:
            bs = r.bits(16) + 1
        elif bs_code == 0:
            raise ValueError("reserved FLAC blocksize code")
        else:
            raise ValueError("FLAC blocksize code outside encoder subset")
        if sr_code != 0:
            raise ValueError("explicit FLAC frame sample rate not in subset")
        hdr_end = r.byte_pos()
        if _crc8(data[frame_start:hdr_end]) != r.bits(8):
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if r.bits(1) != 0:
            raise ValueError("bad FLAC subframe padding bit")
        st = r.bits(6)
        if r.bits(1) != 0:
            raise ValueError("FLAC wasted-bits not supported in this subset")
        if st == 0:  # constant
            blk = np.full(bs, r.signed(16), np.int64)
        elif st == 1:  # verbatim
            blk = np.array([r.signed(16) for _ in range(bs)], np.int64)
        elif 0b001000 <= st <= 0b001100:  # fixed order 0-4
            order = st & 0x07
            warm = np.array([r.signed(16) for _ in range(order)], np.int64)
            if r.bits(2) != 0:
                raise ValueError("FLAC RICE2 residual not in subset")
            part_order = r.bits(4)
            nres = bs - order
            resid = np.empty(nres, np.int64)
            filled = 0
            for pi in range(1 << part_order):
                cnt = (bs >> part_order) - (order if pi == 0 else 0)
                if cnt < 0:
                    raise ValueError("FLAC partition smaller than order")
                k = r.bits(4)
                if k == 0b1111:
                    nb = r.bits(5)
                    if nb == 0:
                        vals = [0] * cnt
                    else:
                        vals = [r.signed(nb) for _ in range(cnt)]
                else:
                    vals = []
                    for _ in range(cnt):
                        q = r.unary()
                        u = (q << k) | (r.bits(k) if k else 0)
                        vals.append((u >> 1) ^ -(u & 1))  # un-zigzag
                resid[filled : filled + cnt] = vals
                filled += cnt
            vals = resid
            for j in range(order - 1, -1, -1):
                init = int(np.diff(warm, n=j)[0]) if j else int(warm[0])
                vals = np.cumsum(np.concatenate([[init], vals]))
            blk = vals
        elif st >= 0b100000:
            raise ValueError("FLAC LPC subframe not supported (fixed subset)")
        else:
            raise ValueError(f"reserved FLAC subframe type {st:#08b}")
        r.align()
        crc_pos = r.byte_pos()
        if _crc16(data[frame_start:crc_pos]) != r.bits(16):
            raise ValueError("FLAC frame CRC-16 mismatch")
        if np.any(blk < -32768) or np.any(blk > 32767):
            raise ValueError("FLAC decoded sample out of int16 range")
        out.append(blk.astype(np.int16))
        got += bs
    samples = (
        np.concatenate(out) if out else np.zeros(0, np.int16)
    )[:total]
    if md5_expect != b"\x00" * 16:
        if hashlib.md5(samples.astype("<i2").tobytes()).digest() != md5_expect:
            raise ValueError("FLAC STREAMINFO MD5 mismatch (corrupt stream)")
    return rate, samples


# ---------------------------------------------------------------------------
# AVI — RIFF MJPEG (the video modality's container). Same length-prefixed
# chunk family as WAV above; frames are the engine's OWN baseline JPEG
# streams (grayscale or 4:2:0 color), so the whole modality stays
# pure-struct + NumPy with zero external codec libs. The idx1 index makes
# frame access O(1): a sampler decodes ONLY the frames it needs (the
# at-scale story — never decode a whole clip for k sampled frames).
# Reference format-dispatch analogue: constants.py:76-98,
# accessors/base.py:50-69 (it has no video path at all).
# ---------------------------------------------------------------------------


def _riff_chunk(tag: bytes, payload: bytes) -> bytes:
    """Word-aligned RIFF chunk (chunks are padded to even length)."""
    return tag + struct.pack("<I", len(payload)) + payload + (b"\x00" * (len(payload) & 1))


def _riff_list(kind: bytes, payload: bytes) -> bytes:
    return _riff_chunk(b"LIST", kind + payload)


def encode_avi_mjpeg(frames, fps: int = 10) -> bytes:
    """MJPEG-in-AVI: one '00dc' chunk per frame, each a standalone baseline
    JPEG (encode_jpeg — 2-D grayscale or (3, h, w) color), with avih/strh
    headers and a standard idx1 index (AVIF_HASINDEX). All frames must
    share one geometry, like any real fixed-resolution clip."""
    frames = [np.asarray(f) for f in frames]
    if not frames:
        raise ValueError("AVI needs at least one frame")
    shapes = {f.shape for f in frames}
    if len(shapes) != 1:
        raise ValueError(f"all frames must share one shape, got {shapes}")
    shape = frames[0].shape
    h, w = (shape[1], shape[2]) if len(shape) == 3 else shape
    payloads = [encode_jpeg(f) for f in frames]
    movi_body = b""
    index = []  # (offset-from-movi-kind, size) per frame
    for pl in payloads:
        # idx1 offsets are measured from the position of the 'movi' fourcc
        index.append((4 + len(movi_body), len(pl)))
        movi_body += _riff_chunk(b"00dc", pl)
    max_size = max(len(p) for p in payloads)
    usec_per_frame = int(round(1_000_000 / fps))
    avih = struct.pack(
        "<IIIIIIIIII4I",
        usec_per_frame, max_size * fps, 0, 0x10,  # dwFlags = AVIF_HASINDEX
        len(frames), 0, 1, max_size, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vidsMJPG"
        + struct.pack(
            "<IHHIIIIIIiI4H",
            0, 0, 0, 0,
            1, fps,  # dwScale, dwRate -> fps = rate/scale
            0, len(frames), max_size, -1, 0,  # quality=-1 (default), sampleSize=0
            0, 0, w, h,
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0,
    )
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(b"strl", _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)),
    )
    movi = _riff_list(b"movi", movi_body)
    idx1 = _riff_chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", 0x10, off, size)  # AVIIF_KEYFRAME
            for off, size in index
        ),
    )
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi(data: bytes) -> dict:
    """Container-level parse (no pixel decode): walks the RIFF chunk list,
    reads avih/strh for (fps, n_frames, w, h) and idx1 for per-frame
    ABSOLUTE payload offsets — the O(1) random-access map a frame sampler
    seeks with. Falls back to scanning the movi list when idx1 is absent.
    Truncated/corrupt streams raise ValueError (never a raw struct.error)."""
    try:
        return _parse_avi(data)
    except struct.error as e:
        raise ValueError(f"truncated or corrupt AVI stream: {e}") from e


def _parse_avi(data: bytes) -> dict:
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    pos = 12
    fps = None
    n_frames = w = h = None
    movi_kind_pos = None
    idx_entries = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body_start = pos + 8
        if tag == b"LIST":
            kind = data[body_start : body_start + 4]
            if kind == b"hdrl":
                # descend: avih then nested strl/strh
                p2 = body_start + 4
                end2 = body_start + size
                while p2 + 8 <= end2:
                    t2 = data[p2 : p2 + 4]
                    (s2,) = struct.unpack("<I", data[p2 + 4 : p2 + 8])
                    if t2 == b"avih":
                        vals = struct.unpack("<10I", data[p2 + 8 : p2 + 48])
                        n_frames, w, h = vals[4], vals[8], vals[9]
                    elif t2 == b"LIST" and data[p2 + 8 : p2 + 12] == b"strl":
                        p3 = p2 + 12
                        t3 = data[p3 : p3 + 4]
                        (s3,) = struct.unpack("<I", data[p3 + 4 : p3 + 8])
                        if t3 == b"strh":
                            st = data[p3 + 8 : p3 + 8 + s3]
                            if st[:4] != b"vids" or st[4:8] != b"MJPG":
                                raise ValueError(
                                    "unsupported AVI stream (vids/MJPG only)"
                                )
                            scale, rate = struct.unpack("<II", st[20:28])
                            fps = rate / max(1, scale)
                    p2 += 8 + s2 + (s2 & 1)
            elif kind == b"movi":
                movi_kind_pos = body_start
        elif tag == b"idx1":
            idx_entries = []
            p2 = body_start
            end2 = body_start + size
            while p2 + 16 <= end2:
                ckid = data[p2 : p2 + 4]
                _, off, csz = struct.unpack("<III", data[p2 + 4 : p2 + 16])
                if ckid == b"00dc":
                    idx_entries.append((off, csz))
                p2 += 16
        pos = body_start + size + (size & 1)
    if movi_kind_pos is None or n_frames is None:
        raise ValueError("AVI missing movi list or avih header")
    if fps is None:
        # a mangled/missing strh would otherwise surface later as a
        # TypeError in frame_sample's float(meta['fps']) — keep the
        # corrupt-row failure mode uniformly ValueError
        raise ValueError("AVI missing vids strh header (no frame rate)")
    if idx_entries is not None:
        # idx1 offsets point at the 00dc chunk HEADER relative to the
        # 'movi' fourcc; payload starts 8 bytes past the header
        entries = [(movi_kind_pos + off + 8, csz) for off, csz in idx_entries]
    else:
        entries = []
        p2 = movi_kind_pos + 4
        while p2 + 8 <= len(data):
            t2 = data[p2 : p2 + 4]
            (s2,) = struct.unpack("<I", data[p2 + 4 : p2 + 8])
            if t2 == b"00dc":
                entries.append((p2 + 8, s2))
            p2 += 8 + s2 + (s2 & 1)
    if len(entries) != n_frames:
        raise ValueError(
            f"AVI index covers {len(entries)} frames, header says {n_frames}"
        )
    return {"fps": fps, "n_frames": n_frames, "w": w, "h": h, "entries": entries}


def decode_avi_frame(data: bytes, idx: int, meta: dict | None = None) -> np.ndarray:
    """Decode ONE frame by index via the idx1 map — O(frame), not O(clip)."""
    meta = meta or parse_avi(data)
    off, size = meta["entries"][idx]
    return decode_jpeg(data[off : off + size])


def decode_avi_mjpeg(data: bytes) -> tuple[float, list[np.ndarray]]:
    """(fps, all frames decoded) — the full-clip reader."""
    meta = parse_avi(data)
    return meta["fps"], [
        decode_jpeg(data[off : off + size]) for off, size in meta["entries"]
    ]


# ---------------------------------------------------------------------------
# MP4 — ISO base media file format (ISO/IEC 14496-12) with MJPEG samples
# (sample entry 'jpeg', the QuickTime-lineage photo-JPEG codec): the SECOND
# video container, pure-struct like the AVI one. Box layout ftyp|mdat|moov;
# the sample tables (stsz/stco, one sample per chunk) give O(1) frame seek
# exactly like AVI's idx1, so the sampler decodes only what it needs.
# ---------------------------------------------------------------------------


def _box(tag: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + tag + payload


def encode_mp4_mjpeg(frames, fps: int = 10) -> bytes:
    """MJPEG-in-MP4: each frame a baseline JPEG sample; mdhd timescale =
    fps with per-sample duration 1 (exact integer timing)."""
    frames = [np.asarray(f) for f in frames]
    if not frames:
        raise ValueError("MP4 needs at least one frame")
    shapes = {f.shape for f in frames}
    if len(shapes) != 1:
        raise ValueError(f"all frames must share one shape, got {shapes}")
    shape = frames[0].shape
    h, w = (shape[1], shape[2]) if len(shape) == 3 else shape
    payloads = [encode_jpeg(f) for f in frames]
    n = len(payloads)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat = _box(b"mdat", b"".join(payloads))
    offsets = []
    pos = len(ftyp) + 8
    for pl in payloads:
        offsets.append(pos)
        pos += len(pl)

    dur_units = n  # at timescale=fps, one unit per frame
    mvhd = _box(
        b"mvhd",
        struct.pack(">B3x", 0)
        + struct.pack(">IIII", 0, 0, 1000, n * 1000 // fps)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)  # rate, volume, reserved
        + b"\x00" * 8  # reserved
        + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24  # pre_defined
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = _box(
        b"tkhd",
        struct.pack(">B3B", 0, 0, 0, 3)  # version 0, flags: enabled+in-movie
        + struct.pack(">IIIII", 0, 0, 1, 0, n * 1000 // fps)
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)
        + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", w << 16, h << 16),
    )
    mdhd = _box(
        b"mdhd",
        struct.pack(">B3x", 0)
        + struct.pack(">IIII", 0, 0, fps, dur_units)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = _box(b"hdlr", struct.pack(">B3x", 0) + b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"MJPEG\x00")
    vmhd = _box(b"vmhd", struct.pack(">B3B", 0, 0, 0, 1) + b"\x00" * 8)
    dref = _box(b"dref", struct.pack(">B3xI", 0, 1) + _box(b"url ", struct.pack(">B3B", 0, 0, 0, 1)))
    dinf = _box(b"dinf", dref)
    sample_entry = _box(
        b"jpeg",
        b"\x00" * 6 + struct.pack(">H", 1)  # data reference index
        + b"\x00" * 16
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)  # frame count per sample
        + b"\x05MJPEG" + b"\x00" * 26  # 32-byte pascal compressorname
        + struct.pack(">Hh", 24, -1),
    )
    stsd = _box(b"stsd", struct.pack(">B3xI", 0, 1) + sample_entry)
    stts = _box(b"stts", struct.pack(">B3xI", 0, 1) + struct.pack(">II", n, 1))
    stsc = _box(b"stsc", struct.pack(">B3xI", 0, 1) + struct.pack(">III", 1, 1, 1))
    stsz = _box(
        b"stsz",
        struct.pack(">B3xII", 0, 0, n) + struct.pack(f">{n}I", *map(len, payloads)),
    )
    stco = _box(b"stco", struct.pack(">B3xI", 0, n) + struct.pack(f">{n}I", *offsets))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def parse_mp4(data: bytes) -> dict:
    """Container-level parse (no pixel decode): box walk to the 'jpeg'
    sample table; returns the same dict shape as parse_avi (fps, n_frames,
    w, h, entries=[(absolute offset, size)]). Truncated/corrupt streams
    raise ValueError (never a raw struct.error)."""
    try:
        return _parse_mp4(data)
    except struct.error as e:
        raise ValueError(f"truncated or corrupt MP4 stream: {e}") from e


def _parse_mp4(data: bytes) -> dict:
    def children(pos: int, end: int):
        while pos + 8 <= end:
            (size,) = struct.unpack(">I", data[pos : pos + 4])
            tag = data[pos + 4 : pos + 8]
            if size < 8:
                raise ValueError("bad MP4 box size")
            yield tag, pos + 8, pos + size
            pos += size

    def find(pos: int, end: int, path: list[bytes]) -> tuple[int, int]:
        tag, *rest = path
        for t, s, e in children(pos, end):
            if t == tag:
                if not rest:
                    return s, e
                return find(s, e, rest)
        raise ValueError(f"MP4 missing box {b'/'.join(path).decode()}")

    if data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF (mp4) stream")
    stbl_s, stbl_e = find(0, len(data), [b"moov", b"trak", b"mdia", b"minf", b"stbl"])
    mdhd_s, _ = find(0, len(data), [b"moov", b"trak", b"mdia", b"mdhd"])
    timescale, duration = struct.unpack(">II", data[mdhd_s + 12 : mdhd_s + 20])
    boxes = {t: (s, e) for t, s, e in children(stbl_s, stbl_e)}
    for need in (b"stsd", b"stsz", b"stco", b"stts"):
        if need not in boxes:
            raise ValueError(f"MP4 missing {need.decode()}")
    sd_s, _ = boxes[b"stsd"]
    entry_tag = data[sd_s + 12 : sd_s + 16]
    if entry_tag != b"jpeg":
        raise ValueError(f"unsupported MP4 sample entry {entry_tag!r} (jpeg only)")
    w, h = struct.unpack(">HH", data[sd_s + 40 : sd_s + 44])
    sz_s, _ = boxes[b"stsz"]
    # full-box payloads: version+flags (4 bytes) precede the fields
    uniform, count = struct.unpack(">II", data[sz_s + 4 : sz_s + 12])
    if uniform:
        sizes = [uniform] * count
    else:
        sizes = list(struct.unpack(f">{count}I", data[sz_s + 12 : sz_s + 12 + 4 * count]))
    co_s, _ = boxes[b"stco"]
    (n_chunks,) = struct.unpack(">I", data[co_s + 4 : co_s + 8])
    offs = list(struct.unpack(f">{n_chunks}I", data[co_s + 8 : co_s + 8 + 4 * n_chunks]))
    if n_chunks != count:
        raise ValueError("MP4 stsc layouts other than one-sample-per-chunk unsupported")
    tt_s, _ = boxes[b"stts"]
    # fps from the first stts run (constant-rate clips have exactly one)
    cnt0, delta0 = struct.unpack(">II", data[tt_s + 8 : tt_s + 16])
    fps = timescale / max(1, delta0)
    return {
        "fps": fps,
        "n_frames": count,
        "w": w,
        "h": h,
        "entries": list(zip(offs, sizes)),
    }


def decode_mp4_frame(data: bytes, idx: int, meta: dict | None = None) -> np.ndarray:
    meta = meta or parse_mp4(data)
    off, size = meta["entries"][idx]
    return decode_jpeg(data[off : off + size])


# ---------------------------------------------------------------------------
# MKV — Matroska (EBML) with MJPEG blocks (CodecID V_MJPEG): the THIRD
# video container, pure-struct like AVI and MP4. EBML is a varint-length
# element tree; frames are SimpleBlocks in one Cluster. A linear
# metadata-only walk yields the absolute frame offsets, so seek stays O(1)
# after one parse — same contract as idx1 / stco.
# ---------------------------------------------------------------------------


def _ebml_id(i: int) -> bytes:
    """Element IDs are stored verbatim (their leading bits encode length)."""
    n = (i.bit_length() + 7) // 8
    return i.to_bytes(n, "big")


def _ebml_size(v: int) -> bytes:
    """EBML varint data size: length descriptor bit + value."""
    for n in range(1, 9):
        if v < (1 << (7 * n)) - 1:
            return ((1 << (7 * n)) | v).to_bytes(n, "big")
    raise ValueError("EBML size too large")


def _ebml_el(eid: int, payload: bytes) -> bytes:
    return _ebml_id(eid) + _ebml_size(len(payload)) + payload


def _ebml_uint(v: int) -> bytes:
    return v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big")


def encode_mkv_mjpeg(frames, fps: int = 10) -> bytes:
    """MJPEG-in-Matroska: TimecodeScale 1 ms, one Cluster at timecode 0,
    one keyframe SimpleBlock per frame with millisecond-rounded relative
    timecodes; fps is recoverable exactly from DefaultDuration (ns)."""
    frames = [np.asarray(f) for f in frames]
    if not frames:
        raise ValueError("MKV needs at least one frame")
    shapes = {f.shape for f in frames}
    if len(shapes) != 1:
        raise ValueError(f"all frames must share one shape, got {shapes}")
    shape = frames[0].shape
    h, w = (shape[1], shape[2]) if len(shape) == 3 else shape
    payloads = [encode_jpeg(f) for f in frames]
    header = _ebml_el(
        0x1A45DFA3,
        _ebml_el(0x4286, _ebml_uint(1))      # EBMLVersion
        + _ebml_el(0x42F7, _ebml_uint(1))    # EBMLReadVersion
        + _ebml_el(0x42F2, _ebml_uint(4))    # EBMLMaxIDLength
        + _ebml_el(0x42F3, _ebml_uint(8))    # EBMLMaxSizeLength
        + _ebml_el(0x4282, b"matroska")      # DocType
        + _ebml_el(0x4287, _ebml_uint(2))    # DocTypeVersion
        + _ebml_el(0x4285, _ebml_uint(2)),   # DocTypeReadVersion
    )
    info = _ebml_el(
        0x1549A966,
        _ebml_el(0x2AD7B1, _ebml_uint(1_000_000))  # TimecodeScale: 1 ms ticks
        + _ebml_el(0x4D80, b"xcube_stac_spark")    # MuxingApp
        + _ebml_el(0x5741, b"xcube_stac_spark")    # WritingApp
        + _ebml_el(0x4489, struct.pack(">d", len(frames) * 1000.0 / fps)),
    )
    tracks = _ebml_el(
        0x1654AE6B,
        _ebml_el(
            0xAE,
            _ebml_el(0xD7, _ebml_uint(1))          # TrackNumber
            + _ebml_el(0x73C5, _ebml_uint(1))      # TrackUID
            + _ebml_el(0x83, _ebml_uint(1))        # TrackType = video
            + _ebml_el(0x23E383, _ebml_uint(round(1e9 / fps)))  # DefaultDuration ns
            + _ebml_el(0x86, b"V_MJPEG")           # CodecID
            + _ebml_el(
                0xE0,
                _ebml_el(0xB0, _ebml_uint(w)) + _ebml_el(0xBA, _ebml_uint(h)),
            ),
        ),
    )
    blocks = b"".join(
        _ebml_el(
            0xA3,  # SimpleBlock: track varint, int16 rel. timecode, flags
            b"\x81" + struct.pack(">h", round(i * 1000 / fps)) + b"\x80" + pl,
        )
        for i, pl in enumerate(payloads)
    )
    cluster = _ebml_el(0x1F43B675, _ebml_el(0xE7, _ebml_uint(0)) + blocks)
    segment = _ebml_el(0x18538067, info + tracks + cluster)
    return header + segment


def _ebml_read_vint(data: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """(value, new_pos). keep_marker=True for IDs (stored verbatim),
    False for sizes (length-descriptor bit stripped)."""
    if pos >= len(data):
        raise ValueError("truncated EBML stream")
    first = data[pos]
    if first == 0:
        raise ValueError("bad EBML varint")
    n = 8 - first.bit_length() + 1
    if pos + n > len(data):
        raise ValueError("truncated EBML varint")
    v = int.from_bytes(data[pos : pos + n], "big")
    if not keep_marker:
        v &= (1 << (7 * n)) - 1
    return v, pos + n


def parse_mkv(data: bytes) -> dict:
    """Metadata-only EBML walk: Tracks for (w, h, fps via DefaultDuration,
    V_MJPEG check), SimpleBlocks for absolute frame payload offsets.
    Same dict shape as parse_avi/parse_mp4."""
    try:
        return _parse_mkv(data)
    except struct.error as e:
        raise ValueError(f"truncated or corrupt MKV stream: {e}") from e


def _parse_mkv(data: bytes) -> dict:
    if data[:4] != b"\x1a\x45\xdf\xa3":
        raise ValueError("not an EBML/Matroska stream")
    w = h = None
    fps = None
    codec = None
    entries: list[tuple[int, int]] = []

    #: master elements to descend into
    masters = {0x18538067, 0x1654AE6B, 0xAE, 0xE0, 0x1F43B675}

    def walk(pos: int, end: int):
        nonlocal w, h, fps, codec
        while pos < end:
            eid, p = _ebml_read_vint(data, pos, keep_marker=True)
            size, p = _ebml_read_vint(data, p, keep_marker=False)
            if p + size > len(data):
                raise ValueError("truncated EBML element")
            if eid in masters:
                walk(p, p + size)
            elif eid == 0xB0:
                w = int.from_bytes(data[p : p + size], "big")
            elif eid == 0xBA:
                h = int.from_bytes(data[p : p + size], "big")
            elif eid == 0x23E383:
                fps = 1e9 / int.from_bytes(data[p : p + size], "big")
            elif eid == 0x86:
                codec = data[p : p + size]
            elif eid == 0xA3:
                # SimpleBlock: track vint + 2-byte timecode + 1 flags byte
                _, bp = _ebml_read_vint(data, p, keep_marker=False)
                bp += 3
                entries.append((bp, p + size - bp))
            pos = p + size

    # skip the EBML header element, then walk the rest (Segment)
    eid, p = _ebml_read_vint(data, 0, keep_marker=True)
    size, p = _ebml_read_vint(data, p, keep_marker=False)
    walk(p + size, len(data))
    if codec != b"V_MJPEG":
        raise ValueError(f"unsupported MKV codec {codec!r} (V_MJPEG only)")
    if w is None or h is None or fps is None:
        raise ValueError("MKV missing track video metadata")
    return {
        "fps": round(fps, 6),
        "n_frames": len(entries),
        "w": w,
        "h": h,
        "entries": entries,
    }


def sniff_video(data: bytes) -> str:
    """'avi' | 'mp4' | 'mkv' by magic — the container dispatch for video
    rows."""
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return "avi"
    if len(data) >= 8 and data[4:8] == b"ftyp":
        return "mp4"
    if data[:4] == b"\x1a\x45\xdf\xa3":
        return "mkv"
    raise ValueError(
        "unknown video container (RIFF/AVI, ISO-BMFF or EBML/Matroska expected)"
    )


def parse_video(data: bytes) -> dict:
    kind = sniff_video(data)
    if kind == "avi":
        return parse_avi(data)
    if kind == "mp4":
        return parse_mp4(data)
    return parse_mkv(data)


def decode_video_frame(data: bytes, idx: int, meta: dict | None = None) -> np.ndarray:
    meta = meta or parse_video(data)
    off, size = meta["entries"][idx]
    return decode_jpeg(data[off : off + size])


# ---------------------------------------------------------------------------
# WebP — VP8L lossless (RIFF "WEBP"/"VP8L"), pure-struct subset of the
# public "WebP Lossless Bitstream Specification": no transforms, no color
# cache, no LZ77 backrefs, one Huffman group — every pixel is four literal
# symbols (green, red, blue, alpha) under canonical prefix codes whose
# lengths are themselves code-length-coded exactly as the spec (and
# DEFLATE) prescribe. 8-bit ARGB only (the format's own limit): uint16
# input maps v8 = round(v/257) on encode and v8*257 on decode — exact for
# 8-bit-valued content (the synth webp rows), same convention as the
# 8-bit TIFF path. Decoder rejects the unimplemented features explicitly.
# ---------------------------------------------------------------------------

#: spec kCodeLengthCodeOrder
_VP8L_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


class _LSBWriter:
    """LSB-first bit packer (VP8L/DEFLATE bit order)."""

    def __init__(self):
        self.acc = 0
        self.nbits = 0
        self.out = bytearray()

    def put(self, value: int, nbits: int):
        self.acc |= (value & ((1 << nbits) - 1)) << self.nbits
        self.nbits += nbits
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def put_code(self, code: int, length: int):
        """Huffman code bits go root-first (MSB of the canonical code)."""
        for i in range(length - 1, -1, -1):
            self.put((code >> i) & 1, 1)

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """RFC-1951-style canonical assignment: symbol -> (code, length)."""
    max_len = max(lengths) if lengths else 0
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    next_code = [0] * (max_len + 2)
    code = 0
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out = {}
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = (next_code[ln], ln)
            next_code[ln] += 1
    return out


def _huff_lengths_simple(hist: list[int], max_len: int) -> list[int]:
    """Depth-bounded Huffman lengths via heapq over (count, tiebreak,
    member-symbol list); dampen and retry if deeper than ``max_len``."""
    import heapq
    from itertools import count as _count

    hist = list(hist)
    used = [i for i, c in enumerate(hist) if c]
    if len(used) <= 1:
        return [1 if c else 0 for c in hist]
    while True:
        tie = _count()
        heap = [(c, next(tie), {i: 0 }) for i, c in enumerate(hist) if c]
        heapq.heapify(heap)
        while len(heap) > 1:
            c1, _, m1 = heapq.heappop(heap)
            c2, _, m2 = heapq.heappop(heap)
            merged = {s: d + 1 for s, d in m1.items()}
            merged.update({s: d + 1 for s, d in m2.items()})
            heapq.heappush(heap, (c1 + c2, next(tie), merged))
        depths = heap[0][2]
        if max(depths.values()) <= max_len:
            lengths = [0] * len(hist)
            for s, d in depths.items():
                lengths[s] = max(1, d)
            return lengths
        hist = [(c + 1) >> 1 if c else 0 for c in hist]


def _write_prefix_code(bw: _LSBWriter, lengths: list[int]) -> dict[int, tuple[int, int]]:
    """Emit one VP8L prefix code (simple 1-2-symbol form when possible,
    else full code-length-coded form); returns the canonical encode map."""
    used = [s for s, ln in enumerate(lengths) if ln]
    if 1 <= len(used) <= 2:
        bw.put(1, 1)  # simple
        bw.put(len(used) - 1, 1)
        if len(used) == 1:
            sym = used[0]
            if sym == 0:
                bw.put(0, 1)  # first_symbol_len_code=0 -> 1-bit symbol
                bw.put(0, 1)
            else:
                bw.put(1, 1)
                bw.put(sym, 8)
            return {sym: (0, 0)}  # zero bits per symbol
        bw.put(1, 1)
        bw.put(used[0], 8)
        bw.put(used[1], 8)
        return {used[0]: (0, 1), used[1]: (1, 1)}
    # full form: tokenize lengths with the 16/17/18 repeat alphabet
    tokens: list[tuple[int, int]] = []  # (symbol, extra)
    i = 0
    n = len(lengths)
    while i < n:
        ln = lengths[i]
        j = i
        while j < n and lengths[j] == ln:
            j += 1
        run = j - i
        if ln == 0:
            while run >= 3:
                take = min(run, 138)
                if take >= 11:
                    tokens.append((18, take - 11))
                else:
                    take = min(take, 10)
                    tokens.append((17, take - 3))
                run -= take
            tokens.extend([(0, 0)] * run)
        else:
            tokens.append((ln, 0))
            run -= 1
            while run >= 3:
                take = min(run, 6)
                tokens.append((16, take - 3))
                run -= take
            tokens.extend([(ln, 0)] * run)
        i = j
    clc_hist = [0] * 19
    for sym, _ in tokens:
        clc_hist[sym] += 1
    clc_lengths = _huff_lengths_simple(clc_hist, 7)
    clc_codes = _canonical_codes(clc_lengths)
    bw.put(0, 1)  # not simple
    bw.put(19 - 4, 4)  # write all 19 code-length-code lengths
    for sym in _VP8L_CLC_ORDER:
        bw.put(clc_lengths[sym], 3)
    bw.put(0, 1)  # no explicit max_symbol
    # single-used-symbol CLC: its code is 0 bits — spec still decodes by
    # tree, so force a 1-bit code by adding a dummy? Avoided: with >=3
    # distinct tokens this case cannot arise for real images; guard anyway
    if len([1 for ln in clc_lengths if ln]) == 1:
        only = clc_lengths.index(1)
        for sym, extra in tokens:
            if sym == 16:
                bw.put(extra, 2)
            elif sym == 17:
                bw.put(extra, 3)
            elif sym == 18:
                bw.put(extra, 7)
        return _canonical_codes(lengths)
    for sym, extra in tokens:
        c, ln = clc_codes[sym]
        bw.put_code(c, ln)
        if sym == 16:
            bw.put(extra, 2)
        elif sym == 17:
            bw.put(extra, 3)
        elif sym == 18:
            bw.put(extra, 7)
    return _canonical_codes(lengths)


def encode_webp(img: np.ndarray) -> bytes:
    """VP8L-lossless WebP of a uint16 image (2-D grayscale replicated to
    RGB, or channel-major (3, h, w)); 8-bit mapped v8=round(v/257)."""
    img = np.asarray(img, np.float64)
    if img.ndim == 2:
        img = np.stack([img, img, img])
    if img.shape[0] != 3:
        raise ValueError(f"webp input must be 2-D or (3, h, w), got {img.shape}")
    rgb8 = np.clip(np.round(img / 257.0), 0, 255).astype(np.uint8)
    _, h, w = rgb8.shape
    R, G, B = (rgb8[c].reshape(-1) for c in range(3))
    hist_g = np.bincount(G, minlength=280).tolist()  # 256 lit + 24 len
    hist_r = np.bincount(R, minlength=256).tolist()
    hist_b = np.bincount(B, minlength=256).tolist()
    hist_a = [0] * 256
    hist_a[255] = h * w
    hist_d = [0] * 40
    hist_d[0] = 1  # unused tree still needs one symbol

    bw = _LSBWriter()
    bw.put(0x2F, 8)  # VP8L signature byte
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(0, 1)  # alpha hint
    bw.put(0, 3)  # version
    bw.put(0, 1)  # no transforms
    bw.put(0, 1)  # no color cache
    bw.put(0, 1)  # no meta (entropy) huffman image
    codes_g = _write_prefix_code(bw, _huff_lengths_simple(hist_g, 15))
    codes_r = _write_prefix_code(bw, _huff_lengths_simple(hist_r, 15))
    codes_b = _write_prefix_code(bw, _huff_lengths_simple(hist_b, 15))
    codes_a = _write_prefix_code(bw, _huff_lengths_simple(hist_a, 15))
    _write_prefix_code(bw, _huff_lengths_simple(hist_d, 15))
    for i in range(h * w):
        c, ln = codes_g[int(G[i])]
        bw.put_code(c, ln)
        c, ln = codes_r[int(R[i])]
        bw.put_code(c, ln)
        c, ln = codes_b[int(B[i])]
        bw.put_code(c, ln)
        c, ln = codes_a[255]
        bw.put_code(c, ln)
    payload = bw.flush()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    body = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(body)) + body


class _LSBReader:
    def __init__(self, data: bytes):
        self._bits = np.unpackbits(
            np.frombuffer(data, np.uint8), bitorder="little"
        )
        self.pos = 0

    def bits(self, n: int) -> int:
        if self.pos + n > len(self._bits):
            raise ValueError("truncated VP8L stream")
        v = 0
        for i in range(n):
            v |= int(self._bits[self.pos + i]) << i
        self.pos += n
        return v

    def code(self, tree: dict[tuple[int, int], int], zero_bit_sym: int | None) -> int:
        """Walk one canonical code root-first; (code,len) dict lookup."""
        if zero_bit_sym is not None:
            return zero_bit_sym
        c = 0
        ln = 0
        while True:
            if self.pos >= len(self._bits):
                raise ValueError("truncated VP8L stream")
            c = (c << 1) | int(self._bits[self.pos])
            self.pos += 1
            ln += 1
            sym = tree.get((c, ln))
            if sym is not None:
                return sym
            if ln > 15:
                raise ValueError("bad VP8L prefix code")


def _read_prefix_code(br: _LSBReader, alphabet: int):
    """-> (decode tree {(code,len): sym}, zero_bit_sym or None)."""
    if br.bits(1):  # simple
        num_symbols = br.bits(1) + 1
        if br.bits(1):
            s0 = br.bits(8)
        else:
            s0 = br.bits(1)
        if num_symbols == 1:
            return {}, s0
        s1 = br.bits(8)
        return {(0, 1): s0, (1, 1): s1}, None
    num_clc = 4 + br.bits(4)
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_VP8L_CLC_ORDER[i]] = br.bits(3)
    clc_codes = _canonical_codes(clc_lengths)
    clc_tree = {v: k for k, v in clc_codes.items()}
    clc_zero = None
    if len(clc_codes) == 1:
        clc_zero = next(iter(clc_codes))
    if br.bits(1):  # explicit max symbol
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev = 8
    i = 0
    while i < alphabet and max_symbol > 0:
        max_symbol -= 1
        sym = br.code(clc_tree, clc_zero)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev = sym
        elif sym == 16:
            rep = 3 + br.bits(2)
            for _ in range(rep):
                if i < alphabet:
                    lengths[i] = prev
                    i += 1
        elif sym == 17:
            i += 3 + br.bits(3)
        else:
            i += 11 + br.bits(7)
    codes = _canonical_codes(lengths)
    if len(codes) == 1:
        return {}, next(iter(codes))
    return {v: k for k, v in codes.items()}, None


#: byte bit-reversal table: turns the LSB-first VP8L stream into an
#: MSB-first one so the decode_jpeg ``next16`` window trick applies as-is
_BITREV8 = np.array(
    [int(f"{i:08b}"[::-1], 2) for i in range(256)], dtype=np.uint8
)


def _vp8l_lut(tree: dict[tuple[int, int], int]) -> tuple[list[int], list[int]]:
    """16-bit-peek decode LUT for a VP8L canonical tree (codes are MSB-first
    over the bit stream, max length 15): peek -> (symbol or -1, length).
    Plain Python lists — the pixel loop indexes them ~3x faster than numpy
    scalar indexing."""
    sym = [-1] * (1 << 16)
    ln = [0] * (1 << 16)
    for (code, length), s in tree.items():
        lo = code << (16 - length)
        step = 1 << (16 - length)
        sym[lo : lo + step] = [s] * step
        ln[lo : lo + step] = [length] * step
    return sym, ln


def decode_webp(data: bytes, w: int | None = None, h: int | None = None) -> np.ndarray:
    """Decode the VP8L-lossless subset (transforms/color-cache/backrefs
    rejected explicitly). Returns channel-major (3, h, w) uint16 (8-bit
    samples x257)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP stream")
    pos = 12
    payload = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if tag == b"VP8L":
            payload = data[pos + 8 : pos + 8 + size]
            break
        if tag in (b"VP8 ", b"VP8X"):
            raise ValueError("lossy/extended WebP not supported (VP8L only)")
        pos += 8 + size + (size & 1)
    if payload is None:
        raise ValueError("WEBP missing VP8L chunk")
    br = _LSBReader(payload)
    if br.bits(8) != 0x2F:
        raise ValueError("bad VP8L signature")
    width = br.bits(14) + 1
    height = br.bits(14) + 1
    br.bits(1)  # alpha hint
    if br.bits(3) != 0:
        raise ValueError("unknown VP8L version")
    if br.bits(1):
        raise ValueError("VP8L transforms not supported in this subset")
    if br.bits(1):
        raise ValueError("VP8L color cache not supported in this subset")
    if br.bits(1):
        raise ValueError("VP8L meta-huffman not supported in this subset")
    tree_g = _read_prefix_code(br, 280)
    tree_r = _read_prefix_code(br, 256)
    tree_b = _read_prefix_code(br, 256)
    tree_a = _read_prefix_code(br, 256)
    _read_prefix_code(br, 40)  # distance tree (unused by the subset)
    n = width * height
    # Table-driven pixel loop (the decode_jpeg ``next16`` trick adapted to
    # VP8L's LSB-first bit order): one list index resolves a whole prefix
    # code instead of a per-bit tree walk + dict probe. Bit-exact with the
    # walker (prefix-freeness: the unique code matching a 16-bit window is
    # the one the walker finds), and the truncated/bad-code ValueErrors
    # fire on the same streams. Profiled 416x416 RGB: 1.3 s -> ~0.25 s.
    rev = _BITREV8[np.frombuffer(payload, np.uint8)].astype(np.uint32)
    rev = np.concatenate([rev, np.zeros(4, np.uint32)])
    _val24 = (rev[:-2] << 16) | (rev[1:-1] << 8) | rev[2:]
    next16 = (
        (_val24[:, None] >> (8 - np.arange(8, dtype=np.uint32))[None, :]) & 0xFFFF
    ).reshape(-1).tolist()
    nbits = 8 * len(payload)
    luts = []
    for tree, zsym in (tree_g, tree_r, tree_b, tree_a):
        luts.append((None, None, zsym) if zsym is not None else (*_vp8l_lut(tree), None))
    (gs, gl, gz), (rs, rl, rz), (bs, bl, bz), (asym, alen, az) = luts
    p = br.pos
    Gl = [0] * n
    Rl = [0] * n
    Bl = [0] * n
    for i in range(n):
        if gz is not None:
            g = gz
        else:
            if p >= nbits:
                raise ValueError("truncated VP8L stream")
            k = next16[p]
            g = gs[k]
            if g < 0:
                raise ValueError("bad VP8L prefix code")
            p += gl[k]
            if p > nbits:
                raise ValueError("truncated VP8L stream")
        if g >= 256:
            raise ValueError("VP8L backrefs/cache hits not supported in this subset")
        Gl[i] = g
        if rz is not None:
            Rl[i] = rz
        else:
            if p >= nbits:
                raise ValueError("truncated VP8L stream")
            k = next16[p]
            s = rs[k]
            if s < 0:
                raise ValueError("bad VP8L prefix code")
            p += rl[k]
            if p > nbits:
                raise ValueError("truncated VP8L stream")
            Rl[i] = s
        if bz is not None:
            Bl[i] = bz
        else:
            if p >= nbits:
                raise ValueError("truncated VP8L stream")
            k = next16[p]
            s = bs[k]
            if s < 0:
                raise ValueError("bad VP8L prefix code")
            p += bl[k]
            if p > nbits:
                raise ValueError("truncated VP8L stream")
            Bl[i] = s
        if az is None:
            if p >= nbits:
                raise ValueError("truncated VP8L stream")
            k = next16[p]
            if asym[k] < 0:
                raise ValueError("bad VP8L prefix code")
            p += alen[k]
            if p > nbits:
                raise ValueError("truncated VP8L stream")
    rgb = (
        np.stack([
            np.array(Rl, np.uint8), np.array(Gl, np.uint8), np.array(Bl, np.uint8)
        ])
        .reshape(3, height, width)
        .astype(np.uint16)
    )
    return rgb * np.uint16(257)


# ---------------------------------------------------------------------------
# dispatch (mirrors MAP_FILE_EXTENSION_FORMAT constants.py:76-83 in spirit)
# ---------------------------------------------------------------------------

ENCODERS = {
    "raw": encode_raw,
    "png": encode_png,
    "lossy": encode_lossy,
    "jpeg": encode_jpeg,
    "tiff": encode_tiff,
    "cog": encode_cog,
    "webp": encode_webp,
}
DECODERS = {
    "raw": decode_raw,
    "png": decode_png,
    "lossy": decode_lossy,
    "jpeg": decode_jpeg,
    "jpg": decode_jpeg,
    "tiff": decode_tiff,
    "tif": decode_tiff,
    "cog": decode_tiff,
    "webp": decode_webp,
}
LOSSLESS = {"raw", "png", "tiff", "cog"}


def encode(img: np.ndarray, fmt: str) -> bytes:
    return ENCODERS[fmt](img)


def decode(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    return DECODERS[fmt](data, w, h)


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 65535.0) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(peak * peak / mse))


# ---------------------------------------------------------------------------
# perceptual hash (DCT pHash, 64-bit) — the `phash` column generator
# ---------------------------------------------------------------------------


def phash64(img: np.ndarray) -> int:
    """Classic DCT perceptual hash: mean-pool to 32x32, 2-D DCT, take the
    8x8 low-frequency block (minus DC), threshold at its median -> 64 bits,
    returned as a SIGNED int64 (Spark LongType-safe). Stable across the
    lossless codecs and robust to the lossy one.
    """
    img = np.asarray(img, np.float64)
    h, w = img.shape
    # mean-pool to 32x32 (pad to a multiple first)
    ph = (-h) % 32
    pw = (-w) % 32
    img = np.pad(img, ((0, ph), (0, pw)), mode="edge")
    H, W = img.shape
    small = img.reshape(32, H // 32, 32, W // 32).mean(axis=(1, 3))
    M = np.zeros((32, 32))
    for k in range(32):
        for n in range(32):
            M[k, n] = np.cos(np.pi * (n + 0.5) * k / 32)
    d = M @ small @ M.T
    low = d[:8, :8].flatten()
    low = low[1:]  # drop DC
    bits = low > np.median(low)
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    # 63 bits used; keep sign bit clear → always fits int64
    return int(val)


def luma(img: np.ndarray) -> np.ndarray:
    """Channel-mean luminance of a channel-major (3, h, w) image; 2-D
    grayscale passes through unchanged (float64 either way for downstream
    math)."""
    img = np.asarray(img, np.float64)
    return img if img.ndim == 2 else img.mean(axis=0)


def phash64_any(img: np.ndarray) -> int:
    """phash64 over the luminance — works for both grayscale (h, w) and
    channel-major RGB (3, h, w) arrays."""
    return phash64(luma(img))
