"""Deterministic image codecs in pure numpy + stdlib zlib (no PIL in box).

The payload table (BASELINE.json input_hint) carries encoded image bytes in
four formats; decode runs inside Arrow `mapInPandas` stages (the fetch/decode
stage of the engine). `qlossy` is a deterministic 5-bit quantization codec
standing in for JPEG so the lossy-path invariant (PSNR ≥ 40 dB, north_rule)
is exercised for real: uniform quantization to 32 levels gives
MSE ≈ 5.5 → PSNR ≈ 40.7 dB.

``phash`` is an 8×8 average-hash over block means — the perceptual-hash
column of the payload table (reference stores media metadata per image,
crawl4ai/models.py:302-329; the hash itself is our scale-path dedup key).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

FORMATS = ("raw", "ppm", "png", "qlossy")


# ---------------------------------------------------------------------- raw
def encode_raw(px: np.ndarray) -> bytes:
    return px.astype(np.uint8).tobytes()


def decode_raw(data: bytes, w: int, h: int) -> np.ndarray:
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


# ---------------------------------------------------------------------- ppm
def encode_ppm(px: np.ndarray) -> bytes:
    h, w = px.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + px.astype(np.uint8).tobytes()


def decode_ppm(data: bytes, w: int, h: int) -> np.ndarray:
    # header: P6\n<w> <h>\n255\n
    nl = 0
    for _ in range(3):
        nl = data.index(b"\n", nl) + 1
    return np.frombuffer(data[nl:], dtype=np.uint8).reshape(h, w, 3)


# ---------------------------------------------------------------------- png
def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(px: np.ndarray) -> bytes:
    """Minimal valid RGB8 PNG: IHDR + one zlib IDAT with filter 0 rows."""
    h, w = px.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, truecolor
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), px.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes, w: int = 0, h: int = 0) -> np.ndarray:
    assert data[:8] == _PNG_SIG, "not a PNG"
    pos = 8
    idat = b""
    width = height = 0
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            width, height, bit_depth, color_type = struct.unpack(">IIBB", payload[:10])
            assert bit_depth == 8 and color_type == 2, "only RGB8 supported"
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(height, width * 3 + 1)
    assert (raw[:, 0] == 0).all(), "only filter 0 supported"
    return raw[:, 1:].reshape(height, width, 3)


# ------------------------------------------------------------------- qlossy
def encode_qlossy(px: np.ndarray) -> bytes:
    """Quantize to 5 bits/channel, zlib-pack the level indices."""
    q = (px.astype(np.uint8) >> 3).astype(np.uint8)
    return zlib.compress(q.tobytes(), 6)


def decode_qlossy(data: bytes, w: int, h: int) -> np.ndarray:
    q = np.frombuffer(zlib.decompress(data), dtype=np.uint8).reshape(h, w, 3)
    return np.minimum(q.astype(np.uint16) * 8 + 4, 255).astype(np.uint8)


_ENCODERS = {"raw": encode_raw, "ppm": encode_ppm, "png": encode_png, "qlossy": encode_qlossy}
_DECODERS = {"raw": decode_raw, "ppm": decode_ppm, "png": decode_png, "qlossy": decode_qlossy}


def encode(px: np.ndarray, fmt: str) -> bytes:
    return _ENCODERS[fmt](px)


def decode(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    return _DECODERS[fmt](data, w, h)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def phash64(px: np.ndarray) -> int:
    """8×8 average-hash → signed 64-bit (fits BIGINT phash column)."""
    gray = px.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    blocks = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            blocks[i, j] = gray[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean()
    bits = (blocks > blocks.mean()).astype(np.uint64).ravel()
    val = np.uint64(0)
    for b in bits:
        val = (val << np.uint64(1)) | b
    iv = int(val)
    return iv - (1 << 64) if iv >= (1 << 63) else iv


# ------------------------------------------------------------- DCT pHash
# Fixed-point 32-point DCT-II basis, top 8 rows, orthonormal scale folded
# in: M[k][n] = floor(s(k) * cos(pi*(2n+1)k/64) * 4096 + 0.5) with
# s(0)=sqrt(1/32), s(k>0)=sqrt(2/32).  The INTEGER table is the operator's
# spec (the ASPECT_BUCKETS pattern: one committed constant feeds both the
# engine and the oracle twin), so the hash is exact on any engine,
# partitioning or BLAS build — no float DCT anywhere.
def _dct_q12_table() -> list[list[int]]:
    import math

    rows = []
    for k in range(8):
        s = math.sqrt((1 if k == 0 else 2) / 32.0)
        rows.append([
            int(math.floor(s * math.cos(math.pi * (2 * n + 1) * k / 64.0)
                           * 4096 + 0.5))
            for n in range(32)
        ])
    return rows


DCT_Q12 = _dct_q12_table()


def dct_phash64(px: np.ndarray) -> int:
    """64-bit DCT perceptual hash (imagehash.phash semantics, made
    integer-exact): luma (299r+587g+114b, x1000 fixed point) → 32×32
    nearest-neighbor selection resize (src index = (dst·src)//32 — pure
    integer, defined for any w,h ≥ 1) → top-left 8×8 of the 32-point
    DCT-II via the committed Q12 table (T = M·G then C = T·Mᵀ; with luma
    ≤ 255000 and |M| ≤ 1024 the products stay < 2.8e17, inside int64) →
    bit[i,j] = (2·C[i,j] > v[31]+v[32]) against the sorted middle pair
    (the even-count median, kept as an exact integer sum) → packed
    row-major, returned signed (fits the BIGINT phash column)."""
    h, w = px.shape[:2]
    luma = (px[:, :, 0].astype(np.int64) * 299
            + px[:, :, 1].astype(np.int64) * 587
            + px[:, :, 2].astype(np.int64) * 114)
    ys = (np.arange(32) * h) // 32
    xs = (np.arange(32) * w) // 32
    g = luma[np.ix_(ys, xs)]
    m = np.array(DCT_Q12, dtype=np.int64)
    c = m @ g @ m.T
    flat = c.ravel()
    mid = np.sort(flat)
    med2 = int(mid[31]) + int(mid[32])
    val = 0
    for v in flat:
        val = (val << 1) | (1 if 2 * int(v) > med2 else 0)
    return val - (1 << 64) if val >= (1 << 63) else val
