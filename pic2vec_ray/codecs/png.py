"""Pure-numpy PNG encoder/decoder (no PIL in this environment).

Supports 8-bit grayscale (color type 0), RGB (2) and RGBA (6),
non-interlaced. The encoder always emits filter type 0 rows; the
decoder handles all five standard filter types (vectorized fast path
when every row uses filter 0, which is what our own encoder and the
synthetic fixture generator produce).

Reference parity note: the reference engine decodes images with
PIL/keras ``load_img`` (``/root/reference/pic2vec/feature_preprocessing.py:326``);
here the codec itself is ours, but the *semantics* downstream (resize,
normalize, missing-row zero-fill) mirror the reference.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 6: 4}


class PngError(ValueError):
    pass


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def encode_png(img: np.ndarray, compress_level: int = 6) -> bytes:
    """Encode an (H, W), (H, W, 1), (H, W, 3) or (H, W, 4) uint8 array."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise PngError(f"encode_png expects uint8, got {img.dtype}")
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color_type = {1: 0, 3: 2, 4: 6}.get(c)
    if color_type is None:
        raise PngError(f"unsupported channel count {c}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 per scanline
    raw = np.empty((h, 1 + w * c), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = img.reshape(h, w * c)
    idat = zlib.compress(raw.tobytes(), compress_level)
    return _PNG_MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter_row(ftype: int, row: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    out = row.astype(np.int32)
    if ftype == 0:
        return row
    if ftype == 1:  # Sub
        acc = row.copy()
        for i in range(bpp, len(acc)):
            acc[i] = (acc[i] + acc[i - bpp]) & 0xFF
        return acc
    if ftype == 2:  # Up
        return ((out + prev) & 0xFF).astype(np.uint8)
    if ftype == 3:  # Average
        acc = row.copy()
        for i in range(len(acc)):
            left = int(acc[i - bpp]) if i >= bpp else 0
            acc[i] = (int(row[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        return acc
    if ftype == 4:  # Paeth
        acc = row.copy()
        for i in range(len(acc)):
            a = int(acc[i - bpp]) if i >= bpp else 0
            b = int(prev[i])
            cc = int(prev[i - bpp]) if i >= bpp else 0
            p = a + b - cc
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            acc[i] = (int(row[i]) + pred) & 0xFF
        return acc
    raise PngError(f"unknown filter type {ftype}")


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes to an (H, W, C) uint8 array (C = 1, 3, or 4)."""
    if len(data) < 8 or data[:8] != _PNG_MAGIC:
        raise PngError("not a PNG (bad magic)")
    pos = 8
    ihdr = None
    idat = []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise PngError("truncated chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise PngError("missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise PngError(f"unsupported PNG variant depth={depth} interlace={interlace}")
    c = _CHANNELS.get(color_type)
    if c is None:
        raise PngError(f"unsupported color type {color_type}")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = 1 + w * c
    if raw.size != h * stride:
        raise PngError("scanline size mismatch")
    rows = raw.reshape(h, stride)
    ftypes = rows[:, 0]
    if not ftypes.any():  # fast path: all filter 0
        return rows[:, 1:].reshape(h, w, c).copy()
    out = np.empty((h, w * c), dtype=np.uint8)
    prev = np.zeros(w * c, dtype=np.uint8)
    for y in range(h):
        prev = _unfilter_row(int(ftypes[y]), rows[y, 1:].copy(), prev, c)
        out[y] = prev
    return out.reshape(h, w, c)
