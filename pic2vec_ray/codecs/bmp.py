"""Pure-numpy 24-bit uncompressed BMP encoder/decoder.

Mirrors the role of the reference's BMP fixtures (``arendt.bmp``,
accepted by the format whitelist at
``/root/reference/pic2vec/feature_preprocessing.py:118``).
"""

from __future__ import annotations

import struct

import numpy as np


class BmpError(ValueError):
    pass


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode an (H, W, 3) or (H, W) uint8 array as a 24-bit BMP."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise BmpError(f"encode_bmp expects uint8, got {img.dtype}")
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w, c = img.shape
    if c != 3:
        raise BmpError(f"encode_bmp expects 3 channels, got {c}")
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    data_size = stride * h
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + data_size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, stride), dtype=np.uint8)
    # bottom-up, BGR
    rows[:, :row_bytes] = img[::-1, :, ::-1].reshape(h, row_bytes)
    return header + info + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to an (H, W, 3) uint8 array."""
    if len(data) < 54 or data[:2] != b"BM":
        raise BmpError("not a BMP (bad magic)")
    (off,) = struct.unpack_from("<I", data, 10)
    hdr_size, w, h = struct.unpack_from("<Iii", data, 14)
    if hdr_size < 40:
        raise BmpError(f"unsupported BMP header size {hdr_size}")
    planes, bpp = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if bpp != 24 or compression != 0:
        raise BmpError(f"unsupported BMP bpp={bpp} compression={compression}")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    body = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=off)
    rows = body.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    img = rows[::-1] if flip else rows
    return img[:, :, ::-1].copy()  # BGR → RGB
