"""Pure-numpy RIFF/WAVE codec (PCM integer and IEEE-float).

Round 2: the audio column's decode step is no longer a stub for the
dominant uncompressed interchange format — WAV parses with nothing but
struct + numpy. Compressed audio (mp3/flac/ogg) still raises
:class:`WavError` (→ missing-row semantics downstream), same contract
as non-baseline JPEG in ``codecs/jpeg.py``.

Supports: PCM u8 / s16 / s24 / s32 and IEEE float32/float64, any
channel count, chunk-order-agnostic parsing (fmt/data plus skipped
LIST/fact/etc chunks). Decode returns float32 in [-1, 1] shaped
``(n_samples, n_channels)`` plus the sample rate.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["WavError", "encode_wav", "decode_wav"]


class WavError(ValueError):
    pass


def encode_wav(samples: np.ndarray, sample_rate: int, fmt: str = "s16") -> bytes:
    """``(N,)`` or ``(N, C)`` float in [-1, 1] → WAV bytes."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    if x.ndim != 2:
        raise WavError("samples must be (N,) or (N, C)")
    n, ch = x.shape
    if fmt == "s16":
        data = (np.clip(x, -1, 1) * 32767.0).round().astype("<i2").tobytes()
        bits, tag = 16, 1
    elif fmt == "f32":
        data = x.astype("<f4").tobytes()
        bits, tag = 32, 3
    elif fmt == "u8":
        data = ((np.clip(x, -1, 1) * 127.0).round() + 128).astype(np.uint8).tobytes()
        bits, tag = 8, 1
    else:
        raise WavError(f"unsupported encode fmt {fmt!r}")
    block = ch * bits // 8
    fmt_chunk = struct.pack("<HHIIHH", tag, ch, sample_rate,
                            sample_rate * block, block, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (float32 (N, C) in [-1, 1], sample_rate)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    payload = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            if len(body) < 16:
                raise WavError("truncated fmt chunk")
            tag, ch, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if tag == 0xFFFE and len(body) >= 40:  # WAVE_FORMAT_EXTENSIBLE
                tag = struct.unpack("<H", body[24:26])[0]
            fmt = (tag, ch, rate, bits)
        elif cid == b"data":
            payload = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or payload is None:
        raise WavError("missing fmt/data chunk")
    tag, ch, rate, bits = fmt
    if ch < 1:
        raise WavError("invalid channel count")
    if tag == 1:  # integer PCM
        if bits == 8:
            x = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(payload, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(payload, dtype=np.uint8)
            raw = raw[: len(raw) - len(raw) % 3].reshape(-1, 3)
            vals = (raw[:, 0].astype(np.int32)
                    | (raw[:, 1].astype(np.int32) << 8)
                    | (raw[:, 2].astype(np.int32) << 16))
            vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
            x = vals.astype(np.float32) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(payload, dtype="<i4").astype(np.float32) / float(1 << 31)
        else:
            raise WavError(f"unsupported PCM bit depth {bits}")
    elif tag == 3:  # IEEE float
        if bits == 32:
            x = np.frombuffer(payload, dtype="<f4").astype(np.float32)
        elif bits == 64:
            x = np.frombuffer(payload, dtype="<f8").astype(np.float32)
        else:
            raise WavError(f"unsupported float bit depth {bits}")
    else:
        raise WavError(f"unsupported format tag {tag} (compressed audio "
                       "needs codec libraries not present here)")
    frames = len(x) // ch
    return x[: frames * ch].reshape(frames, ch), rate
