"""Multimodal columns beyond images: audio / video as opaque ``binary``
columns with typed metadata, processed by actor-pool map_batches stages.

Round 2: AUDIO decode is REAL for uncompressed audio — a from-scratch
RIFF/WAVE codec (``codecs/wav.py``, PCM u8/s16/s24/s32 + IEEE float)
feeds the spectral-feature pipeline; compressed audio and all VIDEO
containers still need codec libraries this environment lacks, so those
paths keep the clearly-marked stub (``decoder="stub"`` produces a
deterministic fake signal seeded by the payload bytes;
``decoder="strict"`` raises NotImplementedError). Everything around
decode — schema contract, actor signature, batch sizing, zero-copy
Arrow plumbing, missing-row semantics, fixed-size-list output layout —
is real and tested either way.

Schema contracts (mirroring the image input_hint shape):

- audio: ``(clip_id: string, bytes: binary, sample_rate: int32,
  n_samples: int32, fmt: string)``
- video: ``(clip_id: string, bytes: binary, w: int32, h: int32,
  n_frames: int32, fps: float, fmt: string)``
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa


def _seed_from(data: bytes) -> int:
    return zlib.crc32(data) if data else 0


class AudioFeatureActor:
    """Decode → frame → band-energy features per clip.

    ``__init__`` builds the (stub) decoder and the analysis window
    once per actor; ``__call__`` emits ``features:
    fixed_size_list<float32>[n_bands]`` + ``missing``.
    """

    def __init__(self, n_bands: int = 16, frame: int = 512,
                 bytes_col: str = "bytes", decoder: str = "wav"):
        if decoder not in ("wav", "stub", "strict"):
            raise ValueError("decoder must be 'wav', 'stub' or 'strict'")
        self.n_bands = n_bands
        self.frame = frame
        self.bytes_col = bytes_col
        self.decoder = decoder
        self.window = np.hanning(frame).astype(np.float32)

    def _decode(self, data: bytes, n_samples: int) -> np.ndarray | None:
        """``decoder="wav"`` (default): REAL RIFF/WAVE parse → mono mix
        (codecs/wav.py); undecodable payloads → missing row. ``stub``
        keeps the deterministic fake signal; ``strict`` raises."""
        if not data:
            return None
        if self.decoder == "strict":
            raise NotImplementedError(
                "compressed-audio decode requires codec libraries not "
                "present in this environment (WAV/PCM decodes natively)"
            )
        if self.decoder == "wav":
            from ..codecs.wav import WavError, decode_wav

            try:
                pcm, _rate = decode_wav(bytes(data))
            except (WavError, Exception):
                return None
            mono = pcm.mean(axis=1).astype(np.float32)
            if len(mono) < self.frame:  # zero-pad sub-frame clips
                mono = np.pad(mono, (0, self.frame - len(mono)))
            return mono
        rng = np.random.default_rng(_seed_from(data))
        n = max(int(n_samples), self.frame)
        return rng.standard_normal(n).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        feats = np.zeros((n, self.n_bands), dtype=np.float32)
        missing = np.zeros(n, dtype=bool)
        byte_rows = batch[self.bytes_col].to_pylist()
        n_samples = batch["n_samples"].to_numpy()
        for i, data in enumerate(byte_rows):
            pcm = self._decode(bytes(data) if data else b"", int(n_samples[i]))
            if pcm is None:
                missing[i] = True
                continue
            # windowed frames → FFT band energies, averaged over frames
            usable = (len(pcm) // self.frame) * self.frame
            frames = pcm[:usable].reshape(-1, self.frame) * self.window
            spec = np.abs(np.fft.rfft(frames, axis=1))
            bands = np.array_split(spec, self.n_bands, axis=1)
            feats[i] = np.array([b.mean() for b in bands], dtype=np.float32)
        out = batch.drop_columns([self.bytes_col])
        out = out.append_column("missing", pa.array(missing))
        flat = pa.array(feats.ravel(), type=pa.float32())
        return out.append_column(
            "features", pa.FixedSizeListArray.from_arrays(flat, self.n_bands)
        )


class VideoFrameSampleActor:
    """Decode → sample K frames → per-frame embed → mean-pool per clip.

    Frame sampling is uniform over ``n_frames``; the per-frame embed
    reuses the image model zoo (real numpy CNN), so only the
    container/codec decode is stubbed.
    """

    def __init__(self, num_frames: int = 4, model_str: str = "tinynet",
                 bytes_col: str = "bytes", decoder: str = "stub"):
        from ..model.zoo import build_featurizer
        from ..functions.image_ops import NORMALIZERS

        if decoder not in ("stub", "strict"):
            raise ValueError("decoder must be 'stub' or 'strict'")
        self.num_frames = num_frames
        self.bytes_col = bytes_col
        self.decoder = decoder
        self.model = build_featurizer(model_str, depth=1)
        self.normalize = NORMALIZERS[self.model.preprocessing]
        self.num_features = self.model.num_features

    def _decode_frames(self, data: bytes, w: int, h: int, n_frames: int) -> np.ndarray | None:
        """STUB decode: deterministic fake frames from the payload bytes
        (a real implementation demuxes+decodes the container and seeks
        to the sampled timestamps)."""
        if not data or n_frames <= 0:
            return None
        if self.decoder == "strict":
            raise NotImplementedError(
                "video decode requires a codec library not present in this "
                "environment"
            )
        idx = np.linspace(0, max(n_frames - 1, 0), self.num_frames).astype(int)
        rng = np.random.default_rng(_seed_from(data))
        th, tw = self.model.target_size
        return rng.integers(0, 256, size=(len(idx), th, tw, 3), dtype=np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        feats = np.zeros((n, self.num_features), dtype=np.float32)
        missing = np.zeros(n, dtype=bool)
        byte_rows = batch[self.bytes_col].to_pylist()
        w = batch["w"].to_numpy()
        h = batch["h"].to_numpy()
        nf = batch["n_frames"].to_numpy()
        for i, data in enumerate(byte_rows):
            frames = self._decode_frames(bytes(data) if data else b"",
                                         int(w[i]), int(h[i]), int(nf[i]))
            if frames is None:
                missing[i] = True
                continue
            emb = self.model(self.normalize(frames.astype(np.float32)))
            feats[i] = emb.mean(axis=0)  # mean-pool over sampled frames
        out = batch.drop_columns([self.bytes_col])
        out = out.append_column("missing", pa.array(missing))
        flat = pa.array(feats.ravel(), type=pa.float32())
        return out.append_column(
            "features", pa.FixedSizeListArray.from_arrays(flat, self.num_features)
        )
