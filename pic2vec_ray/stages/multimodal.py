"""Multimodal columns beyond images: audio / video as opaque ``binary``
columns with typed metadata, processed by actor-pool map_batches stages.

AUDIO decode is REAL for uncompressed audio — a from-scratch RIFF/WAVE
codec (``codecs/wav.py``, PCM u8/s16/s24/s32 + IEEE float) feeds the
spectral-feature pipeline. VIDEO decode is REAL for MJPEG-in-AVI
(round 3) — ``codecs/avi.py`` walks the RIFF container and the
from-scratch JPEG decoder handles each sampled frame. Compressed
audio (mp3/flac/ogg) and inter-frame video codecs (H.264 etc.) still
need libraries this environment lacks: those payloads raise in the
codec → missing-row semantics, and each actor keeps a clearly-marked
``decoder="stub"`` (deterministic fake signal seeded by the payload
bytes) plus ``decoder="strict"`` (raises NotImplementedError) for
plumbing tests.

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
        # band edges over the rfft bins, precomputed once per actor —
        # equals np.array_split's partition of the bin axis
        bins = frame // 2 + 1
        edges = [b * (bins // n_bands) + min(b, bins % n_bands)
                 for b in range(n_bands + 1)]
        self._band_starts = np.array(edges[:-1], dtype=np.int64)
        self._band_sizes = np.diff(np.array(edges, dtype=np.int64))

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
            # windowed frames → FFT band energies, averaged over frames:
            # mean over frames first, then one reduceat over the
            # precomputed band edges (replaces the per-clip
            # array_split + Python list comprehension)
            usable = (len(pcm) // self.frame) * self.frame
            frames = pcm[:usable].reshape(-1, self.frame) * self.window
            spec = np.abs(np.fft.rfft(frames, axis=1)).mean(axis=0)
            feats[i] = (np.add.reduceat(spec, self._band_starts)
                        / self._band_sizes).astype(np.float32)
        out = batch.drop_columns([self.bytes_col])
        out = out.append_column("missing", pa.array(missing))
        flat = pa.array(feats.ravel(), type=pa.float32())
        return out.append_column(
            "features", pa.FixedSizeListArray.from_arrays(flat, self.n_bands)
        )


class VideoFrameSampleActor:
    """Decode → sample K frames → per-frame embed → mean-pool per clip.

    Round 3: VIDEO decode is REAL for MJPEG-in-AVI — the RIFF container
    walk (``codecs/avi.py``, same family as the WAV codec) plus the
    from-scratch JPEG decoder; only the K sampled frames pay decode
    cost (the parser returns raw payload slices). Other containers/
    codecs raise ``AviError`` → missing row (``decoder="mjpeg"``,
    default); ``decoder="stub"`` keeps the deterministic fake frames
    for plumbing tests and ``decoder="strict"`` raises on everything.
    Frame sampling is uniform over the container's stored frame count;
    the per-frame embed reuses the image model zoo (real numpy CNN).
    """

    def __init__(self, num_frames: int = 4, model_str: str = "tinynet",
                 bytes_col: str = "bytes", decoder: str = "mjpeg",
                 emit_stats: bool = False):
        from ..model.zoo import build_featurizer
        from ..functions.image_ops import NORMALIZERS

        if decoder not in ("mjpeg", "stub", "strict"):
            raise ValueError("decoder must be 'mjpeg', 'stub' or 'strict'")
        self.num_frames = num_frames
        self.bytes_col = bytes_col
        self.decoder = decoder
        self.emit_stats = emit_stats
        self.model = build_featurizer(model_str, depth=1)
        self.normalize = NORMALIZERS[self.model.preprocessing]
        self.num_features = self.model.num_features

    def _decode_frames(self, data: bytes, w: int, h: int,
                       n_frames: int) -> tuple[np.ndarray, int, float] | None:
        """→ (resized frame stack, container frame count, mean intensity
        of the sampled pre-resize frames) or None for a missing row.

        ``decoder="mjpeg"`` (default): REAL AVI parse; only the
        ``num_frames`` uniformly-sampled payloads are JPEG-decoded,
        then resized to the model target like any image row. Frame
        count comes from the CONTAINER, not the metadata column."""
        if not data:
            return None
        if self.decoder == "strict":
            raise NotImplementedError(
                "non-MJPEG video decode requires codec libraries not "
                "present in this environment (MJPEG/AVI decodes natively)"
            )
        th, tw = self.model.target_size
        if self.decoder == "mjpeg":
            from ..codecs.avi import AviError, parse_avi_mjpeg
            from ..codecs.jpeg import JpegError, decode_jpeg
            from ..functions.image_ops import resize_nearest, to_rgb

            try:
                vid = parse_avi_mjpeg(bytes(data))
                idx = np.unique(np.linspace(
                    0, vid.n_frames - 1, min(self.num_frames, vid.n_frames)
                ).astype(int))
                # within-batch payload dedup (the reference's batch memo
                # semantics, M5, lifted to frame granularity): identical
                # JPEG payloads decode/resize/CNN ONCE per batch — the
                # CNN forward was 70% of this stage's wall time and
                # duplicate frames are common (static scenes, title
                # cards, this corpus's solid-gray fixtures)
                uidx = []
                for i in idx:
                    payload = vid.frames[int(i)]
                    u = self._frame_memo.get(payload)
                    if u is None:
                        f = decode_jpeg(payload)
                        u = len(self._uniq_frames)
                        self._uniq_frames.append(
                            resize_nearest(to_rgb(f), (th, tw)))
                        self._uniq_means.append(f.mean(dtype=np.float64))
                        self._frame_memo[payload] = u
                    uidx.append(u)
            except (AviError, JpegError, ValueError):
                # corrupt container / payload -> missing-row semantics;
                # genuine programming errors (TypeError, ...) must raise
                return None
            mean_i = float(np.mean([self._uniq_means[u] for u in uidx]))
            return np.asarray(uidx, dtype=np.int64), vid.n_frames, mean_i
        if n_frames <= 0:
            return None
        idx = np.linspace(0, max(n_frames - 1, 0), self.num_frames).astype(int)
        rng = np.random.default_rng(_seed_from(data))
        fake = rng.integers(0, 256, size=(len(idx), th, tw, 3), dtype=np.uint8)
        base = len(self._uniq_frames)
        self._uniq_frames.extend(fake)
        self._uniq_means.extend(f.mean(dtype=np.float64) for f in fake)
        return (np.arange(base, base + len(fake), dtype=np.int64),
                n_frames, float(fake.mean(dtype=np.float64)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        feats = np.zeros((n, self.num_features), dtype=np.float32)
        missing = np.zeros(n, dtype=bool)
        frames_decoded = np.full(n, -1, dtype=np.int64)
        mean_intensity = np.full(n, -1.0, dtype=np.float64)
        byte_rows = batch[self.bytes_col].to_pylist()
        w = batch["w"].to_numpy()
        h = batch["h"].to_numpy()
        nf = batch["n_frames"].to_numpy()
        # decode per clip (container decode is inherently row-wise), but
        # run ONE batched CNN forward over the UNIQUE sampled frames of
        # the whole batch — per-clip 4-frame forwards waste the conv
        # batching (measured 59 s → headline-comparable at sf0.1 after
        # batching), and the batch-scoped payload memo below collapses
        # repeated frames so the forward (70% of stage wall time) runs
        # once per distinct payload, not once per occurrence
        self._frame_memo: dict[bytes, int] = {}
        self._uniq_frames: list[np.ndarray] = []
        self._uniq_means: list[float] = []
        clip_uidx: list[np.ndarray] = []
        clip_rows: list[int] = []
        for i, data in enumerate(byte_rows):
            dec = self._decode_frames(bytes(data) if data else b"",
                                      int(w[i]), int(h[i]), int(nf[i]))
            if dec is None:
                missing[i] = True
                continue
            uidx, frames_decoded[i], mean_intensity[i] = dec
            clip_uidx.append(uidx)
            clip_rows.append(i)
        if clip_uidx:
            stack = np.asarray(self._uniq_frames, dtype=np.float32)
            embs = self.model(self.normalize(stack))
            counts = np.array([len(u) for u in clip_uidx], dtype=np.int64)
            gathered = embs[np.concatenate(clip_uidx)]
            starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
            sums = np.add.reduceat(gathered, starts, axis=0)
            feats[np.array(clip_rows)] = sums / counts[:, None]
        self._frame_memo, self._uniq_frames, self._uniq_means = {}, [], []
        out = batch.drop_columns([self.bytes_col])
        out = out.append_column("missing", pa.array(missing))
        flat = pa.array(feats.ravel(), type=pa.float32())
        out = out.append_column(
            "features", pa.FixedSizeListArray.from_arrays(flat, self.num_features)
        )
        if self.emit_stats:
            out = out.append_column("frames_decoded", pa.array(frames_decoded))
            out = out.append_column("mean_intensity", pa.array(mean_intensity))
        return out
