"""Vectorized numpy neural-net kernels (no torch/TF in this environment).

Conv is im2col (sliding_window_view) + one BLAS matmul per layer —
batched over the whole Arrow batch, never a Python loop per pixel.
These back the embed actors (SURVEY.md §2.3 T1–T8): the actor loads
deterministic weights once in ``__init__`` and runs these kernels per
batch in ``__call__``.
"""

from __future__ import annotations

import zlib

import numpy as np
from numpy.lib.stride_tricks import sliding_window_view


def he_init(shape: tuple[int, ...], name: str, seed: int = 5102020) -> np.ndarray:
    """Deterministic per-layer He-style init.

    The reference ships pretrained ImageNet h5 weights
    (``/root/reference/pic2vec/build_featurizer.py:71-114``); those
    blobs are stripped from the local checkout and no network exists
    here, so weights are seeded deterministically per layer name. The
    *architecture*, decapitation and pooling math are what parity tests
    cover; goldens are regenerated against these pinned weights
    (SURVEY.md §7.4).
    """
    rng = np.random.default_rng(seed + zlib.crc32(name.encode()))
    fan_in = int(np.prod(shape[:-1])) if len(shape) > 1 else int(shape[0])
    std = np.sqrt(2.0 / max(fan_in, 1))
    return (rng.standard_normal(shape) * std).astype(np.float32)


def pad_same(x: np.ndarray, kh: int, kw: int, sh: int, sw: int) -> np.ndarray:
    """TF-style 'same' padding for NHWC input."""
    h, w = x.shape[1:3]
    oh = -(-h // sh)
    ow = -(-w // sw)
    ph = max((oh - 1) * sh + kh - h, 0)
    pw = max((ow - 1) * sw + kw - w, 0)
    return np.pad(x, ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0)))


def conv2d(x: np.ndarray, w: np.ndarray, b: np.ndarray | None = None,
           stride: int = 1, padding: str = "valid") -> np.ndarray:
    """NHWC conv. w: (KH, KW, C, OC). im2col + single matmul."""
    kh, kw, cin, cout = w.shape
    if padding == "same":
        x = pad_same(x, kh, kw, stride, stride)
    win = sliding_window_view(x, (kh, kw), axis=(1, 2))  # (N, OH', OW', C, KH, KW)
    win = win[:, ::stride, ::stride]
    n, oh, ow = win.shape[:3]
    # → (N*OH*OW, KH*KW*C) with channel-last ordering matching w reshape
    col = win.transpose(0, 1, 2, 4, 5, 3).reshape(n * oh * ow, kh * kw * cin)
    out = col @ w.reshape(kh * kw * cin, cout)
    if b is not None:
        out += b
    return out.reshape(n, oh, ow, cout)


def relu(x: np.ndarray) -> np.ndarray:
    return np.maximum(x, 0.0, out=x)


def maxpool2d(x: np.ndarray, k: int, stride: int) -> np.ndarray:
    win = sliding_window_view(x, (k, k), axis=(1, 2))[:, ::stride, ::stride]
    return win.max(axis=(-2, -1))


def avgpool2d(x: np.ndarray, k: int, stride: int = 1,
              padding: str = "same") -> np.ndarray:
    if padding == "same":
        x = pad_same(x, k, k, stride, stride)
    win = sliding_window_view(x, (k, k), axis=(1, 2))[:, ::stride, ::stride]
    return win.mean(axis=(-2, -1)).astype(np.float32)


def global_avg_pool(x: np.ndarray) -> np.ndarray:
    """(N, H, W, C) → (N, C) — T4, build_featurizer.py:351-352."""
    return x.mean(axis=(1, 2))


def downsample_features(features: np.ndarray, num_pooled: int) -> np.ndarray:
    """Reference splice-average downsampling (T5).

    Exactly the math of ``_downsample_model_features``
    (``/root/reference/pic2vec/build_featurizer.py:235-258``): split the
    F features into ``pc = F // num_pooled`` strided splices
    ``features[:, i::pc]`` and average them — i.e. mean over each
    consecutive group of ``pc`` neighbors. Requires integer divisor,
    same error contract as ``_find_pooling_constant``
    (``build_featurizer.py:154-195``).
    """
    f = features.shape[-1]
    if num_pooled > f:
        raise ValueError("can't downsample to more than the original feature count")
    if f % num_pooled:
        divisors = [d for d in range(1, f + 1) if f % d == 0]
        recommended = min(divisors, key=lambda d: abs(d - num_pooled))
        raise ValueError(
            f"Trying to downsample features to non-integer divisor: from {f} to "
            f"{num_pooled}. Nearest valid size: {recommended}."
        )
    pc = f // num_pooled
    return features.reshape(features.shape[0], num_pooled, pc).mean(axis=2)


def check_downsampling_mismatch(downsample: bool, num_pooled: int, layer_size: int) -> tuple[bool, int]:
    """Autosample resolution (T6, ``build_featurizer.py:261-299``):
    flag on with size 0 → half the layer width (error if odd); nonzero
    size with flag off → flag forced on."""
    if downsample and num_pooled == 0:
        if layer_size % 2:
            raise ValueError(f"can't autosample odd layer width {layer_size}")
        return True, layer_size // 2
    if not downsample and num_pooled != 0:
        return True, num_pooled
    return downsample, num_pooled
