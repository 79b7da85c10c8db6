"""Vectorized numpy image kernels used by the decode/preprocess stage.

Semantics mirror the reference:

- resize squashes aspect ratio directly to the model's target size with
  nearest-neighbor interpolation (keras 2.2.x ``load_img`` default, used
  at ``/root/reference/pic2vec/feature_preprocessing.py:326-327``);
- grayscale/RGBA sources are normalized to RGB before resize;
- per-model pixel normalization follows the dispatch table at
  ``/root/reference/pic2vec/feature_preprocessing.py:37-63``:
  "caffe"-style (RGB→BGR + ImageNet channel-mean subtraction) for
  squeezenet/vgg/resnet, "tf"-style (x/127.5 - 1) for
  inception/xception.
"""

from __future__ import annotations

import numpy as np

# ImageNet channel means in BGR order (public constant from
# keras.applications.imagenet_utils "caffe" mode).
_IMAGENET_MEAN_BGR = np.array([103.939, 116.779, 123.68], dtype=np.float32)


def to_rgb(img: np.ndarray) -> np.ndarray:
    """Normalize (H,W), (H,W,1), (H,W,3), (H,W,4) uint8 → (H,W,3)."""
    if img.ndim == 2:
        img = img[:, :, None]
    c = img.shape[2]
    if c == 1:
        return np.repeat(img, 3, axis=2)
    if c == 3:
        return img
    if c == 4:
        return img[:, :, :3]  # drop alpha (composite-on-black for opaque fixtures)
    raise ValueError(f"unsupported channel count {c}")


def resize_nearest(img: np.ndarray, target_hw: tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor resize to (H, W), squashing aspect ratio."""
    th, tw = target_hw
    h, w = img.shape[:2]
    if (h, w) == (th, tw):
        return img
    # keras/PIL nearest sampling grid: index = floor((i + 0.5) * src/dst)
    ys = np.minimum(((np.arange(th) + 0.5) * (h / th)).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(tw) + 0.5) * (w / tw)).astype(np.int64), w - 1)
    return img[ys[:, None], xs[None, :]]


def center_crop(img: np.ndarray, target_hw: tuple[int, int]) -> np.ndarray:
    """Center-crop to (H, W) after a shorter-side-preserving check.

    Offered as an alternative preprocessing mode (north_star mentions
    resize/center-crop); the reference itself only squashes.
    """
    th, tw = target_hw
    h, w = img.shape[:2]
    if h < th or w < tw:
        img = resize_nearest(img, (max(h, th), max(w, tw)))
        h, w = img.shape[:2]
    y0 = (h - th) // 2
    x0 = (w - tw) // 2
    return img[y0 : y0 + th, x0 : x0 + tw]


def normalize_caffe(batch: np.ndarray) -> np.ndarray:
    """RGB float batch (N,H,W,3) → BGR, ImageNet mean-subtracted."""
    out = batch[..., ::-1].astype(np.float32, copy=True)
    out -= _IMAGENET_MEAN_BGR
    return out


def normalize_tf(batch: np.ndarray) -> np.ndarray:
    """float batch → x/127.5 - 1 (inception/xception style)."""
    return batch.astype(np.float32) / 127.5 - 1.0


NORMALIZERS = {"caffe": normalize_caffe, "tf": normalize_tf}


def average_hash(img: np.ndarray) -> int:
    """Perceptual-hash-like int64: 8x8 grayscale average hash.

    Deterministic from pixel content, so exact-duplicate images share a
    value — the property the ``phash`` column (BASELINE.json input_hint)
    needs for the dedup / skew paths.
    """
    rgb = to_rgb(img)
    gray = rgb.astype(np.float32).mean(axis=2)
    small = resize_nearest(gray[:, :, None], (8, 8))[:, :, 0]
    bits = (small > small.mean()).astype(np.uint64).ravel()
    val = np.uint64(0)
    for b in bits:
        val = np.uint64(val << np.uint64(1)) | b
    return int(val.astype(np.int64))


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
