"""Image augmentation stages (training-data image ops beyond the
reference: flips, quarter-turn rotations, center crop) plus a
query-surface verification fn in the ``phash_verify`` pattern.

Every primitive is a pure numpy view/copy over the decoded HWC uint8
array — no per-pixel Python, no external imaging library (none exists
in this environment; the decode itself is the repo's from-scratch
codec layer, see ``codecs/``). The production stage
(:func:`make_augment_fn`) runs decode → augment → lossless PNG
re-encode in one stateless shuffle-free ``map_batches`` task, the same
shape as ``stages/decode.make_thumbnail_fn``; deterministic per-image
op selection (splitmix of the id) keeps the output reproducible under
any partitioning — augmentation that changes with block layout would
poison resume/retry semantics at scale.

Reference parity note: the reference has no augmentation ops
(pic2vec/data_featurizing.py is featurize-only); SURVEY.md §2's
image-axis additions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def hflip(img: np.ndarray) -> np.ndarray:
    """Horizontal (left-right) flip of an HWC array; a view."""
    return img[:, ::-1]


def vflip(img: np.ndarray) -> np.ndarray:
    """Vertical (top-bottom) flip of an HWC array; a view."""
    return img[::-1]


def rotate90(img: np.ndarray, k: int = 1) -> np.ndarray:
    """Counter-clockwise quarter turns of an HWC array; a view."""
    return np.rot90(img, k)


def center_crop(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Center ``h``×``w`` crop. Requested size is clamped to the
    image; offsets use the floor rule ((H-h)//2, (W-w)//2)."""
    H, W = img.shape[:2]
    h, w = min(h, H), min(w, W)
    y, x = (H - h) // 2, (W - w) // 2
    return img[y:y + h, x:x + w]


AUGMENTS = {
    "hflip": hflip,
    "vflip": vflip,
    "rot90": rotate90,
    "rot180": lambda im: rotate90(im, 2),
}
_AUG_NAMES = sorted(AUGMENTS)


def make_augment_verify_fn(bytes_col: str = "bytes",
                           crop: tuple[int, int] = (16, 16)):
    """Factory for a map_batches fn PROVING the augmentation algebra on
    every losslessly-decodable row: ``hflip∘hflip = id``,
    ``vflip∘vflip = id``, ``rot90⁴ = id``, ``rot180 = hflip∘vflip``,
    center-crop shape + content equal the direct numpy slice, and
    flips preserve the pixel sum (a brightness invariant). Emits
    ``(image_id, aug_ok)``; undecodable rows drop, so the driver
    oracle (closed-form surviving-row set from ``part``, all-TRUE) is
    the same shape as ``phash_verify``.
    """
    from .decode import BatchDecoder

    decoder = BatchDecoder(target_size=None)
    ch, cw = crop

    def verify(batch: pa.Table) -> pa.Table:
        images, _ = decoder.decode_column(batch[bytes_col].to_pylist())
        ids, oks = [], []
        for image_id, fmt, img in zip(batch["image_id"].to_pylist(),
                                      batch["fmt"].to_pylist(), images):
            if fmt not in ("png", "bmp") or img is None:
                continue
            s = int(img.sum(dtype=np.int64))
            ok = (
                np.array_equal(hflip(hflip(img)), img)
                and np.array_equal(vflip(vflip(img)), img)
                and np.array_equal(rotate90(img, 4), img)
                and np.array_equal(rotate90(img, 2), hflip(vflip(img)))
                and int(hflip(img).sum(dtype=np.int64)) == s
                and int(vflip(img).sum(dtype=np.int64)) == s
            )
            c = center_crop(img, ch, cw)
            H, W = img.shape[:2]
            hh, ww = min(ch, H), min(cw, W)
            y, x = (H - hh) // 2, (W - ww) // 2
            ok = ok and c.shape[:2] == (hh, ww) \
                and np.array_equal(c, img[y:y + hh, x:x + ww])
            ids.append(image_id)
            oks.append(bool(ok))
        return pa.table({"image_id": pa.array(ids, pa.string()),
                         "aug_ok": pa.array(oks, pa.bool_())})

    return verify


def make_augment_fn(ops: list[str] | None = None,
                    bytes_col: str = "bytes", seed: int = 5102020):
    """Factory for the production augmentation stage: decode each row,
    apply ONE op chosen deterministically per image
    (``splitmix(id_hash + seed) % len(ops)`` — reproducible under any
    partitioning, resume and retry), re-encode lossless PNG. Output:
    ``image_id``, ``aug`` (op name), ``bytes`` (PNG), ``height``,
    ``width``. Undecodable rows drop (missing semantics upstream)."""
    from ..codecs.png import encode_png
    from .decode import BatchDecoder
    from .sketch import _splitmix64

    ops = ops or _AUG_NAMES
    unknown = set(ops) - set(AUGMENTS)
    if unknown:
        raise ValueError(f"unknown augment ops: {sorted(unknown)}")
    decoder = BatchDecoder(target_size=None)

    def augment(batch: pa.Table) -> pa.Table:
        images, _ = decoder.decode_column(batch[bytes_col].to_pylist())
        ids = batch["image_id"].to_pylist()
        id_hash = pd.util.hash_pandas_object(
            pd.Series(ids, dtype=object), index=False).to_numpy()
        pick = _splitmix64(id_hash + np.uint64(seed)) % np.uint64(len(ops))
        out = {"image_id": [], "aug": [], "bytes": [],
               "height": [], "width": []}
        for image_id, img, p in zip(ids, images, pick):
            if img is None:
                continue
            name = ops[int(p)]
            aug = np.ascontiguousarray(AUGMENTS[name](img))
            out["image_id"].append(image_id)
            out["aug"].append(name)
            out["bytes"].append(encode_png(aug))
            out["height"].append(aug.shape[0])
            out["width"].append(aug.shape[1])
        return pa.table({
            "image_id": pa.array(out["image_id"], pa.string()),
            "aug": pa.array(out["aug"], pa.string()),
            "bytes": pa.array(out["bytes"], pa.binary()),
            "height": pa.array(out["height"], pa.int64()),
            "width": pa.array(out["width"], pa.int64()),
        })

    return augment
