"""Decode / preprocess map_batches stage (SURVEY.md §2.2 M1–M6).

Stateless task stage: Arrow batch in → Arrow batch out. Per row it
sniffs + decodes the ``bytes`` column (pure-numpy codecs), converts to
RGB, optionally resizes to a model target size, and sets ``missing``.

Reference semantics mirrored:

- decode/fetch failure or empty bytes → zero image + ``missing=True``,
  never a pipeline error
  (``/root/reference/pic2vec/feature_preprocessing.py:318-323,443-446``);
- within-batch exact dedup: repeated identical bytes are decoded once
  and the result reused (memo dict, ``feature_preprocessing.py:449-455``
  — reference scopes the memo to one batch; ours likewise, so the
  stage stays stateless and shuffle-free at any scale);
- aspect ratio squashed by direct resize, nearest interpolation (M1).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..codecs.registry import DecodeError, decode_image
from ..functions.image_ops import resize_nearest, to_rgb


def decode_rgb(data: bytes) -> np.ndarray | None:
    """bytes → (H, W, 3) uint8, or None on any decode failure."""
    try:
        return to_rgb(decode_image(data))
    except (DecodeError, Exception):
        return None


class BatchDecoder:
    """Reusable per-batch decoding core with exact within-batch dedup.

    Returns (images, missing) where ``images`` is a list of (H,W,3)
    arrays (None for missing rows) — or, when ``target_size`` is set, a
    dense (N, H, W, 3) uint8 tensor with zero slices for missing rows.
    """

    def __init__(self, target_size: tuple[int, int] | None = None):
        self.target_size = target_size

    def decode_column(self, byte_rows: list) -> tuple[list, np.ndarray]:
        memo: dict[bytes, int] = {}
        images: list = []
        missing = np.zeros(len(byte_rows), dtype=bool)
        for i, data in enumerate(byte_rows):
            data = bytes(data) if data is not None else b""
            key = data
            if key in memo:
                j = memo[key]
                images.append(images[j])
                missing[i] = missing[j]
                continue
            img = decode_rgb(data) if data else None
            if img is None:
                missing[i] = True
                images.append(None)
            else:
                if self.target_size is not None:
                    img = resize_nearest(img, self.target_size)
                images.append(img)
            memo[key] = i
        return images, missing

    def decode_dense(self, byte_rows: list) -> tuple[np.ndarray, np.ndarray]:
        if self.target_size is None:
            raise ValueError("dense decode requires a target_size")
        images, missing = self.decode_column(byte_rows)
        h, w = self.target_size
        out = np.zeros((len(images), h, w, 3), dtype=np.uint8)
        for i, img in enumerate(images):
            if img is not None:
                out[i] = img
        return out, missing


def preprocess_data(byte_rows: list, model_str: str = "squeezenet",
                    grayscale: bool = False):
    """Composable preprocess step (reference ``preprocess_data``,
    ``/root/reference/pic2vec/feature_preprocessing.py:362-478``, public
    via ``pic2vec/__init__.py:9-25``): encoded-image bytes → dense
    normalized ``(N, H, W, C)`` float32 tensor at the model's target
    size, zero slices + missing flags for failed rows, within-batch
    exact dedup. Returns ``(tensor, missing)``.

    ``grayscale`` collapses to one luminance-replicated channel set
    (the reference's channel switch, ``feature_preprocessing.py:321``,
    kept nominally like the reference does).
    """
    from ..functions.image_ops import NORMALIZERS
    from ..model.zoo import MODEL_REGISTRY

    spec = MODEL_REGISTRY.get(model_str)
    if spec is None:
        raise ValueError(f"unknown model {model_str!r}")
    dec = BatchDecoder(target_size=spec["target_size"])
    dense, missing = dec.decode_dense(byte_rows)
    if grayscale:
        gray = dense.astype(np.float32).mean(axis=3, keepdims=True)
        dense = np.repeat(gray, 3, axis=3).astype(np.uint8)
    tensor = NORMALIZERS[spec["preprocessing"]](dense)
    tensor[missing] = 0.0  # reference zero-fills AFTER normalization
    return tensor, missing


def make_phash_verify_fn(bytes_col: str = "bytes"):
    """Factory for a map_batches fn proving end-to-end PIXEL equality.

    For every losslessly-encoded row (png/bmp) it re-decodes the bytes
    and recomputes the 8×8 average hash, emitting ``(image_id,
    phash_ok)`` where ``phash_ok`` compares against the table's stored
    ``phash`` (computed by the generator from the ORIGINAL pre-encoding
    pixels).  A single flipped pixel anywhere flips the check, so the
    driver oracle (``phash_verify`` — closed-form row set from ``part``,
    all-TRUE expected) certifies the decode path bit-exactly at the
    query surface, not just in unit tests.  Rows whose bytes fail to
    decode (the corpus's deliberate garbage/empty rows) are dropped —
    the oracle predicts exactly which rows survive.
    """
    from ..functions.image_ops import average_hash

    def verify(batch: pa.Table) -> pa.Table:
        ids: list[str] = []
        oks: list[bool] = []
        for image_id, data, fmt, ph in zip(batch["image_id"].to_pylist(),
                                           batch[bytes_col].to_pylist(),
                                           batch["fmt"].to_pylist(),
                                           batch["phash"].to_pylist()):
            if fmt not in ("png", "bmp"):
                continue
            img = decode_rgb(bytes(data) if data is not None else b"")
            if img is None:
                continue
            ids.append(image_id)
            oks.append(average_hash(img) == ph)
        return pa.table({"image_id": pa.array(ids, pa.string()),
                         "phash_ok": pa.array(oks, pa.bool_())})

    return verify


def make_thumbnail_fn(size: tuple[int, int] = (32, 32),
                      bytes_col: str = "bytes", verify: bool = True):
    """Factory for a thumbnail-generation map_batches fn: decode →
    nearest-neighbor resize to ``size`` → lossless PNG re-ENCODE — the
    standard preview/derived-asset stage of multimodal pipelines, and
    the one pipeline that exercises the from-scratch PNG *encoder* at
    the query surface (decoders are covered by every other image op).

    Output per decodable row: ``image_id``, ``thumb`` (PNG bytes),
    ``thumb_w``/``thumb_h`` and, with ``verify``, ``thumb_ok`` — the
    re-decoded thumbnail compared byte-for-byte against the resized
    pixels (PNG is lossless, so this must hold for EVERY row, jpeg
    sources included: the roundtrip is encode∘resize∘decode, codec loss
    upstream cancels).  Missing/undecodable rows are dropped — the
    oracle predicts exactly which rows survive.  Stateless, shuffle-
    free, one resize + encode per distinct image (the within-batch
    memo of BatchDecoder upstream covers duplicate bytes).
    """
    from ..codecs.png import encode_png
    from ..codecs.registry import decode_image

    h, w = int(size[0]), int(size[1])
    if h < 1 or w < 1:
        raise ValueError(f"size must be positive, got {size}")
    decoder = BatchDecoder(target_size=None)

    def thumbs(batch: pa.Table) -> pa.Table:
        images, _missing = decoder.decode_column(batch[bytes_col].to_pylist())
        ids, blobs, oks = [], [], []
        for image_id, img in zip(batch["image_id"].to_pylist(), images):
            if img is None:
                continue
            small = resize_nearest(img, (h, w))
            png = encode_png(small)
            ids.append(image_id)
            blobs.append(png)
            if verify:
                back = to_rgb(decode_image(png))
                oks.append(bool((back == small).all()))
        cols = {
            "image_id": pa.array(ids, pa.string()),
            "thumb": pa.array(blobs, pa.binary()),
            "thumb_w": pa.array(np.full(len(ids), w, dtype=np.int64)),
            "thumb_h": pa.array(np.full(len(ids), h, dtype=np.int64)),
        }
        if verify:
            cols["thumb_ok"] = pa.array(oks, pa.bool_())
        return pa.table(cols)

    return thumbs


def make_patchify_fn(patch: int = 16, bytes_col: str = "bytes",
                     with_pixels: bool = True):
    """Factory for a ViT-style patch-extraction map_batches fn — the
    image-axis analog of ``stages/text.chunk_documents``: decode each
    image and split it into non-overlapping ``patch``×``patch`` tiles
    (row-major; partial edge tiles are DROPPED, the exact-division ViT
    rule — every synthetic dim is a multiple of 16, so nothing drops on
    this corpus), one output row per tile.  Missing/undecodable rows
    emit zero tiles.

    Output: ``image_id``, ``patch_no`` (row-major), ``py``, ``px``
    (grid coords) and, with ``with_pixels``, the raw ``patch`` bytes
    (``patch*patch*3`` uint8, C-order) plus ``patch_mean`` — the
    payload a downstream patch-embedding actor consumes.

    Scale shape: stateless shuffle-free task stage; the slicing is one
    ``reshape`` + ``transpose`` per image (a view, then one copy into
    the batch's output buffer), no Python loop over tiles.
    """
    P = int(patch)
    if P < 1:
        raise ValueError(f"patch must be >= 1, got {P}")
    decoder = BatchDecoder(target_size=None)

    def patchify(batch: pa.Table) -> pa.Table:
        images, _missing = decoder.decode_column(batch[bytes_col].to_pylist())
        ids = batch["image_id"].to_pylist()
        out_ids: list[str] = []
        grids: list[tuple[int, int]] = []
        tiles: list[np.ndarray] = []
        for image_id, img in zip(ids, images):
            if img is None:
                continue
            gh, gw = img.shape[0] // P, img.shape[1] // P
            if gh == 0 or gw == 0:
                continue
            t = (img[:gh * P, :gw * P]
                 .reshape(gh, P, gw, P, 3)
                 .transpose(0, 2, 1, 3, 4)
                 .reshape(gh * gw, P * P * 3))
            out_ids.append(image_id)
            grids.append((gh, gw))
            tiles.append(t)
        n_tiles = np.array([gh * gw for gh, gw in grids], dtype=np.int64)
        total = int(n_tiles.sum())
        image_col = pa.array(np.repeat(np.array(out_ids, dtype=object), n_tiles),
                             pa.string())
        # cumsum-minus form stays shape-correct when NO image in the
        # batch yields a tile (all missing / smaller than one patch)
        prefix = (np.cumsum(n_tiles) - n_tiles).astype(np.int64)
        patch_no = np.arange(total, dtype=np.int64) - np.repeat(prefix, n_tiles)
        gws = np.repeat(np.array([gw for _, gw in grids], dtype=np.int64), n_tiles)
        cols = {
            "image_id": image_col,
            "patch_no": pa.array(patch_no, pa.int64()),
            "py": pa.array(patch_no // np.maximum(gws, 1), pa.int64()),
            "px": pa.array(patch_no % np.maximum(gws, 1), pa.int64()),
        }
        if with_pixels:
            flat = np.ascontiguousarray(
                np.concatenate(tiles, axis=0) if tiles
                else np.zeros((0, P * P * 3), np.uint8))
            cols["patch"] = pa.Array.from_buffers(
                pa.binary(P * P * 3), total,
                [None, pa.py_buffer(flat)])  # one buffer, no per-tile loop
            cols["patch_mean"] = pa.array(
                flat.reshape(total, -1).mean(axis=1) if total else
                np.zeros(0, np.float64), pa.float64())
        return pa.table(cols)

    return patchify


def make_box_features_fn(bytes_col: str = "bytes"):
    """Factory for a map_batches fn computing integral-image box
    features — the Viola–Jones-style Haar primitive: decode → integer
    intensity (r+g+b, exact int64 math) → 2D summed-area table → the
    2×2 quadrant box sums plus horizontal/vertical Haar contrasts
    (left−right, top−bottom).

    Every quadrant sum is computed BOTH ways — O(1) from the integral
    image corners and directly from the pixel slice — and ``box_ok``
    records their equality, so the driver oracle (closed-form
    decodable-row set from ``part``, all-TRUE expected — the
    phash_verify pattern) certifies the summed-area-table algebra on
    real decoded pixels at the query surface.  Undecodable rows drop;
    the oracle predicts exactly which rows survive.
    """

    def feats(batch: pa.Table) -> pa.Table:
        ids: list[str] = []
        oks: list[bool] = []
        haar_h: list[int] = []
        haar_v: list[int] = []
        for image_id, data in zip(batch["image_id"].to_pylist(),
                                  batch[bytes_col].to_pylist()):
            img = decode_rgb(bytes(data) if data is not None else b"")
            if img is None:
                continue
            inten = img.astype(np.int64).sum(axis=2)
            h, w = inten.shape
            sat = np.zeros((h + 1, w + 1), np.int64)
            sat[1:, 1:] = inten.cumsum(0).cumsum(1)
            ys, xs = (0, h // 2, h), (0, w // 2, w)
            ok = True
            q = np.empty((2, 2), np.int64)
            for i in range(2):
                for j in range(2):
                    y0, y1, x0, x1 = ys[i], ys[i + 1], xs[j], xs[j + 1]
                    q[i, j] = (sat[y1, x1] - sat[y0, x1]
                               - sat[y1, x0] + sat[y0, x0])
                    ok = ok and q[i, j] == inten[y0:y1, x0:x1].sum()
            ids.append(image_id)
            oks.append(bool(ok))
            haar_h.append(int(q[:, 0].sum() - q[:, 1].sum()))
            haar_v.append(int(q[0, :].sum() - q[1, :].sum()))
        return pa.table({"image_id": pa.array(ids, pa.string()),
                         "box_ok": pa.array(oks, pa.bool_()),
                         "haar_h": pa.array(haar_h, pa.int64()),
                         "haar_v": pa.array(haar_v, pa.int64())})

    return feats


def make_decode_stats_fn(bytes_col: str = "bytes"):
    """Factory for a map_batches fn emitting per-row decode metadata.

    Output: passthrough columns (minus bytes) + ``decoded_w``,
    ``decoded_h``, ``missing``. Used by correctness checks (decoded
    dimensions are oracle-SQL-predictable for the synthetic table).
    """
    decoder = BatchDecoder(target_size=None)

    def decode_stats(batch: pa.Table) -> pa.Table:
        images, missing = decoder.decode_column(batch[bytes_col].to_pylist())
        dw = np.array([0 if im is None else im.shape[1] for im in images], dtype=np.int32)
        dh = np.array([0 if im is None else im.shape[0] for im in images], dtype=np.int32)
        out = batch.drop_columns([bytes_col])
        out = out.append_column("decoded_w", pa.array(dw, type=pa.int32()))
        out = out.append_column("decoded_h", pa.array(dh, type=pa.int32()))
        out = out.append_column("missing", pa.array(missing))
        return out

    return decode_stats
