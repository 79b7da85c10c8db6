"""Synthetic-table + decode-stage tests (FIXTURES.md T1 invariants)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pic2vec_ray.fixtures.synth import (
    content_seed,
    make_image_row,
    render_pixels,
    valid_dims,
)
from pic2vec_ray.codecs.registry import decode_image
from pic2vec_ray.functions.image_ops import psnr, to_rgb
from pic2vec_ray.stages.decode import BatchDecoder, make_decode_stats_fn


def test_row_roles():
    cap = "a caption"
    assert make_image_row(17, cap)["fmt"] == "gif"
    assert make_image_row(18, cap)["bytes"] == b""
    garbage = make_image_row(19, cap)
    with pytest.raises(Exception):
        decode_image(garbage["bytes"])
    # duplicate pair shares bytes + phash
    a, b = make_image_row(32, cap), make_image_row(33, cap)
    assert a["bytes"] == b["bytes"] and a["phash"] == b["phash"]
    # all-black row decodes to zeros
    black = make_image_row(16, cap)
    assert decode_image(black["bytes"]).sum() == 0
    # grayscale row is single channel
    gray = make_image_row(15, cap)
    assert decode_image(gray["bytes"]).shape[2] == 1


def test_valid_rows_decode_exactly():
    """Lossless rows (png/bmp) round-trip pixel-exact; jpeg rows are
    lossy on this adversarial noise content but keep exact dimensions
    (the 40 dB fidelity bar for smooth content is pinned in
    test_jpeg.py)."""
    for k in (1, 2, 3, 4, 5, 20, 21, 22):
        row = make_image_row(k, f"cap {k}")
        cs = content_seed(k)
        w, h = valid_dims(cs)
        img = to_rgb(decode_image(row["bytes"]))
        src = to_rgb(render_pixels(cs, w, h))
        assert img.shape == (h, w, 3) == src.shape
        if row["fmt"] == "jpeg":
            assert psnr(img, src) > 15
        else:
            assert psnr(img, src) == float("inf")
        assert (row["w"], row["h"]) == (w, h)
    fmts = {make_image_row(k, "c")["fmt"] for k in (1, 2, 3, 4, 5, 6)}
    assert fmts == {"png", "bmp", "jpeg"}  # all three whitelisted formats


def test_batch_decoder_dedup_and_missing():
    rows = [make_image_row(k, "c") for k in (1, 2, 33, 32, 18, 19)]
    dec = BatchDecoder(target_size=(32, 32))
    images, missing = dec.decode_column([r["bytes"] for r in rows])
    assert list(missing) == [False, False, False, False, True, True]
    # dup pair decoded once: identical array object reused
    assert images[2] is images[3]
    dense, missing2 = dec.decode_dense([r["bytes"] for r in rows])
    assert dense.shape == (6, 32, 32, 3)
    assert dense[4].sum() == 0 and dense[5].sum() == 0


def test_decode_stats_stage_on_ray(ray_session, images_dir):
    import ray.data as rd

    ds = rd.read_parquet(images_dir)
    out = ds.map_batches(make_decode_stats_fn(), batch_format="pyarrow").to_pandas()
    assert len(out) == 200  # sf0.001 part table
    valid = out[out.image_id.str[-2:].astype(int) % 20 < 17]
    bad = out[out.image_id.str[-2:].astype(int) % 20 >= 17]
    assert not valid.missing.any()
    assert bad.missing.all()
    # decoded dims equal the stored/oracle dims for valid rows
    assert (valid.decoded_w == valid.w).all()
    assert (valid.decoded_h == valid.h).all()


def test_images_parquet_schema(images_dir):
    t = pq.read_table(images_dir)
    assert t.column_names == ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    assert t.schema.field("bytes").type == pa.binary()
    assert t.schema.field("phash").type == pa.int64()
    # captions come from part.p_name byte-identically
    part = pq.read_table("/root/testdata/sf0.001/part.parquet", columns=["p_partkey", "p_name"])
    caps = dict(zip(t["image_id"].to_pylist(), t["caption"].to_pylist()))
    for k, name in zip(part["p_partkey"].to_pylist(), part["p_name"].to_pylist()):
        assert caps[f"img_{k:08d}"] == name


def test_preprocess_data_composable_api():
    """Public composable step parity (reference preprocess_data,
    pic2vec/__init__.py:9-25): bytes → normalized dense tensor."""
    from pic2vec_ray import preprocess_data

    rows = [make_image_row(k, "c") for k in (1, 2, 18, 33, 32)]
    tensor, missing = preprocess_data([r["bytes"] for r in rows], model_str="tinynet")
    assert tensor.shape == (5, 64, 64, 3) and tensor.dtype == np.float32
    assert list(missing) == [False, False, True, False, False]
    assert np.all(tensor[2] == 0.0)  # placeholder row zero post-normalization
    assert np.array_equal(tensor[3], tensor[4])  # dup pair identical
    gt, gm = preprocess_data([rows[0]["bytes"]], model_str="tinynet", grayscale=True)
    assert np.allclose(gt[0, :, :, 0], gt[0, :, :, 1])  # channels equalized


def test_patchify_pixel_exact_and_grid():
    """Patch payloads equal independent numpy tile slices of the
    decoded image (lossless AND jpeg rows — the comparison is against
    the DECODED pixels, so codec loss cancels); missing rows emit no
    tiles; row-major patch order."""
    from pic2vec_ray.stages.decode import decode_rgb, make_patchify_fn

    rows = [make_image_row(k, f"cap {k}") for k in
            (1, 2, 3, 4, 5, 15, 16, 17, 18, 19, 20)]
    t = pa.table({"image_id": [r["image_id"] for r in rows],
                  "bytes": [r["bytes"] for r in rows]})
    out = make_patchify_fn(16)(t).to_pandas()

    decoded = {r["image_id"]: decode_rgb(r["bytes"]) for r in rows}
    missing_ids = {r["image_id"] for r in rows if decoded[r["image_id"]] is None}
    assert missing_ids == {rows[i]["image_id"] for i, r in enumerate(rows)
                           if r["image_id"] in missing_ids}
    assert set(out.image_id) == {r["image_id"] for r in rows} - missing_ids

    for iid, g in out.groupby("image_id"):
        img = decoded[iid]
        gh, gw = img.shape[0] // 16, img.shape[1] // 16
        assert len(g) == gh * gw
        for _, r in g.iterrows():
            tile = img[r.py * 16:(r.py + 1) * 16, r.px * 16:(r.px + 1) * 16]
            assert (np.frombuffer(r.patch, np.uint8).reshape(16, 16, 3)
                    == tile).all()
            assert r.patch_no == r.py * gw + r.px
            assert abs(r.patch_mean - tile.mean()) < 1e-9

    with pytest.raises(ValueError):
        make_patchify_fn(0)


def test_thumbnail_roundtrip_pixel_exact():
    from pic2vec_ray.codecs.registry import decode_image
    from pic2vec_ray.functions.image_ops import resize_nearest
    from pic2vec_ray.stages.decode import decode_rgb, make_thumbnail_fn

    rows = [make_image_row(k, f"cap {k}") for k in
            (1, 2, 3, 5, 15, 16, 17, 18, 19)]
    t = pa.table({"image_id": [r["image_id"] for r in rows],
                  "bytes": [r["bytes"] for r in rows]})
    out = make_thumbnail_fn((32, 32))(t).to_pandas()

    valid = {r["image_id"] for r in rows if decode_rgb(r["bytes"]) is not None}
    assert set(out.image_id) == valid and len(out) == len(valid)
    assert out.thumb_ok.all()
    for _, r in out.iterrows():
        src = decode_rgb(next(x["bytes"] for x in rows
                              if x["image_id"] == r.image_id))
        exp = resize_nearest(src, (32, 32))
        got = to_rgb(decode_image(bytes(r.thumb)))
        assert (got == exp).all() and got.shape == (32, 32, 3)

    with pytest.raises(ValueError):
        make_thumbnail_fn((0, 32))


def test_patchify_drops_partial_edge_tiles():
    """Non-multiple dims: only FULL 16x16 tiles survive (exact-division
    ViT rule) and they match numpy slices of the cropped region."""
    from pic2vec_ray.codecs.png import encode_png
    from pic2vec_ray.stages.decode import make_patchify_fn

    rng = np.random.default_rng(71)
    img = rng.integers(0, 256, (50, 70, 3), np.uint8)  # 3x4 full tiles
    t = pa.table({"image_id": ["odd"], "bytes": [encode_png(img)]})
    out = make_patchify_fn(16)(t).to_pandas()
    assert len(out) == 3 * 4
    assert out.py.max() == 2 and out.px.max() == 3
    for _, r in out.iterrows():
        tile = img[r.py * 16:(r.py + 1) * 16, r.px * 16:(r.px + 1) * 16]
        assert (np.frombuffer(r.patch, np.uint8).reshape(16, 16, 3) == tile).all()
    # an image smaller than one tile emits nothing
    tiny = rng.integers(0, 256, (8, 8, 3), np.uint8)
    t2 = pa.table({"image_id": ["tiny"], "bytes": [encode_png(tiny)]})
    assert len(make_patchify_fn(16)(t2).to_pandas()) == 0
