"""Codec round-trip + format-sniffing tests (SURVEY.md §5 strategy (a))."""

from __future__ import annotations

import numpy as np
import pytest

from pic2vec_ray.codecs.bmp import decode_bmp, encode_bmp
from pic2vec_ray.codecs.png import decode_png, encode_png
from pic2vec_ray.codecs.registry import (
    DecodeError,
    UnsupportedFormatError,
    decode_image,
    sniff_format,
)
from pic2vec_ray.functions.image_ops import psnr, resize_nearest, to_rgb


def _img(seed: int, h: int, w: int, c: int = 3) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


@pytest.mark.parametrize("shape", [(7, 5), (64, 64), (31, 47), (96, 64)])
def test_png_rgb_roundtrip(shape):
    img = _img(1, *shape)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_gray_roundtrip():
    img = _img(2, 33, 21, 1)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_rgba_roundtrip():
    img = _img(3, 16, 16, 4)
    assert np.array_equal(decode_png(encode_png(img)), img)


@pytest.mark.parametrize("shape", [(8, 8), (64, 64), (31, 47), (5, 3)])
def test_bmp_roundtrip(shape):
    img = _img(4, *shape)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_sniffing():
    img = _img(5, 8, 8)
    assert sniff_format(encode_png(img)) == "png"
    assert sniff_format(encode_bmp(img)) == "bmp"
    assert sniff_format(b"GIF89a" + b"\x00" * 16) == "gif"
    assert sniff_format(b"\xff\xd8\xff\xe0" + b"\x00" * 16) == "jpeg"
    assert sniff_format(b"junk") is None


def test_whitelist_rejects_gif():
    with pytest.raises(UnsupportedFormatError):
        decode_image(b"GIF89a" + b"\x00" * 64)


def test_corrupt_jpeg_fails_cleanly():
    with pytest.raises(DecodeError):
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 64)


def test_jpeg_decodes_via_registry():
    from pic2vec_ray.codecs.jpeg import encode_jpeg

    yy, xx = np.mgrid[0:24, 0:40]
    img = np.stack([(xx * 6).astype(np.uint8), (yy * 10).astype(np.uint8),
                    ((xx + yy) * 4).astype(np.uint8)], axis=2)
    out = decode_image(encode_jpeg(img, quality=95))
    assert out.shape == img.shape
    assert psnr(out, img) > 40  # the lossy-format fidelity bar


def test_garbage_and_empty_fail_cleanly():
    with pytest.raises(DecodeError):
        decode_image(b"")
    with pytest.raises(DecodeError):
        decode_image(b"\x89PNG\r\n\x1a\n" + b"\xde\xad\xbe\xef" * 32)


def test_lossless_psnr_is_infinite():
    img = _img(6, 40, 56)
    assert psnr(decode_png(encode_png(img)), img) == float("inf")
    assert psnr(decode_bmp(encode_bmp(img)), img) == float("inf")


def test_resize_and_rgb():
    img = _img(7, 10, 20, 1)
    rgb = to_rgb(img)
    assert rgb.shape == (10, 20, 3)
    small = resize_nearest(rgb, (5, 5))
    assert small.shape == (5, 5, 3)
    # identity resize is a no-op
    assert resize_nearest(rgb, (10, 20)) is rgb


# ---- property-based codec round-trips (hypothesis) ----

from hypothesis import given, settings
from hypothesis import strategies as hst


@given(h=hst.integers(1, 40), w=hst.integers(1, 40),
       c=hst.sampled_from([1, 3, 4]), seed=hst.integers(0, 2**31))
@settings(max_examples=30, deadline=None)
def test_png_roundtrip_property(h, w, c, seed):
    img = np.random.default_rng(seed).integers(0, 256, size=(h, w, c), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


@given(h=hst.integers(1, 40), w=hst.integers(1, 40), seed=hst.integers(0, 2**31))
@settings(max_examples=30, deadline=None)
def test_bmp_roundtrip_property(h, w, seed):
    img = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


@given(data=hst.binary(max_size=200))
@settings(max_examples=50, deadline=None)
def test_decode_never_crashes_on_garbage(data):
    """Arbitrary bytes must raise DecodeError or decode — never crash
    the process (poison-pill invariant of the decode stage)."""
    try:
        decode_image(data)
    except DecodeError:
        pass
