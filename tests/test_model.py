"""Model-zoo unit tests: decapitation widths, splice-pool math,
autosample logic — mirrors the reference's operator tests
(``/root/reference/tests/test_build_featurizer.py``)."""

from __future__ import annotations

import numpy as np
import pytest

from pic2vec_ray.model.numpy_nn import (
    check_downsampling_mismatch,
    conv2d,
    downsample_features,
    global_avg_pool,
    maxpool2d,
)
from pic2vec_ray.model.zoo import build_featurizer, featurize_data


def test_conv2d_matches_naive():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 9, 9, 3)).astype(np.float32)
    w = rng.standard_normal((3, 3, 3, 4)).astype(np.float32)
    out = conv2d(x, w, stride=2, padding="valid")
    # naive reference
    expect = np.zeros((2, 4, 4, 4), dtype=np.float64)
    for n in range(2):
        for oy in range(4):
            for ox in range(4):
                patch = x[n, oy * 2 : oy * 2 + 3, ox * 2 : ox * 2 + 3, :]
                for oc in range(4):
                    expect[n, oy, ox, oc] = np.sum(patch * w[:, :, :, oc])
    assert np.allclose(out, expect, atol=1e-4)


def test_maxpool_and_gap():
    x = np.arange(2 * 4 * 4 * 1, dtype=np.float32).reshape(2, 4, 4, 1)
    p = maxpool2d(x, 2, 2)
    assert p.shape == (2, 2, 2, 1)
    assert p[0, 0, 0, 0] == 5.0
    g = global_avg_pool(x)
    assert np.allclose(g[:, 0], x.mean(axis=(1, 2, 3)))


def test_downsample_matches_strided_splice():
    """Our reshape-mean must equal the reference's strided-splice-average
    (``build_featurizer.py:235-258``; golden test
    ``tests/test_build_featurizer.py:128-149``)."""
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((5, 12)).astype(np.float32)
    out = downsample_features(feats, 4)
    pc = 12 // 4
    splices = [feats[:, i::pc] for i in range(pc)]
    expect = np.mean(splices, axis=0)
    assert np.allclose(out, expect, atol=1e-6)


def test_downsample_errors():
    feats = np.zeros((2, 10), dtype=np.float32)
    with pytest.raises(ValueError):
        downsample_features(feats, 3)  # non-divisor
    with pytest.raises(ValueError):
        downsample_features(feats, 20)  # bigger than original


def test_autosample_resolution():
    # build_featurizer.py:261-299 contract
    assert check_downsampling_mismatch(True, 0, 512) == (True, 256)
    assert check_downsampling_mismatch(False, 128, 512) == (True, 128)
    assert check_downsampling_mismatch(False, 0, 512) == (False, 0)
    with pytest.raises(ValueError):
        check_downsampling_mismatch(True, 0, 511)


@pytest.mark.parametrize("depth,width", [(1, 128), (2, 64), (3, 64), (4, 32)])
def test_tinynet_widths(depth, width):
    m = build_featurizer("tinynet", depth=depth)
    x = np.zeros((2, 64, 64, 3), dtype=np.float32)
    assert featurize_data(m, x).shape == (2, width)


@pytest.mark.parametrize("depth,width", [(1, 512), (2, 512), (3, 384), (4, 384)])
def test_squeezenet_widths(depth, width):
    """Width table golden (``tests/test_build_featurizer.py:268-315``)."""
    m = build_featurizer("squeezenet", depth=depth)
    assert m.target_size == (227, 227)
    x = np.zeros((1, 227, 227, 3), dtype=np.float32)
    assert featurize_data(m, x).shape == (1, width)


def test_autosample_halves_width():
    m = build_featurizer("tinynet", depth=1, downsample=True)
    x = np.zeros((1, 64, 64, 3), dtype=np.float32)
    assert featurize_data(m, x).shape == (1, 64)


def test_deterministic_features():
    m1 = build_featurizer("tinynet")
    m2 = build_featurizer("tinynet")
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 64, 64, 3)).astype(np.float32)
    a, b = featurize_data(m1, x), featurize_data(m2, x)
    assert np.allclose(a, b, atol=1e-5)  # reference ATOL, enums.py:9
    assert not np.allclose(a[0], a[1], atol=1e-3)  # distinct inputs → distinct feats


def test_bad_shape_errors():
    m = build_featurizer("tinynet")
    with pytest.raises(ValueError):
        featurize_data(m, np.zeros((64, 64, 3), dtype=np.float32))
    with pytest.raises(ValueError):
        build_featurizer("nope")
    with pytest.raises(ValueError):
        build_featurizer("tinynet", depth=9)
