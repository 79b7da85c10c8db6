"""Extended model-zoo tests: the reference's six-model registry
(``build_featurizer.py:29-66``) with the golden width table
(``tests/test_build_featurizer.py:268-315``)."""

from __future__ import annotations

import numpy as np
import pytest

from pic2vec_ray.model.zoo import MODEL_REGISTRY, build_featurizer, validate_config

REFERENCE_WIDTHS = {
    "squeezenet": {1: 512, 2: 512, 3: 384, 4: 384},
    "vgg16": {1: 4096, 2: 4096, 3: 512, 4: 512},
    "vgg19": {1: 4096, 2: 4096, 3: 512, 4: 512},
    "resnet50": {1: 2048, 2: 2048, 3: 2048, 4: 2048},
    "inceptionv3": {1: 2048, 2: 2048, 3: 2048, 4: 1280},
    "xception": {1: 2048, 2: 1024, 3: 728, 4: 728},
}

REFERENCE_SIZES = {
    "squeezenet": (227, 227), "vgg16": (224, 224), "vgg19": (224, 224),
    "resnet50": (224, 224), "inceptionv3": (299, 299), "xception": (299, 299),
}

REFERENCE_PREPROCESSING = {
    "squeezenet": "caffe", "vgg16": "caffe", "vgg19": "caffe",
    "resnet50": "caffe", "inceptionv3": "tf", "xception": "tf",
}


def test_all_reference_models_registered():
    assert set(REFERENCE_WIDTHS).issubset(set(MODEL_REGISTRY))


@pytest.mark.parametrize("model", sorted(REFERENCE_WIDTHS))
def test_width_table_and_config(model):
    for depth, width in REFERENCE_WIDTHS[model].items():
        assert validate_config(model, depth) == width
    assert MODEL_REGISTRY[model]["target_size"] == REFERENCE_SIZES[model]
    assert MODEL_REGISTRY[model]["preprocessing"] == REFERENCE_PREPROCESSING[model]
    # autosample halves (even widths only — the reference contract)
    w1 = REFERENCE_WIDTHS[model][1]
    assert validate_config(model, 1, downsample=True) == w1 // 2


@pytest.mark.parametrize("model,depth", [
    ("resnet50", 1), ("resnet50", 4),
    ("xception", 1), ("xception", 4),
    ("inceptionv3", 4),
])
def test_forward_shapes_fast_models(model, depth):
    m = build_featurizer(model, depth=depth)
    h, w = m.target_size
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, h, w, 3)).astype(np.float32)
    f = m(x)
    assert f.shape == (2, REFERENCE_WIDTHS[model][depth])
    assert np.isfinite(f).all()
    # distinct inputs produce distinct features
    assert not np.allclose(f[0], f[1], atol=1e-3)


def test_vgg16_conv_cut_forward():
    m = build_featurizer("vgg16", depth=3)  # conv-side cut, cheaper than fc
    x = np.random.default_rng(1).standard_normal((1, 224, 224, 3)).astype(np.float32)
    f = m(x)
    assert f.shape == (1, 512) and np.isfinite(f).all()
