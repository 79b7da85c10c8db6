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


@pytest.mark.parametrize("model", ["inceptionv3", "xception"])
def test_full_graph_forward_all_depths(model):
    """Round 2: full public graphs (all mixed blocks / entry-middle-exit
    flows). Every depth's cut layer must produce the reference golden
    width via a real forward pass (run at reduced spatial size — GAP
    makes the width spatial-size-invariant)."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 75, 75, 3)).astype(np.float32)
    feats = {}
    for depth, width in REFERENCE_WIDTHS[model].items():
        m = build_featurizer(model, depth=depth)
        f = m(x)
        assert f.shape == (2, width)
        assert np.isfinite(f).all()
        assert not np.allclose(f[0], f[1], atol=1e-3)
        feats[depth] = f
    # different depths cut at different layers → different features
    assert not np.allclose(feats[1][0, :728], feats[4][0, :728], atol=1e-3)


def test_inceptionv3_block_structure():
    """The full graph's weight set covers every published block."""
    from pic2vec_ray.model.zoo_extra import _inception_weights

    w = _inception_weights()
    # stem + 11 mixed blocks (0-10)
    for i in range(11):
        assert any(k.startswith(f"m{i}/") for k in w), f"mixed{i} missing"
    # expanded-filter-bank split convs exist in mixed9/10
    assert "m9/b3_2a" in w and "m10/bd_3b" in w
    # factorized 7x7 convs in mixed4-7
    assert w["m5/b7_2"].shape[:2] == (1, 7) and w["m5/b7_3"].shape[:2] == (7, 1)


def test_xception_block_structure():
    from pic2vec_ray.model.zoo_extra import _xception_weights

    w = _xception_weights()
    # entry (2,3,4) + middle (5..12) + exit (13,14)
    for blk in range(2, 15):
        assert any(k.startswith(f"b{blk}/") for k in w), f"block{blk} missing"
    for blk in (2, 3, 4, 13):
        assert f"b{blk}/res" in w  # residual projections on downsample blocks
    assert w["b14/s2/pw"].shape[-1] == 2048
