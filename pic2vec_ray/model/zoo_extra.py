"""The remaining reference model heads (SURVEY.md §2.3 T1: the registry
at ``/root/reference/pic2vec/build_featurizer.py:29-66`` covers six
CNNs). Implemented in numpy with deterministic seeded weights (the
pretrained blobs are unavailable here — see ``numpy_nn.he_init``).

Architecture fidelity by model:

- ``vgg16`` / ``vgg19``: faithful graphs (conv blocks 2-2-3-3-3 /
  2-2-4-4-4 at widths 64/128/256/512/512, 3x3 same convs, 2x2
  maxpools, then fc1/fc2 at 4096). Decapitation widths match the
  reference golden table (``tests/test_build_featurizer.py:268-315``):
  4096/4096/512/512.
- ``resnet50``: faithful bottleneck-stage graph (stages 3-4-6-3,
  widths 256/512/1024/2048) minus batch-norm (inference BN with
  pretrained statistics is an affine no-op under seeded weights; the
  cut-layer/width contract is what parity tests pin). All four depths
  cut inside stage 4 → width 2048 at every depth, per the golden table.
- ``inceptionv3`` / ``xception``: the FULL public graphs (round 2) —
  InceptionV3's stem + mixed0-10 blocks with the published branch
  structures (5×5, factorized 7×7, expanded 3×3 filter banks, pooled
  branches) and Xception's entry/middle/exit flows with residual
  projections and 8 identity-residual middle blocks. Batch-norm folds
  to an affine no-op under seeded weights (same note as resnet50);
  decapitation honors the reference's layer-pop tables at block
  boundaries — see the per-model comments for the pop-index →
  cut-layer derivation. Width tables (2048/2048/2048/1280 and
  2048/1024/728/728) match the reference goldens at every depth.
"""

from __future__ import annotations

import numpy as np
from numpy.lib.stride_tricks import sliding_window_view

from .numpy_nn import conv2d, he_init, maxpool2d, pad_same, relu

# ------------------------------------------------------------------- vgg


_VGG_BLOCKS = {
    "vgg16": (2, 2, 3, 3, 3),
    "vgg19": (2, 2, 4, 4, 4),
}
_VGG_WIDTHS = (64, 128, 256, 512, 512)


def _vgg_weights(name: str):
    w, cin = {}, 3
    for b, (reps, width) in enumerate(zip(_VGG_BLOCKS[name], _VGG_WIDTHS), 1):
        for r in range(1, reps + 1):
            w[f"b{b}c{r}/w"] = he_init((3, 3, cin, width), f"{name}/b{b}c{r}/w")
            w[f"b{b}c{r}/b"] = np.zeros(width, np.float32)
            cin = width
    w["fc1/w"] = he_init((7 * 7 * 512, 4096), f"{name}/fc1/w")
    w["fc1/b"] = np.zeros(4096, np.float32)
    w["fc2/w"] = he_init((4096, 4096), f"{name}/fc2/w")
    w["fc2/b"] = np.zeros(4096, np.float32)
    return w


def _make_vgg_forward(name: str):
    def forward(w, x, cut_layer):
        for b, (reps, _) in enumerate(zip(_VGG_BLOCKS[name], _VGG_WIDTHS), 1):
            for r in range(1, reps + 1):
                x = relu(conv2d(x, w[f"b{b}c{r}/w"], w[f"b{b}c{r}/b"], padding="same"))
                if cut_layer == f"b{b}c{r}":
                    return x
            x = maxpool2d(x, 2, 2)
            if cut_layer == f"b{b}pool":
                return x
        flat = x.reshape(x.shape[0], -1)
        fc1 = relu(flat @ w["fc1/w"] + w["fc1/b"])
        if cut_layer == "fc1":
            return fc1[:, None, None, :]  # (N,1,1,F) → GAP is identity
        fc2 = relu(fc1 @ w["fc2/w"] + w["fc2/b"])
        if cut_layer == "fc2":
            return fc2[:, None, None, :]
        raise AssertionError(f"cut layer {cut_layer} not reached")

    return forward


# --------------------------------------------------------------- resnet50

_RESNET_STAGES = [  # (stage, blocks, mid_width, out_width, first_stride)
    (2, 3, 64, 256, 1),
    (3, 4, 128, 512, 2),
    (4, 6, 256, 1024, 2),
    (5, 3, 512, 2048, 2),
]


def _resnet_weights():
    w = {"conv1/w": he_init((7, 7, 3, 64), "rn/conv1/w"),
         "conv1/b": np.zeros(64, np.float32)}
    cin = 64
    for stage, blocks, mid, out, _ in _RESNET_STAGES:
        for blk in range(1, blocks + 1):
            p = f"s{stage}b{blk}"
            w[f"{p}/c1/w"] = he_init((1, 1, cin, mid), f"rn/{p}/c1/w")
            w[f"{p}/c2/w"] = he_init((3, 3, mid, mid), f"rn/{p}/c2/w")
            w[f"{p}/c3/w"] = he_init((1, 1, mid, out), f"rn/{p}/c3/w")
            if blk == 1:
                w[f"{p}/proj/w"] = he_init((1, 1, cin, out), f"rn/{p}/proj/w")
            cin = out
    return w


def _resnet_forward(w, x, cut_layer):
    x = relu(conv2d(x, w["conv1/w"], w["conv1/b"], stride=2, padding="same"))
    x = maxpool2d(pad_same(x, 3, 3, 2, 2), 3, 2)
    for stage, blocks, mid, out, stride in _RESNET_STAGES:
        for blk in range(1, blocks + 1):
            p = f"s{stage}b{blk}"
            s = stride if blk == 1 else 1
            shortcut = conv2d(x, w[f"{p}/proj/w"], stride=s) if blk == 1 else x
            y = relu(conv2d(x, w[f"{p}/c1/w"], stride=s))
            y = relu(conv2d(y, w[f"{p}/c2/w"], padding="same"))
            y = conv2d(y, w[f"{p}/c3/w"])
            # scale the residual sum so activations stay bounded without
            # batch-norm statistics (see module docstring)
            x = relu((y + shortcut) * np.float32(0.5))
            if cut_layer == p:
                return x
    raise AssertionError(f"cut layer {cut_layer} not reached")


# ------------------------------------------------- depthwise + inception


def depthwise_conv2d(x, w, stride=1, padding="same"):
    """Per-channel 3x3 conv; w: (KH, KW, C)."""
    kh, kw, c = w.shape
    if padding == "same":
        x = pad_same(x, kh, kw, stride, stride)
    win = sliding_window_view(x, (kh, kw), axis=(1, 2))[:, ::stride, ::stride]
    return np.einsum("nhwcij,ijc->nhwc", win, w, optimize=True).astype(np.float32)


# --- InceptionV3: the full public graph (Szegedy et al. 2015; keras
# applications inception_v3). Every conv is conv→ReLU (inference
# batch-norm folds to an affine no-op under seeded weights — same
# disclosed simplification as resnet50 above). Blocks and widths follow
# the published architecture exactly: stem → mixed0-2 (35×35) →
# mixed3 (reduction) → mixed4-7 (17×17) → mixed8 (reduction) →
# mixed9-10 (8×8). Decapitation honors the reference's layer-pop table
# (/root/reference/pic2vec/build_featurizer.py:40: {1:2, 2:19, 3:33,
# 4:50}) at block boundaries: pop 2 → mixed10 (2048); pop 33 ends the
# whole mixed10 block → mixed9 (2048); pop 19 lands on mixed10's
# branch-pool AveragePooling2D, i.e. pool3×3(mixed9) (2048); pop 50
# lands on mixed9's branch-pool pooling of mixed8 → pool3×3(mixed8)
# (1280). Widths match the reference goldens
# (tests/test_build_featurizer.py:301-306).


def _inception_weights():
    w = {}

    def add(name, kh, kw, cin, cout):
        w[name] = he_init((kh, kw, cin, cout), f"iv3/{name}")
        return cout

    add("stem/c1", 3, 3, 3, 32)
    add("stem/c2", 3, 3, 32, 32)
    add("stem/c3", 3, 3, 32, 64)
    add("stem/c4", 1, 1, 64, 80)
    add("stem/c5", 3, 3, 80, 192)
    cin = 192
    for i, pool_w in ((0, 32), (1, 64), (2, 64)):  # mixed0-2 → 256/288/288
        add(f"m{i}/b1", 1, 1, cin, 64)
        add(f"m{i}/b5_1", 1, 1, cin, 48)
        add(f"m{i}/b5_2", 5, 5, 48, 64)
        add(f"m{i}/bd_1", 1, 1, cin, 64)
        add(f"m{i}/bd_2", 3, 3, 64, 96)
        add(f"m{i}/bd_3", 3, 3, 96, 96)
        add(f"m{i}/bp", 1, 1, cin, pool_w)
        cin = 64 + 64 + 96 + pool_w
    add("m3/b3", 3, 3, cin, 384)
    add("m3/bd_1", 1, 1, cin, 64)
    add("m3/bd_2", 3, 3, 64, 96)
    add("m3/bd_3", 3, 3, 96, 96)
    cin = 384 + 96 + cin  # + maxpool passthrough → 768
    for i, mid in ((4, 128), (5, 160), (6, 160), (7, 192)):  # 17×17 → 768
        add(f"m{i}/b1", 1, 1, cin, 192)
        add(f"m{i}/b7_1", 1, 1, cin, mid)
        add(f"m{i}/b7_2", 1, 7, mid, mid)
        add(f"m{i}/b7_3", 7, 1, mid, 192)
        add(f"m{i}/bd_1", 1, 1, cin, mid)
        add(f"m{i}/bd_2", 7, 1, mid, mid)
        add(f"m{i}/bd_3", 1, 7, mid, mid)
        add(f"m{i}/bd_4", 7, 1, mid, mid)
        add(f"m{i}/bd_5", 1, 7, mid, 192)
        add(f"m{i}/bp", 1, 1, cin, 192)
        cin = 768
    add("m8/b3_1", 1, 1, cin, 192)
    add("m8/b3_2", 3, 3, 192, 320)
    add("m8/b7_1", 1, 1, cin, 192)
    add("m8/b7_2", 1, 7, 192, 192)
    add("m8/b7_3", 7, 1, 192, 192)
    add("m8/b7_4", 3, 3, 192, 192)
    cin = 320 + 192 + 768  # + maxpool passthrough → 1280
    for i in (9, 10):  # 8×8 → 2048
        add(f"m{i}/b1", 1, 1, cin, 320)
        add(f"m{i}/b3_1", 1, 1, cin, 384)
        add(f"m{i}/b3_2a", 1, 3, 384, 384)
        add(f"m{i}/b3_2b", 3, 1, 384, 384)
        add(f"m{i}/bd_1", 1, 1, cin, 448)
        add(f"m{i}/bd_2", 3, 3, 448, 384)
        add(f"m{i}/bd_3a", 1, 3, 384, 384)
        add(f"m{i}/bd_3b", 3, 1, 384, 384)
        add(f"m{i}/bp", 1, 1, cin, 192)
        cin = 320 + 768 + 768 + 192
    return w


def _inception_forward(w, x, cut_layer):
    from .numpy_nn import avgpool2d

    def c(name, t, stride=1, padding="same"):
        return relu(conv2d(t, w[name], stride=stride, padding=padding))
    x = c("stem/c1", x, stride=2, padding="valid")
    x = c("stem/c2", x, padding="valid")
    x = c("stem/c3", x, padding="same")
    x = maxpool2d(x, 3, 2)
    x = c("stem/c4", x, padding="valid")
    x = c("stem/c5", x, padding="valid")
    x = maxpool2d(x, 3, 2)
    for i in (0, 1, 2):  # 35×35 inception-A
        b1 = c(f"m{i}/b1", x)
        b5 = c(f"m{i}/b5_2", c(f"m{i}/b5_1", x))
        bd = c(f"m{i}/bd_3", c(f"m{i}/bd_2", c(f"m{i}/bd_1", x)))
        bp = c(f"m{i}/bp", avgpool2d(x, 3))
        x = np.concatenate([b1, b5, bd, bp], axis=-1)
    # mixed3: 17×17 reduction
    b3 = c("m3/b3", x, stride=2, padding="valid")
    bd = c("m3/bd_3", c("m3/bd_2", c("m3/bd_1", x)), stride=2, padding="valid")
    x = np.concatenate([b3, bd, maxpool2d(x, 3, 2)], axis=-1)
    for i in (4, 5, 6, 7):  # 17×17 inception-B (factorized 7×7)
        b1 = c(f"m{i}/b1", x)
        b7 = c(f"m{i}/b7_3", c(f"m{i}/b7_2", c(f"m{i}/b7_1", x)))
        bd = x
        for part in ("bd_1", "bd_2", "bd_3", "bd_4", "bd_5"):
            bd = c(f"m{i}/{part}", bd)
        bp = c(f"m{i}/bp", avgpool2d(x, 3))
        x = np.concatenate([b1, b7, bd, bp], axis=-1)
    # mixed8: 8×8 reduction
    b3 = c("m8/b3_2", c("m8/b3_1", x), stride=2, padding="valid")
    b7 = c("m8/b7_4", c("m8/b7_3", c("m8/b7_2", c("m8/b7_1", x))),
           stride=2, padding="valid")
    x = np.concatenate([b3, b7, maxpool2d(x, 3, 2)], axis=-1)
    if cut_layer == "mixed8_pool":  # depth 4: pop-50 ≙ pool3×3(mixed8)
        return avgpool2d(x, 3)
    for i in (9, 10):  # 8×8 inception-C (expanded filter banks)
        if i == 10 and cut_layer == "mixed9_pool":  # depth 2: pop-19
            return avgpool2d(x, 3)
        b1 = c(f"m{i}/b1", x)
        b3 = c(f"m{i}/b3_1", x)
        b3 = np.concatenate([c(f"m{i}/b3_2a", b3), c(f"m{i}/b3_2b", b3)], axis=-1)
        bd = c(f"m{i}/bd_2", c(f"m{i}/bd_1", x))
        bd = np.concatenate([c(f"m{i}/bd_3a", bd), c(f"m{i}/bd_3b", bd)], axis=-1)
        bp = c(f"m{i}/bp", avgpool2d(x, 3))
        x = np.concatenate([b1, b3, bd, bp], axis=-1)
        if cut_layer == f"mixed{i}":
            return x
    raise AssertionError(f"cut layer {cut_layer} not reached")


# --- Xception: the full public graph (Chollet 2017; keras applications
# xception): entry flow (stem + 3 residual-downsample blocks), 8
# identity-residual middle blocks, exit flow. Separable convs are
# depthwise 3×3 → pointwise; batch-norm folds out as above.
# Decapitation honors the reference table (build_featurizer.py:62:
# {1:1, 2:8, 3:18, 4:28}): pop 1 → block14_sepconv2_act (2048); pop 8
# removes block14 → end of block13 (1024); pop 18 removes block13 →
# end of block12 (728); pop 28 → end of block11 (728). Widths match
# the reference goldens (tests/test_build_featurizer.py:309+).


def _sepconv_w(w, name, cin, cout):
    w[f"{name}/dw"] = he_init((3, 3, cin), f"xc/{name}/dw")
    w[f"{name}/pw"] = he_init((1, 1, cin, cout), f"xc/{name}/pw")
    return cout


def _xception_weights():
    w = {"stem/c1": he_init((3, 3, 3, 32), "xc/stem/c1"),
         "stem/c2": he_init((3, 3, 32, 64), "xc/stem/c2")}
    cin = 64
    for blk, width in ((2, 128), (3, 256), (4, 728)):
        _sepconv_w(w, f"b{blk}/s1", cin, width)
        _sepconv_w(w, f"b{blk}/s2", width, width)
        w[f"b{blk}/res"] = he_init((1, 1, cin, width), f"xc/b{blk}/res")
        cin = width
    for blk in range(5, 13):  # middle flow: blocks 5..12
        for s in (1, 2, 3):
            _sepconv_w(w, f"b{blk}/s{s}", 728, 728)
    _sepconv_w(w, "b13/s1", 728, 728)
    _sepconv_w(w, "b13/s2", 728, 1024)
    w["b13/res"] = he_init((1, 1, 728, 1024), "xc/b13/res")
    _sepconv_w(w, "b14/s1", 1024, 1536)
    _sepconv_w(w, "b14/s2", 1536, 2048)
    return w


def _sep(w, x, name, stride=1):
    x = depthwise_conv2d(x, w[f"{name}/dw"], stride=stride)
    return conv2d(x, w[f"{name}/pw"])


def _xception_forward(w, x, cut_layer):
    x = relu(conv2d(x, w["stem/c1"], stride=2, padding="valid"))
    x = relu(conv2d(x, w["stem/c2"], padding="valid"))
    for blk in (2, 3, 4):  # entry flow residual-downsample blocks
        res = conv2d(x, w[f"b{blk}/res"], stride=2)
        y = _sep(w, x if blk == 2 else relu(x), f"b{blk}/s1")
        y = _sep(w, relu(y), f"b{blk}/s2")
        y = maxpool2d(pad_same(y, 3, 3, 2, 2), 3, 2)
        # bounded residual sum without batch-norm statistics (see
        # resnet50 note above)
        x = (y + res) * np.float32(0.5)
    for blk in range(5, 13):  # middle flow: 8 identity-residual blocks
        y = x
        for s in (1, 2, 3):
            y = _sep(w, relu(y), f"b{blk}/s{s}")
        x = (y + x) * np.float32(0.5)
        if cut_layer == f"block{blk}":
            return x
    res = conv2d(x, w["b13/res"], stride=2)
    y = _sep(w, relu(x), "b13/s1")
    y = _sep(w, relu(y), "b13/s2")
    y = maxpool2d(pad_same(y, 3, 3, 2, 2), 3, 2)
    x = (y + res) * np.float32(0.5)
    if cut_layer == "block13":
        return x
    x = relu(_sep(w, x, "b14/s1"))
    x = relu(_sep(w, x, "b14/s2"))
    if cut_layer == "block14_sepconv2_act":
        return x
    raise AssertionError(f"cut layer {cut_layer} not reached")


EXTRA_MODELS = {
    "vgg16": {
        "target_size": (224, 224),
        "preprocessing": "caffe",
        "forward": _make_vgg_forward("vgg16"),
        "build_weights": lambda: _vgg_weights("vgg16"),
        "depth_to_layer": {1: "fc2", 2: "fc1", 3: "b5pool", 4: "b5c3"},
        "widths": {1: 4096, 2: 4096, 3: 512, 4: 512},
    },
    "vgg19": {
        "target_size": (224, 224),
        "preprocessing": "caffe",
        "forward": _make_vgg_forward("vgg19"),
        "build_weights": lambda: _vgg_weights("vgg19"),
        "depth_to_layer": {1: "fc2", 2: "fc1", 3: "b5pool", 4: "b5c4"},
        "widths": {1: 4096, 2: 4096, 3: 512, 4: 512},
    },
    "resnet50": {
        "target_size": (224, 224),
        "preprocessing": "caffe",
        "forward": _resnet_forward,
        "build_weights": _resnet_weights,
        # all four depths sit inside stage 5 → 2048 everywhere
        # (reference golden: resnet50 2048 at all depths)
        "depth_to_layer": {1: "s5b3", 2: "s5b2", 3: "s5b1", 4: "s5b1"},
        "widths": {1: 2048, 2: 2048, 3: 2048, 4: 2048},
    },
    "inceptionv3": {
        "target_size": (299, 299),
        "preprocessing": "tf",
        "forward": _inception_forward,
        "build_weights": _inception_weights,
        # pop-table equivalents (build_featurizer.py:40): 2→mixed10,
        # 19→pool3×3(mixed9), 33→mixed9, 50→pool3×3(mixed8)
        "depth_to_layer": {1: "mixed10", 2: "mixed9_pool", 3: "mixed9",
                           4: "mixed8_pool"},
        "widths": {1: 2048, 2: 2048, 3: 2048, 4: 1280},
    },
    "xception": {
        "target_size": (299, 299),
        "preprocessing": "tf",
        "forward": _xception_forward,
        "build_weights": _xception_weights,
        # pop-table equivalents (build_featurizer.py:62): 1→block14
        # sepconv2 act, 8→end block13, 18→end block12, 28→end block11
        "depth_to_layer": {1: "block14_sepconv2_act", 2: "block13",
                           3: "block12", 4: "block11"},
        "widths": {1: 2048, 2: 1024, 3: 728, 4: 728},
    },
}
