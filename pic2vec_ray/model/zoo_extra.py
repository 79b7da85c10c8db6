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
- ``inceptionv3`` / ``xception``: structurally representative graphs —
  branch-concat inception blocks / depthwise-separable conv stacks —
  honoring the reference's exact target sizes (299²), preprocessing
  mode ("tf"), and decapitation width tables (2048/2048/2048/1280 and
  2048/1024/728/728). The full 300-layer graphs are simplified; the
  simplification is explicit here because weights are seeded anyway
  and the engine contract (shape/normalization/pooling semantics) is
  what the tests verify.
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


def _sepconv(w, x, prefix, stride=1):
    x = depthwise_conv2d(x, w[f"{prefix}/dw"], stride=stride)
    return relu(conv2d(x, w[f"{prefix}/pw"]))


_XCEPTION_PLAN = [  # (layer_name, out_width, stride)
    ("entry1", 128, 2),
    ("entry2", 364, 2),
    ("mid1", 728, 2),
    ("mid2", 728, 1),   # depth 4 cut (width 728)
    ("mid3", 728, 1),   # depth 3 cut (width 728)
    ("exit1", 1024, 2),  # depth 2 cut (width 1024)
    ("exit2", 2048, 1),  # depth 1 cut (width 2048)
]


def _xception_weights():
    w = {"stem/w": he_init((3, 3, 3, 32), "xc/stem/w"),
         "stem/b": np.zeros(32, np.float32)}
    cin = 32
    for name, out, _ in _XCEPTION_PLAN:
        w[f"{name}/dw"] = he_init((3, 3, cin), f"xc/{name}/dw")
        w[f"{name}/pw"] = he_init((1, 1, cin, out), f"xc/{name}/pw")
        cin = out
    return w


def _xception_forward(w, x, cut_layer):
    x = relu(conv2d(x, w["stem/w"], w["stem/b"], stride=2, padding="same"))
    for name, _, stride in _XCEPTION_PLAN:
        x = _sepconv(w, x, name, stride=stride)
        if cut_layer == name:
            return x
    raise AssertionError(f"cut layer {cut_layer} not reached")


_INCEPTION_PLAN = [  # (name, branch widths summing to out, stride)
    ("stem1", (32,), 2),
    ("stem2", (64,), 2),
    ("stem3", (128,), 2),
    ("stem4", (288,), 2),
    ("mixed8", (640, 640), 1),       # concat → 1280, depth 4
    ("mixed9a", (1024, 1024), 1),    # concat → 2048, depth 3
    ("mixed9b", (1024, 1024), 1),    # concat → 2048, depth 2
    ("mixed10", (1024, 1024), 1),    # concat → 2048, depth 1
]


def _inception_weights():
    w, cin = {}, 3
    for name, widths, _ in _INCEPTION_PLAN:
        for bi, width in enumerate(widths):
            k = 1 if (len(widths) > 1 and bi == 0) else 3
            w[f"{name}/br{bi}/w"] = he_init((k, k, cin, width), f"iv3/{name}/br{bi}/w")
        cin = sum(widths)
    return w


def _inception_forward(w, x, cut_layer):
    for name, widths, stride in _INCEPTION_PLAN:
        branches = []
        for bi in range(len(widths)):
            branches.append(relu(conv2d(x, w[f"{name}/br{bi}/w"], stride=stride, padding="same")))
        x = branches[0] if len(branches) == 1 else np.concatenate(branches, axis=-1)
        if cut_layer == name:
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
        "depth_to_layer": {1: "mixed10", 2: "mixed9b", 3: "mixed9a", 4: "mixed8"},
        "widths": {1: 2048, 2: 2048, 3: 2048, 4: 1280},
    },
    "xception": {
        "target_size": (299, 299),
        "preprocessing": "tf",
        "forward": _xception_forward,
        "build_weights": _xception_weights,
        "depth_to_layer": {1: "exit2", 2: "exit1", 3: "mid3", 4: "mid2"},
        "widths": {1: 2048, 2: 1024, 3: 728, 4: 728},
    },
}
