"""Model zoo: featurizer heads runnable in pure numpy.

Mirrors the reference registry (``/root/reference/pic2vec/build_featurizer.py:29-66``,
``enums.py:6``) and its lifecycle: initialize → decapitate at a named
depth → GlobalAvgPool → optional splice-average downsample
(``build_featurizer.py:302-379``).

- ``squeezenet``: the full SqueezeNet v1.0 graph (Iandola et al. 2016;
  the reference vendors the same public architecture at
  ``/root/reference/pic2vec/squeezenet.py:65-145``) — conv1 7x7/2 →
  maxpool → fire2..fire9 with maxpools after fire3 and fire7 (pool
  placement per keras-squeezenet), decapitation depths 1..4 cutting
  after fire9/fire8/fire7/fire6 giving widths 512/512/384/384
  (golden table ``tests/test_build_featurizer.py:268-315``).
- ``tinynet``: a small conv net (64x64 input, width map 128/128/64/32)
  used as the default/bench head so the full pipeline stays
  compute-light in the CPU-only sandbox; same decapitation/pooling
  semantics.

Weights are deterministic seeded He-init (see ``numpy_nn.he_init`` for
why pretrained blobs are unavailable here).
"""

from __future__ import annotations

import numpy as np

from .numpy_nn import conv2d, downsample_features, global_avg_pool, he_init, maxpool2d, relu


class FeaturizerModel:
    """A decapitated featurizer: callable (N,H,W,3) float32 → (N,F) float32.

    ``weights`` (optional) replaces the seeded He-init blobs with a
    user-supplied ``{layer_name: array}`` dict — the custom-weights
    hook (reference ``build_featurizer.py:90-97``: build with
    ``weights=None`` then ``load_weights(path)``). Keys and shapes are
    validated against the architecture up front so a mismatched file
    fails at build time on the driver, not at the first batch inside
    an actor.
    """

    def __init__(self, name: str, depth: int = 1, downsample: bool = False,
                 num_pooled_features: int = 0,
                 weights: dict[str, np.ndarray] | None = None):
        from .numpy_nn import check_downsampling_mismatch

        spec = MODEL_REGISTRY.get(name)
        if spec is None:
            raise ValueError(f"unknown model {name!r}; choose from {sorted(MODEL_REGISTRY)}")
        if depth not in (1, 2, 3, 4):
            raise ValueError("depth must be in 1..4")
        self.name = name
        self.depth = depth
        self.target_size = spec["target_size"]
        self.preprocessing = spec["preprocessing"]
        self.cut_layer = spec["depth_to_layer"][depth]
        self._forward = spec["forward"]
        self._weights = spec["build_weights"]()
        if weights is not None:
            self._weights = _validated_weights(name, self._weights, weights)
        base_width = spec["widths"][depth]
        self.downsample, self.num_pooled_features = check_downsampling_mismatch(
            downsample, num_pooled_features, base_width
        )
        self.num_features = self.num_pooled_features if self.downsample else base_width

    # forward in sub-chunks so conv im2col intermediates stay
    # cache-resident (measured +10-20% under multi-actor concurrency)
    FORWARD_CHUNK = 16

    def __call__(self, batch: np.ndarray) -> np.ndarray:
        if batch.ndim != 4:
            raise ValueError(f"expected (N,H,W,C) batch, got shape {batch.shape}")
        outs = []
        for i in range(0, len(batch), self.FORWARD_CHUNK):
            chunk = batch[i : i + self.FORWARD_CHUNK]
            outs.append(global_avg_pool(self._forward(self._weights, chunk, self.cut_layer)))
        feats = outs[0] if len(outs) == 1 else np.concatenate(outs, axis=0)
        if self.downsample:
            feats = downsample_features(feats, self.num_pooled_features)
        return feats.astype(np.float32)


# ---------------------------------------------------------------- squeezenet

_FIRES = [  # (layer_name, squeeze, expand) — SqueezeNet v1.0
    ("fire2", 16, 64),
    ("fire3", 16, 64),
    ("fire4", 32, 128),
    ("fire5", 32, 128),
    ("fire6", 48, 192),
    ("fire7", 48, 192),
    ("fire8", 64, 256),
    ("fire9", 64, 256),
]


def _squeezenet_weights() -> dict[str, np.ndarray]:
    w = {
        "conv1/w": he_init((7, 7, 3, 96), "sq/conv1/w"),
        "conv1/b": np.zeros(96, np.float32),
    }
    cin = 96
    for name, s, e in _FIRES:
        w[f"{name}/sq/w"] = he_init((1, 1, cin, s), f"sq/{name}/sq/w")
        w[f"{name}/sq/b"] = np.zeros(s, np.float32)
        w[f"{name}/e1/w"] = he_init((1, 1, s, e), f"sq/{name}/e1/w")
        w[f"{name}/e1/b"] = np.zeros(e, np.float32)
        w[f"{name}/e3/w"] = he_init((3, 3, s, e), f"sq/{name}/e3/w")
        w[f"{name}/e3/b"] = np.zeros(e, np.float32)
        cin = 2 * e
    return w


def _fire(w: dict, x: np.ndarray, name: str) -> np.ndarray:
    s = relu(conv2d(x, w[f"{name}/sq/w"], w[f"{name}/sq/b"]))
    e1 = relu(conv2d(s, w[f"{name}/e1/w"], w[f"{name}/e1/b"]))
    e3 = relu(conv2d(s, w[f"{name}/e3/w"], w[f"{name}/e3/b"], padding="same"))
    return np.concatenate([e1, e3], axis=-1)


def _squeezenet_forward(w: dict, x: np.ndarray, cut_layer: str) -> np.ndarray:
    x = relu(conv2d(x, w["conv1/w"], w["conv1/b"], stride=2))
    x = maxpool2d(x, 3, 2)
    for name, _, _ in _FIRES:
        x = _fire(w, x, name)
        if name == cut_layer:
            return x
        if name in ("fire3", "fire7"):
            x = maxpool2d(x, 3, 2)
    raise AssertionError(f"cut layer {cut_layer} not reached")


# ------------------------------------------------------------------ tinynet

_TINY_LAYERS = [  # (name, kernel, stride, out_channels, padding)
    ("conv1", 3, 2, 32, "same"),
    ("conv2", 3, 2, 64, "same"),
    ("conv3", 3, 1, 64, "same"),
    ("conv4", 1, 1, 128, "valid"),
]


def _tinynet_weights() -> dict[str, np.ndarray]:
    w, cin = {}, 3
    for name, k, _, cout, _ in _TINY_LAYERS:
        w[f"{name}/w"] = he_init((k, k, cin, cout), f"tiny/{name}/w")
        w[f"{name}/b"] = np.zeros(cout, np.float32)
        cin = cout
    return w


def _tinynet_forward(w: dict, x: np.ndarray, cut_layer: str) -> np.ndarray:
    for name, _, stride, _, padding in _TINY_LAYERS:
        x = relu(conv2d(x, w[f"{name}/w"], w[f"{name}/b"], stride=stride, padding=padding))
        if name == cut_layer:
            return x
        if name == "conv3":
            x = maxpool2d(x, 2, 2)
    raise AssertionError(f"cut layer {cut_layer} not reached")


def _extra_models() -> dict:
    from .zoo_extra import EXTRA_MODELS

    return EXTRA_MODELS


MODEL_REGISTRY: dict[str, dict] = {
    "squeezenet": {
        "target_size": (227, 227),  # SIZE_DICT, image_featurizer.py:70-71
        "preprocessing": "caffe",  # feature_preprocessing.py:37-63
        "forward": _squeezenet_forward,
        "build_weights": _squeezenet_weights,
        # depth → cut layer; widths match tests/test_build_featurizer.py:268-315
        "depth_to_layer": {1: "fire9", 2: "fire8", 3: "fire7", 4: "fire6"},
        "widths": {1: 512, 2: 512, 3: 384, 4: 384},
    },
    "tinynet": {
        "target_size": (64, 64),
        "preprocessing": "tf",
        "forward": _tinynet_forward,
        "build_weights": _tinynet_weights,
        "depth_to_layer": {1: "conv4", 2: "conv3", 3: "conv2", 4: "conv1"},
        "widths": {1: 128, 2: 64, 3: 64, 4: 32},
    },
}
MODEL_REGISTRY.update(_extra_models())


def validate_config(model_str: str, depth: int = 1, downsample: bool = False,
                    num_pooled_features: int = 0) -> int:
    """Eager driver-side config validation (no weight build).

    Actor ``__init__`` exceptions only surface at the first batch as an
    ActorDiedError; pipelines call this up front so a bad model name,
    depth or non-divisor downsample errors immediately. Returns the
    resulting feature width.
    """
    from .numpy_nn import check_downsampling_mismatch, downsample_features
    import numpy as np

    spec = MODEL_REGISTRY.get(model_str)
    if spec is None:
        raise ValueError(f"unknown model {model_str!r}; choose from {sorted(MODEL_REGISTRY)}")
    if depth not in (1, 2, 3, 4):
        raise ValueError("depth must be in 1..4")
    base = spec["widths"][depth]
    ds_on, n = check_downsampling_mismatch(downsample, num_pooled_features, base)
    if ds_on:
        downsample_features(np.zeros((1, base), np.float32), n)  # divisor check
        return n
    return base


def _validated_weights(name: str, expected: dict[str, np.ndarray],
                       supplied: dict) -> dict[str, np.ndarray]:
    """Validate a user weight dict against the architecture's canonical
    layout (every layer present, every shape exact) — the analog of
    Keras ``load_weights`` raising on a mismatched file (reference
    ``tests/test_build_featurizer.py:187-223``)."""
    missing = sorted(set(expected) - set(supplied))
    if missing:
        raise ValueError(f"weights for {name!r} missing layers: {missing[:5]}"
                         f"{'...' if len(missing) > 5 else ''}")
    out = {}
    for key, ref in expected.items():
        arr = np.asarray(supplied[key], dtype=np.float32)
        if arr.shape != ref.shape:
            raise ValueError(
                f"weight {key!r} for {name!r} has shape {arr.shape}, "
                f"architecture expects {ref.shape}")
        out[key] = arr
    return out


def save_weights_npz(model: FeaturizerModel, path: str) -> None:
    """Persist a model's weights as a portable ``.npz`` (one array per
    layer key) — the save half of the custom-weights hook."""
    np.savez(path, **model._weights)


def load_weights_npz(path: str) -> dict[str, np.ndarray]:
    """``.npz`` weight file → ``{layer_name: array}`` dict."""
    try:
        with np.load(path) as npz:
            return {k: npz[k] for k in npz.files}
    except (OSError, ValueError) as err:
        raise IOError(f"problem loading custom weights from {path!r}: {err}") from err


def build_featurizer(model_str: str = "squeezenet", depth: int = 1,
                     downsample: bool = False, num_pooled_features: int = 0,
                     loaded_weights: str = "",
                     loaded_model: FeaturizerModel | None = None) -> FeaturizerModel:
    """Assembly entry point (T7, ``build_featurizer.py:302-379``).

    ``loaded_weights``: path to an ``.npz`` weight file (keys/shapes
    validated against the architecture; bad files raise at build time)
    — parity with the reference's custom-weights path
    (``build_featurizer.py:90-97``). ``loaded_model``: a pre-built
    :class:`FeaturizerModel` whose weights are reused while the
    requested depth/downsampling is (re)applied — parity with the
    reference's ``loaded_model`` (``build_featurizer.py:306,340-342``,
    which re-decapitates the supplied model).
    """
    if loaded_model is not None:
        if not isinstance(loaded_model, FeaturizerModel):
            raise TypeError("loaded_model must be a FeaturizerModel")
        return FeaturizerModel(loaded_model.name, depth, downsample,
                               num_pooled_features, weights=loaded_model._weights)
    weights = load_weights_npz(loaded_weights) if loaded_weights else None
    return FeaturizerModel(model_str, depth, downsample, num_pooled_features,
                           weights=weights)


def featurize_data(model: FeaturizerModel, array: np.ndarray) -> np.ndarray:
    """Inference over a 4-D batch (T8, ``data_featurizing.py:21-55``)."""
    if array.ndim != 4:
        raise ValueError(f"Data must be 4D (N,H,W,C); got {array.ndim}D")
    return model(array)
