"""Embed actor-pool stage (SURVEY.md §2.3 T1–T8).

``EmbedActor`` is the stateful stage class passed to
``ds.map_batches(EmbedActor, fn_constructor_kwargs=..., concurrency=N,
batch_size=B)``: weights build ONCE per actor in ``__init__`` (the Ray
analog of the reference holding a Keras model as instance state,
``/root/reference/pic2vec/image_featurizer.py:151-163``), per-batch
work in ``__call__`` is fused decode → resize → normalize → CNN
forward → (optional splice-average downsample), emitting a
``features: fixed_size_list<float32>[F]`` column. Fusing decode into
the embed stage keeps the huge intermediate pixel tensors out of the
object store — only compact encoded bytes go in, compact feature
vectors come out (the design SURVEY.md §1.4 calls for).

Missing-row semantics match the reference exactly: failed/empty rows
become a zero tensor which the model still featurizes
(``data_featurizing.py:50-51`` predicts over the zero slices), so
missing rows carry the constant CNN(0) vector with ``missing=True``.
We compute that constant once per actor instead of re-running the net.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.image_ops import NORMALIZERS
from ..model.zoo import build_featurizer
from .decode import BatchDecoder


class EmbedActor:
    def __init__(self, model_str: str = "tinynet", depth: int = 1,
                 downsample: bool = False, num_pooled_features: int = 0,
                 bytes_col: str = "bytes", features_col: str = "features",
                 drop_bytes: bool = True, loaded_weights: str = ""):
        # custom weights load once per actor from shared storage — the
        # npz path rides the tiny fn_constructor_kwargs, not the batches
        self.model = build_featurizer(model_str, depth, downsample,
                                      num_pooled_features,
                                      loaded_weights=loaded_weights)
        self.normalize = NORMALIZERS[self.model.preprocessing]
        self.decoder = BatchDecoder(target_size=self.model.target_size)
        self.bytes_col = bytes_col
        self.features_col = features_col
        self.drop_bytes = drop_bytes
        h, w = self.model.target_size
        # reference parity: failed rows enter the model as RAW zeros — the
        # except branch returns np.zeros WITHOUT preprocessing
        # (feature_preprocessing.py:318-323), and preprocess_data zero-fills
        # AFTER normalization (stages/decode.py:107) — so the missing-row
        # constant is CNN(0), not CNN(normalize(0)).
        zero = np.zeros((1, h, w, 3), dtype=np.float32)
        self.zero_features = self.model(zero)[0]  # CNN(0): constant for missing rows
        self.num_features = self.model.num_features

    def _embed_bytes(self, byte_rows: list) -> tuple[np.ndarray, np.ndarray]:
        images, missing = self.decoder.decode_column(byte_rows)
        n = len(images)
        feats = np.empty((n, self.num_features), dtype=np.float32)
        feats[missing] = self.zero_features
        # exact within-batch dedup generalized to the featurize step:
        # identical decoded content runs the forward pass once.
        valid_idx = np.flatnonzero(~missing)
        if valid_idx.size:
            uniq: dict[int, int] = {}
            order: list[int] = []
            inverse = np.empty(valid_idx.size, dtype=np.int64)
            for pos, i in enumerate(valid_idx):
                key = id(images[i])  # dedup memo aliases repeated arrays
                if key not in uniq:
                    uniq[key] = len(order)
                    order.append(i)
                inverse[pos] = uniq[key]
            stack = np.stack([images[i] for i in order]).astype(np.float32)
            out = self.model(self.normalize(stack))
            feats[valid_idx] = out[inverse]
        return feats, missing

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, missing = self._embed_bytes(batch[self.bytes_col].to_pylist())
        out = batch.drop_columns([self.bytes_col]) if self.drop_bytes else batch
        out = out.append_column("missing", pa.array(missing))
        flat = pa.array(feats.ravel(), type=pa.float32())
        col = pa.FixedSizeListArray.from_arrays(flat, self.num_features)
        return out.append_column(self.features_col, col)
