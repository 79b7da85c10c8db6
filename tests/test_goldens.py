"""Committed golden-feature conformance (FIXTURES.md T4, mirroring the
reference's golden-array tests ``tests/test_image_featurizer.py:356-399``):
the full decode→preprocess→embed path must reproduce the committed
vectors bit-for-bit within atol=1e-5 (reference ATOL, enums.py:9).
Regenerate with ``python tools/make_goldens.py`` ONLY on intentional
semantic changes."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pic2vec_ray.fixtures.synth import make_image_row
from pic2vec_ray.stages.embed import EmbedActor

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _unit_table() -> pa.Table:
    rows = [make_image_row(k, f"caption {k}") for k in range(1, 25)]
    return pa.table({name: [r[name] for r in rows] for name in
                     ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")})


@pytest.mark.parametrize("model,depth", [("tinynet", 1), ("squeezenet", 1), ("tinynet", 3)])
def test_features_match_committed_goldens(model, depth):
    golden = pq.read_table(os.path.join(GOLDEN_DIR, f"features_golden_{model}_{depth}.parquet"))
    actor = EmbedActor(model_str=model, depth=depth)
    out = actor(_unit_table())
    assert out["image_id"].to_pylist() == golden["image_id"].to_pylist()
    assert out["missing"].to_pylist() == golden["missing"].to_pylist()
    got = np.stack([np.asarray(f) for f in out["features"].to_pylist()])
    exp = np.stack([np.asarray(f) for f in golden["features"].to_pylist()])
    assert np.allclose(got, exp, atol=1e-5)
