"""Conformance CSV writer tests (header/naming parity with the reference
contract: ``{col}_missing, {col}_feat_i`` + robust naming)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from pic2vec_ray.pipelines.conformance import explode_features, robust_name, save_conformance_csv


def _df(n=4, width=8):
    rng = np.random.default_rng(0)
    return pd.DataFrame({
        "image_id": [f"img_{i:08d}" for i in range(n)],
        "caption": [f"cap {i}" for i in range(n)],
        "missing": [False, True, False, False][:n],
        "features": [rng.standard_normal(width).astype(np.float32) for _ in range(n)],
    })


def test_header_matches_reference_contract():
    out = explode_features(_df(), "images")
    # golden header shape: images_missing,images_feat_0..N-1
    # (mirrors tests/image_featurizer_testing/csv_checking/squeezenet_check_csv.csv:1)
    assert out.columns[0] == "images_missing"
    assert list(out.columns[1:]) == [f"images_feat_{i}" for i in range(8)]


def test_robust_naming_switches():
    kw = dict(model_str="squeezenet", depth=2, num_features=512, timestamp="2026-01-01-00-00-00")
    assert robust_name("out.csv", **kw) == \
        "out_squeezenet_depth-2_output-512_(2026-01-01-00-00-00).csv"
    assert robust_name("out.csv", omit_time=True, **{k: v for k, v in kw.items() if k != "timestamp"}) == \
        "out_squeezenet_depth-2_output-512.csv"
    assert robust_name("out.csv", omit_model=True, omit_depth=True, omit_output=True,
                       omit_time=True, **{k: v for k, v in kw.items() if k != "timestamp"}) == "out.csv"


def test_save_sorted_and_features_only(tmp_path):
    df = _df().sample(frac=1, random_state=7)  # shuffled input
    path = save_conformance_csv(df, str(tmp_path / "feats.csv"),
                                image_column_header="images", model_str="tinynet",
                                depth=1, save_features=True, omit_time=True)
    assert os.path.exists(path)
    back = pd.read_csv(path)
    assert back.image_id.tolist() == sorted(back.image_id)  # re-sorted by key
    assert back.columns[0] == "image_id"
    assert "images_missing" in back.columns and "images_feat_7" in back.columns
    assert bool(back.loc[back.image_id == "img_00000001", "images_missing"].iloc[0])
    feat_only = path.replace(".csv", "_features_only.csv")
    assert os.path.exists(feat_only)
    fo = pd.read_csv(feat_only)
    assert list(fo.columns[:2]) == ["image_id", "images_missing"]
