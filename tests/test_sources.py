"""Source operators (S1–S5) + ImageFeaturizer facade tests, mirroring
the reference's path-finder tests (tests/test_feature_preprocessing.py:67-124)
and error-path tests."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from pic2vec_ray.codecs.bmp import encode_bmp
from pic2vec_ray.codecs.png import encode_png
from pic2vec_ray.sources.ingest import (
    find_combined_image_paths,
    find_csv_image_paths,
    find_directory_image_paths,
    image_paths_finder,
    ingest_images,
    natural_sort_key,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)

    def img(seed):
        return rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)

    (d / "1.png").write_bytes(encode_png(img(1)))
    (d / "2.bmp").write_bytes(encode_bmp(img(2)))
    (d / "10.png").write_bytes(encode_png(img(10)))
    (d / "bad.gif").write_bytes(b"GIF89a" + b"\x00" * 32)  # rejected by whitelist
    (d / "notes.txt").write_bytes(b"not an image")
    csv = d / "list.csv"
    pd.DataFrame({
        "images": ["2.bmp", "absent.png", "1.png", ""],
        "derp": [1, 2, 3, 4],  # passthrough column like the reference fixture
    }).to_csv(csv, index=False)
    return d, csv


def test_natural_sort():
    names = ["10.png", "2.bmp", "1.png"]
    assert sorted(names, key=natural_sort_key) == ["1.png", "2.bmp", "10.png"]


def test_directory_source_whitelist_and_order(corpus):
    d, _ = corpus
    # gif + txt excluded; natural order 1 < 2 < 10
    assert find_directory_image_paths(str(d)) == ["1.png", "2.bmp", "10.png"]


def test_csv_source(corpus):
    d, csv = corpus
    got = find_csv_image_paths(str(csv), "images")
    assert got == ["2.bmp", "absent.png", "1.png", ""]
    with pytest.raises(ValueError, match="not found"):
        find_csv_image_paths(str(csv), "nope")


def test_combined_source_placeholders(corpus):
    d, csv = corpus
    got = find_combined_image_paths(str(d), str(csv), "images")
    # CSV order kept; non-members become ''
    assert got == ["2.bmp", "", "1.png", ""]


def test_combined_no_overlap_raises(corpus, tmp_path):
    d, _ = corpus
    bad = tmp_path / "bad.csv"
    pd.DataFrame({"images": ["x.png", "y.png"]}).to_csv(bad, index=False)
    with pytest.raises(ValueError, match="intersect"):
        find_combined_image_paths(str(d), str(bad), "images")


def test_dispatcher_requires_input():
    with pytest.raises(ValueError):
        image_paths_finder(None, None, None)


def test_ingest_dataset(ray_session, corpus):
    d, csv = corpus
    ds = ingest_images(str(d), str(csv), "images")
    df = ds.to_pandas()
    assert len(df) == 4
    # placeholder rows carry empty bytes
    assert (df.bytes.str.len() == 0).sum() == 2
    assert df.iloc[0].image_id == "2.bmp" and df.iloc[0].w == 16


def test_image_featurizer_facade_end_to_end(ray_session, corpus, tmp_path):
    from pic2vec_ray import ImageFeaturizer

    d, csv = corpus
    f = ImageFeaturizer(depth=1, model="tinynet")
    out = f.featurize("images", image_path=str(d), csv_path=str(csv))
    assert len(out) == 4
    assert "images_missing" in out.columns and "images_feat_127" in out.columns
    assert out.images_missing.sum() == 2  # the two placeholder rows
    path = f.save_csv(str(tmp_path / "out.csv"), omit_time=True, save_features=True)
    assert os.path.exists(path)
    header = open(path).readline()
    assert "images_missing" in header and "images_feat_0" in header


def test_facade_error_paths(ray_session):
    from pic2vec_ray import ImageFeaturizer

    f = ImageFeaturizer(model="tinynet")
    with pytest.raises(ValueError, match="load data"):
        f.featurize_preloaded_data()
    with pytest.raises(ValueError, match="featurize before saving"):
        f.save_csv("x.csv")
    with pytest.raises(ValueError):
        f.featurize("images")  # neither path given
    with pytest.raises(ValueError):
        ImageFeaturizer(model="nope")


def test_distributed_ingest_matches_driver_ingest(ray_session, corpus):
    """S1 scale path (read_binary_files + probe stage) must equal the
    driver-side ingest row-for-row on the same directory."""
    from pic2vec_ray.sources.ingest import ingest_images, ingest_images_distributed

    d, _ = corpus
    a = ingest_images(str(d)).to_pandas().sort_values("image_id").reset_index(drop=True)
    b = ingest_images_distributed(str(d)).to_pandas().sort_values("image_id").reset_index(drop=True)
    assert a.image_id.tolist() == b.image_id.tolist()
    for col in ("w", "h", "fmt", "phash"):
        assert a[col].tolist() == b[col].tolist(), col
    assert all(bytes(x) == bytes(y) for x, y in zip(a.bytes, b.bytes))
