"""End-to-end featurize pipeline tests (SURVEY.md §7.5 minimum slice)."""

from __future__ import annotations

import numpy as np
import pytest

from pic2vec_ray.pipelines.featurize import featurize_images


@pytest.fixture(scope="module")
def featurized(ray_session, images_dir):
    ds = featurize_images(images_dir, model_str="tinynet", depth=1, batch_size=64)
    return ds.to_pandas()


def test_shapes_and_schema(featurized):
    df = featurized
    assert len(df) == 200
    assert set(["image_id", "caption", "missing", "features"]).issubset(df.columns)
    assert all(len(f) == 128 for f in df.features)


def test_missing_rows_get_zero_tensor_features(featurized):
    """Reference semantics: missing rows carry CNN(0), flagged missing
    (``data_featurizing.py:50-60``)."""
    df = featurized.set_index("image_id")
    roles = {i: int(i[-2:]) % 20 for i in df.index}
    miss = [i for i, r in roles.items() if r >= 17]
    ok = [i for i, r in roles.items() if r < 17]
    assert df.loc[miss, "missing"].all()
    assert not df.loc[ok, "missing"].any()
    zero_vecs = np.stack(df.loc[miss, "features"].to_numpy())
    # all missing rows share the constant CNN(0) vector
    assert np.allclose(zero_vecs, zero_vecs[0], atol=1e-5)


def test_duplicates_get_identical_features(featurized):
    df = featurized.set_index("image_id")
    a = np.asarray(df.loc["img_00000032", "features"])
    b = np.asarray(df.loc["img_00000033", "features"])
    assert np.allclose(a, b, atol=1e-5)


def test_caption_roundtrip(featurized, images_dir):
    import pyarrow.parquet as pq

    src = pq.read_table(images_dir, columns=["image_id", "caption"]).to_pandas()
    out = featurized[["image_id", "caption"]]
    merged = src.merge(out, on="image_id", suffixes=("_src", "_out"))
    assert (merged.caption_src == merged.caption_out).all()


def test_determinism_across_runs(ray_session, images_dir):
    ds1 = featurize_images(images_dir, model_str="tinynet", batch_size=64).to_pandas()
    ds2 = featurize_images(images_dir, model_str="tinynet", batch_size=32).to_pandas()
    a = ds1.set_index("image_id").features
    b = ds2.set_index("image_id").features
    for i in a.index[:50]:
        assert np.allclose(np.asarray(a[i]), np.asarray(b[i]), atol=1e-5)


def test_downsampled_pipeline(ray_session, images_dir):
    ds = featurize_images(images_dir, model_str="tinynet", depth=1,
                          downsample=True, num_pooled_features=32, batch_size=64)
    df = ds.limit(5).to_pandas()
    assert all(len(f) == 32 for f in df.features)


def test_squeezenet_actor_pool_smoke(ray_session, images_dir):
    """The faithful SqueezeNet head runs through the real actor-pool
    pipeline (heavier 227x227 path; small slice to stay quick)."""
    import ray.data as rd

    src = rd.read_parquet(images_dir).limit(8)
    out = featurize_images(src, model_str="squeezenet", depth=1,
                           batch_size=8, concurrency=1).to_pandas()
    assert len(out) == 8
    assert all(len(f) == 512 for f in out.features)
