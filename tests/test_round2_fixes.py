"""Round-2 semantic fixes (ADVICE r01):

- missing-row features are CNN(raw zeros) — the reference's except
  branch feeds unpreprocessed zeros to the model, and the composable
  ``preprocess_data`` zero-fills AFTER normalization, so all three
  paths must emit the same constant vector;
- ``ImageFeaturizer`` featurizes EVERY listed image column;
- as-of / hash joins survive left integer columns that legitimately
  contain nulls (pandas nullable Int64 restore, not a hard astype).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pic2vec_ray.codecs.png import encode_png


def test_missing_features_equal_cnn_of_raw_zeros():
    from pic2vec_ray.model.zoo import build_featurizer
    from pic2vec_ray.stages.decode import preprocess_data
    from pic2vec_ray.stages.embed import EmbedActor

    actor = EmbedActor(model_str="tinynet", depth=1)
    model = build_featurizer("tinynet", 1)
    h, w = model.target_size
    expected = model(np.zeros((1, h, w, 3), dtype=np.float32))[0]
    assert np.allclose(actor.zero_features, expected, atol=1e-6)

    # composable-API path: preprocess (zero-fill AFTER normalize) → model
    tensor, missing = preprocess_data([b""], model_str="tinynet")
    assert missing.tolist() == [True]
    assert np.allclose(model(tensor)[0], expected, atol=1e-6)

    # actor path end-to-end on a missing row
    import pyarrow as pa

    out = actor(pa.table({"image_id": ["x"], "bytes": [b""]}))
    got = np.asarray(out["features"].to_pylist()[0])
    assert np.allclose(got, expected, atol=1e-6)


@pytest.fixture(scope="module")
def two_col_corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("twocol")
    rng = np.random.default_rng(7)
    for name in ("a1.png", "a2.png", "b1.png", "b2.png"):
        px = rng.integers(0, 256, size=(20, 20, 3), dtype=np.uint8)
        (d / name).write_bytes(encode_png(px))
    csv = d / "list.csv"
    pd.DataFrame({
        "left_img": ["a1.png", "a2.png"],
        "right_img": ["b1.png", "absent.png"],
    }).to_csv(csv, index=False)
    return d, csv


def test_featurizer_multi_column_end_to_end(ray_session, two_col_corpus):
    from pic2vec_ray.featurizer import ImageFeaturizer

    d, csv = two_col_corpus
    f = ImageFeaturizer(model="tinynet", depth=1)
    df = f.featurize(image_columns=["left_img", "right_img"],
                     image_path=str(d), csv_path=str(csv), batch_size=8)
    # every listed column is featurized — none silently dropped
    for col in ("left_img", "right_img"):
        assert col in df.columns
        assert f"{col}_missing" in df.columns
        assert f"{col}_feat_0" in df.columns and f"{col}_feat_127" in df.columns
    assert df.left_img.tolist() == ["a1.png", "a2.png"]
    assert df.left_img_missing.tolist() == [False, False]
    # S3 semantics per column: absent.png is not in the directory
    assert df.right_img_missing.tolist() == [False, True]
    # distinct content ⇒ distinct features between the columns
    a = df[[c for c in df.columns if c.startswith("left_img_feat_")]].to_numpy()
    b = df[[c for c in df.columns if c.startswith("right_img_feat_")]].to_numpy()
    assert not np.allclose(a[0], b[0], atol=1e-3)


def test_featurizer_multi_column_requires_csv(two_col_corpus):
    from pic2vec_ray.featurizer import ImageFeaturizer

    d, _ = two_col_corpus
    with pytest.raises(ValueError, match="csv path"):
        ImageFeaturizer(model="tinynet").load_data(
            image_columns=["x", "y"], image_path=str(d))


def test_asof_left_nullable_int_column(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from pic2vec_ray.temporal.asof import asof_join

    ts = pd.to_datetime(["2024-01-01", "2024-01-02"]).astype("datetime64[us]")
    left = pa.table({
        "k": pa.array([1, 1], pa.int64()),
        "ts": pa.array(ts),
        "maybe": pa.array([7, None], pa.int64()),  # legit null in a left int col
    })
    right = pa.table({
        "k": pa.array([1], pa.int64()),
        "ts": pa.array(ts[:1]),
        "v": pa.array([3.5], pa.float64()),
    })
    out = asof_join(rd.from_arrow(left), rd.from_arrow(right), on="ts", by="k",
                    num_partitions=2).to_pandas().sort_values("ts")
    assert out.v.tolist() == [3.5, 3.5]
    assert str(out["maybe"].dtype) == "Int64"  # nullable, not crashed/float
    assert out["maybe"].tolist()[0] == 7 and pd.isna(out["maybe"].tolist()[1])


def test_hash_join_left_nullable_int_column(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from pic2vec_ray.temporal.join import hash_join

    left = pa.table({"k": pa.array([1, 2], pa.int64()),
                     "maybe": pa.array([None, 5], pa.int64())})
    right = pa.table({"k": pa.array([1, 2], pa.int64()),
                      "val": pa.array(["a", "b"])})
    out = hash_join(rd.from_arrow(left), rd.from_arrow(right), on="k",
                    num_partitions=2).to_pandas().sort_values("k")
    assert out.val.tolist() == ["a", "b"]
    assert pd.isna(out["maybe"].iloc[0]) and out["maybe"].iloc[1] == 5
