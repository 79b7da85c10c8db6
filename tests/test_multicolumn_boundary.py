"""Multi-column featurization (reference multi-column golden path,
image_featurizer.py:587-593) + as-of boundary/tie semantics
(FIXTURES.md T2: exact feature_ts == obs_ts must obey the
inclusive/exclusive rule)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pic2vec_ray.pipelines.featurize import featurize_images
from pic2vec_ray.temporal.asof import asof_join


def test_multi_column_featurize(ray_session, images_dir):
    import pyarrow as pa
    import ray.data as rd

    src = rd.read_parquet(images_dir)

    def add_second(t: pa.Table) -> pa.Table:
        # second image column: reversed byte rows (distinct content)
        b = t["bytes"].to_pylist()
        return t.append_column("bytes2", pa.array(list(reversed(b)), type=pa.binary()))

    ds = src.map_batches(add_second, batch_format="pyarrow")
    out = featurize_images(ds, model_str="tinynet", depth=1,
                           image_columns=["bytes", "bytes2"], batch_size=64,
                           concurrency=1).to_pandas()
    for col in ("bytes_features", "bytes2_features", "bytes_missing", "bytes2_missing"):
        assert col in out.columns
    assert all(len(f) == 128 for f in out.bytes_features)
    assert all(len(f) == 128 for f in out.bytes2_features)
    # the two columns are independent featurizations
    row = out.iloc[0]
    assert not np.allclose(np.asarray(row.bytes_features),
                           np.asarray(row.bytes2_features), atol=1e-3)


def test_asof_exact_boundary_semantics(ray_session):
    """feature_ts == obs_ts: inclusive (>=) matches it, strict (>) falls
    back to the previous version — the zero-leakage boundary pin."""
    import ray.data as rd

    ts0 = pd.Timestamp("2024-01-01 12:00:00")
    earlier = ts0 - pd.Timedelta(hours=1)
    obs = pd.DataFrame({"obs_id": [1], "k": [5], "ts": [ts0]})
    feats = pd.DataFrame({"k": [5, 5], "ts": [earlier, ts0], "v": [1.0, 2.0]})
    for c in ("ts",):
        obs[c] = obs[c].astype("datetime64[us]")
        feats[c] = feats[c].astype("datetime64[us]")
    lds, rds = rd.from_pandas(obs), rd.from_pandas(feats)
    incl = asof_join(lds, rds, on="ts", by="k", num_partitions=2).to_pandas()
    strict = asof_join(lds, rds, on="ts", by="k", num_partitions=2,
                       allow_exact_matches=False).to_pandas()
    assert incl.v.iloc[0] == 2.0 and incl.ts_r.iloc[0] == ts0
    assert strict.v.iloc[0] == 1.0 and strict.ts_r.iloc[0] == earlier


def test_asof_obs_before_any_feature_yields_null(ray_session):
    """Observation earlier than every feature row → null match (the
    no-leakage case from FIXTURES.md T2)."""
    import ray.data as rd

    obs = pd.DataFrame({"obs_id": [1], "k": [5],
                        "ts": pd.to_datetime(["2020-01-01"]).astype("datetime64[us]")})
    feats = pd.DataFrame({"k": [5], "ts": pd.to_datetime(["2024-01-01"]).astype("datetime64[us]"),
                          "v": [9.0]})
    out = asof_join(rd.from_pandas(obs), rd.from_pandas(feats), on="ts", by="k",
                    num_partitions=2).to_pandas()
    assert out.ts_r.isna().all() and out.v.isna().all()


def test_feature_events_fixture(sf_dir):
    from pic2vec_ray.fixtures.synth import make_feature_events

    t = make_feature_events(sf_dir)
    df = t.to_pandas()
    assert set(df.columns) == {"image_id", "feature_ts"}
    versions = df.groupby("image_id").size()
    assert versions.min() >= 1 and versions.max() <= 3
    # deterministic regeneration
    df2 = make_feature_events(sf_dir).to_pandas()
    assert df.equals(df2)
