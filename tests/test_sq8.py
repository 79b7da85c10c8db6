"""Round-5 int8 scalar quantization: code correctness vs dense numpy,
reconstruction error bound, constant-dim handling, partition
invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _emb(n=200, d=12, seed=23):
    rng = np.random.default_rng(seed)
    m = rng.normal(0, 2.0, (n, d)).astype(np.float32)
    m[:, 3] = 7.5  # constant dimension
    return pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                         "embedding": [row for row in m]})


def test_sq8_codes_match_dense(ray_session):
    import ray.data as rd
    from pic2vec_ray.stages.similarity import sq8_encode

    df = _emb()
    out = (sq8_encode(rd.from_pandas(df).repartition(5))
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    m = np.stack(df.embedding.to_numpy()).astype(np.float64)
    mn, mx = m.min(axis=0), m.max(axis=0)
    scale = (mx - mn) / 255.0
    live = scale > 0
    expect = np.zeros(m.shape, dtype=np.int64)
    expect[:, live] = np.round((m[:, live] - mn[live]) / scale[live])
    got = np.stack(out.codes.to_numpy()).astype(np.int64)
    assert (got == expect).all()
    assert (out.code_sum.to_numpy() == expect.sum(axis=1)).all()
    assert (got[:, 3] == 0).all()  # constant dim pinned to 0
    assert got.min() >= 0 and got.max() <= 255


def test_sq8_reconstruction_error_bounded(ray_session):
    import ray.data as rd
    from pic2vec_ray.stages.similarity import sq8_encode, sq8_stats

    df = _emb(seed=5)
    ds = rd.from_pandas(df)
    mn, mx = sq8_stats(ds)
    scale = (mx - mn) / 255.0
    out = sq8_encode(ds, stats=(mn, mx)).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    m = np.stack(df.embedding.to_numpy()).astype(np.float64)
    codes = np.stack(out.codes.to_numpy()).astype(np.float64)
    live = scale > 0
    recon = codes[:, live] * scale[live] + mn[live]
    # quantization error is at most half a step per dimension
    assert np.abs(recon - m[:, live]).max() <= scale[live].max() / 2 + 1e-12


def test_sq8_partition_invariant(ray_session):
    import ray.data as rd
    from pic2vec_ray.stages.similarity import sq8_encode

    df = _emb(seed=9)
    outs = []
    for parts in (1, 7):
        outs.append(sq8_encode(rd.from_pandas(df).repartition(parts))
                    .to_pandas().sort_values("vec_id")
                    .reset_index(drop=True)
                    [["vec_id", "code_sum", "code_min", "code_max"]])
    pd.testing.assert_frame_equal(outs[0], outs[1])
