"""Round-4 operators: approximate grouped quantiles (histogram sketch),
deterministic epoch shuffle, BPE tokenizer, hash_join broadcast plan,
GPU plumbing, overlapped checkpoint partitions."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


# ------------------------------------------ approx grouped quantiles


def _make_cont(n=5000, seed=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "g": rng.integers(0, 3, n),
        "v": rng.normal(100.0, 25.0, n),  # continuous: ~all-distinct
    })


def test_approx_quantiles_error_bound(ray_session):
    """|approx - exact| <= (mx - mn) / n_bins for every group/quantile."""
    import ray.data as rd

    from pic2vec_ray.stages.quantiles import grouped_quantiles_approx

    df = _make_cont()
    qs = (0.25, 0.5, 0.75, 0.9)
    B = 512
    got = (grouped_quantiles_approx(
        rd.from_pandas(df).repartition(8), keys="g", value="v",
        qs=qs, n_bins=B)
        .to_pandas().sort_values("g").reset_index(drop=True))
    width = (df.v.max() - df.v.min()) / B
    for g, grp in df.groupby("g"):
        row = got[got.g == g].iloc[0]
        assert row.n_rows == len(grp)
        vals = np.sort(grp.v.to_numpy())
        for q in qs:
            exact = vals[max(1, int(np.ceil(q * len(vals)))) - 1]
            # the true quantile lies in the reported bin
            assert abs(row[f"q{int(q * 100)}"] - exact) <= width + 1e-9


def test_approx_quantiles_partition_invariant(ray_session):
    import ray.data as rd

    from pic2vec_ray.stages.quantiles import grouped_quantiles_approx

    df = _make_cont(2000, seed=11)
    outs = []
    for nblocks in (1, 7):
        out = (grouped_quantiles_approx(
            rd.from_pandas(df).repartition(nblocks), keys="g", value="v",
            n_bins=256)
            .to_pandas().sort_values("g").reset_index(drop=True))
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_approx_quantiles_constant_column(ray_session):
    import ray.data as rd

    from pic2vec_ray.stages.quantiles import grouped_quantiles_approx

    df = pd.DataFrame({"g": [0] * 10, "v": [5.0] * 10})
    out = grouped_quantiles_approx(
        rd.from_pandas(df), keys="g", value="v", n_bins=64).to_pandas()
    assert out.q50.iloc[0] == 5.0 and out.n_rows.iloc[0] == 10
