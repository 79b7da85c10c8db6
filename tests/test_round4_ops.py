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


# ------------------------------------------------- epoch shuffle


def test_epoch_shuffle_is_permutation_and_partition_invariant(ray_session):
    import ray.data as rd

    from pic2vec_ray.stages.split import _epoch_hash, epoch_shuffle

    ids = np.arange(0, 1500, dtype=np.int64) * 7  # sparse ids
    df = pd.DataFrame({"doc_id": ids, "payload": ids * 2})
    outs = []
    for nblocks in (1, 5):
        out = (epoch_shuffle(rd.from_pandas(df).repartition(nblocks),
                             id_col="doc_id", epoch=2, seed=9,
                             num_buckets=256, num_partitions=8)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    got = outs[0]
    # positions form exactly 0..n-1
    assert sorted(got.position.tolist()) == list(range(len(df)))
    assert (got.epoch == 2).all()
    # position == rank of (hash, id): brute-force replay
    h = _epoch_hash(ids, 2, 9)
    order = np.lexsort((ids, h))
    expect = np.empty(len(ids), dtype=np.int64)
    expect[order] = np.arange(len(ids))
    assert (got.position.to_numpy() == expect).all()
    # payload rides along untouched
    assert (got.payload == got.doc_id * 2).all()


def test_epoch_shuffle_changes_between_epochs(ray_session):
    import ray.data as rd

    from pic2vec_ray.stages.split import epoch_shuffle

    df = pd.DataFrame({"doc_id": np.arange(400, dtype=np.int64)})
    a = (epoch_shuffle(rd.from_pandas(df), id_col="doc_id", epoch=0,
                       num_buckets=64, num_partitions=4)
         .to_pandas().sort_values("doc_id").position.to_numpy())
    b = (epoch_shuffle(rd.from_pandas(df), id_col="doc_id", epoch=1,
                       num_buckets=64, num_partitions=4)
         .to_pandas().sort_values("doc_id").position.to_numpy())
    assert (a != b).mean() > 0.99


def test_epoch_shuffle_rejects_negative_ids(ray_session):
    import ray.data as rd

    from pic2vec_ray.stages.split import epoch_shuffle

    df = pd.DataFrame({"doc_id": [-1, 2, 3]})
    with pytest.raises(Exception):
        epoch_shuffle(rd.from_pandas(df), id_col="doc_id",
                      epoch=0).to_pandas()
