"""Bucketed-storage layer: write/read manifests, shuffle-free joins."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pic2vec_ray.sources.bucketed import (
    bucketed_join,
    is_bucketed,
    read_bucket_meta,
    write_bucketed,
)


@pytest.fixture()
def two_tables(tmp_path, ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    left = pd.DataFrame({
        "k": rng.integers(0, 50, 300),
        "v": rng.standard_normal(300),
    })
    # right misses some keys; has dup keys for others
    right = pd.DataFrame({
        "rk": np.concatenate([np.arange(0, 40), np.arange(0, 20)]),
        "w": np.arange(60, dtype="int64"),
    })
    lp, rp = str(tmp_path / "left"), str(tmp_path / "right")
    write_bucketed(rd.from_pandas(left), lp, key="k", num_buckets=8)
    write_bucketed(rd.from_pandas(right), rp, key="rk", num_buckets=8)
    return left, right, lp, rp


def test_manifest_roundtrip(two_tables):
    _, _, lp, rp = two_tables
    assert is_bucketed(lp) and is_bucketed(rp)
    meta = read_bucket_meta(lp)
    assert meta["key"] == ["k"] and meta["num_buckets"] == 8


def test_bucketed_inner_join_equals_pandas(two_tables):
    left, right, lp, rp = two_tables
    got = bucketed_join(lp, rp, on="k", right_on="rk", how="inner").to_pandas()
    want = left.merge(right, left_on="k", right_on="rk", how="inner")
    key = ["k", "v", "w"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True)[key],
        want.sort_values(key).reset_index(drop=True)[key],
    )


def test_bucketed_left_join_keeps_unmatched(two_tables):
    left, right, lp, rp = two_tables
    got = bucketed_join(lp, rp, on="k", right_on="rk", how="left").to_pandas()
    want = left.merge(right, left_on="k", right_on="rk", how="left")
    assert len(got) == len(want)
    assert got.w.isna().sum() == want.w.isna().sum() > 0


def test_bucket_count_mismatch_refused(tmp_path, ray_session, two_tables):
    import ray.data as rd

    left, _, lp, _ = two_tables
    other = str(tmp_path / "other")
    write_bucketed(rd.from_pandas(left), other, key="k", num_buckets=4)
    with pytest.raises(ValueError, match="bucket count mismatch"):
        bucketed_join(lp, other, on="k")


def test_wrong_join_key_refused(two_tables):
    _, _, lp, rp = two_tables
    with pytest.raises(ValueError, match="bucketing keys"):
        bucketed_join(lp, rp, on="v", right_on="rk")


def test_empty_buckets_keep_schema(tmp_path, ray_session):
    import ray.data as rd

    # all keys identical → every row in ONE bucket; 7 buckets are empty
    left = pd.DataFrame({"k": np.zeros(10, dtype="int64"), "v": np.arange(10.0)})
    right = pd.DataFrame({"k": np.zeros(3, dtype="int64"), "w": np.arange(3, dtype="int64")})
    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    write_bucketed(rd.from_pandas(left), lp, key="k", num_buckets=8)
    write_bucketed(rd.from_pandas(right), rp, key="k", num_buckets=8)
    got = bucketed_join(lp, rp, on="k").to_pandas()
    assert len(got) == 30  # 10 x 3 cross within the key
    assert set(got.columns) == {"k", "v", "w"}
