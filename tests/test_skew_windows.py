"""Hot-key detection + salted as-of under heavy skew (FIXTURES.md skew
scenario: most rows share one key) and tumbling-window oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pic2vec_ray.temporal.asof import asof_join
from pic2vec_ray.temporal.skew import detect_hot_keys
from pic2vec_ray.temporal.windows import tumbling_window_agg


@pytest.fixture(scope="module")
def skewed(ray_session):
    """~90% of observation rows share entity 7."""
    import ray.data as rd

    rng = np.random.default_rng(5102020)
    n = 4000
    keys = np.where(rng.random(n) < 0.9, 7, rng.integers(0, 50, n))
    base = pd.Timestamp("2024-01-01").to_datetime64()
    left = pd.DataFrame({
        "obs_id": np.arange(n),
        "k": keys.astype("int64"),
        "ts": (base + rng.integers(0, 10**6, n).astype("timedelta64[s]")).astype("datetime64[us]"),
    })
    rkeys = np.arange(0, 50)
    rows = []
    for k in rkeys:
        for v in range(5):
            rows.append((int(k), base + np.timedelta64(v * 200_000, "s"), float(k * 100 + v)))
    right = pd.DataFrame(rows, columns=["k", "ts", "val"])
    right["ts"] = right.ts.astype("datetime64[us]")
    return rd.from_pandas(left).materialize(), rd.from_pandas(right).materialize(), left, right


def test_detect_hot_keys(skewed):
    left_ds, _, left, _ = skewed
    hot = detect_hot_keys(left_ds, "k", threshold_frac=0.2, sample_frac=0.5)
    assert hot == [7]


def test_salted_asof_on_90pct_skew_matches_oracle(skewed):
    left_ds, right_ds, left, right = skewed
    out = asof_join(left_ds, right_ds, on="ts", by="k",
                    num_partitions=8, hot_keys=[7], salt=4).to_pandas()
    oracle = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts").rename(columns={"ts": "ts_r"}),
        left_on="ts", right_on="ts_r", by="k",
    )
    got = out.sort_values("obs_id").reset_index(drop=True)
    exp = oracle.sort_values("obs_id").reset_index(drop=True)
    assert len(got) == len(exp)
    pd.testing.assert_series_equal(got.val, exp.val, check_names=False)
    pd.testing.assert_series_equal(got.ts_r, exp.ts_r, check_names=False)


def test_tumbling_window_matches_pandas(ray_session, sf_dir):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])
    out = tumbling_window_agg(ds, by="user_id", order="ts", value="value",
                              width=pd.Timedelta(days=1),
                              origin=pd.Timestamp("2024-01-01"),
                              num_partitions=8).to_pandas()
    pdf = ds.to_pandas()
    pdf["window_start"] = pdf.ts.dt.floor("D")
    exp = pdf.groupby(["user_id", "window_start"], as_index=False).agg(
        n_rows=("value", "size"), sum_v=("value", "sum"), mean_v=("value", "mean"))
    merged = out.merge(exp, on=["user_id", "window_start"], suffixes=("", "_e"))
    assert len(merged) == len(exp) == len(out)
    assert (merged.n_rows == merged.n_rows_e).all()
    assert np.allclose(merged.sum_v, merged.sum_v_e)


def test_hopping_window_brute_force(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pic2vec_ray.temporal.windows import hopping_window_agg

    rng = np.random.default_rng(11)
    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "k": rng.integers(0, 3, 60),
        "ts": base + pd.to_timedelta(rng.integers(0, 6 * 3600, 60), unit="s"),
        "v": rng.random(60).round(3),
    })
    df["ts"] = df["ts"].astype("datetime64[us]")
    out = hopping_window_agg(rd.from_pandas(df), by="k", order="ts", value="v",
                             width=pd.Timedelta(hours=1),
                             hop=pd.Timedelta(minutes=30), origin=base,
                             num_partitions=2).to_pandas()
    # brute force: every (k, aligned start) window covering >= 1 event
    hop, width = pd.Timedelta(minutes=30), pd.Timedelta(hours=1)
    expect = {}
    for r in df.itertuples():
        latest = base + ((r.ts - base) // hop) * hop
        for i in range(2):
            s = latest - i * hop
            key = (r.k, s)
            cnt, sv = expect.get(key, (0, 0.0))
            expect[key] = (cnt + 1, sv + r.v)
    got = {(r.k, r.window_start): (r.n_rows, round(r.sum_v, 9))
           for r in out.itertuples()}
    assert got.keys() == expect.keys()
    for key_, (cnt, sv) in expect.items():
        assert got[key_][0] == cnt and abs(got[key_][1] - sv) < 1e-9
    # every event lands in exactly width/hop windows
    assert out.n_rows.sum() == 2 * len(df)


def test_top_n_per_group_brute_force(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pic2vec_ray.temporal.windows import top_n_per_group

    rng = np.random.default_rng(5)
    df = pd.DataFrame({"k": rng.integers(0, 5, 80),
                       "id": np.arange(80),
                       "v": rng.integers(0, 10, 80)})  # ties on v → id tiebreak
    out = top_n_per_group(rd.from_pandas(df), by="k",
                          order_cols=["v", "id"], ascending=[False, True],
                          n=3, num_partitions=3).to_pandas()
    expect = (df.sort_values(["v", "id"], ascending=[False, True])
                .groupby("k").head(3))
    assert sorted(out.id) == sorted(expect.id)


def test_salted_hash_join_on_90pct_skew_matches_unsalted(skewed):
    import ray.data as rd

    from pic2vec_ray.temporal.join import hash_join

    left_ds, _, left, right = skewed
    # keep keys >= 40 unmatched so the anti result is non-empty
    right_ds = rd.from_pandas(right[right.k < 40]).materialize()

    for how in ("inner", "left", "semi", "anti"):
        salted = hash_join(left_ds, right_ds, on="k", how=how,
                           num_partitions=4, hot_keys=[7], salt=4).to_pandas()
        plain = hash_join(left_ds, right_ds, on="k", how=how,
                          num_partitions=4).to_pandas()
        cols = [c for c in ("obs_id", "val") if c in plain.columns] or ["obs_id"]
        key = lambda d: sorted(map(tuple, d[cols].fillna(-1).to_numpy().tolist()))
        assert key(salted) == key(plain), how
        if how == "inner":  # every left row of the hot key matched x5
            assert (salted.obs_id.value_counts()
                    [left[left.k == 7].obs_id].eq(5)).all()

    with pytest.raises(ValueError):
        hash_join(left_ds, right_ds, on="k", how="outer", hot_keys=[7])


def test_salted_range_join_matches_unsalted(skewed):
    from pic2vec_ray.temporal.join import range_join

    left_ds, right_ds, left, right = skewed
    w = pd.Timedelta(0), pd.Timedelta(days=1)
    salted = range_join(left_ds, right_ds, on="k", left_ts="ts", right_ts="ts",
                        min_delta=w[0], max_delta=w[1], num_partitions=4,
                        hot_keys=[7], salt=4).to_pandas()
    plain = range_join(left_ds, right_ds, on="k", left_ts="ts", right_ts="ts",
                       min_delta=w[0], max_delta=w[1],
                       num_partitions=4).to_pandas()
    key = lambda d: sorted(map(tuple, d[["obs_id", "val"]].to_numpy().tolist()))
    assert key(salted) == key(plain) and len(plain) > 0


def test_rolling_rows_agg_bruteforce(ray_session):
    import ray.data as rd

    from pic2vec_ray.temporal.windows import rolling_rows_agg

    rng = np.random.default_rng(61)
    n = 400
    df = pd.DataFrame({
        "u": rng.integers(0, 8, n),
        "ts": rng.permutation(n),
        "eid": np.arange(n),
        "v": np.round(rng.uniform(-5, 5, n), 3),
    })
    for agg in ("sum", "mean", "count"):
        got = (rolling_rows_agg(rd.from_pandas(df).repartition(5), by="u",
                                order="ts", value="v", k=3, agg=agg,
                                tiebreak="eid", num_partitions=4,
                                out_col="o")
               .to_pandas().sort_values("eid").reset_index(drop=True))
        o = df.sort_values(["u", "ts", "eid"], kind="mergesort")
        exp = (o.groupby("u", sort=False)["v"]
                .rolling(4, min_periods=1).agg(agg)
                .reset_index(level=0, drop=True))
        o = o.assign(o=exp).sort_values("eid").reset_index(drop=True)
        assert np.allclose(got.o.to_numpy(), o.o.to_numpy()), agg
    with pytest.raises(ValueError):
        rolling_rows_agg(rd.from_pandas(df), by="u", order="ts", value="v",
                         k=-1, tiebreak="eid")
