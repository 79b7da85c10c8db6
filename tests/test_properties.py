"""Property-based tests (hypothesis): temporal operators must match
their pandas oracles on arbitrary generated inputs — randomized
coverage beyond the fixed fixtures (SURVEY.md §5 strategy (c))."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def event_frames(draw):
    n = draw(st.integers(min_value=1, max_value=60))
    keys = draw(st.lists(st.integers(min_value=0, max_value=4),
                         min_size=n, max_size=n))
    # second offsets incl. duplicates (ties) and arbitrary order
    offs = draw(st.lists(st.integers(min_value=0, max_value=10_000),
                         min_size=n, max_size=n))
    vals = draw(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                                   allow_nan=False, allow_infinity=False),
                         min_size=n, max_size=n))
    base = pd.Timestamp("2024-01-01").to_datetime64()
    df = pd.DataFrame({
        "rid": np.arange(n, dtype=np.int64),
        "k": np.array(keys, dtype=np.int64),
        "ts": (base + np.array(offs, dtype="timedelta64[s]")).astype("datetime64[us]"),
        "v": np.array(vals, dtype=np.float64),
    })
    return df


_SETTINGS = settings(max_examples=12, deadline=None,
                     suppress_health_check=[HealthCheck.function_scoped_fixture,
                                            HealthCheck.too_slow])


@given(df=event_frames())
@_SETTINGS
def test_sessionize_property(ray_session, df):
    import ray.data as rd

    from pic2vec_ray.temporal.windows import sessionize

    gap = pd.Timedelta(minutes=10)
    got = sessionize(rd.from_pandas(df), by="k", order="ts", gap=gap,
                     tiebreak="rid", num_partitions=3).to_pandas()
    got = got.sort_values("rid").reset_index(drop=True)
    o = df.sort_values(["k", "ts", "rid"], kind="mergesort").copy()
    prev = o.groupby("k", sort=False)["ts"].shift(1)
    o["session_id"] = (prev.isna() | ((o.ts - prev) > gap)).groupby(o.k, sort=False).cumsum()
    o = o.sort_values("rid").reset_index(drop=True)
    assert (got.session_id.to_numpy() == o.session_id.to_numpy()).all()


@given(df=event_frames())
@_SETTINGS
def test_lag_property(ray_session, df):
    import ray.data as rd

    from pic2vec_ray.temporal.windows import lag_lead

    got = lag_lead(rd.from_pandas(df), by="k", order="ts", cols=["v"],
                   lags=(1,), leads=(1,), tiebreak="rid", num_partitions=3).to_pandas()
    got = got.sort_values("rid").reset_index(drop=True)
    o = df.sort_values(["k", "ts", "rid"], kind="mergesort").copy()
    g = o.groupby("k", sort=False)["v"]
    o["v_lag1"], o["v_lead1"] = g.shift(1), g.shift(-1)
    o = o.sort_values("rid").reset_index(drop=True)
    pd.testing.assert_series_equal(got.v_lag1, o.v_lag1, check_names=False)
    pd.testing.assert_series_equal(got.v_lead1, o.v_lead1, check_names=False)


@given(df=event_frames(), right=event_frames())
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_asof_property(ray_session, df, right):
    import ray.data as rd

    from pic2vec_ray.temporal.asof import asof_join

    # as-of requires unique (k, ts) on the right for a deterministic
    # oracle: collapse right to max v per (k, ts)
    r = right.groupby(["k", "ts"], as_index=False)["v"].max()
    got = asof_join(rd.from_pandas(df[["rid", "k", "ts"]]),
                    rd.from_pandas(r), on="ts", by="k",
                    num_partitions=3).to_pandas()
    got = got.sort_values("rid").reset_index(drop=True)
    oracle = pd.merge_asof(
        df[["rid", "k", "ts"]].sort_values("ts", kind="mergesort"),
        r.sort_values("ts", kind="mergesort").rename(columns={"ts": "ts_r"}),
        left_on="ts", right_on="ts_r", by="k",
    ).sort_values("rid").reset_index(drop=True)
    pd.testing.assert_series_equal(got.v, oracle.v, check_names=False)
    pd.testing.assert_series_equal(got.ts_r, oracle.ts_r, check_names=False)
    m = got.ts_r.notna()
    assert (got.loc[m, "ts_r"] <= got.loc[m, "ts"]).all()  # zero leakage


def test_checkpoint_default_metrics(ray_session, images_dir, tmp_path):
    import json

    from pic2vec_ray.state.checkpoint import manifest_path, run_partitioned
    from pic2vec_ray.stages.embed import EmbedActor

    out = str(tmp_path / "ckpt")
    summary = run_partitioned(
        images_dir, out,
        lambda ds: ds.map_batches(EmbedActor,
                                  fn_constructor_kwargs=dict(model_str="tinynet"),
                                  batch_format="pyarrow", batch_size=64, concurrency=2),
        num_partitions=2,
    )
    manifests = [json.load(open(manifest_path(out, k))) for k in summary["ran"]]
    assert all(m["metrics"]["files"] >= 1 and m["metrics"]["bytes"] > 0 for m in manifests)
    # roles 17/18/19 of p_partkey % 20 over 200 rows → 30 missing total
    assert sum(m["metrics"]["missing_rows"] for m in manifests) == 30


@st.composite
def join_frames(draw):
    n = draw(st.integers(min_value=0, max_value=40))
    m = draw(st.integers(min_value=0, max_value=40))
    lk = draw(st.lists(st.integers(min_value=0, max_value=8), min_size=n, max_size=n))
    rk = draw(st.lists(st.integers(min_value=0, max_value=8), min_size=m, max_size=m))
    left = pd.DataFrame({"k": np.array(lk, dtype=np.int64),
                         "lid": np.arange(n, dtype=np.int64)})
    right = pd.DataFrame({"k": np.array(rk, dtype=np.int64),
                          "w": np.arange(m, dtype=np.float64) * 1.5})
    return left, right


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(frames=join_frames(),
       how=st.sampled_from(["inner", "left", "right", "outer", "semi", "anti"]))
def test_hash_join_matches_pandas_oracle(ray_session, frames, how):
    import ray.data as rd

    from pic2vec_ray.temporal.join import hash_join

    left, right = frames
    if left.empty or right.empty:
        return  # schema resolution needs >=1 row per side (documented)
    got = hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k", how=how,
                    num_partitions=3).to_pandas()
    if how in ("inner", "left", "right", "outer"):
        exp = left.merge(right, on="k", how=how)
        if "lid" not in got.columns:  # schema-less empty result
            assert exp.empty
            return

        def canon(d):
            return sorted(
                (int(k),
                 pd.isna(l), -1 if pd.isna(l) else int(l),
                 pd.isna(w), -1.0 if pd.isna(w) else round(float(w), 9))
                for k, l, w in d[["k", "lid", "w"]].itertuples(index=False))

        assert canon(got) == canon(exp)
    else:
        members = set(right.k)
        exp_ids = [r.lid for r in left.itertuples()
                   if (r.k in members) == (how == "semi")]
        # an all-filtered result comes back as a schema-less empty frame
        got_ids = sorted(got.lid) if "lid" in got.columns else []
        assert got_ids == sorted(exp_ids)
