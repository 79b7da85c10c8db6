"""window_ranks (temporal/windows.py) and pivot_sum
(stages/relational.py) vs brute-force pandas oracles, plus the
int-keyed HLL partition invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def events_df() -> pd.DataFrame:
    rng = np.random.default_rng(5)
    n = 600
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 25, n),
        "event_type": rng.choice(["a", "b", "c", "zzz"], n),
        # duplicated values so RANK/DENSE_RANK tie paths are exercised
        "value": rng.integers(0, 40, n).astype(np.float64),
    })


def test_window_ranks_vs_pandas(ray_session, events_df):
    import ray.data as rd

    from pic2vec_ray.temporal.windows import window_ranks

    got = (window_ranks(rd.from_pandas(events_df), by="user_id",
                        order="value", tiebreak="event_id",
                        num_partitions=5)
           .to_pandas().sort_values("event_id").reset_index(drop=True))

    df = events_df.sort_values(["user_id", "value", "event_id"])
    g = df.groupby("user_id")["value"]
    want = df.assign(
        rnk=g.rank(method="min").astype("int64"),
        drnk=g.rank(method="dense").astype("int64"),
        rn=df.groupby("user_id").cumcount() + 1,
        cd=g.rank(method="max") / g.transform("size"),
        pr=np.where(g.transform("size") > 1,
                    (g.rank(method="min") - 1)
                    / np.maximum(g.transform("size") - 1, 1), 0.0),
    ).sort_values("event_id").reset_index(drop=True)
    for c in ["rnk", "drnk", "rn", "cd", "pr"]:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_window_ranks_single_row_partition(ray_session):
    import ray.data as rd

    from pic2vec_ray.temporal.windows import window_ranks

    df = pd.DataFrame({"event_id": [1], "user_id": [9], "value": [3.0]})
    got = window_ranks(rd.from_pandas(df), by="user_id", order="value",
                       tiebreak="event_id", num_partitions=2).to_pandas()
    assert got.loc[0, "pr"] == 0.0 and got.loc[0, "cd"] == 1.0


def test_pivot_sum_vs_pandas(ray_session, events_df):
    import ray.data as rd

    from pic2vec_ray.stages.relational import pivot_sum

    cats = ["a", "b", "c"]  # 'zzz' deliberately undeclared → dropped
    got = (pivot_sum(rd.from_pandas(events_df), key="user_id",
                     pivot_col="event_type", value="value",
                     categories=cats)
           .to_pandas().sort_values("user_id").reset_index(drop=True))

    want = (events_df[events_df.event_type.isin(cats)]
            .pivot_table(index="user_id", columns="event_type",
                         values="value", aggfunc="sum", fill_value=0.0)
            .reindex(columns=cats, fill_value=0.0))
    for c in cats:
        np.testing.assert_allclose(
            got[c + "_sum"].to_numpy(),
            want[c].sort_index().to_numpy(), rtol=1e-12)


def test_hll_int_partition_invariance(ray_session):
    import ray.data as rd

    from pic2vec_ray.stages.sketch import hll_distinct_int

    rng = np.random.default_rng(3)
    df = pd.DataFrame({"g": rng.integers(0, 4, 5000),
                       "uid": rng.integers(0, 900, 5000)})
    outs = []
    for blocks in (1, 13):
        ds = rd.from_pandas(df).repartition(blocks)
        outs.append(hll_distinct_int(ds, group_col="g", col="uid",
                                     out_col="est")
                    .to_pandas().sort_values("g").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # sanity: estimates in a sane band around true per-group distincts
    true = df.groupby("g")["uid"].nunique()
    for _, row in outs[0].iterrows():
        t = true[row["g"]]
        assert abs(row["est"] - t) / t < 0.25
