"""Temporal engine vs brute-force pandas oracles (SURVEY.md §5 strategy (c)),
including zero-leakage property checks and skew-salted as-of."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pic2vec_ray.temporal.asof import asof_join
from pic2vec_ray.temporal.windows import backfill, lag_lead, rolling_range_agg, sessionize


@pytest.fixture(scope="module")
def events(ray_session, sf_dir):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/events.parquet").materialize()


@pytest.fixture(scope="module")
def events_pdf(events):
    return events.to_pandas()


def _left_right(pdf):
    left = pdf[pdf.event_type.isin(["view", "click"])]
    right = pdf[pdf.event_type == "purchase"][["user_id", "ts", "value"]].rename(
        columns={"value": "purchase_value"}
    )
    return left, right


@pytest.mark.parametrize("mode", ["broadcast", "shuffle", "salted"])
@pytest.mark.parametrize("exact", [True, False])
def test_asof_matches_pandas_oracle(events, events_pdf, mode, exact, ray_session):
    import ray.data as rd

    lpdf, rpdf = _left_right(events_pdf)
    left = rd.from_pandas(lpdf.reset_index(drop=True))
    right = rd.from_pandas(rpdf.reset_index(drop=True))
    kwargs = dict(on="ts", by="user_id", right_on="ts", allow_exact_matches=exact)
    if mode == "broadcast":
        out = asof_join(left, right, broadcast=True, **kwargs)
    elif mode == "shuffle":
        out = asof_join(left, right, num_partitions=8, **kwargs)
    else:
        hot = lpdf.user_id.value_counts().index[:3].tolist()
        out = asof_join(left, right, num_partitions=8, hot_keys=hot, salt=4, **kwargs)
    got = out.to_pandas().sort_values("event_id").reset_index(drop=True)

    oracle = pd.merge_asof(
        lpdf.sort_values("ts"),
        rpdf.sort_values("ts").rename(columns={"ts": "ts_r"}),
        left_on="ts", right_on="ts_r", by="user_id", allow_exact_matches=exact,
    ).sort_values("event_id").reset_index(drop=True)

    assert len(got) == len(oracle)
    assert (got.event_id.to_numpy() == oracle.event_id.to_numpy()).all()
    pd.testing.assert_series_equal(got.purchase_value, oracle.purchase_value, check_names=False)
    pd.testing.assert_series_equal(got.ts_r, oracle.ts_r, check_names=False)
    # dtypes preserved through the union-with-nulls path
    assert got.event_id.dtype == np.int64
    assert got.user_id.dtype == np.int64


def test_asof_zero_leakage(events, events_pdf, ray_session):
    """Every matched right timestamp must satisfy ts_r <= ts (backward,
    inclusive) and ts_r < ts (strict)."""
    import ray.data as rd

    lpdf, rpdf = _left_right(events_pdf)
    left, right = rd.from_pandas(lpdf.reset_index(drop=True)), rd.from_pandas(rpdf.reset_index(drop=True))
    incl = asof_join(left, right, on="ts", by="user_id", num_partitions=8).to_pandas()
    m = incl.ts_r.notna()
    assert (incl.loc[m, "ts_r"] <= incl.loc[m, "ts"]).all()
    strict = asof_join(left, right, on="ts", by="user_id", num_partitions=8,
                       allow_exact_matches=False).to_pandas()
    m = strict.ts_r.notna()
    assert (strict.loc[m, "ts_r"] < strict.loc[m, "ts"]).all()


def test_lag_lead_oracle(events, events_pdf):
    out = lag_lead(events, by="user_id", order="ts", cols=["value"],
                   lags=(1, 2), leads=(1,), tiebreak="event_id", num_partitions=8)
    got = out.to_pandas().sort_values("event_id").reset_index(drop=True)
    o = events_pdf.sort_values(["user_id", "ts", "event_id"], kind="mergesort").copy()
    g = o.groupby("user_id", sort=False)["value"]
    o["value_lag1"], o["value_lag2"], o["value_lead1"] = g.shift(1), g.shift(2), g.shift(-1)
    o = o.sort_values("event_id").reset_index(drop=True)
    for c in ("value_lag1", "value_lag2", "value_lead1"):
        pd.testing.assert_series_equal(got[c], o[c], check_names=False)


def test_backfill_oracle(events, events_pdf, ray_session):
    import ray.data as rd

    pdf = events_pdf.copy()
    pdf["pv"] = pdf.value.where(pdf.event_type == "purchase")
    ds = rd.from_pandas(pdf.reset_index(drop=True))
    out = backfill(ds, by="user_id", order="ts", cols=["pv"], tiebreak="event_id",
                   num_partitions=8)
    got = out.to_pandas().sort_values("event_id").reset_index(drop=True)
    o = pdf.sort_values(["user_id", "ts", "event_id"], kind="mergesort").copy()
    o["pv_filled"] = o.groupby("user_id", sort=False)["pv"].ffill()
    o = o.sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_series_equal(got.pv_filled, o.pv_filled, check_names=False)


def test_sessionize_oracle(events, events_pdf):
    gap = pd.Timedelta(minutes=30)
    out = sessionize(events, by="user_id", order="ts", gap=gap,
                     tiebreak="event_id", num_partitions=8)
    got = out.to_pandas().sort_values("event_id").reset_index(drop=True)
    o = events_pdf.sort_values(["user_id", "ts", "event_id"], kind="mergesort").copy()
    prev = o.groupby("user_id", sort=False)["ts"].shift(1)
    o["session_id"] = (prev.isna() | ((o.ts - prev) > gap)).groupby(o.user_id, sort=False).cumsum()
    o = o.sort_values("event_id").reset_index(drop=True)
    assert (got.session_id.to_numpy() == o.session_id.to_numpy()).all()
    # sessions are 1-based and contiguous per user
    assert got.session_id.min() == 1


def test_rolling_range_oracle(events, events_pdf):
    w = pd.Timedelta(hours=1)
    out = rolling_range_agg(events, by="user_id", order="ts", value="value",
                            window=w, agg="sum", tiebreak="event_id",
                            num_partitions=8, out_col="v1h")
    got = out.to_pandas().sort_values("event_id").reset_index(drop=True)
    # brute-force oracle with SQL RANGE semantics (peers included)
    o = events_pdf.copy()
    expect = np.empty(len(o), dtype=np.float64)
    for i, row in enumerate(o.itertuples()):
        mask = (o.user_id == row.user_id) & (o.ts >= row.ts - w) & (o.ts <= row.ts)
        expect[i] = o.loc[mask, "value"].sum()
    o["v1h"] = expect
    o = o.sort_values("event_id").reset_index(drop=True)
    assert np.allclose(got.v1h.to_numpy(), o.v1h.to_numpy(), atol=1e-9)


def test_hash_join_semi_anti(ray_session):
    import pandas as pd
    import ray.data as rd

    from pic2vec_ray.temporal.join import hash_join

    left = pd.DataFrame({"k": [1, 2, 3, 4], "v": list("abcd")})
    right = pd.DataFrame({"k": [2, 2, 4, 9], "w": [1.0, 2.0, 3.0, 4.0]})
    semi = hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k",
                     how="semi", num_partitions=2).to_pandas().sort_values("k")
    anti = hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k",
                     how="anti", num_partitions=2).to_pandas().sort_values("k")
    assert semi.k.tolist() == [2, 4] and semi.columns.tolist() == ["k", "v"]
    assert anti.k.tolist() == [1, 3]
    assert semi.v.tolist() == ["b", "d"]  # no duplication from 2 right matches


def test_asof_auto_plan_selection(ray_session):
    import pandas as pd
    import ray.data as rd

    from pic2vec_ray.temporal.asof import asof_join

    ts = pd.to_datetime(["2024-01-01", "2024-01-02"]).astype("datetime64[us]")
    left = pd.DataFrame({"k": [1, 1], "ts": ts})
    right = pd.DataFrame({"k": [1], "ts": ts[:1], "v": [2.5]})
    # materialized small right → auto picks the broadcast plan; lazy
    # right → auto falls back to shuffle; results identical either way
    r_small = rd.from_pandas(right).materialize()
    r_lazy = rd.from_pandas(right).map_batches(lambda df: df, batch_format="pandas")
    a = asof_join(rd.from_pandas(left), r_small, on="ts", by="k",
                  broadcast="auto", num_partitions=2).to_pandas().sort_values("ts")
    b = asof_join(rd.from_pandas(left), r_lazy, on="ts", by="k",
                  broadcast="auto", num_partitions=2).to_pandas().sort_values("ts")
    assert a.v.tolist() == b.v.tolist() == [2.5, 2.5]
