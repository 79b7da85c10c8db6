"""DDSketch mergeable quantile sketch (stages/quantiles.dd_quantiles).

Pins the three properties the round-4 verdict asked the new sketch
for: a relative-error guarantee on heavy-tailed data, robustness to
the single-outlier case the fixed-bin histogram provably fails, and
partition invariance of the merged sketch (pointwise bucket addition
is commutative/associative, so block layout must not matter).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from pic2vec_ray.stages.quantiles import (
    dd_quantiles,
    grouped_quantiles_approx,
)

QS = (0.25, 0.5, 0.75, 0.9)
ALPHA = 0.01


def _exact_rank_values(v: np.ndarray, qs=QS) -> list[float]:
    """The sketch's own rank rule (first item at rank ceil(q*n)) on the
    exact sorted data — the right yardstick for the error bound."""
    s = np.sort(v)
    n = len(s)
    return [float(s[max(1, math.ceil(q * n)) - 1]) for q in qs]


def test_relative_error_heavy_tail(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    groups = np.repeat(["a", "b"], 20_000)
    # lognormal: heavy tail spanning ~6 orders of magnitude
    v = np.concatenate([
        rng.lognormal(mean=0.0, sigma=2.0, size=20_000),
        rng.lognormal(mean=3.0, sigma=1.5, size=20_000),
    ])
    df = pd.DataFrame({"g": groups, "v": v})
    out = (dd_quantiles(rd.from_pandas(df), keys="g", value="v",
                        qs=QS, relative_accuracy=ALPHA)
           .to_pandas().set_index("g"))
    for g in ("a", "b"):
        exact = _exact_rank_values(df[df.g == g].v.to_numpy())
        for q, x in zip(QS, exact):
            est = float(out.loc[g, f"q{int(q * 100)}"])
            assert abs(est - x) <= ALPHA * abs(x) + 1e-6, (g, q, est, x)
        assert int(out.loc[g, "n_rows"]) == 20_000


def test_outlier_robustness_histogram_fails(ray_session):
    """One 1e12 outlier: DDSketch keeps its 1% relative guarantee
    (log buckets — the outlier adds ONE bucket); the fixed-bin
    histogram spreads its bins over [1, 1e12] so every uniform value
    lands in bin 0 and the median estimate collapses to the minimum."""
    import ray.data as rd

    rng = np.random.default_rng(11)
    v = np.append(rng.uniform(1.0, 2.0, size=5_000), 1e12)
    df = pd.DataFrame({"g": ["x"] * len(v), "v": v})
    exact_med = _exact_rank_values(v, (0.5,))[0]

    dd = (dd_quantiles(rd.from_pandas(df), keys="g", value="v",
                       qs=(0.5,), relative_accuracy=ALPHA)
          .to_pandas())
    dd_err = abs(float(dd.q50.iloc[0]) - exact_med) / exact_med
    assert dd_err <= ALPHA + 1e-9

    hist = (grouped_quantiles_approx(rd.from_pandas(df), keys="g",
                                     value="v", qs=(0.5,), n_bins=1024)
            .to_pandas())
    hist_err = abs(float(hist.q50.iloc[0]) - exact_med) / exact_med
    assert hist_err > 0.1  # the failure mode DDSketch exists to fix


def test_partition_invariance(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], size=9_000),
        "v": rng.lognormal(1.0, 2.5, size=9_000),
    })
    outs = []
    for nparts, order in ((2, slice(None)), (13, slice(None, None, -1))):
        d = df.iloc[order].reset_index(drop=True)
        ds = rd.from_pandas(d).repartition(nparts)
        outs.append(dd_quantiles(ds, keys="g", value="v", qs=QS,
                                 relative_accuracy=ALPHA)
                    .to_pandas().sort_values("g").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_negative_zero_positive_total_order(ray_session):
    """The three stores (negative mirrored, zero, positive) totally
    order the real line: quantiles on sign-mixed data stay within the
    relative bound of the exact rank values."""
    import ray.data as rd

    rng = np.random.default_rng(5)
    v = np.concatenate([
        -rng.lognormal(1.0, 1.5, size=4_000),
        np.zeros(1_000),
        rng.lognormal(1.0, 1.5, size=5_000),
    ])
    rng.shuffle(v)
    df = pd.DataFrame({"v": v})
    out = dd_quantiles(rd.from_pandas(df), value="v", qs=QS,
                       relative_accuracy=ALPHA).to_pandas()
    exact = _exact_rank_values(v)
    for q, x in zip(QS, exact):
        est = float(out[f"q{int(q * 100)}"].iloc[0])
        if x == 0.0:
            assert est == 0.0
        else:
            assert abs(est - x) <= ALPHA * abs(x) + 1e-6, (q, est, x)
    assert int(out.n_rows.iloc[0]) == len(v)


def test_empty_input_raises(ray_session):
    import ray.data as rd

    empty = rd.from_pandas(pd.DataFrame({"v": pd.Series([], dtype=float)}))
    with pytest.raises(ValueError, match="empty"):
        dd_quantiles(empty, value="v")


def test_bad_accuracy_raises(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({"v": [1.0]}))
    with pytest.raises(ValueError, match="relative_accuracy"):
        dd_quantiles(ds, value="v", relative_accuracy=1.5)
