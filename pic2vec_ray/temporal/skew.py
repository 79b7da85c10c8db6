"""Skew utilities (north_rule: "skew salting for hot phash buckets").

``detect_hot_keys``: sample-based hot-key detection — one cheap pass
over a fraction of the data, counting keys whose share exceeds a
threshold. The result feeds ``asof_join(hot_keys=..., salt=k)`` (probe
side fanned out, build side replicated — exactness proven in
tests/test_temporal.py) and the salted two-phase groupbys in
stages/dedup.py.
"""

from __future__ import annotations

import pandas as pd


def detect_hot_keys(ds, by: str, *, threshold_frac: float = 0.01,
                    sample_frac: float = 0.1, seed: int = 5102020,
                    max_keys: int = 64) -> list:
    """Return keys whose sampled share of rows exceeds ``threshold_frac``.

    One `random_sample` pass + per-batch value_counts partials + a tiny
    driver-side merge — never a full groupby of the raw table.
    """
    sampled = ds.random_sample(sample_frac, seed=seed) if sample_frac < 1.0 else ds

    def partial_counts(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch[by].value_counts()
        return pd.DataFrame({by: vc.index, "n": vc.to_numpy()})

    counts = sampled.map_batches(partial_counts, batch_format="pandas").to_pandas()
    if counts.empty:
        return []
    agg = counts.groupby(by, sort=False)["n"].sum()
    total = agg.sum()
    hot = agg[agg / total > threshold_frac].sort_values(ascending=False)
    return hot.index[:max_keys].tolist()
