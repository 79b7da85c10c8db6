"""Distributed EXACT grouped quantiles via two-phase value counting.

The naive grouped quantile (`groupby(key).map_groups(np.quantile)`)
ships every raw row of a group to one worker — at 100 TB a single hot
group overflows it. This implementation never moves raw rows:

1. per-batch partial: ``value_counts`` per (group keys, value) — one
   pandas groupby per batch, no shuffle;
2. one global ``groupby(keys + value).sum(cnt)`` — the all-to-all
   exchange moves one row per distinct (group, value), bounded by the
   value domain × group count, NOT the corpus row count;
3. per-group finish on the tiny (value, count) table: sort by value,
   cumulative-sum the counts, pick the first value whose cumulative
   count reaches rank ``ceil(q·n)`` — exactly SQL's discrete quantile
   (DuckDB ``quantile_disc`` / numpy ``inverted_cdf``; rule pinned by
   ``tests/test_quantiles.py`` against DuckDB).

Exactness holds for ANY distribution; the scale bound needs a bounded
value domain (ints, decimals, enums — e.g. TPC-H quantities 1..50).
For unbounded continuous domains, quantize values to a fixed grid in
phase 1 (ε-approximate with explicit error) or switch to a mergeable
sketch; both keep phases 2-3 unchanged.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def grouped_quantiles_exact(
    ds,
    *,
    keys: str | list[str],
    value: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
):
    """Exact discrete quantiles of ``value`` per group. Output columns:
    the group keys, then ``q{percent}`` per requested quantile plus
    ``n_rows`` (group size) — all named identically in the SQL oracle.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    qcols = [f"q{int(round(q * 100))}" for q in qs]
    if len(set(qcols)) != len(qcols):
        raise ValueError("quantiles collide after percent rounding")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(keys + [value], as_index=False).size()
        return g.rename(columns={"size": "cnt"})

    counts = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(keys + [value])
        .sum("cnt")
    )

    def finish(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(value, kind="mergesort")
        cum = g["sum(cnt)"].to_numpy().cumsum()
        n = int(cum[-1])
        vals = g[value].to_numpy()
        row = {k: g.iloc[0][k] for k in keys}
        for q, name in zip(qs, qcols):
            rank = max(1, math.ceil(q * n))  # 1-based target rank
            row[name] = vals[int(np.searchsorted(cum, rank))]
        row["n_rows"] = n
        return pd.DataFrame([row])

    return counts.groupby(keys).map_groups(finish, batch_format="pandas")
