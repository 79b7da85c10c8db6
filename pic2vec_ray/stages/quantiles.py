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


def grouped_mode(ds, *, keys: str | list[str], value: str):
    """Exact most-frequent ``value`` per group with a PINNED tie-break
    (highest count first, then smallest value — SQL ``ROW_NUMBER()
    OVER (ORDER BY cnt DESC, value)`` semantics, so the answer is
    deterministic under any partitioning).  Same two-phase value
    counting as :func:`grouped_quantiles_exact`: the exchange moves one
    row per distinct (group, value), never raw rows.  Output columns:
    the keys, ``mode_{value}``, ``mode_count``."""
    keys = [keys] if isinstance(keys, str) else list(keys)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(keys + [value], as_index=False).size()
        return g.rename(columns={"size": "cnt"})

    counts = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(keys + [value])
        .sum("cnt")
    )

    def finish(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sum(cnt)", value], ascending=[False, True],
                              kind="mergesort")
        row = {k: g.iloc[0][k] for k in keys}
        row[f"mode_{value}"] = g.iloc[0][value]
        row["mode_count"] = int(g.iloc[0]["sum(cnt)"])
        return pd.DataFrame([row])

    return counts.groupby(keys).map_groups(finish, batch_format="pandas")


def quantile_bin(ds, *, value: str, n_bins: int, out_col: str = "bin"):
    """Equal-frequency discretization (quantile binning) of ``value``
    into ``n_bins`` buckets — the classic feature-engineering
    transform, as a two-pass fit/transform:

    *fit*: the bin edges are the exact discrete quantiles at
    ``k/n_bins`` (k = 1..n_bins-1) computed with the same two-phase
    value counting as :func:`grouped_quantiles_exact` — the exchange
    and the driver-side finish both move one row per DISTINCT value
    (bounded by the value domain, not the corpus; same domain
    assumption as the module docstring).

    *transform*: one stateless ``map_batches`` adds
    ``out_col = #{edges strictly below the value}`` (ties land in the
    lower bin), i.e. one vectorized ``searchsorted`` against the
    broadcast ≤``n_bins-1``-element edge array.  Skewed data can
    produce duplicate edges and therefore empty bins — deterministic,
    and exactly what the SQL ``quantile_disc`` replay produces.

    Returns the input rows with ``out_col`` appended (int64 in
    ``[0, n_bins)``).
    """
    n_bins = int(n_bins)
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby([value], as_index=False).size()
        return g.rename(columns={"size": "cnt"})

    # merge the per-batch partials on the driver with ONE pandas
    # groupby (Σ per-batch distinct values rows — same driver bound as
    # a distributed merge would hand back, and ~50× faster than a Ray
    # sort-aggregate over a high-cardinality key: 90 s → 2 s at sf0.1
    # on the near-unique price column)
    cdf = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby(value, as_index=False)["cnt"].sum()
        .rename(columns={"cnt": "sum(cnt)"})
        .sort_values(value, kind="mergesort")
    )
    if not len(cdf):
        raise ValueError(f"cannot bin an empty dataset on {value!r}")
    cum = cdf["sum(cnt)"].to_numpy().cumsum()
    n = int(cum[-1])
    vals = cdf[value].to_numpy()
    ranks = [max(1, math.ceil(k / n_bins * n)) for k in range(1, n_bins)]
    edges = vals[np.searchsorted(cum, ranks)]

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        batch[out_col] = np.searchsorted(
            edges, batch[value].to_numpy(), side="left").astype(np.int64)
        return batch

    return ds.map_batches(assign, batch_format="pandas")
