"""Windowed feature engineering over entity partitions (north_rule):
lag/lead, backfill, gap-threshold sessionization, range rolling
aggregates. New relative to the reference (SURVEY.md §2.5 — the
reference has no cross-row aggregation at all); semantics are pinned to
the ANSI-SQL window-function equivalents the oracle tests run.

All operators share the contract:

- deterministic order inside an entity: ``ORDER BY order_col, tiebreak``
  (ties on the timestamp are broken by an explicit unique id column —
  FIXTURES.md T2 requires the tie-break rule be pinned);
- one hash shuffle on the entity key via ``partitioned_apply``; inside
  a partition everything is vectorized pandas groupby ops.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .core import DEFAULT_PARTITIONS, partitioned_apply


def _sorted(df: pd.DataFrame, by: str, order: str, tiebreak: str | None) -> pd.DataFrame:
    keys = [by, order] + ([tiebreak] if tiebreak else [])
    return df.sort_values(keys, kind="mergesort")


def lag_lead(ds, *, by: str, order: str, cols: list[str], lags=(1,), leads=(1,),
             tiebreak: str | None = None, num_partitions: int = DEFAULT_PARTITIONS):
    """SQL: ``lag(col, n) OVER (PARTITION BY by ORDER BY order, tiebreak)``
    (and ``lead``). Output columns: ``{col}_lag{n}`` / ``{col}_lead{n}``."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = _sorted(df, by, order, tiebreak)
        g = df.groupby(by, sort=False)
        for col in cols:
            for n in lags:
                df[f"{col}_lag{n}"] = g[col].shift(n)
            for n in leads:
                df[f"{col}_lead{n}"] = g[col].shift(-n)
        return df

    return partitioned_apply(ds, by, fn, num_partitions)


def backfill(ds, *, by: str, order: str, cols: list[str], direction: str = "forward",
             limit: int | None = None, tiebreak: str | None = None,
             num_partitions: int = DEFAULT_PARTITIONS, out_suffix: str = "_filled"):
    """Forward/backward fill of nullable columns along the entity timeline.

    SQL (forward): ``last_value(col IGNORE NULLS) OVER (PARTITION BY by
    ORDER BY order, tiebreak ROWS UNBOUNDED PRECEDING)``.
    """
    if direction not in ("forward", "backward"):
        raise ValueError("direction must be 'forward' or 'backward'")

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = _sorted(df, by, order, tiebreak)
        g = df.groupby(by, sort=False)
        for col in cols:
            filled = g[col].ffill(limit=limit) if direction == "forward" else g[col].bfill(limit=limit)
            df[f"{col}{out_suffix}"] = filled
        return df

    return partitioned_apply(ds, by, fn, num_partitions)


def sessionize(ds, *, by: str, order: str, gap: pd.Timedelta,
               tiebreak: str | None = None, num_partitions: int = DEFAULT_PARTITIONS,
               session_col: str = "session_id"):
    """Gap-threshold sessionization: a new session starts when
    ``order - prev(order) > gap`` (strictly greater). 1-based per
    entity.

    SQL: ``SUM(CASE WHEN prev_ts IS NULL OR ts - prev_ts > gap THEN 1
    ELSE 0 END) OVER (PARTITION BY by ORDER BY ts, tiebreak ROWS
    UNBOUNDED PRECEDING)``.
    """

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = _sorted(df, by, order, tiebreak)
        prev = df.groupby(by, sort=False)[order].shift(1)
        new_session = prev.isna() | ((df[order] - prev) > gap)
        df[session_col] = new_session.groupby(df[by], sort=False).cumsum().astype("int64")
        return df

    return partitioned_apply(ds, by, fn, num_partitions)


def tumbling_window_agg(ds, *, by: str, order: str, value: str, width: pd.Timedelta,
                        origin: pd.Timestamp, aggs: tuple[str, ...] = ("count", "sum"),
                        num_partitions: int = DEFAULT_PARTITIONS):
    """Tumbling (fixed, non-overlapping) event-time windows per entity.

    Window assignment is ``floor((ts - origin) / width)`` — a pure
    per-row projection, so this is the cheap kind of "window": one
    vectorized map to add ``window_start``, then an ordinary grouped
    aggregate (here fused into the same per-partition pass). SQL
    equivalent: ``GROUP BY by, time_bucket/date_trunc``. Ray Data has
    no event-time windowing primitive (SURVEY.md §2.9); this is the
    composition it recommends for historical stream-shaped tables.

    Returns one row per (by, window_start) with ``n_rows`` / ``sum_v``
    / ``mean_v`` columns.
    """
    width_us = int(width.total_seconds() * 1_000_000)
    origin64 = pd.Timestamp(origin).to_datetime64()

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        off = (df[order].to_numpy() - origin64).astype("timedelta64[us]").astype("int64")
        win = off // width_us
        df = df.assign(window_start=pd.Series(
            origin64 + (win * width_us).astype("timedelta64[us]"), index=df.index
        ))
        g = df.groupby([by, "window_start"], as_index=False)
        out = g.agg(n_rows=(value, "size"), sum_v=(value, "sum"), mean_v=(value, "mean"))
        keep = ["n_rows"] if "count" in aggs else []
        if "sum" in aggs:
            keep.append("sum_v")
        if "mean" in aggs:
            keep.append("mean_v")
        return out[[by, "window_start"] + keep]

    return partitioned_apply(ds, by, fn, num_partitions)


def rolling_range_agg(ds, *, by: str, order: str, value: str | None, window: pd.Timedelta,
                      agg: str = "count", tiebreak: str | None = None,
                      num_partitions: int = DEFAULT_PARTITIONS, out_col: str | None = None):
    """Rolling aggregate over the time range ``[t - window, t]`` per entity.

    Semantics match SQL ``RANGE BETWEEN window PRECEDING AND CURRENT
    ROW`` exactly — including *peer rows*: every row whose timestamp
    equals the current row's is inside the frame, which pandas'
    ``rolling`` cannot express; implemented with two vectorized
    ``searchsorted`` bounds per entity over prefix sums.
    """
    if agg not in ("count", "sum", "mean"):
        raise ValueError("agg must be count/sum/mean")
    out_col = out_col or f"{value or 'rows'}_{agg}_{int(window.total_seconds())}s"

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = _sorted(df, by, order, tiebreak)
        results = np.empty(len(df), dtype=np.float64)
        pos = 0
        for _, g in df.groupby(by, sort=False):
            ts = g[order].to_numpy()
            lo = np.searchsorted(ts, ts - window, side="left")
            hi = np.searchsorted(ts, ts, side="right")  # includes ts-peers
            n = hi - lo
            if agg == "count":
                out = n.astype(np.float64)
            else:
                csum = np.concatenate([[0.0], np.cumsum(g[value].to_numpy(dtype=np.float64))])
                s = csum[hi] - csum[lo]
                out = s if agg == "sum" else s / np.maximum(n, 1)
            results[pos : pos + len(g)] = out
            pos += len(g)
        df[out_col] = results
        if agg == "count":
            df[out_col] = df[out_col].astype("int64")
        return df

    return partitioned_apply(ds, by, fn, num_partitions)


def rolling_rows_agg(ds, *, by: str, order: str, value: str, k: int,
                     agg: str = "sum", tiebreak: str | None = None,
                     num_partitions: int = DEFAULT_PARTITIONS,
                     out_col: str | None = None):
    """Rolling aggregate over the last ``k`` PHYSICAL rows plus the
    current one per entity — SQL ``ROWS BETWEEN k PRECEDING AND
    CURRENT ROW`` (the positional counterpart of
    :func:`rolling_range_agg`'s RANGE frame).  ROWS frames depend on
    the physical order, so ``tiebreak`` must pin a total order — same
    discipline as the rank family.  Vectorized per entity with one
    prefix-sum + clamped index diff."""
    if agg not in ("count", "sum", "mean"):
        raise ValueError("agg must be count/sum/mean")
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    out_col = out_col or f"{value}_{agg}_{k}rows"

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = _sorted(df, by, order, tiebreak)
        results = np.empty(len(df), dtype=np.float64)
        pos = 0
        for _, g in df.groupby(by, sort=False):
            i = np.arange(len(g))
            lo = np.maximum(0, i - k)
            n = i - lo + 1
            if agg == "count":
                out = n.astype(np.float64)
            else:
                csum = np.concatenate(
                    [[0.0], np.cumsum(g[value].to_numpy(dtype=np.float64))])
                s = csum[i + 1] - csum[lo]
                out = s if agg == "sum" else s / n
            results[pos:pos + len(g)] = out
            pos += len(g)
        df[out_col] = results
        if agg == "count":
            df[out_col] = df[out_col].astype("int64")
        return df

    return partitioned_apply(ds, by, fn, num_partitions)


def hopping_window_agg(ds, *, by: str, order: str, value: str, width: pd.Timedelta,
                       hop: pd.Timedelta, origin: pd.Timestamp,
                       aggs: tuple[str, ...] = ("count", "sum"),
                       num_partitions: int = DEFAULT_PARTITIONS):
    """Hopping (sliding, overlapping) event-time windows per entity:
    width ``width``, advancing every ``hop`` (``width = m × hop``
    required). Each row is REPLICATED to its m covering windows with a
    vectorized projection — rows expand ×m before the same grouped
    aggregate tumbling uses, so the shuffle grows by the overlap
    factor, never the driver. SQL equivalent: GROUP BY time_bucket
    minus i·hop over an unnested hop index.
    """
    width_us = int(width.total_seconds() * 1_000_000)
    hop_us = int(hop.total_seconds() * 1_000_000)
    if width_us % hop_us:
        raise ValueError("width must be an integer multiple of hop")
    m = width_us // hop_us
    origin64 = pd.Timestamp(origin).to_datetime64()

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        off = (df[order].to_numpy() - origin64).astype("timedelta64[us]").astype("int64")
        base = (off // hop_us) * hop_us  # latest covering window start
        frames = []
        for i in range(m):
            w = df[[by, value]].copy()
            w["window_start"] = pd.Series(
                origin64 + (base - i * hop_us).astype("timedelta64[us]"),
                index=df.index)
            frames.append(w)
        allw = pd.concat(frames, ignore_index=True)
        g = allw.groupby([by, "window_start"], as_index=False)
        out = g.agg(n_rows=(value, "size"), sum_v=(value, "sum"), mean_v=(value, "mean"))
        keep = ["n_rows"] if "count" in aggs else []
        if "sum" in aggs:
            keep.append("sum_v")
        if "mean" in aggs:
            keep.append("mean_v")
        return out[[by, "window_start"] + keep]

    return partitioned_apply(ds, by, fn, num_partitions)


def window_ranks(ds, *, by: str, order: str, tiebreak: str,
                 num_partitions: int = DEFAULT_PARTITIONS):
    """The SQL rank-function family per entity partition: RANK,
    DENSE_RANK, ROW_NUMBER, CUME_DIST, PERCENT_RANK ordered by
    ``order`` (ROW_NUMBER additionally tie-broken by ``tiebreak`` so it
    is total-order deterministic).  One hash shuffle on the entity key;
    inside a partition everything is vectorized ``groupby.rank`` /
    ``cumcount`` — ties share RANK/DENSE_RANK exactly like the SQL
    window semantics the oracle runs.  PERCENT_RANK of a single-row
    partition is 0 (the SQL definition's 0/0 case)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([by, order, tiebreak], kind="mergesort")
        g = df.groupby(by, sort=False)[order]
        rnk = g.rank(method="min").astype("int64")
        n = g.transform("size").astype("int64")
        df = df.copy()
        df["rnk"] = rnk
        df["drnk"] = g.rank(method="dense").astype("int64")
        df["rn"] = df.groupby(by, sort=False).cumcount() + 1
        df["cd"] = g.rank(method="max") / n
        df["pr"] = np.where(n > 1, (rnk - 1) / np.maximum(n - 1, 1), 0.0)
        return df

    return partitioned_apply(ds, by, fn, num_partitions)


def top_n_per_group(ds, *, by: str, order_cols: list[str], ascending: list[bool],
                    n: int, num_partitions: int = DEFAULT_PARTITIONS):
    """Deterministic top-n rows per entity (SQL ROW_NUMBER ≤ n): one
    hash shuffle on the entity key, then a vectorized partition-local
    sort + ``groupby.head`` — never a global sort, never a driver
    collect. ``order_cols``/``ascending`` must pin total order
    (include a tiebreak column)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(order_cols, ascending=ascending, kind="mergesort")
                  .groupby(by, sort=False).head(n))

    return partitioned_apply(ds, by, fn, num_partitions)


def ntile(ds, *, by: str, order: str, tiebreak: str, n: int,
          out_col: str = "tile", num_partitions: int = DEFAULT_PARTITIONS):
    """SQL ``NTILE(n)`` per entity partition with a pinned total order
    (``order`` then ``tiebreak``): the first ``count % n`` tiles get
    ``count // n + 1`` rows, the rest ``count // n`` — bit-for-bit the
    SQL remainder-to-leading-tiles rule. One hash shuffle on the
    entity key; inside a partition the tile assignment is pure numpy
    arithmetic on the row number (no loops, no quantile estimation).
    """

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([by, order, tiebreak], kind="mergesort").copy()
        rn0 = df.groupby(by, sort=False).cumcount().to_numpy()
        c = df.groupby(by, sort=False)[order].transform("size").to_numpy()
        small = c // n
        n_large = c % n
        boundary = n_large * (small + 1)
        in_large = rn0 < boundary
        small_safe = np.maximum(small, 1)
        df[out_col] = np.where(
            in_large,
            rn0 // (small + 1) + 1,
            n_large + (rn0 - boundary) // small_safe + 1,
        ).astype(np.int64)
        return df

    return partitioned_apply(ds, by, fn, num_partitions)
