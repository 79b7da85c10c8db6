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


def ewma_range(ds, *, by: str, order: str, value: str, window: pd.Timedelta,
               halflife: pd.Timedelta, tiebreak: str | None = None,
               num_partitions: int = DEFAULT_PARTITIONS,
               out_col: str | None = None, decimals: int = 6,
               _scale: int = 10_000):
    """Time-decayed exponentially weighted mean over the RANGE frame
    ``[t − window, t]`` per entity::

        ewma_i = Σ_j v_j·w_ij / Σ_j w_ij,   w_ij = exp(−dt_ij / τ)

    with ``τ = halflife / ln 2`` and ``dt_ij = t_i − t_j`` (peers at
    dt = 0 get weight 1; like ``rolling_range_agg``, ALL timestamp
    peers are in frame, so no tiebreak dependence).  The recency-decay
    sibling of the flat rolling mean — the standard "recent behavior
    matters more" feature.

    Exactness contract: each addend is quantized to 1/_scale units
    (``round(w·s)`` / ``round(v·w·s)`` as int64) and the two frame sums
    are INTEGER sums — order-invariant, so the SQL oracle's unordered
    SUM() over a windowed self-join reproduces ``num``, ``den`` and the
    final ``round(num/den, decimals)`` exactly (numpy's vectorized
    exp() and libm's can disagree by 1 ulp; the quantum absorbs it —
    flip probability ~1e-12 per addend, measured).

    Scale shape: one entity hash exchange; per entity the pair count is
    Σ window occupancy (bounded by rows × the entity's max events per
    ``window``), built with vectorized searchsorted + repeat — no
    Python loop over rows.  Output: input columns +
    ``{out_col}_micro{decimals}`` (int64 — the ratio at 10^decimals
    scale, rounded half-away in exact integer arithmetic) +
    ``{out_col}_n`` (int64 frame size)."""
    out_col = out_col or f"{value}_ewma_{int(window.total_seconds())}s"
    tau_us = halflife.total_seconds() * 1e6 / np.log(2.0)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = _sorted(df, by, order, tiebreak)
        num = np.empty(len(df), dtype=np.float64)
        den = np.empty(len(df), dtype=np.float64)
        cnt = np.empty(len(df), dtype=np.int64)
        pos = 0
        for _, g in df.groupby(by, sort=False):
            ts = g[order].to_numpy()
            v = g[value].to_numpy(dtype=np.float64)
            lo = np.searchsorted(ts, ts - window, side="left")
            hi = np.searchsorted(ts, ts, side="right")  # ts-peers in frame
            n = hi - lo
            total = int(n.sum())
            ii = np.repeat(np.arange(len(g)), n)
            offs = np.concatenate([[0], np.cumsum(n)[:-1]])
            jj = np.arange(total) - np.repeat(offs, n) + np.repeat(lo, n)
            dt = (ts[ii] - ts[jj]).astype("timedelta64[us]").astype(np.int64)
            w = np.exp(-(dt.astype(np.float64)) / tau_us)
            aw = np.round(w * _scale)            # int-valued doubles;
            av = np.round(v[jj] * w * _scale)    # sums stay < 2^53 ⇒ exact
            num[pos:pos + len(g)] = np.bincount(ii, weights=av,
                                                minlength=len(g))
            den[pos:pos + len(g)] = np.bincount(ii, weights=aw,
                                                minlength=len(g))
            cnt[pos:pos + len(g)] = n
            pos += len(g)
        # the rounded ratio is emitted as an EXACT integer at 10^decimals
        # scale, computed in integer arithmetic (round half away from
        # zero): a float ratio rounded at 6 dp can land exactly on a
        # .5 boundary where numpy (half-even) and SQL (half-away)
        # disagree — measured once in 10k rows at sf0.01
        S = 10 ** decimals
        num_i = num.astype(np.int64)
        den_i = den.astype(np.int64)
        r = (2 * np.abs(num_i) * S + den_i) // (2 * den_i)
        df[out_col + f"_micro{decimals}"] = np.sign(num_i) * r
        df[out_col + "_n"] = cnt
        return df

    return partitioned_apply(ds, by, fn, num_partitions)


def resample_grid(ds, *, by: str, order: str, value: str, freq: pd.Timedelta,
                  num_partitions: int = DEFAULT_PARTITIONS,
                  out_value: str = "value_ffill"):
    """Resample each entity's irregular timeline onto a regular grid:
    grid points ``first, first+freq, … ≤ last`` per entity (both ends
    anchored at the ENTITY's own first/last timestamp), each carrying
    the last observation at-or-before it (backward as-of).

    Determinism: duplicate timestamps within an entity are collapsed
    FIRST to ``max(value)`` per ``(by, order)`` — an as-of against a
    non-unique right side would make "last row wins" depend on block
    order.  SQL replays with generate_series + ASOF JOIN over the same
    MAX() pre-aggregate.

    Output: ``by``, ``grid_ts``, ``out_value`` — one row per grid
    point per entity.  Scale shape: one entity hash exchange; the grid
    is generated inside the partition (never materialized globally);
    grid size per entity is span/freq, the caller's knob."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = (df.groupby([by, order], as_index=False)[value].max()
              .sort_values([by, order], kind="mergesort"))
        outs = []
        for key, g in df.groupby(by, sort=False):
            grid = pd.date_range(g[order].iloc[0], g[order].iloc[-1],
                                 freq=freq)
            idx = np.searchsorted(g[order].to_numpy(), grid.to_numpy(),
                                  side="right") - 1
            outs.append(pd.DataFrame({
                by: key, "grid_ts": grid,
                out_value: g[value].to_numpy()[idx],
            }))
        if not outs:
            return pd.DataFrame({by: pd.Series([], dtype=df[by].dtype),
                                 "grid_ts": pd.Series([], dtype="datetime64[us]"),
                                 out_value: pd.Series([], dtype="float64")})
        return pd.concat(outs, ignore_index=True)

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
