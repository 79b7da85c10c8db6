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


def _minmax_prepass(ds, value: str, what: str) -> tuple[float, float]:
    """Exact Min/Max pre-pass shared by every histogram-sketch op.

    On an empty input (or a column that is all-null) Ray's aggregate
    returns ``None`` — raise a clear ``ValueError`` here instead of
    letting ``float(None)`` throw an opaque TypeError (and the finish
    steps index ``cum[-1]`` on an empty histogram) downstream.
    """
    from ray.data.aggregate import Max, Min

    stats = ds.aggregate(Min(value), Max(value))
    mn = None if stats is None else stats.get(f"min({value})")
    mx = None if stats is None else stats.get(f"max({value})")
    if mn is None or mx is None or (isinstance(mn, float) and math.isnan(mn)):
        raise ValueError(
            f"{what}: histogram sketch over an empty dataset "
            f"(no rows with a non-null {value!r} column)")
    return float(mn), float(mx)


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


def grouped_quantiles_approx(
    ds,
    *,
    keys: str | list[str],
    value: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
    n_bins: int = 1024,
    num_partitions: int = 16,
):
    """Approximate grouped quantiles for CONTINUOUS value domains via a
    deterministic fixed-bin histogram CDF — the scale-safe complement
    to :func:`grouped_quantiles_exact` (whose exchange is bounded by
    the number of *distinct* values, useless for floats at 100 TB).

    Two passes over the input lineage:

    1. exact global ``min``/``max`` of ``value`` (a tiny aggregate);
    2. per-batch partial histogram — one row per (group, bin), so the
       exchange moves ≤ batches × groups × ``n_bins`` counter rows and
       NEVER raw rows — merged per group with one hash partition
       (``temporal.core.partitioned_apply``; Ray's sort-aggregate is
       avoided per the high-cardinality-key rule, BASELINE.md round 3).

    Determinism & SQL replay: the bin rule is pinned to
    ``min(n_bins-1, floor((v - mn) * n_bins / (mx - mn)))`` evaluated
    in IEEE float64 exactly as DuckDB evaluates the same expression,
    merge is pointwise integer addition (associative/commutative ⇒
    partition-invariant), and the reported quantile is the LOWER EDGE
    of the first bin whose cumulative count reaches rank
    ``ceil(q·n)``, rounded to 6 dp — so a SQL oracle rebuilds the
    histogram bit-for-bit (the way ``hll_distinct_tokens`` replays HLL
    registers).

    Error bound: the true q-quantile lies inside the chosen bin, so
    ``|approx − exact| ≤ (mx − mn) / n_bins`` (property-tested in
    ``tests/test_round4_ops.py``).

    Output columns: the keys, ``q{percent}`` per quantile, ``n_rows``.
    """

    from ..temporal.core import partitioned_apply

    keys = [keys] if isinstance(keys, str) else list(keys)
    qcols = [f"q{int(round(q * 100))}" for q in qs]
    if len(set(qcols)) != len(qcols):
        raise ValueError("quantiles collide after percent rounding")
    B = int(n_bins)
    if B < 2:
        raise ValueError(f"n_bins must be >= 2, got {B}")

    mn, mx = _minmax_prepass(ds, value, "grouped_quantiles_approx")
    span = mx - mn

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[value].to_numpy(dtype=np.float64)
        if span > 0:
            # same operation ORDER as the SQL replay: (v-mn)*B first,
            # then the divide — IEEE doubles make the two bit-identical
            b = np.minimum(np.floor((v - mn) * B / span), B - 1).astype(np.int64)
        else:
            b = np.zeros(len(v), dtype=np.int64)
        g = batch[keys].copy()
        g["bin"] = b
        return (g.groupby(keys + ["bin"], as_index=False).size()
                .rename(columns={"size": "cnt"}))

    def finish(part: pd.DataFrame) -> pd.DataFrame:
        merged = part.groupby(keys + ["bin"], as_index=False)["cnt"].sum()
        rows = []
        for gk, g in merged.groupby(keys, sort=False):
            g = g.sort_values("bin", kind="mergesort")
            cum = g["cnt"].to_numpy().cumsum()
            n = int(cum[-1])
            bins = g["bin"].to_numpy()
            row = dict(zip(keys, gk if isinstance(gk, tuple) else (gk,)))
            for q, name in zip(qs, qcols):
                rank = max(1, math.ceil(q * n))
                lo_bin = int(bins[int(np.searchsorted(cum, rank))])
                row[name] = round(mn + span * lo_bin / B, 6)
            row["n_rows"] = n
            rows.append(row)
        return pd.DataFrame(rows)

    partials = ds.map_batches(partial, batch_format="pandas")
    return partitioned_apply(partials, keys, finish,
                             num_partitions=num_partitions)


def dd_quantiles(
    ds,
    *,
    value: str,
    keys: str | list[str] | None = None,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
    relative_accuracy: float = 0.01,
    decimals: int = 6,
):
    """Mergeable log-bucket quantile sketch (DDSketch; Masson, Rim &
    Lee, VLDB 2019) for UNBOUNDED / heavy-tailed continuous domains —
    the member of the sketch family the fixed-bin histogram cannot
    cover: :func:`grouped_quantiles_approx` needs a min/max pre-pass
    and spreads its bins over the full observed range, so one
    adversarial outlier collapses every bin's resolution (pinned by
    the outlier-robustness pytest the histogram path fails). DDSketch
    buckets are LOGARITHMIC — ``idx = ceil(ln(v) / ln(gamma))`` with
    ``gamma = (1 + a) / (1 - a)`` — so the q-quantile estimate
    ``2·gamma^idx / (gamma + 1)`` (the bucket's log-space midpoint)
    carries a RELATIVE error guarantee ``|est − x_q| ≤ a·x_q``
    regardless of the value range: an outlier adds one bucket, it
    does not steal resolution from the rest of the distribution.

    Chosen over KLL / t-digest deliberately: KLL's compactions are
    randomized and t-digest's centroids depend on arrival order,
    while the DDSketch state is a pure (store, idx) → count map whose
    merge is pointwise integer addition — commutative, associative,
    partition-invariant (pinned by pytest), and exactly replayable in
    SQL the way ``hll_distinct_tokens`` replays HLL registers. No
    pre-pass: ONE streaming pass over the input.

    Scale shape: the per-batch partial is a tiny (keys, store, idx)
    count cube — for any float64 input the index magnitude is bounded
    by ``|ln(v)|max / ln(gamma)`` (≈ 74k buckets at a = 1%, ~3k in
    practice), so partials are merged on the driver (the bounded
    counts-cube pattern, see ``featsel._counts_cube``) and raw rows
    never shuffle. Negative values go to a mirrored store and zeros
    to a dedicated counter, so the sketch totally orders the real
    line: store −1 (idx descending), 0, +1 (idx ascending).

    Output: the keys (if any), ``q{percent}`` per requested quantile
    rounded to ``decimals``, and ``n_rows``. The rank rule matches
    the histogram sketch: first bucket whose cumulative count reaches
    ``max(1, ceil(q·n))``.
    """
    import ray.data as rd

    a = float(relative_accuracy)
    if not 0.0 < a < 1.0:
        raise ValueError(f"relative_accuracy must be in (0, 1), got {a}")
    gamma = (1.0 + a) / (1.0 - a)
    lg = math.log(gamma)  # scalar libm log, same operand as SQL ln(gamma)
    keys = [keys] if isinstance(keys, str) else list(keys or [])
    qcols = [f"q{int(round(q * 100))}" for q in qs]
    if len(set(qcols)) != len(qcols):
        raise ValueError("quantiles collide after percent rounding")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        keep = batch[value].notna().to_numpy()
        batch = batch[keep] if not keep.all() else batch
        v = batch[value].to_numpy(dtype=np.float64)
        store = np.sign(v).astype(np.int64)
        idx = np.zeros(len(v), dtype=np.int64)
        pos = store != 0
        # ceil(ln(|v|)/ln(gamma)): the paper's index rule, evaluated in
        # IEEE float64 exactly as the SQL replay evaluates
        # ceil(ln(v)/ln(g)) — identical operands → identical libm
        idx[pos] = np.ceil(np.log(np.abs(v[pos])) / lg).astype(np.int64)
        g = batch[keys].copy() if keys else pd.DataFrame(index=batch.index)
        g["store"], g["idx"] = store, idx
        return (g.groupby(keys + ["store", "idx"], as_index=False).size()
                .rename(columns={"size": "cnt"}))

    # bounded counts-cube merge on the driver: keys × (≤ ~3k buckets)
    # rows total, never raw input rows (BASELINE.md high-cardinality
    # groupby rule — Ray's sort-aggregate is slower than a driver
    # pandas merge at this size)
    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if not len(parts):
        raise ValueError(
            f"dd_quantiles over an empty dataset (no rows with a "
            f"non-null {value!r} column)")
    cube = parts.groupby(keys + ["store", "idx"], as_index=False)["cnt"].sum()
    # total order over the real line: store asc, then idx desc in the
    # negative store / asc in the positive store
    cube["okey"] = (cube["store"] * (1 << 32)
                    + np.where(cube["store"] < 0, -cube["idx"],
                               np.where(cube["store"] > 0, cube["idx"], 0)))

    def bucket_value(store: int, idx: int) -> float:
        if store == 0:
            return 0.0
        return float(store) * (2.0 * gamma ** idx / (gamma + 1.0))

    rows = []
    grouped = cube.groupby(keys, sort=True) if keys else [((), cube)]
    for gk, g in grouped:
        g = g.sort_values("okey", kind="mergesort")
        cum = g["cnt"].to_numpy().cumsum()
        n = int(cum[-1])
        row = dict(zip(keys, gk if isinstance(gk, tuple) else (gk,)))
        for q, name in zip(qs, qcols):
            rank = max(1, math.ceil(q * n))
            j = int(np.searchsorted(cum, rank))
            row[name] = round(bucket_value(int(g["store"].iloc[j]),
                                           int(g["idx"].iloc[j])),
                              decimals) + 0.0
        row["n_rows"] = n
        rows.append(row)
    out = pd.DataFrame(rows, columns=keys + qcols + ["n_rows"])
    return rd.from_pandas(out)


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


def winsorize(ds, *, value: str, lo_q: float = 0.05, hi_q: float = 0.95,
              n_bins: int = 1024, out_col: str | None = None):
    """Winsorization (outlier clipping) of a CONTINUOUS column at
    approximate quantiles from the same deterministic fixed-bin
    histogram sketch as :func:`grouped_quantiles_approx` — the
    scale-safe fit for unbounded float domains (the exact value-count
    path is bounded by DISTINCT values, useless here).

    Fit: exact global min/max, one histogram pass (a single global
    group → the driver merge is ≤ ``n_bins`` counter rows), clip
    edges = lower edge of the bin holding rank ``ceil(q·n)``, rounded
    6 dp. Transform: one stateless vectorized ``map_batches`` clip.
    The SQL oracle rebuilds the identical histogram and clip edges.
    """

    out_col = out_col or f"{value}_w"
    B = int(n_bins)
    mn, mx = _minmax_prepass(ds, value, "histogram sketch")
    span = mx - mn

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[value].to_numpy(dtype=np.float64)
        if span > 0:
            b = np.minimum(np.floor((v - mn) * B / span), B - 1).astype(np.int64)
        else:
            b = np.zeros(len(v), dtype=np.int64)
        u, c = np.unique(b, return_counts=True)
        return pd.DataFrame({"bin": u, "cnt": c})

    hist = (ds.map_batches(partial, batch_format="pandas")
            .to_pandas()
            .groupby("bin", as_index=False)["cnt"].sum()
            .sort_values("bin"))
    cum = hist["cnt"].to_numpy().cumsum()
    n = int(cum[-1])
    bins = hist["bin"].to_numpy()

    def edge(q: float) -> float:
        rank = max(1, math.ceil(q * n))
        return round(mn + span * int(bins[int(np.searchsorted(cum, rank))]) / B, 6)

    lo, hi = edge(lo_q), edge(hi_q)

    def clip(batch: pd.DataFrame) -> pd.DataFrame:
        batch[out_col] = np.clip(batch[value].to_numpy(dtype=np.float64), lo, hi)
        return batch

    return ds.map_batches(clip, batch_format="pandas")


def ks_drift(ds, *, group_col: str, value: str, a: str, b: str,
             n_bins: int = 1024, decimals: int = 6):
    """Two-sample Kolmogorov–Smirnov drift statistic between groups
    ``a`` and ``b`` of ``group_col`` over ``value`` — the standard
    distribution-shift check between two corpus slices (old vs new
    crawl, source A vs B) before mixing training data.

    Computed on the same deterministic fixed-bin histogram sketch as
    :func:`grouped_quantiles_approx`: exact shared min/max over both
    groups, one per-batch partial histogram per (group, bin) — the
    exchange is ≤ 2·``n_bins`` counter rows per batch, never raw rows
    — then the empirical-CDF max-gap on the tiny merged table. The
    discretization error is bounded by the histogram resolution; the
    SQL oracle rebuilds the identical binning, cumulative sums and
    max-gap. Returns a one-row dataset: ``ks_stat``, ``n_a``, ``n_b``.
    """
    import ray.data as rd

    B = int(n_bins)
    sides = {a, b}

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        # vectorized isin instead of interpolating the labels into a
        # filter-expression string: labels containing quotes must not
        # break (or inject into) the expression parser
        return batch[batch[group_col].isin(sides)]

    two = ds.map_batches(keep, batch_format="pandas")
    mn, mx = _minmax_prepass(two, value, "ks_drift")
    span = mx - mn

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[value].to_numpy(dtype=np.float64)
        if span > 0:
            bins = np.minimum(np.floor((v - mn) * B / span), B - 1).astype(np.int64)
        else:
            bins = np.zeros(len(v), dtype=np.int64)
        g = pd.DataFrame({"side": batch[group_col].to_numpy(), "bin": bins})
        out = g.groupby(["side", "bin"], as_index=False).size()
        return out.rename(columns={"size": "cnt"})

    hist = two.map_batches(partial, batch_format="pandas").to_pandas() \
              .groupby(["side", "bin"], as_index=False)["cnt"].sum()
    grid = np.sort(hist["bin"].unique())
    cdfs, ns = {}, {}
    for side in (a, b):
        h = hist[hist["side"] == side].set_index("bin")["cnt"] \
            .reindex(grid, fill_value=0).to_numpy()
        ns[side] = int(h.sum())
        if ns[side] == 0:
            raise ValueError(
                f"ks_drift: group {side!r} has zero rows in "
                f"{group_col!r} — cannot form its empirical CDF")
        cdfs[side] = h.cumsum() / float(h.sum())
    stat = round(float(np.max(np.abs(cdfs[a] - cdfs[b]))), decimals)
    return rd.from_pandas(pd.DataFrame(
        {"ks_stat": [stat], "n_a": [ns[a]], "n_b": [ns[b]]}))


def robust_scale(ds, *, value: str, n_bins: int = 1024,
                 out_col: str | None = None, decimals: int = 6):
    """Robust (median/IQR) scaling of a CONTINUOUS column:
    ``out = (v - q50) / (q75 - q25)`` with the three quantiles taken
    from the same deterministic fixed-bin histogram sketch as
    :func:`winsorize` — outlier-insensitive where z-score
    (:func:`~pic2vec_ray.stages.encode.standardize`) is not, and
    scale-safe on unbounded float domains where the exact value-count
    path is not. Edges are rounded to ``decimals`` BEFORE use so the
    SQL oracle replays the transform bit-for-bit.
    """

    out_col = out_col or f"{value}_rs"
    B = int(n_bins)
    mn, mx = _minmax_prepass(ds, value, "histogram sketch")
    span = mx - mn

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[value].to_numpy(dtype=np.float64)
        if span > 0:
            b = np.minimum(np.floor((v - mn) * B / span), B - 1).astype(np.int64)
        else:
            b = np.zeros(len(v), dtype=np.int64)
        u, c = np.unique(b, return_counts=True)
        return pd.DataFrame({"bin": u, "cnt": c})

    hist = (ds.map_batches(partial, batch_format="pandas")
            .to_pandas()
            .groupby("bin", as_index=False)["cnt"].sum()
            .sort_values("bin"))
    cum = hist["cnt"].to_numpy().cumsum()
    n = int(cum[-1])
    bins = hist["bin"].to_numpy()

    def edge(q: float) -> float:
        rank = max(1, math.ceil(q * n))
        return round(mn + span * int(bins[int(np.searchsorted(cum, rank))]) / B,
                     decimals)

    q25, q50, q75 = edge(0.25), edge(0.50), edge(0.75)
    iqr = q75 - q25
    if iqr == 0:
        iqr = 1.0  # degenerate distribution: pass values through centered

    def scale(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[value].to_numpy(dtype=np.float64)
        batch[out_col] = np.round((v - q50) / iqr, decimals)
        return batch

    return ds.map_batches(scale, batch_format="pandas")


def ks_drift_windows(ds, *, ts_col: str, value: str, freq: str = "D",
                     n_bins: int = 1024, decimals: int = 6):
    """Distribution-drift MONITOR: the two-sample KS statistic between
    every pair of CONSECUTIVE event-time windows of ``value`` — the
    composition of the engine's window assignment and the
    :func:`ks_drift` histogram machinery that an ingest pipeline runs
    daily to catch upstream shifts.

    One global min/max pass, one per-(window, bin) partial-histogram
    pass (exchange ≤ windows × n_bins counter rows), consecutive-pair
    CDF max-gaps on the tiny merged table (driver work bounded by the
    window count). Output per consecutive pair: ``win`` (later window
    start), ``prev_win``, ``ks_stat``, ``n_prev``, ``n_cur``.
    """
    import ray.data as rd

    B = int(n_bins)
    mn, mx = _minmax_prepass(ds, value, "histogram sketch")
    span = mx - mn

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[value].to_numpy(dtype=np.float64)
        if span > 0:
            bins = np.minimum(np.floor((v - mn) * B / span), B - 1).astype(np.int64)
        else:
            bins = np.zeros(len(v), dtype=np.int64)
        g = pd.DataFrame({"win": batch[ts_col].dt.floor(freq), "bin": bins})
        return g.groupby(["win", "bin"], as_index=False).size() \
                .rename(columns={"size": "cnt"})

    hist = (ds.map_batches(partial, batch_format="pandas").to_pandas()
            .groupby(["win", "bin"], as_index=False)["cnt"].sum())
    wins = np.sort(hist["win"].unique())
    out = []
    for prev, cur in zip(wins[:-1], wins[1:]):
        pair = hist[hist["win"].isin([prev, cur])]
        grid = np.sort(pair["bin"].unique())
        cdfs, ns = {}, {}
        for w in (prev, cur):
            h = pair[pair["win"] == w].set_index("bin")["cnt"] \
                .reindex(grid, fill_value=0).to_numpy()
            ns[w] = int(h.sum())
            cdfs[w] = h.cumsum() / float(h.sum())
        out.append({
            "win": cur, "prev_win": prev,
            "ks_stat": round(float(np.max(np.abs(cdfs[cur] - cdfs[prev]))),
                             decimals),
            "n_prev": ns[prev], "n_cur": ns[cur],
        })
    return rd.from_pandas(pd.DataFrame(
        out, columns=["win", "prev_win", "ks_stat", "n_prev", "n_cur"]))


def iqr_outliers(ds, *, keys: str | list[str], value: str,
                 factor: float = 1.5):
    """Tukey IQR outlier flags per group: a row is an outlier when its
    value falls outside ``[q25 − f·IQR, q75 + f·IQR]`` of its group —
    the standard robust cleaning rule before feature scaling.

    Fit: per-batch (group, value) counts → one bounded driver merge
    (same contract as the exact-quantile family: the DISTINCT value
    domain must be bounded — decimal-quantized columns are, continuous
    floats should use the approx/histogram path), quantile = the
    ceil-rank discrete definition shared with
    :func:`grouped_quantiles_exact` / SQL ``quantile_disc``.
    Transform: one stateless vectorized flag per batch.  Both engines
    compute the bounds from identical doubles, so the comparison is
    bit-reproducible."""
    keys = [keys] if isinstance(keys, str) else list(keys)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(keys + [value], as_index=False).size()
        return g.rename(columns={"size": "cnt"})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    cube = parts.groupby(keys + [value], as_index=False).cnt.sum()

    bounds: dict = {}
    for gk, g in cube.groupby(keys[0] if len(keys) == 1 else keys):
        g = g.sort_values(value, kind="mergesort")
        cum = g.cnt.to_numpy().cumsum()
        n = int(cum[-1])
        vals = g[value].to_numpy()

        def q_disc(q: float) -> float:
            rank = max(1, math.ceil(q * n))
            return float(vals[int(np.searchsorted(cum, rank))])

        q25, q75 = q_disc(0.25), q_disc(0.75)
        iqr = q75 - q25
        bounds[gk] = (q25 - factor * iqr, q75 + factor * iqr)

    def flag(batch: pd.DataFrame) -> pd.DataFrame:
        gv = (batch[keys[0]] if len(keys) == 1
              else list(zip(*(batch[k] for k in keys))))
        lo = pd.Series(gv).map(lambda g: bounds[g][0]).to_numpy(np.float64)
        hi = pd.Series(gv).map(lambda g: bounds[g][1]).to_numpy(np.float64)
        v = batch[value].to_numpy(np.float64)
        batch["is_outlier"] = (v < lo) | (v > hi)
        return batch

    return ds.map_batches(flag, batch_format="pandas")


def ecdf_transform(ds, *, value: str, n_bins: int = 1024,
                   out_col: str | None = None, decimals: int = 6):
    """Approximate ECDF (quantile) transform: map each value to its
    empirical cumulative fraction — the rank-based feature scaling
    (uniformizes any distribution) — via the SAME pinned fixed-bin
    histogram rule as :func:`grouped_quantiles_approx`, so it stays
    scale-safe on continuous columns (the exchange moves ≤ batches ×
    n_bins counter rows, never raw rows, and the exact-rank
    alternative's distinct-value CDF hazard never appears).

    ``ecdf(v) = cum_count(bin(v)) / n`` (inclusive), resolution 1/B of
    the value span; bin rule and operation order are bit-identical to
    the SQL replay.  Transform is one stateless map with the
    1024-entry cumulative table riding the closure."""

    out_col = out_col or f"{value}_ecdf"
    B = int(n_bins)
    if B < 2:
        raise ValueError(f"n_bins must be >= 2, got {B}")

    mn, mx = _minmax_prepass(ds, value, "ecdf_transform")
    span = mx - mn

    def _bins(v: np.ndarray) -> np.ndarray:
        if span > 0:
            return np.minimum(np.floor((v - mn) * B / span),
                              B - 1).astype(np.int64)
        return np.zeros(len(v), dtype=np.int64)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = _bins(batch[value].to_numpy(np.float64))
        cnt = np.bincount(b, minlength=B)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"bin": nz.astype(np.int64), "cnt": cnt[nz]})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    counts = np.zeros(B, dtype=np.int64)
    agg = parts.groupby("bin").cnt.sum()
    counts[agg.index.to_numpy()] = agg.to_numpy()
    cum = counts.cumsum()
    n = float(cum[-1])

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        b = _bins(batch[value].to_numpy(np.float64))
        batch[out_col] = np.round(cum[b].astype(np.float64) / n, decimals)
        return batch

    return ds.map_batches(assign, batch_format="pandas")
