"""Feature encoding / scaling transforms (classic tabular feature
engineering, fit/transform shape): z-score standardization and
target (mean) encoding.

Both follow the same scale discipline as ``stages/quantiles.py``:
the *fit* pass reduces the corpus to a tiny summary (global moment
scalars; one row per category) with per-batch partials so no raw rows
cross an exchange, the summary is broadcast into a stateless
*transform* ``map_batches``, and the fitted parameters are rounded to
a fixed precision BEFORE use so the SQL oracles reproduce the outputs
bit-for-bit (identical rounded operands → identical doubles; see
``pipelines/queries.py`` SQL_STANDARDIZE / SQL_TARGET_ENCODE).

No reference counterpart (the reference has no tabular feature
tooling); SURVEY.md §2's feature-engineering additions.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd


def standardize(ds, *, value: str, out_col: str | None = None,
                decimals: int = 6):
    """Z-score scaling: ``out = round((v - m) / sd, decimals)`` with
    ``m``/``sd`` the global mean and POPULATION standard deviation,
    each rounded to ``decimals`` before use (the SQL-replayable
    contract).  Fit is one aggregate pass (per-block partial sums —
    three scalars reach the driver); transform is one stateless
    ``map_batches``.  Raises on a constant column (sd = 0)."""
    out_col = out_col or f"{value}_z"

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        v = b[value].to_numpy(dtype=np.float64)
        return pd.DataFrame({"n": [len(v)], "s": [v.sum()],
                             "ss": [(v * v).sum()]})

    tot = ds.map_batches(partial, batch_format="pandas").sum(["n", "s", "ss"])
    n = tot["sum(n)"]
    if not n:
        raise ValueError(f"cannot standardize an empty dataset on {value!r}")
    mean = tot["sum(s)"] / n
    var = tot["sum(ss)"] / n - mean * mean
    sd = math.sqrt(max(var, 0.0))
    m, sd = round(mean, decimals), round(sd, decimals)
    if sd == 0:
        raise ValueError(f"{value!r} is constant (sd = 0); cannot standardize")

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        b[out_col] = np.round((b[value].to_numpy(np.float64) - m) / sd,
                              decimals)
        return b

    return ds.map_batches(assign, batch_format="pandas")


def target_encode(ds, *, key: str, target: str, out_col: str | None = None,
                  decimals: int = 6):
    """Target (mean) encoding: replace/annotate a categorical ``key``
    with ``round(mean(target | key), decimals)``.  Fit: per-batch
    partial (key, sum, count) rows → ONE category-bounded
    ``groupby(key).sum`` — the exchange and the driver-side mapping
    are bounded by the category domain, never the corpus.  Transform:
    one stateless ``map_batches`` dict lookup (the mapping rides the
    closure — broadcast once per task, pennies for any real category
    count)."""
    out_col = out_col or f"{key}_te"

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(key, as_index=False)[target].agg(["sum", "count"])
        return g.rename(columns={"sum": "s", "count": "n"})

    agg = (ds.map_batches(partial, batch_format="pandas")
           .groupby(key).sum(["s", "n"])
           .to_pandas())  # ≤ |category domain| rows by construction
    mapping = {
        k: round(s / n, decimals)
        for k, s, n in zip(agg[key], agg["sum(s)"], agg["sum(n)"])
    }

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        b[out_col] = b[key].map(mapping).astype(np.float64)
        return b

    return ds.map_batches(assign, batch_format="pandas")


def woe_encode(ds, *, key: str, target: str, out_col: str | None = None,
               smoothing: float = 0.5, decimals: int = 6):
    """Weight-of-evidence encoding for a BINARY target:
    ``woe(k) = ln( ((pos_k + s) / (pos + 2s)) / ((neg_k + s) / (neg + 2s)) )``
    with additive smoothing ``s`` so empty cells stay finite — the
    standard credit-scoring / feature-engineering encode.

    Same two-phase shape as :func:`target_encode`: per-batch partial
    (key, positives, rows) → one category-bounded groupby — the
    exchange never moves raw rows. The SQL oracle recomputes the
    identical expression from exact integer counts (both sides call
    the platform ``log`` on identical doubles), rounded to
    ``decimals`` before use.
    """
    out_col = out_col or f"{key}_woe"
    s = float(smoothing)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        t = b[target].to_numpy()
        g = pd.DataFrame({key: b[key].to_numpy(), "p": (t != 0).astype(np.int64)})
        out = g.groupby(key, as_index=False).agg(p=("p", "sum"), n=("p", "size"))
        return out

    agg = (ds.map_batches(partial, batch_format="pandas")
           .groupby(key).sum(["p", "n"])
           .to_pandas())  # ≤ |category domain| rows by construction
    pos_tot = float(agg["sum(p)"].sum())
    neg_tot = float((agg["sum(n)"] - agg["sum(p)"]).sum())
    mapping = {}
    for k, p, n in zip(agg[key], agg["sum(p)"], agg["sum(n)"]):
        pos_rate = (float(p) + s) / (pos_tot + 2 * s)
        neg_rate = (float(n - p) + s) / (neg_tot + 2 * s)
        mapping[k] = round(math.log(pos_rate / neg_rate), decimals)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        b[out_col] = b[key].map(mapping).astype(np.float64)
        return b

    return ds.map_batches(assign, batch_format="pandas")


def onehot_encode(ds, *, key: str, categories: list[str],
                  drop_input: bool = False):
    """One-hot (indicator) expansion of a categorical over a DECLARED
    category list — same restriction as ``relational.pivot_sum``: an
    undeclared-domain one-hot is a schema explosion, so the caller
    pins the columns and anything outside the list simply encodes as
    all-zeros. Purely stateless vectorized ``map_batches``; zero
    shuffle, zero fit pass. Output columns are ``{key}_{slug(cat)}``
    int64 0/1.
    """
    names = [(c, f"{key}_" + re.sub(r"[^0-9a-zA-Z]+", "_", c).strip("_").lower())
             for c in categories]

    def expand(b: pd.DataFrame) -> pd.DataFrame:
        v = b[key].to_numpy()
        for cat, out in names:
            b[out] = (v == cat).astype(np.int64)
        if drop_input:
            b = b.drop(columns=[key])
        return b

    return ds.map_batches(expand, batch_format="pandas")


_HASH_BASE = 1099511628211  # FNV-64 prime; same Horner kernel as
_HASH_MOD = 1 << 64         # stages/text.fingerprint64 (SQL-replayable)


def _horner64(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * _HASH_BASE + ord(ch)) % _HASH_MOD
    return h


def count_encode(ds, *, key: str, out_col: str | None = None):
    """Frequency (count) encoding: annotate each row with the GLOBAL
    occurrence count of its category — the classic high-cardinality
    alternative to one-hot that preserves rarity information.

    Same two-phase shape as :func:`target_encode`: per-batch partial
    (key, count) rows → one category-bounded ``groupby(key).sum`` —
    the exchange moves one row per category per batch, never raw rows.
    Counts are exact integers so there is no rounding contract."""
    out_col = out_col or f"{key}_count"

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(key, as_index=False).size()
        return g.rename(columns={"size": "n"})

    agg = (ds.map_batches(partial, batch_format="pandas")
           .groupby(key).sum(["n"])
           .to_pandas())  # ≤ |category domain| rows by construction
    mapping = dict(zip(agg[key], agg["sum(n)"]))

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        b[out_col] = b[key].map(mapping).astype(np.int64)
        return b

    return ds.map_batches(assign, batch_format="pandas")


def collapse_rare(ds, *, key: str, min_count: int,
                  out_col: str | None = None, other: str = "__other__"):
    """Rare-category collapsing: categories seen fewer than
    ``min_count`` times map to one ``other`` label — the standard
    pre-encode step that keeps one-hot/target encodings from
    overfitting singleton categories.  Same two-phase shape as
    :func:`count_encode`: category-bounded count fit, stateless
    vectorized transform."""
    out_col = out_col or f"{key}_collapsed"

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(key, as_index=False).size()
        return g.rename(columns={"size": "n"})

    agg = (ds.map_batches(partial, batch_format="pandas")
           .groupby(key).sum(["n"])
           .to_pandas())  # ≤ |category domain| rows by construction
    keep = set(agg.loc[agg["sum(n)"] >= min_count, key])

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        v = b[key]
        b[out_col] = v.where(v.isin(keep), other)
        return b

    return ds.map_batches(assign, batch_format="pandas")


def cross_hash_encode(ds, *, keys: list[str], n_buckets: int,
                      out_col: str | None = None, sep: str = "\x1f"):
    """Hashed feature cross: combine N categorical columns into one
    interaction feature by hashing the separator-joined tuple string
    through the pinned Horner kernel, mod ``n_buckets`` — the
    wide-and-deep "crossed column" primitive.  Stateless, zero fit
    pass, zero shuffle; per batch the DISTINCT tuples are hashed once
    (category-product-bounded Python work) and rows map vectorized.
    The SQL oracle replays ``concat_ws(sep, a, b, ...)`` through the
    same ``list_reduce`` hash."""
    out_col = out_col or "_x_".join(keys) + "_bucket"
    B = int(n_buckets)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        joined = b[keys[0]].astype(str)
        for k in keys[1:]:
            joined = joined + sep + b[k].astype(str)
        cats = pd.unique(joined)
        lut = {c: _horner64(c) % B for c in cats}
        b[out_col] = joined.map(lut).astype(np.int64)
        return b

    return ds.map_batches(assign, batch_format="pandas")


def date_features(ds, *, ts: str, cyclic: bool = True, decimals: int = 6):
    """Calendar feature extraction from a timestamp column — the
    standard temporal feature block (year / month / day / ISO weekday /
    hour) plus cyclic sin–cos hour encoding so midnight and 23:00 sit
    adjacent in feature space.  Purely stateless vectorized
    ``map_batches``; the SQL oracle replays EXTRACT + the identical
    ``sin(2π·hour/24)`` expression (identical integer operands → the
    platform libm on identical doubles), rounded to ``decimals``."""

    def extract(b: pd.DataFrame) -> pd.DataFrame:
        d = pd.DatetimeIndex(b[ts])
        b[f"{ts}_year"] = d.year.astype(np.int64)
        b[f"{ts}_month"] = d.month.astype(np.int64)
        b[f"{ts}_day"] = d.day.astype(np.int64)
        b[f"{ts}_isodow"] = (d.dayofweek + 1).astype(np.int64)
        b[f"{ts}_hour"] = d.hour.astype(np.int64)
        if cyclic:
            ang = 2.0 * np.pi * d.hour.to_numpy(np.float64) / 24.0
            b[f"{ts}_hour_sin"] = np.round(np.sin(ang), decimals)
            b[f"{ts}_hour_cos"] = np.round(np.cos(ang), decimals)
        return b

    return ds.map_batches(extract, batch_format="pandas")


def hash_encode(ds, *, key: str, n_buckets: int, out_col: str | None = None):
    """The hashing trick: map an UNBOUNDED categorical into
    ``n_buckets`` integer buckets via a pinned polynomial string hash
    (Horner over codepoints, mod 2^64 — the same kernel as
    ``stages/text.fingerprint64``, so the SQL oracle replays it with
    ``list_reduce``). No fit pass, no vocabulary state, no shuffle:
    the whole encode is one stateless ``map_batches`` that hashes each
    DISTINCT value once per batch (category-bounded Python work) and
    maps rows vectorized — exactly why feature hashing is the
    scale-safe encode when the category domain is unbounded.
    """
    out_col = out_col or f"{key}_bucket"
    B = int(n_buckets)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        cats = pd.unique(b[key])
        lut = {c: _horner64(c) % B for c in cats}
        b[out_col] = b[key].map(lut).astype(np.int64)
        return b

    return ds.map_batches(assign, batch_format="pandas")


def zorder_key(ds, *, x: str, y: str, bits: int = 16,
               out_col: str = "zkey"):
    """Morton (Z-order) interleave of two non-negative integer columns
    into one locality key — sort/partition by it and ranges of BOTH
    columns cluster into contiguous key ranges, so per-file min/max
    statistics prune two-dimensional predicates (the standard
    data-clustering layout trick).  Stateless vectorized bit
    interleave; values are masked to ``bits`` bits each.  The SQL
    oracle replays the interleave arithmetically (shift = // and %)."""
    B = int(bits)
    if not 1 <= B <= 31:
        raise ValueError(f"bits must be in [1, 31], got {B}")

    def key(batch: pd.DataFrame) -> pd.DataFrame:
        xv = batch[x].to_numpy(np.int64) & ((1 << B) - 1)
        yv = batch[y].to_numpy(np.int64) & ((1 << B) - 1)
        z = np.zeros(len(batch), dtype=np.int64)
        for i in range(B):
            z |= ((xv >> i) & 1) << (2 * i)
            z |= ((yv >> i) & 1) << (2 * i + 1)
        batch[out_col] = z
        return batch

    return ds.map_batches(key, batch_format="pandas")


def target_encode_oof(ds, *, key: str, target: str, id_col: str,
                      k: int = 5, out_col: str | None = None,
                      fold_col: str = "fold", decimals: int = 6):
    """OUT-OF-FOLD target encoding — the leakage-free variant of
    :func:`target_encode`: each row's encoding is the target mean of
    its category computed over the OTHER k−1 folds only, so a row's
    own target never leaks into its feature (the north_rule's
    zero-leakage discipline applied to feature engineering; plain
    in-fold mean encoding is the classic CV-overfitting bug).

    Folds come from :func:`split.kfold_assign`'s deterministic hash
    (zero-shuffle, partition-invariant).  Fit reduces the corpus to a
    (category × fold) cube of (Σy, n) — per-batch partials merged on
    the driver (bounded by ``|categories|·k``, the counts-cube
    pattern) — then::

        oof(key, fold) = (S_key − s_{key,fold}) / (N_key − n_{key,fold})

    falling back to the fold-excluded GLOBAL mean when a category
    appears only in the row's own fold.  Transform is one stateless
    ``map_batches`` merge against the broadcast mapping.  Output: the
    input columns + ``fold_col`` (int64) + ``out_col`` (rounded)."""
    from .split import _KFOLD_MULT, _MOD32

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    out_col = out_col or f"{key}_te_oof"

    def fold_of(ids: np.ndarray) -> np.ndarray:
        h = (ids.astype(np.uint64) * _KFOLD_MULT) & _MOD32
        return (h % np.uint64(k)).astype(np.int64)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b[[key, target]].copy()
        g[fold_col] = fold_of(b[id_col].to_numpy())
        agg = g.groupby([key, fold_col], as_index=False)[target] \
               .agg(["sum", "count"])
        return agg.rename(columns={"sum": "s", "count": "n"})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    cube = parts.groupby([key, fold_col], as_index=False)[["s", "n"]].sum()
    tot = cube.groupby(key)[["s", "n"]].sum()  # per-category totals
    gf = cube.groupby(fold_col)[["s", "n"]].sum()  # per-fold totals
    GS, GN = float(cube.s.sum()), float(cube.n.sum())

    cell = {(c, int(f)): (float(s), int(n))
            for c, f, s, n in zip(cube[key], cube[fold_col],
                                  cube["s"], cube["n"])}
    mapping = {}
    for cat in tot.index:
        S, N = float(tot.loc[cat, "s"]), int(tot.loc[cat, "n"])
        for f in range(k):
            s, n = cell.get((cat, f), (0.0, 0))
            if N - n > 0:
                mapping[(cat, f)] = round((S - s) / (N - n), decimals)
            else:
                gs = float(gf.s.get(f, 0.0))
                gn = int(gf.n.get(f, 0))
                mapping[(cat, f)] = round((GS - gs) / (GN - gn), decimals)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b[fold_col] = fold_of(b[id_col].to_numpy())
        b[out_col] = pd.Series(
            zip(b[key], b[fold_col]), index=b.index).map(mapping) \
            .astype(np.float64)
        return b

    return ds.map_batches(assign, batch_format="pandas")
