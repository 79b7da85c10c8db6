"""Feature-selection statistics over categorical / bounded-domain
columns: mutual information (with marginal entropies) and Spearman
rank correlation computed from sufficient COUNTS.

Scale discipline (same as ``stages/relational.grouped_corr``): every
pass reduces the corpus to a counts cube bounded by the category
domain product — per-batch partial ``groupby().size`` rows → one
bounded Ray ``groupby().sum`` — so the exchange never moves raw rows
and the driver only ever sees the tiny cube.  All derived statistics
are pure functions of exact integer counts, so the SQL oracles replay
them bit-for-bit (identical integer operands → identical doubles →
identical libm calls), rounded to a fixed precision on both sides.

No reference counterpart (datarobot/pic2vec has no tabular feature
tooling); SURVEY.md §2 feature-engineering additions, round 4.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _counts_cube(ds, cols: list[str]):
    """Corpus → exact counts per value tuple (bounded by the domain
    product).  Per-batch partials (≤ domain-product rows each) merge
    in ONE driver pandas groupby — the bounded-driver-merge pattern
    (Ray's sort-aggregate pays ~10 s of fixed multi-key sort cost here
    for no benefit; the partials are already tiny)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(cols, as_index=False).size()
        return g.rename(columns={"size": "w"})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    return parts.groupby(cols, as_index=False).w.sum()


def mutual_information(ds, *, x: str, y: str, decimals: int = 6):
    """Mutual information (nats) between two categoricals plus both
    marginal Shannon entropies — the standard dependency screen for
    categorical feature selection.

    Returns a ONE-ROW pandas DataFrame ``(mi_nats, h_x, h_y, n_rows)``
    computed from the exact joint-counts cube in pinned (sorted-tuple)
    order.  ``mi = Σ p(x,y)·ln(p(x,y)/(p(x)p(y)))``,
    ``h = −Σ p·ln p``; every probability is an exact ``count/n``
    double on both sides, so the SQL oracle reproduces the values up
    to summation order (rounded to ``decimals``)."""
    cube = _counts_cube(ds, [x, y]).sort_values([x, y]).reset_index(drop=True)
    n = float(cube.w.sum())
    if n == 0:
        raise ValueError("mutual_information over an empty dataset")
    cx = cube.groupby(x).w.transform("sum").to_numpy(np.float64)
    cy = cube.groupby(y).w.transform("sum").to_numpy(np.float64)
    w = cube.w.to_numpy(np.float64)
    mi = float(np.sum((w / n) * np.log(w * n / (cx * cy))))

    def entropy(col: str) -> float:
        c = (cube.groupby(col, as_index=False).w.sum()
             .sort_values(col).w.to_numpy(np.float64))
        p = c / n
        return float(-np.sum(p * np.log(p)))

    return pd.DataFrame({
        "mi_nats": [round(mi, decimals)],
        "h_x": [round(entropy(x), decimals)],
        "h_y": [round(entropy(y), decimals)],
        "n_rows": [int(n)],
    })


def chi2_association(ds, *, x: str, y: str, decimals: int = 6):
    """Pearson chi-square test of independence between two categoricals
    plus Cramér's V — the counts-cube sibling of ``mutual_information``
    (and like it, a pure function of exact integer counts, so the SQL
    oracle replays every expected-count double bit-for-bit).

    ``chi2 = Σ (o − e)²/e`` over the FULL x×y grid (absent cells have
    o=0 but still contribute e), ``e = row_total·col_total/n``,
    ``V = sqrt(chi2 / (n·(min(|x|,|y|)−1)))``.  Returns a ONE-ROW
    pandas DataFrame ``(chi2, cramers_v, dof, n_rows)``."""
    cube = _counts_cube(ds, [x, y]).sort_values([x, y]).reset_index(drop=True)
    n = float(cube.w.sum())
    if n == 0:
        raise ValueError("chi2_association over an empty dataset")
    pivot = (cube.pivot_table(index=x, columns=y, values="w",
                              aggfunc="sum", fill_value=0)
             .sort_index(axis=0).sort_index(axis=1))
    o = pivot.to_numpy(np.float64)
    e = np.outer(o.sum(axis=1), o.sum(axis=0)) / n
    if np.any(e == 0):
        raise ValueError("chi2_association: empty marginal level")
    chi2 = float(np.sum((o - e) ** 2 / e))
    k = min(o.shape) - 1
    if k == 0:
        raise ValueError("chi2_association: a column has one level")
    dof = (o.shape[0] - 1) * (o.shape[1] - 1)
    return pd.DataFrame({
        "chi2": [round(chi2, decimals)],
        "cramers_v": [round(float(np.sqrt(chi2 / (n * k))), decimals)],
        "dof": [np.int64(dof)],
        "n_rows": [np.int64(n)],
    })


def spearman_counts(ds, *, by: str, x: str, y: str, decimals: int = 6):
    """Grouped Spearman rank correlation for BOUNDED-DOMAIN value
    columns, from sufficient counts only — no per-row ranking, no
    global sort: with tie-averaged ranks, every rank is a pure
    function of the per-group value-count CDF, so the whole statistic
    reduces to the (group, x, y) counts cube.  This is the scale-safe
    construction: an exact Spearman over a continuous column would
    need a corpus-wide rank (the same hazard as exact quantiles); over
    a bounded domain the cube IS the statistic.

    Per group: ``r(v) = (#smaller) + (count(v)+1)/2`` (average rank),
    then the weighted Pearson raw-moment formula over cube cells.
    Output: ``(by, spearman, n_rows)`` rounded to ``decimals``;
    the SQL oracle replays ranks with a window cumsum and the same
    closed-form."""
    cube = (_counts_cube(ds, [by, x, y])
            .sort_values([by, x, y]).reset_index(drop=True))

    rows = []
    for key, g in cube.groupby(by, sort=True):
        def ranks(col: str) -> np.ndarray:
            m = g.groupby(col, as_index=False).w.sum().sort_values(col)
            c = m.w.to_numpy(np.float64)
            r = np.concatenate([[0.0], np.cumsum(c)[:-1]]) + (c + 1.0) / 2.0
            return g[col].map(dict(zip(m[col], r))).to_numpy(np.float64)

        w = g.w.to_numpy(np.float64)
        rx, ry = ranks(x), ranks(y)
        n = w.sum()
        sx, sy = (w * rx).sum(), (w * ry).sum()
        sxx, syy = (w * rx * rx).sum(), (w * ry * ry).sum()
        sxy = (w * rx * ry).sum()
        denom = np.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        rows.append({by: key,
                     "spearman": round((n * sxy - sx * sy) / denom, decimals),
                     "n_rows": int(n)})
    out = pd.DataFrame(rows)
    out["n_rows"] = out["n_rows"].astype(np.int64)
    return out.reset_index(drop=True)
