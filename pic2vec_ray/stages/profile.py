"""Column profiling / data-quality summary — the dataset-card pass a
training-data build runs before anything else (row counts, null
counts, ranges, distinct counts per column, one tidy row per column).

Scale shape: one streaming pass; each batch reduces to a single
partial row per column (count/nulls/min/max plus the batch's DISTINCT
values for bounded-domain columns), merged on the driver.  The
distinct set is the one piece whose size is data-dependent — the
``distinct_limit`` contract raises rather than silently ballooning
when a column isn't actually bounded (continuous columns belong on
the HLL / histogram-sketch paths, ``stages/sketch`` /
``stages/quantiles``).

No reference counterpart; SURVEY.md §2 feature-engineering additions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def profile_columns(ds, *, columns: list[str], distinct_limit: int = 100_000,
                    decimals: int = 6):
    """Profile numeric ``columns``: one output row per column with
    ``(column, n_rows, n_null, min_val, max_val, n_distinct)``.
    min/max/distinct are computed over non-null values; min/max round
    to ``decimals`` only on output (inputs are passthrough floats, so
    both engines see identical doubles)."""
    cols = list(columns)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in cols:
            v = b[c]
            nn = v.dropna()
            uniq = pd.unique(nn)
            if len(uniq) > distinct_limit:
                raise ValueError(
                    f"column {c!r} exceeded distinct_limit={distinct_limit} "
                    "within one batch — profile bounded-domain columns only "
                    "(use the HLL sketch for continuous/high-card columns)")
            rows.append({
                "column": c, "n": len(v), "nulls": int(v.isna().sum()),
                "mn": float(nn.min()) if len(nn) else np.nan,
                "mx": float(nn.max()) if len(nn) else np.nan,
                "uniq": uniq,
            })
        return pd.DataFrame(rows)

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = []
    for c in cols:
        p = parts[parts.column == c]
        seen: set = set()
        for u in p.uniq:
            seen.update(u.tolist())
            if len(seen) > distinct_limit:
                raise ValueError(
                    f"column {c!r} exceeded distinct_limit={distinct_limit} "
                    "across batches — use the HLL sketch instead")
        out.append({
            "column": c,
            "n_rows": int(p.n.sum()),
            "n_null": int(p.nulls.sum()),
            "min_val": round(float(np.nanmin(p.mn.to_numpy())), decimals),
            "max_val": round(float(np.nanmax(p.mx.to_numpy())), decimals),
            "n_distinct": len(seen),
        })
    df = pd.DataFrame(out)
    df["n_rows"] = df.n_rows.astype(np.int64)
    df["n_null"] = df.n_null.astype(np.int64)
    df["n_distinct"] = df.n_distinct.astype(np.int64)
    return df
