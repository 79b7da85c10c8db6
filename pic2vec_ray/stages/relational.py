"""Relational reshaping operators (SURVEY.md §2.5 extension).

``pivot_sum`` is the long→wide conditional aggregation (SQL
``SUM(CASE WHEN type = t THEN v END)`` per pivot value).  Scale shape:
the pivot-value set must be DECLARED (a pivot over unbounded dynamic
categories is a schema explosion — same restriction Spark applies when
it wants a single-pass plan); with the columns fixed, each batch
pre-aggregates to at most one row per key present in the batch, so the
shuffle moves bounded partial rows, then one small ``groupby().sum()``
merges them.  No driver-side state, no second pass over the input.
"""

from __future__ import annotations

import pandas as pd


def pivot_sum(ds, *, key: str, pivot_col: str, value: str,
              categories: list[str], suffix: str = "_sum"):
    """Wide sum-pivot of ``value`` by ``pivot_col`` per ``key``.

    Returns a Dataset ``(key, <cat><suffix>...)`` with one row per key
    and 0.0 where a (key, category) combination never occurs — the SQL
    ``COALESCE(SUM(CASE ...), 0)`` semantics.  Categories outside the
    declared list are dropped (they would otherwise silently widen the
    schema mid-stream).
    """
    out_cols = [c + suffix for c in categories]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        sub = batch[batch[pivot_col].isin(categories)]
        wide = (sub.pivot_table(index=key, columns=pivot_col, values=value,
                                aggfunc="sum", fill_value=0.0)
                   .reindex(columns=categories, fill_value=0.0))
        wide.columns = out_cols
        return wide.reset_index()

    merged = ds.map_batches(partial, batch_format="pandas") \
               .groupby(key).sum(out_cols)

    def rename(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns={f"sum({c})": c for c in out_cols})
        return df[[key] + out_cols]

    return merged.map_batches(rename, batch_format="pandas")
