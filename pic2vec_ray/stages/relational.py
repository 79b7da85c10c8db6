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


def string_agg(ds, *, by: str, value: str, order: list[str], sep: str = ",",
               out_col: str | None = None, num_partitions: int | None = None):
    """SQL ``STRING_AGG(value, sep ORDER BY ...)`` per group: one hash
    shuffle on ``by``, then a vectorized partition-local sort +
    ``groupby().agg(join)``.  ``order`` must pin a TOTAL order (include
    a tiebreak column) so the concatenation is deterministic under any
    partitioning — same discipline as the window family.  Group size
    bounds the local work; a pathological single group holds one
    partition, the standard trade of ordered aggregation."""
    from ..temporal.core import DEFAULT_PARTITIONS, partitioned_apply

    out_col = out_col or f"{value}_agg"

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(order, kind="mergesort")
        g = (df.groupby(by, sort=False)[value]
               .agg(lambda s: sep.join(s.astype(str)))
               .rename(out_col).reset_index())
        return g

    return partitioned_apply(ds, by, fn,
                             num_partitions or DEFAULT_PARTITIONS)


def unpivot(ds, *, id_cols: list[str], value_cols: list[str],
            var_col: str = "variable", val_col: str = "value"):
    """Wide→long reshape (SQL ``UNPIVOT`` / pandas ``melt``): one row
    per (input row × value column), ``var_col`` holding the source
    column name.  Each row is independent, so this is ONE stateless
    ``map_batches`` with no shuffle at any scale; output size is
    ``len(value_cols)`` × input rows by construction.  The value
    columns must share (or be castable to) one type — same restriction
    as SQL UNPIVOT; pandas raises on incompatible mixes rather than
    silently objectifying because we pre-cast to float64 when every
    value column is numeric."""
    if not value_cols:
        raise ValueError("value_cols must be non-empty")

    def melt(batch: pd.DataFrame) -> pd.DataFrame:
        sub = batch[id_cols + value_cols]
        if all(pd.api.types.is_numeric_dtype(sub[c]) for c in value_cols):
            sub = sub.astype({c: "float64" for c in value_cols})
        return sub.melt(id_vars=id_cols, value_vars=value_cols,
                        var_name=var_col, value_name=val_col)

    return ds.map_batches(melt, batch_format="pandas")
