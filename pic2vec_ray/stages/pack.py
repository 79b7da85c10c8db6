"""Sequence packing and deterministic stratified sampling — the
"assemble training batches" end of a large-scale LLM data pipeline.

``pack_sequences`` is the canonical pre-training step the reference
engine has no analog for: greedily pack documents into fixed
token-budget training sequences (first-fit in a pinned order), so the
trainer reads dense sequences instead of padding every document.  The
greedy scan is inherently sequential WITHIN a group (each pack depends
on the previous acc), so the operator distributes across groups — one
hash shuffle on ``group_col``, then a per-group vectorized-setup +
O(n) scan.  At 100 TB the group is a shard key (source, date, bucket),
each a single task's worth of rows; there is no cross-group state.

``stratified_sample`` draws EXACTLY ``n`` rows per group,
deterministically: rank by splitmix64(id) within the group and keep
the first ``n`` — reproducible under any partitioning, no RNG state,
no driver collect (reuses ``top_n_per_group``'s shuffle+head).

Both are SQL-oracle-checked (``pack_sequences_docs`` via a recursive
CTE replaying the greedy scan, ``stratified_sample_docs`` via the
splitmix CTE chain + ROW_NUMBER) — see pipelines/queries.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..temporal.core import DEFAULT_PARTITIONS, partitioned_apply
from .sketch import _splitmix64


def _greedy_pack(tokens: np.ndarray, budget: int) -> np.ndarray:
    """First-fit contiguous packing: new pack when adding the next doc
    would exceed ``budget`` (a doc larger than the budget gets a pack
    of its own). O(n) scan — sequential by definition of the op."""
    pack = np.empty(len(tokens), dtype=np.int64)
    acc = 0
    p = 0
    for i, t in enumerate(tokens):
        t = int(t)
        if acc + t > budget and acc > 0:
            p += 1
            acc = 0
        acc += t
        pack[i] = p
    return pack


def pack_sequences(ds, *, group_col: str, id_col: str, token_col: str,
                   budget: int, num_partitions: int = DEFAULT_PARTITIONS):
    """→ input columns + ``pack_id`` (0-based per group, docs taken in
    ``id_col`` order). One hash shuffle on ``group_col``; the greedy
    scan runs per group inside the partition task."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([group_col, id_col], kind="mergesort")
        out = []
        for _, g in df.groupby(group_col, sort=False):
            g = g.copy()
            g["pack_id"] = _greedy_pack(g[token_col].to_numpy(), budget)
            out.append(g)
        return pd.concat(out, ignore_index=True)

    return partitioned_apply(ds, group_col, fn, num_partitions)


def stratified_sample(ds, *, group_col: str, id_col: str, n: int,
                      num_partitions: int = DEFAULT_PARTITIONS):
    """Exactly ``n`` rows per group (fewer if the group is smaller),
    picked by splitmix64(id) rank — a deterministic, partition-
    invariant stand-in for per-group reservoir sampling."""
    from ..temporal.windows import top_n_per_group

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__h"] = _splitmix64(df[id_col].to_numpy().astype(np.uint64))
        return df

    out = top_n_per_group(ds.map_batches(tag, batch_format="pandas"),
                          by=group_col, order_cols=["__h", id_col],
                          ascending=[True, True], n=n,
                          num_partitions=num_partitions)
    return out.drop_columns(["__h"])


def bucket_batches(ds, *, by: list[str], order: str, batch_size: int,
                   num_partitions: int = DEFAULT_PARTITIONS,
                   out_col: str = "batch_no"):
    """Deterministic micro-batch assignment within co-partitioned
    groups — the aspect-ratio-bucketing step of image training
    pipelines (same-shape images share a batch so the collate needs no
    padding), generalized to any bounded (bucket, shard) key.

    Scale contract: ``by`` must include a shard component (e.g.
    ``hash(id) % S``) so no group needs a corpus-wide ordering — batch
    numbers are contiguous per (bucket, shard), which is exactly what
    a per-worker data loader consumes.  One hash exchange on ``by``,
    then a vectorized sort + cumcount per partition."""

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(list(by) + [order])
        df[out_col] = (df.groupby(list(by), sort=False).cumcount()
                       // batch_size).astype(np.int64)
        return df

    return partitioned_apply(ds, list(by), assign,
                             num_partitions=num_partitions)
