"""Entity partitioning primitives for the temporal layer (SURVEY.md §2.4/§2.5).

Every wide temporal operation here uses ONE partitioning key reused
across stages: ``__part = stable_hash(entity_key) % P``. One hash
shuffle co-locates all rows of an entity; sorting and window logic then
run per partition in vectorized pandas (never a Python loop over rows).
``P`` bounds per-partition memory: at 100 TB, pick P so the largest
partition (all rows of ~1/P of entities, both join sides) fits a
worker's heap — P scales with the cluster, not hard-coded.

``pd.util.hash_pandas_object`` is the hash: deterministic across
processes (fixed-key siphash), vectorized, available on workers.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd

DEFAULT_PARTITIONS = 64
PART_COL = "__part"


def hash_partition_ids(df: pd.DataFrame, by: str | list[str], num_partitions: int) -> pd.Series:
    cols = [by] if isinstance(by, str) else list(by)
    h = pd.util.hash_pandas_object(df[cols] if len(cols) > 1 else df[cols[0]], index=False)
    return (h % num_partitions).astype("int64")


def add_partition_column(ds, by: str | list[str], num_partitions: int = DEFAULT_PARTITIONS):
    """Append ``__part`` from the key column(s) only — Arrow in/out, so
    the non-key columns are never converted to pandas just to hash."""
    import pyarrow as pa

    cols = [by] if isinstance(by, str) else list(by)

    def tag(batch: pa.Table) -> pa.Table:
        if len(cols) == 1:
            h = pd.util.hash_pandas_object(batch[cols[0]].to_pandas(), index=False)
        else:
            h = pd.util.hash_pandas_object(
                batch.select(cols).to_pandas(), index=False
            )
        part = (h % num_partitions).astype("int64").to_numpy()
        return batch.append_column(PART_COL, pa.array(part))

    return ds.map_batches(tag, batch_format="pyarrow")


_NULLABLE_INT = {
    "int8": "Int8", "int16": "Int16", "int32": "Int32", "int64": "Int64",
    "uint8": "UInt8", "uint16": "UInt16", "uint32": "UInt32", "uint64": "UInt64",
}


def restore_int_dtypes(df: pd.DataFrame, int_like: dict[str, str],
                       force_nullable: bool = False) -> pd.DataFrame:
    """Undo pandas' int→float64 upcast after a union/merge with nulls.

    Columns that came out null-free are cast straight back to their
    numpy dtype; columns that legitimately contain nulls (nullable ints
    are common in parquet) go to the pandas nullable extension dtype
    instead — a hard ``astype('int64')`` on NaN raises and would crash
    the join.

    ``force_nullable`` casts every listed column to the nullable
    extension dtype regardless of this block's null content. Use it
    whenever a PARTITIONED operator can null the column in only SOME
    buckets (e.g. full-outer join): deciding per bucket would make the
    block dtype data-dependent, and Ray unifying int64 blocks with
    Int64 blocks fails nondeterministically downstream.
    """
    for c, t in int_like.items():
        if c not in df.columns:
            continue
        if force_nullable or df[c].isna().any():
            df[c] = df[c].astype(_NULLABLE_INT.get(t, "Int64"))
        else:
            df[c] = df[c].astype(t)
    return df


def suggest_partitions(inputs, num_cpus: int | None = None,
                       target_bytes: int = 64 << 20,
                       lo: int = 8, hi: int = 4096) -> int:
    """Size a shuffle's partition count from the INPUT, not a constant.

    ``inputs``: paths (files or parquet directories) and/or plain byte
    counts. The count is ``max(2 × cluster CPUs, bytes / 64 MiB)``
    clamped to [lo, hi]: enough partitions that every core gets work
    and the largest partition stays well under a worker's heap — the
    same formula holds on a 256-node cluster because both terms scale
    with the deployment, none is hard-coded.
    """
    import os

    if num_cpus is None:
        try:
            import ray

            num_cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        except Exception:
            num_cpus = 4
    total = 0
    for item in inputs if isinstance(inputs, (list, tuple)) else [inputs]:
        if isinstance(item, int):
            total += item
        elif os.path.isdir(item):
            for f in os.listdir(item):
                if f.endswith(".parquet"):
                    total += os.path.getsize(os.path.join(item, f))
        elif os.path.exists(item):
            total += os.path.getsize(item)
    return int(min(hi, max(lo, 2 * num_cpus, total // target_bytes)))


def partitioned_apply(
    ds,
    by: str | list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_partitions: int = DEFAULT_PARTITIONS,
):
    """hash-partition by entity key → apply ``fn`` once per partition.

    ``fn`` receives every row of every entity hashed to the partition
    and must handle multiple entities (vectorized ``df.groupby``).
    This is the shuffle pattern all window/as-of operators share: one
    all-to-all exchange on ``__part``, then embarrassingly parallel
    partition-local work.
    """
    tagged = add_partition_column(ds, by, num_partitions)

    def run(group: pd.DataFrame) -> pd.DataFrame:
        return fn(group.drop(columns=[PART_COL]))

    return tagged.groupby(PART_COL).map_groups(run, batch_format="pandas")
