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
