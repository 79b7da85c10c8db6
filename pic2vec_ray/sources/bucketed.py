"""Hash-bucketed (clustered) parquet tables and shuffle-free
co-partitioned joins.

The scale rationale: every ``hash_join`` pays one all-to-all exchange
of BOTH sides per join.  When the same table is joined on the same key
repeatedly (fact tables on their entity key — the common shape of a
feature-engineering DAG), it is cheaper to pay the shuffle ONCE at
write time: ``write_bucketed`` clusters the table into
``__bucket = stable_hash(key) % B`` parquet directories, and
``bucketed_join`` then joins two co-bucketed tables bucket-by-bucket —
each task reads exactly one bucket directory from each side and joins
locally.  No exchange, no wide operator: at 100 TB the join moves zero
bytes between workers beyond the input read itself.

Correctness guardrails:

- a ``_BUCKET_META.json`` manifest (key columns, bucket count, hash
  algorithm, arrow schema) is written LAST — a torn write leaves no
  manifest and the table reads as "not bucketed";
- ``bucketed_join`` REFUSES mismatched layouts (different bucket count
  or hash) instead of silently producing a partial join;
- the hash is the same process-stable ``pd.util.hash_pandas_object``
  used by every shuffle in ``temporal/core.py`` — ONE partitioning
  function across the engine, so bucketed tables are exchange-
  compatible with the rest of the stack.

Sizing: choose ``num_buckets`` at write time so one bucket (both
sides) fits a worker heap — it scales with the data, not the cluster;
a bucket is the unit of join parallelism AND of resumability (each
output bucket is independent).  Hot-key skew within a bucket is the
same problem ``temporal/skew.py`` handles for shuffle joins and is out
of scope here (use ``hash_join`` with salting for pathological keys).

Oracle-checked end-to-end by the driver query ``bucketed_join_revenue``
(same SQL as the shuffle-join ``q3_priority_revenue`` — the two plans
must produce identical bytes).
"""

from __future__ import annotations

import base64
import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..temporal.core import hash_partition_ids

BUCKET_COL = "__bucket"
META_NAME = "_BUCKET_META.json"
_HASH_ALGO = "pandas_hash_object_mod"


def write_bucketed(ds, path: str, *, key: str | list[str],
                   num_buckets: int = 64) -> None:
    """Cluster ``ds`` by ``stable_hash(key) % num_buckets`` and write
    one parquet directory per bucket (hive-partitioned), manifest last."""
    cols = [key] if isinstance(key, str) else list(key)
    schema = ds.schema()
    arrow_schema = pa.schema(
        [pa.field(n, t) for n, t in zip(schema.names, schema.types)]
    )

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch[BUCKET_COL] = hash_partition_ids(batch, cols, num_buckets)
        return batch

    ds.map_batches(tag, batch_format="pandas").write_parquet(
        path, partition_cols=[BUCKET_COL]
    )
    meta = {
        "version": 1,
        "key": cols,
        "num_buckets": int(num_buckets),
        "hash": _HASH_ALGO,
        "schema_b64": base64.b64encode(arrow_schema.serialize().to_pybytes()).decode(),
    }
    tmp = os.path.join(path, META_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(path, META_NAME))


def read_bucket_meta(path: str) -> dict:
    with open(os.path.join(path, META_NAME)) as f:
        return json.load(f)


def is_bucketed(path: str) -> bool:
    return os.path.exists(os.path.join(path, META_NAME))


def _bucket_frame(path: str, meta: dict, bucket: int) -> pd.DataFrame:
    """One bucket's rows as pandas; empty buckets yield an empty frame
    with the table's REAL schema (from the manifest) so downstream
    concat/merge keeps stable dtypes."""
    bdir = os.path.join(path, f"{BUCKET_COL}={bucket}")
    if os.path.isdir(bdir):
        return pq.read_table(bdir).to_pandas()
    schema = pa.ipc.read_schema(
        pa.py_buffer(base64.b64decode(meta["schema_b64"]))
    )
    return schema.empty_table().to_pandas()


def bucketed_join(left_path: str, right_path: str, *, on: str | list[str],
                  right_on: str | list[str] | None = None,
                  how: str = "inner", concurrency: int | None = None):
    """Join two co-bucketed tables with ZERO shuffle: one task per
    bucket reads the matching bucket directory from each side and joins
    locally.  Both tables must have been written by ``write_bucketed``
    with the same bucket count and hash (checked against the manifests)
    and on join-compatible keys — the left join key must be the left
    table's bucketing key, ditto right (checked)."""
    import ray.data as rd

    if how not in ("inner", "left"):
        raise ValueError("bucketed_join supports how='inner'|'left'")
    lmeta, rmeta = read_bucket_meta(left_path), read_bucket_meta(right_path)
    lkey = [on] if isinstance(on, str) else list(on)
    rkey = ([right_on] if isinstance(right_on, str) else list(right_on)) \
        if right_on is not None else lkey
    if lmeta["num_buckets"] != rmeta["num_buckets"]:
        raise ValueError(
            f"bucket count mismatch: {lmeta['num_buckets']} vs "
            f"{rmeta['num_buckets']} — rebucket one side")
    if lmeta["hash"] != rmeta["hash"]:
        raise ValueError("bucket hash mismatch")
    if lmeta["key"] != lkey or rmeta["key"] != rkey:
        raise ValueError(
            f"join keys {lkey}/{rkey} must equal the bucketing keys "
            f"{lmeta['key']}/{rmeta['key']} — a different key needs a "
            "shuffle join (temporal.join.hash_join)")
    nb = lmeta["num_buckets"]

    def join_one(batch: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for b in batch["bucket"]:
            lt = _bucket_frame(left_path, lmeta, int(b))
            rt = _bucket_frame(right_path, rmeta, int(b))
            outs.append(lt.merge(rt, left_on=lkey, right_on=rkey, how=how))
        return pd.concat(outs, ignore_index=True)

    buckets = rd.from_items([{"bucket": b} for b in range(nb)])
    return buckets.map_batches(
        join_one, batch_format="pandas", batch_size=1,
        **({"concurrency": concurrency} if concurrency else {}),
    )
