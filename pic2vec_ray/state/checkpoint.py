"""Per-partition checkpointing with lineage manifests (north_rule:
"resumable from checkpoint with per-partition lineage + metrics").

A partitioned run splits the input parquet fragments into P
deterministic groups (content = the fragment list, so re-runs see the
same partitions), runs the pipeline per partition, and commits each
partition ATOMICALLY: write to ``part=K.tmp`` → rename to ``part=K`` →
write ``part=K.manifest.json`` recording inputs, row counts, wall
time and an engine version tag. Resume scans manifests and skips
completed partitions — rerunning after a partial failure reproduces a
byte-identical table without recomputing finished work.

The reference has no notion of this (rerun-from-scratch,
SURVEY.md §4); at 100 TB it is the difference between a recoverable
job and a lost day. Partition granularity ≈ input fragments, so the
scheme scales with the dataset, not the cluster.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Callable

ENGINE_VERSION = "pic2vec_ray-0.1"


def _partition_inputs(files: list[str], num_partitions: int) -> list[list[str]]:
    files = sorted(files)
    return [files[i::num_partitions] for i in range(num_partitions) if files[i::num_partitions]]


def manifest_path(out_dir: str, k: int) -> str:
    return os.path.join(out_dir, f"part={k}.manifest.json")


def partition_done(out_dir: str, k: int, inputs: list[str]) -> bool:
    mp = manifest_path(out_dir, k)
    if not os.path.exists(mp):
        return False
    try:
        m = json.load(open(mp))
    except (OSError, json.JSONDecodeError):
        return False
    return (
        m.get("engine_version") == ENGINE_VERSION
        and m.get("inputs") == inputs
        and os.path.isdir(os.path.join(out_dir, f"part={k}"))
    )


def default_metrics(part_dir: str) -> dict:
    """Per-partition metrics recorded into the lineage manifest:
    row count by file, decode-failure (``missing``) count when the
    output carries the flag, and output bytes."""
    import pyarrow.parquet as pq

    files = [f for f in os.listdir(part_dir) if f.endswith(".parquet")]
    out = {"files": len(files), "bytes": 0, "missing_rows": None}
    missing_total = 0
    has_missing = False
    for f in files:
        p = os.path.join(part_dir, f)
        out["bytes"] += os.path.getsize(p)
        schema = pq.read_schema(p)
        if "missing" in schema.names:
            has_missing = True
            col = pq.read_table(p, columns=["missing"])["missing"]
            missing_total += int(sum(1 for v in col.to_pylist() if v))
    if has_missing:
        out["missing_rows"] = missing_total
    return out


def run_partitioned(
    input_dir: str,
    out_dir: str,
    pipeline_fn: Callable,
    *,
    num_partitions: int = 8,
    metrics_fn: Callable | None = None,
    max_concurrent: int = 1,
) -> dict:
    """Run ``pipeline_fn(dataset) -> dataset`` over each partition of the
    parquet fragments in ``input_dir``, committing each atomically.

    ``max_concurrent`` overlaps up to that many partitions (driver
    threads, each owning its own Ray Data streaming execution): serial
    partitions pay a fixed per-partition pipeline/actor-pool spin-up
    that idles the cluster between partitions (VERDICT r03 #3 —
    measured 2.7× on the sf0.1 featurize bench). Overlap keeps the
    fleet busy across partition boundaries; size any actor pools
    created inside ``pipeline_fn`` to ``total / max_concurrent`` so the
    concurrent pipelines don't oversubscribe the cluster. Commit
    atomicity and the resume contract are per-partition and unchanged
    (each thread renames its own ``part=K.tmp`` and manifest; a crash
    mid-run leaves only whole committed partitions behind).

    Returns a summary: partitions run / skipped and the manifest list.
    """
    import ray.data as rd

    files = [
        os.path.join(input_dir, f)
        for f in os.listdir(input_dir)
        if f.endswith(".parquet")
    ]
    groups = _partition_inputs(files, num_partitions)
    os.makedirs(out_dir, exist_ok=True)

    ran, skipped, todo = [], [], []
    for k, inputs in enumerate(groups):
        if partition_done(out_dir, k, inputs):
            skipped.append(k)
        else:
            todo.append((k, inputs))

    def run_one(k: int, inputs: list[str]) -> int:
        part_dir = os.path.join(out_dir, f"part={k}")
        tmp_dir = part_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        shutil.rmtree(part_dir, ignore_errors=True)
        t0 = time.perf_counter()
        ds = pipeline_fn(rd.read_parquet(inputs))
        ds.write_parquet(tmp_dir)
        wall = time.perf_counter() - t0
        os.rename(tmp_dir, part_dir)
        import pyarrow.parquet as pq

        rows = sum(
            pq.read_metadata(os.path.join(part_dir, f)).num_rows
            for f in os.listdir(part_dir)
            if f.endswith(".parquet")
        )
        manifest = {
            "partition": k,
            "inputs": inputs,
            "engine_version": ENGINE_VERSION,
            "rows": rows,
            "wall_sec": round(wall, 3),
            "metrics": (metrics_fn or default_metrics)(part_dir),
        }
        tmp_manifest = manifest_path(out_dir, k) + ".tmp"
        with open(tmp_manifest, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp_manifest, manifest_path(out_dir, k))
        return k

    if max_concurrent <= 1:
        for k, inputs in todo:
            ran.append(run_one(k, inputs))
    elif todo:
        from concurrent.futures import ThreadPoolExecutor

        # Ray's path resolution probes `fsspec.implementations.http`
        # on EVERY read/write; with aiohttp absent the import always
        # fails, is retried per call, and concurrent retries from
        # sibling threads can observe a partially-initialized module —
        # a plain ImportError Ray's ModuleNotFoundError handler misses.
        # Register a negative-cache stub once: its HTTPFileSystem
        # matches no real object, reproducing the except-path exactly.
        try:
            from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
        except ImportError:
            import sys
            import types

            stub = types.ModuleType("fsspec.implementations.http")
            stub.HTTPFileSystem = type("_NoHTTPFileSystem", (), {})
            sys.modules.setdefault("fsspec.implementations.http", stub)

        from concurrent.futures import as_completed

        with ThreadPoolExecutor(max_workers=int(max_concurrent)) as pool:
            # collect per-future results instead of pool.map: map raises
            # on the first failed partition and DISCARDS the results of
            # partitions that already committed (their part=K dirs and
            # manifests were durably renamed), so the summary would lie
            # about on-disk state. Record every committed partition in
            # `ran`, then re-raise the first error (submission order)
            # after all in-flight work drains.
            futs = {pool.submit(run_one, k, inputs): k for k, inputs in todo}
            errors: dict[int, BaseException] = {}
            for fut in as_completed(futs):
                try:
                    ran.append(fut.result())
                except BaseException as e:  # noqa: BLE001 — recorded, re-raised
                    errors[futs[fut]] = e
            ran.sort()  # deterministic summary, same as the serial path
            if errors:
                first_k = min(errors)
                raise RuntimeError(
                    f"checkpointed run: partition {first_k} failed "
                    f"(committed this call before the failure: {ran}; "
                    f"failed partitions: {sorted(errors)})"
                ) from errors[first_k]
    return {"ran": ran, "skipped": skipped, "num_partitions": len(groups), "out_dir": out_dir}
