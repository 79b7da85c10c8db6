"""Z-order clustered parquet layout: write a table sorted by its
Morton key so every output file covers a TIGHT rectangle of the
(x, y) key space, then answer 2-D range predicates by reading only
the files whose per-file min/max statistics intersect the box.

This is the physical-layout half of ``stages/encode.zorder_key`` —
the point of the interleave is not the key itself but that one
1-D sort gives locality in BOTH dimensions, so ordinary per-file
min/max pruning (the same mechanism parquet row-group stats use)
prunes two-dimensional predicates.  At 100 TB the manifest is one
tiny row per file; the box query's I/O scales with the box, not the
corpus.

No reference counterpart; the IVF bucket-partitioned store
(``stages/similarity.py``) is the embedding-space sibling of the
same idea.
"""

from __future__ import annotations

import itertools
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

# per-worker-process batch sequence for unique output filenames
_FILE_SEQ = itertools.count()


def write_zclustered(ds, out_dir: str, *, x: str, y: str, bits: int = 16,
                     rows_per_file: int = 65_536):
    """Sort by the Morton key and write one parquet file per sorted
    batch, each with its (x, y, zkey) min/max recorded in a manifest —
    atomic per-file writes (tmp + rename), manifest written last so a
    partial run is simply re-runnable.  Returns the manifest
    DataFrame (one row per file — the only thing that reaches the
    driver)."""
    from ..stages.encode import zorder_key

    os.makedirs(out_dir, exist_ok=True)
    keyed = zorder_key(ds, x=x, y=y, bits=bits).sort("zkey")

    def write_file(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        if t.num_rows == 0:
            return pa.table({"file": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64()),
                             "min_x": pa.array([], pa.int64()),
                             "max_x": pa.array([], pa.int64()),
                             "min_y": pa.array([], pa.int64()),
                             "max_y": pa.array([], pa.int64()),
                             "min_z": pa.array([], pa.int64()),
                             "max_z": pa.array([], pa.int64())})
        zmin = pc.min(t["zkey"]).as_py()
        # filename must be unique per BATCH, not per zmin: a run of
        # identical zkeys (duplicate (x, y) pairs) spanning a batch
        # boundary gives two batches the same zmin, and naming by zmin
        # alone would silently overwrite the first file and double-list
        # the survivor in the manifest. pid + per-process sequence is
        # unique across the task pool (pids are concurrently alive for
        # the run; the counter disambiguates tasks on one worker).
        seq = next(_FILE_SEQ)
        path = os.path.join(
            out_dir, f"z-{zmin:020d}-{os.getpid():07d}-{seq:06d}.parquet")
        tmp = path + f".tmp.{os.getpid()}"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
        return pa.table({
            "file": [path], "rows": [t.num_rows],
            "min_x": [pc.min(t[x]).as_py()], "max_x": [pc.max(t[x]).as_py()],
            "min_y": [pc.min(t[y]).as_py()], "max_y": [pc.max(t[y]).as_py()],
            "min_z": [zmin], "max_z": [pc.max(t["zkey"]).as_py()],
        })

    manifest = (keyed.map_batches(write_file, batch_format="pyarrow",
                                  batch_size=rows_per_file)
                .to_pandas().sort_values("min_z").reset_index(drop=True))
    # re-runs write fresh uniquely-named files; drop any stale z-* file
    # from a prior partial run so the directory matches the manifest
    live = set(os.path.basename(p) for p in manifest.file)
    for name in os.listdir(out_dir):
        if name.startswith("z-") and name.endswith(".parquet") and name not in live:
            os.unlink(os.path.join(out_dir, name))
    with open(os.path.join(out_dir, "_manifest.json"), "w") as f:
        json.dump(manifest.to_dict(orient="records"), f)
    return manifest


def read_zclustered_box(out_dir: str, *, x_range: tuple[int, int],
                        y_range: tuple[int, int], x: str, y: str):
    """Answer ``x ∈ x_range AND y ∈ y_range`` (inclusive) reading only
    the files whose manifest stats intersect the box, with one exact
    vectorized post-filter.  Returns ``(dataset, files_read,
    files_total)`` so callers (and tests) can see the pruning."""
    import ray.data as rd

    with open(os.path.join(out_dir, "_manifest.json")) as f:
        manifest = pd.DataFrame(json.load(f))
    (x0, x1), (y0, y1) = x_range, y_range
    hit = manifest[(manifest.max_x >= x0) & (manifest.min_x <= x1)
                   & (manifest.max_y >= y0) & (manifest.min_y <= y1)]
    total = len(manifest)
    if not len(hit):
        return None, 0, total

    ds = rd.read_parquet(sorted(hit.file))

    def exact(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.and_(
            pc.and_(pc.greater_equal(t[x], x0), pc.less_equal(t[x], x1)),
            pc.and_(pc.greater_equal(t[y], y0), pc.less_equal(t[y], y1)))
        return t.filter(m)

    return ds.map_batches(exact, batch_format="pyarrow"), len(hit), total
