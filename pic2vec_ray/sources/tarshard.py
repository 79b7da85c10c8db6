"""WebDataset-style sharded-tar multimodal source/sink.

At 100 TB, image corpora ship as thousands of ~0.1–1 GB tar shards in
which one *sample* is the group of member files sharing a basename stem
(the "key") with one extension per modality (``00000123.jpg``,
``00000123.txt``, …).  The shard — not the file — is the unit of
parallelism and of sequential I/O, which is exactly the shape Ray Data
wants: one read task per shard, one Arrow block per shard, zero
per-sample filesystem metadata round-trips.  (Public pattern: the
webdataset tar convention.  No reference counterpart — the reference
ingests loose directories / CSV+dir only,
``/root/reference/pic2vec/data_featurizing.py``; this closes the gap a
real large-scale user hits first.)

``read_tar_shards`` is the source: ``ray.data.read_binary_files`` over
the shard files (one task per shard, streamed by the executor with
backpressure) → a vectorized per-shard parse with stdlib ``tarfile``
over an in-memory buffer → one row per sample with a fixed,
caller-declared schema (missing member ⇒ null).  ``write_tar_shards``
is the sink half and the fixture encoder.

Memory note: a shard is held in a worker's heap twice (raw bytes +
parsed columns) while its block is built, so shard size should track
``DataContext.target_max_block_size`` — the same rule as a parquet row
group.  ``rows_per_shard`` on the sink is the knob.
"""

from __future__ import annotations

import io
import os
import tarfile

import pyarrow as pa

__all__ = ["read_tar_shards", "write_tar_shards",
           "convert_tar_shards_to_parquet"]


def _parse_shard(raw: bytes, ext_to_col: dict[str, str]):
    """One tar shard → {key → {col → bytes}} preserving archive order."""
    samples: dict[str, dict[str, bytes]] = {}
    with tarfile.open(fileobj=io.BytesIO(raw), mode="r") as tf:
        for member in tf:
            if not member.isfile():
                continue
            name = os.path.basename(member.name)
            stem, dot, ext = name.rpartition(".")
            if not dot:
                continue
            col = ext_to_col.get(ext.lower())
            if col is None:
                continue
            data = tf.extractfile(member).read()
            row = samples.setdefault(stem, {})
            row[col] = data
            # modality-by-extension: remember which ext supplied the col
            row["__ext__" + col] = ext.lower().encode()
    return samples


def read_tar_shards(
    paths: str | list[str],
    extensions: dict[str, str],
    *,
    key_col: str = "key",
    text_cols: set[str] | None = None,
    ext_col_for: str | None = None,
):
    """Read webdataset-style tar shards into a Dataset, one row per sample.

    Parameters
    ----------
    paths: shard directory (or explicit file list).
    extensions: ``{member_extension → output_column}``; several
        extensions may map to one column (e.g. ``png/bmp/jpeg → bytes``).
    key_col: column receiving the member basename stem.
    text_cols: output columns decoded utf-8 → string (captions, labels).
    ext_col_for: if set to an output column name, an extra string column
        ``fmt`` records which extension supplied that column per row
        (the webdataset idiom of carrying the codec in the extension).

    Schema is fixed up front from the arguments — a sample missing a
    modality gets a typed null, never a dropped column — so downstream
    stages see a stable schema regardless of which shard a block came
    from (the driver-oracle comparison and any union depend on that).
    """
    import ray.data as rd

    text_cols = text_cols or set()
    ext_to_col = {e.lower().lstrip("."): c for e, c in extensions.items()}
    out_cols = list(dict.fromkeys(ext_to_col.values()))

    ds = rd.read_binary_files(paths, file_extensions=["tar"])

    def shard_to_rows(batch: pa.Table) -> pa.Table:
        return _shards_to_table([raw.as_py() for raw in batch["bytes"]],
                                ext_to_col, out_cols, text_cols, key_col,
                                ext_col_for)

    return ds.map_batches(shard_to_rows, batch_format="pyarrow")


def _shards_to_table(raws: list[bytes], ext_to_col, out_cols, text_cols,
                     key_col, ext_col_for) -> pa.Table:
    """Raw tar shard payloads → one Arrow table with the declared
    fixed schema (shared by the source and the parquet converter)."""
    rows: dict[str, list] = {key_col: []}
    for c in out_cols:
        rows[c] = []
    if ext_col_for is not None:
        rows["fmt"] = []
    for raw in raws:
        samples = _parse_shard(raw, ext_to_col)
        for stem in sorted(samples):
            sample = samples[stem]
            rows[key_col].append(stem)
            for c in out_cols:
                v = sample.get(c)
                if v is not None and c in text_cols:
                    v = v.decode("utf-8")
                rows[c].append(v)
            if ext_col_for is not None:
                e = sample.get("__ext__" + ext_col_for)
                rows["fmt"].append(e.decode() if e is not None else None)
    fields = [pa.field(key_col, pa.string())]
    for c in out_cols:
        fields.append(pa.field(c, pa.string() if c in text_cols else pa.binary()))
    if ext_col_for is not None:
        fields.append(pa.field("fmt", pa.string()))
    return pa.table(
        {f.name: pa.array(rows[f.name], type=f.type) for f in fields},
        schema=pa.schema(fields),
    )


def convert_tar_shards_to_parquet(
    paths: str | list[str],
    out_dir: str,
    extensions: dict[str, str],
    *,
    key_col: str = "key",
    text_cols: set[str] | None = None,
    ext_col_for: str | None = None,
    on_shard=None,
):
    """Resumable streaming tar→parquet corpus conversion: one parquet
    file per input shard, written ATOMICALLY (tmp + rename), with
    already-converted shards SKIPPED — so a killed 100-TB conversion
    rerun only pays for the unfinished tail, and a partial run is
    always a valid (smaller) parquet dataset.

    Shape: the pending shard list becomes a Dataset of paths
    (``from_items`` — tiny), and each map task reads its shard from
    storage, parses, and writes its own output file; the only thing
    returned through the object store is the per-shard manifest row
    (shard, output, rows, skipped).  Returns the manifest Dataset —
    call ``.to_pandas()`` on it freely (one row per shard).

    ``on_shard(shard_path)`` is an optional hook invoked before each
    write — used by tests for fault injection mid-conversion.
    """
    import ray.data as rd

    text_cols = text_cols or set()
    ext_to_col = {e.lower().lstrip("."): c for e, c in extensions.items()}
    out_cols = list(dict.fromkeys(ext_to_col.values()))

    if isinstance(paths, str):
        shard_files = sorted(
            os.path.join(paths, f) for f in os.listdir(paths)
            if f.endswith(".tar"))
    else:
        shard_files = sorted(paths)
    os.makedirs(out_dir, exist_ok=True)

    def convert(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        shards, outs, nrows, skipped = [], [], [], []
        for shard in batch["shard"].to_pylist():
            stem = os.path.splitext(os.path.basename(shard))[0]
            out_path = os.path.join(out_dir, f"{stem}.parquet")
            shards.append(shard)
            outs.append(out_path)
            if os.path.exists(out_path):  # finished by a previous run
                nrows.append(pq.read_metadata(out_path).num_rows)
                skipped.append(True)
                continue
            if on_shard is not None:
                on_shard(shard)
            with open(shard, "rb") as f:
                raw = f.read()
            table = _shards_to_table([raw], ext_to_col, out_cols,
                                     text_cols, key_col, ext_col_for)
            tmp = out_path + f".tmp.{os.getpid()}"
            pq.write_table(table, tmp)
            os.replace(tmp, out_path)  # atomic: readers never see partials
            nrows.append(table.num_rows)
            skipped.append(False)
        return pa.table({"shard": pa.array(shards, pa.string()),
                         "output": pa.array(outs, pa.string()),
                         "rows": pa.array(nrows, pa.int64()),
                         "skipped": pa.array(skipped, pa.bool_())})

    manifest = rd.from_items([{"shard": s} for s in shard_files],
                             override_num_blocks=max(1, len(shard_files)))
    return manifest.map_batches(convert, batch_format="pyarrow",
                                batch_size=1)


def write_tar_shards(
    ds,
    out_dir: str,
    *,
    key_col: str,
    columns: dict[str, str | None],
    rows_per_shard: int = 512,
) -> list[str]:
    """Write a Dataset as webdataset-style tar shards; returns shard paths.

    ``columns`` maps ``source_column → member_extension``; a None
    extension means "per-row extension from the ``fmt`` column" (the
    image idiom: the codec rides in the filename).  String columns are
    utf-8 encoded; null cells emit no member (the reader restores them
    as nulls).  Each map_batches task writes exactly one shard named
    after its first key — keys are unique, so parallel writers never
    collide and a re-run overwrites rather than duplicates (idempotent
    restart).  One small (path, rows) row per shard comes back to the
    driver; the payload never does.
    """
    import ray.data as rd  # noqa: F401  (documents the dependency)

    os.makedirs(out_dir, exist_ok=True)

    def write_shard(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        if not keys:
            return pa.table({"shard_path": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        fmts = batch["fmt"].to_pylist() if "fmt" in batch.column_names else [None] * len(keys)
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tf:
            for i, key in enumerate(keys):
                for col, ext in columns.items():
                    cell = batch[col][i].as_py()
                    if cell is None:
                        continue
                    data = cell.encode("utf-8") if isinstance(cell, str) else bytes(cell)
                    member_ext = ext if ext is not None else (fmts[i] or "bin")
                    info = tarfile.TarInfo(name=f"{key}.{member_ext}")
                    info.size = len(data)
                    tf.addfile(info, io.BytesIO(data))
        path = os.path.join(out_dir, f"shard-{keys[0]}.tar")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(buf.getvalue())
        os.replace(tmp, path)
        return pa.table({"shard_path": pa.array([path]),
                         "rows": pa.array([len(keys)], pa.int64())})

    manifest = ds.map_batches(
        write_shard, batch_format="pyarrow", batch_size=rows_per_shard
    ).take_all()
    return sorted(m["shard_path"] for m in manifest)
