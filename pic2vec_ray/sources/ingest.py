"""Source operators (SURVEY.md §2.1 S1–S5): build the engine's
input_hint table from a directory of image files, a CSV, or both.

These are INGEST utilities: they produce the canonical Arrow table
``(image_id, bytes, w, h, fmt, caption, phash)`` that every pipeline
consumes. Reference behaviors mirrored:

- S1 directory source: whitelist by sniffed CONTENT (not extension),
  mirroring PIL-probe at
  ``/root/reference/pic2vec/feature_preprocessing.py:94-129``; natural
  sort gives the canonical order (``['1.jpg','2.jpg','10.jpg']``,
  sort key at ``feature_preprocessing.py:89-91``);
- S2 CSV source: missing image column raises; malformed CSV rows are
  skipped (pandas ``on_bad_lines="skip"`` ≙ the reference's
  ``error_bad_lines=False``, ``feature_preprocessing.py:157``);
- S3 combined: CSV order kept; CSV paths not present in the directory
  become placeholder rows with empty bytes (→ zero features +
  ``missing=True``, ``feature_preprocessing.py:208-215``); an empty
  intersection raises (``feature_preprocessing.py:221-223``);
- S5 dispatcher routes on which inputs are given
  (``feature_preprocessing.py:229-274``).

Rows are keyed (``image_id`` = the file/CSV path string), so once
ingested the canonical ORDER is irrelevant to the engine — only the
conformance CSV writer re-sorts (SURVEY.md §7.4).
"""

from __future__ import annotations

import os
import re

import numpy as np
import pyarrow as pa

from ..codecs.registry import VALID_FORMATS, DecodeError, decode_image, sniff_format
from ..fixtures.synth import IMAGES_SCHEMA
from ..functions.image_ops import average_hash

_NAT = re.compile(r"(\d+)")


def natural_sort_key(s: str):
    """'img10.png' sorts after 'img2.png' (reference sort key,
    feature_preprocessing.py:89-91)."""
    return [int(tok) if tok.isdigit() else tok.lower() for tok in _NAT.split(s)]


def find_directory_image_paths(image_directory: str) -> list[str]:
    """S1: list files whose CONTENT sniffs as a whitelisted format,
    natural-sorted."""
    names = sorted(os.listdir(image_directory), key=natural_sort_key)
    out = []
    for n in names:
        p = os.path.join(image_directory, n)
        if not os.path.isfile(p):
            continue
        with open(p, "rb") as f:
            head = f.read(8)
        if sniff_format(head) in VALID_FORMATS:
            out.append(n)
    return out


def find_csv_image_paths(csv_path: str, image_column_header: str) -> list[str]:
    """S2: extract the image-path work list from a CSV."""
    import pandas as pd

    df = pd.read_csv(csv_path, on_bad_lines="skip")
    if image_column_header not in df.columns:
        raise ValueError(f"image column header {image_column_header!r} not found in CSV")
    return ["" if (isinstance(v, float) and np.isnan(v)) else str(v)
            for v in df[image_column_header]]


def find_combined_image_paths(image_directory: str, csv_path: str,
                              image_column_header: str) -> list[str]:
    """S3: CSV order kept; non-members of the directory become ''."""
    listed = set(find_directory_image_paths(image_directory))
    csv_paths = find_csv_image_paths(csv_path, image_column_header)
    combined = [p if p in listed else "" for p in csv_paths]
    if not any(combined):
        raise ValueError(
            "No image paths in the CSV intersect the image directory"
        )
    return combined


def image_paths_finder(image_directory: str | None, csv_path: str | None,
                       image_column_header: str | None) -> list[str]:
    """S5: route to S1 / S2 / S3 by which inputs are set."""
    if image_directory and csv_path:
        return find_combined_image_paths(image_directory, csv_path, image_column_header)
    if image_directory:
        return find_directory_image_paths(image_directory)
    if csv_path:
        return find_csv_image_paths(csv_path, image_column_header)
    raise ValueError("need an image directory and/or a csv path")


def _row_from_file(image_directory: str, name: str, caption: str = "") -> dict:
    if not name:
        return dict(image_id="", bytes=b"", w=0, h=0, fmt="", caption=caption, phash=0)
    p = os.path.join(image_directory, name)
    try:
        data = open(p, "rb").read()
    except OSError:
        data = b""
    fmt = sniff_format(data[:8]) or ""
    w = h = 0
    phash = 0
    if data:
        try:
            img = decode_image(data)
            h, w = img.shape[:2]
            phash = average_hash(img)
        except (DecodeError, Exception):
            pass
    return dict(image_id=name, bytes=data, w=w, h=h, fmt=fmt, caption=caption, phash=phash)


def ingest_images(image_directory: str | None = None, csv_path: str | None = None,
                  image_column_header: str | None = None):
    """Build the input_hint table as a Ray Dataset.

    Placeholder rows ('' paths from S3/S2 blanks) get empty bytes and a
    row-positional image_id so downstream missing semantics apply.

    At 100 TB the directory listing would be a manifest scan and the
    file reads a ``read_binary_files`` stage; here the corpus is a
    local test directory, so rows are built driver-side and distributed
    with ``from_arrow``.
    """
    paths = image_paths_finder(image_directory, csv_path, image_column_header)
    rows = []
    for i, p in enumerate(paths):
        r = _row_from_file(image_directory or "", p)
        if not r["image_id"]:
            r["image_id"] = f"__placeholder_{i}"
        rows.append(r)
    cols = {name: [r[name] for r in rows] for name in IMAGES_SCHEMA.names}
    table = pa.table(cols, schema=IMAGES_SCHEMA)
    import ray.data as rd

    return rd.from_arrow(table)


def ingest_images_distributed(image_directory: str):
    """S1 at scale: distributed directory ingest.

    The driver only LISTS paths (metadata); file BYTES are read by
    ``ray.data.read_binary_files`` tasks across the cluster — the
    100 TB path where ``ingest_images``'s driver-side reads would not
    fly. Content probing (sniff/decode/dims/phash) runs as a
    ``map_batches`` stage over the streamed bytes. Emits the canonical
    input_hint schema; rows whose content fails the whitelist keep
    their bytes (decode stage applies missing semantics downstream),
    matching ``ingest_images`` row-for-row for the same directory.
    """
    import ray.data as rd

    names = find_directory_image_paths(image_directory)
    if not names:
        raise ValueError(f"no whitelisted images under {image_directory!r}")
    # resolve BEFORE handing paths to Ray: read tasks run in workers
    # whose cwd differs from the driver's, so relative paths would fail
    # at read time; and Ray may echo normalized paths, so image_id is
    # mapped back via a resolved-path lookup, not string-prefix strip.
    root = os.path.realpath(image_directory)
    paths = [os.path.join(root, n) for n in names]
    ds = rd.read_binary_files(paths, include_paths=True)
    id_by_resolved = {os.path.realpath(p): n for p, n in zip(paths, names)}

    def probe(t: pa.Table) -> pa.Table:
        ids, ws, hs, fmts, hashes = [], [], [], [], []
        for path, data in zip(t["path"].to_pylist(), t["bytes"].to_pylist()):
            data = bytes(data)
            ids.append(id_by_resolved.get(os.path.realpath(path), path))
            fmt = sniff_format(data[:8]) or ""
            w = h = 0
            ph = 0
            try:
                img = decode_image(data)
                h, w = img.shape[:2]
                ph = average_hash(img)
            except (DecodeError, Exception):
                pass
            ws.append(w)
            hs.append(h)
            fmts.append(fmt)
            hashes.append(ph)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "bytes": t["bytes"],
            "w": pa.array(np.array(ws, dtype=np.int32)),
            "h": pa.array(np.array(hs, dtype=np.int32)),
            "fmt": pa.array(fmts, pa.string()),
            "caption": pa.array([""] * len(t), pa.string()),
            "phash": pa.array(np.array(hashes, dtype=np.int64)),
        })

    return ds.map_batches(probe, batch_format="pyarrow")


def ingest_images_multi(image_directory: str | None, csv_path: str | None,
                        image_columns: list[str]):
    """Multi-column ingest: the reference featurizes EVERY listed CSV
    column (``image_featurizer.py:587-593``), so each column resolves to
    its own path list (same S1/S2/S3 routing per column) and the output
    table carries one binary column PER image column, named after it,
    plus ``{col}_path`` with the resolved path strings. Rows align
    positionally across columns (same CSV row).
    """
    per_col_paths = {
        col: image_paths_finder(image_directory, csv_path, col)
        for col in image_columns
    }
    lengths = {len(v) for v in per_col_paths.values()}
    if len(lengths) > 1:
        raise ValueError(f"image columns resolve to unequal row counts: "
                         f"{ {c: len(v) for c, v in per_col_paths.items()} }")
    n = lengths.pop()
    cols: dict[str, list] = {"row_id": list(range(n))}
    for col, paths in per_col_paths.items():
        datas = [_row_from_file(image_directory or "", p) for p in paths]
        cols[f"{col}_path"] = list(paths)
        cols[col] = [d["bytes"] for d in datas]
    fields = [("row_id", pa.int64())]
    for col in image_columns:
        fields += [(f"{col}_path", pa.string()), (col, pa.binary())]
    table = pa.table(cols, schema=pa.schema(fields))
    import ray.data as rd

    return rd.from_arrow(table)
