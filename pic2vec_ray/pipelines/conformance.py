"""pic2vec-conformance CSV writer.

Reproduces the reference's output contract so a pic2vec user can diff
files: feature columns exploded to ``{col}_missing, {col}_feat_0..N-1``
(naming from ``/root/reference/pic2vec/data_featurizing.py:64-71``),
rows ordered deterministically (the reference's canonical order is CSV
row order, ``feature_preprocessing.py:99-103``; ours is keyed, so the
writer sorts by ``image_id`` — SURVEY.md §7.4 hard part 2), and the
"robust naming" scheme
``{name}_{model}_depth-{d}_output-{n}_({timestamp})`` with the same
omit switches as ``ImageFeaturizer.save_csv``
(``image_featurizer.py:804-857``).

``save_conformance_csv`` is the conformance/export path for SMALL
results (golden diffs, sampled exports): it materializes to pandas.
``stream_conformance_csv`` is the same contract WITHOUT driver
materialization: distributed sort by ``image_id``, then the sorted
Dataset streams through ``iter_batches`` into an append-only CSV —
the driver holds one batch at a time (a single CSV file forces a
single writer; the bound is one batch, not the corpus). The scale
sink for features themselves remains ``Dataset.write_parquet``
partitioned per shard.
"""

from __future__ import annotations

import os
from datetime import datetime

import numpy as np
import pandas as pd


def explode_features(df: pd.DataFrame, image_column_header: str = "images",
                     features_col: str = "features",
                     missing_col: str = "missing") -> pd.DataFrame:
    """``features`` fixed-size-list → ``{col}_missing, {col}_feat_i``."""
    feats = np.stack([np.asarray(f, dtype=np.float32) for f in df[features_col]])
    cols = [f"{image_column_header}_feat_{i}" for i in range(feats.shape[1])]
    out = pd.DataFrame(feats, columns=cols, index=df.index)
    out.insert(0, f"{image_column_header}_missing", df[missing_col].to_numpy())
    return out


def robust_name(csv_name: str, *, model_str: str, depth: int, num_features: int,
                omit_model: bool = False, omit_depth: bool = False,
                omit_output: bool = False, omit_time: bool = False,
                timestamp: str | None = None) -> str:
    """The reference's file-naming scheme (``image_featurizer.py:804-857``)."""
    base, ext = os.path.splitext(csv_name)
    if not ext:
        ext = ".csv"
    name = base
    if not omit_model:
        name += f"_{model_str}"
    if not omit_depth:
        name += f"_depth-{depth}"
    if not omit_output:
        name += f"_output-{num_features}"
    if not omit_time:
        ts = timestamp or datetime.now().strftime("%Y-%m-%d-%H-%M-%S")
        name += f"_({ts})"
    return name + ext


def save_conformance_csv(featurized_df: pd.DataFrame, csv_path: str, *,
                         image_column_header: str = "images",
                         model_str: str, depth: int,
                         id_col: str = "image_id",
                         save_features: bool = False,
                         original_cols: list[str] | None = None,
                         **naming_kwargs) -> str:
    """Write the full dataframe CSV (original columns ⊕ exploded
    features), sorted by ``id_col``. Returns the written path.

    ``save_features=True`` additionally writes a features-only CSV
    (mirrors the reference's ``save_features`` switch,
    ``image_featurizer.py:484-509``).
    """
    df = featurized_df.sort_values(id_col).reset_index(drop=True)
    feats = explode_features(df, image_column_header)
    keep = original_cols or [c for c in df.columns if c not in ("features", "missing")]
    full = pd.concat([df[keep], feats], axis=1)
    num_features = sum(1 for c in feats.columns if "_feat_" in c)
    path = robust_name(csv_path, model_str=model_str, depth=depth,
                       num_features=num_features, **naming_kwargs)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    full.to_csv(path, index=False)
    if save_features:
        feat_path = path.replace(".csv", "_features_only.csv")
        pd.concat([df[[id_col]], feats], axis=1).to_csv(feat_path, index=False)
    return path


def stream_conformance_csv(featurized_ds, csv_path: str, *,
                           image_column_header: str = "images",
                           model_str: str, depth: int,
                           id_col: str = "image_id",
                           save_features: bool = False,
                           original_cols: list[str] | None = None,
                           batch_size: int = 1024,
                           **naming_kwargs) -> str:
    """``save_conformance_csv`` without the full ``to_pandas()``:
    ``featurized_ds`` (a lazy featurized Dataset) is SORTED DISTRIBUTED
    by ``id_col`` and streamed batch-by-batch into the CSV — byte-
    identical output (pandas formats values per-cell, so appending
    header-less batches of the same sorted rows writes the same bytes),
    driver memory bounded by one batch. Returns the written path.
    """
    ds = featurized_ds.sort(id_col)
    writer = feat_writer = None
    path = None
    try:
        for pdf in ds.iter_batches(batch_size=batch_size, batch_format="pandas"):
            pdf = pdf.reset_index(drop=True)
            feats = explode_features(pdf, image_column_header)
            keep = original_cols or [c for c in pdf.columns
                                     if c not in ("features", "missing")]
            full = pd.concat([pdf[keep], feats], axis=1)
            if writer is None:
                num_features = sum(1 for c in feats.columns if "_feat_" in c)
                path = robust_name(csv_path, model_str=model_str, depth=depth,
                                   num_features=num_features, **naming_kwargs)
                os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
                writer = open(path, "w", newline="")
                if save_features:
                    feat_writer = open(
                        path.replace(".csv", "_features_only.csv"), "w", newline="")
            full.to_csv(writer, index=False, header=writer.tell() == 0)
            if feat_writer is not None:
                pd.concat([pdf[[id_col]], feats], axis=1).to_csv(
                    feat_writer, index=False, header=feat_writer.tell() == 0)
    finally:
        for f in (writer, feat_writer):
            if f is not None:
                f.close()
    if path is None:
        raise ValueError("cannot write a conformance CSV from an empty dataset")
    return path
