"""Inverted-index BM25 store (stages/retrieval.InvertedIndex)."""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
import pytest

from pic2vec_ray.stages.retrieval import InvertedIndex

DOCS = pd.DataFrame({
    "doc_id": np.arange(40, dtype=np.int64),
    "text": [f"hash join window scan doc{i} " * (1 + i % 3)
             + ("spark table " * (i % 5))
             + ("special needle term " if i in (7, 21) else "")
             for i in range(40)],
})
QUERIES = ["hash join", "special needle", "spark table scan"]


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    import ray.data as rd

    path = str(tmp_path_factory.mktemp("invidx") / "index")
    idx = InvertedIndex(n_buckets=16)
    idx.build(rd.from_pandas(DOCS).repartition(4), path)
    return idx, path


def test_matches_corpus_scan_exactly(built, ray_session):
    import ray.data as rd

    from pic2vec_ray.stages.text import bm25_topk

    idx, path = built
    got = idx.search(path, QUERIES, k=5).reset_index(drop=True)
    ref = (bm25_topk(rd.from_pandas(DOCS), queries=QUERIES, k=5,
                     num_partitions=4)
           .to_pandas()
           .sort_values(["query_id", "score", "doc_id"],
                        ascending=[True, False, True])
           .reset_index(drop=True))
    got = got.sort_values(["query_id", "score", "doc_id"],
                          ascending=[True, False, True]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["query_id", "doc_id", "score"]],
                                  ref[["query_id", "doc_id", "score"]])


def test_file_level_pruning(built):
    """A search opens only the queried terms' bucket directories —
    strictly fewer files than the corpus holds (the IvfIndex-style
    pruning contract)."""
    idx, path = built
    total = len(glob.glob(os.path.join(path, "**", "*.parquet"),
                          recursive=True))
    dirs = idx.posting_dirs(path, ["special", "needle"])
    probed = [f for d in dirs for f in os.listdir(d)
              if f.endswith(".parquet")]
    assert 0 < len(probed) < total
    assert len(dirs) <= 2  # at most one bucket per queried term


def test_load_roundtrip_and_stats(built):
    idx, path = built
    loaded = InvertedIndex.load(path)
    assert loaded.n_docs == len(DOCS)
    got = loaded.search(path, ["special needle"], k=3)
    assert set(got.doc_id) == {7, 21}


def test_unknown_terms_empty(built):
    idx, path = built
    out = idx.search(path, ["zzzmissing qqqabsent"], k=5)
    assert len(out) == 0
    assert list(out.columns) == ["query_id", "doc_id", "score"]


def test_bad_buckets_raises():
    with pytest.raises(ValueError, match="n_buckets"):
        InvertedIndex(n_buckets=0)
