"""Round-4 scale-safety fixes: hot-bucket pair enumeration (star edges +
deterministic cap), oracle parity of the star-edge SQL, and the ADVICE
guards (doc_id packing bound, Bloom sizing from a sample)."""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
import pytest

from pic2vec_ray.stages.dedup import (
    _enumerate_bucket_pairs,
    minhash_lsh_pairs,
    neardup_groups,
)


# ------------------------------------------------ enumeration unit tests


def test_enumerate_star_edges():
    ids = np.array([7, 11, 13, 42], dtype=np.int64)
    a, b, dropped = _enumerate_bucket_pairs(ids, edges="star", max_pairs=None)
    assert dropped == 0
    assert list(a) == [7, 7, 7]
    assert list(b) == [11, 13, 42]


def test_enumerate_all_uncapped_equals_triu():
    ids = np.arange(10, 20, dtype=np.int64)
    a, b, dropped = _enumerate_bucket_pairs(ids, edges="all", max_pairs=None)
    ia, ib = np.triu_indices(10, k=1)
    assert dropped == 0
    assert list(a) == list(ids[ia]) and list(b) == list(ids[ib])


def test_enumerate_all_capped_keeps_ring_and_counts_drops():
    m = 100
    ids = np.arange(m, dtype=np.int64) * 3
    cap = 150
    a, b, dropped = _enumerate_bucket_pairs(ids, edges="all", max_pairs=cap)
    total = m * (m - 1) // 2
    assert len(a) == cap and dropped == total - cap
    # distance-1 ring fully present -> connectivity preserved
    ring = set(zip(ids[:-1].tolist(), ids[1:].tolist()))
    got = set(zip(a.tolist(), b.tolist()))
    assert ring <= got
    # deterministic: same input, same output
    a2, b2, d2 = _enumerate_bucket_pairs(ids, edges="all", max_pairs=cap)
    assert (a == a2).all() and (b == b2).all() and d2 == dropped


def test_enumerate_rejects_unknown_mode():
    with pytest.raises(ValueError):
        _enumerate_bucket_pairs(np.array([1, 2]), edges="ring", max_pairs=None)


# ------------------------------------- planted hot-bucket (the 100-TB case)


def test_hot_bucket_10k_identical_docs_bounded(ray_session):
    """A 10k-identical-doc cluster (every member in the SAME bucket of
    every band) must finish in bounded time/memory and still label the
    whole cluster as one group. Full enumeration would emit ~50M pairs
    x 16 bands; star edges emit 9,999."""
    import ray.data as rd

    n = 10_000
    pdf = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": ["the same boilerplate paragraph about cookies"] * n,
    })
    t0 = time.monotonic()
    pairs = minhash_lsh_pairs(rd.from_pandas(pdf), threshold=0.5,
                              num_perm=64, bands=16, num_partitions=8,
                              edges="star")
    groups = neardup_groups(pairs, num_partitions=8).to_pandas()
    elapsed = time.monotonic() - t0
    assert elapsed < 120, f"hot bucket took {elapsed:.1f}s"
    assert len(groups) == n
    assert (groups.group_id == 0).all()
    assert sorted(groups.id) == list(range(n))


def test_capped_pairs_preserve_group_labels(ray_session):
    """edges='all' with a tight cap: pair LIST shrinks, but connected
    components over the truncated pairs equal the uncapped labels (the
    distance-1 ring guarantee)."""
    import ray.data as rd

    base = pd.DataFrame({
        "doc_id": np.arange(200, dtype=np.int64),
        "text": [f"unique document number {i} with its own words {i * 17}"
                 for i in range(200)],
    })
    clust = pd.DataFrame({
        "doc_id": np.arange(300, 500, dtype=np.int64),
        "text": ["identical boilerplate cluster text"] * 200,
    })
    pdf = pd.concat([base, clust], ignore_index=True)

    full = minhash_lsh_pairs(rd.from_pandas(pdf), threshold=0.5,
                             num_perm=64, bands=16, num_partitions=8,
                             edges="all", max_bucket_pairs=None)
    capped = minhash_lsh_pairs(rd.from_pandas(pdf), threshold=0.5,
                               num_perm=64, bands=16, num_partitions=8,
                               edges="all", max_bucket_pairs=300)
    g_full = neardup_groups(full, num_partitions=8).to_pandas()
    g_capped = neardup_groups(capped, num_partitions=8).to_pandas()
    f = g_full.sort_values("id").reset_index(drop=True)
    c = g_capped.sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(f, c)
    # and the cluster is one group anchored at its min id
    assert (c[c.id >= 300].group_id == 300).all()


def test_star_sql_oracle_matches_ray(ray_session):
    """The star-edge groups pipeline hash-matches its DuckDB replay
    (MIN-anchored candidate CTE) on a planted-neardup corpus."""
    import duckdb
    import ray.data as rd

    from pic2vec_ray.pipelines.sketch_sql import minhash_groups_sql
    from pic2vec_ray.stages.dedup import _minhash_params

    rng = np.random.default_rng(7)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet"]
    texts = [" ".join(rng.choice(words, size=12)) for _ in range(60)]
    # plant two near-dup families
    texts += [texts[3] + " x", texts[3] + " y", texts[9] + " z"]
    pdf = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                        "text": texts})

    pairs = minhash_lsh_pairs(rd.from_pandas(pdf), threshold=0.5,
                              num_perm=64, bands=16, num_partitions=8,
                              edges="star")
    ray_out = (neardup_groups(pairs, num_partitions=8).to_pandas()
               .sort_values("id").reset_index(drop=True))

    a, b = _minhash_params(64)
    con = duckdb.connect()
    con.register("documents", pdf)
    sql_out = (con.execute(minhash_groups_sql(a, b, k=5, bands=16,
                                              threshold=0.5))
               .df().sort_values("id").reset_index(drop=True))
    assert len(ray_out) > 0
    pd.testing.assert_frame_equal(
        ray_out.astype("int64"), sql_out.astype("int64"))


# ----------------------------------------------------- ADVICE guard tests


def test_paragraph_dedup_rejects_overflowing_ids(ray_session):
    import ray.data as rd

    from pic2vec_ray.stages.dedup import paragraph_dedup

    pdf = pd.DataFrame({"doc_id": np.array([1 << 44], dtype=np.int64),
                        "text": ["a b c"]})
    with pytest.raises(Exception) as ei:
        paragraph_dedup(rd.from_pandas(pdf)).to_pandas()
    assert "overflow" in str(ei.value) or "exceeds" in str(ei.value)


def test_bloom_capacity_estimated_from_sample(ray_session):
    """A short first row must not undersize the filter: with the
    sample-mean estimate the realized bit density stays near the value
    the requested fp_rate implies."""
    import ray.data as rd

    from pic2vec_ray.stages.decontam import eval_ngram_bloom

    rows = [{"text": "tiny"}]
    long_text = " ".join(f"w{i}" for i in range(400))
    rows += [{"text": long_text.replace("w", f"r{j}w")} for j in range(31)]
    filt = eval_ngram_bloom(rd.from_items(rows), n=8)
    density = np.unpackbits(filt.bits.view(np.uint8)).mean()
    # optimal sizing puts density at ~0.5 * (grams/capacity); an
    # undersized filter (first-row estimate: capacity ~32 grams for
    # ~12k actual) saturates toward 1.0
    assert density < 0.75
