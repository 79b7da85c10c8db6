"""HyperLogLog sketch (stages/sketch.py): exactness of the register
machinery, merge/partition invariance, estimator accuracy, and the
pixel-exactness phash_verify query."""

from __future__ import annotations

import math
import random

import numpy as np
import pandas as pd
import pytest

from pic2vec_ray.stages.sketch import (
    DEFAULT_P,
    _bit_length_u64,
    _token_hash64,
    hll_finalize,
    hll_registers_partial,
)


def test_bit_length_matches_python():
    rng = random.Random(7)
    vals = [0, 1, 2, 3, (1 << 56) - 1, 1 << 55] + [
        rng.getrandbits(56) for _ in range(500)
    ]
    arr = np.array(vals, dtype=np.uint64)
    got = _bit_length_u64(arr)
    want = np.array([v.bit_length() for v in vals], dtype=np.int64)
    assert (got == want).all()


def test_token_hash_matches_scalar_horner():
    toks = ["alpha", "b", "", "épée", "the quick"]  # incl. empty + non-ascii
    got = _token_hash64(np.array(toks, dtype=object))
    for t, g in zip(toks, got):
        h = 0
        for c in t:
            h = (h * 1099511628211 + ord(c)) % (1 << 64)
        assert int(g) == h


def _exact_distinct(df: pd.DataFrame) -> dict[str, int]:
    out = {}
    for src, grp in df.groupby("source"):
        toks = set()
        for t in grp["text"]:
            toks.update(t.lower().split())
        out[src] = len(toks)
    return out


def _run_local(df: pd.DataFrame, batches: int) -> pd.DataFrame:
    """Drive the partial/merge/finalize path without Ray: split into
    ``batches`` chunks, concat partials, groupby-max, finalize."""
    partial = hll_registers_partial("source", "text")
    parts = [partial(c) for c in np.array_split(df, batches) if len(c)]
    merged = (
        pd.concat(parts)
        .groupby(["source", "bucket"], as_index=False)["rho"]
        .max()
        .rename(columns={"rho": "max(rho)"})
    )
    fin = hll_finalize("source", out_col="est")
    return (
        pd.concat([fin(g) for _, g in merged.groupby("source")])
        .sort_values("source")
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def corpus() -> pd.DataFrame:
    rng = random.Random(11)
    vocab = [f"w{i:04d}" for i in range(4000)]
    rows = []
    for i in range(300):
        src = f"s{i % 3}"
        n = rng.randrange(5, 40)
        rows.append({"source": src, "text": " ".join(rng.choices(vocab, k=n))})
    return pd.DataFrame(rows)


def test_partition_invariance(corpus):
    """Register merge is pointwise max → any partitioning of the input
    yields identical estimates."""
    one = _run_local(corpus, 1)
    many = _run_local(corpus, 17)
    pd.testing.assert_frame_equal(one, many)


def test_estimator_accuracy(corpus):
    """p=8 → ~6.5% RSE; require within 20% (3σ) of exact distinct."""
    est = _run_local(corpus, 4).set_index("source")["est"]
    exact = _exact_distinct(corpus)
    for src, t in exact.items():
        assert abs(est[src] - t) / t < 0.20, (src, est[src], t)


def test_linear_counting_small_range():
    """Tiny cardinalities take the linear-counting branch and stay
    near-exact."""
    df = pd.DataFrame(
        {"source": ["a"] * 5, "text": ["x y z", "x", "y q", "z", "q r"]}
    )
    est = _run_local(df, 2).set_index("source")["est"]["a"]
    assert abs(est - 5) < 1.5  # {x,y,z,q,r}
    m = 1 << DEFAULT_P
    assert est == round(m * math.log(m / (m - 5)), 2) or est > 0


def test_hll_query_vs_duckdb(ray_session, sf_dir):
    """Full Ray path vs the SQL oracle at sf0.001 — exact value match,
    the same comparison the driver makes at sf0.01."""
    import duckdb

    from pic2vec_ray.pipelines.queries import SQL_HLL, hll_distinct_tokens

    got = (
        hll_distinct_tokens(sf_dir)
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = (
        con.execute(SQL_HLL).df().sort_values("source").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["source", "est_distinct_tokens"]], want
    )


def test_phash_verify_all_true(ray_session, sf_dir, images_dir):
    """Every lossless row re-decodes to pixels whose average hash
    equals the generator's original-pixel hash; the surviving row set
    matches the closed-form oracle."""
    import duckdb

    from pic2vec_ray.pipelines.queries import SQL_PHASH_VERIFY, phash_verify

    got = phash_verify(sf_dir).to_pandas()
    assert got["phash_ok"].all()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW part AS SELECT * FROM '{sf_dir}/part.parquet'"
    )
    want = con.execute(SQL_PHASH_VERIFY).df()
    assert sorted(got["image_id"]) == sorted(want["image_id"])
