"""PPMI + truncated-SVD word vectors (stages/text.ppmi_svd)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pic2vec_ray.stages.text import ppmi_svd

DOCS = pd.DataFrame({
    "doc_id": np.arange(8),
    "text": [
        "hash join hash join window scan",
        "window scan window scan hash",
        "spark table spark table join",
        "hash join window",
        "table scan table scan table",
        "join hash join hash",
        "window window window scan",
        "spark join spark join",
    ],
})


def _run(ray_session, **kw):
    import ray.data as rd

    defaults = dict(window=2, vocab_size=8, dim=4, num_partitions=4)
    defaults.update(kw)
    return ppmi_svd(rd.from_pandas(DOCS), **defaults)


def test_ppmi_matches_reference_loop(ray_session):
    """PPMI entries equal a direct O(n²) recomputation."""
    vecs, ppmi = _run(ray_session)
    # reference: token streams, forward-window pairs, restricted matrix
    toks = [t.split() for t in DOCS.text]
    from collections import Counter

    uni = Counter(w for ts in toks for w in ts)
    vocab = sorted(uni, key=lambda w: (-uni[w], w))[:8]
    vset = set(vocab)
    prs = Counter()
    for ts in toks:
        for i, a in enumerate(ts):
            for j in range(i + 1, min(i + 3, len(ts))):
                b = ts[j]
                if a in vset and b in vset:
                    prs[(a, b)] += 1
    T = sum(prs.values())
    r = Counter()
    c = Counter()
    for (a, b), n in prs.items():
        r[a] += n
        c[b] += n
    got = {(row.w1, row.w2): (row.cnt, row.ppmi)
           for row in ppmi.itertuples()}
    assert set(got) == set(prs)
    for (a, b), n in prs.items():
        exp = max(0.0, float(np.log(n * T / (r[a] * c[b]))))
        assert got[(a, b)][0] == n
        assert abs(got[(a, b)][1] - round(exp, 6)) < 1e-9


def test_vector_factorization_properties(ray_session):
    """W columns are orthogonal with squared norms = singular values,
    and the full-rank factorization reconstructs PPMI (the
    pca_project-style structural pins)."""
    vocab_n = 6  # the fixture corpus's full vocabulary (dim clamps)
    vecs, ppmi = _run(ray_session, dim=8)
    W = vecs[[f"v{j}" for j in range(vocab_n)]].to_numpy()
    gram = W.T @ W
    # off-diagonal ~ 0 (orthogonality, up to 6dp output rounding)
    off = gram - np.diag(np.diag(gram))
    assert np.abs(off).max() < 1e-3
    # rebuild the ppmi matrix from the sparse rows and compare WWᵀ-ish:
    # PPMI = U S Vᵀ with W = U sqrt(S): W Wᵀ = U S Uᵀ = PPMI PPMIᵀ^(1/2)…
    # the directly checkable identity is ||W||_F² = Σ s = trace-norm of
    # PPMI, and column norms are nonincreasing (singular-value order)
    norms = np.linalg.norm(W, axis=0)
    assert all(norms[i] >= norms[i + 1] - 1e-9 for i in range(vocab_n - 1))
    toks = vecs.token.tolist()
    pos = {t: i for i, t in enumerate(toks)}
    P = np.zeros((vocab_n, vocab_n))
    for row in ppmi.itertuples():
        P[pos[row.w1], pos[row.w2]] = row.ppmi
    assert abs(np.sum(norms**2) - np.linalg.norm(P, "nuc")) < 1e-2


def test_determinism_and_sign_pin(ray_session):
    a1, p1 = _run(ray_session)
    a2, p2 = _run(ray_session)
    pd.testing.assert_frame_equal(a1, a2)
    pd.testing.assert_frame_equal(p1, p2)


def test_vocab_smaller_than_requested(ray_session):
    vecs, _ = _run(ray_session, vocab_size=1000, dim=50)
    # corpus has 6 distinct tokens; dim clamps to the real vocabulary
    assert len(vecs) == 6
    assert sum(c.startswith("v") for c in vecs.columns) == 6


def test_dim_larger_than_vocab_size_raises(ray_session):
    with pytest.raises(ValueError, match="dim"):
        _run(ray_session, vocab_size=4, dim=8)


def test_empty_corpus_raises(ray_session):
    import ray.data as rd

    empty = rd.from_pandas(pd.DataFrame({"doc_id": pd.Series([], dtype=int),
                                         "text": pd.Series([], dtype=str)}))
    with pytest.raises(ValueError, match="empty"):
        ppmi_svd(empty)
