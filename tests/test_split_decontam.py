"""Deterministic hash split/sample (stages/split) and n-gram
decontamination (stages/decontam)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pic2vec_ray.stages.decontam import (
    decontaminate,
    eval_ngram_set,
    word_ngrams_batch,
)
from pic2vec_ray.stages.split import hash_bucket, hash_sample, hash_split


def _naive_ngrams(text: str, n: int) -> list[str]:
    import re

    w = re.findall(r"[a-z0-9]+", text.lower())
    return [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]


# ------------------------------------------------------------- unit level


def test_word_ngrams_matches_naive():
    texts = pd.Series([
        "The quick brown fox jumps over the lazy dog",
        "a b",                       # shorter than n → nothing
        "",                          # empty
        "Punct,too;   spaced\tout x1 y2 z3",
        "one two three four five",   # exactly n tokens → one gram
    ])
    n = 5
    grams, idx = word_ngrams_batch(texts, n)
    got = {}
    for g, i in zip(grams, idx):
        got.setdefault(int(i), []).append(g)
    for i, t in enumerate(texts):
        assert got.get(i, []) == _naive_ngrams(t, n), f"row {i}"


def test_word_ngrams_never_crosses_doc_boundary():
    texts = pd.Series(["alpha beta gamma", "gamma alpha beta"])
    grams, idx = word_ngrams_batch(texts, 3)
    assert sorted(zip(idx.tolist(), grams.tolist())) == [
        (0, "alpha beta gamma"), (1, "gamma alpha beta")]


def test_hash_bucket_matches_sql_formula():
    ids = np.array([0, 1, 17, 499, 123456789, 2**40 + 7], dtype=np.int64)
    expect = [((int(i) * 2654435761) % 2**32) % 10 for i in ids]
    assert hash_bucket(ids, 10).tolist() == expect


# ------------------------------------------------------- dataset level


@pytest.fixture()
def docs_ds(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    vocab = ["red", "blue", "ox", "sky", "run", "jump", "cold", "warm",
             "high", "low", "stone", "river"]
    texts = [" ".join(rng.choice(vocab, size=20)) for _ in range(60)]
    # plant contamination: doc 5 (eval) shares a 6-gram tail with doc 40
    texts[40] = texts[40].rsplit(" ", 6)[0] + " " + " ".join(
        texts[5].split()[-6:])
    df = pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64),
                       "text": texts,
                       "grp": ["eval" if i < 10 else "train"
                               for i in range(60)]})
    return rd.from_pandas(df), df


def test_hash_split_deterministic_and_partition_stable(docs_ds):
    ds, df = docs_ds
    out1 = hash_split(ds, id_col="doc_id").to_pandas().sort_values("doc_id")
    out2 = hash_split(ds.repartition(7), id_col="doc_id") \
        .to_pandas().sort_values("doc_id")
    assert out1["split"].tolist() == out2["split"].tolist()
    assert set(out1["split"]) <= {"train", "valid", "test"}
    # 8/1/1 shares: train strictly dominates on any non-adversarial ids
    assert (out1["split"] == "train").sum() > (out1["split"] != "train").sum()


def test_hash_sample_is_stable_subset(docs_ds):
    ds, df = docs_ds
    s20 = set(hash_sample(ds, id_col="doc_id", rate=0.2)
              .to_pandas()["doc_id"])
    s50 = set(hash_sample(ds, id_col="doc_id", rate=0.5)
              .to_pandas()["doc_id"])
    assert s20 <= s50                      # monotone in rate
    assert 0 < len(s20) < len(df)
    with pytest.raises(ValueError):
        hash_sample(ds, id_col="doc_id", rate=1.5)


def test_decontaminate_removes_planted_overlap(docs_ds):
    ds, df = docs_ds
    eval_ds = ds.filter(expr="grp == 'eval'")
    train_ds = ds.filter(expr="grp == 'train'")
    grams = eval_ngram_set(eval_ds, n=6)
    assert any(g in grams for g in _naive_ngrams(df.text[40], 6))
    clean = decontaminate(train_ds, grams, n=6).to_pandas()
    assert 40 not in set(clean["doc_id"])
    # nothing else shares a 6-gram with eval (random 20-token texts
    # over a 12-word vocab collide on 6-grams w.p. ~12^-6 per window)
    assert len(clean) == 49


def test_decontaminate_empty_eval_keeps_all(docs_ds):
    ds, _ = docs_ds
    train_ds = ds.filter(expr="grp == 'train'")
    clean = decontaminate(train_ds, frozenset(), n=6).to_pandas()
    assert len(clean) == 50


def test_hash_sample_mixture_rates(docs_ds):
    from pic2vec_ray.stages.split import hash_sample_mixture

    ds, df = docs_ds
    out = hash_sample_mixture(ds, id_col="doc_id", key_col="grp",
                              rates={"eval": 0.0}, default_rate=1.0) \
        .to_pandas()
    assert set(out["grp"]) == {"train"} and len(out) == 50
    half = hash_sample_mixture(ds, id_col="doc_id", key_col="grp",
                               rates={"train": 0.5}, default_rate=1.0) \
        .to_pandas()
    assert (half["grp"] == "eval").sum() == 10          # untouched
    assert 0 < (half["grp"] == "train").sum() < 50      # thinned
    with pytest.raises(ValueError):
        hash_sample_mixture(ds, id_col="doc_id", key_col="grp",
                            rates={"train": 2.0})


def test_token_topk_matches_counter(docs_ds):
    from collections import Counter

    from pic2vec_ray.stages.text import token_topk

    ds, df = docs_ds
    out = token_topk(ds.repartition(5), k=5).to_pandas()
    c = Counter(t for text in df["text"] for t in text.lower().split())
    expect = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert list(zip(out["token"], out["cnt"])) == expect


def test_bloom_filter_no_false_negatives_and_fp_bound():
    import numpy as np

    from pic2vec_ray.stages.decontam import BloomGramFilter

    rng = np.random.default_rng(47)
    inserted = np.array([f"gram {i} {rng.integers(1e9)}" for i in range(20_000)],
                        dtype=object)
    fresh = np.array([f"fresh {i} {rng.integers(1e9)}" for i in range(100_000)],
                     dtype=object)
    filt = BloomGramFilter.for_capacity(len(inserted), fp_rate=1e-3)
    filt.add_many(inserted)

    assert filt.contains_many(inserted).all()          # zero false negatives
    fp = filt.contains_many(fresh).mean()
    assert fp <= 3e-3, fp                              # ≤3× nominal rate
    # scalar __contains__ agrees with the vectorized path
    assert inserted[0] in filt and (fresh[0] in filt) == bool(
        filt.contains_many(fresh[:1])[0])
    with pytest.raises(ValueError):
        BloomGramFilter(32, 1)


def test_decontaminate_bloom_superset_of_exact(ray_session):
    import numpy as np
    import ray.data as rd

    from pic2vec_ray.stages.decontam import (
        decontaminate,
        eval_ngram_bloom,
        eval_ngram_set,
    )

    rng = np.random.default_rng(53)
    vocab = [f"w{i}" for i in range(50)]
    eval_texts = [" ".join(rng.choice(vocab, 12)) for _ in range(30)]
    clean = [" ".join(rng.choice([f"c{i}" for i in range(80)], 15))
             for _ in range(200)]
    # plant eval 8-grams inside some train docs
    dirty = [f"x y {t}" for t in eval_texts[:10]]
    train = pd.DataFrame({"doc_id": range(len(clean) + len(dirty)),
                          "text": clean + dirty})
    eval_ds = rd.from_items([{"text": t} for t in eval_texts])

    exact = decontaminate(rd.from_pandas(train).repartition(4),
                          eval_ngram_set(eval_ds, n=8), n=8).to_pandas()
    bloom = decontaminate(rd.from_pandas(train).repartition(4),
                          eval_ngram_bloom(eval_ds, n=8, fp_rate=1e-6), n=8
                          ).to_pandas()
    # every planted-dirty doc removed by BOTH paths (no false negatives)
    assert set(bloom.doc_id) <= set(exact.doc_id)      # bloom ⊆ exact survivors
    assert set(exact.doc_id) & set(range(len(clean), len(train))) == set()
    # at fp=1e-6 over ~2.6k probes, over-removal is (almost surely) zero
    assert set(bloom.doc_id) == set(exact.doc_id)
