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
