"""Round-5 Naive Bayes classifier: integer micro-nat scoring verified
against a driver-side dense recomputation, partition invariance, and
the no-vocab-token degenerate case."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _docs():
    # two vocabularies that overlap on "the" so priors + likelihoods
    # both matter
    rng = np.random.default_rng(21)
    rows = []
    for i in range(120):
        lab = "en" if i % 3 else "fr"
        words = (["the", "cat", "sat", "mat"] if lab == "en"
                 else ["le", "chat", "the", "tapis"])
        n = rng.integers(3, 9)
        rows.append({"doc_id": i, "lang": lab,
                     "text": " ".join(rng.choice(words, n))})
    return pd.DataFrame(rows)


def _dense_nb(df, vocab_size=16, alpha=1.0):
    ex = (df[["doc_id", "lang"]].copy()
          .assign(w=df.text.str.lower().str.findall(r"[a-z0-9]+"))
          .explode("w").dropna(subset=["w"]))
    tot = ex.groupby("w").size().reset_index(name="cnt")
    vocab = (tot.sort_values(["cnt", "w"], ascending=[False, True])
             .head(vocab_size).w.tolist())
    labels = sorted(df.lang.unique())
    V = len(vocab)
    cube = (ex[ex.w.isin(vocab)].groupby(["w", "lang"]).size()
            .unstack(fill_value=0).reindex(index=vocab, columns=labels,
                                           fill_value=0))
    totl = cube.sum(axis=0).to_numpy(np.float64)
    lp = np.round(np.log((cube.to_numpy(np.float64) + alpha)
                         / (totl + alpha * V)) * 1e6).astype(np.int64)
    nd = df.groupby("lang").size().reindex(labels)
    pri = np.round(np.log(nd.to_numpy(np.float64) / len(df)) * 1e6) \
            .astype(np.int64)
    t2i = {w: i for i, w in enumerate(vocab)}
    preds = {}
    for doc_id, g in ex.groupby("doc_id"):
        s = pri.copy()
        nk = 0
        for w in g.w:
            if w in t2i:
                s = s + lp[t2i[w]]
                nk += 1
        j = int(np.argmax(s))
        preds[doc_id] = (labels[j], int(s[j]), nk)
    for doc_id in df.doc_id:
        if doc_id not in preds:
            j = int(np.argmax(pri))
            preds[doc_id] = (labels[j], int(pri[j]), 0)
    return preds


def test_nb_matches_dense_recompute(ray_session):
    import ray.data as rd
    from pic2vec_ray.stages.classify import nb_train_score

    df = _docs()
    out = (nb_train_score(rd.from_pandas(df).repartition(6),
                          vocab_size=16)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    expect = _dense_nb(df, vocab_size=16)
    assert len(out) == len(df)
    for _, r in out.iterrows():
        lab, s, nk = expect[r.doc_id]
        assert r.pred == lab
        assert r.score_micro == s
        assert r.n_vocab_tokens == nk


def test_nb_partition_invariant(ray_session):
    import ray.data as rd
    from pic2vec_ray.stages.classify import nb_train_score

    df = _docs()
    outs = []
    for parts in (1, 11):
        outs.append(nb_train_score(rd.from_pandas(df).repartition(parts),
                                   vocab_size=16)
                    .to_pandas().sort_values("doc_id")
                    .reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_nb_doc_without_vocab_tokens_gets_prior_argmax(ray_session):
    import ray.data as rd
    from pic2vec_ray.stages.classify import nb_train_score

    df = _docs()
    # vocab_size=2 keeps only the 2 hottest tokens; craft a doc with
    # none of them
    df.loc[len(df)] = {"doc_id": 999, "lang": "en",
                       "text": "zzz qqq xyzzy"}
    out = (nb_train_score(rd.from_pandas(df).repartition(4), vocab_size=2)
           .to_pandas())
    row = out[out.doc_id == 999].iloc[0]
    assert row.n_vocab_tokens == 0
    assert row.pred == "en"  # majority prior

    assert (out.n_vocab_tokens >= 0).all()
    assert len(out) == len(df)


def test_nb_learns_separable_labels(ray_session):
    import ray.data as rd
    from pic2vec_ray.stages.classify import nb_train_score

    df = _docs()
    out = nb_train_score(rd.from_pandas(df), vocab_size=16).to_pandas()
    merged = out.merge(df[["doc_id", "lang"]], on="doc_id")
    # disjoint-ish vocabularies => high train accuracy
    acc = (merged.pred == merged.lang).mean()
    assert acc > 0.9


def test_kl_unigram_matches_dense(ray_session):
    import ray.data as rd
    from pic2vec_ray.stages.text import kl_unigram

    df = _docs()
    V = 8
    out = (kl_unigram(rd.from_pandas(df).repartition(5), vocab_size=V)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # dense recompute
    ex = (df[["doc_id"]].copy()
          .assign(w=df.text.str.lower().str.findall(r"[a-z0-9]+"))
          .explode("w").dropna(subset=["w"]))
    tot = ex.groupby("w").size().reset_index(name="cnt")
    vocab = (tot.sort_values(["cnt", "w"], ascending=[False, True])
             .head(V))
    V = len(vocab)  # corpus may have fewer distinct tokens than requested
    K = vocab.cnt.to_numpy(np.float64)
    q = (K + 1.0) / (K.sum() + V)
    t2i = {w: i for i, w in enumerate(vocab.w)}
    assert len(out) == len(df)
    for _, r in out.iterrows():
        words = [w for w in df.loc[df.doc_id == r.doc_id, "text"]
                 .iloc[0].lower().split() if w in t2i]
        k = np.zeros(V)
        for w in words:
            k[t2i[w]] += 1
        n = k.sum()
        p = (k + 1.0) / (n + V)
        micro = np.round(p * (np.log(p) - np.log(q)) * 1e9).sum()
        assert r.n_vocab_tokens == n
        assert r.kl_micro == micro
        assert r.kl_nats == pytest.approx(round(micro / 1e9, 6), abs=1e-9)


def test_kl_unigram_partition_invariant(ray_session):
    import ray.data as rd
    from pic2vec_ray.stages.text import kl_unigram

    df = _docs()
    outs = []
    for parts in (1, 9):
        outs.append(kl_unigram(rd.from_pandas(df).repartition(parts),
                               vocab_size=12)
                    .to_pandas().sort_values("doc_id")
                    .reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_empty_corpus_guards(ray_session):
    import ray.data as rd
    from pic2vec_ray.stages.classify import nb_train_score
    from pic2vec_ray.stages.similarity import sq8_stats
    from pic2vec_ray.stages.text import kl_unigram

    empty_docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": pd.Series([], dtype="int64"),
         "lang": pd.Series([], dtype="object"),
         "text": pd.Series([], dtype="object")}))
    with pytest.raises(Exception, match="empty corpus"):
        nb_train_score(empty_docs)
    with pytest.raises(Exception, match="empty corpus"):
        kl_unigram(empty_docs)
    empty_emb = rd.from_pandas(pd.DataFrame(
        {"vec_id": pd.Series([], dtype="int64"),
         "embedding": pd.Series([], dtype="object")}))
    with pytest.raises(Exception, match="empty dataset"):
        sq8_stats(empty_emb)
