"""Multinomial Naive Bayes text classification trained and scored
distributed — the counts-cube classifier (the classical strong
baseline for language / domain / quality routing in corpus pipelines).

Scale discipline: training reduces the corpus to a (label × top-V
vocabulary) integer counts cube — per-batch partials bounded by V·L
rows, one driver merge (``featsel._counts_cube`` pattern) — and the
scoring pass is a stateless ``map_batches`` against the broadcast
log-probability matrix (V·L doubles; ``ray.put`` once, zero-copy read
per task).  No shuffle ever moves raw text except the one bounded
vocabulary pass shared with ``text.ppmi_svd``.

Exactness: per-(token, label) log-probabilities are pure functions of
exact integer counts, so both sides compute bit-identical doubles;
each is then quantized to INTEGER micro-nats (``round(ln_p · 1e6)``)
and per-document scores are INTEGER sums — order-invariant by
construction, so the SQL oracle needs no pinned addend order (the
lesson of the BM25 oracle rewrite, taken one step further).  Argmax is
over integer scores with label-ascending tie-break.

No reference counterpart (datarobot/pic2vec has no text tooling);
SURVEY.md §2 text-analysis additions, round 5.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

MICRO = 1_000_000  # quantization: 1 micro-nat


def _vocab_and_counts(ds, *, label_col: str, text_col: str, vocab_size: int):
    """One pass over the corpus → (top-V vocabulary, V×L token counts,
    per-label doc counts).  Per-batch partial rows are bounded by the
    batch's distinct (token, label) pairs; the driver merge sees only
    partials (the counts-cube pattern — Ray's sort-aggregate pays a
    fixed multi-key sort cost here for no benefit)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ex = (b[[label_col]].copy()
              .assign(w=b[text_col].str.lower().str.findall(r"[a-z0-9]+"))
              .explode("w").dropna(subset=["w"]))
        g = ex.groupby(["w", label_col], as_index=False).size()
        g = g.rename(columns={"size": "k"})
        docs = b.groupby(label_col, as_index=False).size() \
                .rename(columns={"size": "ndocs"})
        docs["w"] = ""  # sentinel row carries the doc count
        docs["k"] = 0
        return pd.concat([g, docs[["w", label_col, "k", "ndocs"]]],
                         ignore_index=True).fillna({"ndocs": 0})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if parts.empty:
        raise ValueError("nb_train_score over an empty corpus "
                         "(no documents or no tokens)")
    docs = (parts[parts.w == ""].groupby(label_col, as_index=False)
            .ndocs.sum())
    cube = (parts[parts.w != ""].groupby(["w", label_col], as_index=False)
            .k.sum())
    tot = cube.groupby("w", as_index=False).k.sum()
    vocab = (tot.sort_values(["k", "w"], ascending=[False, True])
             .head(vocab_size).w.tolist())
    cube = cube[cube.w.isin(vocab)].reset_index(drop=True)
    return vocab, cube, docs


def nb_train_score(ds, *, label_col: str = "lang", id_col: str = "doc_id",
                   text_col: str = "text", vocab_size: int = 128,
                   alpha: float = 1.0):
    """Train multinomial NB on the corpus's own labels, then score and
    re-classify every document::

        P(t|l)    = (c(t,l) + α) / (Σ_vocab c(·,l) + α·V)
        prior(l)  = ndocs(l) / ndocs
        score     = μ(ln prior) + Σ_{t ∈ doc ∩ vocab} k_t · μ(ln P(t|l))

    with ``μ(x) = round(x · 1e6)`` (integer micro-nats).  Output one
    row per document: ``id_col``, ``pred`` (argmax label, ties to the
    lexicographically smallest), ``score_micro`` (int64 winning
    score), ``n_vocab_tokens`` (int64 vocab-token occurrences used).
    Docs containing no vocabulary token degenerate to the prior
    argmax — they are kept (n_vocab_tokens = 0), never dropped."""
    import ray

    vocab, cube, docs = _vocab_and_counts(
        ds, label_col=label_col, text_col=text_col, vocab_size=vocab_size)
    if docs.empty or not vocab:
        raise ValueError("nb_train_score over an empty corpus "
                         "(no documents or no tokens)")
    labels = sorted(docs[label_col].tolist())
    V, L = len(vocab), len(labels)
    tok_i = {w: i for i, w in enumerate(vocab)}
    lab_i = {l: i for i, l in enumerate(labels)}

    counts = np.zeros((V, L), dtype=np.float64)
    counts[cube.w.map(tok_i), cube[label_col].map(lab_i)] = \
        cube.k.to_numpy(np.float64)
    tok_per_label = counts.sum(axis=0)
    logp = np.log((counts + alpha) / (tok_per_label + alpha * V))
    logp_micro = np.round(logp * MICRO).astype(np.int64)

    nd = docs.set_index(label_col).ndocs
    prior_micro = np.array(
        [round(float(np.log(nd[l] / float(nd.sum()))) * MICRO)
         for l in labels], dtype=np.int64)

    ref = ray.put((tok_i, logp_micro, prior_micro))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        t2i, lp, pri = ray.get(ref)
        ex = (b[[id_col]].copy()
              .assign(w=b[text_col].str.lower().str.findall(r"[a-z0-9]+"))
              .explode("w").dropna(subset=["w"]))
        ex["i"] = ex.w.map(t2i)
        ex = ex.dropna(subset=["i"])
        tf = ex.groupby([id_col, "i"], as_index=False).size()
        contrib = (tf["size"].to_numpy(np.int64)[:, None]
                   * lp[tf.i.to_numpy(np.int64)])
        per_doc = (pd.DataFrame(contrib, copy=False)
                   .assign(**{id_col: tf[id_col].to_numpy(),
                              "_k": tf["size"].to_numpy(np.int64)})
                   .groupby(id_col, as_index=False).sum())
        scores = pd.DataFrame(
            {id_col: b[id_col], "_k": np.int64(0),
             **{j: np.int64(0) for j in range(L)}}).set_index(id_col)
        got = per_doc.set_index(id_col)
        scores.loc[got.index] = got
        mat = scores[list(range(L))].to_numpy(np.int64) + pri[None, :]
        best = mat.argmax(axis=1)  # first (label-ascending) wins ties
        return pd.DataFrame({
            id_col: scores.index.to_numpy(),
            "pred": np.array(labels, dtype=object)[best],
            "score_micro": mat[np.arange(len(mat)), best],
            "n_vocab_tokens": scores["_k"].to_numpy(np.int64),
        })

    return ds.map_batches(score, batch_format="pandas")
