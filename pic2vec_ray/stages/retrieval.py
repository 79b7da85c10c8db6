"""Inverted-index BM25 retrieval store — the lexical sibling of
``similarity.IvfIndex``.

``stages/text.bm25_topk`` scores a query batch by scanning the whole
corpus; correct for batch retrieval, but at 100 TB a lookup-shaped
workload (decontamination probes, hard-negative mining) must not pay a
corpus scan per query. ``InvertedIndex`` persists the corpus ONCE as
token-bucketed posting lists (parquet partitioned by a stable term
hash, the partition layout IS the index, exactly like IvfIndex's
bucket directories), and a search opens only the queried terms'
bucket directories: I/O scales with posting lists touched, never with
corpus size.

Score parity: the scorer reproduces ``bm25_topk``'s floating-point
addend sequence bit-for-bit — same exact-integer corpus stats
(``N``, total ``dl``, per-term ``df``), same Lucene idf, same pinned
per-query term order (absent terms contribute the 0.0 identity), same
6-dp rounding before the (score DESC, id ASC) rank — so the corpus-
scan path, the indexed path and the SQL oracle agree exactly
(pinned by ``tests/test_retrieval.py`` and the driver query
``bm25_topk_indexed_docs``).
"""

from __future__ import annotations

import json
import math
import os
import re

import numpy as np
import pandas as pd

_TOKEN = r"[a-z0-9]+"


def _term_bucket(terms: pd.Series, n_buckets: int) -> pd.Series:
    # pd.util.hash_pandas_object is processes-stable (fixed hash key):
    # the same rule locates a term's bucket at build and at search
    return (pd.util.hash_pandas_object(terms, index=False)
            % np.uint64(n_buckets)).astype("int64")


class InvertedIndex:
    """Token-bucketed BM25 posting-list store over parquet."""

    def __init__(self, n_buckets: int = 16):
        if n_buckets < 1:
            raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
        self.n_buckets = int(n_buckets)
        self.n_docs: int | None = None
        self.total_dl: int | None = None

    # ------------------------------------------------------------ build
    def build(self, ds, path: str, *, text_col: str = "text",
              id_col: str = "doc_id") -> str:
        """Tokenize ``ds`` and persist posting rows
        ``(term, doc_id, tf, dl)`` partitioned by ``tbucket`` (one
        directory per term-hash bucket), plus a tiny sidecar with the
        EXACT integer corpus stats (doc count, total token count) the
        scorer needs. One streaming pass; the only exchange is the
        partitioned write."""
        import shutil

        import ray.data as rd  # noqa: F401 — ds is already a Dataset

        nb = self.n_buckets

        def postings(batch: pd.DataFrame) -> pd.DataFrame:
            toks = batch[text_col].str.lower().str.findall(_TOKEN)
            dl = toks.str.len().to_numpy(np.int64)
            ex = pd.DataFrame({
                id_col: np.repeat(batch[id_col].to_numpy(), dl),
                "term": np.concatenate([np.array(t, dtype=object)
                                        for t in toks])
                if dl.sum() else np.array([], dtype=object),
            })
            tf = (ex.groupby([id_col, "term"], as_index=False).size()
                  .rename(columns={"size": "tf"}))
            dl_of = dict(zip(batch[id_col].to_numpy(), dl))
            tf["dl"] = tf[id_col].map(dl_of).astype("int64")
            tf["tbucket"] = _term_bucket(tf["term"], nb)
            # exact corpus partials ride along as one metadata row per
            # batch (term='' never tokenizes, so it cannot collide)
            meta = pd.DataFrame({id_col: [-1], "term": [""],
                                 "tf": [len(batch)],
                                 "dl": [int(dl.sum())],
                                 "tbucket": [-1]})
            return pd.concat([tf, meta], ignore_index=True)

        rows = ds.map_batches(postings, batch_format="pandas").materialize()
        meta = rows.filter(expr="tbucket == -1").to_pandas()
        self.n_docs = int(meta.tf.sum())
        self.total_dl = int(meta.dl.sum())
        shutil.rmtree(path, ignore_errors=True)
        rows.filter(expr="tbucket >= 0").write_parquet(
            path, partition_cols=["tbucket"])
        with open(path + ".stats.json", "w") as f:
            json.dump({"n_buckets": nb, "n_docs": self.n_docs,
                       "total_dl": self.total_dl}, f)
        return path

    @classmethod
    def load(cls, path: str) -> "InvertedIndex":
        with open(path + ".stats.json") as f:
            st = json.load(f)
        idx = cls(n_buckets=st["n_buckets"])
        idx.n_docs, idx.total_dl = st["n_docs"], st["total_dl"]
        return idx

    # ----------------------------------------------------------- search
    def posting_dirs(self, path: str, terms: list[str]) -> list[str]:
        """The ≤ len(terms) bucket directories a search opens — the
        file-level pruning surface (tests assert it stays below the
        corpus file count)."""
        buckets = sorted(set(_term_bucket(pd.Series(list(terms),
                                                    dtype=object),
                                          self.n_buckets).tolist()))
        dirs = [os.path.join(path, f"tbucket={b}") for b in buckets]
        return [d for d in dirs if os.path.isdir(d)]

    def search(self, path: str, queries: list[str], *, k: int = 5,
               id_col: str = "doc_id", k1: float = 1.2, b: float = 0.75,
               decimals: int = 6) -> pd.DataFrame:
        """Batch BM25 top-``k`` per query string, reading ONLY the
        queried terms' bucket directories. Returns
        ``(query_id, doc_id, score)`` — identical to
        ``stages/text.bm25_topk`` on the same corpus."""
        import ray.data as rd

        if self.n_docs is None or self.total_dl is None:
            raise ValueError("build() or load() first")
        qterms = [list(dict.fromkeys(re.findall(_TOKEN, q.lower())))
                  for q in queries]
        union_terms = list(dict.fromkeys(t for ts in qterms for t in ts))
        if not union_terms:
            return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                 id_col: pd.Series([], dtype="int64"),
                                 "score": pd.Series([], dtype="float64")})
        dirs = self.posting_dirs(path, union_terms)
        files = [os.path.join(d, f) for d in dirs
                 for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
        if not files:
            return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                 id_col: pd.Series([], dtype="int64"),
                                 "score": pd.Series([], dtype="float64")})
        hits = (rd.read_parquet(files, columns=["term", id_col, "tf", "dl"])
                .map_batches(lambda df: df[df.term.isin(union_terms)],
                             batch_format="pandas")
                .to_pandas())
        if not len(hits):  # probed buckets held none of the terms
            return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                 id_col: pd.Series([], dtype="int64"),
                                 "score": pd.Series([], dtype="float64")})
        # exact stats → the SAME doubles the corpus-scan path derives
        N = float(self.n_docs)
        avgdl = float(self.total_dl) / N
        df_of = hits.groupby("term")[id_col].nunique()
        idf = {t: math.log(1.0 + (N - float(df_of.get(t, 0)) + 0.5)
                           / (float(df_of.get(t, 0)) + 0.5))
               for t in union_terms}

        # per-(doc, term) addend, computed once, summed per query in the
        # PINNED term order (bm25_topk's addend sequence bit-for-bit)
        piv = {}
        for t in union_terms:
            sub = hits[hits.term == t]
            f = sub.tf.to_numpy(np.float64)
            dl = sub.dl.to_numpy(np.float64)
            denom = f + k1 * (1.0 - b + b * dl / avgdl)
            piv[t] = pd.Series(idf[t] * (f * (k1 + 1.0)) / denom,
                               index=sub[id_col].to_numpy())
        out = []
        for qi, terms in enumerate(qterms):
            docs = pd.Index(sorted(set().union(
                *(set(piv[t].index) for t in terms if t in piv))))
            if not len(docs):
                continue
            s = np.zeros(len(docs), dtype=np.float64)
            for t in terms:  # fixed order per query = pinned addends
                if t in piv:
                    s += piv[t].reindex(docs, fill_value=0.0).to_numpy()
            nz = s > 0
            sel = pd.DataFrame({"query_id": np.int64(qi),
                                id_col: docs.to_numpy()[nz],
                                "score": np.round(s[nz], decimals)})
            sel = sel.sort_values(["score", id_col],
                                  ascending=[False, True],
                                  kind="mergesort").head(k)
            out.append(sel)
        if not out:
            return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                 id_col: pd.Series([], dtype="int64"),
                                 "score": pd.Series([], dtype="float64")})
        return pd.concat(out, ignore_index=True)
