"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — the query matrix is broadcast
once (``ray.put``), each batch does one numpy matmul and emits its
batch-local top-k per query (a partial), and a tiny final groupby
merges partials into the global top-k. The full corpus is streamed,
never materialized.

Scale path: ``IvfIndex`` — k-means-lite coarse quantizer; each vector
is assigned to its nearest centroid (one shuffle-free map_batches) and
``build`` persists the corpus as parquet PARTITIONED BY BUCKET
(``path/ivf_bucket=<j>/``) plus a sibling centroids file. ``search``
against a built index resolves the ``nprobe`` nearest buckets'
directories and reads ONLY those files — the scan itself is pruned
(that is the IVF payoff: rows read scale with nprobe/num_centroids,
not corpus size), then reranks exactly inside them. Centroids are
trained on a pruned ``limit()`` sample, never a full pass.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def ann_topk(ds, query_vecs: np.ndarray, *, k: int = 10, vec_col: str = "embedding",
             id_col: str = "vec_id", query_ids: list | None = None):
    """Brute-force cosine top-k. Returns (query_id, vec_id, cosine) —
    exactly k rows per query, ties broken by smaller vec_id (pinned so
    results are deterministic and oracle-comparable)."""
    import ray

    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    if q.ndim != 2:
        raise ValueError("query_vecs must be (Q, dim)")
    qids = list(query_ids) if query_ids is not None else list(range(len(q)))
    ref = ray.put(q)

    def partial_topk(batch: pd.DataFrame) -> pd.DataFrame:
        qm = ray.get(ref)
        m = _normalize(np.stack(batch[vec_col].to_numpy()).astype(np.float64))
        sims = qm @ m.T  # (Q, B)
        ids = batch[id_col].to_numpy()
        out = []
        kk = min(k, sims.shape[1])
        for qi in range(sims.shape[0]):
            row = sims[qi]
            # top-k with (−sim, vec_id) lexicographic tie-break
            idx = np.lexsort((ids, -row))[:kk]
            out.append(pd.DataFrame({"query_id": qids[qi], id_col: ids[idx],
                                     "cosine": row[idx]}))
        return pd.concat(out, ignore_index=True)

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["cosine", id_col], ascending=[False, True], kind="mergesort")
        return g.head(k)

    return (
        ds.map_batches(partial_topk, batch_format="pandas")
        .groupby("query_id")
        .map_groups(merge, batch_format="pandas")
    )


class IvfIndex:
    """IVF coarse index over an embedding Dataset (the scale path).

    ``build`` trains centroids on a sample and writes bucket
    assignments; ``search`` probes the nprobe nearest buckets only.
    """

    def __init__(self, num_centroids: int = 16, iters: int = 10, seed: int = 5102020):
        self.num_centroids = num_centroids
        self.iters = iters
        self.seed = seed
        self.centroids: np.ndarray | None = None

    def train(self, sample_vecs: np.ndarray) -> "IvfIndex":
        x = _normalize(np.asarray(sample_vecs, dtype=np.float64))
        rng = np.random.default_rng(self.seed)
        c = x[rng.choice(len(x), size=min(self.num_centroids, len(x)), replace=False)]
        for _ in range(self.iters):
            assign = np.argmax(x @ c.T, axis=1)
            for j in range(len(c)):
                mask = assign == j
                if mask.any():
                    c[j] = x[mask].mean(axis=0)
            c = _normalize(c)
        self.centroids = c
        return self

    def assign(self, ds, *, vec_col: str = "embedding", bucket_col: str = "ivf_bucket"):
        if self.centroids is None:
            raise ValueError("train() first")
        import ray

        ref = ray.put(self.centroids)

        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(ref)
            m = _normalize(np.stack(batch[vec_col].to_numpy()).astype(np.float64))
            batch[bucket_col] = np.argmax(m @ c.T, axis=1).astype("int64")
            return batch

        return ds.map_batches(fn, batch_format="pandas")

    def build(self, ds, path: str, *, vec_col: str = "embedding",
              id_col: str = "vec_id", bucket_col: str = "ivf_bucket",
              train_sample: int = 2000) -> str:
        """Train (if needed, on a pruned ``limit()`` sample), assign,
        and persist ``ds`` as bucket-partitioned parquet under ``path``
        (one ``{bucket_col}=<j>/`` directory per non-empty bucket, on
        shared storage in a multi-node cluster) plus
        ``<path>.centroids.npz``. The partition layout IS the index."""
        import shutil

        if self.centroids is None:
            sample = ds.limit(train_sample).to_pandas()
            self.train(np.stack(sample[vec_col].to_numpy()))
        assigned = self.assign(ds, vec_col=vec_col, bucket_col=bucket_col)
        shutil.rmtree(path, ignore_errors=True)
        assigned.write_parquet(path, partition_cols=[bucket_col])
        np.savez(path + ".centroids.npz", centroids=self.centroids,
                 bucket_col=np.array(bucket_col))
        return path

    @classmethod
    def load(cls, path: str) -> "IvfIndex":
        with np.load(path + ".centroids.npz") as npz:
            c = npz["centroids"]
        idx = cls(num_centroids=len(c))
        idx.centroids = c
        return idx

    def probe_dirs(self, path: str, query_vec: np.ndarray, nprobe: int,
                   bucket_col: str = "ivf_bucket") -> list[str]:
        """The ≤ nprobe partition directories a query reads: the nprobe
        nearest centroids' buckets, minus those that hold no rows."""
        if self.centroids is None:
            raise ValueError("train() first")
        q = _normalize(np.asarray(query_vec, dtype=np.float64).reshape(1, -1))
        probes = np.argsort(-(q @ self.centroids.T)[0])[:nprobe]
        dirs = [os.path.join(path, f"{bucket_col}={int(j)}") for j in probes]
        return [d for d in dirs if os.path.isdir(d)]

    def search(self, index, query_vec: np.ndarray, *, k: int = 10, nprobe: int = 4,
               vec_col: str = "embedding", id_col: str = "vec_id",
               bucket_col: str = "ivf_bucket"):
        """Probe the nprobe nearest buckets; exact rerank inside them.

        ``index`` is the path returned by :meth:`build` — the scan is
        PRUNED at the file level: only the probed buckets' parquet
        files are opened, so rows read scale with nprobe, not corpus
        size. (Passing an assigned in-memory Dataset instead falls back
        to a documented scan-and-filter over every row — correct, but
        no I/O pruning; prefer ``build``.)"""
        if self.centroids is None:
            raise ValueError("train() first")
        q = _normalize(np.asarray(query_vec, dtype=np.float64).reshape(1, -1))

        if isinstance(index, str):
            import ray.data as rd

            dirs = self.probe_dirs(index, query_vec, nprobe, bucket_col)
            files = [os.path.join(d, f) for d in dirs
                     for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
            if not files:
                return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                     "cosine": pd.Series([], dtype="float64")})
            ds = rd.read_parquet(files, columns=[id_col, vec_col])
        else:
            probes = set(np.argsort(-(q @ self.centroids.T)[0])[:nprobe].tolist())
            ds = index

        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            if not isinstance(index, str):
                batch = batch[batch[bucket_col].isin(probes)]
            if batch.empty:
                return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                     "cosine": pd.Series([], dtype="float64")})
            m = _normalize(np.stack(batch[vec_col].to_numpy()).astype(np.float64))
            sims = (q @ m.T)[0]
            ids = batch[id_col].to_numpy()
            idx = np.lexsort((ids, -sims))[: min(k, len(ids))]
            return pd.DataFrame({id_col: ids[idx], "cosine": sims[idx]})

        out = ds.map_batches(fn, batch_format="pandas").to_pandas()
        return out.sort_values(["cosine", id_col], ascending=[False, True]).head(k).reset_index(drop=True)


def embedding_covariance(ds, *, vec_col: str = "embedding",
                         decimals: int = 6):
    """Population covariance matrix of an embedding column via
    distributed sufficient stats: per-batch ``(XᵀX, Σx, n)`` — the
    exchange moves ``d² + d`` floats per batch regardless of row count
    — merged pointwise on the driver (bounded by ``d²``). Output: one
    row per upper-triangle entry ``(i, j, cov)`` (0-based, i ≤ j),
    ``cov = Σ(x_i·x_j)/n − mean_i·mean_j`` rounded to ``decimals`` —
    the same expression the SQL oracle computes from SUM()s. The PCA
    fit (:func:`pca_project`) consumes these stats directly.
    """
    import ray.data as rd

    stats = _suff_stats(ds, vec_col)
    S, m, n = stats
    cov = S / n - np.outer(m / n, m / n)
    d = cov.shape[0]
    iu, ju = np.triu_indices(d)
    return rd.from_pandas(pd.DataFrame({
        "i": iu.astype(np.int64),
        "j": ju.astype(np.int64),
        "cov": np.round(cov[iu, ju], decimals),
    }))


def _suff_stats(ds, vec_col: str):
    """(XᵀX, Σx, n) accumulated across batches; one driver merge over
    per-batch partials (each a single (d² + d + 1)-float row)."""
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        X = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        S = X.T @ X
        return pd.DataFrame({
            "S": [S.ravel()], "m": [X.sum(axis=0)], "n": [len(X)]})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    S = np.sum(np.stack(parts["S"].to_numpy()), axis=0)
    m = np.sum(np.stack(parts["m"].to_numpy()), axis=0)
    n = float(parts["n"].sum())
    d = int(np.sqrt(S.shape[0]))
    return S.reshape(d, d), m, n


def pca_project_by(ds, *, by: str, dim_out: int,
                   vec_col: str = "embedding", out_col: str = "pca"):
    """Per-GROUP PCA: an independent PCA basis per category (e.g. one
    per language/domain/label) — the grouped variant of
    :func:`pca_project` for corpora whose clusters have different
    principal subspaces.

    Fit: per-batch partial sufficient stats PER GROUP (one
    ``(d²+d+1)``-float row per (batch, group) — bounded by the
    category domain, never corpus rows), merged pointwise on the
    driver, one tiny ``d×d`` eigh per group with the same
    sign-pinning as :func:`pca_project`.  Transform: one stateless
    ``map_batches`` looking up each row's group basis.  Requires a
    BOUNDED ``by`` domain (same contract as ``relational.pivot_sum``).
    Returns ``(dataset, {group: (components, explained_var, mean)})``.
    """
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for g, grp in b.groupby(by, sort=False):
            X = np.stack(grp[vec_col].to_numpy()).astype(np.float64)
            rows.append({by: g, "S": (X.T @ X).ravel(),
                         "m": X.sum(axis=0), "n": len(X)})
        return pd.DataFrame(rows)

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    fits: dict = {}
    for g, grp in parts.groupby(by, sort=True):
        S = np.sum(np.stack(grp["S"].to_numpy()), axis=0)
        m = np.sum(np.stack(grp["m"].to_numpy()), axis=0)
        n = float(grp["n"].sum())
        d = int(np.sqrt(S.shape[0]))
        mean = m / n
        cov = S.reshape(d, d) / n - np.outer(mean, mean)
        w, v = np.linalg.eigh(cov)
        order = np.argsort(w)[::-1][:dim_out]
        comps = v[:, order]
        flip = np.sign(comps[np.argmax(np.abs(comps), axis=0),
                             np.arange(comps.shape[1])])
        comps = comps * np.where(flip == 0, 1.0, flip)
        fits[g] = (comps, w[order], mean)

    def project(b: pd.DataFrame) -> pd.DataFrame:
        X = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        out = np.empty((len(X), dim_out), dtype=np.float64)
        gv = b[by].to_numpy()
        for g in pd.unique(gv):
            comps, _, mean = fits[g]
            sel = gv == g
            out[sel] = (X[sel] - mean) @ comps
        b[out_col] = list(out)
        return b

    return ds.map_batches(project, batch_format="pandas"), fits


def pca_project(ds, *, dim_out: int, vec_col: str = "embedding",
                out_col: str = "pca"):
    """PCA dimensionality reduction of an embedding column — the
    standard pre-ANN compression step: fit = the same d×d sufficient
    stats as :func:`embedding_covariance` (one streaming pass, driver
    eigh on the tiny d×d matrix — NEVER the corpus), transform = one
    stateless ``map_batches`` projecting each batch with the broadcast
    ``(d, dim_out)`` component matrix. Component signs are pinned
    (largest-|loading| entry positive) so the output is deterministic
    under any partitioning. Returns the dataset with ``out_col`` =
    centered projection (list<float64>), plus the fitted
    ``(components, explained_var, mean)`` as a second return value.
    """
    S, m, n = _suff_stats(ds, vec_col)
    mean = m / n
    cov = S / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)            # ascending
    order = np.argsort(w)[::-1][:dim_out]
    comps = v[:, order]                    # (d, dim_out)
    flip = np.sign(comps[np.argmax(np.abs(comps), axis=0),
                         np.arange(comps.shape[1])])
    comps = comps * np.where(flip == 0, 1.0, flip)
    evar = w[order]

    def project(b: pd.DataFrame) -> pd.DataFrame:
        X = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        P = (X - mean) @ comps
        b[out_col] = list(P)
        return b

    return ds.map_batches(project, batch_format="pandas"), (comps, evar, mean)


def sq8_stats(ds, *, vec_col: str = "embedding"):
    """Exact per-dimension (min, max) of an embedding corpus — the
    scalar-quantization codebook. One bounded exchange: each batch
    reduces to two d-vectors, merged on the driver (2d doubles per
    batch regardless of rows)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        return pd.DataFrame({"dim": np.arange(m.shape[1], dtype=np.int64),
                             "mn": m.min(axis=0), "mx": m.max(axis=0)})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if parts.empty:
        raise ValueError("sq8_stats over an empty dataset")
    agg = parts.groupby("dim").agg(mn=("mn", "min"), mx=("mx", "max"))
    return agg.mn.to_numpy(), agg.mx.to_numpy()


def sq8_encode(ds, *, vec_col: str = "embedding", id_col: str = "vec_id",
               stats: tuple[np.ndarray, np.ndarray] | None = None):
    """int8 scalar quantization of an embedding column — the 4×
    storage/IO compression step ANN indexes run at corpus scale
    (codes ride the shuffle/index instead of float32 vectors; exact
    rerank re-reads floats only for the shortlist)::

        code = round((x − min_d) / ((max_d − min_d) / 255))   ∈ [0, 255]

    per dimension, constant dims pinned to 0 (scale would be 0/0).
    The codebook is exact per-dim min/max (``sq8_stats``, bounded
    exchange) broadcast via ``ray.put``; encoding is a stateless
    vectorized pass.  Every output is an INTEGER function of
    identical-operand doubles, so the SQL oracle replays codes
    exactly.  Output: ``id_col``, ``code_sum`` (int64),
    ``code_min``/``code_max`` (int64) and ``codes`` (list<int16>) —
    the summary scalars exist so the driver hash check has a flat
    schema to compare."""
    import ray

    mn, mx = stats if stats is not None else sq8_stats(ds, vec_col=vec_col)
    scale = (mx - mn) / 255.0
    live = scale > 0
    ref = ray.put((mn, scale, live))

    def encode(b: pd.DataFrame) -> pd.DataFrame:
        mn_, sc_, lv_ = ray.get(ref)
        m = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        codes = np.zeros(m.shape, dtype=np.int64)
        codes[:, lv_] = np.round((m[:, lv_] - mn_[lv_]) / sc_[lv_])
        return pd.DataFrame({
            id_col: b[id_col].to_numpy(),
            "code_sum": codes.sum(axis=1),
            "code_min": codes.min(axis=1),
            "code_max": codes.max(axis=1),
            "codes": [row.astype(np.int16) for row in codes],
        })

    return ds.map_batches(encode, batch_format="pandas")
