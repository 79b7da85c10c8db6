"""Deduplication suite (exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine) — the large-scale training-data operators the
reference lacks (its only dedup is a per-batch memo,
``/root/reference/pic2vec/feature_preprocessing.py:449-455``; SURVEY.md
§2.7 maps the global variants to hash-partition shuffles).

Scale design notes:

- exact dedup is TWO-phase: a per-batch partial (drop within-batch
  duplicates, keep min id) shrinks the shuffle, then one hash groupby
  finishes — the salted pre-aggregate pattern, correct because
  "first = min(id)" is associative-commutative;
- hash groups are verified against the actual content inside the
  group, so a 64-bit hash collision can never merge distinct texts;
- MinHash signatures/band rows are computed vectorized per batch and
  shuffled only as narrow (band, band_hash, doc_id) rows; candidate
  verification recomputes true Jaccard per candidate pair.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_MERSENNE = (1 << 61) - 1


def _stable_text_hash(s: pd.Series) -> pd.Series:
    return pd.util.hash_pandas_object(s, index=False).astype("uint64")


# ------------------------------------------------------------ exact dedup


def dedup_exact(ds, *, col: str = "text", id_col: str = "doc_id", num_partitions: int = 64):
    """Keep exactly one row (min ``id_col``) per distinct ``col`` value."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.sort_values(id_col).drop_duplicates(subset=[col], keep="first")
        batch["__h"] = (_stable_text_hash(batch[col]) % num_partitions).astype("int64")
        return batch

    def finish(group: pd.DataFrame) -> pd.DataFrame:
        # verify on actual content, not the hash, then keep min id
        out = group.sort_values(id_col).drop_duplicates(subset=[col], keep="first")
        return out.drop(columns="__h")

    return ds.map_batches(partial, batch_format="pandas").groupby("__h").map_groups(
        finish, batch_format="pandas"
    )


# --------------------------------------------------------------- shingles


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Character k-shingle 64-bit hashes (vector per doc)."""
    if len(text) < k:
        # zlib.crc32 (not builtin hash(): that is salted per process)
        import zlib

        return np.array([zlib.crc32(text.encode())], dtype=np.uint64)
    views = [text[i : i + k] for i in range(len(text) - k + 1)]
    return pd.util.hash_pandas_object(pd.Series(views), index=False).to_numpy()


def jaccard(a: str, b: str, k: int = 5) -> float:
    """True n-gram (character k-shingle) Jaccard similarity."""
    sa = {a[i : i + k] for i in range(max(len(a) - k + 1, 1))}
    sb = {b[i : i + k] for i in range(max(len(b) - k + 1, 1))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def _minhash_params(num_perm: int, seed: int = 5102020):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(text: str, a: np.ndarray, b: np.ndarray, k: int = 5) -> np.ndarray:
    sh = _shingle_hashes(text, k).astype(np.uint64)
    # (a*x + b) mod p, vectorized over shingles × permutations
    prod = (np.outer(sh % _MERSENNE, a) + b) % _MERSENNE
    return prod.min(axis=0)


def minhash_lsh_pairs(ds, *, col: str = "text", id_col: str = "doc_id",
                      num_perm: int = 64, bands: int = 16, shingle_k: int = 5,
                      threshold: float = 0.5, num_partitions: int = 64):
    """MinHash+LSH near-duplicate pairs with verified true Jaccard.

    Stages: shingle→minhash signatures per batch → band rows →
    groupby band bucket → candidate pairs → **vectorized
    signature-agreement prefilter** (estimated Jaccard = fraction of
    matching minhash components; LSH buckets over repetitive corpora
    explode into 100k+ candidates, and exact set-based verification of
    each was the measured bottleneck — the prefilter kills ~99% of
    false candidates in one numpy pass) → exact Jaccard only on
    survivors. Signatures/texts are broadcast via ray.put (they cover
    only candidate ids); at 10^12-doc scale both broadcasts become
    bucketed joins of pair rows back to the docs table — candidates,
    not the corpus, bound the cost. Returns (id_a, id_b, jaccard),
    id_a < id_b.
    """
    import ray
    import ray.data as rd

    if num_perm % bands:
        raise ValueError("bands must divide num_perm")
    rows_per_band = num_perm // bands
    a, b = _minhash_params(num_perm)
    # prefilter margin: E[est] = true J; with 64 perms, σ ≈ 0.06 — a
    # 3σ-ish margin keeps recall while dropping the candidate flood.
    est_cutoff = max(0.0, threshold - 0.2)

    def to_sigs(batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack([minhash_signature(t, a, b, shingle_k) for t in batch[col]])
        return pd.DataFrame({id_col: batch[id_col].to_numpy(),
                             "sig": [s for s in sigs]})

    sig_ds = ds.map_batches(to_sigs, batch_format="pandas").materialize()

    def to_bands(batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack(batch["sig"].to_numpy())
        n = len(batch)
        band_ids = np.repeat(np.arange(bands), n)
        ids = np.tile(batch[id_col].to_numpy(), bands)
        bh = np.empty(bands * n, dtype=np.uint64)
        for bi in range(bands):
            seg = sigs[:, bi * rows_per_band : (bi + 1) * rows_per_band]
            bh[bi * n : (bi + 1) * n] = pd.util.hash_pandas_object(
                pd.DataFrame(seg), index=False
            ).to_numpy()
        out = pd.DataFrame({"band": band_ids, "band_hash": bh, id_col: ids})
        out["__part"] = ((out.band_hash ^ out.band) % num_partitions).astype("int64")
        return out

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        pairs = []
        for (_, _), g in group.groupby(["band", "band_hash"], sort=False):
            ids = np.sort(g[id_col].unique())
            if len(ids) > 1:
                ia, ib = np.triu_indices(len(ids), k=1)
                pairs.append(pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]}))
        if not pairs:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        return pd.concat(pairs, ignore_index=True).drop_duplicates()

    cand = (
        sig_ds.map_batches(to_bands, batch_format="pandas")
        .groupby("__part")
        .map_groups(bucket_pairs, batch_format="pandas")
    )

    # broadcast the signature matrix once for the vectorized prefilter
    sig_pdf = sig_ds.to_pandas()
    sig_ids = sig_pdf[id_col].to_numpy()
    sig_mat = np.stack(sig_pdf["sig"].to_numpy())
    id_to_row = {int(i): r for r, i in enumerate(sig_ids)}
    sig_ref = ray.put((id_to_row, sig_mat))

    def prefilter(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.drop_duplicates(subset=["id_a", "id_b"])
        if batch.empty:
            batch["est_jaccard"] = pd.Series([], dtype="float64")
            return batch
        rows_map, mat = ray.get(sig_ref)
        ra = batch.id_a.map(rows_map).to_numpy()
        rb = batch.id_b.map(rows_map).to_numpy()
        est = (mat[ra] == mat[rb]).mean(axis=1)
        batch = batch.copy()
        batch["est_jaccard"] = est
        return batch[batch.est_jaccard >= est_cutoff]

    survivors = dedup_pairs(
        cand.map_batches(prefilter, batch_format="pandas"), num_partitions
    )
    surv_pdf = survivors.to_pandas()
    if surv_pdf.empty:
        return rd.from_pandas(pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                            "id_b": pd.Series([], dtype="int64"),
                                            "jaccard": pd.Series([], dtype="float64")}))
    need = set(surv_pdf.id_a) | set(surv_pdf.id_b)
    texts = (
        ds.map_batches(
            lambda t: t[t[id_col].isin(need)][[id_col, col]], batch_format="pandas"
        )
        .to_pandas()
        .set_index(id_col)[col]
        .to_dict()
    )
    ref = ray.put(texts)
    pairs_ds = rd.from_pandas(surv_pdf.reset_index(drop=True))

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(ref)
        batch = batch.copy()
        batch["jaccard"] = [
            jaccard(lookup[x], lookup[y], shingle_k)
            for x, y in zip(batch.id_a, batch.id_b)
        ]
        out = batch[batch.jaccard >= threshold]
        return out[["id_a", "id_b", "jaccard"]]

    return pairs_ds.map_batches(verify, batch_format="pandas")


# ---------------------------------------------------------------- simhash


def simhash64(text: str, k: int = 4) -> int:
    """64-bit SimHash over character k-shingles."""
    sh = _shingle_hashes(text, k)
    bits = ((sh[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
    v = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for i in np.flatnonzero(v > 0):
        out |= np.uint64(1) << np.uint64(i)
    return int(out.astype(np.int64))


def simhash_pairs(ds, *, col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3, shingle_k: int = 4, num_partitions: int = 64):
    """SimHash near-dup pairs: band the 64-bit hash into 4×16-bit chunks
    (pigeonhole: hamming ≤ 3 ⇒ at least one identical chunk), bucket by
    chunk, verify true hamming distance. Returns (id_a, id_b, hamming)."""

    def to_chunks(batch: pd.DataFrame) -> pd.DataFrame:
        hs = np.array([simhash64(t, shingle_k) for t in batch[col]], dtype=np.int64)
        u = hs.view(np.uint64)
        frames = []
        for c in range(4):
            chunk = ((u >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64)
            frames.append(pd.DataFrame({
                "chunk_no": c, "chunk": chunk, id_col: batch[id_col].to_numpy(),
                "simhash": hs,
            }))
        out = pd.concat(frames, ignore_index=True)
        out["__part"] = (
            pd.util.hash_pandas_object(out[["chunk_no", "chunk"]], index=False)
            % num_partitions
        ).astype("int64")
        return out

    def bucket(group: pd.DataFrame) -> pd.DataFrame:
        res = []
        for _, g in group.groupby(["chunk_no", "chunk"], sort=False):
            if len(g) < 2:
                continue
            g = g.drop_duplicates(subset=[id_col]).sort_values(id_col)
            ids = g[id_col].to_numpy()
            hv = g["simhash"].to_numpy().view(np.uint64)
            ia, ib = np.triu_indices(len(ids), k=1)
            ham = np.array([bin(int(hv[x] ^ hv[y])).count("1") for x, y in zip(ia, ib)])
            keep = ham <= max_hamming
            if keep.any():
                res.append(pd.DataFrame({"id_a": ids[ia[keep]], "id_b": ids[ib[keep]],
                                         "hamming": ham[keep]}))
        if not res:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64")})
        return pd.concat(res, ignore_index=True)

    out = (
        ds.map_batches(to_chunks, batch_format="pandas")
        .groupby("__part")
        .map_groups(bucket, batch_format="pandas")
    )
    # same pair can surface from several chunks → final dedup
    return dedup_pairs(out)


def dedup_pairs(pairs_ds, num_partitions: int = 64):
    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.drop_duplicates(subset=["id_a", "id_b"]).copy()
        batch["__p"] = (
            pd.util.hash_pandas_object(batch[["id_a", "id_b"]], index=False)
            % num_partitions
        ).astype("int64")
        return batch

    return (
        pairs_ds.map_batches(tag, batch_format="pandas")
        .groupby("__p")
        .map_groups(
            lambda g: g.drop_duplicates(subset=["id_a", "id_b"]).drop(columns="__p"),
            batch_format="pandas",
        )
    )


# ------------------------------------------ near-dup clusters (conn. comp.)


def neardup_groups(pairs_ds, *, num_partitions: int = 64, max_rounds: int = 20):
    """Connected components over near-duplicate pairs → (id, group_id).

    Distributed min-label propagation (the scale-safe alternative to a
    driver-side union-find): each round, every node adopts the minimum
    label among itself and its neighbors (one hash groupby per round);
    converges in O(diameter) rounds — near-dup clusters are tiny, so a
    handful. ``group_id`` is the minimum member id, making the keep-rule
    "keep id == group_id" deterministic.
    """
    import ray.data as rd

    pairs = pairs_ds.select_columns(["id_a", "id_b"]).to_pandas()
    if pairs.empty:
        return rd.from_pandas(pd.DataFrame({"id": pd.Series([], dtype="int64"),
                                            "group_id": pd.Series([], dtype="int64")}))
    # labels live with the edges; propagate via groupby(node) min
    edges = pd.concat([
        pairs.rename(columns={"id_a": "node", "id_b": "peer"}),
        pairs.rename(columns={"id_b": "node", "id_a": "peer"}),
    ], ignore_index=True)
    edges_ds = rd.from_pandas(edges)
    labels = rd.from_pandas(
        pd.DataFrame({"node": pd.unique(edges["node"]),
                      "label": pd.unique(edges["node"])})
    )
    for _ in range(max_rounds):
        lbl = labels.to_pandas()
        lookup = dict(zip(lbl.node, lbl.label))

        def relabel(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy()
            batch["peer_label"] = batch.peer.map(lookup)
            batch["own_label"] = batch.node.map(lookup)
            batch["cand"] = batch[["peer_label", "own_label"]].min(axis=1)
            batch["__p"] = (
                pd.util.hash_pandas_object(batch.node, index=False) % num_partitions
            ).astype("int64")
            return batch[["node", "cand", "__p"]]

        def take_min(group: pd.DataFrame) -> pd.DataFrame:
            out = group.groupby("node", as_index=False)["cand"].min()
            return out.rename(columns={"cand": "label"})

        new_labels = (
            edges_ds.map_batches(relabel, batch_format="pandas")
            .groupby("__p")
            .map_groups(take_min, batch_format="pandas")
        )
        new_lbl = new_labels.to_pandas()
        merged = lbl.merge(new_lbl, on="node", suffixes=("_old", ""))
        if (merged.label == merged.label_old).all():
            break
        labels = rd.from_pandas(new_lbl)
    out = labels.to_pandas().rename(columns={"node": "id", "label": "group_id"})
    return rd.from_pandas(out.sort_values("id").reset_index(drop=True))


# ------------------------------------------------- embedding cosine dedup


def embedding_neardup_pairs(ds, *, vec_col: str = "embedding", id_col: str = "vec_id",
                            threshold: float = 0.95):
    """Near-duplicate pairs by embedding cosine ≥ threshold.

    Blockwise: the (normalized) corpus matrix is broadcast once via
    ray.put; each batch computes one matmul block of the similarity
    matrix and emits only pairs over threshold with id_a < id_b. At
    scale, replace the broadcast with LSH bucketing (random hyperplane
    signs) — same emit contract.
    """
    import ray

    mat_pdf = ds.to_pandas()
    ids = mat_pdf[id_col].to_numpy()
    m = np.stack(mat_pdf[vec_col].to_numpy()).astype(np.float64)
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, m))

    def block(batch: pd.DataFrame) -> pd.DataFrame:
        all_ids, mat = ray.get(ref)
        q = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
        q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        sims = q @ mat.T
        bi = batch[id_col].to_numpy()
        rows, cols = np.nonzero(sims >= threshold)
        ia, ib = bi[rows], all_ids[cols]
        keep = ia < ib  # upper triangle only; also drops self-pairs
        return pd.DataFrame({"id_a": ia[keep], "id_b": ib[keep],
                             "cosine": sims[rows, cols][keep]})

    return ds.map_batches(block, batch_format="pandas")
