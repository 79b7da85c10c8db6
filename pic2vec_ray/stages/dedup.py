"""Deduplication suite (exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine) — the large-scale training-data operators the
reference lacks (its only dedup is a per-batch memo,
``/root/reference/pic2vec/feature_preprocessing.py:449-455``; SURVEY.md
§2.7 maps the global variants to hash-partition shuffles).

Scale design notes (all paths are driver-collect-free — nothing in this
module materializes the corpus, the signature table, or the label table
on one node):

- exact dedup is TWO-phase: a per-batch partial (drop within-batch
  duplicates, keep min id) shrinks the shuffle, then one hash groupby
  finishes — the salted pre-aggregate pattern, correct because
  "first = min(id)" is associative-commutative;
- hash groups are verified against the actual content inside the
  group, so a 64-bit hash collision can never merge distinct texts;
- MinHash signatures/band rows are computed vectorized per batch
  (ONE ``hash_pandas_object`` pass per batch, ``minimum.reduceat`` per
  doc) and shuffled only as narrow (band, band_hash, doc_id) rows;
  candidate prefilter and exact-Jaccard verification run by
  hash-JOINING the pair rows back to the signature / document tables
  (``temporal.join.hash_join``) — candidates, not the corpus, bound
  the driver-visible state;
- SimHash is computed for the whole batch in one unpackbits+reduceat
  pass; hamming verification popcounts with a vectorized XOR;
- embedding near-dup defaults to random-hyperplane LSH bucketing with
  exact in-bucket cosine (identical emit contract to the quadratic
  broadcast path, which remains available as ``mode="exact"`` for tiny
  corpora);
- connected components is distributed min-label propagation with
  label-of-label (pointer-doubling) shortcuts: labels stay a Dataset,
  every round is joins + one groupby-min, convergence is checked with
  a scalar count — O(log diameter) rounds, no per-round driver collect.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd

_MERSENNE = (1 << 61) - 1
_LOG = logging.getLogger(__name__)


def _enumerate_bucket_pairs(ids: np.ndarray, *, edges: str,
                            max_pairs: int | None):
    """Candidate pairs for one LSH bucket of sorted unique ``ids``.

    ``edges="star"``: ``(ids[0], other)`` only — m−1 edges, exactly the
    connectivity the connected-components consumer needs; a bucket of
    10⁶ near-identical docs emits 10⁶−1 edges instead of ~5·10¹¹ pairs.

    ``edges="all"``: the full upper triangle, CAPPED at ``max_pairs``
    per bucket via a deterministic index-distance schedule (all pairs
    at distance 1, then 2, …) — the distance-1 ring is always included
    so within-bucket connectivity survives truncation, and the schedule
    depends only on the sorted id order, never on partitioning.

    Returns ``(id_a, id_b, n_dropped)``.
    """
    m = len(ids)
    if edges == "star":
        return np.repeat(ids[0], m - 1), ids[1:], 0
    if edges != "all":
        raise ValueError("edges must be 'all' or 'star'")
    total = m * (m - 1) // 2
    if max_pairs is None or total <= max_pairs:
        ia, ib = np.triu_indices(m, k=1)
        return ids[ia], ids[ib], 0
    take_a, take_b, n = [], [], 0
    for j in range(1, m):
        cnt = min(m - j, max_pairs - n)
        idx = np.arange(cnt)
        take_a.append(idx)
        take_b.append(idx + j)
        n += cnt
        if n >= max_pairs:
            break
    ia = np.concatenate(take_a)
    ib = np.concatenate(take_b)
    return ids[ia], ids[ib], total - n


def _stable_text_hash(s: pd.Series) -> pd.Series:
    return pd.util.hash_pandas_object(s, index=False).astype("uint64")


def _empty_pairs_ds(extra: dict[str, str] | None = None):
    import ray.data as rd

    cols = {"id_a": pd.Series([], dtype="int64"),
            "id_b": pd.Series([], dtype="int64")}
    for name, dtype in (extra or {}).items():
        cols[name] = pd.Series([], dtype=dtype)
    return rd.from_pandas(pd.DataFrame(cols))


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


def dedup_with_quota(ds, *, col: str = "text", id_col: str = "doc_id",
                     group_col: str = "source", quota: int = 100,
                     num_partitions: int = 64):
    """Exact dedup with a per-group KEEP QUOTA — the standard
    corpus-balancing knob: after the content-level winner rule
    (:func:`dedup_exact`, min-id survivor per distinct text), each
    ``group_col`` value (domain / source / language) keeps at most
    ``quota`` survivors, selected by the deterministic id order. One
    over-represented crawl domain then contributes a bounded share of
    the training mix instead of drowning it (the dedup-side sibling of
    ``split.temperature_mixture``'s rate math).

    Scale shape: dedup's two-phase fingerprint exchange, then ONE
    top-n-per-group shuffle keyed by ``group_col``
    (``temporal.windows.top_n_per_group``: per-partition vectorized
    head-of-sorted-group, only survivor rows move). The SQL oracle
    replays the cut as ``ROW_NUMBER() OVER (PARTITION BY group ORDER
    BY id) <= quota`` on the deduped survivor set.

    Output: the surviving rows (all input columns), plus nothing —
    ordering is not part of the contract.
    """
    from ..temporal.windows import top_n_per_group

    if quota < 1:
        raise ValueError(f"quota must be >= 1, got {quota}")
    kept = dedup_exact(ds, col=col, id_col=id_col,
                       num_partitions=num_partitions)
    return top_n_per_group(kept, by=group_col, order_cols=[id_col],
                           ascending=[True], n=quota,
                           num_partitions=num_partitions)


def exact_dup_edges(ds, *, col: str = "text", id_col: str = "doc_id",
                    num_partitions: int = 64):
    """Exact-duplicate STAR edges ``(id_a=group min, id_b=other)`` per
    distinct fingerprint — the edge-producing complement of
    :func:`dedup_exact`, for feeding connected components together
    with edges from OTHER modalities (see query
    ``multimodal_dedup_groups``).

    Identity is the SQL-replayable 64-bit content fingerprint
    (``stages/text.fingerprint64``: Horner over normalized codepoints;
    collision probability ~2⁻⁶⁴ per pair).  Scale shape: per-batch
    fingerprinting, one hash-partition exchange on the fingerprint,
    vectorized per-partition min-anchor edge emit — m−1 edges per
    duplicate group, never m(m−1)/2."""
    from ..temporal.core import partitioned_apply
    from .text import fingerprint64

    def fp(batch: pd.DataFrame) -> pd.DataFrame:
        out = fingerprint64(batch[[id_col, col]].rename(columns={col: "text"}))
        return out[[id_col, "fingerprint"]]

    fps = ds.map_batches(fp, batch_format="pandas")

    def edges(df: pd.DataFrame) -> pd.DataFrame:
        mn = df.groupby("fingerprint")[id_col].transform("min")
        dup = df[df[id_col] != mn]
        return pd.DataFrame({"id_a": mn[df[id_col] != mn].to_numpy(),
                             "id_b": dup[id_col].to_numpy()})

    return partitioned_apply(fps, "fingerprint", edges,
                             num_partitions=num_partitions)


_GRAM_PRIME = np.uint64(1099511628211)  # FNV prime; same kernel family as
# fingerprint64, composed over token hashes (SQL replays with list_reduce)


def dup_ngram_spans(ds, *, col: str = "text", id_col: str = "doc_id",
                    n: int = 8, num_partitions: int = 64):
    """EXHAUSTIVE cross-document duplicated-span detection — the exact
    complement of the sampled winnowing pass (`substring_dup_pairs`):
    every word n-gram occurring in ≥ 2 distinct documents marks its
    start position, and maximal runs of marked positions merge into
    spans ``(doc_id, span_start, span_end, n_grams)`` in token
    coordinates.  This is the gram-granular form of exact substring
    dedup for training corpora (find-everything, not find-probably).

    Scale shape (two bounded exchanges, no joins):
    1. per-batch VECTORIZED gram hashing — tokens split on single
       spaces (the chunking convention), each DISTINCT token Horner-
       hashed once (vocabulary-bounded Python), gram hash = Horner
       composition over the n token hashes via n shifted-slice fused
       multiply-adds (uint64 wraparound IS mod 2⁶⁴);
    2. hash-partition by gram: all occurrences of a gram co-locate, so
       "≥ 2 distinct docs" is a partition-local groupby — duplicated
       positions come out, unique grams (the overwhelming majority)
       die here and never shuffle again;
    3. hash-partition by doc: gaps-and-islands merge of consecutive
       duplicated starts, vectorized across all docs in the partition.
    """
    from ..temporal.core import partitioned_apply
    from .encode import _horner64

    N = int(n)
    if N < 2:
        raise ValueError(f"n must be >= 2, got {N}")

    def grams(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[col].str.split(" ")
        lens = toks.str.len().to_numpy(np.int64)
        ex = toks.explode()
        vals = ex.to_numpy()
        lut = {t: _horner64(t) for t in pd.unique(vals)}
        th = pd.Series(vals).map(lut).to_numpy(np.uint64)
        total = th.shape[0]
        if total < N:
            return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                 "pos": pd.Series([], dtype=np.int64),
                                 "gram": pd.Series([], dtype=np.uint64)})
        L = total - N + 1
        g = np.zeros(L, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for k in range(N):
                g = g * _GRAM_PRIME + th[k:k + L]
        doc_idx = np.repeat(np.arange(len(lens)), lens)
        valid = doc_idx[:L] == doc_idx[N - 1:]
        starts = np.repeat(np.cumsum(lens) - lens, lens)
        pos_local = np.arange(total, dtype=np.int64) - starts
        ids = batch[id_col].to_numpy()
        return pd.DataFrame({id_col: ids[doc_idx[:L][valid]],
                             "pos": pos_local[:L][valid],
                             "gram": g[valid]})

    gram_rows = ds.map_batches(grams, batch_format="pandas")

    def dup_positions(df: pd.DataFrame) -> pd.DataFrame:
        ndocs = df.groupby("gram")[id_col].transform("nunique")
        return df.loc[ndocs >= 2, [id_col, "pos"]]

    dup = partitioned_apply(gram_rows, "gram", dup_positions,
                            num_partitions=num_partitions)

    def islands(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([id_col, "pos"])
        ids = df[id_col].to_numpy()
        pos = df["pos"].to_numpy()
        new = np.ones(len(df), dtype=bool)
        if len(df) > 1:
            new[1:] = (ids[1:] != ids[:-1]) | (pos[1:] != pos[:-1] + 1)
        grp = np.cumsum(new) - 1
        agg = (pd.DataFrame({id_col: ids, "pos": pos, "g": grp})
               .groupby("g", as_index=False)
               .agg(**{id_col: (id_col, "first"),
                       "span_start": ("pos", "min"),
                       "span_end": ("pos", "max"),
                       "n_grams": ("pos", "size")}))
        agg["span_end"] = agg.span_end + N - 1
        return agg.drop(columns=["g"]) if "g" in agg.columns else agg

    return partitioned_apply(dup, id_col, islands,
                             num_partitions=num_partitions)


# --------------------------------------------------------------- shingles


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Character k-shingle 64-bit hashes (vector per doc).

    Hash = splitmix64(Horner polynomial over the shingle's codepoints,
    mod 2^64) — the same SQL-pinned kernel as ``text.fingerprint64`` /
    ``sketch._token_hash64``, so the minhash/simhash pipelines built on
    these hashes are reproducible bit-for-bit by a DuckDB oracle
    (queries ``minhash_neardup_docs`` / ``simhash_neardup_docs``).
    A doc shorter than ``k`` contributes ONE hash of the whole text
    (empty text → splitmix64(0)).
    """
    h, _ = _shingle_hashes_batch([text], k)
    return h


def _shingle_hashes_batch(texts: list[str], k: int) -> tuple[np.ndarray, np.ndarray]:
    """All shingle hashes of a BATCH in one vectorized pass.

    Returns ``(hashes, offsets)`` with doc ``i``'s shingles at
    ``hashes[offsets[i]:offsets[i+1]]`` — elementwise identical to
    per-doc :func:`_shingle_hashes` (the hash is value-based).

    One utf-32 decode of the concatenated batch, then k shifted
    multiply-adds build every sliding-window Horner value at once
    (uint64 wraparound IS the mod 2^64); windows that straddle doc
    boundaries exist in the global accumulator but are never selected.
    """
    from .sketch import _splitmix64
    from .text import _FP_PRIME

    n = len(texts)
    lens = np.fromiter((len(t) for t in texts), count=n, dtype=np.int64)
    counts = np.maximum(lens - k + 1, 1)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    out = np.zeros(int(offsets[-1]), dtype=np.uint64)
    if n == 0:
        return out, offsets
    cat = "".join(texts)
    cps = np.frombuffer(cat.encode("utf-32-le"), dtype="<u4").astype(np.uint64)
    text_starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=text_starts[1:])
    with np.errstate(over="ignore"):
        pows = np.empty(k, dtype=np.uint64)
        pows[k - 1] = 1
        for j in range(k - 2, -1, -1):
            pows[j] = pows[j + 1] * _FP_PRIME
        nwin = len(cps) - k + 1
        acc = np.zeros(max(nwin, 0), dtype=np.uint64)
        for j in range(k):
            acc += cps[j : j + nwin] * pows[j]
        for i in range(n):
            if lens[i] >= k:
                s = text_starts[i]
                out[offsets[i] : offsets[i + 1]] = acc[s : s + lens[i] - k + 1]
            elif lens[i] > 0:  # whole-text Horner for short docs
                h = np.uint64(0)
                for c in cps[text_starts[i] : text_starts[i] + lens[i]]:
                    h = h * _FP_PRIME + c
                out[offsets[i]] = h
    return _splitmix64(out), offsets


def _doc_chunks(offsets: np.ndarray, max_items: int = 1 << 16):
    """Split a batch's doc range so each chunk holds ≤ max_items shingles
    (bounds the (shingles × perms) intermediate to a few tens of MB)."""
    n = len(offsets) - 1
    lo = 0
    while lo < n:
        hi = lo + 1
        while hi < n and offsets[hi + 1] - offsets[lo] <= max_items:
            hi += 1
        yield lo, hi
        lo = hi


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


def minhash_signatures_batch(texts: list[str], a: np.ndarray, b: np.ndarray,
                             k: int = 5) -> np.ndarray:
    """(N, num_perm) signature matrix for a whole batch — one hash pass +
    one ``minimum.reduceat`` per memory-bounded chunk; elementwise equal
    to :func:`minhash_signature` per doc."""
    sh, offsets = _shingle_hashes_batch(texts, k)
    out = np.empty((len(texts), len(a)), dtype=np.uint64)
    for lo, hi in _doc_chunks(offsets):
        seg = sh[offsets[lo] : offsets[hi]]
        prod = (np.outer(seg % _MERSENNE, a) + b) % _MERSENNE
        out[lo:hi] = np.minimum.reduceat(prod, offsets[lo:hi] - offsets[lo], axis=0)
    return out


def minhash_lsh_pairs(ds, *, col: str = "text", id_col: str = "doc_id",
                      num_perm: int = 64, bands: int = 16, shingle_k: int = 5,
                      threshold: float = 0.5, num_partitions: int = 64,
                      edges: str = "all",
                      max_bucket_pairs: int | None = 1_000_000):
    """MinHash+LSH near-duplicate pairs with verified true Jaccard.

    Stages: shingle→minhash signatures per batch (vectorized) → band
    rows → groupby band bucket → candidate pairs → **signature-agreement
    prefilter** (estimated Jaccard = fraction of matching minhash
    components; LSH buckets over repetitive corpora explode into 100k+
    candidates, and exact set-based verification of each was the
    measured bottleneck — the prefilter kills ~99% of false candidates)
    → exact Jaccard only on survivors.

    The prefilter and the verifier both run by hash-JOINING the narrow
    pair rows back to the signature / document tables on ``id_a`` /
    ``id_b`` — no corpus-sized broadcast or driver materialization
    anywhere; the candidate count, not the corpus size, bounds every
    intermediate. Returns (id_a, id_b, jaccard), id_a < id_b.

    Hot-bucket safety (the 100-TB hazard: a boilerplate cluster of 10⁶
    near-identical docs lands every member in one bucket):
    ``edges="star"`` emits only ``(bucket_min_id, other)`` — m−1 edges,
    sufficient connectivity for ``neardup_groups`` (note a star edge
    failing Jaccard verification can, in adversarial buckets, sever a
    B–C link full enumeration would keep — the standard LSH-dedup
    trade); ``edges="all"`` (default) caps each bucket's enumeration at
    ``max_bucket_pairs`` via a deterministic index-distance schedule
    that always keeps the distance-1 ring, and LOGS the dropped count —
    no silent truncation.
    """
    from ..temporal.join import hash_join

    if num_perm % bands:
        raise ValueError("bands must divide num_perm")
    rows_per_band = num_perm // bands
    a, b = _minhash_params(num_perm)
    # prefilter margin: E[est] = true J; with 64 perms, σ ≈ 0.06 — a
    # 3σ-ish margin keeps recall while dropping the candidate flood.
    est_cutoff = max(0.0, threshold - 0.2)

    def to_sigs(batch: pd.DataFrame) -> pd.DataFrame:
        sigs = minhash_signatures_batch(list(batch[col]), a, b, shingle_k)
        # signatures travel as plain bytes: a binary column shuffles/joins
        # cleanly (tensor-extension columns break on null-alignment).
        # text rides along so prefilter AND verify are served by the
        # same two joins (one derived corpus copy in the object store —
        # spillable — instead of four corpus shuffles).
        return pd.DataFrame({id_col: batch[id_col].to_numpy(),
                             "sig": [s.tobytes() for s in sigs],
                             "__text": batch[col].to_numpy()})

    sig_ds = ds.map_batches(to_sigs, batch_format="pandas", batch_size=256).materialize()

    def to_bands(batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack([np.frombuffer(s, dtype=np.uint64) for s in batch["sig"]])
        n = len(batch)
        # narrow rows only — text/sig do not ride through the band shuffle
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
        dropped = 0
        for (_, _), g in group.groupby(["band", "band_hash"], sort=False):
            ids = np.sort(g[id_col].unique())
            if len(ids) > 1:
                pa_, pb_, d = _enumerate_bucket_pairs(
                    ids, edges=edges, max_pairs=max_bucket_pairs)
                dropped += d
                pairs.append(pd.DataFrame({"id_a": pa_, "id_b": pb_}))
        if dropped:
            _LOG.warning(
                "minhash bucket pair enumeration truncated: %d candidate "
                "pairs dropped (max_bucket_pairs=%s); distance-1 ring kept "
                "so bucket connectivity is preserved", dropped,
                max_bucket_pairs)
        if not pairs:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        return pd.concat(pairs, ignore_index=True).drop_duplicates()

    cand = (
        sig_ds.map_batches(to_bands, batch_format="pandas")
        .groupby("__part")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    cand = dedup_pairs(cand, num_partitions).materialize()
    if cand.count() == 0:
        return _empty_pairs_ds({"jaccard": "float64"})

    # prefilter + verify in ONE pass: join the candidate pairs back to
    # the (sig, text) table on each side — two pair-bounded shuffles
    # total, no corpus broadcast. The intermediate join is materialized
    # so the second join's schema resolution cannot re-execute it.
    def _side(side: str):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            return batch.rename(columns={id_col: f"id_{side}", "sig": f"sig_{side}",
                                         "__text": f"text_{side}"})

        return fn

    with_a = hash_join(cand, sig_ds.map_batches(_side("a"), batch_format="pandas"),
                       on="id_a", num_partitions=num_partitions).materialize()
    with_ab = hash_join(with_a, sig_ds.map_batches(_side("b"), batch_format="pandas"),
                        on="id_b", num_partitions=num_partitions)

    def prefilter_verify(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                              "id_b": pd.Series([], dtype="int64"),
                              "jaccard": pd.Series([], dtype="float64")})
        if batch.empty:
            return empty
        sa = np.stack([np.frombuffer(s, dtype=np.uint64) for s in batch["sig_a"]])
        sb = np.stack([np.frombuffer(s, dtype=np.uint64) for s in batch["sig_b"]])
        est = (sa == sb).mean(axis=1)
        batch = batch[est >= est_cutoff]
        if batch.empty:
            return empty
        jac = np.array([jaccard(x, y, shingle_k)
                        for x, y in zip(batch.text_a, batch.text_b)])
        out = batch[["id_a", "id_b"]][jac >= threshold].copy()
        out["jaccard"] = jac[jac >= threshold]
        return out

    return with_ab.map_batches(prefilter_verify, batch_format="pandas")


def ngram_jaccard_pairs(ds, *, col: str = "text", id_col: str = "doc_id",
                        threshold: float = 0.5, shingle_k: int = 5,
                        num_blocks: int = 8, num_partitions: int = 64):
    """EXACT all-pairs n-gram (character k-shingle) Jaccard ≥ threshold.

    Distributed block theta-join: every doc hashes to one of
    ``num_blocks`` blocks and is replicated to each block-PAIR group
    containing its block; each of the B(B+1)/2 groups computes the
    cross product of its two blocks locally (shingle sets built once
    per doc, a sound size-ratio prefilter skips pairs whose set sizes
    already bound Jaccard below threshold). One shuffle of B×corpus
    rows; compute is inherently O(N²) — this operator exists for
    exactness (and as the oracle-checkable member of the Jaccard
    family); MinHash-LSH is the sub-quadratic scale path. ``num_blocks``
    should scale ~√(cluster cores) so groups stay balanced.
    Returns (id_a, id_b, jaccard), id_a < id_b.
    """

    def scatter(batch: pd.DataFrame) -> pd.DataFrame:
        blk = (
            pd.util.hash_pandas_object(batch[id_col], index=False) % num_blocks
        ).astype("int64")
        frames = []
        for other in range(num_blocks):
            i = np.minimum(blk, other)
            j = np.maximum(blk, other)
            frames.append(pd.DataFrame({
                "grp": i * num_blocks + j,
                "blk": blk.to_numpy(),
                id_col: batch[id_col].to_numpy(),
                col: batch[col].to_numpy(),
            }))
        out = pd.concat(frames, ignore_index=True).drop_duplicates(
            subset=["grp", id_col])
        out["__part"] = (out.grp % num_partitions).astype("int64")
        return out

    def cross(group: pd.DataFrame) -> pd.DataFrame:
        res = []
        for grp, g in group.groupby("grp", sort=False):
            i, j = int(grp) // num_blocks, int(grp) % num_blocks
            g = g.drop_duplicates(subset=[id_col])
            sets = {int(r): {t[x : x + shingle_k]
                             for x in range(max(len(t) - shingle_k + 1, 1))}
                    for r, t in zip(g[id_col], g[col])}
            sizes = {d: len(s) for d, s in sets.items()}
            left = sorted(int(d) for d in g[g.blk == i][id_col])
            right = sorted(int(d) for d in g[g.blk == j][id_col])
            pairs = (
                [(a, b) for ai, a in enumerate(left) for b in left[ai + 1:]]
                if i == j else
                [(min(a, b), max(a, b)) for a in left for b in right]
            )
            for a_id, b_id in pairs:
                la, lb = sizes[a_id], sizes[b_id]
                if min(la, lb) < threshold * max(la, lb):
                    continue  # J <= min/max < threshold — sound skip
                inter = len(sets[a_id] & sets[b_id])
                jac = inter / (la + lb - inter)
                if jac >= threshold:
                    res.append((a_id, b_id, jac))
        if not res:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "jaccard": pd.Series([], dtype="float64")})
        out = pd.DataFrame(res, columns=["id_a", "id_b", "jaccard"])
        return out

    return (
        ds.map_batches(scatter, batch_format="pandas")
        .groupby("__part")
        .map_groups(cross, batch_format="pandas")
    )


# ---------------------------------------------------------------- simhash


def simhash64(text: str, k: int = 4) -> int:
    """64-bit SimHash over character k-shingles (scalar reference)."""
    sh = _shingle_hashes(text, k)
    bits = ((sh[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
    v = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for i in np.flatnonzero(v > 0):
        out |= np.uint64(1) << np.uint64(i)
    return int(out.astype(np.int64))


def simhash64_batch(texts: list[str], k: int = 4) -> np.ndarray:
    """SimHash for a whole batch: one shingle-hash pass, one
    unpackbits + ``add.reduceat`` per chunk, one packbits — elementwise
    equal to :func:`simhash64`. Returns int64 (two's-complement view)."""
    sh, offsets = _shingle_hashes_batch(texts, k)
    counts = np.diff(offsets)
    votes = np.empty((len(texts), 64), dtype=np.int64)
    for lo, hi in _doc_chunks(offsets, max_items=1 << 18):
        seg = sh[offsets[lo] : offsets[hi]]
        # little-endian uint64 → 64 bits, LSB first: bit j == (x >> j) & 1
        bits = np.unpackbits(seg.view(np.uint8).reshape(-1, 8),
                             axis=1, bitorder="little")
        votes[lo:hi] = np.add.reduceat(bits, offsets[lo:hi] - offsets[lo], axis=0)
    pos = (2 * votes - counts[:, None]) > 0
    packed = np.packbits(pos.astype(np.uint8), axis=1, bitorder="little")
    return packed.view(np.uint64).ravel().view(np.int64).copy()


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount for uint64 arrays."""
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)


def simhash_pairs(ds, *, col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3, shingle_k: int = 4, num_partitions: int = 64):
    """SimHash near-dup pairs: band the 64-bit hash into 4×16-bit chunks
    (pigeonhole: hamming ≤ 3 ⇒ at least one identical chunk), bucket by
    chunk, verify true hamming distance. Returns (id_a, id_b, hamming)."""

    def to_chunks(batch: pd.DataFrame) -> pd.DataFrame:
        hs = simhash64_batch(list(batch[col]), shingle_k)
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
            ham = _popcount64(np.bitwise_xor(hv[ia], hv[ib]))
            keep = ham <= max_hamming
            if keep.any():
                res.append(pd.DataFrame({"id_a": ids[ia[keep]], "id_b": ids[ib[keep]],
                                         "hamming": ham[keep].astype("int64")}))
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


def neardup_groups(pairs_ds, *, num_partitions: int = 64, max_rounds: int = 30):
    """Connected components over near-duplicate pairs → (id, group_id).

    Distributed hash-min label propagation with pointer-doubling
    shortcuts: labels stay a Dataset end to end (never collected to the
    driver). Each round is ONE chained streaming execution of three
    hash shuffles:

    1. key=node — co-locate every node's label with its edges; emit the
       label to each neighbor, to the node itself (carrying the old
       label), and a *request* to the label's own group (the
       pointer-doubling message: "what is my label's label?");
    2. key=dest — per node, provisional label = min(received); answer
       the requests that landed here with it;
    3. key=node — final label = min(provisional, answers); flag
       ``changed``.

    The request/answer pass makes convergence O(log diameter), so long
    chains cannot exhaust ``max_rounds``; if rounds run out anyway this
    RAISES instead of silently returning half-propagated groups (the
    "keep id == group_id" rule downstream depends on correct labels).
    Convergence is checked with a scalar count per round. ``group_id``
    is the minimum member id.
    """
    import pyarrow as pa

    from ..temporal.core import partitioned_apply

    def to_edges(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids_a, ids_b = t["id_a"], t["id_b"]
        return pa.table({
            "node": pa.concat_arrays([pc.cast(c, pa.int64()).combine_chunks()
                                      for c in (ids_a, ids_b)]),
            "peer": pa.concat_arrays([pc.cast(c, pa.int64()).combine_chunks()
                                      for c in (ids_b, ids_a)]),
        })

    edges = pairs_ds.select_columns(["id_a", "id_b"]).map_batches(
        to_edges, batch_format="pyarrow"
    ).materialize()
    n_edge_rows = edges.count()
    if n_edge_rows == 0:
        import ray.data as rd

        return rd.from_pandas(pd.DataFrame({"id": pd.Series([], dtype="int64"),
                                            "group_id": pd.Series([], dtype="int64")}))

    # size the loop's exchanges from the ACTUAL edge count, not the
    # caller's corpus-sized hint: dup edges are a tiny fraction of the
    # corpus, and every label-propagation round pays 3 shuffles whose
    # fixed cost scales with partition count and input block count —
    # 38 edges over 64 partitions × fragmented union blocks measured
    # 134 s at sf0.1 vs ~3 s right-sized.  num_partitions stays the
    # UPPER bound, so giant edge sets still spread.
    num_partitions = max(1, min(num_partitions,
                                -(-n_edge_rows // 65_536)))
    if edges.num_blocks() > 4 * num_partitions:
        edges = edges.repartition(num_partitions).materialize()

    # initial labels: every node labels itself (distinct nodes via the
    # same two-phase dedup shuffle as dedup_exact)
    labels = dedup_exact(edges, col="node", id_col="node",
                         num_partitions=num_partitions).map_batches(
        lambda df: df.drop_duplicates(subset=["node"])[["node"]].assign(
            label=lambda d: d.node),
        batch_format="pandas",
    ).materialize()

    _K_LAB, _K_EDGE, _K_MSG, _K_ID, _K_REQ, _K_PROV, _K_ANS = range(7)

    def scatter(group: pd.DataFrame) -> pd.DataFrame:
        lab = group[group.kind == _K_LAB]
        edge = group[group.kind == _K_EDGE]
        to_peers = edge.merge(lab[["key", "a"]].rename(columns={"a": "label"}),
                              on="key")  # (key=node, a=peer, label)
        out = [
            pd.DataFrame({"key": to_peers.a, "kind": _K_MSG, "a": to_peers.label,
                          "b": -1}),
            pd.DataFrame({"key": lab.key, "kind": _K_ID, "a": lab.a, "b": lab.a}),
        ]
        req = lab[lab.a != lab.key]
        if len(req):
            out.append(pd.DataFrame({"key": req.a, "kind": _K_REQ, "a": req.key,
                                     "b": -1}))
        return pd.concat(out, ignore_index=True)

    def gather(group: pd.DataFrame) -> pd.DataFrame:
        recv = group[group.kind.isin((_K_MSG, _K_ID))]
        prov = recv.groupby("key", as_index=False)["a"].min().rename(
            columns={"a": "prov"})
        ids = group[group.kind == _K_ID][["key", "b"]].rename(columns={"b": "old"})
        prov = prov.merge(ids, on="key")
        out = [pd.DataFrame({"key": prov.key, "kind": _K_PROV, "a": prov.prov,
                             "b": prov.old})]
        req = group[group.kind == _K_REQ]
        if len(req):
            ans = req.merge(prov[["key", "prov"]], on="key")
            out.append(pd.DataFrame({"key": ans.a, "kind": _K_ANS, "a": ans.prov,
                                     "b": -1}))
        return pd.concat(out, ignore_index=True)

    def resolve(group: pd.DataFrame) -> pd.DataFrame:
        new = group.groupby("key", as_index=False)["a"].min().rename(
            columns={"a": "label"})
        old = group[group.kind == _K_PROV][["key", "b"]].rename(columns={"b": "old"})
        new = new.merge(old, on="key")
        return pd.DataFrame({"node": new.key, "label": new.label,
                             "changed": new.label != new.old})

    lab_rows = None
    edge_rows = edges.map_batches(
        lambda df: pd.DataFrame({"key": df.node, "kind": _K_EDGE, "a": df.peer,
                                 "b": -1}),
        batch_format="pandas",
    ).materialize()

    for _round in range(max_rounds):
        lab_rows = labels.map_batches(
            lambda df: pd.DataFrame({"key": df.node, "kind": _K_LAB, "a": df.label,
                                     "b": -1}),
            batch_format="pandas",
        )
        stage = partitioned_apply(lab_rows.union(edge_rows), "key", scatter,
                                  num_partitions=num_partitions)
        stage = partitioned_apply(stage, "key", gather, num_partitions=num_partitions)
        new_labels = partitioned_apply(stage, "key", resolve,
                                       num_partitions=num_partitions).materialize()
        changed = new_labels.map_batches(
            lambda df: df[df.changed][["node"]], batch_format="pandas"
        ).count()
        labels = new_labels.map_batches(
            lambda df: df[["node", "label"]], batch_format="pandas"
        ).materialize()
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"neardup_groups did not converge in {max_rounds} rounds — "
            "pathological component structure; raise max_rounds"
        )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = df.rename(columns={"node": "id", "label": "group_id"})
        # empty shuffle partitions can upcast the label to float64 — restore
        out["id"] = out["id"].astype("int64")
        out["group_id"] = out["group_id"].astype("int64")
        return out

    return labels.map_batches(finish, batch_format="pandas")


# ------------------------------------------------- embedding cosine dedup


def embedding_neardup_pairs(ds, *, vec_col: str = "embedding", id_col: str = "vec_id",
                            threshold: float = 0.95, mode: str = "lsh",
                            bands: int = 16, band_bits: int = 8,
                            num_partitions: int = 64, seed: int = 5102020,
                            edges: str = "all",
                            max_bucket_pairs: int | None = 1_000_000):
    """Near-duplicate pairs by embedding cosine ≥ threshold.

    ``mode="lsh"`` (default, the scale path): random-hyperplane sign
    sketches — ``bands`` bands of ``band_bits`` projection signs each;
    two vectors land in the same bucket for a band iff all its signs
    agree, and exact cosine runs only on bucket-derived candidate
    pairs. A true pair is missed only if every band splits it: for
    cosine ≥ 0.95 the per-band hit rate is (1 − θ/π)^8 ≈ 0.43, so 16
    bands give recall ≈ 1 − 0.57^16 > 0.9998 (exact duplicates are
    always caught — identical vectors sign identically).

    Shuffle shape (the minhash shape, ``minhash_lsh_pairs``): the band
    exchange carries only narrow ``(band, bucket, id)`` rows — vector
    bytes do NOT ride it ``bands`` times. Buckets emit candidate id
    pairs; the pairs are deduped and hash-JOINED back to a materialized
    ``(id, vec)`` table on each side, then cosine is one vectorized
    rowwise dot per batch. Candidate count, not corpus size, bounds
    every post-bucket intermediate; the vector table crosses an
    exchange once per join (2×) instead of once per band (16×).

    ``mode="exact"``: the quadratic broadcast baseline — the normalized
    corpus matrix is shipped once via ray.put and each batch computes
    one matmul block. Only for corpora that fit one node; the oracle
    baseline for the LSH path's recall tests.
    """
    from ..temporal.join import hash_join

    if mode == "exact":
        return _embedding_neardup_exact(ds, vec_col, id_col, threshold)

    def to_norm(batch: pd.DataFrame) -> pd.DataFrame:
        q = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
        q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        return pd.DataFrame({id_col: batch[id_col].to_numpy(),
                             "vec": [v.tobytes() for v in q]})

    # one derived corpus copy in the object store (spillable), reused by
    # the band stage and both join-back sides
    vec_ds = ds.map_batches(to_norm, batch_format="pandas").materialize()
    # size every downstream exchange from the MATERIALIZED corpus count
    # (free after materialize) rather than the caller's corpus-scale
    # hint — 64-way exchanges on a 2k-row table are fixed overhead
    # (the multimodal_dedup_groups lesson)
    num_partitions = min(num_partitions,
                         max(8, vec_ds.count() // 50_000 + 1))

    def to_bands(batch: pd.DataFrame) -> pd.DataFrame:
        q = np.stack([np.frombuffer(v, dtype=np.float64) for v in batch["vec"]])
        # planes built once per worker process (cached by content key),
        # not once per batch — same pattern as the JPEG LUT cache
        planes = _lsh_planes(seed, q.shape[1], bands * band_bits)
        bits = (q @ planes >= 0).astype(np.uint8)  # (n, bands*band_bits)
        n = len(batch)
        ids = batch[id_col].to_numpy()
        band_ids = np.repeat(np.arange(bands), n)
        keys = np.empty(bands * n, dtype=np.int64)
        for bi in range(bands):
            seg = bits[:, bi * band_bits : (bi + 1) * band_bits]
            keys[bi * n : (bi + 1) * n] = np.packbits(
                seg, axis=1, bitorder="little")[:, 0].astype(np.int64)
        out = pd.DataFrame({"band": band_ids, "bucket": keys,
                            id_col: np.tile(ids, bands)})
        out["__part"] = (
            pd.util.hash_pandas_object(out[["band", "bucket"]], index=False)
            % num_partitions
        ).astype("int64")
        return out

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        # same hot-bucket discipline as minhash_lsh_pairs: star edges for
        # the connectivity consumer, capped + logged enumeration otherwise
        pairs = []
        dropped = 0
        for _, g in group.groupby(["band", "bucket"], sort=False):
            ids = np.sort(g[id_col].unique())
            if len(ids) > 1:
                pa_, pb_, d = _enumerate_bucket_pairs(
                    ids, edges=edges, max_pairs=max_bucket_pairs)
                dropped += d
                pairs.append(pd.DataFrame({"id_a": pa_, "id_b": pb_}))
        if dropped:
            _LOG.warning(
                "embedding-LSH bucket pair enumeration truncated: %d "
                "candidate pairs dropped (max_bucket_pairs=%s); distance-1 "
                "ring kept so bucket connectivity is preserved", dropped,
                max_bucket_pairs)
        if not pairs:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        return pd.concat(pairs, ignore_index=True).drop_duplicates()

    cand = (
        vec_ds.map_batches(to_bands, batch_format="pandas")
        .groupby("__part")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    cand = dedup_pairs(cand, num_partitions).materialize()
    if cand.count() == 0:
        return _empty_pairs_ds({"cosine": "float64"})

    def _side(side: str):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            return batch.rename(columns={id_col: f"id_{side}", "vec": f"vec_{side}"})

        return fn

    # materialize between the chained joins: a lazy first join would be
    # re-executed by the second join's schema resolution
    with_a = hash_join(cand, vec_ds.map_batches(_side("a"), batch_format="pandas"),
                       on="id_a", num_partitions=num_partitions).materialize()
    with_ab = hash_join(with_a, vec_ds.map_batches(_side("b"), batch_format="pandas"),
                        on="id_b", num_partitions=num_partitions)

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "cosine": pd.Series([], dtype="float64")})
        va = np.stack([np.frombuffer(v, dtype=np.float64) for v in batch["vec_a"]])
        vb = np.stack([np.frombuffer(v, dtype=np.float64) for v in batch["vec_b"]])
        cos = np.einsum("ij,ij->i", va, vb)
        out = batch.loc[cos >= threshold, ["id_a", "id_b"]].copy()
        out["cosine"] = cos[cos >= threshold]
        return out

    return with_ab.map_batches(verify, batch_format="pandas")


_PLANES_CACHE: dict[tuple, np.ndarray] = {}


def _lsh_planes(seed: int, dim: int, nbits: int) -> np.ndarray:
    """Deterministic random-hyperplane matrix, built once per worker
    process per (seed, dim, nbits) — hoisted out of the per-batch fn."""
    key = (seed, dim, nbits)
    hit = _PLANES_CACHE.get(key)
    if hit is None:
        hit = np.random.default_rng(seed).standard_normal((dim, nbits))
        if len(_PLANES_CACHE) < 16:
            _PLANES_CACHE[key] = hit
    return hit


def _embedding_neardup_exact(ds, vec_col: str, id_col: str, threshold: float):
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


# --------------------------------------------- sub-document (segment) dedup


def paragraph_dedup(ds, *, col: str = "text", id_col: str = "doc_id",
                    words_per_segment: int = 10):
    """Sub-document global exact dedup with document reconstruction —
    the C4/RefinedWeb "drop duplicated paragraphs from every page" step
    re-expressed Ray-Data-first.

    A *segment* is ``words_per_segment`` consecutive whitespace tokens
    (this corpus carries no newline paragraph marks, so the
    segmentation rule is a parameter, not a semantic commitment; a
    trailing short segment is kept as-is).  Keep rule: a segment
    instance survives iff its ``(doc_id, seg_idx)`` is the global
    minimum order key among all instances of that exact text; documents
    whose every segment is a duplicate drop out entirely.

    Shape (two shuffles, no join): vectorized explode (one ListArray
    re-chunk + ``binary_join`` per batch — no per-word Python) → ONE
    global ``groupby(seg).min(order_key)`` whose winners are decoded
    *arithmetically* from the min key (doc = key >> 20, idx = key &
    0xFFFFF), so no join-back ships the corpus a second time → ordered
    per-document reassembly.  Only ``(seg, order_key)`` rows cross the
    first exchange; group sizes in the second are bounded by document
    length.  (No reference counterpart — the reference has no text
    dedup at all; the within-batch image memo at
    ``/root/reference/pic2vec/feature_preprocessing.py:434`` is its
    closest idea.)
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    K = int(words_per_segment)
    IDX_BITS = 20

    def explode(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        words = pc.split_pattern(t[col].combine_chunks().cast(pa.string()), " ")
        off = words.offsets.to_numpy().astype(np.int64)
        counts = np.diff(off)
        nseg = -(-counts // K)  # ceil; split() yields >=1 word, so >=1 seg
        total = int(nseg.sum())
        seg_doc = np.repeat(np.arange(len(ids)), nseg)
        prefix = np.concatenate([[0], np.cumsum(nseg)[:-1]])
        seg_idx = np.arange(total) - prefix[seg_doc]
        if total and seg_idx.max() >= (1 << IDX_BITS):
            raise ValueError("document exceeds 2^20 segments")
        if len(ids) and ids.max() >= (1 << (63 - IDX_BITS)):
            raise ValueError(
                f"{id_col} exceeds 2^{63 - IDX_BITS}; packed (id<<"
                f"{IDX_BITS})|seg order key would overflow int64")
        if len(ids) and ids.min() < 0:
            raise ValueError(f"{id_col} must be non-negative for packing")
        starts = off[seg_doc] + seg_idx * K
        seg_lists = pa.ListArray.from_arrays(
            pa.array(np.append(starts, off[-1]), pa.int32()), words.values)
        seg_text = pc.binary_join(seg_lists, " ")
        okey = (ids[seg_doc] << IDX_BITS) | seg_idx
        return pa.table({"seg": seg_text, "okey": pa.array(okey, pa.int64())})

    from ..temporal.core import DEFAULT_PARTITIONS, partitioned_apply

    segs = ds.map_batches(explode, batch_format="pyarrow")

    # both merges go through the hash-partition + vectorized-local-
    # groupby path: Ray's sort-aggregate on the high-cardinality `seg`
    # key measured 13 s at sf0.1 where this shape runs in ~3 s
    def keep_min(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("seg", as_index=False)["okey"].min()
        fk = g["okey"].to_numpy()
        return pd.DataFrame({
            id_col: fk >> IDX_BITS,
            "seg_idx": fk & ((1 << IDX_BITS) - 1),
            "seg": g["seg"],
        })

    winners = partitioned_apply(segs, "seg", keep_min, DEFAULT_PARTITIONS)

    def rebuild(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([id_col, "seg_idx"], kind="mergesort")
        g = (df.groupby(id_col, sort=False)["seg"].agg(" ".join)
               .rename("clean_text").reset_index())
        return g

    return partitioned_apply(winners, id_col, rebuild, DEFAULT_PARTITIONS)


def dedup_incremental(new_ds, seen_ds, *, id_col: str = "doc_id",
                      num_partitions: int | None = None):
    """Incremental (cross-snapshot) exact dedup — the production shape
    for daily crawl updates: keep only NEW documents whose fingerprint
    appears neither in the already-ingested corpus nor earlier within
    the new batch itself.

    Shape: fingerprint both sides (``stages/text.fingerprint64``, the
    SQL-replayable Horner hash — shuffle-free), self-dedup the new
    batch with ONE ``groupby(fingerprint).min(id)`` (one row per
    distinct fingerprint crosses the exchange), then ANTI hash-join the
    winners against the seen side's ``(fingerprint)`` rows — the seen
    corpus streams through the join as narrow 8-byte keys, never
    text.  Output: ``(id_col, fingerprint)`` of the surviving new
    documents; persist it (or union it into the seen index) to advance
    the snapshot.
    """
    from ..temporal.join import hash_join
    from .text import fingerprint64

    def fp(ds, cols):
        return (ds.map_batches(fingerprint64, batch_format="pandas")
                  .map_batches(lambda df: df[cols], batch_format="pandas"))

    from ..temporal.core import DEFAULT_PARTITIONS, partitioned_apply

    new_fp = fp(new_ds, [id_col, "fingerprint"])
    seen_fp = fp(seen_ds, ["fingerprint"])

    # hash-partition + local min, not a Ray sort-aggregate — the
    # fingerprint key is per-document cardinality (see BASELINE.md's
    # high-cardinality-merge audit)
    def keep_min(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("fingerprint", as_index=False)[id_col].min()

    # materialize: a lazy shuffle output re-executes upstream when
    # the join resolves schemas (see round-2 notes)
    firsts = partitioned_apply(new_fp, "fingerprint", keep_min,
                               DEFAULT_PARTITIONS).materialize()
    kwargs = {"num_partitions": num_partitions} if num_partitions else {}
    return hash_join(firsts, seen_fp, on="fingerprint", how="anti", **kwargs)


# ---------------------------------------- duplicated-span detection
# (content-defined fingerprinting / winnowing — Schleimer et al.'s
# MOSS scheme: anchors selected by CONTENT (k-gram hash % sel_mod == 0)
# align across copies of a span regardless of byte offset, which fixed
# -stride sampling cannot do. The practical substitute for suffix-array
# substring dedup at corpus scale: one streaming pass, no global sort.)


def winnow_fingerprints_batch(texts: list[str], *, k: int = 8,
                              sel_mod: int = 16, window: int = 64):
    """Content-defined window fingerprints of a batch.

    Anchors = positions whose k-gram hash (the SQL-pinned
    splitmix64(Horner) shingle kernel) is ≡ 0 mod ``sel_mod`` and
    whose ``window``-char window stays inside the doc; fingerprint =
    the same kernel over the window text. Expected anchor density is
    ``1/sel_mod`` per char, so a duplicated span of length ≥ roughly
    ``window + sel_mod·k`` chars shares at least one fingerprint
    between its copies with high probability — and EVERY shared
    fingerprint is a true 64-bit window-hash match.

    Returns ``(doc_idx, pos, fp)`` numpy arrays (pos 0-based).
    """
    from .sketch import _splitmix64, _token_hash64

    hashes, offsets = _shingle_hashes_batch(texts, k)
    n = len(texts)
    lens = np.fromiter((len(t) for t in texts), count=n, dtype=np.int64)
    counts = np.diff(offsets)
    doc_of = np.repeat(np.arange(n, dtype=np.int64), counts)
    pos = np.arange(len(hashes), dtype=np.int64) - np.repeat(offsets[:-1], counts)
    valid = ((hashes % np.uint64(sel_mod) == 0)
             & (lens[doc_of] >= k)
             & (pos + window <= lens[doc_of]))
    a_doc, a_pos = doc_of[valid], pos[valid]
    wins = np.array([texts[d][p:p + window]
                     for d, p in zip(a_doc, a_pos)], dtype=object)
    with np.errstate(over="ignore"):
        fp = _splitmix64(_token_hash64(wins)) if len(wins) else \
            np.zeros(0, dtype=np.uint64)
    return a_doc, a_pos, fp.view(np.int64)


def substring_dup_pairs(ds, *, col: str = "text", id_col: str = "doc_id",
                        k: int = 8, sel_mod: int = 16, window: int = 64,
                        num_partitions: int = 64, edges: str = "all",
                        max_bucket_pairs: int | None = 1_000_000):
    """Cross-document duplicated-span candidate pairs: documents
    sharing ≥ 1 content-defined window fingerprint, with the count of
    DISTINCT shared fingerprints per pair (a proxy for total
    duplicated length: ≈ ``shared_spans × sel_mod`` chars).

    Plan: per-batch winnowing (vectorized shingle scan; anchors ~1/
    ``sel_mod`` of chars) → dedupe (doc, fp) → one fp-key
    hash-partition exchange (8-byte rows, never text) → per-bucket
    pair emission under the SAME hot-bucket discipline as MinHash
    (``_enumerate_bucket_pairs``: star edges or capped + logged) →
    pair-key merge counting shared fingerprints. Output: ``id_a <
    id_b``, ``shared_spans`` (int64). The SQL oracle replays anchors,
    window hashes and the pair join bit-for-bit.
    """
    from ..temporal.core import partitioned_apply

    def fps(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[col].tolist()
        doc_idx, _pos, fp = winnow_fingerprints_batch(
            texts, k=k, sel_mod=sel_mod, window=window)
        out = pd.DataFrame({
            id_col: batch[id_col].to_numpy()[doc_idx],
            "fp": fp,
        }).drop_duplicates()
        return out

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        pairs, dropped = [], 0
        for _, g in group.groupby("fp", sort=False):
            ids = np.sort(g[id_col].unique())
            if len(ids) > 1:
                pa_, pb_, d = _enumerate_bucket_pairs(
                    ids, edges=edges, max_pairs=max_bucket_pairs)
                dropped += d
                pairs.append(pd.DataFrame({"id_a": pa_, "id_b": pb_}))
        if dropped:
            _LOG.warning("winnow pair enumeration truncated: %d pairs "
                         "dropped (max_bucket_pairs=%s)", dropped,
                         max_bucket_pairs)
        if not pairs:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        return pd.concat(pairs, ignore_index=True)

    cand = partitioned_apply(
        ds.map_batches(fps, batch_format="pandas"), "fp", bucket_pairs,
        num_partitions=num_partitions)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["id_a", "id_b"], as_index=False).size() \
              .rename(columns={"size": "shared_spans"})
        g["shared_spans"] = g["shared_spans"].astype("int64")
        return g

    return partitioned_apply(cand, ["id_a", "id_b"], merge,
                             num_partitions=num_partitions)


def image_neardup_pairs(ds, *, bytes_col: str = "bytes",
                        id_col: str = "image_id", max_hamming: int = 3,
                        num_partitions: int = 64, edges: str = "all",
                        max_bucket_pairs: int | None = 1_000_000):
    """Near-duplicate IMAGE pairs by perceptual-hash banding — the
    image-axis counterpart of :func:`simhash_pairs`: decode each row
    (from-scratch codecs), compute the 64-bit average hash, band it
    4×16-bit (pigeonhole: lossless for hamming ≤ 3), one band-key
    exchange of 8-byte rows, in-bucket exact hamming verify, the same
    hot-bucket pair discipline as MinHash. Output: ``id_a < id_b``,
    ``hamming`` (int64).

    No driver oracle: the synthetic corpus's perceptual hashes collide
    structurally (uniform/flat images share hashes), so there is no
    closed-form expected pair set — correctness is pinned by pytest on
    planted noisy duplicates instead (``test_round4_ops.py``).
    """
    from ..functions.image_ops import average_hash
    from ..temporal.core import partitioned_apply
    from .decode import BatchDecoder

    if not 0 <= max_hamming <= 3:
        raise ValueError("banded pigeonhole is lossless only for "
                         f"max_hamming <= 3, got {max_hamming}")

    class HashBand:
        def __init__(self):
            self.decoder = BatchDecoder(target_size=None)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            images, _ = self.decoder.decode_column(batch[bytes_col].tolist())
            ids, hashes = [], []
            for image_id, img in zip(batch[id_col].tolist(), images):
                if img is None:
                    continue
                ids.append(image_id)
                hashes.append(average_hash(img))
            h = np.array(hashes, dtype=np.uint64) if hashes else \
                np.zeros(0, dtype=np.uint64)
            rows = {id_col: np.repeat(np.array(ids, dtype=object), 4),
                    "band": np.tile(np.arange(4, dtype=np.int64),
                                    len(ids)),
                    "bh": np.zeros(4 * len(ids), dtype=np.int64),
                    "sig": np.repeat(h.view(np.int64), 4)}
            for b in range(4):
                rows["bh"][b::4] = ((h >> np.uint64(16 * b))
                                    & np.uint64(0xFFFF)).astype(np.int64)
            return pd.DataFrame(rows)

    banded = ds.map_batches(HashBand, batch_format="pandas",
                            concurrency=(2, 8))

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        sig_of = dict(zip(group[id_col], group["sig"].astype(np.int64)))
        pairs, dropped = [], 0
        for _, g in group.groupby(["band", "bh"], sort=False):
            ids = np.sort(g[id_col].unique())
            if len(ids) > 1:
                pa_, pb_, d = _enumerate_bucket_pairs(
                    ids, edges=edges, max_pairs=max_bucket_pairs)
                dropped += d
                pairs.append(pd.DataFrame({"id_a": pa_, "id_b": pb_}))
        if dropped:
            _LOG.warning("image neardup pair enumeration truncated: %d "
                         "(max_bucket_pairs=%s)", dropped, max_bucket_pairs)
        if not pairs:
            return pd.DataFrame({"id_a": pd.Series([], dtype=object),
                                 "id_b": pd.Series([], dtype=object),
                                 "hamming": pd.Series([], dtype="int64")})
        cand = pd.concat(pairs, ignore_index=True).drop_duplicates()
        sa = cand["id_a"].map(sig_of).to_numpy(np.int64).view(np.uint64)
        sb = cand["id_b"].map(sig_of).to_numpy(np.int64).view(np.uint64)
        x = (sa ^ sb).view(np.uint8).reshape(len(cand), 8)
        cand["hamming"] = np.unpackbits(x, axis=1).sum(axis=1).astype("int64")
        return cand[cand["hamming"] <= max_hamming]

    cand = partitioned_apply(banded, "bh", bucket_pairs,
                             num_partitions=num_partitions)

    # a pair can surface from several bands: keep one row
    def dedupe(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["id_a", "id_b"])

    return partitioned_apply(cand, ["id_a", "id_b"], dedupe,
                             num_partitions=num_partitions)


def image_neardup_groups(ds, *, bytes_col: str = "bytes",
                         id_col: str = "img_key", max_hamming: int = 3,
                         num_partitions: int = 64,
                         max_bucket_pairs: int | None = 1_000_000,
                         edges: str = "star"):
    """Near-duplicate IMAGE groups: perceptual-hash connected components
    — the image-axis counterpart of ``minhash_dedup_groups`` (rounds
    out image dedup past :func:`image_neardup_pairs`'s pair surface).
    ``id_col`` must be int64 (``neardup_groups``' node ids).

    Exactness + scale both come from an EXACT-COLLAPSE first phase:
    identical 64-bit hashes are collapsed to their min-id
    representative with one hash-partitioned exchange of (hash, id)
    rows, emitting ``m − 1`` star edges per identical-hash cluster —
    hamming 0, no verify needed, LINEAR where the pair enumeration of
    a 2,667-member solid-image cluster (the sf0.1 corpus's real shape)
    would be ~3.5M pairs. Banding then runs over DISTINCT hashes only
    (pigeonhole 4×16 bit, lossless for hamming ≤ 3), in-bucket pairs
    are hamming-verified between representatives, and the components
    of (star ∪ verified-rep) edges equal the components of the full
    hamming ≤ ``max_hamming`` graph: members of an identical-hash
    cluster are interchangeable ⇒ edges through the representative
    preserve exactly the connectivity the full pair set has.

    Output: ``(id, group_id)`` for every image in a ≥2-member group,
    ``group_id`` = min member id (``neardup_groups``' label rule).
    Like ``image_neardup_pairs`` there is no SQL oracle — the phash
    depends on generator noise — so the query surface entry is
    rows-only and the semantics are pinned by the planted-cluster
    pytest (``tests/test_image_groups.py``).

    ``edges="star"`` (default) enumerates only (bucket-min-rep, other)
    candidates per band bucket — m−1 per bucket, the same
    GROUPS-consumer discipline as ``minhash_lsh_pairs(edges="star")``,
    with the same documented trade: a star edge failing the hamming
    verify can sever a B–C link full enumeration would keep. This
    matters on hot-bucket corpora: the synthetic sf0.1 images
    concentrate 11k distinct hashes into ~150 buckets per band (18.8M
    all-pairs candidates, measured); star enumeration is linear.
    ``edges="all"`` restores exhaustive in-bucket pairs under
    ``max_bucket_pairs``.
    """
    from ..temporal.core import partitioned_apply
    from ..functions.image_ops import average_hash
    from .decode import BatchDecoder

    if not 0 <= max_hamming <= 3:
        raise ValueError("banded pigeonhole is lossless only for "
                         f"max_hamming <= 3, got {max_hamming}")

    class HashRows:
        def __init__(self):
            self.decoder = BatchDecoder(target_size=None)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            images, _ = self.decoder.decode_column(batch[bytes_col].tolist())
            ids, hashes = [], []
            for image_id, img in zip(batch[id_col].tolist(), images):
                if img is None:
                    continue
                ids.append(int(image_id))
                hashes.append(average_hash(img))
            return pd.DataFrame({
                id_col: np.asarray(ids, dtype=np.int64),
                "h": (np.asarray(hashes, dtype=np.uint64).view(np.int64)
                      if hashes else np.zeros(0, dtype=np.int64)),
            })

    # decode tuning mirrors the featurize pool (decode dominates this
    # stage: 14.5 → 11.7 s at sf0.1/32 CPUs with the wider pool +
    # explicit batch size)
    hashed = ds.map_batches(HashRows, batch_format="pandas",
                            batch_size=128, concurrency=(2, 16)).materialize()

    # Every downstream exchange moves (id, h) scalar rows — size the
    # partition count from the MATERIALIZED hash-row count, not the
    # caller's corpus-scale hint (the multimodal_dedup_groups lesson:
    # 64-way exchanges on a 17k-row table are pure fixed overhead).
    num_partitions = min(num_partitions,
                         max(16, hashed.count() // 50_000 + 1))

    # phase 1 — exact collapse: min-id representative per identical
    # hash; star edges cover within-cluster connectivity at hamming 0
    def collapse(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(id_col, kind="mergesort")
        rep = g.groupby("h", sort=False)[id_col].transform("min")
        out = pd.DataFrame({"id_a": rep.to_numpy(np.int64),
                            "id_b": g[id_col].to_numpy(np.int64),
                            "h": g["h"].to_numpy(np.int64)})
        return out  # rep -> member rows; rep -> rep rows mark the rep

    collapsed = partitioned_apply(hashed, "h", collapse,
                                  num_partitions=num_partitions).materialize()

    star = collapsed.filter(expr="id_a != id_b").select_columns(["id_a", "id_b"])
    reps = collapsed.filter(expr="id_a == id_b")

    # phase 2 — banding over DISTINCT hashes only (tiny buckets by
    # construction), exact in-bucket hamming verify between reps
    def to_bands(batch: pd.DataFrame) -> pd.DataFrame:
        h = batch["h"].to_numpy(np.int64).view(np.uint64)
        ids = batch["id_a"].to_numpy(np.int64)
        out = {"rep": np.repeat(ids, 4),
               "sig": np.repeat(h.view(np.int64), 4),
               "band": np.tile(np.arange(4, dtype=np.int64), len(ids)),
               "bh": np.zeros(4 * len(ids), dtype=np.int64)}
        for b in range(4):
            out["bh"][b::4] = ((h >> np.uint64(16 * b))
                               & np.uint64(0xFFFF)).astype(np.int64)
        return pd.DataFrame(out)

    banded = reps.map_batches(to_bands, batch_format="pandas")

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        sig_of = dict(zip(group["rep"], group["sig"].astype(np.int64)))
        pairs, dropped = [], 0
        for _, g in group.groupby(["band", "bh"], sort=False):
            ids = np.sort(g["rep"].unique())
            if len(ids) > 1:
                pa_, pb_, d = _enumerate_bucket_pairs(
                    ids, edges=edges, max_pairs=max_bucket_pairs)
                dropped += d
                pairs.append(pd.DataFrame({"id_a": pa_, "id_b": pb_}))
        if dropped:
            _LOG.warning("image group pair enumeration truncated: %d "
                         "(max_bucket_pairs=%s)", dropped, max_bucket_pairs)
        if not pairs:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        cand = pd.concat(pairs, ignore_index=True).drop_duplicates()
        sa = cand["id_a"].map(sig_of).to_numpy(np.int64).view(np.uint64)
        sb = cand["id_b"].map(sig_of).to_numpy(np.int64).view(np.uint64)
        x = (sa ^ sb).view(np.uint8).reshape(len(cand), 8)
        ham = np.unpackbits(x, axis=1).sum(axis=1).astype("int64")
        return cand[ham <= max_hamming]

    rep_edges = partitioned_apply(banded, "bh", bucket_pairs,
                                  num_partitions=num_partitions)
    # no cross-partition edge dedup: the same rep pair surviving in
    # 2+ bands reaches CC multiply, which affects connectivity not at
    # all and CC work only by the ≤4× band duplication factor — one
    # whole exchange cheaper (each partition already drop_duplicates
    # its own candidates before the hamming verify)
    return neardup_groups(star.union(rep_edges),
                          num_partitions=num_partitions)


def snapshot_diff(old_ds, new_ds, *, id_col: str = "doc_id",
                  num_partitions: int = 64):
    """Corpus snapshot diff — the data-versioning audit between two
    crawl/ingest versions: classify every id as ``added`` (new only),
    ``removed`` (old only) or ``changed`` (present in both with a
    different content fingerprint); unchanged rows are dropped (the
    diff, not the union). Both sides reduce to (id, 8-byte
    fingerprint) rows shuffle-free (``stages/text.fingerprint64``),
    then ONE full-outer hash join on the id classifies everything —
    text never crosses an exchange. Output: ``id_col``, ``status``.
    """
    from ..temporal.join import hash_join
    from .text import fingerprint64

    def fp(ds, name):
        def pick(df: pd.DataFrame) -> pd.DataFrame:
            out = df[[id_col, "fingerprint"]].copy()
            return out.rename(columns={"fingerprint": name})
        return ds.map_batches(fingerprint64, batch_format="pandas") \
                 .map_batches(pick, batch_format="pandas")

    joined = hash_join(fp(old_ds, "fp_old"), fp(new_ds, "fp_new"),
                       on=id_col, how="outer",
                       num_partitions=num_partitions)

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        # fingerprints arrive as NULLABLE Int64 (exact — the join's
        # typed-null restore; a float64 upcast would corrupt hashes
        # beyond 2^53); compare via plain bool arrays, never NA bools
        added = df["fp_old"].isna().to_numpy()
        removed = df["fp_new"].isna().to_numpy()
        differ = (df["fp_old"].fillna(0) != df["fp_new"].fillna(0)).to_numpy()
        status = np.where(added, "added",
                          np.where(removed, "removed",
                                   np.where(differ, "changed", "unchanged")))
        out = pd.DataFrame({id_col: df[id_col].astype("int64"),
                            "status": status})
        return out[out["status"] != "unchanged"]

    return joined.map_batches(classify, batch_format="pandas")
