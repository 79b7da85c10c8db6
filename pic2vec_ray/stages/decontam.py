"""Benchmark decontamination: drop training documents that share any
word n-gram with an evaluation set.

This is the standard exact-overlap decontamination step of large-scale
training-data pipelines (the same shape used by public corpus builds
such as Dolma/RedPajama): the EVAL side is small by definition (a
benchmark suite), so its distinct n-grams are collected once and
broadcast via ``ray.put``; the TRAIN side then streams through a
``map_batches`` membership filter with **zero shuffles** — the only
all-to-all-free plan that works at 100 TB of train data.

Tokenization contract (mirrored exactly by the SQL oracle in
``pipelines/queries.py::SQL_DECONTAMINATE``): lowercase, split on
``[^a-z0-9]+``, drop empties, join windows of ``n`` tokens with a
single space.

Scale notes
-----------
* The broadcast set holds the eval side's distinct n-gram *strings*
  (exact, collision-free). For an eval corpus beyond driver memory,
  swap the set for a Bloom filter of 64-bit gram hashes — the filter
  stage below only needs a ``__contains__``; false positives then
  over-remove slightly, which is the accepted trade in public corpus
  builds.
* N-gram assembly is vectorized: ``n-1`` ``np.char.add`` passes over
  the batch's flat token array, never a per-row Python loop.

No counterpart in the reference (pic2vec has no text pipeline); the
operator family is motivated by SURVEY.md §2's training-data additions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray


def word_ngrams_batch(texts: pd.Series, n: int) -> tuple[np.ndarray, np.ndarray]:
    """All word ``n``-grams of a batch of texts in one vectorized pass.

    Returns ``(grams, doc_idx)``: flat arrays where ``grams[i]`` is a
    space-joined n-gram belonging to row ``doc_idx[i]`` of the batch.
    Documents with fewer than ``n`` tokens contribute nothing.
    """
    toks = texts.str.lower().str.findall(r"[a-z0-9]+")
    counts = toks.str.len().to_numpy(dtype=np.int64)
    if counts.sum() == 0:
        return np.array([], dtype=object), np.array([], dtype=np.int64)
    flat = np.concatenate([np.array(t, dtype=object) if t else
                           np.array([], dtype=object) for t in toks])
    # window start positions: valid iff the whole window stays inside
    # the source document
    ends = np.cumsum(counts)           # exclusive end of each doc
    starts = ends - counts
    m = len(flat)
    if m < n:
        return np.array([], dtype=object), np.array([], dtype=np.int64)
    doc_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    win_start = np.arange(m - n + 1, dtype=np.int64)
    valid = win_start + n <= ends[doc_of[win_start]]
    # n-1 vectorized concat passes over the whole batch
    grams = flat[: m - n + 1].astype(object)
    for j in range(1, n):
        grams = grams + " "
        grams = grams + flat[j : m - n + 1 + j]
    return grams[valid], doc_of[win_start[valid]]


def eval_ngram_set(eval_ds, *, col: str = "text", n: int = 8) -> frozenset:
    """Distinct word n-grams of the (small) eval dataset.

    Per-batch dedup happens inside ``map_batches``; the driver unions
    only already-deduped string batches. Bounded by the eval side's
    distinct-gram count — fine for benchmark-sized eval corpora, see
    module docstring for the Bloom-filter swap beyond that.
    """
    def to_grams(batch: pd.DataFrame) -> pd.DataFrame:
        grams, _ = word_ngrams_batch(batch[col], n)
        return pd.DataFrame({"g": pd.unique(grams)})

    out: set = set()
    for b in eval_ds.map_batches(to_grams, batch_format="pandas").iter_batches(
            batch_format="pandas"):
        out.update(b["g"])
    return frozenset(out)


class BloomGramFilter:
    """Fixed-size Bloom filter over gram strings — the documented swap
    for eval sides whose distinct-gram SET outgrows driver/object-store
    memory: the filter's footprint is ``m/8`` bytes regardless of gram
    count or string length, and membership is vectorized.

    Guarantees: NO false negatives (every truly contaminated document
    is removed); false positives over-remove clean documents at a rate
    ``≈ (1 - e^{-k·n/m})^k`` — the accepted trade in public corpus
    builds. Hashing is double hashing (Kirsch–Mitzenmacher) over two
    independent process-stable ``hash_pandas_object`` passes, so a
    filter built on the driver answers identically inside every worker.
    """

    def __init__(self, n_bits: int, k: int):
        if n_bits < 64 or k < 1:
            raise ValueError(f"need n_bits >= 64 and k >= 1, got {n_bits}, {k}")
        self.m = int(n_bits)
        self.k = int(k)
        self.bits = np.zeros((self.m + 63) // 64, dtype=np.uint64)

    @classmethod
    def for_capacity(cls, expected_grams: int, fp_rate: float = 1e-4):
        """Size for ``expected_grams`` insertions at ``fp_rate``:
        ``m = -n·ln p / ln²2``, ``k = (m/n)·ln 2``."""
        n = max(1, int(expected_grams))
        m = int(np.ceil(-n * np.log(fp_rate) / (np.log(2) ** 2)))
        k = max(1, int(round(m / n * np.log(2))))
        return cls(max(m, 64), k)

    def _hashes(self, grams) -> tuple[np.ndarray, np.ndarray]:
        s = pd.Series(grams, dtype=object)
        h1 = pd.util.hash_pandas_object(s, index=False).to_numpy()
        h2 = pd.util.hash_pandas_object(
            s, index=False, hash_key="bloom_gram_filt0").to_numpy()  # 16-byte key
        return h1, h2 | np.uint64(1)  # odd step never cycles short

    def add_many(self, grams) -> None:
        if len(grams) == 0:
            return
        h1, h2 = self._hashes(grams)
        for i in range(self.k):
            idx = (h1 + np.uint64(i) * h2) % np.uint64(self.m)
            np.bitwise_or.at(self.bits, (idx >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (idx & np.uint64(63)))

    def contains_many(self, grams) -> np.ndarray:
        if len(grams) == 0:
            return np.zeros(0, dtype=bool)
        h1, h2 = self._hashes(grams)
        hit = np.ones(len(h1), dtype=bool)
        for i in range(self.k):
            idx = (h1 + np.uint64(i) * h2) % np.uint64(self.m)
            word = self.bits[(idx >> np.uint64(6)).astype(np.int64)]
            hit &= (word >> (idx & np.uint64(63))) & np.uint64(1) != 0
            if not hit.any():
                break
        return hit

    def __contains__(self, gram: str) -> bool:
        return bool(self.contains_many(np.array([gram], dtype=object))[0])


def eval_ngram_bloom(eval_ds, *, col: str = "text", n: int = 8,
                     expected_grams: int | None = None,
                     fp_rate: float = 1e-4) -> BloomGramFilter:
    """Stream the eval corpus into a :class:`BloomGramFilter` — the
    driver holds only the fixed-size bit array, never the gram strings
    (``eval_ngram_set`` beyond driver memory).  ``expected_grams``
    defaults to a ``count() × n_grams-per-doc`` estimate from a one-row
    schema probe; pass it explicitly for tight sizing."""
    if expected_grams is None:
        # estimate total grams ≈ rows × mean tokens/row over a sample —
        # a single unrepresentative first row would mis-size the filter
        # and blow the false-positive rate past fp_rate
        sample = eval_ds.take(32)
        toks = [len(str(r[col]).split()) for r in sample]
        mean_tok = (sum(toks) / len(toks)) if toks else 0.0
        expected_grams = max(1024, int(eval_ds.count() * max(mean_tok, 1.0)))
    filt = BloomGramFilter.for_capacity(expected_grams, fp_rate)

    def to_grams(batch: pd.DataFrame) -> pd.DataFrame:
        grams, _ = word_ngrams_batch(batch[col], n)
        return pd.DataFrame({"g": pd.unique(grams)})

    for b in eval_ds.map_batches(to_grams, batch_format="pandas").iter_batches(
            batch_format="pandas"):
        filt.add_many(b["g"].to_numpy())
    return filt


def decontaminate(train_ds, eval_grams, *, col: str = "text", n: int = 8,
                  drop_counter=None, counter_key: str = "decontaminate"):
    """Filter ``train_ds`` down to rows sharing NO word n-gram with the
    eval set.

    ``eval_grams`` is a ``frozenset``, a :class:`BloomGramFilter`
    (vectorized membership, tiny broadcast, no false negatives), any
    object with ``__contains__`` over strings, or an ``ObjectRef`` to
    one; it is ``ray.put`` once and read zero-copy by every filter
    task — never re-shipped per batch.

    ``drop_counter``: a ``state.metrics.DropCounter`` handle — each
    batch fire-and-forgets its dropped-row count under ``counter_key``,
    so the removal is observable instead of silent (VERDICT r03 #8).
    """
    ref = eval_grams if isinstance(eval_grams, ray.ObjectRef) \
        else ray.put(eval_grams)

    def keep_clean(batch: pd.DataFrame) -> pd.DataFrame:
        grams_set = ray.get(ref)
        grams, doc_idx = word_ngrams_batch(batch[col], n)
        if len(grams) == 0:
            return batch
        if hasattr(grams_set, "contains_many"):
            hit = grams_set.contains_many(grams)
        else:
            hit = np.fromiter((g in grams_set for g in grams),
                              dtype=bool, count=len(grams))
        bad_rows = np.unique(doc_idx[hit])
        mask = np.ones(len(batch), dtype=bool)
        mask[bad_rows] = False
        if drop_counter is not None:
            from ..state.metrics import add_dropped

            add_dropped(drop_counter, counter_key, len(bad_rows))
        return batch.iloc[mask]

    return train_ds.map_batches(keep_clean, batch_format="pandas")


def eval_ngram_owners(eval_ds, *, id_col: str = "doc_id",
                      col: str = "text", n: int = 8) -> dict:
    """``gram -> min eval doc id`` over the (small) eval dataset — the
    attribution counterpart of :func:`eval_ngram_set`, same
    driver-memory bound and Bloom-swap caveat."""
    def to_pairs(batch: pd.DataFrame) -> pd.DataFrame:
        grams, doc_idx = word_ngrams_batch(batch[col], n)
        if len(grams) == 0:
            return pd.DataFrame({"g": pd.Series([], dtype=object),
                                 "d": pd.Series([], dtype="int64")})
        df = pd.DataFrame({"g": grams,
                           "d": batch[id_col].to_numpy()[doc_idx]})
        return df.groupby("g", as_index=False)["d"].min()

    owners: dict = {}
    for b in eval_ds.map_batches(to_pairs, batch_format="pandas") \
                    .iter_batches(batch_format="pandas"):
        for g, d in zip(b["g"], b["d"]):
            cur = owners.get(g)
            if cur is None or d < cur:
                owners[g] = int(d)
    return owners


def contamination_report(train_ds, eval_owners, *, id_col: str = "doc_id",
                         col: str = "text", n: int = 8):
    """The AUDIT mode of decontamination: instead of silently dropping
    contaminated rows, report every (train doc, eval doc, shared
    distinct-gram count) pair — what a data audit actually needs
    before deciding to drop. ``eval_owners`` is the
    :func:`eval_ngram_owners` dict (or an ``ObjectRef`` to one),
    ``ray.put`` once and read zero-copy per task; attribution pins
    each gram to its MIN eval doc id so the pairing is deterministic.
    Zero-shuffle on the train side except one bounded
    (train_doc, eval_doc) pair merge.
    Output: ``id_col``, ``eval_doc``, ``shared_grams`` (int64).
    """
    from ..temporal.core import partitioned_apply

    ref = eval_owners if isinstance(eval_owners, ray.ObjectRef) \
        else ray.put(eval_owners)

    def pairs(batch: pd.DataFrame) -> pd.DataFrame:
        owners = ray.get(ref)
        grams, doc_idx = word_ngrams_batch(batch[col], n)
        empty = pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                              "eval_doc": pd.Series([], dtype="int64"),
                              "shared_grams": pd.Series([], dtype="int64")})
        if len(grams) == 0:
            return empty
        df = pd.DataFrame({id_col: batch[id_col].to_numpy()[doc_idx],
                           "g": grams}).drop_duplicates()
        df["eval_doc"] = df["g"].map(owners)
        df = df.dropna(subset=["eval_doc"])
        if df.empty:
            return empty
        out = df.groupby([id_col, "eval_doc"], as_index=False).size() \
                .rename(columns={"size": "shared_grams"})
        out["eval_doc"] = out["eval_doc"].astype("int64")
        out["shared_grams"] = out["shared_grams"].astype("int64")
        return out

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby([id_col, "eval_doc"], as_index=False)["shared_grams"].sum()
        g["shared_grams"] = g["shared_grams"].astype("int64")
        return g

    return partitioned_apply(
        train_ds.map_batches(pairs, batch_format="pandas"),
        [id_col, "eval_doc"], merge, num_partitions=16)


def decontaminate_fuzzy(train_ds, eval_ds, *, col: str = "text",
                        id_col: str = "doc_id", threshold: float = 0.5,
                        num_perm: int = 64, bands: int = 16,
                        shingle_k: int = 5, num_partitions: int = 64,
                        max_bucket_fanout: int = 100_000):
    """NEAR-duplicate decontamination: drop training documents whose
    exact character-shingle Jaccard against ANY eval document is
    ``>= threshold``, with MinHash-LSH banding as the sub-quadratic
    candidate generator — the fuzzy sibling of :func:`decontaminate`
    (exact n-gram overlap misses light paraphrases; public corpus
    builds run both).

    Pipeline (reusing ``stages/dedup``'s signature kernels, same seeded
    permutations, so the SQL oracle in ``pipelines/sketch_sql.
    minhash_decontam_sql`` replays every stage bit-for-bit):

    1. signatures for BOTH sides (vectorized batch kernel);
    2. band rows; candidates are CROSS-SIDE ONLY — per (band, bucket),
       eval members × train members, capped at ``max_bucket_fanout``
       per bucket with a logged drop count (never silent);
    3. signature-agreement prefilter, then exact Jaccard verify, both
       by pair-bounded hash joins (no corpus broadcast);
    4. distributed ANTI join of the train side against the
       contaminated-id set (``temporal.join.hash_join(how="anti")``) —
       the contaminated set is never materialized to the driver.

    Returns the KEPT train rows (all train columns).
    """
    import logging

    from ..temporal.join import hash_join
    from .dedup import (_minhash_params, jaccard, minhash_signatures_batch)

    log = logging.getLogger(__name__)
    if num_perm % bands:
        raise ValueError("bands must divide num_perm")
    rpb = num_perm // bands
    a, b = _minhash_params(num_perm)
    est_cutoff = max(0.0, threshold - 0.2)

    def to_sigs(side: int):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            sigs = minhash_signatures_batch(list(batch[col]), a, b, shingle_k)
            return pd.DataFrame({id_col: batch[id_col].to_numpy(),
                                 "sig": [s.tobytes() for s in sigs],
                                 "__text": batch[col].to_numpy(),
                                 "__side": np.int8(side)})
        return fn

    train_sig = train_ds.map_batches(to_sigs(0), batch_format="pandas",
                                     batch_size=256).materialize()
    eval_sig = eval_ds.map_batches(to_sigs(1), batch_format="pandas",
                                   batch_size=256).materialize()

    def to_bands(batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack([np.frombuffer(s, dtype=np.uint64)
                         for s in batch["sig"]])
        n = len(batch)
        band_ids = np.repeat(np.arange(bands), n)
        ids = np.tile(batch[id_col].to_numpy(), bands)
        sides = np.tile(batch["__side"].to_numpy(), bands)
        bh = np.empty(bands * n, dtype=np.uint64)
        for bi in range(bands):
            seg = sigs[:, bi * rpb:(bi + 1) * rpb]
            bh[bi * n:(bi + 1) * n] = pd.util.hash_pandas_object(
                pd.DataFrame(seg), index=False).to_numpy()
        out = pd.DataFrame({"band": band_ids, "band_hash": bh,
                            id_col: ids, "__side": sides})
        out["__part"] = ((out.band_hash ^ out.band)
                         % num_partitions).astype("int64")
        return out

    def cross_pairs(group: pd.DataFrame) -> pd.DataFrame:
        pairs, dropped = [], 0
        for _, g in group.groupby(["band", "band_hash"], sort=False):
            tr = np.sort(g.loc[g.__side == 0, id_col].unique())
            ev = np.sort(g.loc[g.__side == 1, id_col].unique())
            if not len(tr) or not len(ev):
                continue
            fan = len(tr) * len(ev)
            if fan > max_bucket_fanout:
                # keep a deterministic prefix of the train ids so the
                # cap never silently depends on block order
                keep = max(max_bucket_fanout // len(ev), 1)
                dropped += (len(tr) - keep) * len(ev)
                tr = tr[:keep]
            pairs.append(pd.DataFrame({
                "id_t": np.repeat(tr, len(ev)),
                "id_e": np.tile(ev, len(tr)),
            }))
        if dropped:
            log.warning("decontaminate_fuzzy: %d cross candidates dropped "
                        "by max_bucket_fanout=%d", dropped, max_bucket_fanout)
        if not pairs:
            return pd.DataFrame({"id_t": pd.Series([], dtype="int64"),
                                 "id_e": pd.Series([], dtype="int64")})
        return pd.concat(pairs, ignore_index=True).drop_duplicates()

    from ..temporal.core import partitioned_apply

    bands_ds = (train_sig.union(eval_sig)
                .map_batches(to_bands, batch_format="pandas")
                .groupby("__part").map_groups(cross_pairs,
                                              batch_format="pandas"))
    cand = partitioned_apply(
        bands_ds, ["id_t", "id_e"],
        lambda df: df.drop_duplicates(),
        num_partitions=num_partitions).materialize()

    if cand.count() == 0:
        return train_ds

    def _side(side: str, src):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            return batch.rename(columns={id_col: f"id_{side}",
                                         "sig": f"sig_{side}",
                                         "__text": f"text_{side}"}) \
                        .drop(columns="__side")
        return src.map_batches(fn, batch_format="pandas")

    with_t = hash_join(cand, _side("t", train_sig), on="id_t",
                       num_partitions=num_partitions).materialize()
    with_te = hash_join(with_t, _side("e", eval_sig), on="id_e",
                        num_partitions=num_partitions)

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({id_col: pd.Series([], dtype="int64")})
        if batch.empty:
            return empty
        st = np.stack([np.frombuffer(s, dtype=np.uint64)
                       for s in batch["sig_t"]])
        se = np.stack([np.frombuffer(s, dtype=np.uint64)
                       for s in batch["sig_e"]])
        batch = batch[(st == se).mean(axis=1) >= est_cutoff]
        if batch.empty:
            return empty
        jac = np.array([jaccard(x, y, shingle_k)
                        for x, y in zip(batch.text_t, batch.text_e)])
        out = batch.loc[jac >= threshold, ["id_t"]].drop_duplicates()
        return out.rename(columns={"id_t": id_col})

    contaminated = with_te.map_batches(verify, batch_format="pandas")
    return hash_join(train_ds, contaminated, on=id_col, how="anti",
                     num_partitions=num_partitions)
