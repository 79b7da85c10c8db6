"""Deterministic dataset splitting and sampling by key hash.

Training-data pipelines need train/valid/test assignment and down-
sampling that are (a) reproducible run-over-run, (b) stable under
repartitioning and resume, and (c) computable without any shuffle.
Random states satisfy none of these at 100 TB; a multiplicative hash of
a stable integer key satisfies all three — each row's assignment is a
pure function of its id, so the operator is a stateless ``map_batches``
filter/projection with zero data movement.

Hash contract (mirrored exactly by the SQL oracles in
``pipelines/queries.py``): Knuth's multiplicative hash
``bucket(id) = ((id * 2654435761) mod 2^32) mod buckets``. The Python
side wraps in uint64 (``(id*K) mod 2^64 ≡ (id*K) mod 2^32 (mod 2^32)``
since 2^32 divides 2^64); the SQL side computes the exact product in
HUGEINT — identical results for any int64 id.

No counterpart in the reference (single-machine, no split tooling);
part of SURVEY.md §2's training-data additions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_KNUTH = np.uint64(2654435761)
_MOD32 = np.uint64(0xFFFFFFFF)


def hash_bucket(ids: np.ndarray, buckets: int) -> np.ndarray:
    """Deterministic bucket in [0, buckets) per int64 id."""
    h = (ids.astype(np.uint64) * _KNUTH) & _MOD32
    return (h % np.uint64(buckets)).astype(np.int64)


def hash_split(ds, *, id_col: str, weights: dict[str, int] | None = None,
               split_col: str = "split"):
    """Assign every row a split label by id hash.

    ``weights`` maps label → integer share; buckets = sum of shares
    (default ``{"train": 8, "valid": 1, "test": 1}``). Labels fill
    bucket ranges in the given order, so the same weights always
    reproduce the same assignment.
    """
    weights = weights or {"train": 8, "valid": 1, "test": 1}
    buckets = sum(weights.values())
    labels = np.empty(buckets, dtype=object)
    lo = 0
    for name, share in weights.items():
        labels[lo:lo + share] = name
        lo += share

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        b = hash_bucket(batch[id_col].to_numpy(), buckets)
        batch[split_col] = labels[b]
        return batch

    return ds.map_batches(assign, batch_format="pandas")


_KFOLD_MULT = np.uint64(2246822519)  # xxHash PRIME32_2 — NOT the Knuth
# constant: the multiplicative hash is linear, so an additive salt on the
# SAME multiplier stays affinely tied to hash_split's buckets; a distinct
# odd multiplier decorrelates the fold and split assignments.


def kfold_assign(ds, *, id_col: str, k: int, fold_col: str = "fold"):
    """Deterministic k-fold cross-validation assignment:
    ``fold = ((id * 2246822519) mod 2^32) mod k`` — zero-shuffle,
    reproducible under any partitioning, and independent of
    :func:`hash_split`'s train/valid/test buckets (distinct
    multiplier), so CV folds cut across the holdout split instead of
    mirroring it.  The SQL oracle replays the 32-bit multiply."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        h = (batch[id_col].to_numpy().astype(np.uint64) * _KFOLD_MULT) & _MOD32
        batch[fold_col] = (h % np.uint64(k)).astype(np.int64)
        return batch

    return ds.map_batches(assign, batch_format="pandas")


def hash_sample_mixture(ds, *, id_col: str, key_col: str,
                        rates: dict[str, float], default_rate: float = 1.0,
                        buckets: int = 10_000):
    """Domain-mixture sampling: keep each row with a per-``key_col``
    rate (e.g. downweight a crawl source, keep curated sources whole).

    The standard corpus-mixing step of training-data builds, as a
    zero-shuffle deterministic filter: row kept iff
    ``hash_bucket(id) < rate[key] * buckets``. Upsampling (rate > 1)
    is out of scope here — at scale that is repetition at the data
    loader, not materialized copies.
    """
    for k, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {k!r} must be in [0, 1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    cuts = {k: int(round(r * buckets)) for k, r in rates.items()}
    default_cut = int(round(default_rate * buckets))

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        b = hash_bucket(batch[id_col].to_numpy(), buckets)
        cut = batch[key_col].map(cuts).fillna(default_cut).to_numpy()
        return batch.iloc[b < cut]

    return ds.map_batches(keep, batch_format="pandas")


def weighted_sample(ds, *, id_col: str, weight_col: str, k: int):
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis): each row gets key ``u^(1/w)`` where ``u``
    is a uniform derived from ``splitmix64(id)`` (no RNG state — the
    same id always draws the same uniform), and the k largest keys win.
    P(row i in sample) follows the classic weighted-reservoir result,
    but the draw is reproducible under any partitioning and replayable
    in SQL (the splitmix chain + ``pow`` + ORDER BY ... LIMIT k).

    Scale shape: key assignment is stateless map_batches; selection is
    the engine's distributed top-k (sort + limit — per-block top-k
    prune, never a full materialization).  Weights must be > 0."""
    from .sketch import _splitmix64

    def key(batch: pd.DataFrame) -> pd.DataFrame:
        w = batch[weight_col].to_numpy(np.float64)
        if (w <= 0).any():
            raise ValueError(f"{weight_col!r} must be strictly positive")
        h = _splitmix64(batch[id_col].to_numpy().astype(np.uint64))
        u = ((h >> np.uint64(11)).astype(np.float64) + 0.5) / float(1 << 53)
        batch["__wskey"] = u ** (1.0 / w)
        return batch

    out = (ds.map_batches(key, batch_format="pandas")
           .sort(["__wskey", id_col], descending=[True, False])
           .limit(k))
    return out.map_batches(lambda df: df.drop(columns="__wskey"),
                           batch_format="pandas")


def hash_sample(ds, *, id_col: str, rate: float, buckets: int = 10_000):
    """Deterministic ~``rate`` subsample: keep ids whose hash bucket
    falls below ``rate * buckets``. Same rows every run, any partition
    layout, no shuffle, no RNG state."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    cut = int(round(rate * buckets))

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        b = hash_bucket(batch[id_col].to_numpy(), buckets)
        return batch.iloc[b < cut]

    return ds.map_batches(keep, batch_format="pandas")


# --------------------------------------------------------------- epoch shuffle

# LCG multiplier/increment (public constants, Knuth MMIX) seed the
# per-(epoch, seed) hash stream; splitmix64 finalizes for avalanche.
_EPOCH_K1 = np.uint64(6364136223846793005)
_EPOCH_K2 = np.uint64(1442695040888963407)


def _epoch_hash(ids: np.ndarray, epoch: int, seed: int) -> np.ndarray:
    from .sketch import _splitmix64

    with np.errstate(over="ignore"):
        x = (ids.astype(np.uint64)
             + np.uint64(epoch) * _EPOCH_K1
             + np.uint64(seed) * _EPOCH_K2)
    return _splitmix64(x)


def epoch_shuffle(ds, *, id_col: str, epoch: int, seed: int = 0,
                  num_buckets: int = 4096, num_partitions: int = 64,
                  position_col: str = "position"):
    """Deterministic global shuffle for training epochs: every row gets
    an explicit ``(epoch, position)`` with ``position`` the rank of
    ``splitmix64(id + epoch·K1 + seed·K2)`` (ties broken by id) — a
    seeded permutation that is a pure function of (id, epoch, seed), so
    it is reproducible run-over-run, stable under repartitioning and
    resume, and changes completely between epochs. ``random_shuffle``
    gives none of those (RNG state, no positions, not resumable).

    Zero-materialization rank computation (no global sort):

    1. one pass of per-batch histograms over the top-``log2(buckets)``
       hash bits — uniform by avalanche, so buckets are balanced; the
       driver cumsums the ≤``num_buckets`` counters into exclusive
       global offsets (a tree combine keeps the driver table bounded);
    2. one hash partition co-locates each bucket, and
       ``position = offset[bucket] + rank within bucket`` — vectorized
       sort + cumcount per partition.

    The SQL oracle replays the identical permutation via
    ``ROW_NUMBER() OVER (ORDER BY splitmix64_hash, id)`` (HUGEINT
    splitmix64 from ``pipelines/sketch_sql``); ids must be >= 0 (the
    uint64/HUGEINT wrap contracts agree on non-negatives only).
    """
    if num_buckets & (num_buckets - 1):
        raise ValueError(f"num_buckets must be a power of two, got {num_buckets}")
    shift = np.uint64(64 - int(num_buckets).bit_length() + 1)
    epoch, seed = int(epoch), int(seed)

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy()
        if len(ids) and ids.min() < 0:
            raise ValueError("epoch_shuffle requires non-negative ids")
        h = _epoch_hash(ids, epoch, seed)
        batch["__h"] = h
        batch["__bucket"] = (h >> shift).astype(np.int64)
        return batch

    def counts(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy()
        if len(ids) and ids.min() < 0:
            raise ValueError("epoch_shuffle requires non-negative ids")
        b = (_epoch_hash(ids, epoch, seed) >> shift).astype(np.int64)
        u, c = np.unique(b, return_counts=True)
        return pd.DataFrame({"__bucket": u, "cnt": c})

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("__bucket", as_index=False)["cnt"].sum()

    # histogram pass: per-batch partials, a tree combine (bounds the
    # driver merge to ~num_buckets x partial-batches/2^18 rows), then a
    # tiny driver cumsum -> exclusive offsets per bucket.
    partials = (ds.map_batches(counts, batch_format="pandas")
                .map_batches(combine, batch_format="pandas",
                             batch_size=1 << 18)
                .to_pandas()
                .groupby("__bucket", as_index=False)["cnt"].sum()
                .sort_values("__bucket"))
    offsets = np.zeros(num_buckets, dtype=np.int64)
    offsets[partials["__bucket"].to_numpy()] = partials["cnt"].to_numpy()
    offsets = np.concatenate(([0], offsets.cumsum()))[:-1]

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["__bucket", "__h", id_col], kind="mergesort")
        within = df.groupby("__bucket", sort=False).cumcount().to_numpy()
        df[position_col] = offsets[df["__bucket"].to_numpy()] + within
        df["epoch"] = np.int64(epoch)
        return df.drop(columns=["__h", "__bucket"])

    from ..temporal.core import partitioned_apply

    tagged = ds.map_batches(tag, batch_format="pandas")
    return partitioned_apply(tagged, "__bucket", assign,
                             num_partitions=num_partitions)


def temperature_mixture(ds, *, id_col: str, key_col: str, alpha: float = 0.5,
                        buckets: int = 10_000, size_decimals: int = 4):
    """Temperature-based domain mixing (the unified-scaling /
    multilingual α-sampling rule): source ``s`` with ``n_s`` rows is
    kept at rate ``n_s^(α-1) / max_t n_t^(α-1)`` — for ``α < 1`` the
    smallest source is kept whole and large sources are flattened
    toward it; ``α = 1`` keeps everything (natural mixing). Upsampling
    beyond rate 1 stays out of scope (repetition belongs at the data
    loader, same rule as :func:`hash_sample_mixture`).

    Fit = one low-cardinality source-count groupby (bounded by the
    domain count); rates are rounded to ``size_decimals`` BEFORE use
    so the SQL oracle reproduces the cut arithmetic exactly; transform
    delegates to the zero-shuffle deterministic
    :func:`hash_sample_mixture` filter.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby(key_col, as_index=False).size() \
                    .rename(columns={"size": "n"})

    sizes = (ds.map_batches(partial, batch_format="pandas")
             .groupby(key_col).sum("n")
             .to_pandas())  # ≤ |source domain| rows
    w = np.power(sizes["sum(n)"].to_numpy(np.float64), alpha - 1.0)
    rates = np.round(w / w.max(), size_decimals)
    rate_map = dict(zip(sizes[key_col], rates))
    return hash_sample_mixture(ds, id_col=id_col, key_col=key_col,
                               rates=rate_map, default_rate=1.0,
                               buckets=buckets)
