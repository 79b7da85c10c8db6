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
