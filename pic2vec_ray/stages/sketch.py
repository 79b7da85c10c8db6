"""Distributed cardinality sketches (HyperLogLog) over Ray Data.

The reference engine has no sketches; this belongs to the training-data
extension surface (SURVEY.md §2.11).  The design point that makes the
sketch *oracle-checkable* (not just "plausible"): every HLL register is
a deterministic function of the token hash, and the token hash is the
same FNV-1-style polynomial Horner hash the ``fingerprint_docs``
operator already reproduces in DuckDB SQL (``list_reduce`` over
codepoints).  The driver's oracle therefore recomputes the registers —
and hence the estimate — EXACTLY, bit for bit, rather than comparing a
tolerance band (query ``hll_distinct_tokens``).

Scale shape (100 TB): map_batches computes per-batch partial registers
(one (group, bucket, rho)-max row per touched register — bounded by
groups × 2^p per batch, independent of batch row count), a single small
``groupby().max()`` merges them, and a per-group finalize emits the
estimate.  No driver-side state, no full-corpus shuffle: the only
exchange moves ≤ groups × 2^p tiny rows.  HLL register merge is a
pointwise max, so the result is partition-invariant by construction
(property-tested in tests/test_sketch.py).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from .text import _FP_PRIME

# p=8 → m=256 registers, ~6.5% relative standard error: plenty for the
# "estimate distinct tokens per source" use and small enough that the
# SQL oracle's per-token list_reduce stays cheap at sf0.01.
DEFAULT_P = 8


def _token_hash64(tokens: np.ndarray) -> np.ndarray:
    """Vectorized Horner hash h = fold(h·P + cp) mod 2^64 per token.

    Same kernel shape as text.fingerprint64: one utf-32 decode of the
    concatenated tokens, contributions cp·P^(end-1-pos), one
    add.reduceat per batch — no per-token Python loop.
    """
    n = len(tokens)
    out = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return out
    lens = np.fromiter((len(t) for t in tokens), count=n, dtype=np.int64)
    nonempty = lens > 0
    if not nonempty.any():
        return out
    cat = "".join(tokens[nonempty])
    cps = np.frombuffer(cat.encode("utf-32-le"), dtype="<u4").astype(np.uint64)
    ne_lens = lens[nonempty]
    ends = np.cumsum(ne_lens)
    starts = ends - ne_lens
    with np.errstate(over="ignore"):  # uint64 wraparound IS the mod 2^64
        ppow = np.empty(int(ne_lens.max()), dtype=np.uint64)
        ppow[0] = 1
        for k in range(1, len(ppow)):
            ppow[k] = ppow[k - 1] * _FP_PRIME
        pos = np.arange(len(cps), dtype=np.int64)
        exp = np.repeat(ends - 1, ne_lens) - pos
        out[nonempty] = np.add.reduceat(cps * ppow[exp], starts)
    return out


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant set).

    The raw polynomial Horner hash has NO avalanche in its high bits —
    structured vocabularies (e.g. ``w0001..w3999``) land in a handful
    of HLL buckets and wreck the estimate (measured: 6 buckets for
    4,000 tokens).  One xor-shift-multiply finalizer restores uniform
    bucket + geometric rho statistics; the SQL oracle reproduces it
    bit-for-bit in HUGEINT (xor() + // shifts + % 2^64 — parity pinned
    in tests/test_sketch.py).
    """
    with np.errstate(over="ignore"):
        z = x + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized bit length of uint64 values (branchless CLZ —
    float log2 would misround near power-of-two boundaries above 2^53)."""
    x = x.copy()
    bl = np.zeros(len(x), dtype=np.int64)
    for sh in (32, 16, 8, 4, 2, 1):
        big = x >= np.uint64(1 << sh)
        bl[big] += sh
        x[big] >>= np.uint64(sh)
    return bl + (x > 0)


def hll_registers_partial(group_col: str, col: str, p: int = DEFAULT_P):
    """map_batches UDF factory: rows → per-batch partial HLL registers
    ``(group, bucket, rho)`` with rho already max-combined within the
    batch.  Tokenization matches the SQL oracle: lowercase, whitespace
    split, empty tokens dropped, (group, token) de-duplicated before
    hashing (HLL needs no dedup for correctness, but it cuts hash work
    on repeated tokens — the common case in natural text)."""
    w = 64 - p

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[col].str.lower().str.split()
        df = pd.DataFrame({group_col: batch[group_col], "tok": toks})
        df = df.explode("tok").dropna(subset=["tok"])
        df = df[df["tok"].str.len() > 0].drop_duplicates([group_col, "tok"])
        h = _splitmix64(_token_hash64(df["tok"].to_numpy()))
        bucket = (h >> np.uint64(w)).astype(np.int64)
        x = h & np.uint64((1 << w) - 1)
        rho = (w + 1) - _bit_length_u64(x)  # x == 0 → bl 0 → rho w+1
        out = pd.DataFrame({group_col: df[group_col].to_numpy(),
                            "bucket": bucket, "rho": rho})
        return (out.groupby([group_col, "bucket"], as_index=False)["rho"]
                   .max())

    return partial


def hll_finalize(group_col: str, p: int = DEFAULT_P, *,
                 out_col: str = "est_distinct"):
    """map_groups UDF factory over the merged (group, bucket, max-rho)
    table: standard HLL estimator with the small-range linear-counting
    correction, rounded to 2 dp (the float-discipline the SQL oracle
    mirrors literally)."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        reg = np.zeros(m, dtype=np.float64)
        reg[df["bucket"].to_numpy()] = df["max(rho)"].to_numpy()
        s = float(np.sum(np.power(2.0, -reg)))
        v = int(np.count_nonzero(reg == 0))
        e = alpha * m * m / s
        if e <= 2.5 * m and v > 0:
            e = m * math.log(m / v)
        return pd.DataFrame({group_col: [df[group_col].iloc[0]],
                             out_col: [round(e, 2)]})

    return finalize


def hll_int_registers_partial(group_col: str, col: str, p: int = DEFAULT_P):
    """map_batches UDF factory for INTEGER identities (user ids, doc
    ids): splitmix64 of the int64 value is the hash — no tokenizer.
    Same partial-register output contract as the token variant, so the
    merge/finalize stages are shared."""
    w = 64 - p

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        df = batch[[group_col, col]].drop_duplicates()
        h = _splitmix64(df[col].to_numpy().astype(np.uint64))
        bucket = (h >> np.uint64(w)).astype(np.int64)
        x = h & np.uint64((1 << w) - 1)
        rho = (w + 1) - _bit_length_u64(x)
        out = pd.DataFrame({group_col: df[group_col].to_numpy(),
                            "bucket": bucket, "rho": rho})
        return (out.groupby([group_col, "bucket"], as_index=False)["rho"]
                   .max())

    return partial


def hll_distinct_int(ds, *, group_col: str, col: str, p: int = DEFAULT_P,
                     out_col: str = "est_distinct"):
    """Grouped approximate-distinct-count of an int64 column — e.g.
    distinct users per event-time window, composing the sketch with the
    windowing layer (assign the window key upstream, group on it here).
    Same three-stage shape as ``hll_distinct``."""
    partial = hll_int_registers_partial(group_col, col, p)
    merged = (ds.map_batches(partial, batch_format="pandas")
                .groupby([group_col, "bucket"]).max("rho"))
    return merged.groupby(group_col).map_groups(
        hll_finalize(group_col, p, out_col=out_col), batch_format="pandas")


def hll_distinct(ds, *, group_col: str, col: str, p: int = DEFAULT_P,
                 out_col: str = "est_distinct"):
    """Grouped approximate-distinct-count of whitespace tokens in
    ``col``: partial registers per batch → one tiny groupby().max()
    merge → per-group finalize.  Returns a Dataset
    ``(group_col, out_col)``."""
    partial = hll_registers_partial(group_col, col, p)
    merged = (ds.map_batches(partial, batch_format="pandas")
                .groupby([group_col, "bucket"]).max("rho"))
    return merged.groupby(group_col).map_groups(
        hll_finalize(group_col, p, out_col=out_col), batch_format="pandas")


# ------------------------------------------------- count-min sketch

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _cms_cols(hashes: np.ndarray, r: int, width: int) -> np.ndarray:
    """Row-``r`` counter column per token hash:
    ``splitmix64((h + r·GOLDEN) mod 2^64) mod width`` — the standard
    one-base-hash-per-row derivation, SQL-replayable through the same
    HUGEINT splitmix chain as the HLL oracle."""
    with np.errstate(over="ignore"):
        return (_splitmix64(hashes + np.uint64(r) * _GOLDEN)
                % np.uint64(width)).astype(np.int64)


def cms_token_counts(ds, *, text_col: str = "text", probes: list[str],
                     depth: int = 4, width: int = 1024):
    """Count-min-sketch token frequency estimation: a ``depth`` ×
    ``width`` counter grid built in ONE streaming pass (per-batch
    partial registers, ≤ depth·width counter rows per batch cross the
    exchange — never tokens), probed for a declared token list with
    the classic ``min`` over rows. Estimates are biased high only
    (counter collisions add, never subtract) — the fixed-footprint
    complement to the exact ``token_topk`` merge when the vocabulary
    itself is too large to materialize. Register merge is a pointwise
    ``groupby(r, col).sum`` — (r, col) has ``depth·width`` distinct
    values, squarely in Ray's low-cardinality sort-aggregate lane.
    Output: one row per probe token — ``token``, ``est_cnt`` (int64).
    """
    import ray.data as rd

    D, W = int(depth), int(width)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].str.lower().str.findall(r"[a-z0-9]+")
        flat = np.array([t for row in toks for t in row], dtype=object)
        if len(flat) == 0:
            return pd.DataFrame({"r": pd.Series([], dtype="int64"),
                                 "col": pd.Series([], dtype="int64"),
                                 "cnt": pd.Series([], dtype="int64")})
        h = _token_hash64(flat)
        frames = []
        for r in range(D):
            cols, cnts = np.unique(_cms_cols(h, r, W), return_counts=True)
            frames.append(pd.DataFrame({"r": r, "col": cols, "cnt": cnts}))
        return pd.concat(frames, ignore_index=True)

    regs = (ds.map_batches(partial, batch_format="pandas")
            .groupby(["r", "col"]).sum("cnt")
            .to_pandas())  # ≤ depth·width rows by construction
    lut = {(int(r), int(c)): int(n)
           for r, c, n in zip(regs["r"], regs["col"], regs["sum(cnt)"])}
    ph = _token_hash64(np.array(probes, dtype=object))
    out = []
    for i, tok in enumerate(probes):
        est = min(lut.get((r, int(_cms_cols(ph[i:i + 1], r, W)[0])), 0)
                  for r in range(D))
        out.append((tok, est))
    out.sort()
    return rd.from_pandas(pd.DataFrame(
        {"token": [t for t, _ in out],
         "est_cnt": pd.Series([e for _, e in out], dtype="int64")}))
