"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in pic2vec_ray) calls ray.init()/shutdown().
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: synthesize the
    input_hint image table, decode + CNN-embed via the actor pool, and
    return the feature summary Dataset (stable schema, >= 0 rows)."""
    from pic2vec_ray.pipelines.queries import featurize_flagship

    return featurize_flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented pipeline/operator (SURVEY.md §2 + the
    training-data extensions). Each callable takes sf_dir."""
    from pic2vec_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query (48 of 50
    as of round 3, incl. the full audio decode→FFT pipeline, the video
    demux→frame-sample→JPEG-decode pipeline, the rolling-hash document
    fingerprint, an end-to-end pixel-exactness check (phash_verify),
    a HyperLogLog sketch whose registers the SQL reproduces bit-for-bit
    (hll_distinct_tokens), and — new in round 3 — the ENTIRE
    minhash/simhash near-dup family: the shingle hash is the SQL-pinned
    splitmix64(Horner) kernel, so DuckDB replays signatures, LSH band
    collisions and even the connected-components grouping (recursive
    CTE) exactly (pipelines/sketch_sql.py). The 2 rows-only residue is
    genuinely non-SQL-expressible: IVF search (k-means training) and
    featurize_flagship's CNN feature norms (its structural contract IS
    oracle-checked via featurize_dims)."""
    from pic2vec_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
