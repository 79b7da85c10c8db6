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
    """DuckDB-equivalent SQL for every SQL-expressible query (132 of
    136 as of round 5), incl. the full audio decode→FFT pipeline, the
    video demux→frame-sample→JPEG-decode pipeline, end-to-end
    pixel-exactness (phash_verify), sketches whose registers the SQL
    reproduces bit-for-bit (HLL, count-min, DDSketch), the ENTIRE
    minhash/simhash near-dup family incl. cross-side fuzzy
    decontamination (pipelines/sketch_sql.py), and integer-quantized
    scores (Naive Bayes micro-nats, EWMA frame sums, KL addends) that
    make unordered SQL SUM() replay float pipelines exactly. The 4
    rows-only residue is genuinely non-SQL-expressible: IVF search +
    word_vectors_docs (iterative k-means/SVD), featurize_flagship's
    CNN feature norms (structural contract oracle-checked via
    featurize_dims), phash_dedup_groups (perceptual hashes derive from
    generator noise; components pytest-pinned)."""
    from pic2vec_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
