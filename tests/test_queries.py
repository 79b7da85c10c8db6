"""Driver-style oracle comparison smoke at sf0.001 (full sweep lives in
tools/selfcheck.py, run at sf0.01)."""

from __future__ import annotations

import duckdb
import pytest

from tools.selfcheck import TABLES, canon, to_pandas, value_hash

SMOKE = [
    "q1_pricing_summary",
    "asof_purchase",
    "sessionize_events",
    "dedup_exact_docs",
    "image_decode_dims",
    "caption_roundtrip",
]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return c


@pytest.fixture(scope="module")
def entry(ray_session):
    import __ray_entry__ as e

    return e


def test_entry_smoke(entry):
    out = to_pandas(entry.entry())
    assert len(out) >= 0
    assert set(out.columns) == {"image_id", "missing", "feat_dim", "feat_norm"}


def test_queries_have_oracles_or_reason(entry):
    qs, os_ = entry.queries(), entry.oracle_sql()
    assert set(os_).issubset(set(qs))
    assert len(os_) >= 13


@pytest.mark.parametrize("name", SMOKE)
def test_query_matches_oracle(entry, con, sf_dir, name):
    got = canon(to_pandas(entry.queries()[name](sf_dir)))
    exp = canon(con.execute(entry.oracle_sql()[name]).df())
    assert len(got) == len(exp)
    assert list(got.columns) == list(exp.columns)
    assert value_hash(got) == value_hash(exp)
