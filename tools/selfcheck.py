"""Driver-style correctness self-check: run every queries() entry and
compare with its oracle_sql() via DuckDB (row count + column names +
order-insensitive value hash), mimicking the driver's CORRECTNESS gate.

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> int:
    h = pd.util.hash_pandas_object(df, index=False)
    return int(h.sum() % (1 << 63))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 8)),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            failures.append(name)
            print(f"[FAIL] {name}: query raised {type(ex).__name__}: {ex}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows, cols={list(got.columns)}")
            continue
        try:
            exp = canon(con.execute(oracles[name]).df())
        except Exception as ex:
            failures.append(name)
            print(f"[FAIL] {name}: oracle SQL raised {type(ex).__name__}: {ex}")
            continue
        problems = []
        if len(got) != len(exp):
            problems.append(f"rows {len(got)} vs {len(exp)}")
        if list(got.columns) != list(exp.columns):
            problems.append(f"cols {list(got.columns)} vs {list(exp.columns)}")
        if not problems:
            for c in got.columns:
                if got[c].dtype != exp[c].dtype:
                    problems.append(f"dtype[{c}] {got[c].dtype} vs {exp[c].dtype}")
        if not problems and value_hash(got) != value_hash(exp):
            diff_cols = []
            for c in got.columns:
                a, b = got[c], exp[c]
                if a.dtype == np.float64:
                    same = np.allclose(a.fillna(-1), b.fillna(-1), atol=0, rtol=0)
                else:
                    same = a.fillna(-1).equals(b.fillna(-1)) if a.isna().any() else a.equals(b)
                if not same:
                    diff_cols.append(c)
            problems.append(f"value-hash mismatch, differing cols={diff_cols}")
        if problems:
            failures.append(name)
            print(f"[FAIL] {name}: {'; '.join(problems)}")
        else:
            print(f"[OK]   {name}: {len(got)} rows x {len(got.columns)} cols, hash match")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
