"""Round-3 semantic fixes (ADVICE r02):

- progressive JPEG per-SOS Huffman-table snapshots (tested in
  tests/test_jpeg.py::test_progressive_dht_redefined_between_scans);
- hash_join treats NULL keys per SQL (never match), not per pandas
  (NaN == NaN matches);
- UrlFetcher rejects non-http(s) schemes (file:///etc/passwd must not
  become a dataset row);
- LSH projection planes are built once per worker process, not per
  batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


@pytest.fixture()
def null_key_frames():
    left = pd.DataFrame({
        "k": pd.array([1, 2, None, None], dtype="Int64"),
        "lv": [10, 20, 30, 40],
    })
    right = pd.DataFrame({
        "k": pd.array([1, None], dtype="Int64"),
        "rv": [100, 200],
    })
    return left, right


def test_hash_join_null_keys_follow_sql(ray_session, null_key_frames):
    """DuckDB: SELECT ... JOIN ON l.k = r.k — NULL never equals NULL.
    inner: only k=1 matches. left: null-key left rows survive unmatched.
    semi (EXISTS): null-key left rows excluded. anti (NOT EXISTS):
    null-key left rows included."""
    import ray.data as rd

    from pic2vec_ray.temporal.join import hash_join

    left, right = null_key_frames
    l, r = rd.from_pandas(left), rd.from_pandas(right)

    inner = hash_join(l, r, on="k", how="inner", num_partitions=4).to_pandas()
    assert sorted(inner.lv) == [10]

    lj = hash_join(l, r, on="k", how="left", num_partitions=4).to_pandas()
    assert sorted(lj.lv) == [10, 20, 30, 40]
    matched = lj.set_index("lv").rv
    assert matched[10] == 100
    assert matched[[20, 30, 40]].isna().all()

    semi = hash_join(l, r, on="k", how="semi", num_partitions=4).to_pandas()
    assert sorted(semi.lv) == [10]

    anti = hash_join(l, r, on="k", how="anti", num_partitions=4).to_pandas()
    assert sorted(anti.lv) == [20, 30, 40]


def test_hash_join_null_keys_match_duckdb(ray_session, null_key_frames):
    import duckdb
    import ray.data as rd

    from pic2vec_ray.temporal.join import hash_join

    left, right = null_key_frames
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    sqls = {
        "inner": "SELECT l.lv FROM l JOIN r ON l.k = r.k",
        "left": "SELECT l.lv FROM l LEFT JOIN r ON l.k = r.k",
        "semi": "SELECT l.lv FROM l WHERE EXISTS (SELECT 1 FROM r WHERE l.k = r.k)",
        "anti": "SELECT l.lv FROM l WHERE NOT EXISTS (SELECT 1 FROM r WHERE l.k = r.k)",
    }
    for how, sql in sqls.items():
        got = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                        on="k", how=how, num_partitions=4).to_pandas()
        want = con.execute(sql).df()
        assert sorted(got.lv) == sorted(want.lv), how


def test_url_fetcher_rejects_non_http_schemes(tmp_path):
    from pic2vec_ray.sources.fetch import UrlFetcher

    secret = tmp_path / "secret.txt"
    secret.write_text("do not exfiltrate")
    f = UrlFetcher(max_retries=0)
    assert f._fetch_one(f"file://{secret}") == b""
    assert f._fetch_one("ftp://example.invalid/x") == b""
    assert f.failed == 2


def test_lsh_planes_cached_per_process():
    from pic2vec_ray.stages.dedup import _lsh_planes

    a = _lsh_planes(42, 64, 128)
    b = _lsh_planes(42, 64, 128)
    assert a is b  # same object: built once, not per batch
    c = _lsh_planes(43, 64, 128)
    assert not np.array_equal(a, c)


def test_distributed_ingest_relative_directory(ray_session, tmp_path, monkeypatch):
    """image_id must be the directory-relative name even when the input
    directory is given as a relative path (Ray echoes absolutized
    paths)."""
    from pic2vec_ray.codecs.png import encode_png
    from pic2vec_ray.sources.ingest import ingest_images, ingest_images_distributed

    rng = np.random.default_rng(7)
    for name in ("a1.png", "a2.png"):
        img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
        (tmp_path / name).write_bytes(encode_png(img))
    monkeypatch.chdir(tmp_path.parent)
    rel = tmp_path.name
    got = ingest_images_distributed(rel).to_pandas().sort_values("image_id")
    want = ingest_images(rel).to_pandas().sort_values("image_id")
    assert list(got.image_id) == ["a1.png", "a2.png"]
    assert list(got.image_id) == list(want.image_id)
    assert list(got.phash) == list(want.phash)
