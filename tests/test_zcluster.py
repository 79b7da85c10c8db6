"""Z-order clustered layout: per-file locality, box-query pruning,
and exactness vs a brute-force filter."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _grid(n_side=64, seed=23):
    rng = np.random.default_rng(seed)
    n = n_side * n_side
    return pd.DataFrame({
        "ux": rng.permutation(np.arange(n, dtype=np.int64)) % n_side,
        "uy": rng.permutation(np.arange(n, dtype=np.int64)) % n_side,
        "payload": np.arange(n, dtype=np.int64),
    })


def test_zclustered_box_prunes_and_matches_bruteforce(ray_session, tmp_path):
    import ray.data as rd
    from pic2vec_ray.sources.zcluster import (read_zclustered_box,
                                              write_zclustered)

    df = _grid()
    out = str(tmp_path / "z")
    man = write_zclustered(rd.from_pandas(df).repartition(7), out,
                           x="ux", y="uy", bits=8, rows_per_file=256)
    assert man.rows.sum() == len(df)
    # locality: each file covers a small rectangle, not the whole domain
    spans = (man.max_x - man.min_x + 1) * (man.max_y - man.min_y + 1)
    assert spans.median() <= (64 * 64) / 4

    box = dict(x_range=(10, 17), y_range=(40, 47))
    ds, read, total = read_zclustered_box(out, x=("ux"), y="uy", **box)
    got = ds.to_pandas().sort_values("payload").reset_index(drop=True)
    want = (df[(df.ux.between(10, 17)) & (df.uy.between(40, 47))]
            .sort_values("payload").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[["ux", "uy", "payload"]],
                                  want[["ux", "uy", "payload"]],
                                  check_like=True)
    # the point of the layout: the 1/64-area box reads a small minority
    assert read < total / 2, (read, total)


def test_zclustered_empty_box(ray_session, tmp_path):
    import ray.data as rd
    from pic2vec_ray.sources.zcluster import (read_zclustered_box,
                                              write_zclustered)

    df = _grid(16)
    out = str(tmp_path / "z2")
    write_zclustered(rd.from_pandas(df), out, x="ux", y="uy", bits=4,
                     rows_per_file=64)
    ds, read, total = read_zclustered_box(out, x="ux", y="uy",
                                          x_range=(100, 200),
                                          y_range=(0, 1))
    assert ds is None and read == 0 and total > 0
