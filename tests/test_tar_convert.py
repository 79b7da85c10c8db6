"""Resumable tar→parquet conversion: atomicity, skip-on-resume, and
byte-identical content vs a one-shot conversion."""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pyarrow.dataset as pads
import pytest


EXTS = {"png": "bytes", "bmp": "bytes", "jpeg": "bytes", "gif": "bytes",
        "txt": "caption"}


def _read_all(out_dir: str) -> pd.DataFrame:
    df = pads.dataset(out_dir, format="parquet").to_table().to_pandas()
    return df.sort_values("image_id").reset_index(drop=True)


@pytest.fixture(scope="module")
def shards_dir(ray_session):
    from pic2vec_ray.fixtures.synth import tar_shards_path

    return tar_shards_path("/root/testdata/sf0.001")


def test_convert_full_then_resume_identical(ray_session, shards_dir, tmp_path):
    from pic2vec_ray.sources.tarshard import convert_tar_shards_to_parquet

    a = str(tmp_path / "a")
    man = (convert_tar_shards_to_parquet(shards_dir, a, EXTS,
                                         key_col="image_id",
                                         text_cols={"caption"},
                                         ext_col_for="bytes")
           .to_pandas())
    assert not man.skipped.any()
    assert man.rows.sum() == len(_read_all(a))

    # partial run: fault-inject after some shards have converted
    b = str(tmp_path / "b")
    shard_files = sorted(f for f in os.listdir(shards_dir)
                         if f.endswith(".tar"))
    allowed = {os.path.join(shards_dir, f) for f in shard_files[:2]}

    def bomb(shard: str) -> None:
        if shard not in allowed:
            raise RuntimeError("simulated mid-conversion crash")

    with pytest.raises(Exception):
        (convert_tar_shards_to_parquet(shards_dir, b, EXTS,
                                       key_col="image_id",
                                       text_cols={"caption"},
                                       ext_col_for="bytes", on_shard=bomb)
         .materialize())
    done_before = {f for f in os.listdir(b) if f.endswith(".parquet")}
    assert len(done_before) < len(shard_files)
    # no torn outputs: every file present is a complete shard
    assert not [f for f in os.listdir(b) if ".tmp" in f]

    # resume: finished shards are skipped, the rest convert
    man2 = (convert_tar_shards_to_parquet(shards_dir, b, EXTS,
                                          key_col="image_id",
                                          text_cols={"caption"},
                                          ext_col_for="bytes")
            .to_pandas())
    by_name = {os.path.basename(o): s
               for o, s in zip(man2.output, man2.skipped)}
    assert all(by_name[f] for f in done_before)  # previously done → skipped
    assert not man2.skipped.all()

    pd.testing.assert_frame_equal(_read_all(a), _read_all(b))


def test_convert_noop_when_all_done(ray_session, shards_dir, tmp_path):
    from pic2vec_ray.sources.tarshard import convert_tar_shards_to_parquet

    out = str(tmp_path / "c")
    convert_tar_shards_to_parquet(shards_dir, out, EXTS, key_col="image_id",
                                  text_cols={"caption"},
                                  ext_col_for="bytes").materialize()
    snapshot = {f: os.path.getmtime(os.path.join(out, f))
                for f in os.listdir(out)}
    man = (convert_tar_shards_to_parquet(shards_dir, out, EXTS,
                                         key_col="image_id",
                                         text_cols={"caption"},
                                         ext_col_for="bytes")
           .to_pandas())
    assert man.skipped.all()
    after = {f: os.path.getmtime(os.path.join(out, f))
             for f in os.listdir(out)}
    assert snapshot == after  # untouched on the no-op rerun
