"""Resume-from-checkpoint tests (FIXTURES.md invariant 6)."""

from __future__ import annotations

import json
import os
import shutil

import pyarrow.parquet as pq
import pytest

from pic2vec_ray.state.checkpoint import manifest_path, run_partitioned

OUT = "/tmp/pic2vec_ray_test_ckpt"


def _pipeline(ds):
    from pic2vec_ray.stages.embed import EmbedActor

    return ds.map_batches(
        EmbedActor,
        fn_constructor_kwargs=dict(model_str="tinynet", depth=1),
        batch_format="pyarrow",
        batch_size=64,
        concurrency=2,
    )


def _read_all(out_dir):
    import pandas as pd

    parts = sorted(d for d in os.listdir(out_dir) if d.startswith("part=") and not d.endswith("json"))
    dfs = [pq.read_table(os.path.join(out_dir, p)).to_pandas() for p in parts]
    return pd.concat(dfs, ignore_index=True).sort_values("image_id").reset_index(drop=True)


@pytest.fixture(scope="module")
def first_run(ray_session, images_dir):
    shutil.rmtree(OUT, ignore_errors=True)
    summary = run_partitioned(images_dir, OUT, _pipeline, num_partitions=4)
    return summary


def test_first_run_completes(first_run):
    assert first_run["skipped"] == []
    assert len(first_run["ran"]) == first_run["num_partitions"]
    for k in first_run["ran"]:
        m = json.load(open(manifest_path(OUT, k)))
        assert m["rows"] > 0 and m["engine_version"]


def test_rerun_skips_everything(ray_session, images_dir, first_run):
    summary = run_partitioned(images_dir, OUT, _pipeline, num_partitions=4)
    assert summary["ran"] == []
    assert len(summary["skipped"]) == first_run["num_partitions"]


def test_resume_recomputes_only_missing(ray_session, images_dir, first_run):
    before = _read_all(OUT)
    # simulate a lost partition: delete its data + manifest
    k = first_run["ran"][-1]
    shutil.rmtree(os.path.join(OUT, f"part={k}"))
    os.remove(manifest_path(OUT, k))
    summary = run_partitioned(images_dir, OUT, _pipeline, num_partitions=4)
    assert summary["ran"] == [k]
    after = _read_all(OUT)
    assert before.image_id.tolist() == after.image_id.tolist()
    # features byte-identical after resume
    import numpy as np

    for a, b in zip(before.features, after.features):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_stale_manifest_triggers_recompute(ray_session, images_dir, first_run):
    k1 = first_run["ran"][0]
    m = json.load(open(manifest_path(OUT, k1)))
    m["engine_version"] = "other-engine-9.9"
    json.dump(m, open(manifest_path(OUT, k1), "w"))
    summary = run_partitioned(images_dir, OUT, _pipeline, num_partitions=4)
    assert summary["ran"] == [k1]
