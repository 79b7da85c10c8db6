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


_KILL_SCRIPT = r"""
import os, sys
import ray

ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False

sys.path.insert(0, {repo!r})
from pic2vec_ray.state.checkpoint import run_partitioned

calls = {{"n": 0}}

def pipeline(ds):
    from pic2vec_ray.stages.embed import EmbedActor

    calls["n"] += 1
    if calls["n"] == 3:  # partition index 2: die MID-RUN, hard
        # leave mid-write debris a resume must also survive
        os.makedirs(os.path.join({out!r}, "part=2.tmp"), exist_ok=True)
        open(os.path.join({out!r}, "part=2.tmp", "junk.parquet"), "wb").write(b"x")
        os._exit(17)
    return ds.map_batches(
        EmbedActor,
        fn_constructor_kwargs=dict(model_str="tinynet", depth=1),
        batch_format="pyarrow", batch_size=64, concurrency=2)

run_partitioned({inp!r}, {out!r}, pipeline, num_partitions=4)
"""


def test_kill_and_resume_featurize_sf01(ray_session, tmp_path):
    """VERDICT r02 #8: hard-kill (os._exit, taking its whole Ray session
    with it) the actual featurize pipeline mid-run at partition 2 of 4
    on the sf0.01 corpus, resume, and get a table identical to an
    uninterrupted run — with the manifests proving the completed
    partitions were skipped."""
    import subprocess
    import sys

    import numpy as np

    from pic2vec_ray.fixtures.synth import images_table_path

    images_dir = images_table_path("/root/testdata/sf0.01")
    out = str(tmp_path / "killed_run")
    script = _KILL_SCRIPT.format(
        repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        inp=images_dir, out=out)
    proc = subprocess.run([sys.executable, "-c", script],
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == 17, proc.stderr[-2000:]
    done_before = sorted(int(f.split("=")[1].split(".")[0])
                         for f in os.listdir(out) if f.endswith(".manifest.json"))
    assert done_before == [0, 1]  # died during partition 2
    assert os.path.isdir(os.path.join(out, "part=2.tmp"))  # the debris

    # resume IN THIS session: skips 0-1, recomputes 2-3, clears debris
    summary = run_partitioned(images_dir, out, _pipeline, num_partitions=4)
    assert summary["skipped"] == [0, 1]
    assert summary["ran"] == [2, 3]
    assert not os.path.isdir(os.path.join(out, "part=2.tmp"))

    fresh_dir = str(tmp_path / "fresh_run")
    run_partitioned(images_dir, fresh_dir, _pipeline, num_partitions=4)
    resumed, fresh = _read_all(out), _read_all(fresh_dir)
    assert resumed.image_id.tolist() == fresh.image_id.tolist()
    assert resumed.missing.tolist() == fresh.missing.tolist()
    for a, b in zip(resumed.features, fresh.features):
        assert np.array_equal(np.asarray(a), np.asarray(b))
