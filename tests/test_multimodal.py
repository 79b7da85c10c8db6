"""Audio/video multimodal plumbing tests: the Ray-side contract
(schema, actor pool, batch flow, missing semantics, fixed-size-list
output) is real; only the codec decode is a marked stub."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pic2vec_ray.stages.multimodal import AudioFeatureActor, VideoFrameSampleActor


def _audio_table(n=10):
    rng = np.random.default_rng(3)
    rows = []
    for i in range(n):
        data = b"" if i % 5 == 4 else bytes(rng.integers(0, 256, 256, dtype=np.uint8))
        rows.append((f"clip_{i:04d}", data, 16000, 4096, "wav"))
    return pa.table(
        dict(zip(["clip_id", "bytes", "sample_rate", "n_samples", "fmt"], zip(*rows))),
    )


def _video_table(n=6):
    rng = np.random.default_rng(4)
    rows = []
    for i in range(n):
        data = b"" if i == 3 else bytes(rng.integers(0, 256, 512, dtype=np.uint8))
        rows.append((f"vid_{i:04d}", data, 320, 240, 90, 30.0, "mp4"))
    return pa.table(
        dict(zip(["clip_id", "bytes", "w", "h", "n_frames", "fps", "fmt"], zip(*rows))),
    )


def test_audio_actor_pool_on_ray(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_audio_table(20))
    out = ds.map_batches(AudioFeatureActor,
                         fn_constructor_kwargs=dict(n_bands=16),
                         batch_format="pyarrow", batch_size=8,
                         concurrency=2).to_pandas()
    assert len(out) == 20
    assert all(len(f) == 16 for f in out.features)
    assert out.missing.sum() == 4  # every 5th row has empty bytes
    ok = out[~out.missing]
    assert all(np.asarray(f).sum() > 0 for f in ok.features)


def test_audio_deterministic_and_strict_mode(ray_session):
    a1, a2 = AudioFeatureActor(), AudioFeatureActor()
    t = _audio_table(6)
    f1 = a1(t).to_pandas()
    f2 = a2(t).to_pandas()
    for x, y in zip(f1.features, f2.features):
        assert np.allclose(np.asarray(x), np.asarray(y))
    strict = AudioFeatureActor(decoder="strict")
    with pytest.raises(NotImplementedError, match="audio decode"):
        strict(t)


def test_video_frame_sample_on_ray(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_video_table(6))
    out = ds.map_batches(VideoFrameSampleActor,
                         fn_constructor_kwargs=dict(num_frames=3, model_str="tinynet"),
                         batch_format="pyarrow", batch_size=4,
                         concurrency=1).to_pandas()
    assert len(out) == 6
    assert all(len(f) == 128 for f in out.features)  # real tinynet embed per frame
    assert bool(out.missing.iloc[3]) and out.missing.sum() == 1
    # distinct clips → distinct pooled embeddings
    a, b = np.asarray(out.features.iloc[0]), np.asarray(out.features.iloc[1])
    assert not np.allclose(a, b, atol=1e-3)


def test_video_strict_mode():
    strict = VideoFrameSampleActor(decoder="strict")
    with pytest.raises(NotImplementedError, match="video decode"):
        strict(_video_table(2))
