"""Deterministic synthetic image-table generator.

``BASELINE.json`` ``input_hint`` fixes the engine's input table shape:
``(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64)``. No external data exists in this
sandbox, so the table is synthesized deterministically FROM the
driver-provided ``part`` parquet table: one image per part row, keyed
by ``p_partkey``, caption = ``p_name`` (which makes caption
byte-equality and decoded-dimension checks expressible as DuckDB oracle
SQL over the registered ``part`` view).

Row roles mirror the reference's fixture corpus
(``/root/reference/tests/feature_preprocessing_testing/test_images/``:
valid bmp/png, an invalid ``heidegger.gif``, blank and duplicate CSV
rows — see SURVEY.md §5). Role is ``p_partkey % 20``:

==== =======================================================
role meaning
==== =======================================================
0-14 valid image (cs % 3: 0→png, 1→bmp, 2→jpeg — all three
     whitelisted formats, jpeg via the from-scratch baseline
     codec in ``codecs/jpeg.py``)
12,13 exact-duplicate pair: role 13 reuses role 12's content
15   grayscale-source PNG (single channel)
16   all-black valid image (pixel-derived "missing" rule)
17   invalid format: GIF bytes (whitelist rejection)
18   empty bytes (missing placeholder → zeros + missing=True)
19   undecodable garbage bytes (decode-failure path)
==== =======================================================

Valid-row dimensions follow a closed-form rule so oracle SQL can
recompute them:  ``w = 64 + (cs % 4) * 16``, ``h = 64 + (cs % 3) * 32``
with content-seed ``cs = p_partkey - 1`` if role==13 else ``p_partkey``.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa

from ..codecs.bmp import encode_bmp
from ..codecs.jpeg import encode_jpeg
from ..codecs.png import encode_png
from ..functions.image_ops import average_hash

SEED = 5102020  # reference tests pin this seed (tests/test_feature_preprocessing.py:20)
GENERATOR_VERSION = "v5"  # bump on ANY change to row rules/content/layout → invalidates caches (v5: pinned file count)
JPEG_QUALITY = 60  # real-decoder rows; q60 halves Huffman symbols vs q80

IMAGES_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)


def content_seed(partkey: int) -> int:
    return partkey - 1 if partkey % 20 == 13 else partkey


def valid_dims(cs: int) -> tuple[int, int]:
    return 64 + (cs % 4) * 16, 64 + (cs % 3) * 32  # (w, h)


def render_pixels(cs: int, w: int, h: int, *, black: bool = False, gray: bool = False) -> np.ndarray:
    """Deterministic gradient+noise image for content-seed ``cs``."""
    if black:
        return np.zeros((h, w, 3), dtype=np.uint8)
    rng = np.random.default_rng(SEED + cs)
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 255) // max(w - 1, 1) + (yy * 131) // max(h - 1, 1)) % 256
    noise = rng.integers(0, 64, size=(h, w, 3), dtype=np.int64)
    img = (base[:, :, None] + noise) % 256
    img = img.astype(np.uint8)
    if gray:
        return img[:, :, :1]
    return img


def make_image_row(partkey: int, caption: str) -> dict:
    """Build one image-table row; pure function of (partkey, caption)."""
    role = partkey % 20
    cs = content_seed(partkey)
    image_id = f"img_{partkey:08d}"
    if role == 17:  # invalid GIF (mirrors heidegger.gif)
        data = b"GIF89a" + bytes(np.random.default_rng(SEED + cs).integers(0, 256, 64, dtype=np.uint8))
        return dict(image_id=image_id, bytes=data, w=0, h=0, fmt="gif", caption=caption, phash=0)
    if role == 18:  # empty placeholder
        return dict(image_id=image_id, bytes=b"", w=0, h=0, fmt="png", caption=caption, phash=0)
    if role == 19:  # garbage claiming to be png
        data = b"\x89PNG\r\n\x1a\n" + bytes(np.random.default_rng(SEED + cs).integers(0, 256, 128, dtype=np.uint8))
        return dict(image_id=image_id, bytes=data, w=0, h=0, fmt="png", caption=caption, phash=0)
    w, h = valid_dims(cs)
    black = role == 16
    gray = role == 15
    px = render_pixels(cs, w, h, black=black, gray=gray)
    if gray:
        data, fmt = encode_png(px), "png"
    elif cs % 3 == 0:
        data, fmt = encode_png(px), "png"
    elif cs % 3 == 1:
        data, fmt = encode_bmp(px), "bmp"
    else:
        # every 20th jpeg row is PROGRESSIVE (cs%60==5 ⊂ cs%3==2) — the
        # SOF2 path decodes bit-identically, so dims/feature goldens are
        # untouched while the corpus exercises both entropy layouts
        prog = cs % 60 == 5
        data, fmt = encode_jpeg(px, quality=JPEG_QUALITY, progressive=prog), "jpeg"
    return dict(
        image_id=image_id, bytes=data, w=w, h=h, fmt=fmt, caption=caption,
        phash=average_hash(px),
    )


def _rows_to_table(keys: np.ndarray, captions: list[str]) -> pa.Table:
    rows = [make_image_row(int(k), c) for k, c in zip(keys, captions)]
    cols = {name: [r[name] for r in rows] for name in IMAGES_SCHEMA.names}
    return pa.table(cols, schema=IMAGES_SCHEMA)


def synth_images_batch(batch: pa.Table) -> pa.Table:
    """map_batches UDF: part rows (p_partkey, p_name) → image rows."""
    return _rows_to_table(
        batch["p_partkey"].to_numpy(zero_copy_only=False),
        batch["p_name"].to_pylist(),
    )


def images_table_path(sf_dir: str, cache_root: str = "/tmp/pic2vec_ray_cache") -> str:
    """Build (or reuse) the synthetic images parquet for ``sf_dir``.

    Generation runs distributed via Ray Data map_batches over the part
    table and writes partitioned parquet; cached by sf_dir so repeated
    test/bench runs skip the encode work.
    """
    import ray.data as rd

    tag = hashlib.sha1(f"{sf_dir}:{GENERATOR_VERSION}".encode()).hexdigest()[:12]
    out_dir = os.path.join(cache_root, f"images_{tag}")
    done = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(done):
        return out_dir
    part = rd.read_parquet(os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_name"])
    ds = part.map_batches(synth_images_batch, batch_format="pyarrow", batch_size=512)
    # Pin the output FILE COUNT: write_parquet emits one file per block
    # and the block count follows the session's parallelism, so a cache
    # built under a 4-CPU session would have 3 files where a 32-CPU one
    # has 32 — and downstream consumers that partition work by input
    # file (state/checkpoint.run_partitioned, tests) would silently
    # change shape depending on WHO built the cache first. One fixed
    # repartition (row-content is per-key deterministic, so layout is
    # the only degree of freedom) makes the fixture reproducible.
    ds = ds.repartition(max(8, min(32, part.count() // 2048)))
    tmp = out_dir + ".tmp"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(out_dir, ignore_errors=True)
    ds.write_parquet(tmp)
    os.rename(tmp, out_dir)
    with open(done, "w") as f:
        f.write("ok\n")
    return out_dir


def make_feature_events(sf_dir: str, max_versions: int = 3) -> pa.Table:
    """Timestamped feature-availability table (image_id, feature_ts).

    1–3 versions per image with a deterministic per-entity clock, used
    by the temporal-layer pytest oracles (FIXTURES.md T3).
    """
    import pyarrow.parquet as pq

    part = pq.read_table(os.path.join(sf_dir, "part.parquet"), columns=["p_partkey"])
    keys = part["p_partkey"].to_numpy()
    ids, tss = [], []
    base = np.datetime64("2024-01-01T00:00:00", "us")
    for k in keys:
        k = int(k)
        n = 1 + (k % max_versions)
        for v in range(n):
            ids.append(f"img_{k:08d}")
            tss.append(base + np.timedelta64((k % 97) * 3600 + v * 7200, "s"))
    return pa.table(
        {"image_id": ids, "feature_ts": pa.array(tss, type=pa.timestamp("us"))}
    )


# ---------------------------------------------------------------- audio

AUDIO_SR = 16000
AUDIO_N = 4096
AUDIO_FRAME = 512
AUDIO_BANDS = 16


def audio_band_center_freq(band: int) -> float:
    """Center frequency of FFT band ``band`` under the AudioFeatureActor
    layout (rfft of AUDIO_FRAME → 257 bins, array_split into 16 bands):
    tones at these centers land their band-energy argmax in ``band``
    by construction."""
    bins = AUDIO_FRAME // 2 + 1
    center_bin = (band + 0.5) * bins / AUDIO_BANDS
    return center_bin * AUDIO_SR / AUDIO_FRAME


def make_audio_row(partkey: int) -> dict:
    """One audio-table row; role = partkey % 10:

    8 → undecodable garbage bytes, 9 → empty bytes (both: missing);
    else a pure tone centered in band ``partkey % 16`` — so the
    dominant band is closed-form SQL-predictable from ``part``.
    """
    from ..codecs.wav import encode_wav

    role = partkey % 10
    clip_id = f"clip_{partkey:08d}"
    if role == 9:
        return dict(clip_id=clip_id, bytes=b"", sample_rate=AUDIO_SR,
                    n_samples=0, fmt="wav")
    if role == 8:
        rng = np.random.default_rng(SEED + partkey)
        return dict(clip_id=clip_id,
                    bytes=bytes(rng.integers(0, 256, 128, dtype=np.uint8)),
                    sample_rate=AUDIO_SR, n_samples=0, fmt="wav")
    band = partkey % AUDIO_BANDS
    t = np.arange(AUDIO_N) / AUDIO_SR
    tone = 0.5 * np.sin(2 * np.pi * audio_band_center_freq(band) * t)
    return dict(clip_id=clip_id, bytes=encode_wav(tone, AUDIO_SR, fmt="s16"),
                sample_rate=AUDIO_SR, n_samples=AUDIO_N, fmt="wav")


AUDIO_SCHEMA = pa.schema([
    ("clip_id", pa.string()),
    ("bytes", pa.binary()),
    ("sample_rate", pa.int32()),
    ("n_samples", pa.int32()),
    ("fmt", pa.string()),
])


def synth_audio_batch(batch: pa.Table) -> pa.Table:
    rows = [make_audio_row(int(k))
            for k in batch["p_partkey"].to_numpy(zero_copy_only=False)]
    cols = {name: [r[name] for r in rows] for name in AUDIO_SCHEMA.names}
    return pa.table(cols, schema=AUDIO_SCHEMA)


def audio_table_path(sf_dir: str, cache_root: str = "/tmp/pic2vec_ray_cache") -> str:
    """Build (or reuse) the synthetic audio parquet for ``sf_dir`` —
    same distributed generate-and-cache shape as images_table_path."""
    import ray.data as rd

    tag = hashlib.sha1(f"audio:{sf_dir}:{GENERATOR_VERSION}".encode()).hexdigest()[:12]
    out_dir = os.path.join(cache_root, f"audio_{tag}")
    done = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(done):
        return out_dir
    part = rd.read_parquet(os.path.join(sf_dir, "part.parquet"), columns=["p_partkey"])
    ds = part.map_batches(synth_audio_batch, batch_format="pyarrow", batch_size=512)
    tmp = out_dir + ".tmp"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(out_dir, ignore_errors=True)
    ds.write_parquet(tmp)
    os.rename(tmp, out_dir)
    with open(done, "w") as f:
        f.write("ok\n")
    return out_dir


# ---------------------------------------------------------------- video

VIDEO_W, VIDEO_H = 32, 24
VIDEO_FRAMES = 8
VIDEO_FPS = 10.0
VIDEO_QUALITY = 90  # q90 → luma qt[0] == 3 → grays 128+3m roundtrip exactly
VIDEO_GRAY_MOD = 85  # m ∈ [-42, 42] keeps 128+3m inside [2, 254]


def video_frame_gray(partkey: int, frame: int) -> int:
    """Solid-gray value of frame ``frame`` of clip ``partkey``.

    Grays are ``128 + 3m``: at JPEG quality 90 the luma quantizer's DC
    step is 3, so a solid block's single DC coefficient quantizes and
    reconstructs EXACTLY (8·3m/3 = 8m, 8m·3/8 = 3m) — the decoded frame
    is bit-identical to the source, which makes per-clip intensity
    stats closed-form SQL over ``part``.
    """
    m = (partkey * 7 + frame) % VIDEO_GRAY_MOD - 42
    return 128 + 3 * m


def make_video_row(partkey: int) -> dict:
    """One video-table row; role = partkey % 10:

    8 → undecodable garbage bytes, 9 → empty bytes (both: missing);
    else an 8-frame MJPEG/AVI of solid-gray frames whose values follow
    :func:`video_frame_gray` — decode-exact, so frame stats are
    SQL-predictable from ``part``.
    """
    from ..codecs.avi import encode_avi_mjpeg

    role = partkey % 10
    clip_id = f"vid_{partkey:08d}"
    if role == 9:
        return dict(clip_id=clip_id, bytes=b"", w=0, h=0, n_frames=0,
                    fps=0.0, fmt="avi")
    if role == 8:
        rng = np.random.default_rng(SEED + partkey)
        return dict(clip_id=clip_id,
                    bytes=bytes(rng.integers(0, 256, 128, dtype=np.uint8)),
                    w=0, h=0, n_frames=0, fps=0.0, fmt="avi")
    frames = np.stack([
        np.full((VIDEO_H, VIDEO_W), video_frame_gray(partkey, f), dtype=np.uint8)
        for f in range(VIDEO_FRAMES)
    ])
    data = encode_avi_mjpeg(frames, fps=VIDEO_FPS, quality=VIDEO_QUALITY)
    return dict(clip_id=clip_id, bytes=data, w=VIDEO_W, h=VIDEO_H,
                n_frames=VIDEO_FRAMES, fps=VIDEO_FPS, fmt="avi")


VIDEO_SCHEMA = pa.schema([
    ("clip_id", pa.string()),
    ("bytes", pa.binary()),
    ("w", pa.int32()),
    ("h", pa.int32()),
    ("n_frames", pa.int32()),
    ("fps", pa.float64()),
    ("fmt", pa.string()),
])


def synth_video_batch(batch: pa.Table) -> pa.Table:
    rows = [make_video_row(int(k))
            for k in batch["p_partkey"].to_numpy(zero_copy_only=False)]
    cols = {name: [r[name] for r in rows] for name in VIDEO_SCHEMA.names}
    return pa.table(cols, schema=VIDEO_SCHEMA)


def video_table_path(sf_dir: str, cache_root: str = "/tmp/pic2vec_ray_cache") -> str:
    """Build (or reuse) the synthetic video parquet for ``sf_dir`` —
    same distributed generate-and-cache shape as images_table_path."""
    import ray.data as rd

    tag = hashlib.sha1(f"video:{sf_dir}:{GENERATOR_VERSION}".encode()).hexdigest()[:12]
    out_dir = os.path.join(cache_root, f"video_{tag}")
    done = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(done):
        return out_dir
    part = rd.read_parquet(os.path.join(sf_dir, "part.parquet"), columns=["p_partkey"])
    ds = part.map_batches(synth_video_batch, batch_format="pyarrow", batch_size=512)
    tmp = out_dir + ".tmp"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(out_dir, ignore_errors=True)
    ds.write_parquet(tmp)
    os.rename(tmp, out_dir)
    with open(done, "w") as f:
        f.write("ok\n")
    return out_dir


def tar_shards_path(sf_dir: str, cache_root: str = "/tmp/pic2vec_ray_cache") -> str:
    """Build (or reuse) the images corpus as webdataset-style tar shards.

    Repackages the synthetic images table through
    ``sources.tarshard.write_tar_shards`` (image bytes under the row's
    own ``fmt`` extension, caption as ``.txt``) so the tar source can be
    driven against the SAME closed-form part-table oracles as the
    parquet path.
    """
    import ray.data as rd

    from ..sources.tarshard import write_tar_shards

    rows_per_shard = 64  # sf0.001 (~200 imgs) → ~4 shards; sf0.1 → ~300
    tag = hashlib.sha1(
        f"tar:{sf_dir}:{GENERATOR_VERSION}:{rows_per_shard}".encode()
    ).hexdigest()[:12]
    out_dir = os.path.join(cache_root, f"tar_{tag}")
    done = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(done):
        return out_dir
    images = rd.read_parquet(images_table_path(sf_dir, cache_root),
                             columns=["image_id", "bytes", "fmt", "caption"])
    tmp = out_dir + ".tmp"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(out_dir, ignore_errors=True)
    write_tar_shards(images, tmp, key_col="image_id",
                     columns={"bytes": None, "caption": "txt"},
                     rows_per_shard=rows_per_shard)
    os.rename(tmp, out_dir)
    with open(done, "w") as f:
        f.write("ok\n")
    return out_dir
