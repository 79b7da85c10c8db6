"""Sharded-tar (webdataset-style) source/sink: roundtrip + semantics.

The reference has no tar source (it ingests loose dirs / CSV+dir,
``/root/reference/pic2vec/data_featurizing.py``); this is the
100 TB-scale ingest format the engine adds. Checks: byte-exact
roundtrip against the parquet images table, shard-level parallelism
unit, fixed schema with nulls for absent modalities, fmt recovery from
member extensions."""

import io
import os
import tarfile

import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"

EXTS = {"png": "bytes", "bmp": "bytes", "jpeg": "bytes", "gif": "bytes",
        "txt": "caption"}


@pytest.fixture(scope="module")
def shard_dir(ray_session):
    from pic2vec_ray.fixtures.synth import tar_shards_path

    return tar_shards_path(SF)


def _read_rows(shard_dir):
    from pic2vec_ray.sources.tarshard import read_tar_shards

    ds = read_tar_shards(shard_dir, EXTS, key_col="image_id",
                         text_cols={"caption"}, ext_col_for="bytes")
    return {r["image_id"]: r for r in ds.take_all()}


def test_roundtrip_matches_parquet_table(ray_session, shard_dir):
    import ray.data as rd

    from pic2vec_ray.fixtures.synth import images_table_path

    src = {r["image_id"]: r
           for r in rd.read_parquet(images_table_path(SF)).take_all()}
    got = _read_rows(shard_dir)
    assert set(got) == set(src)
    for k, row in got.items():
        assert row["bytes"] == src[k]["bytes"], k
        assert row["caption"] == src[k]["caption"], k
        assert row["fmt"] == src[k]["fmt"], k  # ext carries the codec


def test_shards_are_real_tars_and_parallel_units(shard_dir):
    shards = [f for f in os.listdir(shard_dir) if f.endswith(".tar")]
    assert len(shards) > 1  # >1 shard ⇒ >1 independent read task
    with tarfile.open(os.path.join(shard_dir, shards[0])) as tf:
        names = tf.getnames()
    assert any(n.endswith(".txt") for n in names)


def test_missing_modality_yields_typed_null(ray_session, tmp_path):
    from pic2vec_ray.sources.tarshard import read_tar_shards

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in [("a.png", b"\x89PNG"), ("a.txt", b"cap-a"),
                           ("b.png", b"\x89PNG2")]:  # b has no caption
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    p = tmp_path / "shard-0.tar"
    p.write_bytes(buf.getvalue())
    ds = read_tar_shards(str(tmp_path), EXTS, key_col="image_id",
                         text_cols={"caption"})
    rows = {r["image_id"]: r for r in ds.take_all()}
    assert rows["b"]["caption"] is None
    assert rows["a"]["caption"] == "cap-a"
    t_out = ds.take_batch(batch_format="pyarrow")
    assert t_out.schema.field("caption").type == pa.string()
    assert t_out.schema.field("bytes").type == pa.binary()


def test_writer_is_idempotent_and_atomic(ray_session, tmp_path):
    import ray.data as rd

    from pic2vec_ray.sources.tarshard import read_tar_shards, write_tar_shards

    t = pa.table({"image_id": [f"k{i}" for i in range(10)],
                  "bytes": [bytes([i]) * 3 for i in range(10)],
                  "fmt": ["png"] * 10,
                  "caption": [f"c{i}" for i in range(10)]})
    out = str(tmp_path / "shards")
    paths1 = write_tar_shards(rd.from_arrow(t), out, key_col="image_id",
                              columns={"bytes": None, "caption": "txt"},
                              rows_per_shard=4)
    paths2 = write_tar_shards(rd.from_arrow(t), out, key_col="image_id",
                              columns={"bytes": None, "caption": "txt"},
                              rows_per_shard=4)
    assert paths1 == paths2  # re-run overwrites, never duplicates
    rows = {r["image_id"]: r for r in read_tar_shards(
        out, EXTS, key_col="image_id", text_cols={"caption"}).take_all()}
    assert len(rows) == 10 and rows["k3"]["bytes"] == b"\x03\x03\x03"
