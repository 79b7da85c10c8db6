"""S4 URL-fetch source tests against a local HTTP server fixture
(mirrors the reference's urlretrieve path + failure→missing semantics,
feature_preprocessing.py:311-323)."""

from __future__ import annotations

import http.server
import threading

import numpy as np
import pytest

from pic2vec_ray.codecs.jpeg import encode_jpeg
from pic2vec_ray.codecs.png import encode_png


class _Handler(http.server.SimpleHTTPRequestHandler):
    files: dict[str, bytes] = {}
    flaky_hits: dict[str, int] = {}

    def log_message(self, *a):  # quiet
        pass

    def do_GET(self):
        name = self.path.lstrip("/")
        if name.startswith("flaky_"):
            n = _Handler.flaky_hits.get(name, 0)
            _Handler.flaky_hits[name] = n + 1
            if n == 0:  # first attempt fails → retry must recover
                self.send_error(503)
                return
        payload = _Handler.files.get(name)
        if payload is None:
            self.send_error(404)
            return
        self.send_response(200)
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)


@pytest.fixture(scope="module")
def http_fixture():
    rng = np.random.default_rng(3)
    img_png = rng.integers(0, 256, (20, 24, 3), dtype=np.uint8)
    yy, xx = np.mgrid[0:16, 0:16]
    img_jpg = ((xx * 16 + yy * 2) % 256).astype(np.uint8)[:, :, None].repeat(3, axis=2)
    _Handler.files = {
        "a.png": encode_png(img_png),
        "b.jpg": encode_jpeg(img_jpg, quality=90),
        "flaky_c.png": encode_png(img_png),
        "junk.bin": b"this is not an image",
    }
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, img_png
    srv.shutdown()


def test_ingest_image_urls_end_to_end(ray_session, http_fixture):
    from pic2vec_ray.sources.fetch import ingest_image_urls

    base, img_png = http_fixture
    urls = [f"{base}/a.png", f"{base}/b.jpg", f"{base}/flaky_c.png",
            f"{base}/missing.png", f"{base}/junk.bin", ""]
    out = ingest_image_urls(urls, captions=list("abcdef"),
                            concurrency=2).to_pandas()
    out = out.set_index("image_id").reindex(urls[:5] + [""])
    # fetched rows carry real bytes + probed metadata
    assert out.loc[urls[0], "fmt"] == "png"
    assert (out.loc[urls[0], "w"], out.loc[urls[0], "h"]) == (24, 20)
    assert out.loc[urls[1], "fmt"] == "jpeg"
    assert (out.loc[urls[1], "w"], out.loc[urls[1], "h"]) == (16, 16)
    # flaky URL recovered via retry
    assert out.loc[urls[2], "fmt"] == "png"
    assert _Handler.flaky_hits["flaky_c.png"] >= 2
    # 404 / blank → empty bytes (→ missing downstream); junk fetches
    # but fails the content probe
    assert len(out.loc[urls[3], "bytes"]) == 0
    assert len(out.loc["", "bytes"]) == 0
    assert len(out.loc[urls[4], "bytes"]) > 0
    assert out.loc[urls[4], "fmt"] == "" and out.loc[urls[4], "w"] == 0


def test_fetched_urls_featurize_with_missing_semantics(ray_session, http_fixture):
    from pic2vec_ray.pipelines.featurize import featurize_images
    from pic2vec_ray.sources.fetch import ingest_image_urls

    base, _ = http_fixture
    urls = [f"{base}/a.png", f"{base}/missing.png"]
    ds = ingest_image_urls(urls, concurrency=1)
    out = featurize_images(ds, model_str="tinynet", depth=1, batch_size=8,
                           concurrency=1).to_pandas().set_index("image_id")
    assert not out.loc[urls[0], "missing"]
    assert out.loc[urls[1], "missing"]  # fetch failure → zero-features row
    assert len(out.loc[urls[0], "features"]) == 128
