"""URL-fetch source (SURVEY.md §2.1 S4).

The reference retrieves CSV-listed image URLs with ``urlretrieve`` and
maps any fetch failure to the zero-tensor missing row
(``/root/reference/pic2vec/feature_preprocessing.py:311-323``). Here
the fetch is a bounded-concurrency ACTOR-POOL ``map_batches`` stage:
each actor holds a reusable opener (state in ``__init__``), fetches its
batch's URLs with per-URL retries + timeout, and emits a ``bytes``
column — failed rows get empty bytes, which the decode stage turns into
the reference's zero-features + ``missing=True`` semantics. Concurrency
is bounded by the ACTOR POOL size (``concurrency=N`` × one in-flight
request per actor), so a million-URL corpus cannot stampede the origin;
at 100 TB scale the pool size is the politeness knob and rows stream
through with backpressure like any other stage.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa


class UrlFetcher:
    """Actor: url column → bytes column (b'' on failure, never a raise)."""

    def __init__(self, url_col: str = "url", bytes_col: str = "bytes",
                 timeout: float = 5.0, max_retries: int = 2,
                 retry_backoff: float = 0.2, max_bytes: int = 64 << 20):
        import urllib.request

        self.url_col = url_col
        self.bytes_col = bytes_col
        self.timeout = timeout
        self.max_retries = max_retries
        self.retry_backoff = retry_backoff
        self.max_bytes = max_bytes
        self.opener = urllib.request.build_opener()
        self.fetched = 0
        self.failed = 0

    def _fetch_one(self, url: str) -> bytes:
        if not url:
            return b""
        # urllib's default opener also accepts file:// and ftp:// — a
        # hostile CSV row like file:///etc/passwd would silently read
        # local files into the dataset. Only http(s) is a URL source;
        # anything else is a missing row, same as a failed fetch.
        from urllib.parse import urlparse

        if urlparse(url).scheme not in ("http", "https"):
            self.failed += 1
            return b""
        for attempt in range(self.max_retries + 1):
            try:
                with self.opener.open(url, timeout=self.timeout) as resp:
                    data = resp.read(self.max_bytes + 1)
                if len(data) > self.max_bytes:
                    raise IOError(f"response exceeds max_bytes={self.max_bytes}")
                self.fetched += 1
                return data
            except Exception:
                if attempt < self.max_retries:
                    time.sleep(self.retry_backoff * (2 ** attempt))
        self.failed += 1
        return b""  # reference semantics: fetch failure → missing row

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch[self.url_col].to_pylist()
        payloads = [self._fetch_one(u or "") for u in urls]
        return batch.append_column(self.bytes_col, pa.array(payloads, pa.binary()))


def fetch_url_bytes(ds, *, url_col: str = "url", bytes_col: str = "bytes",
                    concurrency: int = 4, batch_size: int = 32,
                    timeout: float = 5.0, max_retries: int = 2):
    """Attach a fetched ``bytes`` column to a Dataset of URLs."""
    return ds.map_batches(
        UrlFetcher,
        fn_constructor_kwargs=dict(url_col=url_col, bytes_col=bytes_col,
                                   timeout=timeout, max_retries=max_retries),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def ingest_image_urls(urls: list[str], captions: list[str] | None = None,
                      concurrency: int = 4, **fetch_kwargs):
    """S4 ingest: URL work-list → the canonical input_hint table shape
    (image_id = the URL string, bytes fetched, w/h/fmt/phash probed
    from content — same metadata probe as the directory source)."""
    import ray.data as rd

    from ..codecs.registry import DecodeError, decode_image, sniff_format
    from ..functions.image_ops import average_hash

    caps = captions if captions is not None else [""] * len(urls)
    if len(caps) != len(urls):
        raise ValueError("captions length must match urls length")
    base = rd.from_arrow(pa.table({"image_id": pa.array(urls, pa.string()),
                                   "caption": pa.array(caps, pa.string())}))
    fetched = fetch_url_bytes(base, url_col="image_id", bytes_col="bytes",
                              concurrency=concurrency, **fetch_kwargs)

    def probe(t: pa.Table) -> pa.Table:
        ws, hs, fmts, hashes = [], [], [], []
        for data in t["bytes"].to_pylist():
            data = bytes(data or b"")
            fmt = sniff_format(data[:8]) or "" if data else ""
            w = h = 0
            ph = 0
            if data:
                try:
                    img = decode_image(data)
                    h, w = img.shape[:2]
                    ph = average_hash(img)
                except (DecodeError, Exception):
                    pass
            ws.append(w)
            hs.append(h)
            fmts.append(fmt)
            hashes.append(ph)
        return pa.table({
            "image_id": t["image_id"],
            "bytes": t["bytes"],
            "w": pa.array(np.array(ws, dtype=np.int32)),
            "h": pa.array(np.array(hs, dtype=np.int32)),
            "fmt": pa.array(fmts, pa.string()),
            "caption": t["caption"],
            "phash": pa.array(np.array(hashes, dtype=np.int64)),
        })

    return fetched.map_batches(probe, batch_format="pyarrow")
