"""Fetch + extract stages for the crawl waves.

Rebuild of the reference's fetch path (SURVEY.md M6/T2/T3,
``utils/article_extractor.py:205-410``) with expensive setup amortized
across batches (the reference rebuilds its HTTP session per record —
SURVEY T2 flags this as waste).

In the sandbox there is no network, so the "web" is a deterministic
simulation backed by the fixture tables (pages / links / images),
broadcast ONCE via ``ray.put`` and index-built ONCE per worker process
(module-global cache keyed by object ref — Ray reuses worker processes
across the per-wave Dataset executions, so wave K+1 pays zero setup).
Against a live web this stage becomes an actor pool holding HTTP sessions
and per-host pacing state; here the politeness state lives in the
FrontierShard actors (virtual clock, see state/frontier.py) so the fetch
stage itself is stateless and runs as plain fused tasks — cheaper than an
actor pool and elastically scheduled.

Error-as-data: non-200 statuses become rows with ``extraction_error`` set
(reference error taxonomy ``article_extractor.py:361-410``); tasks never
throw for a bad URL, so Ray retries only cover real worker death.

Scale notes: payload ``bytes`` enter the stream HERE and flow straight to
the wave sink — they never pass through a shuffle (SURVEY §7.5). Batch
size stays modest (default 256 URLs) because each row can carry KBs of
payload; the knob that matters at 100 TB is
``batch_size x concurrency x mean_payload`` vs worker heap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..oracle import ERROR_MESSAGES

FETCHED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("priority", pa.int64()),
        ("depth", pa.int32()),
        ("status", pa.int32()),
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
        ("content_len", pa.int32()),
        ("extraction_error", pa.string()),
        ("outlinks", pa.list_(pa.string())),
    ]
)


class SimWeb:
    """Indexed view of the simulated web (built once per worker process)."""

    def __init__(self, pages: pa.Table, images: pa.Table, links: pa.Table):
        self.pages_idx = {u: i for i, u in enumerate(pages.column("url").to_pylist())}
        self.images = images
        self.images_idx = {
            im: i for i, im in enumerate(images.column("image_id").to_pylist())
        }
        self.links: dict[str, list[str]] = {}
        for s, d in zip(
            links.column("src_url").to_pylist(), links.column("dst_url").to_pylist()
        ):
            self.links.setdefault(s, []).append(d)
        self.page_status = pages.column("fetch_status").to_numpy()
        self.page_clen = pages.column("content_len").to_numpy()
        self.page_img = pages.column("image_id").to_pylist()


_WEB_CACHE: dict = {}


def get_web(pages_ref, images_ref, links_ref) -> SimWeb:
    key = (pages_ref, images_ref, links_ref)
    web = _WEB_CACHE.get(key)
    if web is None:
        web = SimWeb(ray.get(pages_ref), ray.get(images_ref), ray.get(links_ref))
        _WEB_CACHE.clear()  # at most one world per worker
        _WEB_CACHE[key] = web
    return web


def fetch_batch(batch: pa.Table, web: SimWeb) -> pa.Table:
    urls = batch.column("url").to_pylist()
    n = len(urls)
    status = np.full(n, 404, dtype=np.int32)
    clen = np.zeros(n, dtype=np.int32)
    img_ids: list = [None] * n
    errors: list = [None] * n
    outlinks: list = [[] for _ in range(n)]
    img_rows = np.full(n, -1, dtype=np.int64)

    for i, u in enumerate(urls):
        pi = web.pages_idx.get(u)
        if pi is None:
            errors[i] = "HTTP 404 Not Found"
            continue
        st = int(web.page_status[pi])
        status[i] = st
        if st != 200:
            errors[i] = ERROR_MESSAGES.get(st, f"HTTP {st}")
            continue
        clen[i] = int(web.page_clen[pi])
        img_ids[i] = web.page_img[pi]
        outlinks[i] = web.links.get(u, [])
        img_rows[i] = web.images_idx.get(img_ids[i], -1)

    # payload: take matched image rows once, scatter into null-padded arrays
    have = np.nonzero(img_rows >= 0)[0]
    img_sub = web.images.take(pa.array(img_rows[have])) if len(have) else None

    def scatter(col: str, typ):
        vals: list = [None] * n
        if img_sub is not None:
            sub = img_sub.column(col).to_pylist()
            for j, i in enumerate(have):
                vals[i] = sub[j]
        return pa.array(vals, typ)

    return pa.table(
        {
            "url": batch.column("url"),
            "host": batch.column("host"),
            "priority": batch.column("priority"),
            "depth": batch.column("depth"),
            "status": pa.array(status),
            "image_id": pa.array(img_ids, pa.string()),
            "bytes": scatter("bytes", pa.binary()),
            "w": scatter("w", pa.int32()),
            "h": scatter("h", pa.int32()),
            "fmt": scatter("fmt", pa.string()),
            "caption": scatter("caption", pa.string()),
            "phash": scatter("phash", pa.int64()),
            "content_len": pa.array(clen),
            "extraction_error": pa.array(errors, pa.string()),
            "outlinks": pa.array(outlinks, pa.list_(pa.string())),
        },
        schema=FETCHED_SCHEMA,
    )


def make_fetch_fn(pages_ref, images_ref, links_ref):
    """Task-form fetch stage: worker-global web index, zero per-wave setup."""

    def fetch(batch: pa.Table) -> pa.Table:
        return fetch_batch(batch, get_web(pages_ref, images_ref, links_ref))

    return fetch


class SimFetcher:
    """Actor-pool form of the fetch stage (``map_batches(SimFetcher,
    concurrency=N)``) — the shape a live-web fetcher with per-actor HTTP
    sessions would take. The wave loop uses the fused task form above."""

    def __init__(self, pages_ref, images_ref, links_ref):
        self.web = SimWeb(ray.get(pages_ref), ray.get(images_ref), ray.get(links_ref))

    def __call__(self, batch: pa.Table) -> pa.Table:
        return fetch_batch(batch, self.web)
