"""Fetch + extract stages for the crawl waves.

Rebuild of the reference's fetch path (SURVEY.md M6/T2/T3,
``utils/article_extractor.py:205-410``). In the sandbox there is no
network, so the "web" is a deterministic simulation backed by the fixture
tables — encoded as a **numpy/Arrow-native index** (hash-sorted arrays +
offset-encoded adjacency) that is built ONCE on the driver, broadcast via
``ray.put``, and resolved ZERO-COPY per worker (plain ``ray.get`` of numpy
arrays from plasma; no Python dict materialization). This matters for
scaling: per-worker setup cost × worker count × worker churn is pure
serial overhead at N=32+, so worker init must be O(ms), not O(corpus).

``fetch_batch`` is fully vectorized:
  * page lookup  — ``np.searchsorted`` on the 64-bit canonical-URL hash
    (frontier rows CARRY ``url_hash``, computed once at route time)
  * payload      — ``Table.take`` with null-masked indices (null index ->
    null row; no Python scatter loops)
  * out-links    — gather-index build + one ``take`` on the flat dst
    array -> ``ListArray.from_arrays`` (no per-row list building)
Only error-message strings are assembled row-wise, and only for the
(rare) non-200 rows — error-as-record semantics (reference taxonomy
``article_extractor.py:361-410``).

Against a live web this stage becomes an actor pool holding HTTP sessions
(see ``SimFetcher``); politeness state stays in the FrontierShard actors.

Scale notes: payload ``bytes`` enter the stream HERE and flow straight to
the wave sink — they never cross a shuffle (SURVEY §7.5). Batch size
stays modest (default 256 URLs) because rows carry KB-scale payloads.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from ..functions.retry import penalty_ms_batch, retry_plan_batch
from ..functions.urls import url_hash64
from ..oracle import ERROR_MESSAGES

FETCHED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("url_hash", pa.int64()),
        ("priority", pa.int64()),
        ("depth", pa.int32()),
        ("status", pa.int32()),
        ("n_attempts", pa.int32()),
        ("extra_ms", pa.int64()),
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


def build_web_index(fixture_dir: str | Path) -> dict:
    """Driver-side: one pass over the fixture tables -> broadcastable
    bundle of hash-sorted numpy arrays + Arrow payload/link data."""
    fixture_dir = Path(fixture_dir)
    pages = pq.read_table(fixture_dir / "pages.parquet")
    urls = pages.column("url").to_pylist()
    n = len(urls)
    hashes = np.fromiter((url_hash64(u) for u in urls), np.int64, n)
    order = np.argsort(hashes)
    bundle = {
        "hash_sorted": hashes[order],
        "status": pages.column("fetch_status").to_numpy()[order].astype(np.int32),
        "n_transient": pages.column("n_transient").to_numpy()[order].astype(np.int32),
        "transient_status": pages.column("transient_status")
        .to_numpy()[order]
        .astype(np.int32),
        "clen": pages.column("content_len").to_numpy()[order].astype(np.int32),
        "prio": pages.column("priority").cast(pa.int64()).to_numpy()[order],
        # image row index: image_id is 'img-{row:08d}' into the images table
        "img_row": np.fromiter(
            (int(s[4:]) for s in pages.column("image_id").to_pylist()), np.int64, n
        )[order],
    }
    links = pq.read_table(fixture_dir / "links.parquet")
    src_h = np.fromiter(
        (url_hash64(u) for u in links.column("src_url").to_pylist()),
        np.int64,
        links.num_rows,
    )
    pos = np.searchsorted(bundle["hash_sorted"], src_h)
    link_order = np.argsort(pos, kind="stable")
    counts = np.bincount(pos, minlength=n)
    bundle["link_offsets"] = np.concatenate(
        [np.zeros(1, np.int64), np.cumsum(counts)]
    )
    bundle["flat_dst"] = (
        links.column("dst_url").take(pa.array(link_order)).combine_chunks()
    )
    # combine_chunks: take() on a multi-chunk table is ~100x slower than on
    # contiguous arrays (pyarrow re-resolves chunks per index) — pay the
    # one-time concat here, not per batch. The payload column is cast to
    # LARGE_BINARY first: a >2 GB world (1M images = 3.5 GB of bytes)
    # cannot combine into one int32-offset binary chunk, and take() on
    # the stuck multi-chunk column re-attempts that concat per batch and
    # dies with "offset overflow while concatenating arrays"
    images = pq.read_table(fixture_dir / "images.parquet")
    bi = images.schema.get_field_index("bytes")
    images = images.set_column(
        bi, "bytes", images.column("bytes").cast(pa.large_binary())
    )
    bundle["images"] = images.combine_chunks()
    return bundle


class WebIndex:
    """Per-worker view of the broadcast web bundle (zero-copy arrays)."""

    _SENTINEL = np.iinfo(np.int64).min  # pad empty worlds so lookups no-op

    def __init__(self, bundle: dict):
        if len(bundle["hash_sorted"]) == 0:
            bundle = dict(
                bundle,
                hash_sorted=np.array([self._SENTINEL], np.int64),
                status=np.zeros(1, np.int32),
                n_transient=np.zeros(1, np.int32),
                transient_status=np.zeros(1, np.int32),
                clen=np.zeros(1, np.int32),
                prio=np.zeros(1, np.int64),
                img_row=np.zeros(1, np.int64),
                link_offsets=np.zeros(2, np.int64),
            )
        self.hash_sorted = bundle["hash_sorted"]
        self.status = bundle["status"]
        self.n_transient = bundle["n_transient"]
        self.transient_status = bundle["transient_status"]
        self.clen = bundle["clen"]
        self.prio = bundle["prio"]
        self.img_row = bundle["img_row"]
        self.link_offsets = bundle["link_offsets"]
        self.flat_dst = bundle["flat_dst"]
        self.images = bundle["images"]
        self.n = len(self.hash_sorted)


_INDEX_CACHE: dict = {}


def get_web_index(bundle_ref) -> WebIndex:
    from . import pin_worker_threads

    pin_worker_threads()
    idx = _INDEX_CACHE.get(bundle_ref)
    if idx is None:
        idx = WebIndex(ray.get(bundle_ref))
        _INDEX_CACHE.clear()  # at most one world per worker
        _INDEX_CACHE[bundle_ref] = idx
    return idx


# rows per payload gather: 32k rows x 32 KB/image worst case is 2^30
# bytes — half of one binary array's int32 offset budget (2^31-1), a
# genuinely conservative margin (65536*32768 would hit exactly 2^31 and
# overflow by one byte)
_PAYLOAD_TAKE_SLICE = 32768


def fetch_batch(batch: pa.Table, idx: WebIndex) -> pa.Table:
    h = batch.column("url_hash").to_numpy()
    m = len(h)
    pos = np.clip(np.searchsorted(idx.hash_sorted, h), 0, idx.n - 1)
    found = idx.hash_sorted[pos] == h

    base_status = np.where(found, idx.status[pos], 404).astype(np.int32)
    # retry/backoff/penalty on the virtual clock (functions/retry.py —
    # shared with the oracle): FINAL status after the retry budget; the
    # per-host extra virtual ms is credited to frontier clocks at route
    nt = np.where(found, idx.n_transient[pos], 0).astype(np.int32)
    ts = np.where(found, idx.transient_status[pos], 0).astype(np.int32)
    status, attempts, backoff = retry_plan_batch(nt, ts, base_status)
    penalties = penalty_ms_batch(h, status)
    extra_ms = backoff + penalties
    ok = found & (status == 200)
    clen = np.where(ok, idx.clen[pos], 0).astype(np.int32)
    img_rows = np.where(ok, idx.img_row[pos], 0)

    # payload: take with null-masked indices -> nulls where not ok.
    # SLICED take: one gather of a whole 10^6-row wave batch would build
    # a single binary array past pyarrow's int32 offset limit ("offset
    # overflow while concatenating arrays" — reproduced at the 1M-URL
    # world, whose payload column is 3.5 GB); per-slice takes concat as
    # CHUNKS, which have no combined-size limit
    take_idx = pa.array(img_rows, type=pa.int64(), mask=~ok)
    if m > _PAYLOAD_TAKE_SLICE:
        img = pa.concat_tables(
            idx.images.take(take_idx.slice(s, min(_PAYLOAD_TAKE_SLICE, m - s)))
            for s in range(0, m, _PAYLOAD_TAKE_SLICE)
        )
    else:
        img = idx.images.take(take_idx)

    # out-links: gather ranges from the flat adjacency, one take, ListArray
    starts = np.where(ok, idx.link_offsets[pos], 0)
    cnt = np.where(ok, idx.link_offsets[pos + 1] - idx.link_offsets[pos], 0)
    total = int(cnt.sum())
    if total:
        gather = np.repeat(starts, cnt) + (
            np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        )
        values = idx.flat_dst.take(pa.array(gather, pa.int64()))
    else:
        values = pa.array([], pa.string())
    offsets = np.concatenate([np.zeros(1, np.int64), np.cumsum(cnt)]).astype(np.int32)
    outlinks = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), values)

    # error strings: only the (rare) non-ok rows, row-wise
    errors: list = [None] * m
    for i in np.nonzero(~ok)[0]:
        errors[i] = (
            "HTTP 404 Not Found"
            if not found[i]
            else ERROR_MESSAGES.get(int(status[i]), f"HTTP {int(status[i])}")
        )

    return pa.table(
        {
            "url": batch.column("url"),
            "host": batch.column("host"),
            "url_hash": batch.column("url_hash"),
            "priority": batch.column("priority"),
            "depth": batch.column("depth"),
            "status": pa.array(status),
            "n_attempts": pa.array(attempts),
            "extra_ms": pa.array(extra_ms),
            "image_id": img.column("image_id"),
            # back to int32-offset binary: one batch's payload fits by
            # construction (_PAYLOAD_TAKE_SLICE), and FETCHED_SCHEMA
            # stays `binary` everywhere downstream
            "bytes": pc.cast(img.column("bytes"), pa.binary()),
            "w": img.column("w"),
            "h": img.column("h"),
            "fmt": img.column("fmt"),
            "caption": img.column("caption"),
            "phash": img.column("phash"),
            "content_len": pa.array(clen),
            "extraction_error": pa.array(errors, pa.string()),
            "outlinks": outlinks,
        },
        schema=FETCHED_SCHEMA,
    )


def make_fetch_fn(bundle_ref):
    """Task-form fetch stage: zero-copy per-worker index, O(ms) setup."""

    def fetch(batch: pa.Table) -> pa.Table:
        return fetch_batch(batch, get_web_index(bundle_ref))

    return fetch


class SimFetcher:
    """Actor-pool form of the fetch stage (the shape a live-web fetcher
    with per-actor HTTP sessions would take); the wave loop uses the
    fused task form above."""

    def __init__(self, bundle_ref):
        self.idx = WebIndex(ray.get(bundle_ref))

    def __call__(self, batch: pa.Table) -> pa.Table:
        return fetch_batch(batch, self.idx)
