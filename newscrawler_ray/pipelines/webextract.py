"""Web-extraction pipelines: HTML article extraction over a page table.

Pipeline form of the stateless extractors in ``stages/html_extract.py``
(and ``stages/metadata_extract.py``): read the page table (pruned
columns), ``map_batches`` the parser, write/return structured rows.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import ray.data as rd

from ..stages.html_extract import extract_html_batch


def extract_video_metadata_pages(
    pages_path: str | Path, *, batch_size: int = 64, date_fallback=None
) -> rd.Dataset:
    """(doc_id, url, html) -> typed video metadata rows (M9 analog).
    ``date_fallback`` is injected for determinism (never wall clock)."""
    from datetime import datetime

    from ..stages.metadata_extract import extract_metadata_batch

    if date_fallback is None:
        date_fallback = datetime(2025, 7, 1)
    ds = rd.read_parquet(str(pages_path), columns=["doc_id", "url", "html"])
    return ds.map_batches(
        lambda b: extract_metadata_batch(b, date_fallback=date_fallback),
        batch_size=batch_size,
        batch_format="pyarrow",
    )


def extract_html_pages(pages_path: str | Path, *, batch_size: int = 64) -> rd.Dataset:
    """(doc_id, url, html) -> (doc_id, url, title, content, summary,
    author, extraction_error).

    Batch size stays small: rows carry whole HTML documents, and the
    per-batch cost is CPU-bound parsing — small batches keep the
    streaming executor's pipeline full without inflating worker heap.
    """
    ds = rd.read_parquet(str(pages_path), columns=["doc_id", "url", "html"])
    return ds.map_batches(
        extract_html_batch, batch_size=batch_size, batch_format="pyarrow"
    )


# --------------------------------------------- crawl -> extraction composition

# page-spec stream ids must be non-negative rng seeds; the mask keeps the
# html a pure function of the 64-bit url hash
ARTICLE_ID_MASK = 0x7FFFFFFF


def make_article_server(seed: int = 42):
    """``map_batches`` fn: (``url_hash``) -> ``html`` binary column.

    The composition's analog of the reference's per-article HTTP GET in
    the inline-extract path (``services/news_service.py:95-108`` fetches
    each article page before running ``utils/article_extractor.py``
    cascades): here the article body is a pure function of
    (seed, url_hash) via the synth_html generator — the same rule the
    golden-parity test recomputes independently. Pages where the
    generator returns None model fetch-empty responses and flow through
    the extractor's "Empty document" error path.
    """
    from ..synth_html import page_spec, render_html

    def serve(batch: pa.Table) -> pa.Table:
        html = []
        for h in batch.column("url_hash").to_pylist():
            v = render_html(page_spec(int(h) & ARTICLE_ID_MASK, seed))
            html.append(v.encode("utf-8") if v is not None else None)
        return batch.append_column("html", pa.array(html, pa.binary()))

    return serve


def extracted_articles_dataset(cache_dir: str | Path) -> rd.Dataset:
    """Readback of the extraction cache written by ``extract_crawl_output``."""
    return rd.read_parquet(str(cache_dir))


def extract_crawl_output(
    crawl_out_dir: str | Path,
    cache_dir: str | Path,
    *,
    seed: int = 42,
    batch_size: int = 64,
) -> dict:
    """End-to-end tier composition: CRAWL output -> article extraction,
    with ``cache_dir`` as the extraction cache.

    Rebuild of the reference's ``/news?extract=true`` inline path
    (``services/news_service.py:95-108`` -> ``utils/article_extractor.py:
    412-479``, where a DB-backed cache skips already-extracted URLs):

      stored crawl rows (thin ``url``/``url_hash`` columns)
        -> anti-join against the cache's already-extracted ``url_hash``
           set (8-byte keys, broadcast once via ``ray.put``; at 10^10
           cached URLs this single broadcast set would instead be
           hash-partitioned alongside the seen shards — same key space)
        -> article-page fetch (``make_article_server``)
        -> selector-cascade extraction (``extract_html_batch``)
        -> appended to ``cache_dir`` as new parquet files.

    A second run over the same crawl output extracts NOTHING (tested):
    the cache is keyed by the same canonical url_hash the seen-set uses,
    so re-runs and resumed crawls skip all finished work. Payload HTML
    is fetched only for cache-miss rows and never crosses a shuffle.

    Returns ``{"n_new", "n_cached", "cache_dir"}``.
    """
    import pyarrow.parquet as pq
    import ray

    from ..functions.joins import make_broadcast_semijoin_fn
    from .crawl import crawl_output_dataset

    cache_dir = Path(cache_dir)
    cache_files = (
        sorted(str(p) for p in cache_dir.glob("*.parquet"))
        if cache_dir.is_dir()
        else []
    )
    n_cached = 0
    todo = crawl_output_dataset(crawl_out_dir).map_batches(
        lambda t: t.filter(t.column("stored")).select(["url", "url_hash"]),
        batch_format="pyarrow",
    )
    if cache_files:
        done = pq.ParquetDataset(cache_files).read(columns=["url_hash"])
        n_cached = done.num_rows
        keys_ref = ray.put(done.column("url_hash").combine_chunks())
        todo = todo.map_batches(
            make_broadcast_semijoin_fn("url_hash", keys_ref, anti=True),
            batch_format="pyarrow",
        )
    pages = todo.map_batches(
        make_article_server(seed), batch_size=batch_size, batch_format="pyarrow"
    )
    extracted = pages.map_batches(
        extract_html_batch, batch_size=batch_size, batch_format="pyarrow"
    )
    cache_dir.mkdir(parents=True, exist_ok=True)
    extracted.write_parquet(str(cache_dir))
    total = pq.ParquetDataset(
        sorted(str(p) for p in cache_dir.glob("*.parquet"))
    ).read(columns=["url_hash"]).num_rows
    return {
        "n_new": total - n_cached,
        "n_cached": n_cached,
        "cache_dir": str(cache_dir),
    }
