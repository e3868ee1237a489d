"""Web-extraction pipelines: HTML article extraction over a page table.

Pipeline form of the stateless extractors in ``stages/html_extract.py``
(and ``stages/metadata_extract.py``): read the page table (pruned
columns), ``map_batches`` the parser, write/return structured rows.
"""

from __future__ import annotations

from pathlib import Path

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
